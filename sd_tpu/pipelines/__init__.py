from sd_tpu.pipelines.img2img import Img2ImgPipeline, InpaintPipeline
from sd_tpu.pipelines.txt2img import Txt2ImgPipeline, latents_to_images
