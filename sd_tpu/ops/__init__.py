from sd_tpu.ops.norms import GroupNorm32, LayerNormFp32
from sd_tpu.ops.attention import (
    AttentionPool2d,
    BasicTransformerBlock,
    CrossAttention,
    FeedForward,
    GEGLU,
    LinearAttention,
    QKVAttentionBlock,
    SpatialTransformer,
    VAEAttnBlock,
    dot_product_attention,
)
from sd_tpu.ops.resblock import Downsample, ResBlock, Upsample, VAEResnetBlock
