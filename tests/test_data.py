"""Data layer tests: loader/collate contract, LSUN/ImageNet processing on
synthetic files, degradation pipeline invariants, MATLAB imresize parity,
PSNR/SSIM sanity."""

import os

import numpy as np
import pytest

from sd_tpu.data.base import DataLoader, Txt2ImgIterableBaseDataset, collate
from sd_tpu.data.degradation import (
    add_jpeg_noise,
    aniso_gaussian_kernel,
    degradation_bsrgan,
    degradation_bsrgan_variant,
    imresize,
    iso_gaussian_kernel,
    psnr,
    ssim,
)
from sd_tpu.data.lsun import LSUNBase, center_crop_square
from sd_tpu.data.imagenet import ImageNetSR, ImageNetBase
from sd_tpu.data.synthetic import SyntheticImages


def test_collate_mixed_types():
    batch = collate([
        {"image": np.zeros((4, 4, 3)), "caption": "a", "class_label": 1},
        {"image": np.ones((4, 4, 3)), "caption": "b", "class_label": 2},
    ])
    assert batch["image"].shape == (2, 4, 4, 3)
    assert batch["caption"] == ["a", "b"]
    np.testing.assert_array_equal(batch["class_label"], [1, 2])


def test_dataloader_shuffle_determinism_and_sharding():
    ds = SyntheticImages(size=8, length=32)
    dl1 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    b1, b2 = next(iter(dl1)), next(iter(dl2))
    np.testing.assert_array_equal(b1["image"], b2["image"])
    # 2-shard split: same total coverage, disjoint halves
    s0 = DataLoader(ds, batch_size=4, num_shards=2, shard_index=0)
    s1 = DataLoader(ds, batch_size=4, num_shards=2, shard_index=1)
    assert len(s0) == len(s1) == 4
    i0 = np.concatenate([b["class_label"] for b in s0])
    i1 = np.concatenate([b["class_label"] for b in s1])
    assert len(i0) == len(i1) == 16


def test_iterable_dataset_worker_sharding():
    class Stream(Txt2ImgIterableBaseDataset):
        def __iter__(self):
            for i in self.sample_ids:
                yield {"image": np.full((2, 2, 3), i, np.float32)}

    ds = Stream(num_records=10)
    ds.shard(0, 2)
    ids0 = [int(s["image"][0, 0, 0]) for s in ds]
    ds.shard(1, 2)
    ids1 = [int(s["image"][0, 0, 0]) for s in ds]
    assert ids0 == [0, 1, 2, 3, 4] and ids1 == [5, 6, 7, 8, 9]


def test_lsun_dataset_pipeline(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.default_rng(i).random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(root / f"im{i}.png")
    filelist = tmp_path / "files.txt"
    filelist.write_text("\n".join(f"im{i}.png" for i in range(3)))

    ds = LSUNBase(txt_file=str(filelist), data_root=str(root), size=32, flip_p=0.0)
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["relative_file_path_"] == "im0.png"


def test_imagenet_sr_pair(tmp_path):
    from PIL import Image

    root = tmp_path / "in"
    (root / "n01440764").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(
            (np.random.default_rng(i).random((72, 72, 3)) * 255).astype(np.uint8)
        ).save(root / "n01440764" / f"x{i}.png")
    (root / "filelist.txt").write_text(
        "n01440764/x0.png\nn01440764/x1.png"
    )
    base = ImageNetBase(data_root=str(root), size=None)
    sr = ImageNetSR(base=base, size=32, degradation="bsrgan_light",
                    downscale_f=4, random_crop=False)
    ex = sr[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["LR_image"].shape == (8, 8, 3)
    assert ex["class_label"] == 0


def test_center_crop_square():
    img = np.zeros((10, 20, 3), np.uint8)
    out = center_crop_square(img)
    assert out.shape == (10, 10, 3)


# -------------------------------------------------------------- degradation


def test_gaussian_kernels_normalized():
    k = iso_gaussian_kernel(9, 1.5)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    k2 = aniso_gaussian_kernel(9, 2.0, 0.5, 0.7)
    np.testing.assert_allclose(k2.sum(), 1.0, rtol=1e-6)
    assert not np.allclose(k2, k2.T)  # anisotropic


@pytest.mark.parametrize("fn", [degradation_bsrgan, degradation_bsrgan_variant])
def test_degradation_pipeline_shapes(fn):
    rng = np.random.default_rng(0)
    hr = rng.random((64, 64, 3)).astype(np.float32)
    lq, hq = fn(hr, sf=4, rng=rng)
    assert hq.shape == (64, 64, 3)
    assert lq.shape == (16, 16, 3)
    assert 0.0 <= lq.min() and lq.max() <= 1.0
    # degraded differs from a clean downsample
    clean = imresize(hr, 0.25)
    assert np.abs(lq - clean).mean() > 1e-3


def test_jpeg_noise_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    out = add_jpeg_noise(img, rng)
    assert out.shape == img.shape
    assert 0 < np.abs(out - img).mean() < 0.3


def test_imresize_matlab_properties():
    # constant image stays constant (kernel normalization)
    img = np.full((16, 16, 3), 0.5, np.float32)
    out = imresize(img, 0.5)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    up = imresize(img, 2.0)
    assert up.shape == (32, 32, 3)
    np.testing.assert_allclose(up, 0.5, atol=1e-6)
    # downsample averages: alternating extremes land mid-range (antialiasing)
    stripes = np.tile(np.array([0.0, 1.0] * 8, np.float32)[None, :, None], (16, 1, 3))
    d = imresize(stripes, 0.25)
    assert 0.3 < d.mean() < 0.7


def test_psnr_ssim_sanity():
    rng = np.random.default_rng(0)
    a = (rng.random((32, 32, 3)) * 255).astype(np.float64)
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    p = psnr(a, noisy)
    assert 20 < p < 40
    assert 0.3 < ssim(a, noisy) < 1.0


def test_parallel_data_prefetch_threads():
    from sd_tpu.utils.prefetch import parallel_data_prefetch

    data = np.arange(100, dtype=np.float32)
    out = parallel_data_prefetch(lambda x: x * 2, data, n_proc=4,
                                 cpu_intensive=False)
    np.testing.assert_array_equal(out, data * 2)


def test_parallel_data_prefetch_list():
    from sd_tpu.utils.prefetch import parallel_data_prefetch

    out = parallel_data_prefetch(lambda xs: [x + 1 for x in xs],
                                 list(range(10)), n_proc=3,
                                 target_data_type="list", cpu_intensive=False)
    assert out == list(range(1, 11))
