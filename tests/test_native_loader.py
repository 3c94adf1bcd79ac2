"""Native C++ data-loader: correctness vs PIL reference, parallelism, and
failure handling."""

import os

import numpy as np
import pytest

from sd_tpu.data.native_loader import NativeImageLoader, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    # JPEG (landscape), PNG (portrait), grayscale PNG, palette PNG
    arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.jpg", quality=95)
    paths["jpg"] = (str(d / "a.jpg"), arr)
    arr2 = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr2).save(d / "b.png")
    paths["png"] = (str(d / "b.png"), arr2)
    gray = (rng.random((40, 40)) * 255).astype(np.uint8)
    Image.fromarray(gray, mode="L").save(d / "g.png")
    paths["gray"] = (str(d / "g.png"), np.stack([gray] * 3, -1))
    return paths


def pil_reference(arr, size):
    """Same pipeline in PIL/numpy: center-crop square, bilinear resize."""
    from PIL import Image

    h, w = arr.shape[:2]
    crop = min(h, w)
    sq = arr[(h - crop) // 2:(h + crop) // 2, (w - crop) // 2:(w + crop) // 2]
    img = Image.fromarray(sq).resize((size, size), Image.BILINEAR)
    return np.asarray(img).astype(np.float32) / 127.5 - 1.0


def test_native_identity_size_exact(image_dir):
    """At the crop size (no resampling) decode+crop must be bit-exact."""
    from PIL import Image

    loader = NativeImageLoader(num_threads=2)
    path, arr = image_dir["png"]
    h, w = arr.shape[:2]
    crop = min(h, w)
    out, ok = loader.load_batch([path], crop)
    assert ok.all()
    sq = arr[(h - crop) // 2:(h + crop) // 2, (w - crop) // 2:(w + crop) // 2]
    np.testing.assert_allclose(out[0], sq.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)


def test_native_matches_pil_on_smooth_content(tmp_path):
    """Down-scaling filters differ (area vs triangle); on smooth images the
    results must agree closely."""
    from PIL import Image

    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack([yy * 2, xx * 2, (yy + xx)], -1).astype(np.uint8)
    Image.fromarray(smooth).save(tmp_path / "s.png")
    loader = NativeImageLoader(num_threads=2)
    out, ok = loader.load_batch([str(tmp_path / "s.png")], 16)
    assert ok.all()
    ref = pil_reference(smooth, 16)
    assert np.abs(out[0] - ref).mean() < 0.01


def test_native_jpeg_decodes(image_dir):
    """Our libjpeg decode must match PIL's decode of the same file."""
    from PIL import Image

    loader = NativeImageLoader(num_threads=2)
    path, _ = image_dir["jpg"]
    decoded = np.asarray(Image.open(path).convert("RGB"))  # PIL's libjpeg
    h, w = decoded.shape[:2]
    crop = min(h, w)
    out, ok = loader.load_batch([path], crop)  # crop size -> no resampling
    assert ok.all()
    sq = decoded[(h - crop) // 2:(h + crop) // 2, (w - crop) // 2:(w + crop) // 2]
    diff = np.abs(out[0] - (sq.astype(np.float32) / 127.5 - 1.0)).mean()
    assert diff < 0.01  # same underlying decoder, minor IDCT variations


def test_native_batch_parallel_and_failures(image_dir):
    loader = NativeImageLoader(num_threads=4)
    good = image_dir["png"][0]
    paths = [good, "/nonexistent/x.png", image_dir["jpg"][0]] * 4
    out, ok = loader.load_batch(paths, 16)
    assert out.shape == (12, 16, 16, 3)
    assert ok.tolist() == [True, False, True] * 4
    np.testing.assert_allclose(out[1], 0.0)  # failed slot zeroed


def test_native_flip_deterministic(image_dir):
    loader = NativeImageLoader(num_threads=2)
    path = image_dir["png"][0]
    a, _ = loader.load_batch([path] * 8, 16, flip_seed=7)
    b, _ = loader.load_batch([path] * 8, 16, flip_seed=7)
    np.testing.assert_array_equal(a, b)
    noflip, _ = loader.load_batch([path] * 8, 16, flip_seed=-1)
    np.testing.assert_array_equal(noflip[0], noflip[1])
    # with a seed, some of the 8 should be flipped (p=0.5 each)
    flipped = [not np.allclose(a[i], noflip[i]) for i in range(8)]
    assert any(flipped)
    for i, f in enumerate(flipped):
        if f:
            np.testing.assert_allclose(a[i], noflip[i][:, ::-1], atol=1e-6)


def test_native_throughput_sanity(image_dir):
    """Not a benchmark — just confirms the pool survives a larger burst."""
    loader = NativeImageLoader(num_threads=8)
    paths = [image_dir["jpg"][0]] * 64
    out, ok = loader.load_batch(paths, 64)
    assert ok.all() and out.shape == (64, 64, 64, 3)
