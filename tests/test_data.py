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


# ------------------------------------------------- ImageNet prepare machinery

def _mini_jpeg(path, seed, hw=(40, 40)):
    from PIL import Image

    Image.fromarray(
        (np.random.default_rng(seed).random((*hw, 3)) * 255).astype(np.uint8)
    ).save(path, format="JPEG")


def _make_train_root(tmp_path):
    """Fake ILSVRC2012_img_train.tar: nested one-tar-per-synset layout
    (ldm/data/imagenet.py:163-185)."""
    import tarfile

    root = tmp_path / "ILSVRC2012_train"
    root.mkdir()
    stage = tmp_path / "stage"
    synsets = ["n01000001", "n01000002"]
    subtars = []
    for s, syn in enumerate(synsets):
        d = stage / syn
        d.mkdir(parents=True)
        for i in range(2):
            _mini_jpeg(d / f"{syn}_{i}.JPEG", seed=10 * s + i)
        subtar = stage / f"{syn}.tar"
        with tarfile.open(subtar, "w") as tar:
            for i in range(2):
                tar.add(d / f"{syn}_{i}.JPEG", arcname=f"{syn}_{i}.JPEG")
        subtars.append(subtar)
    with tarfile.open(root / "ILSVRC2012_img_train.tar", "w") as tar:
        for subtar in subtars:
            tar.add(subtar, arcname=subtar.name)
    (root / "synset_human.txt").write_text(
        "n01000001 tench, Tinca tinca\nn01000002 goldfish, Carassius\n")
    (root / "index_synset.yaml").write_text(
        "0: n01000001\n1: n01000002\n")
    return root, synsets


def test_imagenet_train_prepare_and_metadata(tmp_path):
    from sd_tpu.data.imagenet import (
        DownloadRequired, ImageNetTrain, prepare_imagenet_train)

    root, synsets = _make_train_root(tmp_path)
    prepare_imagenet_train(str(root), strict_size=False)
    # layout: data/<synset>/*.JPEG + sorted filelist + idempotent marker
    fl = (root / "filelist.txt").read_text().splitlines()
    assert fl == sorted(fl) and len(fl) == 4
    assert all((root / "data" / p).exists() for p in fl)
    mtime = os.path.getmtime(root / "filelist.txt")
    prepare_imagenet_train(str(root), strict_size=False)  # no re-prep
    assert os.path.getmtime(root / "filelist.txt") == mtime

    ds = ImageNetTrain(data_root=str(root), size=32)
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["synsets"] == "n01000001"
    assert ex["human_label"].startswith("tench")
    assert ex["class_label"] == 0
    # sub_indices grammar + keep_orig_class_label via index_synset.yaml
    sub = ImageNetTrain(data_root=str(root), sub_indices="1",
                        keep_orig_class_label=True, process_images=False)
    assert len(sub) == 2 and all(
        sub[i]["synsets"] == "n01000002" and sub[i]["class_label"] == 1
        for i in range(2))
    # absent tarball surfaces the acquisition route instead of half-failing
    with pytest.raises(DownloadRequired, match="academictorrents"):
        prepare_imagenet_train(str(tmp_path / "empty"))


def test_imagenet_val_prepare_reorganizes_synsets(tmp_path):
    import tarfile

    from sd_tpu.data.imagenet import (
        DownloadRequired, ImageNetValidation, prepare_imagenet_validation)

    root = tmp_path / "ILSVRC2012_validation"
    root.mkdir()
    stage = tmp_path / "vstage"
    stage.mkdir()
    names = [f"ILSVRC2012_val_0000000{i}.JPEG" for i in range(1, 5)]
    for i, name in enumerate(names):
        _mini_jpeg(stage / name, seed=100 + i)
    with tarfile.open(root / "ILSVRC2012_img_val.tar", "w") as tar:
        for name in names:
            tar.add(stage / name, arcname=name)
    # flat-tar case without the synset map: hard error naming the map URL
    with pytest.raises(DownloadRequired, match="validation_synset"):
        prepare_imagenet_validation(str(root), strict_size=False)
    import shutil

    shutil.rmtree(root / "data")
    (root / "validation_synset.txt").write_text("".join(
        f"{name} n0100000{1 + i % 2}\n" for i, name in enumerate(names)))
    prepare_imagenet_validation(str(root), strict_size=False)
    fl = (root / "filelist.txt").read_text().splitlines()
    assert len(fl) == 4 and all("/" in p for p in fl)
    ds = ImageNetValidation(data_root=str(root), size=16)
    assert {ds[i]["synsets"] for i in range(4)} == {"n01000001", "n01000002"}


def test_imagenet_sr_hr_indices_split(tmp_path):
    import pickle

    from sd_tpu.data.imagenet import ImageNetSRTrain, prepare_imagenet_train

    root, _ = _make_train_root(tmp_path)
    prepare_imagenet_train(str(root), strict_size=False)
    hr = tmp_path / "imagenet_train_hr_indices.p"
    with open(hr, "wb") as f:
        pickle.dump([0, 3], f)
    sr = ImageNetSRTrain(data_root=str(root), hr_indices=str(hr),
                         size=32, degradation="bsrgan_light", downscale_f=4)
    assert len(sr) == 2
    ex = sr[1]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["LR_image"].shape == (8, 8, 3)
    assert ex["synsets"] == "n01000002"


def test_imagenet_human2integer_map(tmp_path):
    from sd_tpu.data.imagenet import ImageNetTrain, prepare_imagenet_train

    root, _ = _make_train_root(tmp_path)
    (root / "imagenet1000_clsidx_to_labels.txt").write_text(
        "0: tench, Tinca tinca\n1: goldfish, Carassius\n")
    prepare_imagenet_train(str(root), strict_size=False)
    ds = ImageNetTrain(data_root=str(root), process_images=False)
    assert ds.human2integer_dict[" tench, Tinca tinca"] == 0
    assert ds.human2integer_dict[" goldfish, Carassius"] == 1
