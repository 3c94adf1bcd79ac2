"""Tests for the auxiliary pipeline components: CLIP vision tower parity,
safety checker contract, watermark round-trip, retrieval searcher."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModel,
    clip_image_preprocess,
    port_clip_vision,
)
from sd_tpu.pipelines.retrieval import Searcher, build_index, knn_conditioning
from sd_tpu.pipelines.safety import SafetyChecker, placeholder_image
from sd_tpu.utils.watermark import (
    WATERMARK_PAYLOAD,
    decode_watermark,
    embed_watermark,
)

TINY_VISION = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, projection_dim=16,
)


def test_clip_vision_parity_vs_hf():
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection as HFModel

    torch.manual_seed(70)
    hf_cfg = HFCfg(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=16,
        hidden_act="quick_gelu",
    )
    ref = HFModel(hf_cfg).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = ref(pixel_values=x)

    model = CLIPVisionModel(TINY_VISION, project=True)
    params = port_clip_vision(ref.state_dict(), TINY_VISION)
    got = model.apply({"params": params},
                      jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.asarray(got["image_embeds"]), out.image_embeds.numpy(),
        atol=3e-4, rtol=1e-3,
    )


def test_clip_image_preprocess_shapes():
    x = jnp.zeros((2, 64, 48, 3))
    out = clip_image_preprocess(x)
    assert out.shape == (2, 224, 224, 3)
    # [-1,1] zeros -> 0.5 in [0,1] -> (0.5-mean)/std
    expected0 = (0.5 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expected0, rtol=1e-4)


def test_safety_checker_contract(rng):
    checker = SafetyChecker.random_init(rng)
    imgs = (np.random.default_rng(0).random((2, 64, 64, 3)) * 255).astype(np.uint8)
    # force flagging: thresholds at -1 flag everything
    checker.concept_thresholds = jnp.full((17,), -1.0)
    out, flags = checker(imgs)
    assert flags.all()
    np.testing.assert_array_equal(out[0], placeholder_image(64, 64))
    # thresholds at +2 (cosine <= 1) flag nothing
    checker.concept_thresholds = jnp.full((17,), 2.0)
    checker.special_care_thresholds = jnp.full((3,), 2.0)
    out2, flags2 = checker(imgs)
    assert not flags2.any()
    np.testing.assert_array_equal(out2, imgs)


def test_watermark_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
    wm = embed_watermark(img, WATERMARK_PAYLOAD)
    assert wm.shape == img.shape and wm.dtype == np.uint8
    # imperceptibility: small mean perturbation
    assert np.abs(wm.astype(int) - img.astype(int)).mean() < 6
    decoded = decode_watermark(wm)
    assert decoded == WATERMARK_PAYLOAD


def test_watermark_roundtrip_small_payload():
    img = np.full((128, 128, 3), 128, np.uint8)
    wm = embed_watermark(img, b"hi")
    assert decode_watermark(wm, n_bytes=2) == b"hi"


# ---------------------------------------------------------------- retrieval


def test_searcher_exact_topk(rng):
    db = np.eye(8, 16, dtype=np.float32)  # 8 orthogonal embeddings
    s = Searcher(db)
    q = db[3:4] + 0.01
    out = s(q, k=3)
    assert out["nn_indices"][0, 0] == 3
    assert out["nn_embeddings"].shape == (1, 3, 16)
    assert out["scores"][0, 0] > out["scores"][0, 1]


def test_build_index_and_search(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        np.savez(tmp_path / f"part{i}.npz",
                 embedding=rng.standard_normal((10, 8)).astype(np.float32))
    idx_path = str(tmp_path / "index.npz")
    build_index(sorted(map(str, tmp_path.glob("part*.npz"))), idx_path)
    s = Searcher(idx_path)
    assert s.embeddings.shape == (30, 8)
    norms = np.linalg.norm(np.asarray(s.embeddings), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_knn_conditioning_assembly(rng):
    db = np.random.default_rng(1).standard_normal((20, 8)).astype(np.float32)
    s = Searcher(db)
    q = np.random.default_rng(2).standard_normal((2, 8)).astype(np.float32)
    cond, uncond = knn_conditioning(q, s, k=4)
    assert cond.shape == (2, 5, 8)  # query + 4 neighbors
    assert (np.asarray(uncond) == 0).all()
    # first token is the query as given (FrozenCLIPTextEmbedder already
    # normalizes upstream; knn_conditioning must not re-normalize)
    np.testing.assert_allclose(np.asarray(cond[:, 0]), q, atol=1e-5)
