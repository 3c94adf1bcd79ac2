"""CLIP text tower parity vs HF transformers (random weights, offline) and
BPE tokenizer behavior tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer, bytes_to_unicode
from sd_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPTextModelWithProjection,
    port_clip_text,
)

TINY = CLIPTextConfig(
    vocab_size=100, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
    projection_dim=24, eos_token_id=99,
)


def hf_model():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(40)
    cfg = HFConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_act="quick_gelu",
        # HF pools at the first eos occurrence; with CLIP prompts that equals
        # argmax pooling (EOT is the max id). Align the tiny config the same way.
        eos_token_id=TINY.eos_token_id,
    )
    model = HFModel(cfg).eval()
    return torch, model


def test_clip_text_parity_vs_hf():
    torch, ref = hf_model()
    # make sure the final position is the max id so both poolers agree
    ids = torch.randint(0, 99, (2, 16))
    ids[:, 10] = 99
    with torch.no_grad():
        out = ref(input_ids=ids)

    model = CLIPTextModel(TINY)
    params = port_clip_text(ref.state_dict(), TINY)
    got = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        out.last_hidden_state.detach().numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]),
        out.pooler_output.detach().numpy(),
        atol=2e-4, rtol=1e-3,
    )


def test_clip_causal_mask():
    """Token t must not see tokens > t: changing a later token must not
    change earlier hidden states."""
    model = CLIPTextModel(TINY)
    ids1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]])
    ids2 = ids1.at[0, 6].set(50)
    params = model.init(jax.random.PRNGKey(0), ids1)["params"]
    h1 = model.apply({"params": params}, ids1)["last_hidden_state"]
    h2 = model.apply({"params": params}, ids2)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(h1[:, :6]), np.asarray(h2[:, :6]), atol=1e-5)
    assert np.abs(np.asarray(h1[:, 6:]) - np.asarray(h2[:, 6:])).max() > 1e-4


def test_clip_projection_normalized(rng):
    model = CLIPTextModelWithProjection(TINY, normalize=True)
    ids = jnp.array([[1, 2, 3, 99] + [0] * 12])
    params = model.init(rng, ids)["params"]
    z = model.apply({"params": params}, ids)
    assert z.shape == (1, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)


def test_clip_sd_scale_param_count():
    """ViT-L/14 text tower must land at the reference's 123M params."""
    model = CLIPTextModel()
    ids = jnp.zeros((1, 77), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    n = sum(p.size for p in jax.tree.leaves(params))
    assert 120e6 < n < 127e6, f"{n/1e6:.1f}M"


# ---------------------------------------------------------------- tokenizer


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def tiny_tokenizer():
    # merges that build "hello" and "cat</w>" from bytes
    merges = [
        ("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>"),
        ("c", "a"), ("ca", "t</w>"),
    ]
    return CLIPTokenizer(merges)


def test_tokenizer_merges_and_specials():
    tok = tiny_tokenizer()
    ids = tok.encode("hello cat")
    assert [tok.decoder[i] for i in ids] == ["hello</w>", "cat</w>"]
    batch = tok(["hello cat"], context_length=8)
    assert batch.shape == (1, 8)
    assert batch[0, 0] == tok.sot_id
    assert batch[0, 3] == tok.eot_id
    assert (batch[0, 4:] == tok.eot_id).all()  # padded with EOT


def test_tokenizer_unknown_word_falls_to_bytes():
    tok = tiny_tokenizer()
    ids = tok.encode("dog")
    # no merges for dog: d, o, g</w> as byte symbols
    assert [tok.decoder[i] for i in ids] == ["d", "o", "g</w>"]


def test_tokenizer_lowercase_and_whitespace():
    tok = tiny_tokenizer()
    assert tok.encode("  HELLO\n cat ") == tok.encode("hello cat")


def test_tokenizer_truncation():
    tok = tiny_tokenizer()
    batch = tok(["hello " * 100], context_length=10)
    assert batch.shape == (1, 10)
    assert batch[0, -1] == tok.eot_id


def test_tokenizer_roundtrip_decode():
    tok = tiny_tokenizer()
    batch_ids = tok.encode("hello cat dog")
    assert tok.decode(batch_ids) == "hello cat dog"


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    b = tok(["a photograph of an astronaut riding a horse"], context_length=77)
    assert b.shape == (1, 77) and b.dtype == np.int32
    assert b[0, 0] == tok.sot_id
    b2 = tok(["a photograph of an astronaut riding a horse"])
    np.testing.assert_array_equal(b, b2)  # deterministic
