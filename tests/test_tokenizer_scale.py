"""BPE tokenizer stress test at realistic scale against HF's CLIPTokenizer.

The reference gets its tokenizer from HF (``ldm/modules/encoders/modules.py:
139-144``). Zero egress means the real 49k-merge vocab can't be downloaded,
so this builds a >10k-merge vocabulary locally (progressive merges over a
deterministic pseudo-word corpus — every merge actually fires), writes it in
HF format (vocab.json + merges.txt), loads ``transformers.CLIPTokenizer``
from those files, and fuzzes token-level equality across punctuation,
unicode, contractions, numbers, and long prompts.

Caveat: this environment lacks ftfy, so HF falls back to a BasicTokenizer
cleanup that inserts spaces around CJK characters (different word grouping by
construction); CJK is therefore excluded here — the BPE/regex/special-token
machinery is what this validates.
"""

import itertools
import json
import random

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from sd_tpu.data.tokenizer import CLIPTokenizer


def _make_words(n=2500, seed=0):
    rng = random.Random(seed)
    syllables = [
        "an", "ar", "en", "er", "in", "on", "or", "al", "le", "re", "ti",
        "st", "ing", "tion", "ous", "pre", "post", "ment", "able", "ish",
        "photo", "graph", "paint", "monster", "guitar", "horse", "astro",
        "naut", "rid", "city", "sky", "light", "dark", "dream", "scape",
    ]
    words = set("""
        a of an the and riding painting photograph astronaut horse virus
        monster playing guitar highly detailed concept art trending on
        artstation cinematic lighting portrait landscape watercolor oil
        canvas masterpiece realistic render unreal engine volumetric fog
    """.split())
    while len(words) < n:
        w = "".join(rng.choice(syllables) for _ in range(rng.randint(2, 4)))
        words.add(w[:14])
    return sorted(words)


def _progressive_merges(words, cap=12000):
    """Left-to-right build-up merges per word (each merge is reachable and
    fires on its word), deduped in first-seen order."""
    merges, seen = [], set()
    for w in words:
        parts = list(w[:-1]) + [w[-1] + "</w>"]
        prefix = parts[0]
        for nxt in parts[1:]:
            pair = (prefix, nxt)
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
            prefix = prefix + nxt
        if len(merges) >= cap:
            break
    return merges[:cap]


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    words = _make_words()
    merges = _progressive_merges(words)
    assert len(merges) >= 10000
    ours = CLIPTokenizer(merges)

    d = tmp_path_factory.mktemp("clip_vocab")
    vocab_json = d / "vocab.json"
    merges_txt = d / "merges.txt"
    with open(vocab_json, "w", encoding="utf-8") as f:
        json.dump(ours.encoder, f, ensure_ascii=False)
    with open(merges_txt, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))
    hf = transformers.CLIPTokenizer(str(vocab_json), str(merges_txt))
    return ours, hf


FUZZ = [
    "a photograph of an astronaut riding a horse",
    "a painting of a virus monster playing guitar!!!",
    "Hello, World... (mixed CASE) -- punctuation; and: more?",
    "it's we're they've i'll you'd i'm can't",
    "numbers 123 456789 3.14159 1e-5 0xFF",
    "symbols @#$%^&*()_+-=[]{}|;':\",./<>?`~",
    "émigré café naïve façade übermensch schön",
    "emoji 🌊🎨🚀 and more 🤖",
    "  leading   and   trailing   whitespace  ",
    "newlines\nand\ttabs\r\nmixed",
    "hyphen-ated compound-words state-of-the-art",
    "quotes “curly” and ‘single’ and «guillemets»",
    "a " + "very long prompt with many words " * 30,
    "repeatrepeatrepeatrepeatrepeat",
    "singleletters a b c d e f g h",
    "ALLCAPS SHOUTING TEXT",
    "underscores_and_snake_case variables",
    "trailing punctuation...,,,;;;",
    "ellipsis… dashes–—and†daggers",
    "ordinal 1st 2nd 3rd 42nd",
]


def test_bpe_token_equality_vs_hf(tokenizers):
    ours, hf = tokenizers
    for text in FUZZ:
        got = ours.encode(text)
        want = hf(text, add_special_tokens=False)["input_ids"]
        assert got == want, f"mismatch on {text!r}:\n ours={got}\n hf={want}"


def test_bpe_batch_contract_vs_hf(tokenizers):
    """SOT/EOT framing, EOT padding, truncation at context_length=77 — the
    FrozenCLIPEmbedder call contract (modules.py:146-152)."""
    ours, hf = tokenizers
    batch = ours(FUZZ, context_length=77)
    ref = hf(FUZZ, padding="max_length", truncation=True, max_length=77,
             return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(batch, ref.astype(np.int32))


def test_bpe_merge_priority_order(tokenizers):
    """Competing merges must resolve by rank, not position: words sharing
    prefixes exercise the min-rank selection loop at scale."""
    ours, hf = tokenizers
    words = _make_words()
    sample = words[:300] + words[::17]
    text = " ".join(sample)
    assert ours.encode(text) == hf(text, add_special_tokens=False)["input_ids"]


def test_bpe_decode_roundtrip(tokenizers):
    ours, _ = tokenizers
    for text in ["a photograph of an astronaut", "émigré café naïve"]:
        assert ours.decode(ours.encode(text)) == text.lower()
    # digits split per-character ([\p{N}] in the CLIP regex), each closing a
    # word — decode re-spaces them (HF decodes identically)
    assert ours.decode(ours.encode("abc 123")) == "abc 1 2 3"
