"""CLIP BPE tokenizer — in-repo implementation.

The reference delegates tokenization to HF (``FrozenCLIPEmbedder``,
``ldm/modules/encoders/modules.py:137-152``: max_length=77, pad to max length,
truncate). This is a standalone byte-level BPE identical in behavior to the
openai CLIP tokenizer given the same merges table: lowercase + whitespace
cleanup, the CLIP token pattern, BPE with ``</w>`` word-end markers,
``<|startoftext|>`` / ``<|endoftext|>`` specials, padded with the EOT id.

The 262k-merge vocabulary ships with CLIP (``bpe_simple_vocab_16e6.txt.gz``)
or HF (``vocab.json`` + ``merges.txt``); pass either via ``from_openai_gz`` /
``from_hf_files``. Environments without the asset can use
:class:`HashTokenizer` to exercise pipelines end-to-end.
"""

from __future__ import annotations

import gzip
import html
import json
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["bytes_to_unicode", "CLIPTokenizer", "HashTokenizer"]


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = " ".join(text.split())
    return text.strip().lower()


class CLIPTokenizer:
    """Byte-level BPE with CLIP semantics.

    Args:
      merges: ordered list of merge pairs, e.g. ``[("i", "n"), ("in", "g</w>")]``.
      vocab: optional explicit token->id map (HF style). If omitted, the
        vocabulary is constructed the openai way: 256 byte symbols, their
        ``</w>`` variants, one token per merge, then the two specials.
    """

    SOT = "<|startoftext|>"
    EOT = "<|endoftext|>"

    def __init__(self, merges: Sequence[Tuple[str, str]],
                 vocab: Optional[Dict[str, int]] = None):
        import regex as re

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = [tuple(m) for m in merges]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        if vocab is None:
            symbols = list(self.byte_encoder.values())
            toks = symbols + [s + "</w>" for s in symbols]
            toks += ["".join(m) for m in merges]
            toks += [self.SOT, self.EOT]
            vocab = {t: i for i, t in enumerate(toks)}
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.sot_id = self.encoder[self.SOT]
        self.eot_id = self.encoder[self.EOT]
        self.cache: Dict[str, str] = {self.SOT: self.SOT, self.EOT: self.EOT}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    # ---------------------------------------------------------------- load
    @classmethod
    def from_openai_gz(cls, path: str) -> "CLIPTokenizer":
        """openai ``bpe_simple_vocab_16e6.txt.gz`` format (48894 merges used)."""
        with gzip.open(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1]]
        return cls(merges)

    @classmethod
    def from_hf_files(cls, vocab_json: str, merges_txt: str) -> "CLIPTokenizer":
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [
            tuple(m.split()) for m in lines
            if m and not m.startswith("#version") and len(m.split()) == 2
        ]
        return cls(merges, vocab=vocab)

    # ---------------------------------------------------------------- bpe
    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self.pat.findall(_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids if i not in (self.sot_id, self.eot_id))
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts, context_length: int = 77) -> np.ndarray:
        """Batch-tokenize to ``[B, context_length]`` int32, SOT ... EOT, padded
        with EOT (HF CLIPTokenizer pad token), truncating long prompts."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), context_length), self.eot_id, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text)[: context_length - 2] + [self.eot_id]
            out[i, : len(ids)] = ids
        return out


class BERTWordPieceTokenizer:
    """WordPiece tokenizer with BERT conventions — backs :class:`BERTEmbedder`
    (the reference uses HF BertTokenizerFast, ``modules.py:53-77``: [CLS] +
    tokens + [SEP], pad with [PAD]=0, truncate to max_length).

    Vocab: a BERT ``vocab.txt`` (one token per line, ## continuation pieces),
    or any dict for tests.
    """

    def __init__(self, vocab, lowercase: bool = True):
        if isinstance(vocab, str):
            with open(vocab, encoding="utf-8") as f:
                tokens = [l.rstrip("\n") for l in f]
            vocab = {t: i for i, t in enumerate(tokens)}
        self.vocab = dict(vocab)
        self.lowercase = lowercase
        self.pad_id = self.vocab.get("[PAD]", 0)
        self.cls_id = self.vocab.get("[CLS]", 101)
        self.sep_id = self.vocab.get("[SEP]", 102)
        self.unk_id = self.vocab.get("[UNK]", 100)

    def _split(self, text: str) -> List[str]:
        import regex as re

        text = _clean(text)
        if self.lowercase:
            text = text.lower()
        return re.findall(r"[\p{L}\p{N}]+|[^\s\p{L}\p{N}]", text)

    def _wordpiece(self, word: str) -> List[int]:
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece_id = None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    piece_id = self.vocab[piece]
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_id]
            ids.append(piece_id)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for w in self._split(text):
            ids.extend(self._wordpiece(w))
        return ids

    def __call__(self, texts, context_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), context_length), self.pad_id, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.cls_id] + self.encode(text)[: context_length - 2] + [self.sep_id]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Vocabulary-free stand-in with the same call contract — deterministic
    word-hash ids. Lets pipelines/tests run where the BPE asset is absent;
    NOT compatible with released checkpoints' embeddings."""

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size
        self.sot_id = vocab_size - 2
        self.eot_id = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        import hashlib

        ids = []
        for w in _clean(text).split():
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(h % (self.vocab_size - 2))
        return ids

    def __call__(self, texts, context_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), context_length), self.eot_id, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text)[: context_length - 2] + [self.eot_id]
            out[i, : len(ids)] = ids
        return out
