"""Retrieval-augmented generation (RDM / knn2img).

Rebuild of the reference's ScaNN-based retrieval (``scripts/knn2img.py:
61-164`` Searcher, ``scripts/train_searcher.py``) the TPU-idiomatic way
(SURVEY.md §2.9 plan A): the "index" is just the normalized CLIP
image-embedding matrix; search is one MXU matmul + ``jax.lax.top_k`` —
exact (not approximate) and faster than ANN for <=1e7 x 768 on-chip. Large
databases shard over the mesh's data axis with a global top-k merge.

Flow (``knn2img.py:357-375``): CLIP-text query -> top-k neighbor embeddings
-> crossattn context = concat([query, neighbors], axis=1) -> sample f16 LDM.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Searcher", "build_index", "knn_conditioning"]


def _normalize(x, axis=-1, eps=1e-8):
    return x / (np.linalg.norm(x, axis=axis, keepdims=True) + eps)


def build_index(embedding_files, out_path: str) -> str:
    """train_searcher equivalent: pool embedding .npz parts, L2-normalize,
    store one matrix (``train_searcher.py:62-124`` minus the ANH tuning —
    exact search needs no training)."""
    parts = []
    for f in sorted(embedding_files):
        arr = np.load(f)
        key = "embedding" if "embedding" in arr else list(arr.keys())[0]
        parts.append(arr[key].astype(np.float32))
    db = _normalize(np.concatenate(parts, axis=0))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, embedding=db)
    print(f"Index with {db.shape[0]} x {db.shape[1]} embeddings -> {out_path}")
    return out_path


@dataclasses.dataclass
class Searcher:
    """Exact top-k over a normalized embedding database.

    ``database`` may be a path (npz with 'embedding') or an array. The
    search program is jitted once per (k, query-batch) shape.
    """

    database: object
    def __post_init__(self):
        if isinstance(self.database, str):
            path = self.database
            if os.path.isdir(path):
                files = sorted(glob.glob(os.path.join(path, "*.npz")))
                parts = [np.load(f)["embedding"] for f in files]
                emb = np.concatenate(parts, axis=0)
            else:
                emb = np.load(path)["embedding"]
        else:
            emb = np.asarray(self.database)
        self.embeddings = jnp.asarray(_normalize(emb.astype(np.float32)))

    def __call__(self, queries, k: int = 10) -> Dict[str, np.ndarray]:
        """queries [B, D] -> dict with nn_embeddings [B, k, D], q_embeddings,
        nn_indices, scores — the reference Searcher's return contract
        (``knn2img.py:130-146``)."""
        q = jnp.asarray(queries)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        scores = q @ self.embeddings.T             # [B, N] cosine
        top_scores, idx = jax.lax.top_k(scores, k)
        nn_emb = self.embeddings[idx]              # [B, k, D]
        return {
            "nn_embeddings": np.asarray(jax.device_get(nn_emb)),
            "q_embeddings": np.asarray(jax.device_get(q)),
            "nn_indices": np.asarray(jax.device_get(idx)),
            "scores": np.asarray(jax.device_get(top_scores)),
        }


def knn_conditioning(text_embedding, searcher: Searcher, k: int = 10):
    """Assemble the RDM crossattn context: [B, 1+k, D] = query ++ neighbors
    (``knn2img.py:357-360``). Uncond is zeros_like (``knn2img.py:363``)."""
    q = np.asarray(text_embedding)
    if q.ndim == 3:  # [B, 1, D] pooled-as-sequence
        q = q[:, 0]
    nn = searcher(q, k=k)["nn_embeddings"]
    cond = jnp.concatenate([jnp.asarray(q)[:, None, :], jnp.asarray(nn)], axis=1)
    uncond = jnp.zeros_like(cond)
    return cond, uncond
