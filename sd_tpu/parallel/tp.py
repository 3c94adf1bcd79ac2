"""Tensor-parallel parameter layouts for the UNet (SURVEY.md §2.10 TP row).

The reference has no tensor parallelism (Lightning DDP replicates the model,
``main.py:521``); on TPU the natural TP design is megatron-style sharding
over the mesh's 'model' axis, expressed purely as parameter PartitionSpecs —
GSPMD then places the collectives at the row-parallel boundaries and the
Pallas flash-attention kernel partitions over its head axis via the
``custom_partitioning`` rule registered in
``sd_tpu/ops/pallas/flash_attention.py`` (zero collectives around the
kernel; the all-reduce rides the ``to_out`` projection where it belongs).

Layout (axis = 'model', every rule gated on divisibility — non-divisible
leaves stay replicated, so any (mesh, model) combination is valid):

- attention ``to_q/to_k/to_v``: column-parallel ``P(None, 'model')``. The
  inner dim is heads*head_dim, so with heads % n == 0 the [B,N,H,D] reshape
  keeps the shard on the HEAD axis — each device runs flash attention on
  heads/n heads locally.
- attention ``to_out``: row-parallel ``P('model', None)`` — local partial
  matmuls, GSPMD all-reduces the sum; bias stays replicated (applied once,
  after the reduce).
- GEGLU FF ``proj_in/proj``: column-parallel; ``proj_out``: row-parallel.
  NOTE the GEGLU weight stores [x-half | gate-half] concatenated on the
  output dim (checkpoint layout, can't be reordered), so with n devices the
  value/gate halves land on different shards and GSPMD inserts one reshard
  before the elementwise ``x * gelu(gate)`` — correct, one extra collective
  per FF vs an interleaved layout. The fused GEGLU-FF Pallas kernel has no
  partition rule, so under TP it is bypassed in favor of the XLA path
  (``SD_TPU_FUSED_FF=0``) — XLA partitions its einsums natively.
- ResBlock pair: ``in_conv`` column-parallel on output channels
  ``P(None,None,None,'model')`` + ``emb_proj`` column-parallel (aligned
  per-channel add) + ``out_norm`` params channel-sharded + ``out_conv``
  row-parallel on INPUT channels ``P(None,None,'model',None)`` — one
  all-reduce per ResBlock, with the mid activations channel-sharded.
  GroupNorm(32) stats stay shard-local when 32 % n == 0 (group boundaries
  align with shard boundaries). ``emb_proj`` is sharded only when its output
  dim equals the conv channel count (``use_scale_shift_norm`` emits 2*C —
  the halves would split across shards; replicated instead).
- Everything else (norm params elsewhere, skip/downsample/upsample convs,
  time embedding, proj_in/proj_out of the SpatialTransformer) stays
  replicated — megatron keeps activations replicated between sublayers.

Use with ``sharded_sample(..., params=..., param_shardings=
unet_tp_specs(mesh, params))`` for latency-oriented multi-chip serving, or
``jax.device_put(params, unet_tp_specs(mesh, params))`` + jit for training.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["unet_tp_specs", "spatial_sharding"]


# (path regex, sharded dim index) — dim counts from the left of the kernel
# shape; matched top-to-bottom, first hit wins. ResBlock rules are anchored
# on a parent path segment so the UNet's TOP-LEVEL final conv (path
# "out_conv/kernel", the zero-init output projection) stays replicated — it
# would otherwise match and buy a gratuitous all-reduce on the full-res
# output tensor (caught by test_tp_allreduce_count, r5).
_RULES = (
    # attention projections
    (re.compile(r"attn\d/to_[qkv]/kernel$"), 1),    # column: heads
    (re.compile(r"attn\d/to_out/kernel$"), 0),      # row: all-reduce
    # GEGLU feed-forward
    (re.compile(r"ff/proj_in/proj/kernel$"), 1),    # column
    (re.compile(r"ff/proj_in/proj/bias$"), 0),
    (re.compile(r"ff/proj_out/kernel$"), 0),        # row: all-reduce
    # ResBlock megatron pair (kernels are HWIO)
    (re.compile(r"/in_conv/kernel$"), 3),           # column: out channels
    (re.compile(r"/in_conv/bias$"), 0),
    (re.compile(r"/emb_proj/kernel$"), 1),          # column (aligned add)
    (re.compile(r"/emb_proj/bias$"), 0),
    (re.compile(r"/out_norm/GroupNorm_0/(scale|bias)$"), 0),
    (re.compile(r"/out_conv/kernel$"), 2),          # row: in channels
)

_ATTN_RULES = ("to_q/", "to_k/", "to_v/", "to_out/")


# the ResBlock megatron pair keeps GroupNorm(32) stats shard-local only when
# shard boundaries align with group boundaries (32 % n == 0) — otherwise
# GSPMD inserts cross-shard stat reductions per ResBlock, defeating the
# one-all-reduce layout; gate the whole pair off in that case (ADVICE r4 #5)
_RESBLOCK_RULES = ("in_conv/", "emb_proj/", "out_norm/", "out_conv/")


def _leaf_spec(path: str, shape, n: int, axis: str, resblock_ok: bool = True,
               attn_ok: bool = True):
    for rule, dim in _RULES:
        if rule.search(path):
            if not resblock_ok and any(t in path for t in _RESBLOCK_RULES):
                return P()
            if not attn_ok and any(t in path for t in _ATTN_RULES):
                return P()
            if dim < len(shape) and shape[dim] % n == 0 and shape[dim] >= n:
                return P(*[axis if i == dim else None for i in range(len(shape))])
            return P()
    return P()


def unet_tp_specs(mesh: Mesh, params: Any, axis: str = "model",
                  num_heads: Optional[int] = None):
    """NamedSharding pytree for a UNet param tree: megatron TP over ``axis``.

    Leaves that do not match a rule, or whose sharded dim does not divide by
    the axis size, stay replicated — the result is always a valid placement.
    The ResBlock conv pair additionally requires ``32 % axis_size == 0`` so
    GroupNorm(32) stats stay shard-local (module docstring).

    ``num_heads`` gates the attention projections: sharding their inner
    ``heads*head_dim`` dim keeps whole heads per shard (local attention, one
    all-reduce at to_out) only when ``num_heads % axis_size == 0`` —
    otherwise heads SPLIT across shards and GSPMD must all-reduce every
    [B,H,N,N] score matrix instead (measured in test_tp_allreduce_count:
    +14 score all-reduces on a 7-block UNet with heads=4 on an 8-axis).
    Pass the model's head count (SD v1: 8); None keeps the projections
    replicated — safe, never score-reducing.

    Side effect: disables the fused GEGLU-FF Pallas kernel
    (``SD_TPU_FUSED_FF=0`` unless the operator already set it) — the kernel
    has no SPMD partition rule, and under TP the XLA einsum path partitions
    natively. The flash-attention kernel keeps running: its
    ``custom_partitioning`` rule shards the head axis.
    """
    import os

    os.environ.setdefault("SD_TPU_FUSED_FF", "0")
    n = mesh.shape[axis]
    resblock_ok = 32 % n == 0
    attn_ok = num_heads is not None and num_heads % n == 0
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(k.key) for k in p) for p, _ in flat]
    shapes = {pa: np.shape(l) for pa, (_, l) in zip(paths, flat)}

    # emb_proj is only TP-safe when its output matches the paired in_conv's
    # output channels (use_scale_shift_norm doubles it — the scale|shift
    # halves would split across shards)
    emb_ok = set()
    for pa in paths:
        if pa.endswith("emb_proj/kernel"):
            sib = pa.replace("emb_proj/kernel", "in_conv/kernel")
            if sib in shapes and shapes[pa][1] == shapes[sib][3]:
                emb_ok.add(pa)
                emb_ok.add(pa.replace("/kernel", "/bias"))

    specs = []
    for pa, (_, leaf) in zip(paths, flat):
        if "emb_proj/" in pa and pa not in emb_ok:
            specs.append(P())
        else:
            specs.append(_leaf_spec(pa, np.shape(leaf), n, axis,
                                    resblock_ok, attn_ok))
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def spatial_sharding(mesh: Mesh, axis: str = "model", ndim: int = 4):
    """Latency-mode activation sharding: split the image HEIGHT over ``axis``
    (NHWC dim 1). With params replicated, GSPMD turns every 3x3 conv into a
    shard-local conv plus a 1-row halo exchange over ICI, and all-gathers the
    (much smaller) latent tokens at attention sites — the standard TPU recipe
    for scaling a SINGLE image across chips when there is no batch to shard
    (batch-1 serving, big-canvas generation).
    """
    return NamedSharding(mesh, P(None, axis, *([None] * (ndim - 2))))
