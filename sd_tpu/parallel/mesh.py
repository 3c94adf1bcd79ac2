"""Mesh + sharding specs — the framework's entire distribution story.

The reference's parallelism is Lightning DDP over NCCL (one line,
``main.py:521``; SURVEY.md §2.10). The TPU-native equivalent is GSPMD: define
a ``jax.sharding.Mesh``, annotate array shardings, and let XLA insert the
collectives over ICI. No communication library to write — this module is the
"sharding spec module" SURVEY.md §5.8 calls for:

- ``('data',)`` mesh for pure data parallelism (batch-sharded inputs,
  replicated params — DDP equivalent; gradients mean-reduced by GSPMD);
- ``('data', 'model')`` mesh prepared for tensor-parallel attention/FF
  sharding of larger backbones (SURVEY.md §2.10 TP row).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "zero_sharding",
    "zero_state_sharding",
    "is_main_process",
]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data',) or ('data', 'model') mesh over the available devices.

    On a real slice, device order follows ``jax.devices()`` (ICI-contiguous);
    multi-slice layouts should shard 'data' over DCN and 'model' over ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-axis sharding for activations/inputs: [B, ...] over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays batch-sharded on the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (DP). TP layouts override this
    with per-leaf PartitionSpecs."""
    return jax.device_put(params, replicated(mesh))


def zero_sharding(mesh: Mesh, tree, axis: str = "data"):
    """ZeRO-1 placement for a params-shaped pytree (SURVEY.md §2.10): shard
    each leaf's largest divisible dimension over the data axis, replicate
    leaves too small to split. Returns a NamedSharding pytree usable with
    ``jax.device_put`` / jit shardings.

    With params replicated and AdamW moments sharded this way, GSPMD compiles
    the optimizer update per-shard and all-gathers the parameter delta — the
    standard ZeRO-1 communication pattern, expressed purely as shardings.
    """
    n = mesh.shape[axis]

    def spec(leaf):
        shape = np.shape(leaf)
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[i] % n == 0 and shape[i] >= n:
                return NamedSharding(
                    mesh, P(*[axis if j == i else None for j in range(len(shape))])
                )
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def zero_state_sharding(mesh: Mesh, state, axis: str = "data"):
    """Sharding tree for a TrainState NamedTuple: params and step replicated
    (DP), optimizer moments and the EMA shadow ZeRO-sharded over ``axis``."""
    repl = replicated(mesh)
    full = jax.tree.map(lambda _: repl, state)
    parts = {"opt_state": zero_sharding(mesh, state.opt_state, axis)}
    ema = getattr(state, "ema", None)
    if ema is not None:
        parts["ema"] = type(ema)(
            shadow=zero_sharding(mesh, ema.shadow, axis),
            num_updates=repl,
            decay=jax.tree.map(lambda _: repl, ema.decay),
        )
    return full._replace(**parts)


def is_main_process() -> bool:
    """rank_zero_only equivalent (``main.py:309`` etc.)."""
    return jax.process_index() == 0
