"""Data-parallel sampling over a device mesh.

The reference has no multi-device inference at all (SURVEY.md §2.10 — DDP is
training-only); this is the TPU-native batch-scaling path for serving:
replicate params, shard the image batch over the mesh's 'data' axis, and jit
the whole sampler scan — GSPMD partitions every step, CFG doubling included,
with zero collectives in the hot loop (pure data parallelism; collectives
only appear if tensor-parallel PartitionSpecs are added on the 'model' axis).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.parallel.mesh import data_sharding, replicated

__all__ = ["sharded_sample"]


def sharded_sample(
    mesh: Mesh,
    sampler_fn: Callable,
    model_fn,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    uncond=None,
    params=None,
    param_shardings=None,
    **sampler_kwargs,
):
    """Run ``sampler_fn`` (ddim_sample / plms_sample / dpm_solver_sample)
    with the batch sharded over ``mesh``'s data axis.

    ``shape[0]`` must divide by the data-axis size. Conditioning pytrees are
    batch-sharded alongside.

    Params: pass ``params`` (with ``model_fn(params, x, t, cond)``) so the
    weights ride as jit ARGUMENTS — replicated over the mesh by default, or
    per-leaf ``param_shardings`` for tensor-parallel layouts. A bare
    ``model_fn(x, t, cond)`` closure still works, but closures embed weights
    as program constants (multi-GB flagship programs, no checkpoint
    hot-swap — see LatentDiffusion.runtime_params); only use it for small
    models/tests.
    """
    n_data = mesh.shape["data"]
    assert shape[0] % n_data == 0, (
        f"batch {shape[0]} must divide data axis {n_data}"
    )

    def place(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, data_sharding(mesh, jnp.ndim(x))), tree
        )

    cond = place(cond) if cond is not None else None
    uncond = place(uncond) if uncond is not None else None
    if params is not None:
        shardings = param_shardings if param_shardings is not None else (
            jax.tree.map(lambda _: replicated(mesh), params))
        params = jax.tree.map(jax.device_put, params, shardings)

    out_sharding = NamedSharding(mesh, P("data", None, None, None))

    @partial(jax.jit, out_shardings=out_sharding)
    def run(params, cond, uncond, rng):
        fn = model_fn if params is None else partial(model_fn, params)
        result = sampler_fn(
            fn, schedule, shape, cond, rng, uncond=uncond,
            **sampler_kwargs,
        )
        return result[0] if isinstance(result, tuple) else result

    with mesh:
        return run(params, cond, uncond, rng)
