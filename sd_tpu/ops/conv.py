"""3x3 convolution with Winograd dispatch (drop-in for ``nn.Conv``).

Every stride-1 SAME 3x3 conv in the resblock stacks
(``ldm/modules/diffusionmodules/openaimodel.py:163-275``,
``model.py:82-141``) goes through ``Conv3x3``: identical param tree to
``flax.linen.Conv`` (``kernel`` [3,3,Cin,Cout] HWIO + ``bias`` [Cout]), so
checkpoints and the torch weight porter are unaffected. On TPU bf16 at
supported shapes it dispatches to the Winograd F(2x2,3x3) Pallas kernel
(``sd_tpu/ops/pallas/winograd_conv.py`` — 2.25x fewer MXU MACs than XLA's
direct lowering); everywhere else it computes the direct XLA conv.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_tpu.ops.pallas.winograd_conv import winograd_conv3x3, winograd_supported
from sd_tpu.ops.quant import int8_conv3x3, int8_enabled

__all__ = ["Conv3x3"]


class Conv3x3(nn.Module):
    """NHWC 3x3 stride-1 SAME conv; param tree identical to ``nn.Conv``.

    ``impl``: ``"auto"`` (Winograd where supported & measured faster),
    ``"xla"`` (always direct), ``"winograd"`` (force the kernel — tests).
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[Any] = None
    impl: str = "auto"
    interpret: bool = False  # interpret-mode kernel (CPU tests)
    params_only: bool = False  # declare + return (kernel, bias), no compute

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        if self.params_only:
            # the fused resblock path folds this conv into a Pallas kernel
            # (ops/pallas/fused_conv.py) — same param tree, different math
            return kernel, bias
        # dtype=None mirrors nn.Conv: promote (input, fp32 params)
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x = x.astype(dtype)
        use_wino = self.impl == "winograd" or (
            self.impl == "auto"
            and winograd_supported(x.shape, kernel.shape, dtype))
        if self.impl == "auto" and not use_wino and int8_enabled(
                x.shape, dtype):
            # opt-in W8A8 serving mode (SD_TPU_INT8) — see ops/quant.py.
            # When the pipeline loaded a load-time weight-quantization
            # overlay (ops/quant.py::prequantize_weights, passed to apply as
            # the "qw" collection), consume the int8 kernel directly: inside
            # lax.scan sampler programs the inline re-quantize is NOT
            # LICM-hoisted and costs a measured 1.6 ms/CFG-step
            # (tools/exp_wq_hoist.py).
            prequant = None
            if self.has_variable("qw", "kq"):
                prequant = (self.variable("qw", "kq").value,
                            self.variable("qw", "sw").value)
            return int8_conv3x3(x, kernel, bias, dtype, prequant=prequant)
        if use_wino:
            y = winograd_conv3x3(x, kernel, interpret=self.interpret)
        else:
            # r3 in-context finding (tools/exp_fused_conv.py): XLA fuses the
            # GN+SiLU producer into the conv's input reads and recomputes it
            # per tap, dropping those convs to 40-60% of bound. The barrier
            # materializes the producer once; the conv then runs clean.
            if _conv_input_barrier():
                x = jax.lax.optimization_barrier(x)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dtype)


def _conv_input_barrier() -> bool:
    # read at trace time (default pending in-context measurement —
    # tools/exp_fused_conv.py)
    return os.environ.get("SD_TPU_CONV_IN_BARRIER", "0") == "1"
