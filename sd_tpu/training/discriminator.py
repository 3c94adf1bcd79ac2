"""PatchGAN discriminator — in-repo rebuild of taming's NLayerDiscriminator
(pix2pix architecture), used by both VAE GAN losses (SURVEY.md §2.9).

Stack: 4x4 stride-2 conv + LeakyReLU, then (n_layers-1) x [4x4 stride-2 conv
+ BatchNorm + LeakyReLU], one stride-1 block, and a 1-channel head. Init
matches taming's ``weights_init`` (convs N(0, 0.02); BN scale N(1, 0.02)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["NLayerDiscriminator"]

conv_init = nn.initializers.normal(stddev=0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    kernel_init=conv_init, dtype=self.dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name=f"conv_{n}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=_bn_scale_init, dtype=jnp.float32,
                name=f"bn_{n}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        # 1-channel patch logits
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       kernel_init=conv_init, dtype=self.dtype, name="head")(x)
