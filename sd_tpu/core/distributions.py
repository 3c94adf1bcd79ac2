"""Latent-space distributions for the first-stage VAE.

Functional equivalent of the reference's
``ldm/modules/distributions/distributions.py:24-92`` — but with explicit PRNG
keys (TPU/JAX style) instead of implicit device RNG.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["DiagonalGaussian", "normal_kl"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Diagonal Gaussian posterior over latents.

    Built from the VAE encoder's 2C-channel moments tensor, exactly like the
    reference (``distributions.py:24-35``): channels split into (mean,
    logvar), logvar clamped to [-30, 20].
    """

    mean: jnp.ndarray
    logvar: jnp.ndarray
    deterministic: bool = False

    @classmethod
    def from_moments(cls, moments, deterministic: bool = False) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar, deterministic=deterministic)

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, rng):
        """Reparameterized sample. Ref: ``distributions.py:36-39``."""
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None):
        """KL divergence to another diagonal Gaussian (or N(0, I)).

        Ref: ``distributions.py:41-52`` — sums over all non-batch dims.
        """
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        reduce_axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=reduce_axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=reduce_axes,
        )

    def nll(self, sample, axes=None):
        """Negative log likelihood of ``sample``. Ref: ``distributions.py:54-59``."""
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        if axes is None:
            axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )

    # pytree protocol — lets a DiagonalGaussian flow through jit boundaries.
    def tree_flatten(self):
        return (self.mean, self.logvar), self.deterministic

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(mean=children[0], logvar=children[1], deterministic=aux)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Elementwise KL between two Gaussians. Ref: ``distributions.py:65-92``."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )
