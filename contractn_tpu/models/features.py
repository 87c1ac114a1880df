"""Input feature maps: raw data -> the ``(B, N, d)`` site-input format.

MPS machine-learning models consume one weight vector per site; these are
the standard encodings (one-hot for discrete data, the trigonometric map of
Stoudenmire & Schwab for continuous features).  All are pure jnp functions —
vmap/jit/grad-safe — and compose directly with
:meth:`contractn_tpu.models.MPS.evaluate`.
"""

import jax.numpy as jnp


def one_hot(values, phys_dim, dtype=jnp.float32):
    """Discrete configurations ``(B, N)`` -> one-hot inputs ``(B, N, d)``."""
    values = jnp.asarray(values)
    return jnp.asarray(
        values[..., None] == jnp.arange(phys_dim), dtype
    )


def trig_features(values, dtype=jnp.float32):
    """Continuous features in [0, 1] -> the d=2 trigonometric embedding
    ``[cos(pi x / 2), sin(pi x / 2)]`` (normalized per site)."""
    values = jnp.asarray(values, dtype)
    angle = 0.5 * jnp.pi * values
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def fourier_features(values, phys_dim, dtype=jnp.float32):
    """Continuous features in [0, 1] -> d-dimensional Fourier embedding."""
    values = jnp.asarray(values, dtype)
    ks = jnp.arange(phys_dim)
    phase = 2.0 * jnp.pi * values[..., None] * ks
    feats = jnp.where(ks % 2 == 0, jnp.cos(phase), jnp.sin(phase))
    return feats / jnp.sqrt(phys_dim)
