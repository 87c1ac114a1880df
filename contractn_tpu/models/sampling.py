"""Exact autoregressive sampling from MPS Born machines.

An MPS defines the distribution ``p(x) = |psi(x)|^2 / <psi|psi>``.  In
right-canonical form the chain of conditionals collapses to a single
left-to-right scan: with carry ``v`` (the normalized prefix environment),
``p(x_n = d | prefix) = ||v A_d||^2 / sum_d' ||v A_d'||^2``, and the
right-isometry property makes those conditionals exact marginals — no
summation over suffixes ever happens.  The whole sampler is one jitted
``lax.scan`` batched over samples: per site one ``(B, D) x (D, d*D)`` GEMM
(the same MXU shape as evaluation) plus a categorical draw.

This is a generative-model serving capability the reference does not have.
"""

import jax
import jax.numpy as jnp

from .canonical import right_canonicalize
from ..ops.stabilize import peinsum


def sample_canonical(mps_rc, key, num_samples):
    """Draw samples from a RIGHT-CANONICAL MPS (see :func:`sample`).

    Returns ``(samples, log_prob)``: ``(B, N)`` int32 configurations and
    their exact log-probabilities ``log p(x)``.
    """
    cores = mps_rc.cores  # (N, d, D, D)
    n_sites, phys_dim, bond, _ = cores.shape
    v0 = jnp.broadcast_to(mps_rc.left, (num_samples, bond)).astype(
        cores.dtype
    )
    keys = jax.random.split(key, n_sites)

    def step(carry, inp):
        v, logp = carry
        core, k = inp
        mat = core.transpose(1, 0, 2).reshape(bond, phys_dim * bond)
        u = peinsum("bi,ik->bk", v, mat).reshape(
            num_samples, phys_dim, bond)
        weight = jnp.sum(jnp.abs(u) ** 2, axis=2)  # (B, d)
        total = jnp.sum(weight, axis=1, keepdims=True)
        logits = jnp.log(weight + 1e-300)
        choice = jax.random.categorical(k, logits, axis=1)  # (B,)
        v = jnp.take_along_axis(
            u, choice[:, None, None], axis=1
        )[:, 0]  # (B, D)
        norm = jnp.sqrt(jnp.take_along_axis(weight, choice[:, None], 1))
        v = v / jnp.maximum(norm, 1e-300)
        logp = logp + (
            jnp.log(jnp.take_along_axis(weight, choice[:, None], 1)[:, 0])
            - jnp.log(total[:, 0])
        )
        return (v, logp), choice

    (v, logp), samples = jax.lax.scan(
        step, (v0, jnp.zeros((num_samples,), jnp.float64 if
                             cores.dtype == jnp.float64 else jnp.float32)),
        (cores, keys),
    )
    return samples.T, logp  # (B, N), (B,)


def sample(mps, key, num_samples):
    """Draw exact samples from ``|psi|^2 / <psi|psi>``.

    Right-canonicalizes first (a QR sweep); for repeated sampling from the
    same state, canonicalize once with
    :func:`contractn_tpu.models.canonical.right_canonicalize` and call
    :func:`sample_canonical` directly.
    """
    mps_rc, _ = right_canonicalize(mps)
    return sample_canonical(mps_rc, key, num_samples)
