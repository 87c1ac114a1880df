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


def sample_conditional(mps, key, num_samples, observed):
    """Exact conditional sampling (inpainting): draw the FREE sites of
    ``observed`` (``(N,)`` ints, ``-1`` = free) from
    ``p(x_free | x_obs)``.

    Clamping the observed sites inside the plain autoregressive sweep
    would be WRONG — each free conditional must also condition on the
    observations yet to come (GHZ with only the last site observed is
    the sharp counterexample: the clamped sampler draws site 0 from the
    50/50 marginal).  Instead the right environments are built with the
    observed sites PROJECTED onto their values and free sites traced —
    branchlessly, via per-site physical weight vectors ``w_s`` (ones
    when free, one-hot when observed), so the whole sampler stays two
    ``lax.scan`` programs: one sample-independent right-environment
    sweep, one batched forward draw.

    Returns ``(samples, log_prob)``: full ``(B, N)`` configurations
    (observed sites copied in) and the exact CONDITIONAL
    ``log p(x_free | x_obs)`` (only free sites accumulate).
    """
    cores = mps.cores  # (N, d, D, D)
    n_sites, phys_dim, bond, _ = cores.shape
    observed = jnp.asarray(observed, jnp.int32)
    w = jnp.where(
        (observed >= 0)[:, None],
        jax.nn.one_hot(jnp.clip(observed, 0), phys_dim,
                       dtype=cores.dtype),
        jnp.ones((n_sites, phys_dim), cores.dtype),
    )  # (N, d)

    # right marginal/projected environments, rescaled each step
    r_n = jnp.outer(mps.right, jnp.conj(mps.right)).astype(cores.dtype)

    def renv_step(r, inp):
        core, ws = inp
        nxt = peinsum("s,sij,jk,slk->il", ws, core, r, jnp.conj(core))
        scale = jnp.maximum(jnp.max(jnp.abs(nxt)), 1e-300)
        return nxt / scale, r

    _, renvs = jax.lax.scan(renv_step, r_n, (cores, w), reverse=True)
    # renvs[i] = environment strictly right of site i (scaled)

    v0 = jnp.broadcast_to(mps.left.astype(cores.dtype),
                          (num_samples, bond))
    rdt = jnp.zeros((), cores.dtype).real.dtype
    keys = jax.random.split(key, n_sites)

    def step(carry, inp):
        v, logp = carry
        core, r, obs, ws, k = inp
        u = peinsum("bi,sij->bsj", v, core)  # (B, d, D)
        weight = jnp.real(peinsum("bsj,jk,bsk->bs", u, r,
                                  jnp.conj(u)))
        weight = jnp.clip(weight, 0.0, None) * ws[None, :]
        total = jnp.sum(weight, axis=1, keepdims=True)
        logits = jnp.log(weight + 1e-300)
        drawn = jax.random.categorical(k, logits, axis=1)
        choice = jnp.where(obs >= 0, obs, drawn)
        v = jnp.take_along_axis(u, choice[:, None, None], axis=1)[:, 0]
        nrm = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=1,
                               keepdims=True))
        v = v / jnp.maximum(nrm, 1e-300)
        p = (jnp.take_along_axis(weight, choice[:, None], 1)[:, 0]
             / total[:, 0])
        logp = logp + jnp.where(obs >= 0, 0.0,
                                jnp.log(p + 1e-300)).astype(rdt)
        return (v, logp), choice

    (v, logp), samples = jax.lax.scan(
        step, (v0, jnp.zeros((num_samples,), rdt)),
        (cores, renvs, observed, w, keys),
    )
    return samples.T.astype(jnp.int32), logp
