"""Shared device-side Lanczos machinery.

One implementation of the subtle parts — double Gram-Schmidt
reorthogonalization, branchless Krylov-exhaustion masking, and the
well-conditioned tridiagonal assembly — consumed by the DMRG ground /
penalized solvers and the TDVP Krylov exponentials.  History shows why
this must not be duplicated: round 2 fixed two corruption modes here
(single-pass reorthogonalization losing orthogonality near exhaustion;
1e30 diagonal markers destroying eigh's precision on the valid block).
"""

import jax
import jax.numpy as jnp

from .stabilize import dot_precision


def lanczos_basis(matvec, v0, iters):
    """Device-side Lanczos: returns ``(basis, alphas, betas, nrm0)``.

    ``basis (iters + 1, dim)`` rows are the Krylov vectors (zero rows
    after exhaustion), ``alphas`` carry 1e30 markers on exhausted steps
    (feed them to :func:`masked_tridiagonal`, never to eigh directly),
    and ``nrm0`` is ``|v0|`` (the basis starts from ``v0 / nrm0``).
    Runs as one ``lax.fori_loop`` with zero host syncs; jit it from the
    caller (shapes are static per call site).
    """
    dim = v0.size
    dt = v0.dtype
    rdt = jnp.zeros((), dt).real.dtype
    prec = dot_precision(dt)
    shape = v0.shape

    nrm0 = jnp.maximum(jnp.linalg.norm(v0.reshape(-1)), 1e-300)
    basis0 = jnp.zeros((iters + 1, dim), dt).at[0].set(
        v0.reshape(-1) / nrm0
    )
    alphas0 = jnp.full((iters,), jnp.inf, rdt)
    betas0 = jnp.zeros((iters,), rdt)

    def body(j, carry):
        basis, alphas, betas, exhausted = carry
        v = basis[j]
        hv = matvec(v.reshape(shape)).reshape(-1)
        alpha = jnp.real(jnp.einsum("d,d->", jnp.conj(v), hv,
                                    precision=prec))
        # Full reorthogonalization against rows 0..j (later rows are
        # zero, so masking is implicit).  TWICE ("twice is enough",
        # Parlett): a single pass leaves an eps * ||hv|| / beta rogue
        # component near exhaustion that compounds into a non-orthogonal
        # basis and betas far above ||H||.
        for _ in range(2):
            proj = jnp.einsum("kd,d->k", jnp.conj(basis), hv,
                              precision=prec)
            hv = hv - jnp.einsum("k,kd->d", proj, basis, precision=prec)
        beta = jnp.linalg.norm(hv)
        alive = jnp.logical_and(~exhausted, beta > 1e-12)
        nxt = jnp.where(alive, hv / jnp.maximum(beta, 1e-300),
                        jnp.zeros_like(hv))
        basis = basis.at[j + 1].set(nxt)
        alphas = alphas.at[j].set(
            jnp.where(exhausted, jnp.asarray(1e30, rdt), alpha)
        )
        betas = betas.at[j].set(jnp.where(alive, beta, 0.0))
        return basis, alphas, betas, ~alive

    basis, alphas, betas, _ = jax.lax.fori_loop(
        0, iters, body, (basis0, alphas0, betas0, jnp.asarray(False))
    )
    return basis, alphas, betas, nrm0


def masked_tridiagonal(alphas, betas):
    """Lanczos tridiagonal with exhausted steps pushed out of the way.

    Exhausted steps carry a 1e30 diagonal marker.  Feeding that to eigh
    directly destroys the VALID eigenvalues (absolute eigh error scales
    with ``||T|| * eps`` = 1e30 * 1e-16 = 1e14).  Remap the marker to a
    value that dominates the valid spectrum by ~1e4 but keeps the
    matrix well-conditioned; the masked block's eigenvectors have
    exactly zero overlap with ``e1`` (its couplings are zero).
    """
    valid = alphas < 1e29
    scale = jnp.max(jnp.where(valid, jnp.abs(alphas), 0.0))
    scale = jnp.maximum(scale, jnp.max(jnp.abs(betas)))
    big = 1e4 * (1.0 + scale)
    diag = jnp.where(valid, alphas, big)
    return (jnp.diag(diag)
            + jnp.diag(betas[:-1], 1)
            + jnp.diag(betas[:-1], -1))


def lanczos_ground(matvec, v0, iters):
    """Lowest eigenpair of a Hermitian operator via :func:`lanczos_basis`.

    Returns ``(energy, vector)`` with the vector normalized.
    """
    prec = dot_precision(v0.dtype)
    basis, alphas, betas, _ = lanczos_basis(matvec, v0, iters)
    tri = masked_tridiagonal(alphas, betas)
    vals, vecs = jnp.linalg.eigh(tri)
    coeff = vecs[:, 0].astype(v0.dtype)
    vec = jnp.einsum("k,kd->d", coeff, basis[:-1], precision=prec)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec), 1e-300)
    return vals[0], vec.reshape(v0.shape)
