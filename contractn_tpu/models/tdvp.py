"""TDVP (two-site and single-site): real-/imaginary-time MPS evolution.

The time-dependent variational principle (Haegeman et al.) projects the
Schrodinger flow onto the MPS manifold.  The two-site integrator reuses
this framework's DMRG machinery (environments and effective-Hamiltonian
matvecs from :mod:`contractn_tpu.models.dmrg`): one left-to-right sweep
evolves each two-site block *forward* by ``dt/2`` under ``H_eff`` and
each single-site center *backward* by ``dt/2`` under ``H1_eff``, the
mirror sweep completes a second-order symmetric step.  Local propagators
are Krylov exponentials — a device-side Lanczos (``lax.fori_loop``, no
per-iteration host syncs) followed by an eigendecomposition of the small
tridiagonal, ``exp(c T) e1`` — so each local step costs a handful of
``H_eff`` matvecs, never a dense matrix.

Real time (``1j * dt``) conserves norm and energy to integrator order;
imaginary time (``dt``) flows toward the ground state (a TDVP
alternative to DMRG that stays on the constant-bond manifold).

The SINGLE-site integrator (:func:`tdvp1_step`) evolves one site at a
time with zero-site (bond-center) backward steps between sites.  Its
manifold projection is exact — no SVD truncation ever happens — so
real-time norm/energy conservation holds to Krylov tolerance and the
bond dimension never changes.  Use it when the bond is already where
you want it; use the two-site variant to let the bond grow.

No counterpart in the reference (contraction only); an additive model-
family capability of this framework.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.krylov import lanczos_basis as _lanczos_basis
from ..ops.krylov import masked_tridiagonal as _masked_tridiagonal
from ..ops.stabilize import dot_precision, peinsum
from .mpo import rayleigh as _rayleigh
from .dmrg import (
    _heff_matvec,
    _ragged_sites,
    _rebuild_uniform,
    _split_theta,
    _update_left,
    _update_right,
)


def _h1_matvec(L, w, R, m):
    """One-site effective Hamiltonian: ``m (d, Dl, Dr) -> same shape``."""
    t = peinsum("iwp,Bpq->iwBq", L, m)
    t = peinsum("XBwv,iwBq->iXvq", w, t)
    return peinsum("kvq,iXvq->Xik", R, t)


def _krylov_expm_apply(matvec, v0, coef, iters):
    """``exp(coef * H) v0`` through an ``iters``-dim Krylov space.

    ``coef`` may be complex (real-time evolution).  The 1e30 diagonal
    masking of exhausted steps makes their ``exp(coef * 1e30)`` weights
    irrelevant: the eigenvectors of the decoupled (beta = 0) block have
    zero overlap with ``e1``, so masked steps contribute nothing.
    """
    basis, alphas, betas, nrm0 = _lanczos_basis(matvec, v0, iters)
    tri = _masked_tridiagonal(alphas, betas)
    vals, vecs = jnp.linalg.eigh(tri)
    # exp(coef * tri) e1 = U exp(coef * vals) U^T e1
    cdt = jnp.result_type(v0.dtype, jnp.asarray(coef).dtype)
    z = jnp.asarray(coef, cdt) * vals.astype(cdt)
    if jnp.issubdtype(cdt, jnp.complexfloating):
        expvals = jnp.exp(z)  # real-time: |exp(i x)| bounded
    else:
        # imaginary time with a positive coef (backward half-steps) would
        # overflow on the masked 1e30 diagonal; clamp — the masked
        # eigenvectors have exactly zero overlap with e1, so the clamped
        # weights multiply 0.
        expvals = jnp.exp(jnp.minimum(z, 650.0))
    w = peinsum("kj,j->k", vecs.astype(cdt),
                expvals * jnp.conj(vecs[0, :]).astype(cdt))
    out = peinsum("k,kd->d", w, basis[:-1].astype(cdt))
    return (nrm0.astype(cdt) * out).reshape(v0.shape)


@partial(jax.jit, static_argnums=(5,))
def _evolve_two_site(L, w1, w2, R, theta, iters, coef):
    return _krylov_expm_apply(
        lambda t: _heff_matvec(L, w1, w2, R, t), theta, coef, iters
    )


@partial(jax.jit, static_argnums=(3,))
def _evolve_one_site(L, w, R, iters, m, coef):
    return _krylov_expm_apply(
        lambda t: _h1_matvec(L, w, R, t), m, coef, iters
    )


def tdvp_step(mpo, mps, dt, max_bond=None, imaginary=False, iters=16):
    """One symmetric second-order two-site TDVP step.

    Args:
        mpo: Hamiltonian as an :class:`~contractn_tpu.models.mpo.MPO`.
        mps: current state.
        dt: time step (real scalar).
        max_bond: bond cap for the SVD splits (default: keep current).
        imaginary: evolve by ``exp(-dt H)`` (ground-state flow) instead
            of ``exp(-1j dt H)``.
        iters: Krylov dimension per local exponential.

    Returns:
        ``(new_mps, energy)`` — the evolved state in uniform stacked
        form (normalized; imaginary time is a projector flow, real time
        conserves the norm anyway) and the evolved state's energy.
    """
    n = mps.n_sites
    if n < 2:
        raise ValueError("tdvp_step needs at least 2 sites")
    max_bond = max_bond or mps.bond_dim
    fwd = -0.5 * dt if imaginary else -0.5j * dt
    bwd = -fwd

    sites = _ragged_sites(mps)
    if not imaginary:
        sites = [s.astype(jnp.result_type(s.dtype, jnp.complex64))
                 for s in sites]
    ws = [mpo.cores[i] for i in range(n)]
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
    R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    def sweep(order, half_left_envs):
        """One half-sweep; ``order`` = site pairs in visit order."""
        for idx, i in enumerate(order):
            theta = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            theta = _evolve_two_site(
                L[i], ws[i], ws[i + 1], R[i + 2], theta, iters, fwd
            )
            last_pair = idx == len(order) - 1
            if half_left_envs:  # left -> right
                t1, t2 = _split_theta(theta, max_bond, to_left=True)
                sites[i], sites[i + 1] = t1, t2
                L[i + 1] = _update_left(L[i], sites[i], ws[i])
                if not last_pair:
                    sites[i + 1] = _evolve_one_site(
                        L[i + 1], ws[i + 1], R[i + 2], iters,
                        sites[i + 1], bwd,
                    )
            else:  # right -> left
                t1, t2 = _split_theta(theta, max_bond, to_left=False)
                sites[i], sites[i + 1] = t1, t2
                R[i + 1] = _update_right(R[i + 2], sites[i + 1], ws[i + 1])
                if not last_pair:
                    sites[i] = _evolve_one_site(
                        L[i], ws[i], R[i + 1], iters, sites[i], bwd,
                    )

    sweep(list(range(n - 1)), half_left_envs=True)
    # rebuild right environments consumed by the forward sweep
    sweep(list(range(n - 2, -1, -1)), half_left_envs=False)

    # Normalize the center (site 0 after the backward sweep)
    nrm = jnp.maximum(jnp.linalg.norm(sites[0]), 1e-300)
    sites[0] = sites[0] / nrm

    dtype = np.asarray(sites[0]).dtype
    out = _rebuild_uniform(sites, dtype)

    # Energy of the OUTPUT state (cheap: environments are one pass)
    return out, _rayleigh(mpo, out)


def tdvp_evolve(mpo, mps0, dt, n_steps, max_bond=None, imaginary=False,
                iters=16):
    """Evolve ``n_steps`` TDVP steps; returns ``(mps, [energies])``."""
    mps = mps0
    energies = []
    for _ in range(n_steps):
        mps, e = tdvp_step(mpo, mps, dt, max_bond=max_bond,
                           imaginary=imaginary, iters=iters)
        energies.append(e)
    return mps, energies


# --------------------------------------------------------------------- #
# Single-site TDVP (TDVP1)
# --------------------------------------------------------------------- #


def _h0_matvec(L, R, c):
    """Zero-site (bond) effective Hamiltonian: ``c (Dl, Dr) -> same``."""
    t = peinsum("iwp,pq->iwq", L, c)
    return peinsum("jwq,iwq->ij", R, t)


@partial(jax.jit, static_argnums=(2,))
def _evolve_zero_site(L, R, iters, c, coef):
    return _krylov_expm_apply(
        lambda x: _h0_matvec(L, R, x), c, coef, iters
    )


def tdvp1_step(mpo, mps, dt, imaginary=False, iters=16):
    """One symmetric second-order SINGLE-site TDVP step (Haegeman et al.).

    The projection onto the fixed-bond MPS manifold is exact: real-time
    evolution conserves the norm and the energy to Krylov tolerance
    (the two-site variant trades that exactness for bond growth — its
    SVD truncation leaks norm/energy whenever the bond saturates).
    Per-site cost is one ``(d, D, D)`` Krylov exponential plus a QR,
    versus the two-site ``(d, d, D, D)`` exponential and ``(dD, dD)``
    SVD.  The bond dimension NEVER grows; start from a state with the
    bond you want (e.g. pad with :func:`~.canonical.compress_fixed`).

    Sweep structure: left-to-right evolves each site forward ``dt/2``
    with the bond center evolved backward ``dt/2`` between sites (QR
    split), then the mirrored right-to-left half-sweep.

    Returns ``(new_mps, energy)`` like :func:`tdvp_step`.
    """
    n = mps.n_sites
    if n < 2:
        raise ValueError("tdvp1_step needs at least 2 sites")
    fwd = -0.5 * dt if imaginary else -0.5j * dt
    bwd = -fwd

    sites = _ragged_sites(mps)
    if not imaginary:
        sites = [s.astype(jnp.result_type(s.dtype, jnp.complex64))
                 for s in sites]
    ws = [mpo.cores[i] for i in range(n)]
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
    R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    # left -> right: forward half-steps, backward bond steps between
    for i in range(n):
        sites[i] = _evolve_one_site(L[i], ws[i], R[i + 1], iters,
                                    sites[i], fwd)
        if i < n - 1:
            d, dl, dr = sites[i].shape
            q, r = jnp.linalg.qr(sites[i].reshape(d * dl, dr))
            sites[i] = q.reshape(d, dl, -1)
            L[i + 1] = _update_left(L[i], sites[i], ws[i])
            c = _evolve_zero_site(L[i + 1], R[i + 1], iters, r, bwd)
            sites[i + 1] = peinsum("kp,dpq->dkq", c, sites[i + 1])

    # right -> left: mirrored half-sweep (LQ splits)
    for i in range(n - 1, -1, -1):
        sites[i] = _evolve_one_site(L[i], ws[i], R[i + 1], iters,
                                    sites[i], fwd)
        if i > 0:
            d, dl, dr = sites[i].shape
            mat = sites[i].transpose(1, 0, 2).reshape(dl, d * dr)
            # mat = C . Q with Q's rows orthonormal: QR the transpose
            # (plain transpose — rows of Q^T satisfy Q^T conj(Q) = I,
            # the right-isometry condition, for complex tensors too)
            q2, r2 = jnp.linalg.qr(mat.T)
            sites[i] = q2.T.reshape(-1, d, dr).transpose(1, 0, 2)
            R[i] = _update_right(R[i + 1], sites[i], ws[i])
            c = _evolve_zero_site(L[i], R[i], iters, r2.T, bwd)
            sites[i - 1] = peinsum("dpq,qk->dpk", sites[i - 1], c)

    nrm = jnp.maximum(jnp.linalg.norm(sites[0]), 1e-300)
    sites[0] = sites[0] / nrm

    dtype = np.asarray(sites[0]).dtype
    out = _rebuild_uniform(sites, dtype)
    return out, _rayleigh(mpo, out)


def tdvp1_evolve(mpo, mps0, dt, n_steps, imaginary=False, iters=16):
    """Evolve ``n_steps`` single-site TDVP steps; ``(mps, [energies])``."""
    mps = mps0
    energies = []
    for _ in range(n_steps):
        mps, e = tdvp1_step(mpo, mps, dt, imaginary=imaginary, iters=iters)
        energies.append(e)
    return mps, energies
