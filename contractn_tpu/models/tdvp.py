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
def _evolve_two_site(L, w1, w2, R, theta, iters, coef, mask=None):
    """``mask`` (same shape as ``theta``, or None) keeps the whole
    Krylov basis on a structural subspace — the exact-U(1) sector hook
    (:mod:`contractn_tpu.models.u1`): with a channel-charge-definite
    MPO the masked matvec equals the unmasked one up to roundoff, and
    masking makes the conservation EXACT (``theta * (1-mask) == 0``
    identically along the trajectory)."""
    if mask is None:
        mv = None
    else:
        theta = theta * mask.astype(theta.dtype)

        def mv(t):
            return mask.astype(t.dtype) * _heff_matvec(L, w1, w2, R, t)

    if mv is None:
        def mv(t):
            return _heff_matvec(L, w1, w2, R, t)

    return _krylov_expm_apply(mv, theta, coef, iters)


@partial(jax.jit, static_argnums=(3,))
def _evolve_one_site(L, w, R, iters, m, coef, mask=None):
    if mask is None:
        def mv(t):
            return _h1_matvec(L, w, R, t)
    else:
        m = m * mask.astype(m.dtype)

        def mv(t):
            return mask.astype(t.dtype) * _h1_matvec(L, w, R, t)

    return _krylov_expm_apply(mv, m, coef, iters)


def tdvp_step(mpo, mps, dt, max_bond=None, imaginary=False, iters=16,
              masks=None, theta_masks=None, splitter=None):
    """One symmetric second-order two-site TDVP step.

    Args:
        mpo: Hamiltonian as an :class:`~contractn_tpu.models.mpo.MPO`.
        mps: current state.
        dt: time step (real scalar).
        max_bond: bond cap for the SVD splits (default: keep current).
        imaginary: evolve by ``exp(-dt H)`` (ground-state flow) instead
            of ``exp(-1j dt H)``.
        iters: Krylov dimension per local exponential.
        masks / theta_masks / splitter: structural-subspace hooks (the
            exact-U(1) path, :func:`~contractn_tpu.models.u1.tdvp_u1`):
            ``masks (n, d, D, D)`` one-site masks, ``theta_masks
            (n-1, d, d, D, D)`` two-site block masks, and a
            charge-aligned ``splitter(theta, i, to_left)`` replacing the
            plain SVD split (a plain SVD orders the mid-bond by singular
            value and masking after it annihilates the state — the
            :mod:`~contractn_tpu.models.u1` module doc).  Masked runs
            require a uniform-bond state (every site ``(d, D, D)``).

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

    masked = masks is not None
    if masked:
        # uniform static bond throughout (the dmrg_u1 convention):
        # boundary structure lives in the masks' dead slots
        from .ensemble import _boundary_env, _pad_boundary_sites

        if theta_masks is None or splitter is None:
            raise ValueError(
                "masked tdvp_step needs theta_masks and splitter")
        padded = _pad_boundary_sites(mps)
        padded = padded * masks.astype(padded.dtype)
        sites = [padded[i] for i in range(n)]
    else:
        sites = _ragged_sites(mps)
    if not imaginary:
        sites = [s.astype(jnp.result_type(s.dtype, jnp.complex64))
                 for s in sites]
    ws = [mpo.cores[i] for i in range(n)]
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    if masked:
        bond = sites[0].shape[1]
        L[0] = _boundary_env(mpo.left, bond, sites[0].dtype)
        R[n] = _boundary_env(mpo.right, bond, sites[0].dtype)
    else:
        L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
        R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    def smask(i):
        return masks[i] if masked else None

    def tmask(i):
        return theta_masks[i] if masked else None

    def split(theta, i, to_left):
        if splitter is None:
            return _split_theta(theta, max_bond, to_left)
        t1, t2 = splitter(theta, i, to_left)
        return (t1 * smask(i).astype(t1.dtype),
                t2 * smask(i + 1).astype(t2.dtype))

    def sweep(order, half_left_envs):
        """One half-sweep; ``order`` = site pairs in visit order."""
        for idx, i in enumerate(order):
            theta = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            theta = _evolve_two_site(
                L[i], ws[i], ws[i + 1], R[i + 2], theta, iters, fwd,
                mask=tmask(i),
            )
            last_pair = idx == len(order) - 1
            if half_left_envs:  # left -> right
                t1, t2 = split(theta, i, to_left=True)
                sites[i], sites[i + 1] = t1, t2
                L[i + 1] = _update_left(L[i], sites[i], ws[i])
                if not last_pair:
                    sites[i + 1] = _evolve_one_site(
                        L[i + 1], ws[i + 1], R[i + 2], iters,
                        sites[i + 1], bwd, mask=smask(i + 1),
                    )
            else:  # right -> left
                t1, t2 = split(theta, i, to_left=False)
                sites[i], sites[i + 1] = t1, t2
                R[i + 1] = _update_right(R[i + 2], sites[i + 1], ws[i + 1])
                if not last_pair:
                    sites[i] = _evolve_one_site(
                        L[i], ws[i], R[i + 1], iters, sites[i], bwd,
                        mask=smask(i),
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
                iters=16, masks=None, theta_masks=None, splitter=None):
    """Evolve ``n_steps`` TDVP steps; returns ``(mps, [energies])``."""
    mps = mps0
    energies = []
    for _ in range(n_steps):
        mps, e = tdvp_step(mpo, mps, dt, max_bond=max_bond,
                           imaginary=imaginary, iters=iters,
                           masks=masks, theta_masks=theta_masks,
                           splitter=splitter)
        energies.append(e)
    return mps, energies


def tdvp_evolve_driven(mpo_fn, mps0, dt, n_steps, max_bond=None,
                       iters=16, masks=None, theta_masks=None,
                       splitter=None):
    """TDVP under a TIME-DEPENDENT Hamiltonian ``H(t)``.

    ``mpo_fn(t)`` returns the MPO at time ``t``; each step evolves by
    the MIDPOINT Hamiltonian ``H(t + dt/2)`` — the exponential-midpoint
    rule, globally second order in ``dt`` for smooth drives (same order
    as the symmetric two-site sweep itself), so driving does not
    degrade the integrator.  Returns ``(mps, [energies])`` with the
    instantaneous midpoint energies.

    Beware shape churn: if ``mpo_fn`` builds a fresh MPO every call
    with the same bond dimensions, all steps share one compiled sweep;
    time-varying MPO bond dimensions force recompiles.
    """
    mps = mps0
    energies = []
    for k in range(n_steps):
        mpo_t = mpo_fn((k + 0.5) * dt)
        mps, e = tdvp_step(mpo_t, mps, dt, max_bond=max_bond,
                           imaginary=False, iters=iters, masks=masks,
                           theta_masks=theta_masks, splitter=splitter)
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
def _evolve_zero_site(L, R, iters, c, coef, mask=None):
    if mask is None:
        def mv(x):
            return _h0_matvec(L, R, x)
    else:
        c = c * mask.astype(c.dtype)

        def mv(x):
            return mask.astype(x.dtype) * _h0_matvec(L, R, x)

    return _krylov_expm_apply(mv, c, coef, iters)


def tdvp1_step(mpo, mps, dt, imaginary=False, iters=16, masks=None,
               bond_masks=None, orth=None):
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

    ``masks (n, d, D, D)`` / ``bond_masks (n+1, D, D)`` / ``orth =
    (fwd, bwd)`` are the exact-U(1) hooks
    (:func:`~contractn_tpu.models.u1.tdvp1_u1`).  Masked runs REQUIRE
    ``orth`` — a charge-aligned partial-isometry orthogonalizer
    replacing the plain QR gauge moves: plain QR fills rank-deficient
    columns with arbitrary orthonormal junk, and masking that junk
    breaks Q's orthogonality, corrupting the environments at O(1)
    (:func:`~contractn_tpu.models.u1._aligned_ortho`).  Masked runs
    require a uniform-bond state.

    Returns ``(new_mps, energy)`` like :func:`tdvp_step`.
    """
    n = mps.n_sites
    if n < 2:
        raise ValueError("tdvp1_step needs at least 2 sites")
    fwd = -0.5 * dt if imaginary else -0.5j * dt
    bwd = -fwd

    masked = masks is not None
    if masked:
        from .ensemble import _boundary_env, _pad_boundary_sites

        if bond_masks is None or orth is None:
            raise ValueError(
                "masked tdvp1_step needs bond_masks and orth (plain QR "
                "junk columns corrupt masked environments; see "
                "u1._aligned_ortho)")
        padded = _pad_boundary_sites(mps)
        padded = padded * masks.astype(padded.dtype)
        sites = [padded[i] for i in range(n)]
    else:
        sites = _ragged_sites(mps)
    if not imaginary:
        sites = [s.astype(jnp.result_type(s.dtype, jnp.complex64))
                 for s in sites]
    ws = [mpo.cores[i] for i in range(n)]
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    if masked:
        bond = sites[0].shape[1]
        L[0] = _boundary_env(mpo.left, bond, sites[0].dtype)
        R[n] = _boundary_env(mpo.right, bond, sites[0].dtype)
    else:
        L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
        R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    def smask(i):
        return masks[i] if masked else None

    def bmask(b):
        return bond_masks[b] if masked else None

    def remask(t, m):
        return t if m is None else t * m.astype(t.dtype)

    # left -> right: forward half-steps, backward bond steps between
    for i in range(n):
        sites[i] = _evolve_one_site(L[i], ws[i], R[i + 1], iters,
                                    sites[i], fwd, mask=smask(i))
        if i < n - 1:
            d, dl, dr = sites[i].shape
            if orth is not None:
                q, r = orth[0](sites[i].reshape(d * dl, dr), i)
            else:
                q, r = jnp.linalg.qr(sites[i].reshape(d * dl, dr))
            sites[i] = remask(q.reshape(d, dl, -1), smask(i))
            L[i + 1] = _update_left(L[i], sites[i], ws[i])
            c = _evolve_zero_site(L[i + 1], R[i + 1], iters,
                                  remask(r, bmask(i + 1)), bwd,
                                  mask=bmask(i + 1))
            sites[i + 1] = peinsum("kp,dpq->dkq", c, sites[i + 1])

    # right -> left: mirrored half-sweep (LQ splits)
    for i in range(n - 1, -1, -1):
        sites[i] = _evolve_one_site(L[i], ws[i], R[i + 1], iters,
                                    sites[i], fwd, mask=smask(i))
        if i > 0:
            d, dl, dr = sites[i].shape
            mat = sites[i].transpose(1, 0, 2).reshape(dl, d * dr)
            # mat = C . Q with Q's rows orthonormal: QR the transpose
            # (plain transpose — rows of Q^T satisfy Q^T conj(Q) = I,
            # the right-isometry condition, for complex tensors too)
            if orth is not None:
                q2, r2 = orth[1](mat.T, i)
            else:
                q2, r2 = jnp.linalg.qr(mat.T)
            sites[i] = remask(
                q2.T.reshape(-1, d, dr).transpose(1, 0, 2), smask(i))
            R[i] = _update_right(R[i + 1], sites[i], ws[i])
            c = _evolve_zero_site(L[i], R[i], iters,
                                  remask(r2.T, bmask(i)), bwd,
                                  mask=bmask(i))
            sites[i - 1] = peinsum("dpq,qk->dpk", sites[i - 1], c)

    nrm = jnp.maximum(jnp.linalg.norm(sites[0]), 1e-300)
    sites[0] = sites[0] / nrm

    dtype = np.asarray(sites[0]).dtype
    out = _rebuild_uniform(sites, dtype)
    return out, _rayleigh(mpo, out)


def tdvp1_evolve(mpo, mps0, dt, n_steps, imaginary=False, iters=16,
                 masks=None, bond_masks=None, orth=None):
    """Evolve ``n_steps`` single-site TDVP steps; ``(mps, [energies])``."""
    mps = mps0
    energies = []
    for _ in range(n_steps):
        mps, e = tdvp1_step(mpo, mps, dt, imaginary=imaginary,
                            iters=iters, masks=masks,
                            bond_masks=bond_masks, orth=orth)
        energies.append(e)
    return mps, energies
