"""VUMPS: variational uniform MPS ground states.

The variational uniform matrix product state algorithm
(Zauner-Stauber et al.) finds infinite-chain ground states DIRECTLY in
the thermodynamic limit: a single-site unit cell in mixed canonical
gauge ``(AL, AR, AC, C)`` is updated from the ground states of two
effective Hamiltonians built from quasi-fixed-point MPO environments.
Unlike iTEBD there is no Trotter error, and unlike iDMRG the output IS
a uniform core — so the :mod:`~contractn_tpu.models.umps` tooling
(correlation lengths, correlators, expectation values) applies to it at
the solver's full precision.

Structure per iteration (all device-friendly):

1. left/right MPO environments ``FL, FR`` solved channel-by-channel for
   a triangular MPO — the corner (identity) channels need the
   energy-subtracted geometric series, solved by GMRES on the
   ``(D^2,)`` transfer system with the divergent direction projected
   out (the standard quasi-fixed-point trick);
2. ground states of ``H_AC`` (one site) and ``H_C`` (zero site) via the
   shared Lanczos (:mod:`contractn_tpu.ops.krylov`);
3. gauge update ``AL, AR`` from ``AC, C`` by polar decompositions;
   convergence is measured by the gradient norm
   ``|AC - AL C|`` (+ mirror).

The reference has no optimization, no infinite systems, and no
environments of any kind; this is the deepest additive algorithm in the
framework.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.krylov import lanczos_ground
from ..ops.stabilize import peinsum


# --------------------------------------------------------------------- #
# Mixed gauge
# --------------------------------------------------------------------- #


def _qr_pos(m):
    """QR with positive diagonal of R (unique gauge)."""
    q, r = jnp.linalg.qr(m)
    ph = jnp.sign(jnp.diagonal(r))
    ph = jnp.where(ph == 0, 1.0, ph)
    return q * ph[None, :], r * ph[:, None]


def left_gauge(a, iters=60):
    """``(AL, L)`` with ``A L_prev = L AL``... iterated QR fixed point:
    returns left-isometric ``AL (d, D, D)`` and the gauge ``L``."""
    d, bond, _ = a.shape
    el = jnp.eye(bond, dtype=a.dtype)

    def body(_, carry):
        lmat, _ = carry
        al_big = peinsum("ij,djk->dik", lmat, a).reshape(
            d * bond, bond
        )  # rows (d, i)
        # reshape rows as (i, d)? keep (d*i) consistent with split below
        q, r = _qr_pos(al_big)
        r = r / jnp.maximum(jnp.linalg.norm(r), 1e-300)
        return r, q.reshape(d, bond, bond)

    lmat, al = jax.lax.fori_loop(
        0, iters, body, (el, jnp.zeros_like(a))
    )
    return al, lmat


def right_gauge(a, iters=60):
    """Mirror: right-isometric ``AR`` with gauge ``R``."""
    ar_flip, rmat = left_gauge(a.transpose(0, 2, 1), iters)
    return ar_flip.transpose(0, 2, 1), rmat.T


def mixed_gauge(a, iters=60):
    """``(AL, AR, C)`` from a generic uniform core ``a``."""
    al, lmat = left_gauge(a, iters)
    ar, rmat = right_gauge(a, iters)
    c = peinsum("ij,jk->ik", lmat, rmat)
    # normalize and fix gauge via SVD of C (diagonalizes the bond basis)
    u, s, vh = jnp.linalg.svd(c)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    al = peinsum("ai,dij,jb->dab", jnp.conj(u).T, al, u)
    ar = peinsum("ai,dij,jb->dab", vh, ar, jnp.conj(vh).T)
    return al, ar, jnp.diag(s.astype(a.dtype))


# --------------------------------------------------------------------- #
# Quasi-fixed-point MPO environments (triangular MPO, identity corners)
# --------------------------------------------------------------------- #


def _transfer_apply(al, x, left=True):
    """``T(x)`` for the AL (or AR) transfer operator on a ``(D, D)``."""
    if left:  # x' = sum_s AL_s^H x AL_s
        t = peinsum("ij,djk->dik", x, al)
        return peinsum("dji,djk->ik", jnp.conj(al), t)
    t = peinsum("dij,jk->dik", al, x)
    return peinsum("dik,dlk->il", t, jnp.conj(al))


def _tr_pair(a, b):
    """``tr(a b)`` (the environment/density pairing)."""
    return peinsum("ij,ji->", a, b)


@partial(jax.jit, static_argnames=("left", "tol"))
def _geometric_solve(core, b, density, left=True, tol=1e-10):
    """Quasi-fixed-point solve for a corner (identity) MPO channel.

    Solves ``x - T(x) + tr(density x) I = b - tr(density b) I`` by GMRES
    — the energy-subtracted geometric series ``sum_k T^k b``.  ``T`` is
    the transfer map of the ISOMETRIC core (left: ``x -> sum_s A_s^H x
    A_s`` whose unit eigenvector is I with adjoint fixed point
    ``density = C C^H``; right: the mirror with ``density = C^H C``).
    """
    bond = core.shape[1]
    eye = jnp.eye(bond, dtype=b.dtype)

    def matvec(xv):
        x = xv.reshape(bond, bond)
        tx = _transfer_apply(core, x, left=left)
        corr = _tr_pair(density, x) * eye
        return (x - tx + corr).reshape(-1)

    rhs = b - _tr_pair(density, b) * eye
    sol, _ = jax.scipy.sparse.linalg.gmres(
        matvec, rhs.reshape(-1), x0=jnp.zeros(bond * bond, b.dtype),
        tol=tol, atol=0.0, maxiter=200, solve_method="batched",
    )
    return sol.reshape(bond, bond)


@partial(jax.jit, static_argnames=("left", "tol"))
def _interior_solve(core, b, op, left=True, tol=1e-10):
    """Solve ``x = b + T_op(x)`` for an interior diagonal channel whose
    dressed transfer map is a strict contraction (e.g. ``lambda * I``
    with ``|lambda| < 1`` — exponentially decaying interactions)."""
    bond = core.shape[1]

    def dressed(x):
        if left:
            t = peinsum("ij,djk->dik", x, core)
            t = peinsum("sd,dik->sik", op, t)
            return peinsum("sji,sjk->ik", jnp.conj(core), t)
        t = peinsum("dij,jk->dik", core, x)
        t = peinsum("sd,dik->sik", op, t)
        return peinsum("sik,slk->il", t, jnp.conj(core))

    def matvec(xv):
        x = xv.reshape(bond, bond)
        return (x - dressed(x)).reshape(-1)

    sol, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b.reshape(-1), x0=jnp.zeros(bond * bond, b.dtype),
        tol=tol, atol=0.0, maxiter=200, solve_method="batched",
    )
    return sol.reshape(bond, bond)


def mpo_environments(al, ar, c, w, tol=1e-10):
    """``(FL (W, D, D), FR (W, D, D), energy)`` for a triangular MPO cell.

    ``w (d, d, W, W)`` upper-triangular with identity at ``[0, 0]`` and
    ``[W-1, W-1]`` (the convention of ``tfim_mpo`` / ``heisenberg_mpo``
    / ``mpo_from_bond_term``).  Energy per site comes from the corner
    channels' divergence rate.
    """
    d, _, nw, _ = w.shape
    if nw < 2:
        raise ValueError(
            "mpo_environments needs a triangular MPO with W >= 2 "
            f"(identity corners); got W = {nw}"
        )
    bond = al.shape[1]
    dt = al.dtype

    # fixed points of the AL transfer: left = I (isometry), right = rho
    rho_r = peinsum("ij,kj->ik", c, jnp.conj(c))  # C C^H
    rho_r = rho_r / jnp.trace(rho_r)
    eye = jnp.eye(bond, dtype=dt)

    def t_channel(x, a_core, wl, wr, left=True):
        """Apply the (wl -> wr) MPO-dressed transfer to x."""
        op = w[:, :, wl, wr]
        if left:
            t = peinsum("ij,djk->dik", x, a_core)
            t = peinsum("sd,dik->sik", op, t)
            return peinsum("sji,sjk->ik", jnp.conj(a_core), t)
        t = peinsum("dij,jk->dik", a_core, x)
        t = peinsum("sd,dik->sik", op, t)
        return peinsum("sik,slk->il", t, jnp.conj(a_core))

    is_zero = np.asarray(jnp.abs(w).sum(axis=(0, 1))) == 0.0

    # ---- left environments: FL_0 = I, build upward ------------------- #
    fl = [None] * nw
    fl[0] = eye
    for a_idx in range(1, nw):
        b = jnp.zeros((bond, bond), dt)
        for b_idx in range(a_idx):
            if fl[b_idx] is not None and not is_zero[b_idx, a_idx]:
                b = b + t_channel(fl[b_idx], al, b_idx, a_idx, left=True)
        if a_idx < nw - 1:
            if is_zero[a_idx, a_idx]:
                fl[a_idx] = b  # strictly triangular interior channel
            else:
                # interior diagonal (e.g. exponentially decaying
                # interactions): contraction T_aa has norm < 1, solve
                # x = b + T_aa(x) directly (no energy subtraction)
                fl[a_idx] = _interior_solve(
                    al, b, w[:, :, a_idx, a_idx], left=True, tol=tol
                )
        else:
            # corner channel: geometric series with energy subtraction
            e_left = _tr_pair(rho_r, b)  # divergence rate = energy
            fl[a_idx] = _geometric_solve(
                al, b, rho_r, left=True, tol=tol
            )

    # ---- right environments: FR_{W-1} = I, build downward ------------ #
    rho_l = peinsum("ji,jk->ik", jnp.conj(c), c)  # C^H C
    rho_l = rho_l / jnp.trace(rho_l)
    fr = [None] * nw
    fr[nw - 1] = eye
    for a_idx in range(nw - 2, -1, -1):
        b = jnp.zeros((bond, bond), dt)
        for b_idx in range(a_idx + 1, nw):
            if fr[b_idx] is not None and not is_zero[a_idx, b_idx]:
                b = b + t_channel(fr[b_idx], ar, a_idx, b_idx, left=False)
        if a_idx > 0:
            if is_zero[a_idx, a_idx]:
                fr[a_idx] = b
            else:
                fr[a_idx] = _interior_solve(
                    ar, b, w[:, :, a_idx, a_idx], left=False, tol=tol
                )
        else:
            e_right = _tr_pair(rho_l, b)
            fr[a_idx] = _geometric_solve(
                ar, b, rho_l, left=False, tol=tol
            )

    return (jnp.stack(fl), jnp.stack(fr),
            0.5 * jnp.real(e_left + e_right))


# --------------------------------------------------------------------- #
# Effective Hamiltonians and the VUMPS loop
# --------------------------------------------------------------------- #


def _h_ac(fl, w, fr, ac):
    """``H_AC``: one-site effective Hamiltonian."""
    t = peinsum("aij,djk->adik", fl, ac)      # FL_a . AC
    t = peinsum("sdab,adik->bsik", w, t)      # MPO vertex
    return peinsum("bsik,bkl->sil", t, fr)    # . FR_b


def _h_c(fl, fr, c):
    """``H_C``: zero-site effective Hamiltonian."""
    t = peinsum("aij,jk->aik", fl, c)
    return peinsum("aik,akl->il", t, fr)


def _polar_left(m):
    """Left polar factor ``U`` of ``m = U P`` (m tall)."""
    u, _, vh = jnp.linalg.svd(m, full_matrices=False)
    return peinsum("ij,jk->ik", u, vh)


@partial(jax.jit, static_argnums=(3,))
def _solve_ac(fl, w, fr, iters, ac):
    return lanczos_ground(lambda t: _h_ac(fl, w, fr, t), ac, iters)


@partial(jax.jit, static_argnums=(2,))
def _solve_c(fl, fr, iters, c):
    return lanczos_ground(lambda t: _h_c(fl, fr, t), c, iters)


@jax.jit
def _gauge_update(ac, c):
    """``(AL, AR, grad_norm)`` from ``(AC, C)`` (Zauner-Stauber polar
    form: ``AL = polar(AC) polar(C)^H``, AR mirrored)."""
    d_, bond = ac.shape[0], ac.shape[1]
    al = peinsum(
        "ij,kj->ik",
        _polar_left(ac.reshape(d_ * bond, bond)),
        jnp.conj(_polar_left(c)),
    ).reshape(d_, bond, bond)
    ar_mat = _polar_left(ac.transpose(0, 2, 1).reshape(d_ * bond, bond))
    cr = _polar_left(c.T)
    ar = peinsum("ij,kj->ik", ar_mat, jnp.conj(cr)).reshape(
        d_, bond, bond
    ).transpose(0, 2, 1)
    grad = jnp.linalg.norm(ac - peinsum("dij,jk->dik", al, c))
    return al, ar, grad


def vumps(mpo_cell, bond_dim, iters=60, d=None, dtype=jnp.float64,
          lanczos_iters=40, key=None, tol=1e-12):
    """Ground state of an infinite chain, variationally, in uMPS form.

    Args:
        mpo_cell: an :class:`~contractn_tpu.models.mpo.MPO` whose
            ``cores[0]`` is the repeated triangular bulk tensor
            (``tfim_mpo(2)``, ``heisenberg_mpo(2)``,
            ``mpo_from_bond_term(...)`` all qualify).
        bond_dim: uMPS bond dimension.
        iters: VUMPS iterations.

    Returns:
        dict with ``al, ar, ac, c`` (mixed-gauge tensors), ``energy``
        (per site), ``energies`` (trace), and ``gradient_norm``.  ``al``
        is a valid uniform core for the :mod:`~contractn_tpu.models.
        umps` observables.
    """
    # a complex MPO silently cast to a real dtype is a WRONG
    # Hamiltonian (imaginary operator factors dropped) — promote
    dtype = jnp.result_type(dtype, jnp.asarray(mpo_cell.cores).dtype)
    w = jnp.asarray(mpo_cell.cores[0], dtype)
    d = d or w.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)
    a0 = jax.random.normal(key, (d, bond_dim, bond_dim), dtype)
    al, ar, c = mixed_gauge(a0)
    ac = peinsum("dij,jk->dik", al, c)

    energies = []
    grad_norm = np.inf
    for _ in range(int(iters)):
        fl, fr, energy = mpo_environments(al, ar, c, w, tol=tol)
        _, ac = _solve_ac(fl, w, fr, lanczos_iters, ac)
        _, c = _solve_c(fl, fr, lanczos_iters, c)
        al, ar, grad = _gauge_update(ac, c)
        grad_norm = float(grad)
        energies.append(float(energy))
        if grad_norm < 1e-11:
            break

    return {
        "al": al, "ar": ar, "ac": ac, "c": c,
        "energy": energies[-1], "energies": energies,
        "gradient_norm": grad_norm,
    }
