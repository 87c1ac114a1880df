"""Multi-site-cell VUMPS: uniform ground states with native unit cells.

The single-site algorithm (:mod:`~contractn_tpu.models.vumps`) handles
period-n chains only by FOLDING n physical sites into one d^n site
(``mpo.block_mpo`` — how round 3 did dimerized chains and round 4 the
Hubbard chain at d=16).  Folding squares the one-site solve cost in d,
hides the intra-cell bonds (no per-bond entanglement resolution), and
blocks per-site charge masking.  This module runs the genuine
multi-site algorithm (Zauner-Stauber et al., "Variational optimization
algorithms for uniform matrix product states", sec. IV):

* per-site mixed gauge ``AL_i, AR_i, AC_i`` with one ``C_i`` per bond
  (bond ``i`` sits LEFT of site ``i``; ``AC_i = AL_i C_{i+1} =
  C_i AR_i``), from iterated QR sweeps around the cell;
* per-bond MPO environments ``FL_i, FR_i``: the triangular channels
  are solved ascending exactly as in the single-site code, but each
  channel's fixed point lives on bond 0 with the CELL transfer (the
  composition of the n per-site transfers) — corner channels get the
  energy-subtracted geometric GMRES against the cell transfer, then
  propagate to the other bonds site by site;
* per-site Lanczos updates ``AC_i`` from ``(FL_i, W_i, FR_{i+1})``
  and ``C_i`` from ``(FL_i, FR_i)``, polar gauge updates per site.

The corner divergence rate is the energy per CELL (it accumulates one
cell of MPO applications per wrap); ``energy`` below is per site.

Validated in ``tests/test_vumps_cell.py``: an n=1 cell reproduces the
single-site solver on the TFIM to machine precision; a 2-site cell on
a UNIFORM Hamiltonian matches the single-site energy (translation
invariance the algorithm does not impose); and the dimerized XX chain
matches the exact Jordan-Wigner two-band integral — natively at d=2,
where round 3 needed the folded d=4 block (the band formula
``|t1 + t2 e^{i(2k + pi)}|`` is pinned in ``tests/test_mpo.py``).

The reference has no optimization or infinite systems (SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.krylov import lanczos_ground
from ..ops.stabilize import peinsum
from .vumps import (
    _h_ac,
    _h_c,
    _qr_pos,
    _tr_pair,
)


# --------------------------------------------------------------------- #
# Cell mixed gauge
# --------------------------------------------------------------------- #


def left_gauge_cell(cell, iters=60):
    """``(ALs, Ls)`` for an n-site cell: iterated QR sweeps around the
    cell until the bond-0 gauge converges.  ``Ls[i]`` is the gauge on
    bond ``i`` (left of site ``i``)."""
    n = len(cell)
    bond = cell[0].shape[1]
    el = jnp.eye(bond, dtype=cell[0].dtype)

    def sweep(_, carry):
        lmats, _ = carry
        lmat = lmats[0]
        new_l = []
        new_al = []
        for i in range(n):
            d = cell[i].shape[0]
            big = peinsum("ij,djk->dik", lmat, cell[i]).reshape(
                d * bond, bond)
            q, r = _qr_pos(big)
            r = r / jnp.maximum(jnp.linalg.norm(r), 1e-300)
            new_al.append(q.reshape(d, bond, bond))
            new_l.append(r)
            lmat = r
        # new_l[i] is the gauge on bond i+1; roll so Ls[i] = bond i
        ls = tuple([new_l[-1]] + new_l[:-1])
        return ls, tuple(new_al)

    ls0 = tuple(el for _ in range(n))
    als0 = tuple(jnp.zeros_like(a) for a in cell)
    ls, als = jax.lax.fori_loop(0, iters, sweep, (ls0, als0))
    return als, ls


def right_gauge_cell(cell, iters=60):
    """Mirror: right-isometric ``ARs`` with per-bond gauges ``Rs``
    (``Rs[i]`` on bond ``i``)."""
    n = len(cell)
    flipped = tuple(cell[n - 1 - i].transpose(0, 2, 1)
                    for i in range(n))
    als, ls = left_gauge_cell(flipped, iters)
    ars = tuple(als[n - 1 - i].transpose(0, 2, 1) for i in range(n))
    # flipped bond j = original bond n - j (mod n)
    rs = tuple(ls[(n - i) % n].T for i in range(n))
    return ars, rs


def mixed_gauge_cell(cell, iters=60):
    """``(ALs, ARs, Cs)`` for an n-site cell; ``Cs[i]`` on bond ``i``,
    gauge-fixed by per-bond SVDs of ``C`` (diagonal bond bases)."""
    n = len(cell)
    als, ls = left_gauge_cell(cell, iters)
    ars, rs = right_gauge_cell(cell, iters)
    us, vhs, cs = [], [], []
    for i in range(n):
        c = peinsum("ij,jk->ik", ls[i], rs[i])
        u, s, vh = jnp.linalg.svd(c)
        s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
        us.append(u)
        vhs.append(vh)
        cs.append(jnp.diag(s.astype(cell[0].dtype)))
    new_al = tuple(
        peinsum("ai,dij,jb->dab", jnp.conj(us[i]).T, als[i],
                us[(i + 1) % n])
        for i in range(n)
    )
    new_ar = tuple(
        peinsum("ai,dij,jb->dab", vhs[i], ars[i],
                jnp.conj(vhs[(i + 1) % n]).T)
        for i in range(n)
    )
    return new_al, new_ar, tuple(cs)


# --------------------------------------------------------------------- #
# Cell MPO environments
# --------------------------------------------------------------------- #


def _t_channel(x, core, op, left=True):
    """One MPO-dressed transfer step (channel element ``op``)."""
    if left:
        t = peinsum("ij,djk->dik", x, core)
        t = peinsum("sd,dik->sik", op, t)
        return peinsum("sji,sjk->ik", jnp.conj(core), t)
    t = peinsum("dij,jk->dik", core, x)
    t = peinsum("sd,dik->sik", op, t)
    return peinsum("sik,slk->il", t, jnp.conj(core))


def _cell_transfer(cores, x, left=True):
    """Plain cell transfer (identity channel) of the core list."""
    if left:
        for core in cores:
            t = peinsum("ij,djk->dik", x, core)
            x = peinsum("dji,djk->ik", jnp.conj(core), t)
        return x
    for core in reversed(cores):
        t = peinsum("dij,jk->dik", core, x)
        x = peinsum("dik,dlk->il", t, jnp.conj(core))
    return x


def _geometric_solve_cell(cores, b, density, left=True, tol=1e-10):
    """Energy-subtracted geometric GMRES against the CELL transfer."""
    bond = cores[0].shape[1]
    eye = jnp.eye(bond, dtype=b.dtype)

    def matvec(xv):
        x = xv.reshape(bond, bond)
        tx = _cell_transfer(cores, x, left=left)
        corr = _tr_pair(density, x) * eye
        return (x - tx + corr).reshape(-1)

    rhs = b - _tr_pair(density, b) * eye
    sol, _ = jax.scipy.sparse.linalg.gmres(
        matvec, rhs.reshape(-1), x0=jnp.zeros(bond * bond, b.dtype),
        tol=tol, atol=0.0, maxiter=200, solve_method="batched",
    )
    return sol.reshape(bond, bond)


def _interior_solve_cell(cores, ops, b, left=True, tol=1e-10):
    """``x = b + T_cell^aa(x)`` for a contracting interior diagonal."""
    bond = cores[0].shape[1]

    def dressed(x):
        if left:
            for core, op in zip(cores, ops):
                x = _t_channel(x, core, op, left=True)
            return x
        for core, op in zip(reversed(cores), reversed(ops)):
            x = _t_channel(x, core, op, left=False)
        return x

    def matvec(xv):
        x = xv.reshape(bond, bond)
        return (x - dressed(x)).reshape(-1)

    sol, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b.reshape(-1), x0=jnp.zeros(bond * bond, b.dtype),
        tol=tol, atol=0.0, maxiter=200, solve_method="batched",
    )
    return sol.reshape(bond, bond)


def mpo_environments_cell(als, ars, cs, ws, tol=1e-10):
    """Per-bond environments ``(FLs, FRs, energy_per_cell)``.

    ``FLs[i] (W, D, D)`` summarizes sites ``.. i-1`` (bond ``i``);
    ``FRs[i]`` summarizes sites ``i ..``.  Triangular MPOs with
    identity corners, same ``W`` on every site."""
    n = len(als)
    nw = ws[0].shape[2]
    if nw < 2:
        raise ValueError("triangular MPO with W >= 2 required")
    bond = als[0].shape[1]
    dt = als[0].dtype
    eye = jnp.eye(bond, dtype=dt)
    is_zero = [np.asarray(jnp.abs(w).sum(axis=(0, 1))) == 0.0
               for w in ws]

    # ---- left: FL[i][a], solve channel a on bond 0, propagate ------- #
    rho_r = peinsum("ij,kj->ik", cs[0], jnp.conj(cs[0]))
    rho_r = rho_r / jnp.trace(rho_r)
    fl = [[None] * nw for _ in range(n)]
    e_left = jnp.zeros((), dt)
    for a_idx in range(nw):
        # source: propagate the channel-a component once around the
        # cell from a zero seed (known lower channels feed in per site)
        s = jnp.zeros((bond, bond), dt)
        for i in range(n):
            nxt = jnp.zeros((bond, bond), dt)
            if not is_zero[i][a_idx, a_idx]:
                nxt = _t_channel(s, als[i], ws[i][:, :, a_idx, a_idx],
                                 left=True)
            for b_idx in range(a_idx):
                if fl[i][b_idx] is not None and \
                        not is_zero[i][b_idx, a_idx]:
                    nxt = nxt + _t_channel(
                        fl[i][b_idx], als[i],
                        ws[i][:, :, b_idx, a_idx], left=True)
            s = nxt
        diag_all_zero = all(is_zero[i][a_idx, a_idx] for i in range(n))
        diag_all_id = all(
            np.allclose(np.asarray(ws[i][:, :, a_idx, a_idx]),
                        np.eye(ws[i].shape[0])) for i in range(n))
        if a_idx == 0:
            fl0 = eye
        elif a_idx == nw - 1 and diag_all_id:
            e_left = _tr_pair(rho_r, s)
            fl0 = _geometric_solve_cell(als, s, rho_r, left=True,
                                        tol=tol)
        elif diag_all_zero:
            fl0 = s
        else:
            fl0 = _interior_solve_cell(
                als, [w[:, :, a_idx, a_idx] for w in ws], s,
                left=True, tol=tol)
        fl[0][a_idx] = fl0
        # propagate channel a to the other bonds (diag + lower feeds)
        cur = fl0
        for i in range(n - 1):
            nxt = jnp.zeros((bond, bond), dt)
            if not is_zero[i][a_idx, a_idx]:
                nxt = _t_channel(cur, als[i],
                                 ws[i][:, :, a_idx, a_idx], left=True)
            for b_idx in range(a_idx):
                if not is_zero[i][b_idx, a_idx]:
                    nxt = nxt + _t_channel(
                        fl[i][b_idx], als[i],
                        ws[i][:, :, b_idx, a_idx], left=True)
            if a_idx == 0:
                nxt = cur  # identity channel: FL[i][0] = I everywhere
            fl[i + 1][a_idx] = nxt
            cur = nxt

    # ---- right: FR[i][b], solve on bond 0, propagate backwards ------ #
    rho_l = peinsum("ji,jk->ik", jnp.conj(cs[0]), cs[0])
    rho_l = rho_l / jnp.trace(rho_l)
    fr = [[None] * nw for _ in range(n)]
    e_right = jnp.zeros((), dt)
    for a_idx in range(nw - 1, -1, -1):
        s = jnp.zeros((bond, bond), dt)
        for i in range(n - 1, -1, -1):
            nxt = jnp.zeros((bond, bond), dt)
            if not is_zero[i][a_idx, a_idx]:
                nxt = _t_channel(s, ars[i], ws[i][:, :, a_idx, a_idx],
                                 left=False)
            for b_idx in range(a_idx + 1, nw):
                if fr[(i + 1) % n][b_idx] is not None and \
                        not is_zero[i][a_idx, b_idx]:
                    nxt = nxt + _t_channel(
                        fr[(i + 1) % n][b_idx], ars[i],
                        ws[i][:, :, a_idx, b_idx], left=False)
            s = nxt
        diag_all_zero = all(is_zero[i][a_idx, a_idx] for i in range(n))
        diag_all_id = all(
            np.allclose(np.asarray(ws[i][:, :, a_idx, a_idx]),
                        np.eye(ws[i].shape[0])) for i in range(n))
        if a_idx == nw - 1:
            fr0 = eye
        elif a_idx == 0 and diag_all_id:
            e_right = _tr_pair(rho_l, s)
            fr0 = _geometric_solve_cell(ars, s, rho_l, left=False,
                                        tol=tol)
        elif diag_all_zero:
            fr0 = s
        else:
            fr0 = _interior_solve_cell(
                ars, [w[:, :, a_idx, a_idx] for w in ws], s,
                left=False, tol=tol)
        fr[0][a_idx] = fr0
        # propagate backwards: FR[n-1] = T_{n-1}(FR[0]), etc.
        cur = fr0
        for i in range(n - 1, 0, -1):
            nxt = jnp.zeros((bond, bond), dt)
            if not is_zero[i][a_idx, a_idx]:
                nxt = _t_channel(cur, ars[i],
                                 ws[i][:, :, a_idx, a_idx], left=False)
            for b_idx in range(a_idx + 1, nw):
                if not is_zero[i][a_idx, b_idx]:
                    nxt = nxt + _t_channel(
                        fr[(i + 1) % n][b_idx], ars[i],
                        ws[i][:, :, a_idx, b_idx], left=False)
            if a_idx == nw - 1:
                nxt = cur
            fr[i][a_idx] = nxt
            cur = nxt

    fls = tuple(jnp.stack(fl[i]) for i in range(n))
    frs = tuple(jnp.stack(fr[i]) for i in range(n))
    return fls, frs, 0.5 * jnp.real(e_left + e_right)


# --------------------------------------------------------------------- #
# The VUMPS loop
# --------------------------------------------------------------------- #


@partial(jax.jit, static_argnums=(3,))
def _solve_ac_cell(fl, w, fr, iters, ac):
    return lanczos_ground(lambda t: _h_ac(fl, w, fr, t), ac, iters)


@partial(jax.jit, static_argnums=(2,))
def _solve_c_cell(fl, fr, iters, c):
    return lanczos_ground(lambda t: _h_c(fl, fr, t), c, iters)


def vumps_cell(mpo_cores, bond_dim, iters=60, dtype=jnp.float64,
               lanczos_iters=40, key=None, tol=1e-12):
    """Ground state of an infinite period-n chain, natively.

    Args:
        mpo_cores: sequence of n triangular bulk cores ``(d, d, W, W)``
            (one per cell site; pass the same core n times for a
            uniform Hamiltonian on an enlarged cell).  Physical
            dimensions may differ per site.
        bond_dim: uMPS bond dimension (every bond).

    Returns a dict with per-site tuples ``als, ars, acs`` and per-bond
    ``cs``, plus ``energy`` (per SITE), ``energies``, and
    ``gradient_norm`` (max over sites).
    """
    # promote a complex MPO rather than silently dropping the
    # imaginary operator factors (same guard as vumps.vumps)
    for w in mpo_cores:
        dtype = jnp.result_type(dtype, jnp.asarray(w).dtype)
    ws = [jnp.asarray(w, dtype) for w in mpo_cores]
    n = len(ws)
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    cell = tuple(
        jax.random.normal(keys[i], (ws[i].shape[0], bond_dim,
                                    bond_dim), dtype)
        for i in range(n)
    )
    als, ars, cs = mixed_gauge_cell(cell)
    acs = tuple(
        peinsum("dij,jk->dik", als[i], cs[(i + 1) % n])
        for i in range(n)
    )

    energies = []
    grad_norm = np.inf
    for _ in range(int(iters)):
        fls, frs, e_cell = mpo_environments_cell(als, ars, cs, ws,
                                                 tol=tol)
        new_al, new_ar, new_c = [None] * n, [None] * n, [None] * n
        grads = []
        new_acs = []
        for i in range(n):
            _, ac = _solve_ac_cell(fls[i], ws[i], frs[(i + 1) % n],
                                   lanczos_iters, acs[i])
            new_acs.append(ac)
        for i in range(n):
            _, c = _solve_c_cell(fls[i], frs[i], lanczos_iters, cs[i])
            new_c[i] = c
        for i in range(n):
            al, ar, grad = _gauge_update_cell(
                new_acs[i], new_c[i], new_c[(i + 1) % n])
            new_al[i], new_ar[i] = al, ar
            grads.append(float(grad))
        als, ars = tuple(new_al), tuple(new_ar)
        cs = tuple(new_c)
        acs = tuple(new_acs)
        grad_norm = max(grads)
        energies.append(float(e_cell) / n)
        if grad_norm < 1e-11:
            break

    return {
        "als": als, "ars": ars, "acs": acs, "cs": cs,
        "energy": energies[-1], "energies": energies,
        "gradient_norm": grad_norm,
    }


# --------------------------------------------------------------------- #
# Cell-ground observables
# --------------------------------------------------------------------- #


def expect_local_cell(ground, op, site):
    """``<O_site>`` on a converged cell ground: the mixed gauge puts
    the norm entirely in ``AC_site``, so no transfer solves are needed
    (unlike :func:`~contractn_tpu.models.umps.expect_local`, which
    works from a raw core)."""
    ac = ground["acs"][site % len(ground["acs"])]
    op = jnp.asarray(op, ac.dtype)
    num = peinsum("sab,st,tab->", jnp.conj(ac), op, ac)
    den = peinsum("sab,sab->", jnp.conj(ac), ac)
    val = complex(np.asarray(num / den))
    return val if np.iscomplexobj(np.asarray(ac)) else float(val.real)


def correlate_cell(ground, op1, op2, site, distances, string=None):
    """Connected ``<O1_site O2_{site+x}>_c`` on a cell ground for each
    ``x`` in ``distances`` (all >= 1).

    One pass: ``AC_site`` dressed with ``O1`` opens the window, the
    right-canonical ``AR`` tensors (period n) carry it — every
    intermediate environment is exact (no leading-eigenvector solves;
    the gauge IS the fixed point).

    ``string`` (optional ``(d, d)``) is applied to the KET on every
    site strictly BETWEEN the two operators — Jordan-Wigner fermion
    correlators ``<c^d_i (Z..Z) c_j>`` ride the same pass (with a
    string the disconnected subtraction is skipped: a string-dressed
    two-point function has no product-of-locals part)."""
    distances = [int(x) for x in distances]
    if any(x < 1 for x in distances):
        raise ValueError("distances must be >= 1")
    acs, ars = ground["acs"], ground["ars"]
    n = len(acs)
    i = site % n
    ac = acs[i]
    op1 = jnp.asarray(op1, ac.dtype)
    op2 = jnp.asarray(op2, ac.dtype)
    nrm = peinsum("sab,sab->", jnp.conj(ac), ac)
    rho = peinsum("sab,st,tac->bc", jnp.conj(ac), op1, ac) / nrm
    e1 = expect_local_cell(ground, op1, i) if string is None else 0.0
    max_x = max(distances)
    out = {}
    for x in range(1, max_x + 1):
        j = (i + x) % n
        if x in distances:
            val = peinsum("bc,sbd,st,tcd->", rho, jnp.conj(ars[j]),
                          op2, ars[j])
            out[x] = complex(np.asarray(val)) - (
                e1 * expect_local_cell(ground, op2, j)
                if string is None else 0.0)
        if x < max_x:
            ket = ars[j] if string is None else peinsum(
                "st,tbf->sbf", jnp.asarray(string, ac.dtype), ars[j])
            rho = peinsum("bc,sbd,scf->df", rho, jnp.conj(ars[j]),
                          ket)
    is_cpx = np.iscomplexobj(np.asarray(ac))
    return [out[x] if is_cpx else float(np.real(out[x]))
            for x in distances]


def static_structure_factor_cell(ground, op, kappas, max_distance=60):
    """``S(kappa) = sum_x e^{i kappa x} <O_j O_{j+x}>_c`` averaged over
    the cell base sites (``kappa`` is the PER-SITE momentum; on a
    period-n lattice it is defined modulo ``2 pi``, and the cell
    momentum of the matching tangent sector is ``K = n kappa``).

    Real-space connected correlators out to ``max_distance`` from each
    base site, cosine-transformed — exact for gapped states once
    ``max_distance >> xi``.  Equals the total cell tangent-space
    spectral weight (:func:`~contractn_tpu.models.excitations_cell.
    spectral_weights_cell`) identically; the tests pin that sum rule.
    """
    acs = ground["acs"]
    n = len(acs)
    op = jnp.asarray(op, acs[0].dtype)
    op2 = peinsum("st,tu->su", op, op)
    xs = list(range(1, int(max_distance) + 1))
    scalar_in = np.ndim(kappas) == 0
    kappas = np.atleast_1d(np.asarray(kappas, float))
    acc = np.zeros(kappas.shape)
    for i in range(n):
        m1 = expect_local_cell(ground, op, i)
        m2 = expect_local_cell(ground, op2, i)
        c0 = np.real(m2 - m1 * m1)
        cx = np.real(np.asarray(correlate_cell(ground, op, op, i, xs)))
        acc = acc + c0 + 2.0 * np.matmul(np.cos(np.outer(kappas, xs)),
                                         cx)
    out = acc / n
    return float(out[0]) if scalar_in else out


@jax.jit
def _gauge_update_cell(ac, c_left, c_right):
    """Per-site polar gauge update: ``AL_i`` pairs ``AC_i`` with its
    RIGHT bond ``C_{i+1}``, ``AR_i`` with its LEFT bond ``C_i``."""
    from .vumps import _polar_left

    d_, bond = ac.shape[0], ac.shape[1]
    al = peinsum(
        "ij,kj->ik",
        _polar_left(ac.reshape(d_ * bond, bond)),
        jnp.conj(_polar_left(c_right)),
    ).reshape(d_, bond, bond)
    ar_mat = _polar_left(ac.transpose(0, 2, 1).reshape(d_ * bond, bond))
    cl = _polar_left(c_left.T)
    ar = peinsum("ij,kj->ik", ar_mat, jnp.conj(cl)).reshape(
        d_, bond, bond
    ).transpose(0, 2, 1)
    grad = jnp.linalg.norm(ac - peinsum("dij,jk->dik", al, c_right))
    return al, ar, grad
