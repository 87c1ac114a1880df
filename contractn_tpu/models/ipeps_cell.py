"""Two-sublattice iPEPS: checkerboard simple update + cell-CTMRG energies.

The single-site C4v machinery (:mod:`contractn_tpu.models.ipeps`) cannot
represent staggered order, and its symmetrized simple update provably
stalls for the Heisenberg antiferromagnet (the rotation averaging
projects out the entanglement-growth direction — see
``tests/test_ipeps_cell.py``).  This module implements the original
Jiang-Weng-Xiang scheme on the checkerboard: two tensors
``A, B (d, D, D, D, D)`` and FOUR independent bond weight vectors
``lam_u, lam_l, lam_d, lam_r`` (named for the legs of ``A``; ``B``'s
legs carry the partner weights ``(d, r, u, l)`` since every bond joins
an A to a B).  Each Trotter sweep gates the four bond orientations in
sequence; one orientation is coded and the vertical bonds reuse it
through a 90-degree leg permutation — no averaging, no symmetrization,
so entanglement grows freely.

Energies are TRUE variational expectation values: the converged
``(A, B)`` pair becomes a 2x2 checkerboard of double-layer tensors,
:func:`~contractn_tpu.models.ctmrg_cell.ctmrg_cell` converges the
directional environment, and every one of the cell's eight bonds is
measured with an open-physical-leg pair patch (vertical bonds through
one lattice rotation of the whole state — the same single code path).

TPU shape: each Trotter stage is ONE jitted ``lax.fori_loop`` (four
SVDs per sweep, static shapes, zero host syncs), and the CTMRG
fixed-point is the jitted loop of ``ctmrg_cell``.

Validated in ``tests/test_ipeps_cell.py`` against: the C4v code path on
the 2D TFIM (two independent environments on one state), and the 2D
Heisenberg antiferromagnet — where the rotated (translation-invariant)
and unrotated (Neel, staggered) formulations must give the same energy
because they differ by a sublattice unitary, and the energy must land
in the known D=2 simple-update window below the best product state
(-0.5) and above the exact QMC value (-0.669437).

No 2D capability of any kind exists in the reference (SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .ctmrg_cell import ctmrg_cell, pair_weight_h, rotate
from .ipeps import peps_double_layer, peps_double_layer_open

_LAM_TOL = 1e-9  # relative cutoff for guarded bond-weight inverses


def _inv(lam):
    cut = _LAM_TOL * jnp.max(lam)
    return jnp.where(lam > cut, 1.0 / jnp.maximum(lam, 1e-300), 0.0)


def _su_pair(gl, gr, lam, wl_other, wr_other, gate):
    """One gate on the horizontal bond ``gl.r -- gr.l`` (weight ``lam``).

    ``wl_other = (w_u, w_l, w_d)`` are the weights on ``gl``'s other
    legs, ``wr_other = (w_u, w_d, w_r)`` those on ``gr``'s.  Absorb,
    gate, SVD back to the bond dimension, divide the outer weights out.
    Returns ``(gl', gr', lam')`` — no symmetrization of any kind.
    """
    d, bond = gl.shape[0], gl.shape[1]
    lu1, ll1, ld1 = wl_other
    lu2, ld2, lr2 = wr_other

    wl = gl * lu1[None, :, None, None, None]
    wl = wl * ll1[None, None, :, None, None]
    wl = wl * ld1[None, None, None, :, None]
    wl = wl * lam[None, None, None, None, :]
    wr = gr * lu2[None, :, None, None, None]
    wr = wr * ld2[None, None, None, :, None]
    wr = wr * lr2[None, None, None, None, :]

    theta = peinsum("sulxm,tvmyr->sulxtvyr", wl, wr)
    theta = peinsum("STst,sulxtvyr->SulxTvyr",
                    gate.reshape(d, d, d, d), theta)
    mat = theta.reshape(d * bond ** 3, d * bond ** 3)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    lam_new = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)

    iu1, il1, id1 = _inv(lu1), _inv(ll1), _inv(ld1)
    iu2, id2, ir2 = _inv(lu2), _inv(ld2), _inv(lr2)
    g1 = u.reshape(d, bond, bond, bond, bond)
    g1 = g1 * iu1[None, :, None, None, None]
    g1 = g1 * il1[None, None, :, None, None]
    g1 = g1 * id1[None, None, None, :, None]
    g2 = vh.reshape(bond, d, bond, bond, bond).transpose(1, 2, 0, 3, 4)
    g2 = g2 * iu2[None, :, None, None, None]
    g2 = g2 * id2[None, None, None, :, None]
    g2 = g2 * ir2[None, None, None, None, :]

    def renorm(g):
        return g / jnp.maximum(jnp.sqrt(jnp.sum(jnp.abs(g) ** 2)), 1e-300)

    return renorm(g1), renorm(g2), lam_new


_VPERM = (0, 4, 1, 2, 3)    # rotate legs so "down" becomes "right"
_VPERM_INV = (0, 2, 3, 4, 1)


def _sweep(carry, gate):
    """Gate all four bond orientations once (r, l, d, u bonds of A)."""
    ga, gb, lu, ll, ld, lr = carry
    # A.r -- B.l (weight lam_r); B's legs (u, d, r) carry (ld, lu, ll)
    ga, gb, lr = _su_pair(ga, gb, lr, (lu, ll, ld), (ld, lu, ll), gate)
    # B.r -- A.l (lam_l)
    gb, ga, ll = _su_pair(gb, ga, ll, (ld, lr, lu), (lu, ld, lr), gate)
    # Vertical bonds: permute legs so down plays right.
    pa, pb = jnp.transpose(ga, _VPERM), jnp.transpose(gb, _VPERM)
    # A.d -- B.u (lam_d): permuted legs (u', l', d') of A = (r, u, l)
    pa, pb, ld = _su_pair(pa, pb, ld, (lr, lu, ll), (ll, lr, lu), gate)
    # B.d -- A.u (lam_u)
    pb, pa, lu = _su_pair(pb, pa, lu, (ll, ld, lr), (lr, ll, ld), gate)
    ga, gb = jnp.transpose(pa, _VPERM_INV), jnp.transpose(pb, _VPERM_INV)
    return (ga, gb, lu, ll, ld, lr)


@partial(jax.jit, static_argnums=(2,))
def _su_stage(carry, gate, n_iter):
    def body(_, c):
        return _sweep(c, gate)

    return jax.lax.fori_loop(0, n_iter, body, carry)


def simple_update_cell(h2, bond_dim, d=2,
                       schedule=((0.1, 200), (0.02, 200), (0.005, 100)),
                       dtype=jnp.float64, init=None):
    """Checkerboard (two-site cell) simple-update imaginary-time flow.

    Args:
        h2: nearest-neighbor bond term ``(d^2, d^2)`` applied to every
            bond (the same operator on horizontal and vertical bonds,
            always ordered (A-site, B-site) — correct for swap-symmetric
            terms like Heisenberg or TFIM).
        bond_dim: PEPS virtual dimension D.
        schedule: ``((dt, n_sweeps), ...)`` Trotter ladder.
        init: optional ``(gamma_a, gamma_b)`` seed tensors; default is a
            symmetry-broken two-sublattice product state plus noise
            (Neel-like for a diagonal-ordering term).

    Returns:
        ``(gamma_a, gamma_b, lams)`` with ``lams = (lam_u, lam_l,
        lam_d, lam_r)`` named for the legs of ``A``.
    """
    from .itebd import two_site_gate

    if init is None:
        rng = np.random.default_rng(0)
        va = np.cos(0.2 + 0.3 * np.arange(d))
        vb = np.cos(1.2 + 0.7 * np.arange(d))
        va, vb = va / np.linalg.norm(va), vb / np.linalg.norm(vb)
        ga = np.zeros((d,) + (bond_dim,) * 4)
        gb = np.zeros((d,) + (bond_dim,) * 4)
        ga[(slice(None),) + (0,) * 4] = va
        gb[(slice(None),) + (0,) * 4] = vb
        ga = ga + 0.02 * rng.normal(size=ga.shape)
        gb = gb + 0.02 * rng.normal(size=gb.shape)
        ga, gb = jnp.asarray(ga, dtype), jnp.asarray(gb, dtype)
    else:
        ga, gb = (jnp.asarray(t, dtype) for t in init)
    # bond weights are singular values: REAL even for complex dtypes
    rdt = jnp.zeros((), dtype).real.dtype
    lam = jnp.ones((bond_dim,), rdt) / np.sqrt(bond_dim)
    carry = (ga, gb, lam, lam, lam, lam)

    h2 = jnp.asarray(h2, dtype)
    for dt, n_iter in schedule:
        gate = two_site_gate(h2, dt)
        carry = _su_stage(carry, gate, int(n_iter))
    ga, gb, lu, ll, ld, lr = carry
    return ga, gb, (lu, ll, ld, lr)


def su_cell_absorb(gamma_a, gamma_b, lams):
    """Measurable ``(A, B)``: ``sqrt(lam)`` absorbed on every bond once
    (A's legs carry ``(u, l, d, r)`` weights, B's the partners
    ``(d, r, u, l)``)."""
    lu, ll, ld, lr = (jnp.sqrt(x) for x in lams)
    a = gamma_a * lu[None, :, None, None, None]
    a = a * ll[None, None, :, None, None]
    a = a * ld[None, None, None, :, None]
    a = a * lr[None, None, None, None, :]
    b = gamma_b * ld[None, :, None, None, None]
    b = b * lr[None, None, :, None, None]
    b = b * lu[None, None, None, :, None]
    b = b * ll[None, None, None, None, :]
    return a, b


# --------------------------------------------------------------------- #
# Cell-CTMRG measurement
# --------------------------------------------------------------------- #


def _pair_weight_cell_op(env, cell, x, y, ao_l, ao_r, op4):
    """Same patch with OPEN pair tensors ``(d, d, q, q, q, q)``
    contracted against ``op4[s1', s2', s1, s2]`` (bra first)."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    lx = len(cell)
    x2 = (x + 1) % lx
    from ..ops.stabilize import dot_precision

    prec = dot_precision(cell[0][0].dtype)
    return jnp.einsum(
        "ab,auc,cve,ef,blg,pPuldw,qQvwyr,frh,gi,idj,jyk,hk,PQpq->",
        c1[x][y], t1[x][y], t1[x2][y], c2[x2][y], t4[x][y],
        ao_l, ao_r, t2[x2][y], c4[x][y], t3[x][y], t3[x2][y],
        c3[x2][y], op4, precision=prec,
    )


def checkerboard_cell(a_site, b_site):
    """The 2x2 double-layer cell ``((A, B), (B, A))`` of a pair."""
    na, nb = peps_double_layer(a_site), peps_double_layer(b_site)
    return ((na, nb), (nb, na))


def cell_energy_from_env(a_site, b_site, h2, cell, env):
    """Energy per site measured in a GIVEN converged environment
    (differentiable — used by the variational optimizer, which carries
    its own refreshed environment)."""
    a_site = jnp.asarray(a_site)
    b_site = jnp.asarray(b_site, a_site.dtype)
    d = a_site.shape[0]
    op4 = jnp.asarray(h2, a_site.dtype).reshape(d, d, d, d)
    ao_a = peps_double_layer_open(a_site)
    ao_b = peps_double_layer_open(b_site)
    opens = ((ao_a, ao_b), (ao_b, ao_a))

    def h_bonds(cell_, env_, opens_):
        tot = 0.0
        lx, ly = len(cell_), len(cell_[0])
        for x in range(lx):
            for y in range(ly):
                x2 = (x + 1) % lx
                num = _pair_weight_cell_op(env_, cell_, x, y,
                                           opens_[x][y], opens_[x2][y],
                                           op4)
                den = pair_weight_h(cell_, env_, cell_[x][y],
                                    cell_[x2][y], x, y)
                tot = tot + num / den
        return tot

    total = h_bonds(cell, env, opens)
    # vertical bonds: rotate the whole state a quarter turn and reuse
    # the horizontal patch (open tensors rotate like sites on their
    # virtual legs: (p, P, u, l, d, r) -> (p, P, r, u, l, d)).
    cell_r, env_r = rotate(cell, env)
    lx, ly = len(opens), len(opens[0])
    opens_r = tuple(
        tuple(jnp.transpose(opens[(-yp) % lx][xp], (0, 1, 5, 2, 3, 4))
              for yp in range(lx))
        for xp in range(ly)
    )
    total = total + h_bonds(cell_r, env_r, opens_r)
    return total / 4.0


def cell_energy(a_site, b_site, h2, chi, iters=150):
    """Energy per site of ``H = sum_<ij> h2`` on the checkerboard state.

    Builds the 2x2 double-layer cell, converges the directional
    environment once, and measures ALL EIGHT bonds of the cell (four
    horizontal, and four vertical via one lattice rotation); the energy
    per site is their sum divided by the four cell sites.  ``h2`` acts
    as ``op4[s_bra_left, s_bra_right, s_ket_left, s_ket_right]`` with
    the left factor on the left/upper site of each bond.
    """
    a_site = jnp.asarray(a_site)
    b_site = jnp.asarray(b_site, a_site.dtype)
    cell = checkerboard_cell(a_site, b_site)
    env = ctmrg_cell(cell, chi, iters=iters)
    return cell_energy_from_env(a_site, b_site, h2, cell, env)


def cell_site_expectations(a_site, b_site, op, chi, iters=150):
    """One-site ``<op>`` at every cell position (2x2 nested tuple) —
    e.g. the staggered magnetization pattern of a Neel state."""
    from .ctmrg_cell import site_expectation

    a_site = jnp.asarray(a_site)
    b_site = jnp.asarray(b_site, a_site.dtype)
    na, nb = peps_double_layer(a_site), peps_double_layer(b_site)
    ia = peps_double_layer(a_site, op)
    ib = peps_double_layer(b_site, op)
    cell = ((na, nb), (nb, na))
    imps = ((ia, ib), (ib, ia))
    env = ctmrg_cell(cell, chi, iters=iters)
    return tuple(
        tuple(site_expectation(cell, env, imps[x][y], x, y)
              for y in range(2))
        for x in range(2)
    )


def ipeps_cell_ground_state(h2, bond_dim, chi, d=2,
                            schedule=((0.1, 200), (0.02, 200),
                                      (0.005, 100)),
                            iters=150, dtype=jnp.float64, init=None):
    """Checkerboard ground state by two-site-cell simple update, with
    the true variational energy from the directional cell CTMRG.

    Returns ``(a_site, b_site, energy_per_site)``.
    """
    ga, gb, lams = simple_update_cell(h2, bond_dim, d=d,
                                      schedule=schedule, dtype=dtype,
                                      init=init)
    a_site, b_site = su_cell_absorb(ga, gb, lams)
    return a_site, b_site, cell_energy(a_site, b_site, h2, chi,
                                       iters=iters)


def ipeps_cell_scan(h2_batch, bond_dim, chi, d=2,
                    schedule=((0.1, 150), (0.02, 150), (0.005, 80)),
                    iters=120, ops=(), dtype=jnp.float64, init=None):
    """Batched checkerboard ground states over a FAMILY of bond terms —
    the 2D analog of :func:`~contractn_tpu.models.ensemble.dmrg_ensemble`.

    The entire pipeline — Trotter gates from each ``h2``, the
    checkerboard simple update, the directional CTMRG environment, the
    eight-bond energy, and any requested one-site observables — is one
    ``jit(vmap(...))`` XLA program: a 2D phase-diagram scan runs as a
    single batched computation (MXU-batched einsums and SVDs), with the
    per-sample code path IDENTICAL to the unbatched one (pinned by the
    tests).

    Args:
        h2_batch: ``(B, d^2, d^2)`` bond terms.
        ops: one-site observables ``(d, d)`` measured at cell site
            (0, 0) of each sample.

    Returns:
        dict with ``a, b`` (batched site tensors), ``energy (B,)`` and
        ``moments (B, len(ops))``.
    """
    h2_batch = jnp.asarray(h2_batch, dtype)
    ops_arr = (jnp.stack([jnp.asarray(o, dtype) for o in ops])
               if ops else jnp.zeros((0, d, d), dtype))
    if init is not None:
        init = tuple(jnp.asarray(t, dtype) for t in init)
    a, b, energy, moments = _scan_impl(
        h2_batch, ops_arr, init, bond_dim, chi, d, tuple(
            (float(t), int(n)) for t, n in schedule), int(iters))
    return {"a": a, "b": b, "energy": energy, "moments": moments}


def _scan_core(h2_batch, ops_arr, init, bond_dim, chi, d, schedule,
               iters):
    """Unjitted vmapped core — shared by the single-device jit below and
    by the mesh-sharded wrapper (:mod:`contractn_tpu.parallel.ensembles`),
    so the per-sample program is IDENTICAL on both paths."""
    from .ctmrg_cell import site_expectation

    dtype = h2_batch.dtype

    def single(h2):
        ga, gb, lams = simple_update_cell(h2, bond_dim, d=d,
                                          schedule=schedule,
                                          dtype=dtype, init=init)
        a_site, b_site = su_cell_absorb(ga, gb, lams)
        cell = checkerboard_cell(a_site, b_site)
        env = ctmrg_cell(cell, chi, iters=iters)
        energy = jnp.real(
            cell_energy_from_env(a_site, b_site, h2, cell, env))
        moms = [jnp.real(site_expectation(
            cell, env, peps_double_layer(a_site, ops_arr[i]), 0, 0))
            for i in range(ops_arr.shape[0])]
        moments = (jnp.stack(moms) if moms
                   else jnp.zeros((0,), energy.dtype))
        return a_site, b_site, energy, moments

    return jax.vmap(single)(h2_batch)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _scan_impl(h2_batch, ops_arr, init, bond_dim, chi, d, schedule,
               iters):
    """Module-level jitted core of :func:`ipeps_cell_scan` — a stable
    function identity, so repeated scans with the same shapes/settings
    reuse the compiled program (remote TPU compiles cost minutes)."""
    return _scan_core(h2_batch, ops_arr, init, bond_dim, chi, d,
                      schedule, iters)
