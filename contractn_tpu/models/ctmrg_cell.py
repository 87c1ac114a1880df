"""Directional CTMRG for arbitrary rectangular unit cells (Corboz).

The symmetric CTMRG in :mod:`contractn_tpu.models.ctmrg` requires a
single C4v-invariant site tensor — enough for rotation-invariant phases
but not for staggered order (Neel antiferromagnets, checkerboard
states) or any tensor without the full lattice symmetry.  This module
implements the directional corner-transfer-matrix method for a generic
``Lx x Ly`` unit cell of (possibly all-distinct, non-symmetric) site
tensors: every site ``(x, y)`` carries its own four corners ``C1..C4``
and four edge tensors ``T1..T4``, and the environment converges by
absorbing one lattice column/row at a time per direction (a *left move*
and its three rotations), truncating with biorthogonal projectors built
from two enlarged corners per bond (the "half-system" scheme standard
in modern iPEPS codes).

Geometry and leg conventions (x = column rightward, y = row downward;
all cell indices wrap mod ``Lx`` / ``Ly``):

* site ``a[x][y]`` legs ``(u, l, d, r)``;
* ``C1[x,y] (r, d)`` approximates the quadrant up-left of ``(x, y)``;
  ``C2 (l, d)`` up-right; ``C3 (u, l)`` down-right; ``C4 (u, r)``
  down-left;
* ``T1[x,y] (l, q, r)`` the top edge (``q`` points down onto the
  site), ``T2 (u, q, d)`` right edge, ``T3 (l, q, r)`` bottom edge,
  ``T4 (u, q, d)`` left edge.

Projector derivation (left move, bond between rows ``y-1`` and ``y``
of the absorbed column): with ``A = Q1[x, y-1]^T`` and ``B = Q4[x, y]``
(enlarged upper/lower corners as matrices ``(fat, right)``), the
rank-chi insertion ``A P Pt B ~= A B`` optimal for ``F = A B`` is

    ``F = U S Vh``,  ``P = B Vh_k^H S_k^{-1/2}``,
    ``Pt^T = Q1_mat conj(U_k) S_k^{-1/2}``,

which reproduces the top-k SVD of ``F`` exactly (verified in the tests
against full-rank identity).  Upper tensors absorb ``P`` on their fat
down leg, lower tensors ``Pt`` on their fat up leg.

Only ONE move is coded; up/right/down come from conjugating by a
lattice rotation (``u->l, l->d, d->r, r->u``) of both the cell and
every environment tensor — one code path, no per-direction index bugs.

TPU shape: cell sizes are tiny static Python ints, so the whole
4-direction iteration (4 * Lx moves, each an einsum batch + one
``(chi q, chi q)`` SVD per bond) unrolls inside ONE jitted
``lax.fori_loop`` fixed-point program with zero host syncs; the growth
phase (environment width expanding ``q -> chi``) runs eagerly for a
handful of sweeps, exactly like ``ctmrg.ctmrg_environment``.

Validated against: the symmetric-CTMRG free energy on a 1x1 Ising cell
(two independent code paths), translation invariance on a uniform 2x2
cell, and the staggered magnetization of the classical Ising
ANTIFERROMAGNET on a genuine two-sublattice cell versus the
Onsager-Yang exact value (the AFM <-> FM gauge map is exact).

No counterpart in the reference (contraction only; SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision, peinsum

_SVD_TOL = 1e-12  # relative cutoff for projector inverse sqrt weights


def _svd_compact(m):
    return jnp.linalg.svd(m, full_matrices=False)


def _norm(t):
    return t / jnp.maximum(jnp.max(jnp.abs(t)), 1e-300)


# --------------------------------------------------------------------- #
# Environment container: plain nested tuples (a jit-friendly pytree)
# --------------------------------------------------------------------- #


def _cell(fn, lx, ly):
    return tuple(tuple(fn(x, y) for y in range(ly)) for x in range(lx))


def init_env(a):
    """Free-boundary seed: partial traces of the neighboring site
    tensors (the generic-cell analog of ``ctmrg_environment``'s seed)."""
    lx, ly = len(a), len(a[0])

    def at(x, y):
        return a[x % lx][y % ly]

    # NB axis order must match each tensor's leg convention (C1 (r, d))
    # even when leg dims differ: anisotropic cells (e.g. the fermionic
    # stacked-chain anchors, dims (1, q, 1, q)) bind shapes strictly.
    c1 = _cell(lambda x, y: _norm(
        peinsum("uldr->rd", at(x - 1, y - 1))), lx, ly)
    c2 = _cell(lambda x, y: _norm(
        peinsum("uldr->ld", at(x + 1, y - 1))), lx, ly)
    c3 = _cell(lambda x, y: _norm(
        peinsum("uldr->ul", at(x + 1, y + 1))), lx, ly)
    c4 = _cell(lambda x, y: _norm(
        peinsum("uldr->ur", at(x - 1, y + 1))), lx, ly)
    t1 = _cell(lambda x, y: _norm(
        peinsum("uldr->ldr", at(x, y - 1))), lx, ly)
    t2 = _cell(lambda x, y: _norm(
        peinsum("uldr->uld", at(x + 1, y))), lx, ly)
    t3 = _cell(lambda x, y: _norm(
        peinsum("uldr->lur", at(x, y + 1))), lx, ly)
    t4 = _cell(lambda x, y: _norm(
        peinsum("uldr->urd", at(x - 1, y))), lx, ly)
    return (c1, c2, c3, c4, t1, t2, t3, t4)


# --------------------------------------------------------------------- #
# The left move
# --------------------------------------------------------------------- #


def _left_move(a, env, x, chi, prec, svd_fn=_svd_compact):
    """Absorb lattice column ``x`` into the left environment; the new
    ``C1/T4/C4`` replace those of column ``x + 1``.  ``svd_fn`` lets
    the variational layer substitute the degeneracy-safe decomposition
    (:func:`contractn_tpu.ops.linalg_ad.svd_safe`) for autodiff."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    lx, ly = len(a), len(a[0])

    # Enlarged corners for every row of this column.
    # Q1[(e d), (c r)]: fat down x fat right (chi-major fat pairs).
    q1s = [
        peinsum("ab,auc,ble,uldr->edcr",
                c1[x][y], t1[x][y], t4[x][y], a[x][y])
        for y in range(ly)
    ]
    # Q4[(b u), (h r)]: fat up x fat right.
    q4s = [
        peinsum("fg,gdh,blf,uldr->buhr",
                c4[x][y], t3[x][y], t4[x][y], a[x][y])
        for y in range(ly)
    ]

    # Projectors for the fat bond between rows (y-1, y): Pup absorbed
    # by the upper tensors, Plo by the lower.
    pups, plos = [], []
    for y in range(ly):
        q1m = q1s[(y - 1) % ly]
        e, d, c, r = q1m.shape
        q1m = q1m.reshape(e * d, c * r)
        q4m = q4s[y]
        b, u2, h, r2 = q4m.shape
        q4m = q4m.reshape(b * u2, h * r2)
        f = jnp.matmul(q1m.T, q4m, precision=prec)
        uu, ss, vh = svd_fn(f)
        k = min(chi, f.shape[0], f.shape[1])
        uu, ss, vh = uu[:, :k], ss[:k], vh[:k]
        isq = jnp.where(ss > _SVD_TOL * ss[0],
                        1.0 / jnp.sqrt(jnp.maximum(ss, 1e-300)), 0.0)
        pup = jnp.matmul(q4m, jnp.conj(vh).T, precision=prec) * isq
        plo = jnp.matmul(q1m, jnp.conj(uu), precision=prec) * isq
        pups.append(pup)
        plos.append(plo)

    new_c1, new_t4, new_c4 = [], [], []
    for y in range(ly):
        c1t = peinsum("ab,auc->cbu", c1[x][y], t1[x][y])
        cdim = c1t.shape[0]
        c1n = jnp.matmul(c1t.reshape(cdim, -1), pups[y], precision=prec)

        t4t = peinsum("ble,uldr->bured", t4[x][y], a[x][y])
        bu = t4t.shape[0] * t4t.shape[1]
        qd = t4t.shape[2]
        ed = t4t.shape[3] * t4t.shape[4]
        t4t = t4t.reshape(bu, qd, ed)
        t4n = peinsum("bk,bqe,em->kqm",
                      plos[y], t4t, pups[(y + 1) % ly])

        c4t = peinsum("fg,gdh->fdh", c4[x][y], t3[x][y])
        hdim = c4t.shape[2]
        c4n = jnp.matmul(plos[(y + 1) % ly].T,
                         c4t.reshape(-1, hdim), precision=prec)

        new_c1.append(_norm(c1n))
        new_t4.append(_norm(t4n))
        new_c4.append(_norm(c4n))

    xn = (x + 1) % lx

    def repl(old, new_col):
        return tuple(
            tuple(new_col[y] if xx == xn else old[xx][y]
                  for y in range(ly))
            for xx in range(lx)
        )

    return (repl(c1, new_c1), c2, c3, repl(c4, new_c4),
            t1, t2, t3, repl(t4, new_t4))


# --------------------------------------------------------------------- #
# Lattice rotation: u->l, l->d, d->r, r->u (cell: new[x', y'] =
# old[(-y') % Lx, x'])
# --------------------------------------------------------------------- #


def _rot_cell(old, legperm=None):
    lx, ly = len(old), len(old[0])

    def get(xp, yp):
        t = old[(-yp) % lx][xp]
        return jnp.transpose(t, legperm) if legperm else t

    return _cell(get, ly, lx)


def rotate(a, env):
    """Rotate the whole state one quarter turn; four applications are
    the identity (pinned by the tests)."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    a_new = _rot_cell(a, (3, 0, 1, 2))
    return a_new, (
        _rot_cell(c2, (1, 0)),   # C1' <- C2 swapped
        _rot_cell(c3),           # C2' <- C3
        _rot_cell(c4, (1, 0)),   # C3' <- C4 swapped
        _rot_cell(c1),           # C4' <- C1
        _rot_cell(t2),           # T1' <- T2
        _rot_cell(t3, (2, 1, 0)),  # T2' <- T3 reversed
        _rot_cell(t4),           # T3' <- T4
        _rot_cell(t1, (2, 1, 0)),  # T4' <- T1 reversed
    )


def _iteration(a, env, chi, prec, svd_fn=_svd_compact):
    """One full CTMRG iteration: left, up, right, down sweeps."""
    for _ in range(4):
        for x in range(len(a)):
            env = _left_move(a, env, x, chi, prec, svd_fn=svd_fn)
        a, env = rotate(a, env)
    return env


@partial(jax.jit, static_argnums=(2, 3))
def _converge(a, env, chi, iters):
    prec = dot_precision(a[0][0].dtype)

    def body(_, e):
        return _iteration(a, e, chi, prec)

    return jax.lax.fori_loop(0, iters, body, env)


def ctmrg_cell(a, chi, iters=100):
    """Converged directional-CTMRG environment of the unit cell ``a``.

    Args:
        a: nested sequence ``a[x][y]`` of site tensors ``(q, q, q, q)``
            in ``(up, left, down, right)`` order (any dims equal per
            axis across the cell; tensors need no symmetry at all).
        chi: environment bond dimension.
        iters: fixed-point iterations at full width.

    Returns:
        ``(C1, C2, C3, C4, T1, T2, T3, T4)`` — each a nested tuple
        indexed ``[x][y]`` like ``a``.
    """
    a = tuple(tuple(jnp.asarray(t) for t in col) for col in a)
    prec = dot_precision(a[0][0].dtype)
    env = init_env(a)

    def sig(e):
        return tuple(t.shape for t in jax.tree_util.tree_leaves(e))

    # Growth phase: eager sweeps until every environment leg saturates
    # at chi (or the cell's rank ceiling) — shapes must be fully static
    # before the jitted fixed-point program.  Legs grow at different
    # moves within an iteration, so loop until the whole shape
    # signature stops changing.
    prev = None
    while sig(env) != prev:
        prev = sig(env)
        env = _iteration(a, env, chi, prec)
    return _converge(a, env, chi, int(iters))


# --------------------------------------------------------------------- #
# Observables
# --------------------------------------------------------------------- #


def site_expectation(a, env, impurity, x=0, y=0):
    """``<impurity> / <a>`` at cell site ``(x, y)`` inside the
    converged environment (the 3x3 ring patch)."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    prec = dot_precision(a[0][0].dtype)

    def ring(center):
        return jnp.einsum(
            "ab,auc,ce,blf,uldr,erg,fh,hdi,gi->",
            c1[x][y], t1[x][y], c2[x][y], t4[x][y], center,
            t2[x][y], c4[x][y], t3[x][y], c3[x][y], precision=prec,
        )

    # promote, never narrow (a complex impurity on a real cell)
    return ring(jnp.asarray(impurity)) / ring(a[x][y])


def pair_weight_h(a, env, left_center, right_center, x=0, y=0):
    """Weight of the horizontal 1x2 patch over sites ``(x, y)`` and
    ``(x+1, y)`` with the given center tensors substituted."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    lx, ly = len(a), len(a[0])
    x2 = (x + 1) % lx
    prec = dot_precision(a[0][0].dtype)
    return jnp.einsum(
        "ab,auc,cve,ef,blg,uldw,vwyr,frh,gi,idj,jyk,hk->",
        c1[x][y], t1[x][y], t1[x2][y], c2[x2][y], t4[x][y],
        left_center, right_center, t2[x2][y], c4[x][y], t3[x][y],
        t3[x2][y], c3[x2][y], precision=prec,
    )


def pair_expectation_h(a, env, left_imp, right_imp, x=0, y=0):
    """``<left_imp right_imp> / <a a>`` on the horizontal bond
    ``(x, y) - (x+1, y)``."""
    lx = len(a)
    x2 = (x + 1) % lx
    num = pair_weight_h(a, env, jnp.asarray(left_imp),
                        jnp.asarray(right_imp), x, y)
    den = pair_weight_h(a, env, a[x][y], a[x2][y], x, y)
    return num / den


# --------------------------------------------------------------------- #
# Row correlators and 2D correlation lengths
# --------------------------------------------------------------------- #


def _row_start(env, center, x, y, prec):
    """Left cap ``[C1 T1; T4 center; C4 T3]`` -> open ``(top, q, bot)``
    channel vector."""
    c1, _, _, c4, t1, _, t3, t4 = env
    return jnp.einsum(
        "ab,auc,blg,uldr,gi,idj->crj",
        c1[x][y], t1[x][y], t4[x][y], center, c4[x][y], t3[x][y],
        precision=prec,
    )


def _row_apply(env, a, vec, x, y, prec):
    """Absorb one interior column ``[T1; a; T3]`` into the channel."""
    _, _, _, _, t1, _, t3, _ = env
    t = jnp.einsum("crj,cve->vrje", vec, t1[x][y], precision=prec)
    t = jnp.einsum("vrje,vrys->jeys", t, a[x][y], precision=prec)
    return jnp.einsum("jeys,jyk->esk", t, t3[x][y], precision=prec)


def _row_end(env, center, vec, x, y, prec):
    """Close the channel with ``[T1 C2; center T2; T3 C3]``."""
    _, c2, c3, _, t1, t2, t3, _ = env
    return jnp.einsum(
        "crj,cve,ef,vrys,fsh,jyk,hk->",
        vec, t1[x][y], c2[x][y], center, t2[x][y], t3[x][y],
        c3[x][y], precision=prec,
    )


def row_correlator(a, env, imp1, imp2, distances, x=0, y=0,
                   connected=True, mid=None):
    """``<imp1_(x,y) imp2_(x+r,y)>`` along a row, for each ``r`` in
    ``distances`` (``r >= 1``), inside the converged environment.

    One left cap, ``r - 1`` column absorptions, one right cap per
    distance — the channel is reused incrementally so the total cost is
    ``O(max(distances))``.  ``connected=True`` subtracts
    ``<imp1> <imp2>``.

    ``mid`` (optional, nested ``[x][y]`` like ``a``) substitutes the
    INTERVENING columns of the numerator sweep — the string channel of
    fermionic correlators (:func:`fipeps.fipeps_correlator`), where
    every site between the endpoints carries a sign-dressed tensor.
    The denominator always uses ``a``.

    On multi-site cells, ``imp2`` may be a nested ``[x][y]`` grid like
    ``a`` (the impurity of the cell position the distance lands on);
    a bare tensor is used at every position (uniform cells).
    """
    lx = len(a)
    prec = dot_precision(a[0][0].dtype)
    distances = [int(r) for r in distances]
    if any(r < 1 for r in distances):
        raise ValueError("row_correlator needs distances >= 1")
    imp1 = jnp.asarray(imp1)
    if isinstance(imp2, (tuple, list)):
        imp2_at = tuple(tuple(jnp.asarray(t) for t in col)
                        for col in imp2)
    else:
        i2 = jnp.asarray(imp2)
        imp2_at = tuple(tuple(i2 for _ in col) for col in a)

    def sweep(center1, center2_of, between):
        """Channel closures at every requested r with the given caps."""
        vec = _row_start(env, center1, x, y, prec)
        out = {}
        for r in range(1, max(distances) + 1):
            xe = (x + r) % lx
            if r in distances:
                out[r] = _row_end(env, center2_of(xe), vec, xe, y, prec)
            if r < max(distances):
                vec = _row_apply(env, between, vec, xe, y, prec)
        return out

    num = sweep(imp1, lambda xe: imp2_at[xe][y],
                a if mid is None else mid)
    den = sweep(a[x][y], lambda xe: a[xe][y], a)
    if connected:
        e1 = site_expectation(a, env, imp1, x, y)
        e2_cache = {}
    vals = []
    for r in distances:
        val = num[r] / den[r]
        if connected:
            xe = (x + r) % lx
            if xe not in e2_cache:
                e2_cache[xe] = site_expectation(a, env, imp2_at[xe][y],
                                                xe, y)
            val = val - e1 * e2_cache[xe]
        vals.append(val)
    return vals


def row_transfer_spectrum(a, env, y=0, iters=40):
    """Leading two eigenvalues of the row-channel transfer operator
    (the product of the cell's ``Lx`` column maps) and the 2D
    correlation length along the row, ``xi = -Lx / log |lam2/lam1|``
    (lattice units; ``inf`` when degenerate).

    Device-side Arnoldi (:func:`contractn_tpu.ops.krylov.arnoldi_eigs`):
    the ``iters`` transfer matvecs run as one jitted program on the
    default backend, and only the tiny Hessenberg eigenproblem runs on
    the host (XLA's dense nonsymmetric ``eig`` is CPU-only).  Unlike
    the round-2 power iteration this resolves complex subleading pairs
    (incommensurate correlations) and converges in ~40 Krylov steps
    where deflated power iteration needed 3 x 300 sweeps.
    """
    lx = len(a)
    prec = dot_precision(a[0][0].dtype)
    _, _, _, _, t1, _, t3, _ = env
    shp = (t1[0][y].shape[0], a[0][y].shape[1], t3[0][y].shape[0])

    def apply_m(vec):
        for x in range(lx):
            vec = _row_apply(env, a, vec, x, y, prec)
        return vec

    dt = a[0][y].dtype
    v0 = jnp.ones(shp, dt)
    v0 = v0 + 0.3 * jnp.reshape(
        jnp.arange(np.prod(shp), dtype=dt), shp) / np.prod(shp)

    from ..ops.krylov import arnoldi_eigs

    vals, _ = arnoldi_eigs(apply_m, v0, int(iters), k=2)
    lam1_f, lam2_f = complex(vals[0]), complex(vals[1])
    ratio = abs(lam2_f) / abs(lam1_f) if lam1_f else 0.0
    if ratio >= 1.0 - 1e-12 or ratio == 0.0:
        xi = float("inf")
    else:
        xi = -lx / np.log(ratio)
    return np.asarray([lam1_f, lam2_f]), float(xi)
