"""HOTRG on the cubic lattice: 3D classical partition functions.

Extends :mod:`contractn_tpu.models.hotrg` to three dimensions (Xie et
al., PRB 86, 045139, Sec. IV): one step merges two site tensors along
the current vertical axis, truncates BOTH transverse pair-bonds (x and
y) with isometries from the merged tensor's one-sided density matrices,
then rotates the lattice cyclically (z -> x -> y) so every axis is
coarse-grained in turn.  After ``k`` steps one tensor stands for ``2^k``
sites, so ~25 steps reach the thermodynamic limit of a genuinely
three-dimensional model — the hardest setting for tensor-network
contraction (3D networks have no exactly contractible structure at
all).

TPU shape decisions (same design invariants as the 2D module):

* **Zero-padded static bonds** — the site tensor is padded to
  ``(chi,)*6`` up front and the whole flow is ONE jitted ``lax.scan``;
  density-matrix null eigenvectors keep the padding exactly zero.
* **O(chi^11) flops, O(chi^8) peak memory.**  The chi^10 merged tensor
  is never materialized: the contraction order below folds the bottom
  tensor through the x- and y-isometries first (chi^8 intermediates),
  hits the single chi^11 GEMM against the top tensor, then absorbs the
  two remaining isometries at chi^9.  Density matrices are
  assembled from two chi^8 half-contractions exactly like the 2D
  module's App.-A factorization.
* **Split format rides the flow** — ``g -> 2 g + log c`` per merge
  (blocks double), the framework's flagship stabilization applied to a
  3D RG flow where raw tensors overflow within ~8 steps.

Validation (tests/test_hotrg3d.py): decoupled-layers limit equals
Onsager's exact 2D free energy through the full 3D machinery; low- and
high-temperature closed-form series; autodiff internal energy (frozen
projectors, as in 2D) against the low-T expansion and against finite
differences; qualitative magnetization jump across the 3D critical
point.  The reference has no coarse-graining capability (this module
has no counterpart file).

Axis convention: ``a[u, l, d, r, f, k]`` — ``u/d`` the merge (z) axis,
``l/r`` the x axis, ``f/k`` ("front/back") the y axis.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import dot_precision
from .hotrg import _isometry

__all__ = [
    "hotrg3d_log_z",
    "hotrg3d_expectation",
    "hotrg3d_bond_expectation",
    "hotrg3d_log_z_diff",
    "ising3d_tensor_smooth",
    "ising3d_internal_energy_ad",
]


def _pad6(a, chi):
    return jnp.pad(a, [(0, chi - s) for s in a.shape])


def _density_pair3(top, bot, prec):
    """x-bond density matrix of the (never-built) vertical pair.

    ``rho[(l1 l2), (l1' l2')]`` summed over every other leg of
    ``M = top *_m bot``; two chi^8 halves glued over ``(m, m')``.
    All three contractions are explicit Gram GEMMs — the einsum forms
    lowered to TPU convolutions that dominated the whole flow (same
    layout pathology as :func:`_apply_pair3`, measured).
    """
    chi = top.shape[0]
    # h1[(l m), (L M)] = sum_{u r f k} top[u,l,m,r,f,k] top[u,L,M,r,f,k]
    t2 = jnp.transpose(top, (1, 2, 0, 3, 4, 5)).reshape(chi * chi,
                                                        chi ** 4)
    h1 = jnp.matmul(t2, t2.T, precision=prec)
    # h2[(l m), (L M)] = sum_{d r f k} bot[m,l,d,r,f,k] bot[M,L,d,r,f,k]
    b2 = jnp.transpose(bot, (1, 0, 2, 3, 4, 5)).reshape(chi * chi,
                                                        chi ** 4)
    h2 = jnp.matmul(b2, b2.T, precision=prec)
    # glue over (m, M): regroup both halves to (l L) x (m M) — chi^4
    # objects, trivial
    h1 = h1.reshape(chi, chi, chi, chi).transpose(0, 2, 1, 3)
    h2 = h2.reshape(chi, chi, chi, chi).transpose(0, 2, 1, 3)
    rho = jnp.matmul(h1.reshape(chi * chi, chi * chi),
                     h2.reshape(chi * chi, chi * chi).T, precision=prec)
    # rho is now [(l1 L1), (l2 L2)]; reorder to [(l1 l2), (L1 L2)]
    rho = rho.reshape(chi, chi, chi, chi).transpose(0, 2, 1, 3)
    return rho.reshape(chi * chi, chi * chi)


def _isometry_batched(rhos, chi):
    """Top-``chi`` eigenbases of a (4, n, n) PSD stack; one batched
    eigh.  Returns ``(u3s (4, chi, chi, chi), errs (4,))``.  Null-space
    junk columns are zeroed (see ``hotrg._isometry``: they leak
    impurity components nondeterministically)."""
    rhos = 0.5 * (rhos + jnp.swapaxes(rhos, 1, 2))
    vals, vecs = jnp.linalg.eigh(rhos)
    order = jnp.argsort(-vals, axis=1)
    keep = order[:, :chi]  # (4, chi)
    kept = jnp.take_along_axis(vals, keep, axis=1)
    errs = (jnp.sum(jnp.abs(vals), axis=1)
            - jnp.sum(jnp.abs(kept), axis=1))
    u = jnp.take_along_axis(vecs, keep[:, None, :], axis=2)
    live = kept > 1e-13 * jnp.maximum(
        jnp.max(jnp.abs(vals), axis=1, keepdims=True), 1e-300)
    u = u * live[:, None, :]
    return u.reshape(4, chi, chi, chi), errs


def _swap_lr(a):
    return jnp.transpose(a, (0, 3, 2, 1, 4, 5))


def _to_y(a):
    """Bring the y pair (f, k) into the (l, r) slots: (u,f,d,k,l,r)."""
    return jnp.transpose(a, (0, 4, 2, 5, 1, 3))


def _apply_pair3(top, bot, u3x, u3y, prec):
    """Truncated vertical merge ``U_x^T U_y^T (top *_m bot) U_x U_y``.

    ``u3x[a, b, l]`` eats (top x-leg ``a``, bot x-leg ``b``) — top leg
    first, the shared-bond ordering both bond views agree on (see the
    2D module).  Order keeps peak memory at chi^8 and the single
    chi^11 contraction in one GEMM-shaped einsum.
    """
    return _apply_pair3_gen(top, bot, u3x, u3x, u3y, u3y, prec)


def _apply_pair3_gen(top, bot, u3x_l, u3x_r, u3y_f, u3y_k, prec):
    """The merge with per-slot isometries: on a CHECKERBOARD lattice
    the four transverse pair-bonds of a merged column belong to four
    distinct bond classes (see :func:`hotrg3d_ab_expectation`), each
    carrying its own isometry; the uniform flow passes the same one
    twice per axis."""
    chi = top.shape[0]
    # The whole merge as a chain of explicit 2-D GEMMs.  TPU layout is
    # the binding constraint, not flops: einsum lowers the 3-index
    # contractions here to convolutions over 8-D buffers whose
    # chi-sized minor dims get (8,128)-tile padded — x10.7 at chi=12
    # blew 24 GB (measured OOM).  The fix is associativity: the y-pair
    # isometry contracts into the SMALL top tensor first, so every
    # large intermediate is a 2-D GEMM operand and every regroup is a
    # fused-dim transpose whose minor dimension is >= chi^2 — no
    # materialized 8-D buffer anywhere.  The two remaining tail
    # isometries collapse into ONE GEMM against their chi^4 x chi^2
    # outer product.
    # q1: contract bot's x-leg b -> (a l) x (m f2 d r2 k2)
    botp = jnp.transpose(bot, (1, 0, 4, 2, 3, 5))  # b, m, f2, d, r2, k2
    xal = jnp.transpose(u3x_l, (0, 2, 1)).reshape(chi * chi, chi)
    q1 = jnp.matmul(xal, botp.reshape(chi, chi ** 5), precision=prec)
    # regroup -> (f2 a m) x (l d r2 k2); minor fused dim chi^3
    q5 = q1.reshape(chi, chi, chi, chi, chi ** 3)  # a, l, m, f2, (drk)
    q5 = jnp.transpose(q5, (3, 0, 2, 1, 4))        # f2, a, m, l, (drk)
    qg = q5.reshape(chi ** 3, chi ** 4)
    # topy: top's y-leg c eats u3y -> (u r1 k1 a m) x (f2 y)
    topp = jnp.transpose(top, (0, 3, 5, 1, 2, 4))  # u, r1, k1, a, m, c
    topy = jnp.matmul(topp.reshape(chi ** 5, chi),
                      u3y_f.reshape(chi, chi * chi), precision=prec)
    # regroup -> (u r1 k1 y) x (f2 a m); minor fused dim chi^2
    t4 = topy.reshape(chi ** 3, chi * chi, chi, chi)
    t4 = jnp.transpose(t4, (0, 3, 2, 1))  # (u r1 k1), y, f2, (a m)
    tg = t4.reshape(chi ** 4, chi ** 3)
    # barriers stop XLA fusing the regroup transposes into the GEMM
    # operand reads (strided MXU feeds; measured 11% on the whole
    # apply at chi=12)
    qg = jax.lax.optimization_barrier(qg)
    tg = jax.lax.optimization_barrier(tg)
    # the chi^11 GEMM — a clean (chi^4, chi^3) @ (chi^3, chi^4)
    rm = jnp.matmul(tg, qg, precision=prec)  # (u r1 k1 y) x (l d r2 k2)
    # tail: regroup (u y l d) x (r1 k1 r2 k2) (minor fused chi^2),
    # then both isometries at once against W[(r1 k1 r2 k2), (n p)]
    r5 = rm.reshape(chi, chi * chi, chi, chi * chi, chi * chi)
    r5 = jnp.transpose(r5, (0, 2, 3, 1, 4))  # u, y, (l d), (r1 k1), (r2 k2)
    rg = jax.lax.optimization_barrier(r5.reshape(chi ** 4, chi ** 4))
    w = jnp.einsum("rwn,kxp->rkwxnp", u3x_r, u3y_k, precision=prec)
    out = jnp.matmul(rg, w.reshape(chi ** 4, chi * chi), precision=prec)
    out = out.reshape((chi,) * 6)  # u, y, l, d, n(new r), p
    return jnp.transpose(out, (0, 2, 3, 4, 1, 5))  # (u, l, d, r, f, k)


def _rot3(a):
    """Cycle the lattice axes z -> x -> y: new (u,l,d,r,f,k) =
    old (l, f, r, k, u, d)."""
    return jnp.transpose(a, (1, 4, 3, 5, 0, 2))


def _merge_step3(a, imp, chi, prec, frozen_proj=False):
    """One vertical merge + axis rotation; impurity position-averaged.

    The four candidate density matrices go through ONE batched eigh:
    on TPU the (chi^2, chi^2) eigendecompositions are serial-iteration
    bound, so batching them shares the QR-sweep overhead 4 ways.
    """
    am = _swap_lr(a)
    ay = _to_y(a)
    aym = _swap_lr(ay)
    rhos = jnp.stack([
        _density_pair3(a, a, prec),
        _density_pair3(am, am, prec),
        _density_pair3(ay, ay, prec),
        _density_pair3(aym, aym, prec),
    ])
    u3s, errs = _isometry_batched(rhos, chi)
    u3x = jnp.where(errs[0] <= errs[1], u3s[0], u3s[1])
    u3y = jnp.where(errs[2] <= errs[3], u3s[2], u3s[3])
    err_l, err_r, err_f, err_k = errs[0], errs[1], errs[2], errs[3]

    if frozen_proj:
        u3x = jax.lax.stop_gradient(u3x)
        u3y = jax.lax.stop_gradient(u3y)

    a_new = _apply_pair3(a, a, u3x, u3y, prec)
    imp_new = 0.5 * (
        _apply_pair3(imp, a, u3x, u3y, prec)
        + _apply_pair3(a, imp, u3x, u3y, prec)
    )
    c = jnp.maximum(jnp.mean(jnp.abs(a_new)), 1e-300)
    err = jnp.minimum(err_l, err_r) + jnp.minimum(err_f, err_k)
    return _rot3(a_new / c), _rot3(imp_new / c), jnp.log(c), err


def _closure3(a):
    """Periodic one-tensor closure ``sum a[u, l, u, l, f, f]``."""
    return jnp.einsum("ululff->", a, precision=dot_precision(a.dtype))


@partial(jax.jit, static_argnames=("chi", "steps", "frozen_proj"))
def _hotrg3_flow(a0, imp0, chi, steps, frozen_proj=False):
    prec = dot_precision(a0.dtype)
    c0 = jnp.maximum(jnp.mean(jnp.abs(a0)), 1e-300)
    carry0 = (a0 / c0, imp0 / c0, jnp.log(c0))

    def body(carry, _):
        a, imp, g = carry
        a, imp, log_c, err = _merge_step3(a, imp, chi, prec, frozen_proj)
        return (a, imp, 2.0 * g + log_c), err

    (a, imp, g), errs = jax.lax.scan(body, carry0, None, length=steps)
    tr_a = _closure3(a)
    tr_i = _closure3(imp)
    log_z = (g + jnp.log(jnp.abs(tr_a))) / (2.0 ** steps)
    return log_z, tr_i / tr_a, errs


def hotrg3d_log_z(a, chi, steps=25):
    """``log(partition function per site)`` of the infinite cubic
    lattice built from site tensor ``a`` with legs ``(u,l,d,r,f,k)``."""
    a = jnp.asarray(a)
    a0 = _pad6(a, chi)
    log_z, _, _ = _hotrg3_flow(a0, a0, chi, int(steps))
    return float(log_z)


def hotrg3d_expectation(a, impurity, chi, steps=25):
    """One-site impurity average ``<impurity>`` on the infinite cubic
    lattice (position-averaged impurity flow sharing the pure tensor's
    isometries and normalization)."""
    a = jnp.asarray(a)
    impurity = jnp.asarray(impurity, a.dtype)
    _, ratio, _ = _hotrg3_flow(
        _pad6(a, chi), _pad6(impurity, chi), chi, int(steps)
    )
    return float(ratio)


def hotrg3d_bond_expectation(a, imp_top, imp_bot, chi, steps=25):
    """Nearest-neighbor pair expectation ``<O_i O_j>`` on a vertical
    (z-axis) bond of the cubic lattice: the first merge contracts the
    two impure tensors into ONE coarse impurity (pinned pair, no
    position averaging), sharing the pure tensor's isometries and
    normalization; it then flows as a one-site impurity.  Mirrors the
    2D :func:`~contractn_tpu.models.hotrg.hotrg_bond_expectation`."""
    a = jnp.asarray(a)
    imp_top = jnp.asarray(imp_top, a.dtype)
    imp_bot = jnp.asarray(imp_bot, a.dtype)
    prec = dot_precision(a.dtype)
    chi = int(chi)

    a0 = _pad6(a, chi)
    t0 = _pad6(imp_top, chi)
    b0 = _pad6(imp_bot, chi)
    c0 = jnp.maximum(jnp.mean(jnp.abs(a0)), 1e-300)
    a0, t0, b0 = a0 / c0, t0 / c0, b0 / c0

    rho_x = _density_pair3(a0, a0, prec)
    am = _swap_lr(a0)
    rho_xr = _density_pair3(am, am, prec)
    u3x, err_l = _isometry(rho_x, chi)
    u3xr, err_r = _isometry(rho_xr, chi)
    u3x = jnp.where(err_l <= err_r, u3x, u3xr)
    ay = _to_y(a0)
    rho_y = _density_pair3(ay, ay, prec)
    aym = _swap_lr(ay)
    rho_yr = _density_pair3(aym, aym, prec)
    u3y, err_f = _isometry(rho_y, chi)
    u3yr, err_k = _isometry(rho_yr, chi)
    u3y = jnp.where(err_f <= err_k, u3y, u3yr)

    a1 = _apply_pair3(a0, a0, u3x, u3y, prec)
    i1 = _apply_pair3(t0, b0, u3x, u3y, prec)
    c = jnp.maximum(jnp.mean(jnp.abs(a1)), 1e-300)
    _, ratio, _ = _hotrg3_flow(
        _rot3(a1 / c), _rot3(i1 / c), chi, int(steps) - 1
    )
    return float(ratio)


# ------------------------------------------------------------------ #
# Checkerboard (two-sublattice) lattices
# ------------------------------------------------------------------ #

def _min_iso(rho1, rho2, chi):
    """Shared bond isometry: the side with smaller discarded weight."""
    u1, e1 = _isometry(rho1, chi)
    u2, e2 = _isometry(rho2, chi)
    return jnp.where(e1 <= e2, u1, u2)


def _seed_checkerboard(a, b, chi, prec, imp_a=None, imp_b=None):
    """Three two-species merges collapsing the NaCl checkerboard onto
    a uniform cubic lattice.

    Site species by parity: A at even ``i+j+k``.  Merge 1 (z) pairs
    ``bot = z`` even with ``top = z`` odd, giving supersites S (bot A,
    top B; even ``i+j``) and S' (bot B, top A) on an xy-checkerboard —
    every transverse pair-bond joins S to S', so the four bond slots
    carry FOUR distinct isometries (classes S.r-S'.l, S'.r-S.l,
    S.f-S'.k, S'.f-S.k).  Merge 2 (x, after rotation) pairs S/S' into
    T/T' alternating only along y (the old-z bonds are now same-species
    with per-species isometries); merge 3 (y) yields ONE uniform
    tensor.  Optional impurities replace the A (bot) and/or B (top) of
    one z-pair and ride the S -> T -> U chain pinned (top position at
    each stage), sharing the pure tensors' isometries and norms;
    position averaging starts in the uniform flow.

    Returns ``(u, imp_u, g_u)``: the uniform tensor (mean |u| = 1),
    the impurity at the same scale, and the accumulated log-scale of
    one 8-site supersite.
    """
    if imp_a is None:
        imp_a = a
    if imp_b is None:
        imp_b = b

    def _norm(t):
        c = jnp.maximum(jnp.mean(jnp.abs(t)), 1e-300)
        return t / c, jnp.log(c)

    # ---- merge 1: along z; S = (top b | bot a), S' = (top a | bot b)
    u3x1 = _min_iso(
        _density_pair3(a, b, prec),
        _density_pair3(_swap_lr(b), _swap_lr(a), prec), chi)
    u3x2 = _min_iso(
        _density_pair3(b, a, prec),
        _density_pair3(_swap_lr(a), _swap_lr(b), prec), chi)
    u3y1 = _min_iso(
        _density_pair3(_swap_lr(_to_y(a)), _swap_lr(_to_y(b)), prec),
        _density_pair3(_to_y(b), _to_y(a), prec), chi)
    u3y2 = _min_iso(
        _density_pair3(_to_y(a), _to_y(b), prec),
        _density_pair3(_swap_lr(_to_y(b)), _swap_lr(_to_y(a)), prec),
        chi)
    s = _apply_pair3_gen(b, a, u3x2, u3x1, u3y1, u3y2, prec)
    sp = _apply_pair3_gen(a, b, u3x1, u3x2, u3y2, u3y1, prec)
    s_imp = _apply_pair3_gen(imp_b, imp_a, u3x2, u3x1, u3y1, u3y2,
                             prec)
    s, gs = _norm(s)
    sp, gsp = _norm(sp)
    s_imp = s_imp * jnp.exp(-gs)
    s, sp, s_imp = _rot3(s), _rot3(sp), _rot3(s_imp)

    # ---- merge 2: along old x; T = (top s | bot sp) at even old-y
    xt1 = _min_iso(
        _density_pair3(sp, s, prec),
        _density_pair3(_swap_lr(s), _swap_lr(sp), prec), chi)
    xt2 = _min_iso(
        _density_pair3(s, sp, prec),
        _density_pair3(_swap_lr(sp), _swap_lr(s), prec), chi)
    yt = _min_iso(
        _density_pair3(_to_y(s), _to_y(sp), prec),
        _density_pair3(_swap_lr(_to_y(s)), _swap_lr(_to_y(sp)), prec),
        chi)
    ytp = _min_iso(
        _density_pair3(_to_y(sp), _to_y(s), prec),
        _density_pair3(_swap_lr(_to_y(sp)), _swap_lr(_to_y(s)), prec),
        chi)
    t = _apply_pair3_gen(s, sp, xt2, xt1, yt, yt, prec)
    tp = _apply_pair3_gen(sp, s, xt1, xt2, ytp, ytp, prec)
    t_imp = _apply_pair3_gen(s_imp, sp, xt2, xt1, yt, yt, prec)
    t, gt = _norm(t)
    tp, gtp = _norm(tp)
    t_imp = t_imp * jnp.exp(-gt)
    t, tp, t_imp = _rot3(t), _rot3(tp), _rot3(t_imp)

    # ---- merge 3: along old y.  ORIENTATION TRAP (cost a debugging
    # session): after two rotations the frame's "down" leg is the
    # original MINUS-y leg, so the vertical bond top.d2—bot.u2 is
    # (site j+1).k0—(site j).f0 — the TOP tensor is the ODD sublattice
    # T' and the impurity (even j) rides the BOT slot.  Merge 2 is the
    # opposite (frame-1 down = original +x): top there is the even
    # site.  Uniform U = (top tp | bot t).
    u3x = _min_iso(
        _density_pair3(tp, t, prec),
        _density_pair3(_swap_lr(tp), _swap_lr(t), prec), chi)
    u3y = _min_iso(
        _density_pair3(_to_y(tp), _to_y(t), prec),
        _density_pair3(_swap_lr(_to_y(tp)), _swap_lr(_to_y(t)), prec),
        chi)
    uu = _apply_pair3_gen(tp, t, u3x, u3x, u3y, u3y, prec)
    u_imp = _apply_pair3_gen(tp, t_imp, u3x, u3x, u3y, u3y, prec)
    uu, gu = _norm(uu)
    u_imp = u_imp * jnp.exp(-gu)
    g_total = 2.0 * (gs + gsp) + gt + gtp + gu
    return _rot3(uu), _rot3(u_imp), g_total


@partial(jax.jit, static_argnames=("chi", "steps"))
def _hotrg3_ab(a, b, imp_a, imp_b, chi, steps):
    prec = dot_precision(a.dtype)
    uu, imp_u, g_seed = _seed_checkerboard(a, b, chi, prec, imp_a,
                                           imp_b)
    log_z_u, ratio, errs = _hotrg3_flow(uu, imp_u, chi, steps)
    # _hotrg3_flow's per-input-site log z + the seed scale, per 8 sites
    return (g_seed + log_z_u) / 8.0, ratio, errs


def hotrg3d_ab_log_z(a, b, chi, steps=22):
    """``log Z`` per site of the two-sublattice (NaCl checkerboard)
    cubic lattice with alternating site tensors ``a`` / ``b``.  With
    ``a == b`` this reproduces :func:`hotrg3d_log_z` (pinned in the
    tests) — the seeds are then just three uniform merge steps."""
    a = jnp.asarray(a)
    b = jnp.asarray(b, a.dtype)
    lz, _, _ = _hotrg3_ab(_pad6(a, chi), _pad6(b, chi), None, None,
                          chi, int(steps))
    return float(lz)


def hotrg3d_ab_expectation(a, b, imp_a=None, imp_b=None, chi=6,
                           steps=22):
    """Impurity expectation on the checkerboard lattice: ``imp_a``
    replaces one A-sublattice tensor, ``imp_b`` the B tensor directly
    above it — one for a sublattice-resolved one-site observable, both
    for a z-bond pair observable."""
    a = jnp.asarray(a)
    b = jnp.asarray(b, a.dtype)
    imp_a = None if imp_a is None else _pad6(jnp.asarray(imp_a,
                                                         a.dtype), chi)
    imp_b = None if imp_b is None else _pad6(jnp.asarray(imp_b,
                                                         a.dtype), chi)
    _, ratio, _ = _hotrg3_ab(_pad6(a, chi), _pad6(b, chi), imp_a,
                             imp_b, chi, int(steps))
    return float(ratio)


def hotrg3d_log_z_diff(a, chi, steps=20):
    """Traced ``log Z`` per site, reverse-differentiable through the
    whole 3D flow with FROZEN projectors — same rule and rationale as
    :func:`contractn_tpu.models.hotrg.hotrg_log_z_diff` (the truncation
    boundary cuts degenerate multiplets where any eigh VJP diverges;
    the frozen-projector gradient equals the impurity-flow insertion)."""
    a0 = _pad6(jnp.asarray(a), chi)
    log_z, _, _ = _hotrg3_flow(a0, a0, chi, int(steps), frozen_proj=True)
    return log_z


def ising3d_tensor_smooth(beta, h_field=0.0, beta_z=None):
    """Cubic-lattice Ising site tensor, smooth in ``beta`` for autodiff.

    Bond Boltzmann factor split as ``W = [[sqrt(cosh b), sqrt(sinh b)],
    [sqrt(cosh b), -sqrt(sinh b)]]`` per axis (exact closed-form
    eigendecomposition, as in the 2D smooth builder).  ``beta_z``
    optionally decouples the z axis (``beta_z=0`` gives exactly stacked
    independent 2D layers — the structural anchor the tests pin against
    Onsager).  Legs ``(u, l, d, r, f, k)`` with u/d the z axis.
    """
    beta = jnp.asarray(beta)
    if beta_z is None:
        beta_z = beta

    def w_of(b):
        b = jnp.asarray(b, beta.dtype)
        ch = jnp.sqrt(jnp.cosh(b))
        sh = jnp.sqrt(jnp.sinh(b))
        return jnp.stack([jnp.stack([ch, sh]), jnp.stack([ch, -sh])])

    w = w_of(beta)
    wz = w_of(beta_z)
    weight = jnp.exp(h_field * jnp.asarray([1.0, -1.0], beta.dtype))
    return jnp.einsum(
        "s,su,sl,sd,sr,sf,sk->uldrfk", weight, wz, w, wz, w, w, w,
        precision=dot_precision(w.dtype),
    )


def ising3d_internal_energy_ad(beta, chi, steps=20, h_field=0.0):
    """Internal energy per site ``u = -d log Z / d beta`` of the 3D
    Ising model by one reverse pass over the frozen-projector flow."""
    grad = jax.grad(
        lambda b: hotrg3d_log_z_diff(
            ising3d_tensor_smooth(b, h_field), chi, steps
        )
    )
    return float(-grad(jnp.asarray(beta, jnp.float64)))
