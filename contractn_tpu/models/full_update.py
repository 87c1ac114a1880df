"""iPEPS full update: environment-metric bond truncation (checkerboard).

The simple update (:mod:`contractn_tpu.models.ipeps_cell`) truncates each
gated bond in the *mean-field* metric of its bond weights — cheap, but the
truncation ignores loop correlations and its fixed point is biased away
from the variational optimum.  The other extreme already in the package,
autodiff through the CTMRG fixed point
(:mod:`contractn_tpu.models.variational`), is the most accurate but pays a
full gradient flow per step.  This module supplies the classic middle
ground — the **full update** (Jordan-Orus-Vidal scheme, with the
fast-full-update environment recycling of Phien et al.): every Trotter
gate is truncated in the metric of the *true* CTMRG environment of its
bond, so the imaginary-time flow itself respects loop correlations.

Per bond the algorithm is:

1. **Reduced split.**  The left/right site tensors are QR-split so only
   the (physical, bond-leg) factors ``aR (k, d, D)`` / ``bR (k, d, D)``
   participate in the gate; the isometric spectators ``X (u, l, dn, k)``
   and ``Y (u, dn, r, k)`` stay fixed (cost drops from ``d^2 D^8`` to
   ``d^2 D^2`` in the ALS core).
2. **Bond metric.**  The 1x2 CTMRG ring patch is contracted with the
   double layers of ``X``/``Y`` leaving the four reduced-bond legs open
   — the environment tensor ``N[m, M, n, N]`` (ket pair, bra pair).  Its
   Hermitian part is eigen-clipped to the **positive approximant** (the
   metric must be PSD for the ALS normal equations to be solvable; CTMRG
   truncation leaves small negative directions).
3. **Gated ALS truncation.**  ``theta = gate (aR . bR)`` has bond rank up
   to ``d D``; alternating least squares in the metric ``N (x) 1_phys``
   finds the rank-``D`` pair minimizing the TRUE state-space distance.
   The normal matrices are Hermitian PSD and solved by eigh-pseudoinverse
   (relative cutoff — the environment is singular whenever the CTMRG
   basis over-spans, which is the generic case).
4. **Recycle.**  ``X aR'`` / ``Y bR'`` replace the sites and the standing
   environment is refreshed with ``n_ctm`` CTMRG iterations (fast full
   update) instead of a cold re-convergence.

Only the horizontal A-B bond is coded; B-A uses the same patch at the
shifted cell column and the two vertical orientations ride ONE lattice
rotation of state + environment (`ctmrg_cell.rotate`) — the exact trick
the simple update and the cell energy already use, so there is a single
index convention to get right.

TPU shape: after one eager `ctmrg_cell` convergence fixes the environment
shapes, a whole Trotter stage (gate -> 4 bond ALS solves -> environment
refreshes -> rotations) is ONE jitted ``lax.fori_loop`` program — static
shapes, zero host syncs; the per-step eigh/QR/SVD blocks are tiny
(``k D x k D`` with ``k = min(D^3, d D)``).

Validated in ``tests/test_full_update.py``: identity gates leave the
state's energy invariant (the ALS truncation must be an exact fixed point
at rank ``D``); Heisenberg and TFIM energies improve on the simple-update
state at equal ``D`` and stay above the exact QMC bound.

No 2D capability of any kind exists in the reference (SURVEY.md §2:
contraction engine only).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import dot_precision, peinsum
from .ctmrg_cell import _iteration, ctmrg_cell, rotate
from .ipeps_cell import (_VPERM, checkerboard_cell, cell_energy_from_env,
                         simple_update_cell, su_cell_absorb)

_PINV_TOL = 1e-12  # relative eigenvalue cutoff for metric pseudo-inverses


def _norm(t):
    return t / jnp.maximum(jnp.max(jnp.abs(t)), 1e-300)


# --------------------------------------------------------------------- #
# Reduced splits (QR): spectator isometry x (phys, bond-leg) factor
# --------------------------------------------------------------------- #


def _split_right(t):
    """``t (s,u,l,dn,r) = X (u,l,dn,k) . aR (k,s,r)`` — right-bond role."""
    d = t.shape[0]
    u, l, dn, r = t.shape[1], t.shape[2], t.shape[3], t.shape[4]
    mat = jnp.transpose(t, (1, 2, 3, 0, 4)).reshape(u * l * dn, d * r)
    q, rr = jnp.linalg.qr(mat)
    k = q.shape[1]
    return q.reshape(u, l, dn, k), rr.reshape(k, d, r)


def _split_left(t):
    """``t (s,u,l,dn,r) = Y (u,dn,r,k) . bR (k,s,l)`` — left-bond role."""
    d = t.shape[0]
    u, l, dn, r = t.shape[1], t.shape[2], t.shape[3], t.shape[4]
    mat = jnp.transpose(t, (1, 3, 4, 0, 2)).reshape(u * dn * r, d * l)
    q, rr = jnp.linalg.qr(mat)
    k = q.shape[1]
    return q.reshape(u, dn, r, k), rr.reshape(k, d, l)


def _open_right_dbl(x):
    """Double layer of ``X (u,l,dn,k)`` with the ``(k, k*)`` pair open:
    ``(q_u, q_l, q_d, k, k*)``."""
    dbl = peinsum("uldk,ULDK->uUlLdDkK", x, jnp.conj(x))
    u, l, dn, k = x.shape
    return dbl.reshape(u * u, l * l, dn * dn, k, k)


def _open_left_dbl(y):
    """Double layer of ``Y (u,dn,r,k)``: ``(q_u, q_d, q_r, k, k*)``."""
    dbl = peinsum("udrk,UDRK->uUdDrRkK", y, jnp.conj(y))
    u, dn, r, k = y.shape
    return dbl.reshape(u * u, dn * dn, r * r, k, k)


# --------------------------------------------------------------------- #
# Bond environment and its positive approximant
# --------------------------------------------------------------------- #


def _bond_env(env, x, y, xx, yy, lx):
    """``N[m, M, n, N]``: the 1x2 ring patch of `pair_weight_h` with the
    reduced-bond double layers substituted and their ``(ket, bra)`` legs
    left open (``m, M`` on the left site, ``n, N`` on the right)."""
    c1, c2, c3, c4, t1, t2, t3, t4 = env
    x2 = (x + 1) % lx
    return peinsum(
        "ab,auc,cve,ef,blg,uldmM,vyrnN,frh,gi,idj,jyk,hk->mMnN",
        c1[x][y], t1[x][y], t1[x2][y], c2[x2][y], t4[x][y],
        xx, yy, t2[x2][y], c4[x][y], t3[x][y], t3[x2][y], c3[x2][y],
    )


def _metric(nmat, prec):
    """Positive approximant ``g4[m, n, M, N]`` of the bond environment:
    hermitize over (ket pair, bra pair), eigh, clip negatives to zero.
    Normalized to unit spectral radius (the metric scale is arbitrary)."""
    k1, k2 = nmat.shape[0], nmat.shape[2]
    m = jnp.transpose(nmat, (0, 2, 1, 3)).reshape(k1 * k2, k1 * k2)
    m = 0.5 * (m + jnp.conj(m.T))
    m = m / jnp.maximum(jnp.max(jnp.abs(m)), 1e-300)
    w, v = jnp.linalg.eigh(m)
    w = jnp.clip(w, 0.0, None)
    g = jnp.matmul(v * w[None, :], jnp.conj(v.T), precision=prec)
    return g.reshape(k1, k2, k1, k2)


def _psolve(h, rhs, prec):
    """``h x = rhs`` for Hermitian PSD ``h`` by eigh pseudo-inverse
    (relative cutoff — the normal matrix is singular whenever the
    environment does not fully resolve the reduced bond space)."""
    w, v = jnp.linalg.eigh(h)
    wmax = jnp.maximum(jnp.max(jnp.abs(w)), 1e-300)
    inv = jnp.where(w > _PINV_TOL * wmax,
                    1.0 / jnp.maximum(w, 1e-300), 0.0)
    tmp = jnp.matmul(jnp.conj(v.T), rhs, precision=prec)
    return jnp.matmul(v, inv[:, None] * tmp, precision=prec)


# --------------------------------------------------------------------- #
# ALS truncation of the gated bond in the environment metric
# --------------------------------------------------------------------- #


def _als_truncate(g4, theta, bond, n_als, prec):
    """Rank-``bond`` pair ``aR (m,s,a), bR (n,t,a)`` minimizing
    ``|theta - aR.bR|^2`` in the metric ``g4[m,n,M,N] (x) 1_{s,t}``.

    Seeded by the plain truncated SVD of ``theta``; ``n_als`` alternating
    sweeps of the two normal-equation solves (each Hermitian PSD,
    eigh-pinv regularized)."""
    k1, d, _, k2 = (theta.shape[0], theta.shape[1], theta.shape[2],
                    theta.shape[3])
    mat = theta.reshape(k1 * d, d * k2)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    rs = jnp.sqrt(s)
    ar = (u * rs[None, :]).reshape(k1, d, bond)
    br = jnp.transpose((rs[:, None] * vh).reshape(bond, d, k2), (2, 1, 0))

    for _ in range(n_als):
        # solve for aR with bR held
        bp = peinsum("nta,Ntb->nNab", br, jnp.conj(br))
        rmat = peinsum("mnMN,nNab->Mbma", g4, bp)
        rhs = peinsum("mnMN,mstn,Ntb->Mbs", g4, theta, jnp.conj(br))
        sol = _psolve(rmat.reshape(k1 * bond, k1 * bond),
                      rhs.reshape(k1 * bond, d), prec)
        ar = jnp.transpose(sol.reshape(k1, bond, d), (0, 2, 1))
        # solve for bR with aR held
        ap = peinsum("msa,Msb->mMab", ar, jnp.conj(ar))
        rmat = peinsum("mnMN,mMab->Nbna", g4, ap)
        rhs = peinsum("mnMN,mstn,Msb->Nbt", g4, theta, jnp.conj(ar))
        sol = _psolve(rmat.reshape(k2 * bond, k2 * bond),
                      rhs.reshape(k2 * bond, d), prec)
        br = jnp.transpose(sol.reshape(k2, bond, d), (0, 2, 1))
    return ar, br


# --------------------------------------------------------------------- #
# One bond, one step, one stage
# --------------------------------------------------------------------- #


def _bond_update(a, b, env, gate4, x, bond, n_als, prec):
    """Gate + environment-metric truncation of the horizontal bond at
    cell column ``x`` of the checkerboard (row 0): ``x = 0`` is the
    A.r--B.l bond, ``x = 1`` the B.r--A.l bond."""
    left, right = (a, b) if x == 0 else (b, a)
    xs, ar = _split_right(left)
    ys, br = _split_left(right)
    nmat = _bond_env(env, x, 0, _open_right_dbl(xs), _open_left_dbl(ys),
                     2)
    g4 = _metric(nmat, prec)
    theta = peinsum("msc,ntc->mstn", ar, br)
    theta = peinsum("STst,mstn->mSTn", gate4, theta)
    ar, br = _als_truncate(g4, theta, bond, n_als, prec)
    new_left = _norm(peinsum("uldk,ksr->suldr", xs, ar))
    new_right = _norm(peinsum("udrk,ksl->suldr", ys, br))
    return (new_left, new_right) if x == 0 else (new_right, new_left)


def _fu_step(a, b, env, gate4, chi, bond, n_als, n_ctm, prec):
    """One Trotter step: gate all four bond orientations (two in the
    native frame, two in the once-rotated frame where vertical bonds are
    horizontal), refreshing the environment after every bond."""
    for frame in range(4):
        if frame < 2:
            for x in (0, 1):
                a, b = _bond_update(a, b, env, gate4, x, bond, n_als,
                                    prec)
                cell = checkerboard_cell(a, b)
                for _ in range(n_ctm):
                    env = _iteration(cell, env, chi, prec)
        # rotate into the next frame (4 quarter turns = identity)
        cell = checkerboard_cell(a, b)
        _, env = rotate(cell, env)
        a, b = jnp.transpose(a, _VPERM), jnp.transpose(b, _VPERM)
    return a, b, env


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _fu_stage(a, b, env, gate4, n_iter, chi, bond, n_als, n_ctm):
    prec = dot_precision(a.dtype)

    def body(_, carry):
        aa, bb, ee = carry
        return _fu_step(aa, bb, ee, gate4, chi, bond, n_als, n_ctm, prec)

    return jax.lax.fori_loop(0, n_iter, body, (a, b, env))


# --------------------------------------------------------------------- #
# Drivers
# --------------------------------------------------------------------- #


def full_update_cell(h2, bond_dim, chi, d=2,
                     schedule=((0.05, 30), (0.01, 30)),
                     su_schedule=((0.1, 150), (0.02, 150), (0.005, 80)),
                     n_als=6, n_ctm=1, ctm_iters=60,
                     dtype=jnp.float64, init=None):
    """Checkerboard fast-full-update imaginary-time flow.

    Args:
        h2: swap-symmetric nearest-neighbor bond term ``(d^2, d^2)``
            (same caveat as :func:`ipeps_cell.simple_update_cell` — the
            B-A bonds apply it in swapped site order).
        bond_dim: PEPS virtual dimension D.
        chi: environment dimension of the standing CTMRG metric.
        schedule: ``((dt, n_steps), ...)`` full-update Trotter ladder.
        su_schedule: simple-update warm-start ladder (skipped when
            ``init`` supplies ``(a_site, b_site)`` directly).
        n_als: alternating-least-squares sweeps per bond.
        n_ctm: fast-full-update CTMRG refresh iterations per bond.
        ctm_iters: iterations for the initial environment convergence.

    Returns:
        ``(a_site, b_site, env)`` — the updated pair and its standing
        environment (pass to :func:`ipeps_cell.cell_energy` for a fresh
        variational energy).
    """
    h2 = jnp.asarray(h2, dtype)
    if init is None:
        ga, gb, lams = simple_update_cell(h2, bond_dim, d=d,
                                          schedule=su_schedule,
                                          dtype=dtype)
        a, b = su_cell_absorb(ga, gb, lams)
    else:
        a, b = (jnp.asarray(t, dtype) for t in init)
    a, b = _norm(a), _norm(b)
    env = ctmrg_cell(checkerboard_cell(a, b), chi, iters=ctm_iters)

    from .itebd import two_site_gate

    for dt, n_iter in schedule:
        gate4 = two_site_gate(h2, dt).reshape(d, d, d, d)
        a, b, env = _fu_stage(a, b, env, gate4, int(n_iter), chi,
                              bond_dim, n_als, n_ctm)
    return a, b, env


def full_update_ground_state(h2, bond_dim, chi, d=2,
                             schedule=((0.05, 30), (0.01, 30)),
                             iters=150, **kwargs):
    """Ground state by fast full update; the energy is measured in a
    FRESHLY converged environment (never the recycled one).

    Returns ``(a_site, b_site, energy_per_site)``.
    """
    a, b, _ = full_update_cell(h2, bond_dim, chi, d=d, schedule=schedule,
                               **kwargs)
    cell = checkerboard_cell(a, b)
    env = ctmrg_cell(cell, chi, iters=iters)
    energy = cell_energy_from_env(a, b, h2, cell, env)
    return a, b, energy
