"""Fermionic infinite PEPS (models/fipeps.py).

Validation ladder:

1. the fermionized double-layer sign rule, re-verified per configuration
   against the exact string bookkeeping on random Gauss-law samples;
2. value level: the fermionized E-network contracted densely equals the
   Fock-pinned ``fpeps_norm_sweep`` on enumerable lattices;
3. stacked-chain anchors: trivial vertical (resp. horizontal) bonds
   reduce the 2D network to independent uniform fermionic chains whose
   Kitaev-chain energy is computed from first principles (dense MPS
   transfer matrix + JW) — machine precision, BOTH orientations, all
   four term kinds exercised (hopping + pairing + density);
4. physics: the D=2 gradient ground state of the gapped 2D spinless
   p-wave model matches the exact BdG k-space integral (which is itself
   pinned against periodic-lattice Fock ED here).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from contractn_tpu.models.fipeps import (
    H_RIGHT_EXTRA,
    NORM_RULE,
    V_BOT_EXTRA,
    V_TOP_EXTRA,
    bdg_energy_2d,
    fdouble,
    fipeps_energy,
    fipeps_ground_state,
    parity_mask_site,
)
from contractn_tpu.models.fswap import (
    fpeps_norm_sweep,
    random_fpeps,
)

SP = np.array([[0.0, 0.0], [1.0, 0.0]])
SM = SP.T
NOP = np.diag([0.0, 1.0])
TRIV = np.zeros(1, np.int64)


def _legpar(ly, lx, r, c, ph_vec, pv_vec):
    pu = pv_vec[(r - 1, c)] if r > 0 else TRIV
    pl = ph_vec[(r, c - 1)] if c > 0 else TRIV
    pd = pv_vec[(r, c)] if r < ly - 1 else TRIV
    pr = ph_vec[(r, c)] if c < lx - 1 else TRIV
    return (pu, pl, pd, pr)


def _dense_net(es):
    """Exact contraction of a small grid of (u2, l2, d2, r2) tensors."""
    ly, lx = len(es), len(es[0])
    bnd = None
    for r in range(ly):
        acc = None
        ups = []
        for c in range(lx):
            t = np.asarray(es[r][c])
            if acc is None:
                acc = t[:, 0]  # (u, d, r); left boundary trivial
                ups = [t.shape[0]]
                continue
            acc = np.tensordot(acc, t, axes=([-1], [1]))
            nl = len(ups)
            perm = (list(range(nl)) + [2 * nl]
                    + list(range(nl, 2 * nl)) + [2 * nl + 1, 2 * nl + 2])
            acc = np.transpose(acc, perm)
            ups.append(t.shape[0])
        acc = acc[..., 0]
        if bnd is None:
            bnd = acc[(0,) * lx]
        else:
            bnd = np.tensordot(bnd, acc, axes=(list(range(lx)),
                                               list(range(lx))))
    return float(bnd.reshape(()))


def test_fermionized_norm_matches_exact_sweep():
    """Dense contraction of the fermionized double-layer network ==
    the Fock-pinned exact sweep, incl. mixed-parity bonds."""
    for (ly, lx, bp, seed) in [(2, 3, (0, 1), 1), (3, 2, (0, 1, 0), 5),
                               (2, 2, (0, 0, 1, 1), 6)]:
        tn, ph, pv = random_fpeps(ly, lx, bond_parities=bp, seed=seed)
        es = [[fdouble(jnp.asarray(tn[r][c]),
                       _legpar(ly, lx, r, c, ph, pv))
               for c in range(lx)] for r in range(ly)]
        got = _dense_net(es)
        want = float(fpeps_norm_sweep(tn, ph, pv))
        assert abs(got - want) < 1e-10 * max(1.0, abs(want)), (ly, lx)


def test_impurity_pair_rules_match_fock():
    """NN two-fermion insertions through the fermionized network ==
    the dense Fock oracle (both bond orientations; the vertical pair is
    off-column so the JW-string absorption is genuinely exercised)."""
    from contractn_tpu.models.fswap import fpeps_expectation_dense

    z = np.diag([1.0, -1.0])
    for kind, (a, b) in (("h", ((1, 0), (1, 1))),
                         ("v", ((0, 1), (1, 1)))):
        ly, lx = 2, 2
        tn, ph, pv = random_fpeps(ly, lx, seed=3)
        es = [[fdouble(jnp.asarray(tn[r][c]),
                       _legpar(ly, lx, r, c, ph, pv))
               for c in range(lx)] for r in range(ly)]
        xa = () if kind == "h" else V_TOP_EXTRA
        xb = H_RIGHT_EXTRA if kind == "h" else V_BOT_EXTRA
        za = fdouble(jnp.asarray(tn[a[0]][a[1]]),
                     _legpar(ly, lx, *a, ph, pv), op=SP, extra=xa)
        zb = fdouble(jnp.asarray(tn[b[0]][b[1]]),
                     _legpar(ly, lx, *b, ph, pv), op=SM, extra=xb)
        mod = [[za if (r, c) == a else zb if (r, c) == b else es[r][c]
                for c in range(lx)] for r in range(ly)]
        got = _dense_net(mod) / _dense_net(es)

        n = ly * lx

        def op_at(mats):
            m = np.eye(1)
            for k in range(n):
                m = np.kron(m, mats.get(k, np.eye(2)))
            return m

        m_, n_ = a[0] * lx + a[1], b[0] * lx + b[1]
        ops = {m_: SP, n_: SM}
        for k in range(m_ + 1, n_):
            ops[k] = z
        want = float(np.real(fpeps_expectation_dense(
            tn, ph, pv, op_at(ops))))
        assert abs(got - want) < 1e-10 * max(1.0, abs(want)), kind


def _chain_reference(m, bp, t, mu, delta):
    """Kitaev-chain per-site energy of the sign-dressed uMPS (dense
    transfer fixed points + JW; fully independent of fipeps code)."""
    bp = np.asarray(bp)
    mabs = m * ((-1.0) ** (bp[None, :, None] * bp[None, None, :]))
    dd = m.shape[1]

    def tmat(op):
        return np.einsum("nlr,nm,mLR->lLrR", mabs, op,
                         mabs).reshape(dd * dd, dd * dd)

    tt = tmat(np.eye(2))
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam, r = w[i].real, vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    l_ = vl[:, np.argmax(np.abs(wl))].real
    nrm = l_ @ r

    def one(op):
        return (l_ @ tmat(op) @ r) / (lam * nrm)

    def two(o1, o2):
        return (l_ @ tmat(o1) @ tmat(o2) @ r) / (lam ** 2 * nrm)

    hop = two(SP, SM) + two(SM, SP)
    pair = two(SP, SP) + two(SM, SM)
    return -t * hop + delta * pair - mu * one(NOP), one(NOP)


@pytest.mark.parametrize("orient", ["h", "v"])
def test_stacked_chain_anchor(orient):
    """fipeps on decoupled uniform chains == the independent 1D
    transfer-matrix Kitaev value, machine precision.  Exercises every
    term kind and (via ``orient``) both bond sign rules inside the
    converged CTMRG environment."""
    rng = np.random.default_rng(3)
    bp = np.array([0, 1])
    m = 0.35 * rng.standard_normal((2, 2, 2))
    for n in range(2):
        for l_ in range(2):
            for r in range(2):
                if (n + bp[l_] + bp[r]) % 2:
                    m[n, l_, r] = 0.0
    m[0, 0, 0] += 1.0
    m[1, 0, 1] += 0.8  # push occupation away from the vacuum
    t, mu, delta = 1.0, 0.4, 0.6
    want_e, want_n = _chain_reference(m, bp, t, mu, delta)

    if orient == "h":
        a = m[:, None, :, None, :]
        pars = (TRIV, bp, TRIV, bp)
    else:
        a = m[:, :, None, :, None]
        pars = (bp, TRIV, bp, TRIV)
    got_e, got_n = fipeps_energy(jnp.asarray(a), pars, chi=8, t=t,
                                 mu=mu, delta=delta, iters=40)
    assert abs(got_e - want_e) < 1e-9
    assert abs(got_n - want_n) < 1e-9


def test_fipeps_correlator_stacked_chains():
    """Long-range <c^d_0 c_r> and pairing <c^d_0 c^d_r> through the
    fitted row-string rule == the dense chain transfer value with
    explicit JW parity insertions, r = 1..4.  (Column strings need
    dressed environments in this gauge — fipeps.py H_MID_EXTRA note.)
    """
    orient = "h"
    from contractn_tpu.models.fipeps import (
        fipeps_correlator,
        fipeps_env,
    )

    rng = np.random.default_rng(3)
    bp = np.array([0, 1])
    m = 0.35 * rng.standard_normal((2, 2, 2))
    for n in range(2):
        for l_ in range(2):
            for r in range(2):
                if (n + bp[l_] + bp[r]) % 2:
                    m[n, l_, r] = 0.0
    m[0, 0, 0] += 1.0
    m[1, 0, 1] += 0.8

    z = np.diag([1.0, -1.0])
    mabs = m * ((-1.0) ** (bp[None, :, None] * bp[None, None, :]))

    def tmat(op):
        return np.einsum("nlr,nm,mLR->lLrR", mabs, op,
                         mabs).reshape(4, 4)

    tt = tmat(np.eye(2))
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam, rv = w[i].real, vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    lv = vl[:, np.argmax(np.abs(wl))].real
    nrm = lv @ rv

    def chain_corr(o1, o2, r):
        acc = tmat(o1)
        for _ in range(r - 1):
            acc = acc @ tmat(z)
        acc = acc @ tmat(o2)
        return (lv @ acc @ rv) / (lam ** (r + 1) * nrm)

    a = jnp.asarray(m[:, None, :, None, :])
    pars = (TRIV, bp, TRIV, bp)
    env = fipeps_env(a, pars, chi=8, iters=40)
    rs = [1, 2, 3, 4]
    got_hop = fipeps_correlator(a, pars, env, SP, SM, rs)
    got_pair = fipeps_correlator(a, pars, env, SP, SP, rs)
    for k, r in enumerate(rs):
        assert abs(got_hop[k] - chain_corr(SP, SM, r)) < 1e-9, r
        assert abs(got_pair[k] - chain_corr(SP, SP, r)) < 1e-9, r


def test_bdg_integral_pinned_by_periodic_ed():
    """bdg_energy_2d's k-space formula == dense Fock ED of the PERIODIC
    3x3 Hamiltonian evaluated on the discrete k grid (pins every
    factor-of-two convention)."""
    t, mu, delta = 1.0, -1.0, 0.7
    ly = lx = 3
    n = ly * lx
    smf = np.array([[0.0, 1.0], [0.0, 0.0]])
    z = np.diag([1.0, -1.0])

    def op_at(mats):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, mats.get(k, np.eye(2)))
        return m

    cs = [op_at({**{j: z for j in range(i)}, i: smf})
          for i in range(n)]
    h = np.zeros((2 ** n, 2 ** n))
    for r in range(ly):
        for c in range(lx):
            i = r * lx + c
            h += -mu * (cs[i].T @ cs[i])
            for (r2, c2) in ((r, (c + 1) % lx), ((r + 1) % ly, c)):
                j = r2 * lx + c2
                h += -t * (cs[i].T @ cs[j] + cs[j].T @ cs[i])
                h += delta * (cs[i].T @ cs[j].T + cs[j] @ cs[i])
    want = np.linalg.eigvalsh(h)[0] / n

    es = []
    for iy in range(ly):
        for ix in range(lx):
            kx, ky = 2 * np.pi * ix / lx, 2 * np.pi * iy / ly
            eps = -2 * t * (np.cos(kx) + np.cos(ky)) - mu
            dk = 2 * delta * (np.sin(kx) + np.sin(ky))
            es.append((eps - np.sqrt(eps ** 2 + dk ** 2)) / 2)
    assert abs(float(np.mean(es)) - want) < 1e-9


def test_fipeps_ground_state_matches_bdg():
    """D=2 gradient ground state of the gapped p-wave model: within 1%
    of the exact k-space integral, from above (variational)."""
    t, mu, delta = 1.0, -4.4, 1.0
    want = bdg_energy_2d(t, mu, delta)
    a, e, dens, es = fipeps_ground_state(
        bond_parities=(0, 1), chi=12, t=t, mu=mu, delta=delta,
        steps=200, lr=2e-2, seed=0)
    assert e > want - 1e-8  # variational bound
    assert abs(e - want) < 1e-2 * abs(want)
    assert 0.01 < dens < 0.5  # genuinely away from the vacuum
    # the optimized tensor stays exactly on the fermionic manifold
    bp = np.array([0, 1])
    mask = np.asarray(parity_mask_site((bp,) * 4))
    assert float(np.max(np.abs(np.asarray(a) * (1 - mask)))) == 0.0
    # the trace is a descent (loosely: tail below the early plateau)
    assert es[-1] < es[20]

    # cross-check against the FINITE Fock-anchored machinery: embed the
    # uniform tensor in an open 6x6 lattice (boundary legs sliced to
    # their even index) — the central density must approach the
    # infinite-lattice CTMRG value as the boundary decays
    from contractn_tpu.models.fswap import fpeps_norm_boundary

    a_np = np.asarray(a)
    ly = lx = 6
    ph = {(r, c): bp for r in range(ly) for c in range(lx - 1)}
    pv = {(r, c): bp for r in range(ly - 1) for c in range(lx)}
    tens = []
    for r in range(ly):
        row = []
        for c in range(lx):
            tt = a_np
            if r == 0:
                tt = tt[:, :1]
            if c == 0:
                tt = tt[:, :, :1]
            if r == ly - 1:
                tt = tt[:, :, :, :1]
            if c == lx - 1:
                tt = tt[:, :, :, :, :1]
            row.append(tt)
        tens.append(row)
    mid = (ly // 2, lx // 2)
    num = fpeps_norm_boundary(tens, ph, pv, op=NOP, site=mid, chi=24)
    den = fpeps_norm_boundary(tens, ph, pv, chi=24)
    assert abs(num / den - dens) < 5e-4
