"""Spinful fermionic iPEPS / 2D Hubbard (models/fipeps_spin.py).

Validation ladder (mirrors test_fipeps.py one dimension up in the
physical grading):

1. dense fermionized-double-layer contractions == the SPINFUL
   row-major Fock oracle on a 2x2 lattice — norm, one-site
   observables, and single hopping/pairing insertions per spin on both
   bond orientations (pins the intra-site JW factors of BOND_KINDS and
   the reuse of the d=2 extras at d=4);
2. stacked-chain anchors: trivial vertical (resp. horizontal) bonds ==
   independent uniform Hubbard chains evaluated by the dense
   spin-orbital transfer matrix (machine precision, interacting U != 0
   exercised inside the converged CTMRG environment);
3. physics: the D=2 gradient ground state at U=0 with same-spin
   pairing == exactly two decoupled spinless BdG copies
   (2 * bdg_energy_2d), gapped and exactly solvable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from contractn_tpu.models.fipeps import (
    H_RIGHT_EXTRA,
    V_BOT_EXTRA,
    V_TOP_EXTRA,
    fdouble,
    parity_mask_site,
)
from contractn_tpu.models.fipeps_spin import (
    BOND_KINDS,
    DOCC,
    N_DN,
    N_TOT,
    N_UP,
    PHYS_PAR,
    hubbard_fock_rowmajor,
    hubbard_ipeps_energy,
    hubbard_ipeps_ground_state,
    hubbard_u0_energy,
    random_spinful_fpeps,
)
from contractn_tpu.models.fswap import fock_state

TRIV = np.zeros(1, np.int64)
SP = np.array([[0.0, 0.0], [1.0, 0.0]])
SM = SP.T
I2 = np.eye(2)
Z2 = np.diag([1.0, -1.0])


def _legpar(ly, lx, r, c, ph_vec, pv_vec):
    pu = pv_vec[(r - 1, c)] if r > 0 else TRIV
    pl = ph_vec[(r, c - 1)] if c > 0 else TRIV
    pd = pv_vec[(r, c)] if r < ly - 1 else TRIV
    pr = ph_vec[(r, c)] if c < lx - 1 else TRIV
    return (pu, pl, pd, pr)


def _dense_net(es):
    """Exact contraction of a small grid of (u2, l2, d2, r2) tensors
    (same row-absorption as test_fipeps.py)."""
    ly, lx = len(es), len(es[0])
    bnd = None
    for r in range(ly):
        acc = None
        ups = []
        for c in range(lx):
            t = np.asarray(es[r][c])
            if acc is None:
                acc = t[:, 0]
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


def _orbital_ops(ly, lx):
    """Annihilation matrices per spin-orbital, row-major JW basis."""
    no = 2 * ly * lx

    def op_at(mats):
        m = np.eye(1)
        for k in range(no):
            m = np.kron(m, mats.get(k, I2))
        return m

    return [op_at({**{j: Z2 for j in range(k)}, k: SM})
            for k in range(no)]


def test_spinful_double_layer_matches_fock():
    """Norm, one-site observables, and per-spin bond insertions through
    the fermionized double layer == the spinful Fock oracle (2x2)."""
    ly = lx = 2
    tn, ph, pv = random_spinful_fpeps(ly, lx, seed=7)
    lp = [[_legpar(ly, lx, r, c, ph, pv) for c in range(lx)]
          for r in range(ly)]
    es = [[fdouble(jnp.asarray(tn[r][c]), lp[r][c]) for c in range(lx)]
          for r in range(ly)]
    den = _dense_net(es)

    psi = fock_state(tn, ph, pv, d=4)
    want_norm = float(psi @ psi)
    assert abs(den - want_norm) < 1e-10 * max(1.0, abs(want_norm))

    cs = _orbital_ops(ly, lx)

    def fock_exp(op):
        return float(psi @ (op @ psi)) / want_norm

    # one-site observables at site (1, 0) = row-major index 2
    for mat, orb in ((N_UP, 4), (N_DN, 5)):
        mod = [[fdouble(jnp.asarray(tn[r][c]), lp[r][c], op=mat)
                if (r, c) == (1, 0) else es[r][c]
                for c in range(lx)] for r in range(ly)]
        got = _dense_net(mod) / den
        want = fock_exp(cs[orb].T @ cs[orb])
        assert abs(got - want) < 1e-10

    mod = [[fdouble(jnp.asarray(tn[r][c]), lp[r][c], op=DOCC)
            if (r, c) == (1, 0) else es[r][c]
            for c in range(lx)] for r in range(ly)]
    got = _dense_net(mod) / den
    want = fock_exp((cs[4].T @ cs[4]) @ (cs[5].T @ cs[5]))
    assert abs(got - want) < 1e-10

    # single bond insertions: (site pair, orientation, spin, pairing?)
    cases = [
        (((1, 0), (1, 1)), "h", 0, False),
        (((1, 0), (1, 1)), "h", 1, False),
        (((0, 1), (1, 1)), "v", 0, False),
        (((0, 1), (1, 1)), "v", 1, True),
        (((0, 0), (1, 0)), "v", 1, False),
        (((0, 0), (0, 1)), "h", 0, True),
    ]
    for (a, b), kind, s, pair in cases:
        if s == 0:
            o1 = np.kron(SP, Z2)
            o2 = np.kron(SP if pair else SM, I2)
        else:
            o1 = np.kron(I2, SP)
            o2 = np.kron(Z2, SP if pair else SM)
        xa = () if kind == "h" else V_TOP_EXTRA
        xb = H_RIGHT_EXTRA if kind == "h" else V_BOT_EXTRA
        za = fdouble(jnp.asarray(tn[a[0]][a[1]]), lp[a[0]][a[1]],
                     op=o1, extra=xa)
        zb = fdouble(jnp.asarray(tn[b[0]][b[1]]), lp[b[0]][b[1]],
                     op=o2, extra=xb)
        mod = [[za if (r, c) == a else zb if (r, c) == b else es[r][c]
                for c in range(lx)] for r in range(ly)]
        got = _dense_net(mod) / den
        oa = 2 * (a[0] * lx + a[1]) + s
        ob = 2 * (b[0] * lx + b[1]) + s
        fk = cs[oa].T @ (cs[ob].T if pair else cs[ob])
        want = fock_exp(fk)
        assert abs(got - want) < 1e-10, (a, b, kind, s, pair)


def _chain_reference(m, bp, t, u, mu, delta):
    """Per-site Hubbard-chain energy of the sign-dressed d=4 uMPS
    (dense spin-orbital transfer fixed points; independent code)."""
    bp = np.asarray(bp)
    mabs = m * ((-1.0) ** (bp[None, :, None] * bp[None, None, :]))
    dd = m.shape[1]

    def tmat(op):
        return np.einsum("nlr,nm,mLR->lLrR", mabs, op,
                         mabs).reshape(dd * dd, dd * dd)

    tt = tmat(np.eye(4))
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

    coeff = {"t": -t, "delta": delta}
    e = u * one(DOCC) - mu * one(N_TOT)
    for name, o1, o2 in BOND_KINDS:
        e += coeff[name] * two(o1, o2)
    return e, one(N_UP), one(N_DN), one(DOCC)


@pytest.mark.parametrize("orient", ["h", "v"])
def test_stacked_hubbard_chain_anchor(orient):
    """Spinful fipeps on decoupled uniform chains == the independent
    spin-orbital transfer-matrix Hubbard value, machine precision —
    interacting (U != 0), all four observables, both orientations."""
    rng = np.random.default_rng(11)
    bp = np.array([0, 1])
    m = 0.3 * rng.standard_normal((4, 2, 2))
    for n in range(4):
        for l_ in range(2):
            for r in range(2):
                if (PHYS_PAR[n] + bp[l_] + bp[r]) % 2:
                    m[n, l_, r] = 0.0
    m[0, 0, 0] += 1.0
    m[1, 0, 1] += 0.6  # dn occupation
    m[2, 0, 1] += 0.5  # up occupation
    m[3, 0, 0] += 0.4  # double occupation
    t, uu, mu, delta = 1.0, 3.0, 0.4, 0.5
    want_e, want_nu, want_nd, want_do = _chain_reference(
        m, bp, t, uu, mu, delta)

    if orient == "h":
        a = m[:, None, :, None, :]
        pars = (TRIV, bp, TRIV, bp)
    else:
        a = m[:, :, None, :, None]
        pars = (bp, TRIV, bp, TRIV)
    got_e, obs = hubbard_ipeps_energy(jnp.asarray(a), pars, chi=8,
                                      t=t, u=uu, mu=mu, delta=delta,
                                      iters=40)
    assert abs(got_e - want_e) < 1e-9
    assert abs(obs["n_up"] - want_nu) < 1e-9
    assert abs(obs["n_dn"] - want_nd) < 1e-9
    assert abs(obs["docc"] - want_do) < 1e-9


def _chain_tensor(rng, bp, pushes):
    m = 0.3 * rng.standard_normal((4, len(bp), len(bp)))
    for n in range(4):
        for l_ in range(len(bp)):
            for r in range(len(bp)):
                if (PHYS_PAR[n] + bp[l_] + bp[r]) % 2:
                    m[n, l_, r] = 0.0
    for idx, v in pushes:
        m[idx] += v
    return m


def _dimer_chain_reference(ma, mb, bp, t, u, mu, delta):
    """Per-site energy of the two-site-cell (A, B alternating) Hubbard
    chain from dense spin-orbital transfer matrices (independent)."""
    bp = np.asarray(bp)
    dress = (-1.0) ** (bp[None, :, None] * bp[None, None, :])
    dd = len(bp)

    def tmat(m, op):
        mm = m * dress
        return np.einsum("nlr,nm,mLR->lLrR", mm, op,
                         mm).reshape(dd * dd, dd * dd)

    i4 = np.eye(4)
    ta, tb = tmat(ma, i4), tmat(mb, i4)
    tt = ta @ tb
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam, r = w[i].real, vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    l_ = vl[:, np.argmax(np.abs(wl))].real
    nrm = l_ @ r

    def cellval(mats, ncell):
        acc = np.eye(dd * dd)
        for m in mats:
            acc = acc @ m
        return (l_ @ acc @ r) / (lam ** ncell * nrm)

    coeff = {"t": -t, "delta": delta}
    os = u * DOCC - mu * N_TOT
    e = cellval([tmat(ma, os), tb], 1) + cellval([ta, tmat(mb, os)], 1)
    for name, o1, o2 in BOND_KINDS:
        # A -> B bond inside the cell, B -> A bond across cells
        e += coeff[name] * cellval([tmat(ma, o1), tmat(mb, o2)], 1)
        e += coeff[name] * cellval(
            [ta, tmat(mb, o1), tmat(ma, o2), tb], 2)
    return e / 2.0


@pytest.mark.parametrize("dimerized", [False, True])
def test_cell_measure_stacked_chains(dimerized):
    """The one-patch-per-bond CELL measurement (open legs + summed
    op4, stripes ((A, A), (B, B))) on decoupled chains == the dense
    two-site-cell transfer-matrix Hubbard value, machine precision.
    ``dimerized=False`` pins cell-vs-uniform consistency (A == B)."""
    from contractn_tpu.models.fipeps_spin import (
        hubbard_cell_energy,
    )

    rng = np.random.default_rng(23)
    bp = np.array([0, 1])
    ma = _chain_tensor(rng, bp, [((0, 0, 0), 1.0), ((1, 0, 1), 0.6),
                                 ((2, 0, 1), 0.5), ((3, 0, 0), 0.4)])
    if dimerized:
        mb = _chain_tensor(rng, bp, [((0, 0, 0), 1.0),
                                     ((2, 0, 1), 0.7),
                                     ((3, 0, 0), 0.3)])
    else:
        mb = ma
    t, uu, mu, delta = 1.0, 3.0, 0.4, 0.5
    want = _dimer_chain_reference(ma, mb, bp, t, uu, mu, delta)

    a = jnp.asarray(ma[:, None, :, None, :])
    b = jnp.asarray(mb[:, None, :, None, :])
    pars = (TRIV, bp, TRIV, bp)
    sites = ((a, a), (b, b))  # stripes: alternating along x
    got, obs = hubbard_cell_energy(sites, pars, chi=8, t=t, u=uu,
                                   mu=mu, delta=delta, iters=40)
    assert abs(got - want) < 1e-9
    # observables sit on the right sublattice positions
    if dimerized:
        assert abs(obs["n_up"][0][0] - obs["n_up"][0][1]) < 1e-9
        assert abs(obs["n_up"][0][0] - obs["n_up"][1][0]) > 1e-4


def test_hubbard_correlator_stacked_chains():
    """Spin-resolved long-range <c^d_{0s} c_{rs}> on stacked Hubbard
    chains == the dense spin-orbital transfer value with explicit
    full-site parity insertions (both spins, r = 1..3)."""
    orient = "h"
    from contractn_tpu.models.fipeps import fipeps_env
    from contractn_tpu.models.fipeps_spin import hubbard_correlator

    rng = np.random.default_rng(11)
    bp = np.array([0, 1])
    m = _chain_tensor(rng, bp, [((0, 0, 0), 1.0), ((1, 0, 1), 0.6),
                                ((2, 0, 1), 0.5), ((3, 0, 0), 0.4)])
    par4 = np.kron(Z2, Z2)
    mabs = m * ((-1.0) ** (bp[None, :, None] * bp[None, None, :]))

    def tmat(op):
        return np.einsum("nlr,nm,mLR->lLrR", mabs, op,
                         mabs).reshape(4, 4)

    tt = tmat(np.eye(4))
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam, rv = w[i].real, vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    lv = vl[:, np.argmax(np.abs(wl))].real
    nrm = lv @ rv

    def chain_corr(o1, o2, r):
        acc = tmat(o1)
        for _ in range(r - 1):
            acc = acc @ tmat(par4)
        acc = acc @ tmat(o2)
        return (lv @ acc @ rv) / (lam ** (r + 1) * nrm)

    a = jnp.asarray(m[:, None, :, None, :])
    pars = (TRIV, bp, TRIV, bp)
    env = fipeps_env(a, pars, chi=8, iters=40)
    rs = [1, 2, 3]
    for spin in (0, 1):
        if spin == 0:
            o1, o2 = np.kron(SP, Z2), np.kron(SM, I2)
        else:
            o1, o2 = np.kron(I2, SP), np.kron(Z2, SM)
        got = hubbard_correlator(a, pars, env, rs, spin=spin,
                                 kind="hop")
        for k, r in enumerate(rs):
            assert abs(got[k] - chain_corr(o1, o2, r)) < 1e-9, (spin, r)


def test_cell_correlator_dimerized_chains():
    """Parity-even row correlators (SZ, N_TOT) on the dimerized stripe
    cell == the dense two-site-cell transfer value with the impurity
    landing on the right sublattice position, r = 1..4."""
    from contractn_tpu.models.fipeps import fdouble  # noqa: F401
    from contractn_tpu.models.fipeps_spin import (
        SZ,
        hubbard_cell_correlator,
        hubbard_cell_env,
    )

    rng = np.random.default_rng(29)
    bp = np.array([0, 1])
    ma = _chain_tensor(rng, bp, [((0, 0, 0), 1.0), ((1, 0, 1), 0.6),
                                 ((2, 0, 1), 0.5), ((3, 0, 0), 0.4)])
    mb = _chain_tensor(rng, bp, [((0, 0, 0), 1.0), ((2, 0, 1), 0.7),
                                 ((3, 0, 0), 0.3)])
    dress = (-1.0) ** (bp[None, :, None] * bp[None, None, :])

    def tmat(m, op):
        mm = m * dress
        return np.einsum("nlr,nm,mLR->lLrR", mm, op, mm).reshape(4, 4)

    ta, tb = tmat(ma, np.eye(4)), tmat(mb, np.eye(4))
    tt = ta @ tb
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam, rv = w[i].real, vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    lv = vl[:, np.argmax(np.abs(wl))].real
    nrm = lv @ rv

    def chain_corr(op1, op2, r):
        ms = [ma, mb]
        seq = []
        for pos in range(r + 1):
            op = op1 if pos == 0 else (op2 if pos == r else np.eye(4))
            seq.append(tmat(ms[pos % 2], op))
        if len(seq) % 2:
            seq.append(tb if r % 2 == 0 else ta)
        acc = np.eye(4)
        for mt in seq:
            acc = acc @ mt
        ncell = len(seq) // 2
        return (lv @ acc @ rv) / (lam ** ncell * nrm)

    a = jnp.asarray(ma[:, None, :, None, :])
    b = jnp.asarray(mb[:, None, :, None, :])
    pars = (TRIV, bp, TRIV, bp)
    sites = ((a, a), (b, b))
    env = hubbard_cell_env(sites, pars, chi=8, iters=40)
    rs = [1, 2, 3, 4]
    from contractn_tpu.models.fipeps_spin import N_TOT as NT

    for mat in (SZ, NT):
        got = hubbard_cell_correlator(sites, pars, env, mat, mat, rs,
                                      connected=False)
        for k, r in enumerate(rs):
            assert abs(got[k] - chain_corr(mat, mat, r)) < 1e-9, r


def test_hubbard_cell_afm_ground_state():
    """Checkerboard gradient flow at half filling (U=8, mu=U/2): from
    the Neel-dimer init a SHORT run already shows the hallmark
    physics — staggered AFM order, half filling, suppressed double
    occupancy, and a genuine superexchange energy gain (the rigid Neel
    configuration has E + U/2 = 0; the converged 500-step D=2 run
    records E + U/2 = -0.347, about 60% of the Heisenberg-limit
    estimate 2J(e_b - 1/4) ~ -0.58 — see
    ``examples/hubbard_ipeps.py``)."""
    from contractn_tpu.models.fipeps_spin import (
        hubbard_cell_ground_state,
    )

    a, b, e, obs, es = hubbard_cell_ground_state(
        bond_parities=(0, 1), chi=12, t=1.0, u=8.0, steps=35,
        lr=1e-2, seed=0)
    corr = e + 4.0  # E + U/2
    assert -0.7 < corr < -0.18
    # staggered AFM pattern: A = (0,0)/(1,1) up-rich, B down-rich
    assert obs["n_up"][0][0] > 0.8 and obs["n_up"][1][1] > 0.8
    assert obs["n_up"][1][0] < 0.2 and obs["n_up"][0][1] < 0.2
    assert obs["n_dn"][0][0] < 0.2 and obs["n_dn"][1][0] > 0.8
    # half filling and suppressed double occupancy
    fill = obs["n_up"][0][0] + obs["n_dn"][0][0]
    assert abs(fill - 1.0) < 0.05
    assert obs["docc"][0][0] < 0.08
    assert es[-1] < es[5]


def test_hubbard_ipeps_ground_state_u0_d2():
    """U=0 gradient ground state at bond parities (0, 1): the graded
    D=2 bond can hold exactly ONE condensed species, so the optimizer
    spontaneously selects one spin and reproduces the SINGLE spinless
    BdG copy to 1% — a sharp representability statement (two copies
    need the product bond (0, 1, 1, 0); that run reaches 0.14% of
    ``hubbard_u0_energy`` and Wick factorization of the double
    occupancy — recorded in ``examples/hubbard_ipeps.py``, too heavy
    for the suite)."""
    from contractn_tpu.models.fipeps import bdg_energy_2d

    t, mu, delta = 1.0, -4.4, 1.0
    one_copy = bdg_energy_2d(t=t, mu=mu, delta=delta)
    a, e, obs, es = hubbard_ipeps_ground_state(
        bond_parities=(0, 1), chi=12, t=t, u=0.0, mu=mu, delta=delta,
        steps=220, lr=2e-2, seed=0)
    assert e > 2.0 * one_copy - 1e-8  # variational vs the TRUE ground
    assert abs(e - one_copy) < 1e-2 * abs(one_copy)
    # one species condensed, the other nearly empty (a small minority
    # admixture rides the shared odd bond sector): clear spontaneous
    # symmetry breaking between the spins
    lo, hi = sorted([obs["n_up"], obs["n_dn"]])
    assert hi > 0.03
    assert lo < 0.02
    assert hi > 3.0 * lo
    assert obs["docc"] < 5e-3
    # the optimized tensor stays exactly on the graded manifold
    bp = np.array([0, 1])
    mask = np.asarray(parity_mask_site((bp,) * 4, d=4,
                                       phys_par=PHYS_PAR))
    assert float(np.max(np.abs(np.asarray(a) * (1 - mask)))) == 0.0
    assert es[-1] < es[20]
