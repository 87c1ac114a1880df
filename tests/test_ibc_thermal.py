"""Finite-temperature dynamics in the thermodynamic limit: balanced
purification evolution through infinite-boundary-condition windows,
against EXACT infinite free-fermion and dense finite-T oracles."""

import numpy as np

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.ibc import (
    ibc_thermal_correlator,
    ibc_window,
    window_evolve,
    window_expectations,
)
from contractn_tpu.models.mpo import mpo_from_bond_term, umpo_scale, umpo_sum
from contractn_tpu.models.thermal import (
    _fold_op,
    balanced_umpo,
    thermal_wii,
    thermal_wii_correlate,
    thermal_wii_expectation,
)
from contractn_tpu.models.vumps import mixed_gauge

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SY = np.array([[0.0, -1j], [1j, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def test_umpo_sum_scale_dense_parity():
    """The infinite bulk-core algebra is exact: finite wraps of
    umpo_sum / umpo_scale match the dense sums term for term
    (including an interior-diagonal exponential channel, the case a
    naive block-diagonal sum would break)."""
    from contractn_tpu.models.autompo import InfiniteOpSum, umpo_finite

    hc1 = np.asarray(tfim_mpo(2, h=1.3).cores)[0]
    s = InfiniteOpSum()
    s += (-0.4, "X", 0)
    s.add_exp(0.6, "Z", 0.5, "Z")
    hc2 = np.asarray(s.to_umpo())
    n = 6
    d1 = _mpo_dense(umpo_finite(hc1, n), n)
    d2 = _mpo_dense(umpo_finite(hc2, n), n)
    ds = _mpo_dense(umpo_finite(umpo_sum(hc1, hc2), n), n)
    assert np.max(np.abs(ds - (d1 + d2))) < 1e-12
    dsc = _mpo_dense(umpo_finite(umpo_scale(hc2, -2.5), n), n)
    assert np.max(np.abs(dsc + 2.5 * d2)) < 1e-12


def test_thermal_window_is_stationary():
    """The folded thermal purification is a zero mode of the balanced
    generator L = H(x)I - I(x)H^T: the IBC environment energy vanishes,
    the window reproduces the bulk thermal expectations exactly, and
    balanced real-time evolution leaves them fixed (to the thermal
    state's own truncation level) — this pins the ancilla lift, the
    corner-sharing sum, and the environment wiring at once."""
    beta, h = 0.5, 2.0
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    core = thermal_wii(hc, beta, bond_dim=16, dbeta=0.02)
    win = ibc_window(
        dict(zip(("al", "ar", "c"), mixed_gauge(core))),
        balanced_umpo(hc), 8)
    assert abs(win["e_bulk"]) < 1e-10
    xf = np.asarray(_fold_op(_SX, 2))
    x0 = np.real(np.asarray(window_expectations(win, xf)))
    xb = float(np.real(thermal_wii_expectation(core, _SX)))
    assert np.max(np.abs(x0 - xb)) < 1e-12
    win2 = window_evolve(win, 0.05, 4, max_bond=16)
    x1 = np.real(np.asarray(window_expectations(win2, xf)))
    assert np.max(np.abs(x1 - x0)) < 1e-4


def test_ibc_thermal_correlator_xx_exact_infinite_oracle():
    """<Z_j(t) Z_0>_beta on the INFINITE XX chain: Z = 2n - 1 under
    Jordan-Wigner is string-free, so Wick gives the exact
    thermodynamic-limit answer 4 A(j,t) B(j,t) with
    A = int f(eps_k) e^{i eps_k t - i k j} dk / 2pi,
    B = int (1-f) e^{-i eps_k t + i k j} dk / 2pi, eps_k = 2 cos k —
    an oracle with NO finite-size boundary, the regime this function
    exists for.  Also pins the t=0 rows to the static thermal
    correlator of the same purification."""
    h2 = 0.5 * (np.kron(_SX, _SX) + np.real(np.kron(_SY, _SY)))
    hc = np.asarray(mpo_from_bond_term(h2, 2).cores)[0]
    beta = 1.0
    core = thermal_wii(hc, beta, bond_dim=24, dbeta=0.02)
    nw, qj, dt, ns = 10, 4, 0.05, 8
    C = ibc_thermal_correlator(core, hc, _SZ, _SZ, nw, qj, dt, ns,
                               max_bond=32)
    assert C.shape == (nw, ns + 1)

    stat = np.asarray(thermal_wii_correlate(core, _SZ, _SZ, [1, 2, 3]))
    assert abs(C[qj, 0] - 1.0) < 1e-10
    for r in (1, 2, 3):
        assert abs(C[qj + r, 0] - stat[r - 1]) < 1e-10
        assert abs(C[qj - r, 0] - stat[r - 1]) < 1e-10

    ks = np.linspace(-np.pi, np.pi, 4001)
    eps = 2.0 * np.cos(ks)
    f = 1.0 / (1.0 + np.exp(beta * eps))
    for k in range(ns + 1):
        t = k * dt
        for j in range(nw):
            r = j - qj
            a = np.trapezoid(
                f * np.exp(1j * eps * t - 1j * ks * r), ks) / (2 * np.pi)
            b = np.trapezoid(
                (1 - f) * np.exp(-1j * eps * t + 1j * ks * r),
                ks) / (2 * np.pi)
            assert abs(C[j, k] - 4.0 * a * b) < 2e-4, (j, k)


def test_ibc_thermal_correlator_tfim_dense():
    """TFIM finite-T dynamic correlator vs a dense n=10 thermal oracle
    (exact diagonalization; the bound is set by the open oracle
    chain's boundary contamination, not the window)."""
    beta, h = 0.5, 2.0
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    core = thermal_wii(hc, beta, bond_dim=16, dbeta=0.02)
    nw, qj, dt, ns = 10, 4, 0.05, 6
    C = ibc_thermal_correlator(core, hc, _SZ, _SZ, nw, qj, dt, ns,
                               max_bond=32)

    n, c = 10, 4  # dj = j + c - qj covers exactly 0..n-1
    eye = np.eye(2)

    def op(mat, i):
        out = np.eye(1)
        for j in range(n):
            out = np.kron(out, mat if j == i else eye)
        return out

    ham = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham -= op(_SZ, i) @ op(_SZ, i + 1)
    for i in range(n):
        ham -= h * op(_SX, i)
    evals, vecs = np.linalg.eigh(ham)
    p = np.exp(-beta * evals)
    p /= p.sum()
    zt = [vecs.T @ op(_SZ, j) @ vecs for j in range(n)]
    for k in range(ns + 1):
        ph = np.exp(1j * evals * k * dt)
        for j in range(nw):
            dj = j + c - qj
            cd = np.einsum("m,m,mn,n,nm->", p, ph, zt[dj],
                           np.conj(ph), zt[c])
            assert abs(C[j, k] - cd) < 1e-3, (j, k, C[j, k], cd)


def test_window_bond_operators_are_consistent():
    """window_apply_bond(ZZ) == two window_apply_local(Z)s, and
    window_overlaps_bond values == explicit bond-apply overlaps — the
    exactness contract of the two-site machinery (machine precision,
    no truncation at default max_bond=None)."""
    from contractn_tpu.models.ibc import (
        window_apply_bond,
        window_apply_local,
        window_overlaps_bond,
        window_overlaps_local,
    )
    from contractn_tpu.models.vumps import vumps

    hm = tfim_mpo(2, h=1.5)
    g = vumps(hm, 8, iters=80)
    win = ibc_window(g, np.asarray(hm.cores)[0], 8)
    zz = np.kron(_SZ, _SZ)
    k1 = window_apply_bond(win, zz, 3)
    k2 = window_apply_local(window_apply_local(win, _SZ, 3), _SZ, 4)
    ov11 = complex(window_overlaps_local(k1, k1))
    ov12 = complex(window_overlaps_local(k1, k2))
    assert abs(ov12 / abs(ov11) - 1.0) < 1e-12
    vb = np.asarray(window_overlaps_bond(win, win, zz))
    for i in (2, 4):
        ki = window_apply_bond(win, zz, i)
        assert abs(vb[i] - complex(window_overlaps_local(win, ki))) \
            < 1e-12


def test_thermal_current_current_xx_exact_oracle():
    """Finite-temperature spin transport in the thermodynamic limit:
    <j_x(t) j_0>_beta on the infinite XX chain (j = i(S+S- - S-S+) is
    a string-free fermion bilinear) against the exact Wick oracle
    C(x,t) = 2 Gp Gm - Gp(x-1)Gm(x+1) - Gp(x+1)Gm(x-1) with
    Gp = int f e^{i eps t - i k x}, Gm = int (1-f) e^{-i eps t + i k x}
    — pins the bond-operator quench, the bond-operator measurement,
    and the purification lift at once (measured 2.3e-5)."""
    h2 = 0.5 * (np.kron(_SX, _SX) + np.real(np.kron(_SY, _SY)))
    hc = np.asarray(mpo_from_bond_term(h2, 2).cores)[0]
    beta = 1.0
    core = thermal_wii(hc, beta, bond_dim=24, dbeta=0.02)
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    j2 = 1j * (np.kron(sp, sp.T) - np.kron(sp.T, sp))
    nw, qj, dt, ns = 10, 4, 0.05, 6
    C = ibc_thermal_correlator(core, hc, j2, j2, nw, qj, dt, ns,
                               max_bond=32, bond_b=True, bond_a=True)
    assert C.shape == (nw - 1, ns + 1)

    ks = np.linspace(-np.pi, np.pi, 4001)
    eps = 2.0 * np.cos(ks)
    f = 1.0 / (1.0 + np.exp(beta * eps))

    def gp(x, t):
        return np.trapezoid(
            f * np.exp(1j * eps * t - 1j * ks * x), ks) / (2 * np.pi)

    def gm(x, t):
        return np.trapezoid(
            (1 - f) * np.exp(-1j * eps * t + 1j * ks * x),
            ks) / (2 * np.pi)

    for k in range(ns + 1):
        t = k * dt
        for j in range(nw - 1):
            x = j - qj
            cjj = (2 * gp(x, t) * gm(x, t)
                   - gp(x - 1, t) * gm(x + 1, t)
                   - gp(x + 1, t) * gm(x - 1, t))
            assert abs(C[j, k] - cjj) < 2e-4, (j, k)
