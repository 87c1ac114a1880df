"""Infinite-chain thermal states vs exact free-fermion integrals."""

import numpy as np

from contractn_tpu.models.itebd import heisenberg_h2, tfim_h2
from contractn_tpu.models.thermal import (
    tfim_exact_thermal,
    thermal_energy_density,
    thermal_itebd,
    thermal_log_z_ti,
    thermal_site_expectation,
)

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def test_tfim_thermal_matches_exact_integrals():
    beta = 1.0
    h2 = tfim_h2()
    lz, e = tfim_exact_thermal(beta)
    st = thermal_itebd(h2, beta, bond_dim=24)
    # Fixed-point-environment energy is second-order accurate.
    assert abs(thermal_energy_density(st, h2) - e) < 1e-6
    # Norm-accumulated ln Z carries the documented O(dbeta) bias.
    assert abs(st["log_z"] - lz) < 1e-4

    # One-site observables against Hellmann-Feynman derivatives of the
    # exact ln z: <X> = (1/beta) d(ln z)/dh, <ZZ>_nn = (1/beta) d/dJ.
    eps = 1e-4
    x_exact = (tfim_exact_thermal(beta, h=1 + eps)[0]
               - tfim_exact_thermal(beta, h=1 - eps)[0]) / (2 * eps * beta)
    sx = thermal_site_expectation(st, _SX)
    assert abs(sx - x_exact) < 1e-5, (sx, x_exact)

    zz_exact = (tfim_exact_thermal(beta, j=1 + eps)[0]
                - tfim_exact_thermal(beta, j=1 - eps)[0]) / (2 * eps * beta)
    # <Z Z> on the in-cell bond == the J-coupling response.
    from contractn_tpu.models.thermal import _fold_op, thermal_cell_core
    from contractn_tpu.models.umps import expect_local
    zf = np.asarray(_fold_op(_SZ, 2))
    zz = float(expect_local(thermal_cell_core(st), np.kron(zf, zf),
                            iters=400))
    assert abs(zz - zz_exact) < 1e-5, (zz, zz_exact)


def test_tfim_log_z_thermodynamic_integration():
    beta = 1.0
    h2 = tfim_h2()
    lz, _ = tfim_exact_thermal(beta)
    got, state = thermal_log_z_ti(h2, beta, bond_dim=24, intervals=16)
    assert abs(got - lz) < 5e-6, (got, lz)
    assert state["beta"] == beta


def test_xx_chain_thermal_matches_fermi_integrals():
    # XX chain h2 = (XX + YY)/4: free fermions with eps_k = cos k.
    beta = 2.0
    h2 = heisenberg_h2(jx=1.0, jz=0.0)
    k = np.linspace(-np.pi, np.pi, 4001)
    eps = np.cos(k)
    lz = np.trapezoid(np.log(1 + np.exp(-beta * eps)), k) / (2 * np.pi)
    e = np.trapezoid(eps / (1 + np.exp(beta * eps)), k) / (2 * np.pi)
    st = thermal_itebd(h2, beta, bond_dim=24)
    assert abs(thermal_energy_density(st, h2) - e) < 1e-6
    assert abs(st["log_z"] - lz) < 5e-5


def test_commuting_hamiltonians_are_trotter_exact():
    # [h_AB, h_BA] = 0 makes every Trotter order exact: classical Ising
    # chain ln z = ln(2 cosh beta), e = -tanh(beta).
    beta = 1.0
    h2 = tfim_h2(j=1.0, h=0.0)
    st = thermal_itebd(h2, beta, bond_dim=8, dbeta=0.02)
    assert abs(st["log_z"] - np.log(2 * np.cosh(beta))) < 1e-12
    assert abs(thermal_energy_density(st, h2) + np.tanh(beta)) < 1e-10


# --------------------------------------------------------------------- #
# Long-range Hamiltonians: purification by imaginary-time W^II
# --------------------------------------------------------------------- #


def _site_op(op, i, n):
    m = np.eye(1)
    for k in range(n):
        m = np.kron(m, op if k == i else np.eye(2))
    return m


def test_thermal_wii_tfim_matches_exact_integrals():
    """The W^II purification route reproduces the exact TFIM thermal
    energy and <X> — same oracle as the gate route, reached from the
    bulk MPO core instead of a two-site gate."""
    from contractn_tpu.models.dmrg import tfim_mpo
    from contractn_tpu.models.thermal import (
        thermal_wii, thermal_wii_correlate, thermal_wii_expectation)

    beta, h = 1.0, 1.0
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    core = thermal_wii(hc, beta, bond_dim=16, dbeta=0.02)
    _, e_exact = tfim_exact_thermal(beta, h=h)
    zz = thermal_wii_correlate(core, _SZ, _SZ, [1])[0]
    ex = thermal_wii_expectation(core, _SX)
    assert abs(np.imag(ex)) < 1e-10
    e = -np.real(zz) - h * np.real(ex)
    assert abs(e - e_exact) < 3e-4, (e, e_exact)

    eps = 1e-4
    x_exact = (tfim_exact_thermal(beta, h=1 + eps)[0]
               - tfim_exact_thermal(beta, h=1 - eps)[0]) / (2 * eps * beta)
    assert abs(np.real(ex) - x_exact) < 3e-4, (ex, x_exact)


def test_thermal_wii_long_range_matches_dense():
    """Exponentially decaying Ising couplings at finite T: bulk W^II
    thermal observables match the center of a dense open chain (thermal
    correlations are short at beta = 0.6, so the finite-size envelope
    is negligible) — the regime no gate evolver reaches."""
    from contractn_tpu.models.autompo import InfiniteOpSum
    from contractn_tpu.models.thermal import (
        thermal_wii, thermal_wii_correlate, thermal_wii_expectation)

    # lam small enough that the oracle's missing geometric tail
    # (lam^4/(1-lam) of the center site's coupling weight) is < 1e-4;
    # at lam = 0.5 that tail alone shifts <X> by 2.3e-2 (measured).
    lam, h, beta, n = 0.15, 1.0, 0.6, 10
    ops = InfiniteOpSum().add(-h, _SX, 0).add_exp(-1.0, _SZ, lam, _SZ)
    hc = np.asarray(ops.to_umpo())
    core = thermal_wii(hc, beta, bond_dim=20, dbeta=0.015)

    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n):
        hd -= h * _site_op(_SX, i, n)
        for j in range(i + 1, n):
            hd -= lam ** (j - i - 1) * (
                _site_op(_SZ, i, n) @ _site_op(_SZ, j, n))
    vals, vecs = np.linalg.eigh(hd)
    p = np.exp(-beta * (vals - vals.min()))
    p /= p.sum()

    def dense_ex(m):
        return float(np.einsum("ik,ij,jk,k->", vecs, m, vecs, p))

    # Pairs centered on the reflection axis (sites 4.5): the boundary
    # gradient is visible already one site off-center (measured 2.9e-3
    # on the (5, 8) pair vs 1.1e-4 on (3, 6)).
    x_d = dense_ex(_site_op(_SX, 4, n))
    zz1_d = dense_ex(_site_op(_SZ, 4, n) @ _site_op(_SZ, 5, n))
    zz3_d = dense_ex(_site_op(_SZ, 3, n) @ _site_op(_SZ, 6, n))
    x_i = np.real(thermal_wii_expectation(core, _SX))
    zz_i = np.real(np.asarray(
        thermal_wii_correlate(core, _SZ, _SZ, [1, 3])))
    assert abs(x_i - x_d) < 3e-4, (x_i, x_d)
    assert abs(zz_i[0] - zz1_d) < 3e-4, (zz_i[0], zz1_d)
    assert abs(zz_i[1] - zz3_d) < 5e-4, (zz_i[1], zz3_d)


def test_thermal_wii_infinite_temperature_limit():
    """beta -> 0: every traceless observable vanishes; the folded core
    stays (numerically) the maximally entangled product."""
    from contractn_tpu.models.dmrg import tfim_mpo
    from contractn_tpu.models.thermal import (
        thermal_wii, thermal_wii_expectation)

    hc = np.asarray(tfim_mpo(2, h=0.7).cores)[0]
    core = thermal_wii(hc, 1e-8, bond_dim=4, dbeta=1e-8)
    for op in (_SX, _SZ):
        assert abs(np.real(thermal_wii_expectation(core, op))) < 1e-7
