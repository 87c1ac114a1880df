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
