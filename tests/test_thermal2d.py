"""Thermal 2D iPEPS: exact commuting-case and high-T cumulant anchors.

* Pure-ZZ Hamiltonian: every bond gate has operator-Schmidt rank 2, so
  the purification PEPS is EXACT at D = 2 at any step size, and the
  measured quantities must reproduce the classical 2D Ising solution:
  ``<Z Z>`` = Onsager nearest-neighbor correlation (machine precision
  modulo CTMRG chi), ``|<Z>|`` = the Onsager-Yang spontaneous
  magnetization in the ordered phase (the environment fixed point
  selects an extremal Gibbs state, exactly as classical CTMRG does),
  ``<Z> = 0`` in the disordered phase, and ``<X> = 0`` identically
  (rho is Z-diagonal).
* TFIM at small beta: ``E(beta)/N = -beta (2 + h^2) + O(beta^3)`` (the
  third cumulant vanishes on the triangle-free square lattice) and
  ``<X> = beta h + O(beta^3)`` — pins the lifted gates/observables and
  the fused-site measurement path quantitatively.
"""

import numpy as np

from contractn_tpu.models import tfim_bond_term_2d
from contractn_tpu.models.thermal2d import (
    thermal2d_energy,
    thermal2d_site_expectation,
    thermal_ipeps_cell,
)
from tests.test_hotrg import exact_nn_correlation

Z = np.diag([1.0, -1.0])
X = np.array([[0.0, 1.0], [1.0, 0.0]])


def test_commuting_zz_matches_onsager():
    beta = 0.6  # ordered phase (K_c = 0.4407)
    h2 = -np.kron(Z, Z)
    a, b = thermal_ipeps_cell(h2, beta, bond_dim=2, n_steps=6)
    e = float(thermal2d_energy(a, b, h2, chi=16, iters=80).real)
    assert np.isclose(e, -2.0 * exact_nn_correlation(beta),
                      atol=1e-10), e

    m_exact = (1.0 - np.sinh(2.0 * beta) ** -4) ** 0.125
    mz = thermal2d_site_expectation(a, b, Z, chi=16, iters=80)
    for row in mz:
        for v in row:
            assert np.isclose(abs(float(np.real(v))), m_exact,
                              atol=1e-8), (float(np.real(v)), m_exact)
    mx = thermal2d_site_expectation(a, b, X, chi=16, iters=80)
    assert all(abs(float(np.real(v))) < 1e-12 for r in mx for v in r)


def test_commuting_zz_disordered_phase():
    beta = 0.3  # below K_c: no spontaneous magnetization
    h2 = -np.kron(Z, Z)
    a, b = thermal_ipeps_cell(h2, beta, bond_dim=2, n_steps=4)
    e = float(thermal2d_energy(a, b, h2, chi=16, iters=80).real)
    assert np.isclose(e, -2.0 * exact_nn_correlation(beta),
                      atol=1e-10), e
    mz = thermal2d_site_expectation(a, b, Z, chi=16, iters=80)
    assert all(abs(float(np.real(v))) < 1e-8 for r in mz for v in r)


def test_tfim_high_temperature_cumulants():
    h = 2.5
    h2 = tfim_bond_term_2d(1.0, h)
    beta = 0.04
    a, b = thermal_ipeps_cell(h2, beta, bond_dim=3, n_steps=16)
    e = float(thermal2d_energy(a, b, h2, chi=12, iters=60).real)
    pred = -beta * (2.0 + h * h)
    assert abs(e - pred) < 0.02 * abs(pred), (e, pred)
    ex = thermal2d_site_expectation(a, b, X, chi=12, iters=60)
    got = float(np.real(ex[0][0]))
    assert abs(got - beta * h) < 0.02 * beta * h, (got, beta * h)
