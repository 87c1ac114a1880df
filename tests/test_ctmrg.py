"""CTMRG vs Onsager's exact square-lattice Ising results."""

import numpy as np

from contractn_tpu.models.ctmrg import (
    free_energy_per_site,
    ising_boundary,
    ising_magnetization,
    ising_tensor,
)


def onsager_log_z(beta, n=3000):
    """Exact Onsager log-partition-function per site.

    ``ln z = ln 2 + (1/2 pi^2) int_0^pi int_0^pi
    ln[cosh^2(2b) - sinh(2b)(cos t1 + cos t2)] dt1 dt2``
    (checked at beta=0: ln z = ln 2, free spins)."""
    th = np.linspace(0.0, np.pi, n)
    t1, t2 = np.meshgrid(th, th)
    integrand = np.log(
        np.cosh(2 * beta) ** 2
        - np.sinh(2 * beta) * (np.cos(t1) + np.cos(t2))
    )
    integral = np.trapezoid(np.trapezoid(integrand, th, axis=1), th)
    return np.log(2.0) + integral / (2.0 * np.pi ** 2)


def test_free_energy_matches_onsager():
    for beta in (0.3, 0.5):
        got = free_energy_per_site(
            ising_tensor(beta), chi=24, iters=200,
            boundary=ising_boundary(beta),
        )
        assert np.isclose(got, onsager_log_z(beta), atol=2e-6), (beta, got)


def test_spontaneous_magnetization_matches_onsager_yang():
    for beta in (0.46, 0.5):
        m = ising_magnetization(beta, chi=24)
        exact = (1.0 - np.sinh(2.0 * beta) ** -4) ** 0.125
        assert np.isclose(m, exact, atol=1e-9), (beta, m, exact)


def test_disordered_phase_has_zero_magnetization():
    assert abs(ising_magnetization(0.2, chi=16)) < 1e-10


def test_near_critical_free_energy():
    """Close to beta_c = ln(1+sqrt(2))/2 ~ 0.4407 the environment needs
    more bond dimension; chi=32 gets the free energy to ~1e-6."""
    beta = 0.43
    got = free_energy_per_site(
        ising_tensor(beta), chi=32, iters=300,
        boundary=ising_boundary(beta),
    )
    assert np.isclose(got, onsager_log_z(beta), atol=1e-5), got
