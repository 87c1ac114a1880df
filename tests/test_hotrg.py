"""HOTRG coarse-graining vs Onsager exact results and CTMRG."""

import numpy as np

from contractn_tpu.models.ctmrg import (
    free_energy_per_site,
    ising_tensor,
    potts_tensor,
)
from contractn_tpu.models.hotrg import (
    hotrg_bond_expectation,
    hotrg_expectation,
    hotrg_log_z,
)
from tests.test_ctmrg import onsager_log_z


def _agm_ellipk(k):
    """Complete elliptic integral K(k) (modulus convention) via AGM."""
    a, b = 1.0, np.sqrt(1.0 - k * k)
    for _ in range(60):
        a, b = 0.5 * (a + b), np.sqrt(a * b)
    return np.pi / (2.0 * a)


def exact_nn_correlation(beta):
    """Onsager ``<s_i s_j>`` on a nearest-neighbor bond:
    ``-U/(2N)`` with ``U/N = -coth(2b)[1 + (2 tanh^2(2b) - 1)
    (2/pi) K(k1)]``, ``k1 = 2 sinh(2b)/cosh^2(2b)``."""
    t2 = np.tanh(2.0 * beta)
    k1 = 2.0 * np.sinh(2.0 * beta) / np.cosh(2.0 * beta) ** 2
    u = -(1.0 / t2) * (1.0 + (2.0 * t2 * t2 - 1.0)
                       * (2.0 / np.pi) * _agm_ellipk(k1))
    return -u / 2.0


def test_free_energy_matches_onsager():
    for beta in (0.3, 0.5):
        got = hotrg_log_z(ising_tensor(beta), chi=12, steps=30)
        assert np.isclose(got, onsager_log_z(beta), atol=5e-8), (beta, got)


def test_critical_free_energy():
    # Exactly AT criticality (the numerically-integrated oracle NaNs
    # there — the integrand touches log 0): closed form
    # ln z_c = ln(2)/2 + 2 G / pi with G Catalan's constant.
    beta_c = 0.5 * np.log(1.0 + np.sqrt(2.0))
    exact = 0.5 * np.log(2.0) + 2.0 * 0.9159655941772190 / np.pi
    got = hotrg_log_z(ising_tensor(beta_c), chi=16, steps=30)
    # Finite-chi truncation is worst at criticality; 6e-7 at chi=16.
    assert np.isclose(got, exact, atol=2e-6), (got, exact)


def test_bond_correlation_matches_onsager_energy():
    for beta, tol in ((0.3, 1e-5), (0.5, 1e-4)):
        a = ising_tensor(beta)
        sig = ising_tensor(beta, field_op=[1.0, -1.0])
        ss = hotrg_bond_expectation(a, sig, sig, chi=12, steps=30)
        assert np.isclose(ss, exact_nn_correlation(beta), atol=tol), (
            beta, ss, exact_nn_correlation(beta))


def test_symmetric_magnetization_vanishes():
    # The Z2-symmetric flow keeps the disordered mixture: <sigma> = 0
    # identically (HOTRG does not break symmetry spontaneously).
    a = ising_tensor(0.5)
    sig = ising_tensor(0.5, field_op=[1.0, -1.0])
    m = hotrg_expectation(a, sig, chi=12, steps=30)
    assert abs(m) < 1e-6


def test_field_biased_magnetization():
    # Explicit field bias exp(beta h s) folded into the site weight:
    # at beta=0.5, h=0.05 the lattice is deep in the ordered phase and
    # <sigma> must exceed the zero-field Onsager-Yang value.
    beta, h = 0.5, 0.05
    bias = np.exp(beta * h * np.array([1.0, -1.0]))
    a = ising_tensor(beta, field_op=bias)
    sig = ising_tensor(beta, field_op=bias * np.array([1.0, -1.0]))
    m = hotrg_expectation(a, sig, chi=12, steps=30)
    m_yang = (1.0 - np.sinh(2.0 * beta) ** -4.0) ** 0.125
    assert m_yang < m < 1.0, (m, m_yang)


def test_potts_free_energy_matches_ctmrg():
    # 3-state Potts, both phases: HOTRG's local truncation converges
    # toward the (environment-aware, already chi-converged) CTMRG value
    # from below in chi; 1e-5 at chi=20, 6e-8 at chi=26 (measured).
    for beta in (0.8, 1.2):
        a = potts_tensor(beta, q=3)
        got = hotrg_log_z(a, chi=20, steps=30)
        ref = free_energy_per_site(a, chi=20, iters=300)
        assert np.isclose(got, ref, atol=1e-5), (beta, got, ref)


def test_potts_self_dual_internal_energy():
    # Exact duality anchor at the continuous q=3 transition:
    # d ln z / d beta |_{beta_c} = 1 + 1/sqrt(q), beta_c = ln(1+sqrt q).
    q = 3
    beta_c = np.log(1.0 + np.sqrt(q))
    eps = 2e-4
    lp = hotrg_log_z(potts_tensor(beta_c + eps, q), chi=20, steps=30)
    lm = hotrg_log_z(potts_tensor(beta_c - eps, q), chi=20, steps=30)
    u = (lp - lm) / (2.0 * eps)
    assert abs(u - (1.0 + 1.0 / np.sqrt(q))) < 2e-3, u


def test_matches_ctmrg_on_generic_symmetric_tensor():
    # Independent-route cross-check on a NON-Ising tensor: random
    # positive C4v-symmetric weight a[u,l,d,r] = sum_s w[s,u] w[s,l]
    # w[s,d] w[s,r]; HOTRG (bulk renormalization) and CTMRG
    # (environment fixed point) must agree on log z per site.
    rng = np.random.default_rng(7)
    w = rng.uniform(0.2, 1.0, size=(3, 2))
    a = np.einsum("su,sl,sd,sr->uldr", w, w, w, w)
    got = hotrg_log_z(a, chi=12, steps=30)
    ref = free_energy_per_site(a, chi=16, iters=200)
    assert np.isclose(got, ref, atol=1e-8), (got, ref)
