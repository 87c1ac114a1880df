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
    hotrg_log_z_diff,
    ising_internal_energy_ad,
    ising_specific_heat_ad,
    ising_tensor_smooth,
    potts_tensor_smooth,
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


def test_smooth_tensors_match_constructors():
    # The smooth builders differ from the eigh-based constructors by an
    # orthogonal gauge on each bond (LAPACK eigh orders the sinh branch
    # first), so entrywise parity is the WRONG check.  Gauge-invariant
    # pins instead: (a) the exact 2x2-torus partition function by brute
    # spin sum, (b) log Z parity with the eigh route along the RG flow.
    def torus_z(a):
        return float(np.einsum("jfie,lekf,ihjg,kglh->",
                               a, a, a, a, optimize=True))

    for beta in (0.3, 0.5):
        a = np.asarray(ising_tensor_smooth(beta))
        spins = np.array([1.0, -1.0])
        z_exact = sum(
            np.exp(2.0 * beta * (s00 * s01 + s10 * s11
                                 + s00 * s10 + s01 * s11))
            for s00 in spins for s01 in spins
            for s10 in spins for s11 in spins)
        assert np.isclose(torus_z(a), z_exact, rtol=1e-12)
        assert np.isclose(
            hotrg_log_z(a, chi=12, steps=20),
            hotrg_log_z(ising_tensor(beta), chi=12, steps=20),
            atol=1e-10)
    for beta in (0.8, 1.2):
        a = np.asarray(potts_tensor_smooth(beta, q=3))
        # python ints: np.bool_ '+' is logical OR, which silently
        # collapses the bond count if the spins are numpy scalars.
        vals = range(3)
        z_exact = sum(
            np.exp(beta * 2.0 * float((s00 == s01) + (s10 == s11)
                                      + (s00 == s10) + (s01 == s11)))
            for s00 in vals for s01 in vals
            for s10 in vals for s11 in vals)
        assert np.isclose(torus_z(a), z_exact, rtol=1e-12)
        b = potts_tensor(beta, q=3)
        assert np.isclose(
            hotrg_log_z(a, chi=12, steps=20),
            hotrg_log_z(b, chi=12, steps=20), atol=1e-10)


def test_log_z_diff_value_matches_flow():
    # Freezing the projectors only changes the REVERSE pass; the primal
    # value is the plain flow.
    beta = 0.4
    got = float(hotrg_log_z_diff(ising_tensor_smooth(beta), chi=12,
                                 steps=30))
    assert np.isclose(got, hotrg_log_z(ising_tensor(beta), chi=12,
                                       steps=30), atol=1e-12)


def test_internal_energy_autodiff_matches_onsager():
    # u = -d ln Z / d beta = -2 <s s'> (two bonds per site): ONE reverse
    # pass through the whole RG flow with frozen projectors, against
    # the exact Onsager value.  The frozen-projector gradient error is
    # the truncation error (variational projectors => their variation
    # is second order), same scale as the impurity-flow route: measured
    # 8.3e-6 at b=0.3, 1.4e-4 at b=0.5 (that flow passes closer to the
    # critical fixed point, where chi=12 truncation bites hardest).
    for beta, tol in ((0.3, 1e-5), (0.5, 3e-4)):
        u_exact = -2.0 * exact_nn_correlation(beta)
        got = ising_internal_energy_ad(beta, chi=12, steps=30)
        assert np.isclose(got, u_exact, atol=tol), (beta, got, u_exact)


def test_specific_heat_autodiff():
    # C = beta^2 d^2 ln Z/d beta^2 off criticality, against a central
    # difference of the exact Onsager energy.
    beta = 0.3
    eps = 1e-4
    du = (-2.0 * exact_nn_correlation(beta + eps)
          + 2.0 * exact_nn_correlation(beta - eps)) / (2.0 * eps)
    c_exact = -beta * beta * du
    got = ising_specific_heat_ad(beta, chi=12, steps=30)
    assert np.isclose(got, c_exact, atol=1e-3), (got, c_exact)


def test_field_derivative_autodiff():
    # d ln Z / d h at finite field == <sigma>: autodiff through the
    # flow vs the impurity-flow magnetization on the SAME biased
    # tensor (both at chi=12; agreement is limited only by the frozen
    # projector approximation).
    import jax
    import jax.numpy as jnp

    beta, h = 0.5, 0.05
    # smooth builder takes the folded field weight exp(hh * s), so
    # d ln Z / d hh at hh = beta h is exactly <sigma>.
    grad = jax.grad(lambda hh: hotrg_log_z_diff(
        ising_tensor_smooth(beta, hh), chi=12, steps=30))
    m_ad = float(grad(jnp.asarray(beta * h)))
    bias = np.exp(beta * h * np.array([1.0, -1.0]))
    a = ising_tensor(beta, field_op=bias)
    sig = ising_tensor(beta, field_op=bias * np.array([1.0, -1.0]))
    m_imp = hotrg_expectation(a, sig, chi=12, steps=30)
    assert np.isclose(m_ad, m_imp, atol=1e-5), (m_ad, m_imp)


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
