"""3D HOTRG vs closed forms: decoupled-layer Onsager limit, low/high-T
cubic Ising series, autodiff internal energy, and the 3D transition."""

import numpy as np
import pytest

from contractn_tpu.models.hotrg3d import (
    hotrg3d_expectation,
    hotrg3d_log_z,
    hotrg3d_log_z_diff,
    ising3d_internal_energy_ad,
    ising3d_tensor_smooth,
)
from tests.test_ctmrg import onsager_log_z


def _ising3d_pair(beta, h=0.0):
    """Cubic Ising site tensor and its sigma-impurity (numpy, f64)."""
    ch, sh = np.sqrt(np.cosh(beta)), np.sqrt(np.sinh(beta))
    w = np.array([[ch, sh], [ch, -sh]])
    weight = np.exp(h * np.array([1.0, -1.0]))
    a = np.einsum("s,su,sl,sd,sr,sf,sk->uldrfk", weight, w, w, w, w, w, w)
    sig = weight * np.array([1.0, -1.0])
    imp = np.einsum("s,su,sl,sd,sr,sf,sk->uldrfk", sig, w, w, w, w, w, w)
    return a, imp


def test_decoupled_chains_exact():
    """beta = 0 in-plane decouples the lattice into independent 1D
    chains: ln z = ln(2 cosh beta_z) EXACTLY (live bond dim 1 on x/y)
    — pins the z-axis bookkeeping at machine precision."""
    a = ising3d_tensor_smooth(np.float64(0.0), beta_z=0.7)
    got = hotrg3d_log_z(np.asarray(a), chi=4, steps=25)
    assert np.isclose(got, np.log(2.0 * np.cosh(0.7)), atol=1e-13), got


def test_decoupled_layers_match_onsager():
    """beta_z = 0 stacks independent 2D layers: the FULL 3D flow (all
    three axis merges, both transverse truncations) reproduces
    Onsager's exact 2D free energy.

    Joint truncation is PUNISHING here by design: each z-merge tensor-
    multiplies two independent layers, so the pair bond is the product
    of layer bonds and chi total ~ chi_layer^2 — chi=6 is effective
    per-layer chi ~ 2.5, hence ~1e-3 errors (measured), improving with
    chi.  The anchor pins the axis bookkeeping, not asymptotics."""
    err = {}
    for chi in (4, 6):
        for beta in (0.2, 0.25):
            a = ising3d_tensor_smooth(np.float64(beta), beta_z=0.0)
            got = hotrg3d_log_z(np.asarray(a), chi=chi, steps=25)
            err[(chi, beta)] = abs(got - onsager_log_z(beta))
    assert err[(6, 0.2)] < 4e-4 and err[(6, 0.25)] < 1e-3, err
    # truncation error shrinks with chi (both temperatures)
    assert err[(6, 0.2)] < err[(4, 0.2)], err
    assert err[(6, 0.25)] < err[(4, 0.25)], err


def test_low_temperature_series():
    """ln z = 3 beta + e^{-12 beta} + O(e^{-20 beta}) deep in the
    ordered phase — a genuinely 3D closed form (6 bonds flip)."""
    beta = 0.8
    a, _ = _ising3d_pair(beta)
    got = hotrg3d_log_z(a, chi=4, steps=25)
    exact = 3.0 * beta + np.exp(-12.0 * beta) + 3.0 * np.exp(-20.0 * beta)
    assert np.isclose(got, exact, atol=1e-6), (got, exact)


def test_high_temperature_series():
    """ln z = ln 2 + 3 ln cosh beta + 3 t^4 + O(t^6): the t^4
    coefficient counts the cubic lattice's 3 plaquettes per site."""
    beta = 0.1
    a, _ = _ising3d_pair(beta)
    got = hotrg3d_log_z(a, chi=5, steps=25)
    t = np.tanh(beta)
    series = np.log(2.0) + 3.0 * np.log(np.cosh(beta)) + 3.0 * t**4
    assert np.isclose(got, series, atol=3e-5), (got, series)


def test_ad_internal_energy():
    """-d ln Z / d beta through the frozen-projector reverse pass ==
    the low-T expansion and central differences of the flow, both to
    the measured frozen-projector error (~7e-5 at chi=4: the FD path
    lets the projectors vary with beta, the AD path holds them fixed
    — the same truncation-order gap the 2D module documents)."""
    beta = 0.8
    u = ising3d_internal_energy_ad(beta, chi=4, steps=20)
    exact = -3.0 + 12.0 * np.exp(-12.0 * beta) + 60.0 * np.exp(-20.0 * beta)
    assert np.isclose(u, exact, atol=2e-4), (u, exact)

    d = 1e-4
    a_p, _ = _ising3d_pair(beta + d)
    a_m, _ = _ising3d_pair(beta - d)
    fd = -(hotrg3d_log_z(a_p, chi=4, steps=20)
           - hotrg3d_log_z(a_m, chi=4, steps=20)) / (2.0 * d)
    assert np.isclose(fd, exact, atol=5e-6), (fd, exact)
    assert np.isclose(u, fd, atol=2e-4), (u, fd)


def test_magnetization_across_transition():
    """Order parameter jump across the 3D critical point
    (beta_c ~ 0.2216): ordered at 0.35, disordered at 0.15, plus the
    low-T magnetization series deep in the ordered phase."""
    a_hot, i_hot = _ising3d_pair(0.15, h=0.01)
    m_hot = hotrg3d_expectation(a_hot, i_hot, chi=4, steps=22)
    assert abs(m_hot) < 0.3, m_hot

    a_cold, i_cold = _ising3d_pair(0.35, h=0.01)
    m_cold = hotrg3d_expectation(a_cold, i_cold, chi=4, steps=22)
    assert abs(m_cold) > 0.8, m_cold

    # beta = 0.5, h -> 0+: m = 1 - 2u^3 - 12u^5 + 14u^6 + O(u^7),
    # u = e^{-4 beta} (Sykes low-T series, convergent here)
    beta = 0.5
    a, imp = _ising3d_pair(beta, h=1e-3)
    m = hotrg3d_expectation(a, imp, chi=4, steps=25)
    u_ = np.exp(-4.0 * beta)
    series = 1.0 - 2.0 * u_**3 - 12.0 * u_**5 + 14.0 * u_**6
    assert np.isclose(m, series, atol=2e-3), (m, series)


def test_diff_log_z_matches_flow():
    """The traced (frozen-projector) log Z equals the plain flow value
    at the same chi/steps (projector freezing changes gradients only)."""
    a, _ = _ising3d_pair(0.3)
    lz = hotrg3d_log_z(a, chi=4, steps=18)
    lzd = float(hotrg3d_log_z_diff(a, chi=4, steps=18))
    assert np.isclose(lz, lzd, rtol=0, atol=1e-12), (lz, lzd)


def test_anisotropic_energy_consistency():
    """AD energy (d/d beta at fixed beta_z) tracks finite differences
    on anisotropic couplings — exercises the z/x/y axis bookkeeping
    (an axis-permutation bug flips which bonds beta reaches and moves
    the value by O(1)); agreement is bounded by the frozen-projector
    gap, ~5e-3 at this chi=4 (measured)."""
    beta, beta_z = 0.6, 0.25

    def lz(b):
        a = ising3d_tensor_smooth(np.float64(b), beta_z=beta_z)
        return hotrg3d_log_z(np.asarray(a), chi=4, steps=18)

    import jax

    grad = jax.grad(
        lambda b: hotrg3d_log_z_diff(
            ising3d_tensor_smooth(b, beta_z=beta_z), chi=4, steps=18
        )
    )
    u_ad = -float(grad(np.float64(beta)))
    d = 1e-4
    fd = -(lz(beta + d) - lz(beta - d)) / (2.0 * d)
    assert np.isclose(u_ad, fd, atol=1e-2), (u_ad, fd)


def test_bond_expectation_matches_energy():
    """z-bond <s_i s_j> == -u/3 (three bonds per site; AD energy is
    the independently validated oracle)."""
    from contractn_tpu.models.hotrg3d import hotrg3d_bond_expectation

    beta = 0.8
    a, imp = _ising3d_pair(beta)
    ss = hotrg3d_bond_expectation(a, imp, imp, chi=4, steps=22)
    exact = (3.0 - 12.0 * np.exp(-12.0 * beta)
             - 60.0 * np.exp(-20.0 * beta)) / 3.0
    assert np.isclose(ss, exact, atol=1e-4), (ss, exact)


def test_checkerboard_reduces_to_uniform():
    """hotrg3d_ab_* with a == b must reproduce the uniform flow (the
    seeds are then three ordinary merges): log Z, one-site and
    z-bond impurities."""
    from contractn_tpu.models.hotrg3d import (
        hotrg3d_ab_expectation,
        hotrg3d_ab_log_z,
    )

    beta = 0.3
    a, imp = _ising3d_pair(beta, h=0.01)
    lz_ab = hotrg3d_ab_log_z(a, a, chi=4, steps=22)
    lz = hotrg3d_log_z(a, chi=4, steps=25)
    assert np.isclose(lz_ab, lz, atol=1e-7), (lz_ab, lz)
    m_ab = hotrg3d_ab_expectation(a, a, imp_a=imp, chi=4, steps=22)
    m = hotrg3d_expectation(a, imp, chi=4, steps=25)
    assert np.isclose(m_ab, m, atol=1e-6), (m_ab, m)

    a0, imp0 = _ising3d_pair(0.8)
    from contractn_tpu.models.hotrg3d import hotrg3d_bond_expectation

    ss_ab = hotrg3d_ab_expectation(a0, a0, imp_a=imp0, imp_b=imp0,
                                   chi=4, steps=22)
    ss = hotrg3d_bond_expectation(a0, imp0, imp0, chi=4, steps=25)
    assert np.isclose(ss_ab, ss, atol=1e-8), (ss_ab, ss)


def test_checkerboard_alternating_field_chains():
    """Genuinely two-species input: beta = 0 in-plane decouples the
    NaCl lattice into 1D chains with ALTERNATING field +-h — exactly
    solvable by a two-site transfer matrix.  Joint truncation of the
    bundled decoupled chains bounds the accuracy (see the decoupled-
    layers test); the anchor pins the A/B species geometry, which a
    swapped class or frame-inverse bug breaks at O(1)."""
    from contractn_tpu.models.hotrg3d import hotrg3d_ab_log_z

    beta, h = 0.4, 0.3
    ch, sh = np.sqrt(np.cosh(beta)), np.sqrt(np.sinh(beta))
    w = np.array([[ch, sh], [ch, -sh]])
    one = np.array([[1.0], [1.0]])

    def site(field):
        wt = np.exp(field * np.array([1.0, -1.0]))
        return np.einsum("s,su,sl,sd,sr,sf,sk->uldrfk", wt, w, one,
                         w, one, one, one)

    def t_mat(hh):
        return np.array([[np.exp(beta + hh), np.exp(-beta + hh)],
                         [np.exp(-beta - hh), np.exp(beta - hh)]])

    m = t_mat(h) @ t_mat(-h)
    exact = 0.5 * np.log(max(np.linalg.eigvals(m).real))
    got = hotrg3d_ab_log_z(site(+h), site(-h), chi=4, steps=22)
    assert np.isclose(got, exact, atol=1e-3), (got, exact)


def test_checkerboard_impurity_chain_oracle():
    """Asymmetric random alternating chains along z with a one-site
    impurity: the checkerboard flow matches the exact transfer-matrix
    ratio (the seed routes the impurity through three merges — a
    wrong top/bot slot at any stage moves it to the wrong site)."""
    from contractn_tpu.models.hotrg3d import hotrg3d_ab_expectation

    rng = np.random.default_rng(1)
    m_a = rng.uniform(0.5, 1.5, (2, 2))
    m_b = rng.uniform(0.5, 1.5, (2, 2))
    i_a = rng.uniform(-1.0, 1.0, (2, 2))

    def embed(mat):
        t = np.zeros((2, 2, 2, 2, 2, 2))
        for s in range(2):
            for tt in range(2):
                t[s, 0, tt, 0, 0, 0] = mat[tt, s]  # (u, d) <- m[d, u]
        return t

    n = 300
    m = m_b.T @ m_a.T
    mi = m_b.T @ i_a.T
    p = np.linalg.matrix_power(m, n - 1)
    exact = np.trace(mi @ p) / np.trace(m @ p)
    got = hotrg3d_ab_expectation(embed(m_a), embed(m_b),
                                 imp_a=embed(i_a), chi=5, steps=25)
    assert np.isclose(got, exact, atol=2e-3), (got, exact)
