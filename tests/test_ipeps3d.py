"""Cubic-lattice iPEPS (3D TFIM) vs perturbation theory + limits."""

import numpy as np

from contractn_tpu.models.ipeps3d import (
    ipeps3d_energy,
    ipeps3d_expect_local,
    ipeps3d_ground_state,
    peps3d_double_layer,
    product_peps3d,
    simple_update_3d,
    su3d_absorb_weights,
    tfim_bond_term_3d,
)

X = np.array([[0.0, 1.0], [1.0, 0.0]])
Z = np.diag([1.0, -1.0])


def test_product_limit_exact():
    """h = 0: the polarized product state is exact — E/site = -3,
    |m_z| = 1, measured through the full double-layer HOTRG stack."""
    a = product_peps3d(np.array([1.0, 0.0]), bond_dim=2)
    e = ipeps3d_energy(a, tfim_bond_term_3d(1.0, 0.0), chi=4, steps=20)
    m = ipeps3d_expect_local(a, Z, chi=4, steps=20)
    assert np.isclose(e, -3.0, atol=1e-10), e
    assert np.isclose(m, 1.0, atol=1e-10), m


def test_paramagnetic_perturbation_theory():
    """h = 8 (deep paramagnet): E/site = -h - 3/(4h) + O(h^-3)."""
    h = 8.0
    a, e = ipeps3d_ground_state(tfim_bond_term_3d(1.0, h), bond_dim=2,
                                chi=6, steps=22)
    exact = -h - 3.0 / (4.0 * h)
    assert np.isclose(e, exact, atol=2e-3), (e, exact)
    # PT: <X> = 1 - 6 (J/4h)^2 + ... = 0.988 at h = 8 (measured 0.9877)
    mx = ipeps3d_expect_local(a, X, chi=6, steps=22)
    assert mx > 0.985, mx


def test_ferromagnetic_perturbation_theory():
    """h = 0.5 (deep ferromagnet): E/site = -3 - h^2/12 + O(h^4)
    (single-flip virtual excitation costs 12 = 2 x 6 bonds)."""
    h = 0.5
    _, e = ipeps3d_ground_state(tfim_bond_term_3d(1.0, h), bond_dim=2,
                                chi=6, steps=22)
    exact = -3.0 - h * h / 12.0
    assert np.isclose(e, exact, atol=2e-3), (e, exact)


def test_order_parameter_across_transition():
    """m_z jumps across the 3D quantum critical point (h_c ~ 5.2 for
    the cubic TFIM; D = 2 simple update sits near the mean-field
    value): ordered at h = 2, symmetric at h = 7."""
    g2, l2 = simple_update_3d(tfim_bond_term_3d(1.0, 2.0), bond_dim=2)
    mz2 = ipeps3d_expect_local(su3d_absorb_weights(g2, l2), Z,
                               chi=6, steps=22)
    assert abs(mz2) > 0.9, mz2

    g7, l7 = simple_update_3d(tfim_bond_term_3d(1.0, 7.0), bond_dim=2)
    mz7 = ipeps3d_expect_local(su3d_absorb_weights(g7, l7), Z,
                               chi=6, steps=22)
    assert abs(mz7) < 0.05, mz7


def test_double_layer_norm_is_positive():
    """The double layer of any tensor yields a positive closure and a
    unit norm ratio (op = identity)."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2, 2, 2, 2, 2, 2, 2))
    one = ipeps3d_expect_local(a, np.eye(2), chi=5, steps=15)
    assert np.isclose(one, 1.0, atol=1e-10), one
    a2 = peps3d_double_layer(a)
    assert np.asarray(a2).shape == (4,) * 6
