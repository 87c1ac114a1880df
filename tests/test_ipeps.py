"""iPEPS expectation values cross-validated through the classical mapping.

The square-root-Boltzmann PEPS ``A[s,u,l,d,r] = prod W[s,leg]`` with
``W W^T = exp((beta/2) s s')`` satisfies ``<psi|psi> = Z_classical(beta)``
and ``<sigma_z> = <sigma>_classical(beta)`` exactly — so the quantum
(double-layer) code path must land on the classical CTMRG numbers and on
Onsager/Yang exact values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models.ctmrg import free_energy_per_site, ising_tensor
from contractn_tpu.models.ipeps import (
    ipeps_energy,
    ipeps_expect_bond,
    ipeps_expect_local,
    peps_double_layer,
    product_peps,
    symmetrize_c4v,
)

SZ = np.diag([1.0, -1.0])


def sqrt_boltzmann_peps(beta):
    """The PEPS whose norm is the classical Ising partition function."""
    b = np.array([[np.exp(beta / 2), np.exp(-beta / 2)],
                  [np.exp(-beta / 2), np.exp(beta / 2)]])
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    return jnp.asarray(np.einsum("su,sl,sd,sr->suldr", w, w, w, w))


def double_layer_plus_boundary(beta):
    """Fixed-spin (+1) boundary seed in DOUBLE-layer bonds (ket (x) bra
    fused in the same order as peps_double_layer)."""
    b = np.array([[np.exp(beta / 2), np.exp(-beta / 2)],
                  [np.exp(-beta / 2), np.exp(beta / 2)]])
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    y = np.kron(w[0], w[0])  # spin-up row, ket (x) bra
    c0 = np.outer(y, y)
    t0 = np.einsum("l,d,r->ldr", y, y, y)
    return jnp.asarray(c0), jnp.asarray(t0)


def test_double_layer_free_energy_matches_classical():
    """log <psi|psi> per site == classical free energy per site."""
    beta = 0.3  # disordered phase, fast convergence
    a_quantum = peps_double_layer(sqrt_boltzmann_peps(beta))
    f_quantum = free_energy_per_site(np.asarray(a_quantum), chi=16,
                                     iters=150)
    f_classical = free_energy_per_site(ising_tensor(beta), chi=16,
                                       iters=150)
    assert np.isclose(f_quantum, f_classical, rtol=1e-8)


def test_ipeps_magnetization_matches_onsager():
    """<sigma_z> of the sqrt-Boltzmann iPEPS == Onsager-Yang exact value."""
    beta = 0.5  # ordered phase (beta_c ~ 0.4407)
    m_exact = (1.0 - np.sinh(2 * beta) ** -4) ** 0.125
    m = ipeps_expect_local(
        sqrt_boltzmann_peps(beta), SZ, chi=16, iters=200,
        boundary=double_layer_plus_boundary(beta),
    )
    assert np.isclose(float(m), m_exact, atol=2e-6), (float(m), m_exact)


def test_ipeps_bond_correlation_matches_classical_ctmrg():
    """<sigma_i sigma_j> on a bond: quantum pair-patch vs the classical
    nearest-neighbor energy estimate from the free-energy derivative."""
    beta = 0.55
    zz = np.kron(SZ, SZ)
    e_bond = float(ipeps_expect_bond(
        sqrt_boltzmann_peps(beta), zz, chi=16, iters=200,
        boundary=double_layer_plus_boundary(beta),
    ))
    # classical <s_i s_j> = d(log Z per site)/d(beta) / 2 (two bonds/site)
    db = 1e-5
    fp = free_energy_per_site(ising_tensor(beta + db), chi=16, iters=200)
    fm = free_energy_per_site(ising_tensor(beta - db), chi=16, iters=200)
    e_classical = (fp - fm) / (2 * db) / 2.0
    assert np.isclose(e_bond, e_classical, atol=1e-5), (e_bond, e_classical)


@pytest.mark.parametrize("bond_dim,chi", [(1, 1), (2, 4)])
def test_product_state_expectations_closed_form(bond_dim, chi):
    """Product iPEPS (incl. zero-padded bonds): closed-form one- and
    two-site expectations."""
    v = np.array([2.0, 1.0])
    a_site = product_peps(v, bond_dim=bond_dim, dtype=np.float64)
    nrm = v @ v
    want_z = (v[0] ** 2 - v[1] ** 2) / nrm
    got_z = float(ipeps_expect_local(a_site, SZ, chi=chi, iters=30))
    assert np.isclose(got_z, want_z, rtol=1e-9)

    from contractn_tpu.models import tfim_bond_term

    h2 = np.asarray(tfim_bond_term(j=1.0, h=1.0))
    vv = np.kron(v, v)
    want_h = (vv @ h2 @ vv) / nrm ** 2
    got_h = float(ipeps_expect_bond(a_site, h2, chi=chi, iters=30))
    assert np.isclose(got_h, want_h, rtol=1e-9)
    # energy per site = 2 bonds per site
    got_e = float(ipeps_energy(a_site, h2, chi=chi, iters=30))
    assert np.isclose(got_e, 2 * want_h, rtol=1e-9)


def test_symmetrize_c4v_invariance():
    """The projected tensor is invariant under rotations + reflections."""
    rng = np.random.default_rng(0)
    a_site = symmetrize_c4v(rng.normal(size=(2, 3, 3, 3, 3)))
    rot = jnp.transpose(a_site, (0, 2, 3, 4, 1))
    refl = jnp.transpose(a_site, (0, 1, 4, 3, 2))
    assert np.allclose(np.asarray(a_site), np.asarray(rot), atol=1e-12)
    assert np.allclose(np.asarray(a_site), np.asarray(refl), atol=1e-12)
    # idempotent
    twice = symmetrize_c4v(a_site)
    assert np.allclose(np.asarray(a_site), np.asarray(twice), atol=1e-12)


def test_simple_update_tfim_paramagnetic():
    """2D TFIM at h=3.5 (above h_c~3.044): the D=2 simple-update state,
    measured by CTMRG (a true variational energy), beats the best product
    state and sits near the 2nd-order perturbative value."""
    from contractn_tpu.models.ipeps import (
        ipeps_ground_state,
        tfim_bond_term_2d,
    )

    h = 3.5
    a_site, energy = ipeps_ground_state(
        tfim_bond_term_2d(j=1.0, h=h), bond_dim=2, chi=8,
        schedule=((0.1, 150), (0.02, 150), (0.005, 80)), iters=120,
    )
    energy = float(energy)
    e_meanfield = -2.0 * (1 - (h / 4) ** 2) - h * h / 4  # best product
    e_pt2 = -h - 1.0 / (2 * h)  # E = -h - J^2/(2h) + O(h^-3)
    assert energy < e_meanfield, (energy, e_meanfield)
    assert abs(energy - e_pt2) < 0.02, (energy, e_pt2)
    # paramagnet: strongly X-polarized, zero spontaneous magnetization
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    mx = float(ipeps_expect_local(np.asarray(a_site), sx, chi=8, iters=120))
    mz = float(ipeps_expect_local(np.asarray(a_site), SZ, chi=8, iters=120))
    assert mx > 0.9, mx  # mean-field gives h/4 = 0.875; measured ~0.95
    # residual symmetry-breaking from the noisy start decays with the
    # imaginary-time flow; ~1e-4 is convergence noise, not order
    assert abs(mz) < 1e-3, mz


def test_simple_update_large_field_nearly_product():
    """Deep paramagnet h=6: energy within ~1e-2 of -h - 1/(2h) and below
    the exact product-state value -h."""
    from contractn_tpu.models.ipeps import (
        ipeps_ground_state,
        tfim_bond_term_2d,
    )

    h = 6.0
    _, energy = ipeps_ground_state(
        tfim_bond_term_2d(j=1.0, h=h), bond_dim=2, chi=8,
        schedule=((0.05, 150), (0.01, 100)), iters=100,
    )
    energy = float(energy)
    assert energy < -h  # beats every product state
    assert abs(energy - (-h - 1.0 / (2 * h))) < 1e-2, energy
