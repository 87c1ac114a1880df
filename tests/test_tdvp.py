"""Two-site TDVP: real-time propagator parity and imaginary-time flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contractn_tpu.models import MPS, tdvp_evolve, tdvp_step, tfim_mpo
from tests.test_models import dense_mps_vector

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def dense_tfim(n, j=1.0, h=1.0):
    dim = 2 ** n
    ham = np.zeros((dim, dim))

    def kron_at(op, sites):
        out = np.eye(1)
        for s in range(n):
            out = np.kron(out, op[sites.index(s)] if s in sites
                          else np.eye(2))
        return out

    for i in range(n - 1):
        ham -= j * kron_at([_SZ, _SZ], [i, i + 1])
    for i in range(n):
        ham -= h * kron_at([_SX], [i])
    return ham


def test_real_time_matches_dense_expm():
    """Exact-manifold real-time TDVP == dense exp(-iHt) on 4 sites."""
    from scipy.linalg import expm  # torch env ships scipy? guard below

    n, dt, steps = 4, 0.05, 4
    mps = MPS.random(jax.random.PRNGKey(0), n, 2, 4, dtype=jnp.float64)
    mpo = tfim_mpo(n)
    psi0 = dense_mps_vector(mps)
    psi0 = psi0 / np.linalg.norm(psi0)
    want = expm(-1j * dense_tfim(n) * dt * steps) @ psi0

    cur = mps
    for _ in range(steps):
        cur, _ = tdvp_step(mpo, cur, dt, max_bond=4)
    got = dense_mps_vector(cur)
    got = got / np.linalg.norm(got)
    overlap = abs(np.vdot(want, got))
    assert overlap > 1 - 1e-6


def test_real_time_conserves_norm_and_energy():
    n = 6
    mps = MPS.random(jax.random.PRNGKey(1), n, 2, 6, dtype=jnp.float64)
    mpo = tfim_mpo(n)
    cur, e0 = tdvp_step(mpo, mps, 0.02, max_bond=6)
    energies = [e0]
    for _ in range(4):
        cur, e = tdvp_step(mpo, cur, 0.02, max_bond=6)
        energies.append(e)
    nrm = float(np.linalg.norm(dense_mps_vector(cur)))
    assert np.isclose(nrm, 1.0, rtol=1e-8)
    assert np.allclose(energies, energies[0], rtol=1e-5)


def test_imaginary_time_flows_to_ground_state():
    from contractn_tpu.models import dmrg

    n, bond = 8, 8
    mpo = tfim_mpo(n)
    mps0 = MPS.random(jax.random.PRNGKey(2), n, 2, bond, dtype=jnp.float64)
    _, e_dmrg, _ = dmrg(mpo, mps0, max_bond=bond, sweeps=4)

    cur, energies = tdvp_evolve(mpo, mps0, dt=0.12, n_steps=22,
                                max_bond=bond, imaginary=True)
    # monotone projector flow, converging at the spectral-gap rate
    assert all(a >= b - 1e-9 for a, b in zip(energies, energies[1:]))
    assert energies[-1] >= e_dmrg - 1e-6  # variational bound
    assert np.isclose(energies[-1], e_dmrg, rtol=1e-2)


def test_tdvp_rejects_single_site():
    mps = MPS.random(jax.random.PRNGKey(3), 1, 2, 1, dtype=jnp.float64)
    with pytest.raises(ValueError):
        tdvp_step(tfim_mpo(1), mps, 0.1)

# --------------------------------------------------------------------- #
# Single-site TDVP (TDVP1)
# --------------------------------------------------------------------- #


def test_tdvp1_real_time_matches_dense_expm():
    from scipy.linalg import expm

    from contractn_tpu.models import tdvp1_step

    n, dt, steps = 4, 0.05, 4
    mps = MPS.random(jax.random.PRNGKey(0), n, 2, 4, dtype=jnp.float64)
    mpo = tfim_mpo(n)
    psi0 = dense_mps_vector(mps)
    psi0 = psi0 / np.linalg.norm(psi0)
    want = expm(-1j * dense_tfim(n) * dt * steps) @ psi0

    cur = mps
    for _ in range(steps):
        cur, _ = tdvp1_step(mpo, cur, dt)
    got = dense_mps_vector(cur)
    got = got / np.linalg.norm(got)
    # bond-4 manifold on 4 sites is not the full Hilbert space: the
    # projection error (not the integrator) bounds the overlap
    assert abs(np.vdot(want, got)) > 1 - 1e-4


def test_tdvp1_conserves_norm_energy_and_bond():
    from contractn_tpu.models import tdvp1_step

    n, bond = 6, 6
    mps = MPS.random(jax.random.PRNGKey(1), n, 2, bond, dtype=jnp.float64)
    mpo = tfim_mpo(n)
    cur, e0 = tdvp1_step(mpo, mps, 0.02)
    energies = [e0]
    for _ in range(4):
        cur, e = tdvp1_step(mpo, cur, 0.02)
        energies.append(e)
    assert cur.bond_dim == bond  # exact-manifold: bond never moves
    nrm = float(np.linalg.norm(dense_mps_vector(cur)))
    assert np.isclose(nrm, 1.0, rtol=1e-8)
    # single-site projection is exact: tighter conservation than the
    # truncating two-site integrator
    assert np.allclose(energies, energies[0], rtol=1e-9)


def test_tdvp1_imaginary_time_flows_to_ground_state():
    from contractn_tpu.models import dmrg, tdvp1_evolve

    n, bond = 8, 8
    mpo = tfim_mpo(n)
    mps0 = MPS.random(jax.random.PRNGKey(2), n, 2, bond, dtype=jnp.float64)
    _, e_dmrg, _ = dmrg(mpo, mps0, max_bond=bond, sweeps=4)

    _, energies = tdvp1_evolve(mpo, mps0, dt=0.12, n_steps=25,
                               imaginary=True)
    assert all(a >= b - 1e-9 for a, b in zip(energies, energies[1:]))
    assert energies[-1] >= e_dmrg - 1e-6  # variational bound
    assert np.isclose(energies[-1], e_dmrg, rtol=1e-2)


def test_tdvp1_rejects_single_site():
    from contractn_tpu.models import tdvp1_step

    mps = MPS.random(jax.random.PRNGKey(3), 1, 2, 1, dtype=jnp.float64)
    with pytest.raises(ValueError):
        tdvp1_step(tfim_mpo(1), mps, 0.1)


def test_driven_tdvp_matches_time_ordered_dense():
    """Driven TFIM h(t) = h0 + A sin(w t): midpoint TDVP == the dense
    time-ordered propagator (fine-step midpoint product oracle), and
    the error is second order in dt (halving dt shrinks the overlap
    deficit ~4x)."""
    from scipy.linalg import expm

    from contractn_tpu.models import tdvp_evolve_driven

    n, t_tot = 4, 0.6
    h0, amp, om = 1.0, 0.6, 3.0
    mps = MPS.random(jax.random.PRNGKey(1), n, 2, 4, dtype=jnp.float64)
    psi0 = dense_mps_vector(mps)
    psi0 = psi0 / np.linalg.norm(psi0)

    # dense oracle: fine midpoint product (512 slices: error << test tol)
    fine = 512
    dt_f = t_tot / fine
    want = psi0
    for k in range(fine):
        hmid = dense_tfim(n, h=h0 + amp * np.sin(om * (k + 0.5) * dt_f))
        want = expm(-1j * hmid * dt_f) @ want

    def mpo_fn(t):
        return tfim_mpo(n, h=h0 + amp * np.sin(om * t))

    deficits = []
    for steps in (12, 24):
        cur, _ = tdvp_evolve_driven(mpo_fn, mps, t_tot / steps, steps,
                                    max_bond=4)
        got = dense_mps_vector(cur)
        got = got / np.linalg.norm(got)
        deficits.append(1.0 - abs(np.vdot(want, got)))
    assert deficits[1] < 1e-4
    # 2nd order: ratio ~4 (allow slack for the fine-oracle floor)
    assert deficits[0] / max(deficits[1], 1e-12) > 2.5
