"""Ternary MERA vs the critical Ising chain and its CFT data."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.itebd import tfim_h2
from contractn_tpu.models.mera import (
    _ascend,
    _descend,
    _trace_pair,
    mera_energy,
    mera_ground_state,
    scaling_dimensions,
)
from contractn_tpu.ops.stabilize import dot_precision


def _rand_isometry(key, out_dim, in_dim):
    q, _ = jnp.linalg.qr(jax.random.normal(key, (in_dim, out_dim),
                                           jnp.float64))
    return q.T


def test_superoperator_invariants():
    # A(I) = 3 I pins the three diagram weights; the adjoint pairing
    # Tr(rho A(h)) == 3 Tr(D(rho) h) is the linear_transpose contract.
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m, big = 3, 5
    w = _rand_isometry(k1, big, m ** 3).reshape(big, m, m, m)
    u = _rand_isometry(k2, m * m, m * m).reshape(m, m, m, m)
    prec = dot_precision(jnp.float64)

    eye = jnp.eye(m * m, dtype=jnp.float64).reshape(m, m, m, m)
    ai = _ascend(eye, u, w, prec).reshape(big * big, big * big)
    assert float(jnp.max(jnp.abs(ai - 3 * jnp.eye(big * big)))) < 1e-12

    h = jax.random.normal(k3, (m * m, m * m))
    h = ((h + h.T) / 2).reshape(m, m, m, m)
    r = jax.random.normal(k4, (big * big, big * big))
    r = ((r + r.T) / 2).reshape(big, big, big, big)
    lhs = _trace_pair(r, _ascend(h, u, w, prec), prec)
    rhs = 3 * _trace_pair(_descend(r, u, w, prec), h, prec)
    assert abs(float(lhs - rhs)) < 1e-12


def test_critical_tfim_energy_and_scaling_dimensions():
    params, e = mera_ground_state(tfim_h2(), chi=4, sweeps=12000)
    exact = -4.0 / np.pi
    # Variational: must sit ABOVE the exact energy and close to it.
    assert e >= exact - 1e-9, e
    assert e - exact < 3e-4, e
    # mera_energy recomputes the same value from the params alone
    # (cold-start fixed point vs the sweep's warm one: ~1e-8).
    assert abs(mera_energy(params, tfim_h2()) - e) < 1e-6

    dims = scaling_dimensions(params, n=2)
    # Ising CFT one-site tower: identity exactly 0, sigma at 1/8.
    assert abs(dims[0]) < 1e-8
    assert abs(dims[1] - 0.125) < 0.02, dims

    # One-site expectation: critical <X> = 2/pi.
    from contractn_tpu.models.mera import (
        mera_correlator,
        mera_site_expectation,
    )
    sx = mera_site_expectation(params, np.array([[0.0, 1.0], [1.0, 0.0]]))
    assert abs(sx - 2.0 / np.pi) < 0.01, sx

    # Order-parameter correlator: r^(-2 Delta_sigma) power law whose
    # implied exponent matches the scaling superoperator's Delta_sigma
    # (self-consistency) and the CFT value.
    _, c = mera_correlator(params, np.array([[1.0, 0.0], [0.0, -1.0]]),
                           kmax=7)
    implied = -np.log(c[-1] / c[-2]) / (2.0 * np.log(3.0))
    assert abs(implied - dims[1]) < 0.005, (implied, dims[1])
    assert abs(implied - 0.125) < 0.03, implied


def test_expand_mera_is_exact():
    # The chi-ramp warm start must represent the SAME state: embedded
    # energy equals the source energy, and all isometry/unitarity
    # constraints hold exactly.
    from contractn_tpu.models.mera import expand_mera

    params, _ = mera_ground_state(tfim_h2(), chi=4, sweeps=400)
    big = expand_mera(params, chi=6)
    # Same cold fixed-point protocol on both sides: the embedded MERA
    # is the same state, so the energies agree to the rho* tolerance.
    e_small = mera_energy(params, tfim_h2(), rho_iters=400)
    e_big = mera_energy(big, tfim_h2(), rho_iters=400)
    assert abs(e_big - e_small) < 1e-8, (e_big, e_small)

    w = np.asarray(big["w_s"]).reshape(6, -1)
    assert np.allclose(w @ w.T, np.eye(6), atol=1e-12)
    u = np.asarray(big["u_s"]).reshape(36, 36)
    assert np.allclose(u @ u.T, np.eye(36), atol=1e-12)


def test_gapped_chain_energy():
    # Off criticality (h = 2): exact Pfeuty integral; the MERA is not
    # scale-invariant physics but remains variational and accurate.
    k = np.linspace(-np.pi, np.pi, 4001)
    eps = 2.0 * np.sqrt(1.0 + 4.0 - 4.0 * np.cos(k))
    e_exact = -np.trapezoid(eps, k) / (4.0 * np.pi)
    _, e = mera_ground_state(tfim_h2(h=2.0), chi=4, sweeps=4000)
    assert e >= e_exact - 1e-9
    assert e - e_exact < 1e-4, (e, e_exact)
