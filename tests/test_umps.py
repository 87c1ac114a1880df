"""Uniform (infinite) MPS: transfer spectrum, correlation length,
thermodynamic expectation values."""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu.models.umps import (
    correlation_length,
    expect_local,
    log_norm_per_site,
    transfer_spectrum,
)


def aklt_core():
    """Standard AKLT tensors: d=3, D=2; |lam2/lam1| = 1/3 exactly."""
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    sz = np.array([[1.0, 0.0], [0.0, -1.0]])
    a = np.stack([
        np.sqrt(2.0 / 3.0) * sp,
        -np.sqrt(1.0 / 3.0) * sz,
        -np.sqrt(2.0 / 3.0) * sm,
    ])
    return jnp.asarray(a)


def test_aklt_spectrum_and_correlation_length():
    spec = transfer_spectrum(aklt_core(), iters=400)
    ratio = abs(spec["lam2"]) / abs(spec["lam1"])
    assert np.isclose(ratio, 1.0 / 3.0, rtol=1e-8)
    assert np.isclose(correlation_length(aklt_core()), 1.0 / np.log(3.0),
                      rtol=1e-8)


def test_aklt_sz_expectation_vanishes():
    szop = np.diag([1.0, 0.0, -1.0])  # spin-1 Sz in the {+,0,-} basis
    val = expect_local(aklt_core(), szop, iters=400)
    assert abs(val) < 1e-8


def test_product_state_limit():
    """D=1: the chain is a product state; everything has closed form."""
    v = np.array([0.6, 0.8])
    core = jnp.asarray(v.reshape(2, 1, 1))
    spec = transfer_spectrum(core, iters=100)
    assert np.isclose(spec["lam1"], 1.0, rtol=1e-10)  # |v|^2
    assert spec["xi"] == float("inf")
    op = np.array([[2.0, 1.0], [1.0, -1.0]])
    want = v @ op @ v / (v @ v)
    assert np.isclose(expect_local(core, op, iters=100), want, rtol=1e-10)


def test_log_norm_per_site_matches_finite_chains():
    """Finite-chain log-norms grow linearly at rate log(lam1)."""
    from contractn_tpu.models import MPS
    from contractn_tpu.ops.scan import mps_norm

    key = jax.random.PRNGKey(5)
    core = 0.5 * jax.random.normal(key, (2, 4, 4), jnp.float64)
    rate = log_norm_per_site(core, iters=500)

    def chain_log_norm(n):
        cores = jnp.broadcast_to(core, (n,) + core.shape)
        e = jnp.ones((4,), jnp.float64)
        val, log = mps_norm(cores, e, e)
        return float(jnp.log(jnp.abs(val)) + log)

    g40, g80 = chain_log_norm(40), chain_log_norm(80)
    assert np.isclose((g80 - g40) / 40.0, rate, rtol=1e-6)
