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


def test_aklt_string_correlator_decay():
    """AKLT <Sz Sz> connected correlator: exact closed form
    C(x) = (4/3) * (-1/3)^x  (spin-1, standard convention)."""
    from contractn_tpu.models.umps import correlate

    szop = np.diag([1.0, 0.0, -1.0])
    dists = [1, 2, 3, 5]
    got = correlate(aklt_core(), szop, szop, dists, iters=400)
    want = [(4.0 / 3.0) * (-1.0 / 3.0) ** x for x in dists]
    assert np.allclose(got, want, rtol=1e-7), (got, want)


def test_correlator_matches_dense_transfer_algebra():
    """correlate() against the explicit dense transfer-matrix formula
    (the operator need not couple to the lam2 mode, so we check values,
    not just decay rates)."""
    from contractn_tpu.models.umps import correlate, transfer_spectrum

    key = jax.random.PRNGKey(9)
    raw = 0.6 * jax.random.normal(key, (2, 5, 5), jnp.float64)
    core = 0.5 * (raw + raw.swapaxes(1, 2))
    a = np.asarray(core)
    d, bond = a.shape[0], a.shape[1]
    op = np.array([[1.0, 0.3], [0.3, -1.0]])

    spec = transfer_spectrum(core, iters=800)
    lam1 = spec["lam1"]
    lv = np.asarray(spec["l"]).reshape(-1)
    rv = np.asarray(spec["r"]).reshape(-1)

    t_mat = sum(np.kron(a[s], a[s]) for s in range(d))
    t_op = sum(op[s, t] * np.kron(a[t], a[s])
               for s in range(d) for t in range(d))
    norm = lv @ rv
    e_one = lv @ t_op @ rv / (lam1 * norm)

    dists = [1, 3, 6]
    got = correlate(core, op, op, dists, iters=800)
    for x, g in zip(dists, got):
        raw_val = lv @ t_op @ np.linalg.matrix_power(t_mat, x - 1) \
            @ t_op @ rv / (lam1 ** (x + 1) * norm)
        assert np.isclose(g, raw_val - e_one ** 2, rtol=1e-8), (x, g)
