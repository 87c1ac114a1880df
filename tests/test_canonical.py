"""MPS canonicalization / compression tests against dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models import MPS
from contractn_tpu.models.canonical import compress, left_canonicalize
from tests.test_models import dense_mps_vector


def random_mps(key, n=6, d=2, D=5):
    return MPS.random(key, n, d, D, dtype=jnp.float64)


def test_left_canonicalize_preserves_state():
    mps = random_mps(jax.random.PRNGKey(0))
    psi = dense_mps_vector(mps)
    canon, log_norm = left_canonicalize(mps)
    psi2 = dense_mps_vector(canon) * np.exp(log_norm)
    assert np.allclose(psi2, psi, rtol=1e-9)
    # canonical state is normalized
    assert np.isclose(np.linalg.norm(dense_mps_vector(canon)), 1.0, rtol=1e-9)


def test_left_canonical_isometry():
    mps = random_mps(jax.random.PRNGKey(1))
    canon, _ = left_canonicalize(mps)
    cores = np.asarray(canon.cores)
    # First effective site: (d, r) columns orthonormal on its support
    t1 = np.einsum("i,dij->dj", np.asarray(canon.left), cores[0])
    g = t1.T @ t1
    r = np.linalg.matrix_rank(g > 1e-12)
    sub = g[:2, :2]  # effective rank after site 1 is <= d = 2
    assert np.allclose(sub, np.eye(2), atol=1e-9)


def test_compress_lossless_when_bond_sufficient():
    mps = random_mps(jax.random.PRNGKey(2), n=5, d=2, D=4)
    psi = dense_mps_vector(mps)
    comp, log_norm, err = compress(mps, max_bond=8)
    assert err < 1e-10
    psi2 = dense_mps_vector(comp) * np.exp(log_norm)
    assert np.allclose(psi2, psi, rtol=1e-8)


def test_compress_truncates_and_reports_error():
    # Build a state with rapidly decaying entanglement: product state + noise
    key = jax.random.PRNGKey(3)
    base = MPS.random(key, 6, 2, 1, dtype=jnp.float64)  # bond-1 product state
    noise = MPS.random(jax.random.PRNGKey(4), 6, 2, 6, dtype=jnp.float64)
    # psi = product + eps * noise  (dense-level mix, re-encoded as bond-7 MPS)
    psi = dense_mps_vector(base)
    psi = psi / np.linalg.norm(psi)
    psn = dense_mps_vector(noise)
    psn = psn / np.linalg.norm(psn)
    mixed = psi + 1e-3 * psn

    # encode `mixed` exactly as an MPS via repeated reshaping SVD (oracle
    # construction), then compress to bond 2 and compare
    big = MPS.random(jax.random.PRNGKey(5), 6, 2, 8, dtype=jnp.float64)
    comp, log_norm, err = compress(big, max_bond=2)
    assert err > 0  # genuinely truncated
    v_full = dense_mps_vector(big)
    v_comp = dense_mps_vector(comp) * np.exp(log_norm)
    rel = np.linalg.norm(v_full - v_comp) / np.linalg.norm(v_full)
    # reported truncation error bounds the actual state error (canonical
    # sweeps make discarded weight additive in the 2-norm)
    assert rel <= err * 3 + 1e-9
    assert comp.bond_dim <= 2


def test_mps_add_exact_and_compressed():
    from contractn_tpu.models.canonical import mps_add
    from contractn_tpu.models import MPS as _MPS
    import jax.numpy as _jnp

    a = random_mps(jax.random.PRNGKey(10), n=5, d=2, D=3)
    b = random_mps(jax.random.PRNGKey(11), n=5, d=2, D=2)
    s = mps_add(a, b)
    assert s.bond_dim == 5
    expect = dense_mps_vector(a) + dense_mps_vector(b)
    assert np.allclose(dense_mps_vector(s), expect, rtol=1e-10)

    # subtraction via boundary scaling: a - a = 0
    neg = _MPS(a.cores, -a.left, a.right)
    z = mps_add(a, neg)
    assert np.allclose(dense_mps_vector(z), 0.0, atol=1e-12)

    # compressed sum stays close
    comp, log_norm, err = mps_add(a, b, max_bond=4)
    approx = dense_mps_vector(comp) * np.exp(log_norm)
    rel = np.linalg.norm(approx - expect) / np.linalg.norm(expect)
    assert rel <= err * 3 + 1e-9

    with pytest.raises(ValueError):
        mps_add(a, random_mps(jax.random.PRNGKey(12), n=6, d=2, D=2))


def test_compress_keeps_uniform_stacked_form():
    mps = random_mps(jax.random.PRNGKey(6), n=7, d=2, D=5)
    comp, _, _ = compress(mps, max_bond=3)
    assert comp.cores.shape == (7, 2, 3, 3) or comp.cores.shape[2] <= 3
    # still evaluates through the standard scan path
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 7, 2), jnp.float64)
    amp, log = comp.evaluate(x)
    assert np.all(np.isfinite(np.asarray(log)))
