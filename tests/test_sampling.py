"""Born-machine sampling: exactness checks against dense probabilities."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS
from contractn_tpu.models.canonical import right_canonicalize
from contractn_tpu.models.sampling import sample, sample_canonical
from tests.test_models import dense_mps_vector


def test_right_canonicalize_preserves_state():
    mps = MPS.random(jax.random.PRNGKey(0), 5, 2, 4, dtype=jnp.float64)
    psi = dense_mps_vector(mps)
    rc, log_norm = right_canonicalize(mps)
    psi2 = dense_mps_vector(rc) * np.exp(log_norm)
    assert np.allclose(psi2, psi, rtol=1e-9)
    assert np.isclose(np.linalg.norm(dense_mps_vector(rc)), 1.0, rtol=1e-9)


def test_sample_logp_matches_dense():
    """Reported log p(x) equals 2 log|psi(x)| - log <psi|psi> exactly."""
    mps = MPS.random(jax.random.PRNGKey(1), 6, 2, 3, dtype=jnp.float64)
    psi = dense_mps_vector(mps)
    probs = psi ** 2 / np.sum(psi ** 2)

    samples, logp = sample(mps, jax.random.PRNGKey(2), 64)
    samples = np.asarray(samples)
    assert samples.shape == (64, 6)
    # config index in the row-major enumeration used by dense_mps_vector
    idx = np.zeros(64, np.int64)
    for site in range(6):
        idx = idx * 2 + samples[:, site]
    assert np.allclose(np.asarray(logp), np.log(probs[idx]), rtol=1e-8)


def test_sample_distribution_statistics():
    """Empirical frequencies approach the dense distribution."""
    mps = MPS.random(jax.random.PRNGKey(3), 4, 2, 2, dtype=jnp.float64)
    psi = dense_mps_vector(mps)
    probs = psi ** 2 / np.sum(psi ** 2)
    n = 20000
    samples, _ = sample(mps, jax.random.PRNGKey(4), n)
    samples = np.asarray(samples)
    idx = np.zeros(n, np.int64)
    for site in range(4):
        idx = idx * 2 + samples[:, site]
    freq = np.bincount(idx, minlength=16) / n
    # 3-sigma multinomial tolerance per bin
    sigma = np.sqrt(probs * (1 - probs) / n)
    assert np.all(np.abs(freq - probs) < 5 * sigma + 1e-3)


def test_sample_canonical_reuse():
    mps = MPS.random(jax.random.PRNGKey(5), 5, 3, 3, dtype=jnp.float64)
    rc, _ = right_canonicalize(mps)
    s1, lp1 = sample_canonical(rc, jax.random.PRNGKey(6), 8)
    assert s1.shape == (8, 5)
    assert np.all((np.asarray(s1) >= 0) & (np.asarray(s1) < 3))
    assert np.all(np.isfinite(np.asarray(lp1)))
