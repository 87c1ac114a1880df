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


def test_conditional_sampling_matches_dense():
    """sample_conditional: log_prob == dense log p(free | obs) on every
    drawn configuration, any gauge (no canonicalization requested)."""
    import jax

    from contractn_tpu.models.sampling import sample_conditional

    rng = np.random.default_rng(3)
    n = 6
    cores = rng.standard_normal((n, 2, 3, 3)) / np.sqrt(3)
    left = rng.standard_normal(3)
    right = rng.standard_normal(3)
    m = MPS(jnp.asarray(cores), jnp.asarray(left), jnp.asarray(right))

    # dense distribution
    psi = np.asarray(left)
    amps = psi[None, :]
    cfg_amp = np.ones((1,))
    # enumerate
    full = np.zeros(2 ** n)
    for idx in range(2 ** n):
        bits = [(idx >> (n - 1 - k)) & 1 for k in range(n)]
        v = np.asarray(left)
        for k in range(n):
            v = v @ cores[k, bits[k]]
        full[idx] = float(v @ right)
    p = full ** 2 / np.sum(full ** 2)

    obs = np.array([-1, 1, -1, -1, 0, -1], np.int32)
    samples, lp = sample_conditional(m, jax.random.PRNGKey(2), 32,
                                     jnp.asarray(obs))
    s = np.asarray(samples)
    assert np.all(s[:, 1] == 1) and np.all(s[:, 4] == 0)
    flat = np.zeros(32, np.int64)
    for k in range(n):
        flat = flat * 2 + s[:, k]
    mask = np.ones(2 ** n, bool)
    for idx in range(2 ** n):
        bits = [(idx >> (n - 1 - k)) & 1 for k in range(n)]
        mask[idx] = bits[1] == 1 and bits[4] == 0
    p_obs = p[mask].sum()
    want = np.log(p[flat]) - np.log(p_obs)
    assert np.max(np.abs(np.asarray(lp) - want)) < 1e-10


def test_conditional_ghz_future_observation():
    """Observing only the LAST site of a GHZ chain must force every
    earlier (free) site — the case plain clamping gets wrong."""
    import jax

    from contractn_tpu.models.sampling import sample_conditional

    n = 8
    cores = np.zeros((n, 2, 2, 2))
    for i in range(n):
        cores[i, 0, 0, 0] = 1.0
        cores[i, 1, 1, 1] = 1.0
    m = MPS(jnp.asarray(cores), jnp.asarray(np.ones(2)),
            jnp.asarray(np.ones(2)))
    obs = -np.ones(n, np.int32)
    obs[-1] = 1
    s, lp = sample_conditional(m, jax.random.PRNGKey(0), 12,
                               jnp.asarray(obs))
    assert np.all(np.asarray(s) == 1)
    assert np.max(np.abs(np.asarray(lp))) < 1e-12
