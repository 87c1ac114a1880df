"""MPS Born machines vs dense enumeration oracles.

``mps_log_prob`` must reproduce the dense Born distribution exactly,
and exact-likelihood training must recover a known target distribution
(GHZ: half the mass on each of two basis strings).  The reference has
no learning loop (SURVEY.md section 2; its paper is a QTNML workshop
submission without training code).
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS
from contractn_tpu.models.born import (
    born_machine,
    born_nll,
    fit_born_machine,
    mps_log_prob,
)
from contractn_tpu.models.sampling import sample


def _configs(n):
    return jnp.asarray(np.array(np.meshgrid(
        *[[0, 1]] * n, indexing="ij")).reshape(n, -1).T)


def test_log_prob_matches_dense_enumeration():
    n = 6
    m = born_machine(jax.random.PRNGKey(2), n, 2, 4)
    configs = _configs(n)
    p = np.exp(np.asarray(mps_log_prob(m, configs)))
    assert abs(p.sum() - 1.0) < 1e-12

    cores = np.asarray(m.cores)
    left, right = np.asarray(m.left), np.asarray(m.right)
    amps = []
    for c in np.asarray(configs):
        v = left
        for i, x in enumerate(c):
            v = v @ cores[i, x]
        amps.append(v @ right)
    amps = np.array(amps)
    pd = amps ** 2 / (amps ** 2).sum()
    assert np.abs(p - pd).max() < 1e-12

    nll = float(born_nll(m, configs[:7]))
    assert abs(nll + np.log(p[:7]).mean()) < 1e-12


def test_exact_ml_training_recovers_ghz():
    n = 6
    ghz = np.zeros(2 ** n)
    ghz[0] = 1.0
    ghz[-1] = 1.0
    target = MPS.from_dense(jnp.asarray(ghz) / np.sqrt(2.0), 2)
    data, _ = sample(target, jax.random.PRNGKey(1), 2000)

    model = born_machine(jax.random.PRNGKey(5), n, 2, 4)
    model, losses = fit_born_machine(model, data, steps=800, lr=0.02)
    assert float(losses[-1]) < float(losses[0])
    # optimum NLL = entropy of the (empirical) GHZ distribution ~ ln 2
    assert abs(float(losses[-1]) - np.log(2)) < 2e-3

    p = np.exp(np.asarray(mps_log_prob(model, _configs(n))))
    assert 0.45 < p[0] < 0.55 and 0.45 < p[-1] < 0.55
    assert p[1:-1].sum() < 1e-3


def test_minibatch_training_improves_nll():
    n = 6
    ghz = np.zeros(2 ** n)
    ghz[0] = 1.0
    ghz[-1] = 1.0
    target = MPS.from_dense(jnp.asarray(ghz) / np.sqrt(2.0), 2)
    data, _ = sample(target, jax.random.PRNGKey(3), 1024)
    model = born_machine(jax.random.PRNGKey(7), n, 2, 4)
    model, losses = fit_born_machine(model, data, steps=200, batch=128,
                                     lr=0.02, key=jax.random.PRNGKey(9))
    assert float(born_nll(model, data)) < float(losses[0]) - 1.0
