"""PEPS Born machine: exact-likelihood parity, gradients, training.

Dense oracle: the engine's full state vector of a ``peps_tn`` grid
(row-major dangler order), as in ``test_peps_sample.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contractn_tpu.models.peps import peps_tn
from contractn_tpu.models.peps_born import (
    fit_peps_born,
    peps_born_machine,
    peps_born_nll,
    peps_log_amp2,
    peps_log_norm,
    peps_log_prob,
)


def _grid_arrays(grid, rows, cols):
    out = []
    for r in range(rows):
        row = []
        for c in range(cols):
            t = np.asarray(grid[r][c].tensor)
            t = np.moveaxis(t, -1, 0)
            if r == 0:
                t = t[:, None]
            if c == 0:
                t = t[:, :, None]
            if r == rows - 1:
                t = t[:, :, :, None]
            if c == cols - 1:
                t = t[..., None]
            row.append(jnp.asarray(t))
        out.append(row)
    return out


def _all_configs(n, d=2):
    idx = np.arange(d ** n)
    out = np.zeros((d ** n, n), np.int32)
    for k in range(n):
        out[:, n - 1 - k] = (idx // d ** k) % d
    return out


def test_log_prob_matches_dense():
    rng = np.random.default_rng(2)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 2, 3)
    psi = np.asarray(tn.contract(split_format=False)).reshape(-1)
    p = np.abs(psi) ** 2
    p /= p.sum()

    configs = _all_configs(6).reshape(-1, 2, 3)
    lp = np.asarray(peps_log_prob(arrs, jnp.asarray(configs), chi=16))
    assert np.max(np.abs(np.exp(lp) - p)) < 1e-12
    # probabilities sum to one: log Z is consistent with the amps
    assert abs(np.exp(lp).sum() - 1.0) < 1e-10


def test_log_norm_matches_dense():
    rng = np.random.default_rng(4)
    tn, grid = peps_tn(3, 2, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 3, 2)
    psi = np.asarray(tn.contract(split_format=False)).reshape(-1)
    want = np.log(np.sum(np.abs(psi) ** 2))
    got = float(peps_log_norm(arrs, chi=16))
    assert abs(got - want) < 1e-10


def test_nll_gradient_finite_difference():
    """d(NLL)/d(site tensor) via autodiff == central finite
    differences through the svd_safe sweeps."""
    rng = np.random.default_rng(6)
    tn, grid = peps_tn(2, 2, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 2, 2)
    data = jnp.asarray([[[0, 1], [1, 0]], [[0, 0], [1, 1]]],
                       jnp.int32)

    def loss(g):
        return peps_born_nll(g, data, 8)

    g = jax.grad(loss)(arrs)
    eps = 1e-6
    t = np.asarray(arrs[1][0])
    for idx in [(0, 0, 0, 0, 0), (1, 1, 0, 0, 0)]:
        tp, tm = t.copy(), t.copy()
        tp[idx] += eps
        tm[idx] -= eps
        ap = [row[:] for row in arrs]
        ap[1] = ap[1][:]
        ap[1][0] = jnp.asarray(tp)
        am = [row[:] for row in arrs]
        am[1] = am[1][:]
        am[1][0] = jnp.asarray(tm)
        fd = (float(loss(ap)) - float(loss(am))) / (2 * eps)
        assert abs(float(np.asarray(g[1][0])[idx]) - fd) < 1e-5, idx


def test_train_ghz_2x3_and_sample_back():
    """Learn the 2D GHZ distribution (all-0 / all-1, equal weight):
    NLL -> ln 2, and sampling the trained model returns only the two
    configurations."""
    from contractn_tpu.models.peps_sample import sample_peps

    data = jnp.stack([jnp.zeros((2, 3), jnp.int32),
                      jnp.ones((2, 3), jnp.int32)])
    grid = peps_born_machine(jax.random.PRNGKey(1), 2, 3, 2,
                             bond_dim=2)
    grid, losses = fit_peps_born(grid, data, steps=250, chi=8, lr=0.05)
    final = float(losses[-1])
    assert final < np.log(2) + 0.02, final

    samples, _ = sample_peps(grid, jax.random.PRNGKey(7), 64, chi=8)
    s = np.asarray(samples).reshape(64, -1)
    uniform = np.all(s == s[:, :1], axis=1)
    assert uniform.mean() > 0.95
    # both modes present
    heads = s[uniform, 0]
    assert 0.2 < heads.mean() < 0.8


def test_single_row_rejected():
    grid = peps_born_machine(jax.random.PRNGKey(0), 1, 4, 2, 2)
    with pytest.raises(ValueError):
        peps_log_norm(grid, 4)
