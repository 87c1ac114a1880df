"""Direct PEPS sampling vs the dense Born distribution.

The dense oracle is the framework's own engine: ``peps_tn`` grids
contract to the full state vector (dangler order = creation order =
row-major sites), so each drawn sample's ``log_prob`` can be pinned
against ``log |psi[s]|^2 / <psi|psi>`` exactly, and empirical
frequencies against the exact Born weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contractn_tpu.models.peps import peps_tn
from contractn_tpu.models.peps_sample import sample_peps


def _grid_arrays(grid, rows, cols):
    """Node tensors (up?, left?, down?, right?, phys) -> (d,u,l,dn,r)
    with explicit size-1 boundary axes."""
    out = []
    for r in range(rows):
        row = []
        for c in range(cols):
            t = np.asarray(grid[r][c].tensor)
            t = np.moveaxis(t, -1, 0)  # phys first
            if r == 0:
                t = t[:, None]
            if c == 0:
                t = t[:, :, None]
            if r == rows - 1:
                t = t[:, :, :, None]
            if c == cols - 1:
                t = t[..., None]
            row.append(t)
        out.append(row)
    return out


def _dense_probs(tn):
    psi = np.asarray(tn.contract(split_format=False)).reshape(-1)
    p = np.abs(psi) ** 2
    return p / p.sum()


def _flat_index(samples, d):
    """Row-major flat index of (rows, cols) int samples."""
    s = np.asarray(samples).reshape(samples.shape[0], -1)
    idx = np.zeros(s.shape[0], dtype=np.int64)
    for k in range(s.shape[1]):
        idx = idx * d + s[:, k]
    return idx


def test_log_prob_matches_dense_3x3():
    """Every drawn sample's log_prob == dense log Born weight at exact
    chi (3x3, D=2: half-plane boundary rank <= (D^2)^2 = 16)."""
    rng = np.random.default_rng(3)
    tn, grid = peps_tn(3, 3, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 3, 3)
    p = _dense_probs(tn)

    samples, log_probs = sample_peps(arrs, jax.random.PRNGKey(0),
                                     num_samples=32, chi=16)
    samples = np.asarray(samples)
    log_probs = np.asarray(log_probs)
    assert samples.shape == (32, 3, 3)
    idx = _flat_index(samples, 2)
    want = np.log(p[idx])
    assert np.max(np.abs(log_probs - want)) < 1e-10


def test_log_prob_matches_dense_complex():
    rng = np.random.default_rng(5)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    for row in grid:
        for node in row:
            t = np.asarray(node.tensor)
            node.tensor = t + 1j * rng.standard_normal(t.shape)
    arrs = _grid_arrays(grid, 2, 3)
    p = _dense_probs(tn)

    samples, log_probs = sample_peps(arrs, jax.random.PRNGKey(1),
                                     num_samples=24, chi=16)
    idx = _flat_index(np.asarray(samples), 2)
    want = np.log(p[idx])
    assert np.max(np.abs(np.asarray(log_probs) - want)) < 1e-10


def test_empirical_frequencies_2x2():
    """Empirical frequencies over 4000 samples match the exact Born
    weights within 5 sigma per configuration (deterministic key)."""
    rng = np.random.default_rng(11)
    tn, grid = peps_tn(2, 2, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 2, 2)
    p = _dense_probs(tn)

    n = 4000
    samples, _ = sample_peps(arrs, jax.random.PRNGKey(2),
                             num_samples=n, chi=8)
    idx = _flat_index(np.asarray(samples), 2)
    counts = np.bincount(idx, minlength=p.size)
    sigma = np.sqrt(np.maximum(p * (1 - p) / n, 1e-12))
    dev = np.abs(counts / n - p) / sigma
    assert np.max(dev) < 5.0, (counts / n, p)


def test_phys_dim_3_and_nonsquare():
    """d=3 on a 2x3 grid: log_prob still dense-exact."""
    rng = np.random.default_rng(17)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=3, rng=rng)
    arrs = _grid_arrays(grid, 2, 3)
    p = _dense_probs(tn)

    samples, log_probs = sample_peps(arrs, jax.random.PRNGKey(3),
                                     num_samples=16, chi=16)
    idx = _flat_index(np.asarray(samples), 3)
    want = np.log(p[idx])
    assert np.max(np.abs(np.asarray(log_probs) - want)) < 1e-10
    assert np.asarray(samples).max() <= 2


def test_single_row_equals_mps_sampling():
    """A 1xN grid is an MPS: sampler log_probs are dense-exact and the
    whole batch is one jitted program (smoke: runs under jit)."""
    rng = np.random.default_rng(23)
    tn, grid = peps_tn(1, 5, bond_dim=3, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 1, 5)
    p = _dense_probs(tn)

    samples, log_probs = sample_peps(arrs, jax.random.PRNGKey(4),
                                     num_samples=16, chi=9)
    idx = _flat_index(np.asarray(samples), 2)
    want = np.log(p[idx])
    assert np.max(np.abs(np.asarray(log_probs) - want)) < 1e-10


def test_grid_validation():
    bad = [[jnp.ones((2, 2, 1, 1, 1))]]  # up dim != 1 on row 0
    with pytest.raises(ValueError):
        sample_peps(bad, jax.random.PRNGKey(0), 1, 4)


def test_conditional_sampling_matches_dense():
    """Inpainting: observed sites pinned, free-site draws from the
    exact conditional — every sample's log_prob == dense
    log p(free | obs), and observed values are copied in."""
    rng = np.random.default_rng(31)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    arrs = _grid_arrays(grid, 2, 3)
    p = _dense_probs(tn)

    obs = -np.ones((2, 3), np.int32)
    obs[0, 1] = 1
    obs[1, 2] = 0
    samples, log_probs = sample_peps(arrs, jax.random.PRNGKey(5), 40,
                                     chi=16, observed=jnp.asarray(obs))
    s = np.asarray(samples)
    assert np.all(s[:, 0, 1] == 1) and np.all(s[:, 1, 2] == 0)

    # dense conditional
    idx_all = _flat_index(
        _all_cfgs := np.stack(np.meshgrid(
            *[[0, 1]] * 6, indexing="ij"), -1).reshape(-1, 6), 2)
    cfgs = _all_cfgs.reshape(-1, 2, 3)
    consistent = (cfgs[:, 0, 1] == 1) & (cfgs[:, 1, 2] == 0)
    p_obs = p[idx_all[consistent]].sum()
    want = np.log(p[_flat_index(s, 2)]) - np.log(p_obs)
    assert np.max(np.abs(np.asarray(log_probs) - want)) < 1e-10


def test_conditional_ghz_future_observation():
    """GHZ-like PEPS with ONE corner observed: plain clamping would
    sample the opposite mode half the time; the conditional sampler
    must force the whole lattice."""
    rows, cols = 2, 2
    grid = []
    for r in range(rows):
        row = []
        for c in range(cols):
            u = 2 if r > 0 else 1
            l = 2 if c > 0 else 1
            dn = 2 if r < rows - 1 else 1
            rr = 2 if c < cols - 1 else 1
            t = np.zeros((2, u, l, dn, rr))
            t[(0,) + (0,) * 4] = 1.0
            t[(1,) + tuple(min(1, x - 1) for x in (u, l, dn, rr))] = 1.0
            row.append(jnp.asarray(t))
        grid.append(row)
    obs = -np.ones((2, 2), np.int32)
    obs[1, 1] = 1  # the LAST site in raster order
    samples, log_probs = sample_peps(grid, jax.random.PRNGKey(9), 16,
                                     chi=4, observed=jnp.asarray(obs))
    s = np.asarray(samples).reshape(16, -1)
    assert np.all(s == 1)
    assert np.max(np.abs(np.asarray(log_probs))) < 1e-10
