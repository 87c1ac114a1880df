"""Uniform-shape jitted DMRG and vmapped Hamiltonian-ensemble sweeps."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import (
    MPS,
    dmrg,
    dmrg_ensemble,
    dmrg_uniform,
    heisenberg_mpo,
    stack_pytrees,
    tfim_mpo,
)
from tests.test_dmrg import dense_heisenberg, dense_tfim


def test_dmrg_uniform_matches_exact_tfim():
    n = 6
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, 8, dtype=jnp.float64)
    ground, energy, trace = dmrg_uniform(tfim_mpo(n), mps0, sweeps=3)
    assert np.isclose(float(energy), e_exact, rtol=1e-8)
    assert trace.shape == (3,)
    assert float(trace[-1]) == float(energy)
    # The returned state reproduces the energy through the MPO machinery
    v, log = tfim_mpo(n).expectation(ground)
    nv, nl = ground.norm_squared()
    e_check = (float(v) * np.exp(float(log))) / (
        float(nv) * np.exp(float(nl))
    )
    assert np.isclose(e_check, e_exact, rtol=1e-7)


def test_dmrg_uniform_matches_ragged_dmrg_heisenberg():
    """Same optimization as the ragged host-loop sweep, to tight tolerance."""
    n = 6
    e_exact = float(np.linalg.eigvalsh(dense_heisenberg(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(2), n, 2, 8, dtype=jnp.float64)
    _, e_ragged, _ = dmrg(heisenberg_mpo(n), mps0, max_bond=8, sweeps=3)
    _, e_uniform, _ = dmrg_uniform(heisenberg_mpo(n), mps0, sweeps=3)
    assert np.isclose(float(e_uniform), e_exact, rtol=1e-8)
    assert np.isclose(float(e_uniform), e_ragged, rtol=1e-8)


def test_dmrg_uniform_truncated_is_variational():
    n = 8
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(3), n, 2, 4, dtype=jnp.float64)
    _, energy, _ = dmrg_uniform(tfim_mpo(n), mps0, sweeps=3)
    assert float(energy) >= e_exact - 1e-10
    assert float(energy) - e_exact < 1e-3


def test_dmrg_ensemble_field_scan_matches_exact():
    """A transverse-field scan solved as ONE vmapped program matches
    per-field exact diagonalization."""
    n, bond = 6, 8
    hs = [0.5, 1.0, 1.5]
    mpos = stack_pytrees([tfim_mpo(n, h=h) for h in hs])
    keys = jax.random.split(jax.random.PRNGKey(0), len(hs))
    mps0s = stack_pytrees([
        MPS.random(k, n, 2, bond, dtype=jnp.float64) for k in keys
    ])
    grounds, energies, traces = dmrg_ensemble(mpos, mps0s, sweeps=3)
    assert energies.shape == (len(hs),)
    assert traces.shape == (len(hs), 3)
    assert grounds.cores.shape == (len(hs), n, 2, bond, bond)
    for k, h in enumerate(hs):
        e_exact = float(np.linalg.eigvalsh(dense_tfim(n, h=h))[0])
        assert np.isclose(float(energies[k]), e_exact, rtol=1e-8), h
    # Each batched ground state evaluates correctly through the MPO
    for k, h in enumerate(hs):
        g = MPS(grounds.cores[k], grounds.left[k], grounds.right[k])
        v, log = tfim_mpo(n, h=h).expectation(g)
        nv, nl = g.norm_squared()
        e_check = (float(v) * np.exp(float(log))) / (
            float(nv) * np.exp(float(nl))
        )
        e_exact = float(np.linalg.eigvalsh(dense_tfim(n, h=h))[0])
        assert np.isclose(e_check, e_exact, rtol=1e-6), h


def test_dmrg_uniform_rejects_single_site():
    mps0 = MPS.random(jax.random.PRNGKey(0), 1, 2, 4, dtype=jnp.float64)
    try:
        dmrg_uniform(tfim_mpo(1), mps0)
    except ValueError as e:
        assert "2 sites" in str(e)
    else:
        raise AssertionError("expected ValueError for n_sites < 2")


def test_stack_pytrees_rejects_empty():
    try:
        stack_pytrees([])
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for empty list")
