"""Real-space parallel DMRG vs the serial uniform solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contractn_tpu.models.dmrg import heisenberg_mpo, tfim_mpo
from contractn_tpu.models.ensemble import dmrg_uniform
from contractn_tpu.models.mpo import rayleigh
from contractn_tpu.models.mps import MPS
from contractn_tpu.parallel.mesh import make_mesh
from contractn_tpu.parallel.rs_dmrg import dmrg_realspace


def test_tfim_matches_serial_optimum():
    """4 parallel windows converge to the serial dmrg_uniform energy
    (same bond, same Lanczos depth) — the S-W stitch reproduces the
    true variational optimum, not a nearby fixed point."""
    n, bond = 16, 8
    mpo = tfim_mpo(n, j=1.0, h=1.3)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, bond,
                      dtype=jnp.float64)
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    m, e, es = dmrg_realspace(mesh, mpo, mps0, outer_iters=14,
                              lanczos_iters=30, final_sweeps=1)
    _, e_ser, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=30)
    got = rayleigh(mpo, m)
    assert abs(got - float(e_ser)) < 1e-8, (got, float(e_ser))
    assert abs(float(e) - float(e_ser)) < 1e-8
    # the PARALLEL phase alone carries the state to ~1e-3 of the
    # optimum (the stitch-limited plateau documented in the module)
    assert float(es[-1]) - float(e_ser) < 5e-2


def test_heisenberg_two_windows():
    n, bond = 12, 10
    mpo = heisenberg_mpo(n)
    mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, bond,
                      dtype=jnp.float64)
    mesh = make_mesh({"sp": 2}, devices=jax.devices()[:2])
    m, _, _ = dmrg_realspace(mesh, mpo, mps0, outer_iters=12,
                             lanczos_iters=30, final_sweeps=2)
    _, e_ser, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=30)
    # critical chain: the parallel trace oscillates between parities;
    # two polish sweeps land within 1e-6 of the serial optimum
    assert abs(rayleigh(mpo, m) - float(e_ser)) < 1e-6


def test_validation():
    mpo = tfim_mpo(10)
    mps0 = MPS.random(jax.random.PRNGKey(0), 10, 2, 4,
                      dtype=jnp.float64)
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    with pytest.raises(ValueError):  # 10 % 4 != 0
        dmrg_realspace(mesh, mpo, mps0)
    mpo8 = tfim_mpo(8)
    mps8 = MPS.random(jax.random.PRNGKey(0), 8, 2, 4,
                      dtype=jnp.float64)
    mesh8 = make_mesh({"sp": 8})
    with pytest.raises(ValueError):  # 1 site per window
        dmrg_realspace(mesh8, mpo8, mps8)


def test_parallel_phase_raw_plateau():
    """seg=6 windows, NO polish: the raw parallel iterations carry a
    random state to the stitch-limited plateau (within 1e-3 of the
    serial optimum; seed-dependent — some seeds reach 1e-11, pinned
    only to the guaranteed level)."""
    n, bond = 24, 8
    mpo = tfim_mpo(n, j=1.0, h=1.3)
    mps0 = MPS.random(jax.random.PRNGKey(3), n, 2, bond,
                      dtype=jnp.float64)
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    m, _, _ = dmrg_realspace(mesh, mpo, mps0, outer_iters=26,
                             lanczos_iters=30, final_sweeps=0)
    _, e_ser, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=30)
    gap = rayleigh(mpo, m) - float(e_ser)
    assert 0 <= gap < 1e-3, gap


def test_eight_windows_minimal_segments():
    """seg=2 (every window one interior bond): still lands on the
    optimum with one polish sweep (gapped phase — the h<1 ordered
    quasi-doublet is a known sticking regime for ANY local solver)."""
    n, bond = 16, 6
    mpo = tfim_mpo(n, j=1.0, h=1.3)
    mps0 = MPS.random(jax.random.PRNGKey(3), n, 2, bond,
                      dtype=jnp.float64)
    mesh8 = make_mesh({"sp": 8})
    m, e, _ = dmrg_realspace(mesh8, mpo, mps0, outer_iters=16,
                             lanczos_iters=25, final_sweeps=1)
    _, e_ser, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=25)
    assert abs(float(e) - float(e_ser)) < 1e-7
