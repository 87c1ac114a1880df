"""Single-site DMRG with subspace expansion vs exact diagonalization."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS, dmrg3s, heisenberg_mpo, tfim_mpo
from tests.test_dmrg import dense_heisenberg, dense_tfim


def test_dmrg3s_grows_bond_and_matches_exact_tfim():
    """Start at bond 2, cap at 8: plain single-site DMRG cannot grow a
    bond at all — the subspace expansion must, and the energy must reach
    exact diagonalization."""
    n = 8
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, 2, dtype=jnp.float64)
    ground, energy, trace = dmrg3s(
        tfim_mpo(n), mps0, max_bond=8, sweeps=8, mixing=1e-2, decay=0.3
    )
    assert ground.bond_dim == 8  # the bond actually grew
    assert np.isclose(energy, e_exact, rtol=1e-7), (energy, e_exact)
    # the returned state reproduces the energy through independent code
    v, log = tfim_mpo(n).expectation(ground)
    nv, nl = ground.norm_squared()
    e_check = (float(v) * np.exp(float(log))) / (
        float(nv) * np.exp(float(nl))
    )
    assert np.isclose(e_check, e_exact, rtol=1e-6)


def test_dmrg3s_heisenberg_matches_exact():
    n = 6
    e_exact = float(np.linalg.eigvalsh(dense_heisenberg(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, 2, dtype=jnp.float64)
    _, energy, _ = dmrg3s(
        heisenberg_mpo(n), mps0, max_bond=8, sweeps=10, mixing=3e-2,
        decay=0.3,
    )
    assert np.isclose(energy, e_exact, rtol=1e-7), (energy, e_exact)


def test_dmrg3s_lanczos_path_large_bond():
    """Bond 24 pushes the one-site problem past the dense limit
    (2 * 24 * 24 = 1152 > 1024): the device-side Lanczos solver engages."""
    n = 8
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(2), n, 2, 8, dtype=jnp.float64)
    _, energy, _ = dmrg3s(
        tfim_mpo(n), mps0, max_bond=24, sweeps=6, mixing=1e-2, decay=0.3,
        lanczos_iters=30,
    )
    assert np.isclose(energy, e_exact, rtol=1e-7), (energy, e_exact)


def test_dmrg3s_energy_trace_decreases():
    n = 8
    mps0 = MPS.random(jax.random.PRNGKey(3), n, 2, 4, dtype=jnp.float64)
    _, _, trace = dmrg3s(tfim_mpo(n), mps0, max_bond=8, sweeps=6)
    assert trace[-1] <= trace[0] + 1e-10
