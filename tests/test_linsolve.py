"""Two-site ALS linear solver vs dense oracles.

Exact-manifold solves must reproduce ``np.linalg.solve`` entrywise at
machine precision; the quantics screened-Poisson demo pins the PDE
route end-to-end.  ``linear_residual`` contracts ``||Ax - b||``
directly, so its floor is the f64 cancellation scale ``~sqrt(eps)
cond-ish`` — the entrywise checks are the strict ones.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.linsolve import (
    linear_residual,
    mps_linear_solve,
    normal_equations,
)
from contractn_tpu.models.mpo import MPO, mpo_dagger, mpo_multiply, mpo_sum
from contractn_tpu.models.mps import MPS
from contractn_tpu.models.quantics import (
    function_mps,
    grid,
    laplacian_mpo,
    quantics_to_dense,
)

from test_quantics import _mpo_dense
from test_mpo_evolution import _mps_dense


def _scaled_identity(n, c):
    ident = MPO.identity(n, 2)
    return MPO(ident.cores, c * ident.left, ident.right)


def test_hpd_solve_matches_dense():
    n = 5
    b_raw = MPO.random(jax.random.PRNGKey(0), n, 2, 3, dtype=jnp.float64)
    a_mpo = mpo_sum(mpo_multiply(mpo_dagger(b_raw), b_raw),
                    _scaled_identity(n, 0.5))
    ad = _mpo_dense(a_mpo, n)
    assert np.linalg.eigvalsh(ad)[0] > 0.4  # genuinely PD
    b = MPS.random(jax.random.PRNGKey(1), n, 2, 4, dtype=jnp.float64)
    x, locals_ = mps_linear_solve(a_mpo, b, sweeps=6, max_bond=16)
    x_exact = np.linalg.solve(ad, _mps_dense(b))
    assert np.max(np.abs(_mps_dense(x) - x_exact)) < 1e-12
    assert locals_[-1] < 1e-12
    assert linear_residual(a_mpo, x, b) < 1e-6


def test_quantics_screened_poisson():
    # (-Laplacian + m^2) u = sin(2 pi x) on the periodic 2^8 grid:
    # the discrete dense solve is the oracle; the MPS solve matches it
    # entrywise at bond 8.
    nb = 8
    xg = grid(nb)
    f = function_mps(np.sin(2 * np.pi * xg), nb, cutoff=1e-13)
    lap = laplacian_mpo(nb)
    a_pois = mpo_sum(MPO(lap.cores, -lap.left, lap.right),
                     _scaled_identity(nb, 10.0))
    u_exact = np.linalg.solve(_mpo_dense(a_pois, nb),
                              np.sin(2 * np.pi * xg))
    u, _ = mps_linear_solve(a_pois, f, sweeps=8, max_bond=8)
    assert np.max(np.abs(quantics_to_dense(u) - u_exact)) < 1e-10
    # and the continuum check: u -> f / ((2 pi)^2 + m^2) + O(h^2)
    cont = np.sin(2 * np.pi * xg) / ((2 * np.pi) ** 2 + 10.0)
    assert np.max(np.abs(u_exact - cont)) < 1e-3


def test_general_system_via_normal_equations():
    n = 5
    g_mpo = mpo_sum(MPO.random(jax.random.PRNGKey(5), n, 2, 2,
                               dtype=jnp.float64),
                    _scaled_identity(n, 0.8))
    gd = _mpo_dense(g_mpo, n)
    assert np.max(np.abs(gd - gd.T)) > 1e-3  # genuinely non-symmetric
    b = MPS.random(jax.random.PRNGKey(1), n, 2, 4, dtype=jnp.float64)
    nrm_op, nrm_b = normal_equations(g_mpo, b)
    x, _ = mps_linear_solve(nrm_op, nrm_b, sweeps=8, max_bond=16)
    x_exact = np.linalg.solve(gd, _mps_dense(b))
    assert np.max(np.abs(_mps_dense(x) - x_exact)) < 1e-12
    assert linear_residual(g_mpo, x, b) < 1e-6
