"""Correction-vector dynamical DMRG vs the dense Lehmann representation.

The oracle diagonalizes the dense Hamiltonian and evaluates both the
broadened spectral function and the full complex resolvent matrix
element exactly — completely independent of the MPO-squaring + ALS
linear-solve pipeline under test.
"""

import numpy as np
import jax
import pytest

from contractn_tpu.models import dynamical as dyn
from contractn_tpu.models.dmrg import dmrg, tfim_mpo
from contractn_tpu.models.mps import MPS

_Z = np.diag([1.0, -1.0])


def _dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


@pytest.fixture(scope="module")
def tfim_setup():
    n, h = 6, 1.2
    mpo = tfim_mpo(n, h=h)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, 12, dtype=np.float64)
    gs, e0, _ = dmrg(mpo, mps0, max_bond=12, sweeps=5)
    ham = _dense(mpo, n)
    evals, evecs = np.linalg.eigh(ham)
    assert abs(evals[0] - e0) < 1e-9
    return n, mpo, gs, e0, evals, evecs


def test_cv_greens_function_matches_dense_resolvent(tfim_setup):
    n, mpo, gs, e0, evals, evecs = tfim_setup
    site, eta = 2, 0.3
    b_full = np.eye(1)
    for j in range(n):
        b_full = np.kron(b_full, _Z if j == site else np.eye(2))
    b = np.dot(b_full, evecs[:, 0])
    amp = np.dot(evecs.T, b)
    omegas = np.array([0.0, 1.0, 2.5, 4.0])
    g_exact = np.array([
        np.sum(amp**2 / (w + evals[0] - evals + 1j * eta))
        for w in omegas
    ])

    g = dyn.cv_greens_function(mpo, gs, e0, _Z, site, omegas, eta,
                               max_bond=16, sweeps=8, compress_bond=24)
    assert np.max(np.abs(g - g_exact)) < 1e-8

    s = dyn.cv_spectral_function(mpo, gs, e0, _Z, site, omegas, eta,
                                 max_bond=16, sweeps=8,
                                 compress_bond=24)
    assert np.max(np.abs(s - (-g_exact.imag / np.pi))) < 1e-9


def test_correction_vector_warm_start_reuses_solution(tfim_setup):
    n, mpo, gs, e0, evals, evecs = tfim_setup
    b = dyn.apply_site_operator(gs, _Z, 1)
    y, g1 = dyn.correction_vector(mpo, e0, b, 1.5, 0.4, max_bond=16,
                                  sweeps=8, compress_bond=24)
    # re-solving the SAME frequency from the converged vector changes
    # nothing (the warm start is a fixed point of the sweeps)
    _, g2 = dyn.correction_vector(mpo, e0, b, 1.5, 0.4, max_bond=16,
                                  sweeps=2, compress_bond=24, x0=y)
    assert abs(g1 - g2) < 1e-9


def test_batched_grid_matches_sequential_and_lehmann(tfim_setup):
    n, mpo, gs, e0, evals, evecs = tfim_setup
    site, eta = 2, 0.35
    omegas = np.array([0.5, 2.0, 3.5])
    b_full = np.eye(1)
    for j in range(n):
        b_full = np.kron(b_full, _Z if j == site else np.eye(2))
    b = np.dot(b_full, evecs[:, 0])
    amp = np.dot(evecs.T, b)
    g_exact = np.array([
        np.sum(amp**2 / (w + evals[0] - evals + 1j * eta))
        for w in omegas
    ])
    g_bat = dyn.cv_greens_function_batched(
        mpo, gs, e0, _Z, site, omegas, eta, max_bond=16, sweeps=7,
        cg_iters=48,
    )
    assert np.max(np.abs(g_bat - g_exact)) < 1e-7


def test_apply_site_operator_is_exact():
    mps = MPS.random(jax.random.PRNGKey(1), 4, 2, 3, dtype=np.float64)
    out = dyn.apply_site_operator(mps, _Z, 2)
    # <psi| Z_2 |psi> via inner == expectation of the modified state
    v, log = mps.inner(out)
    n2, nl = mps.norm_squared()
    val = float(v) * np.exp(float(log) - float(nl)) / float(n2)
    assert -1.0 - 1e-12 <= val <= 1.0 + 1e-12
