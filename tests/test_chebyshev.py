"""Kernel-polynomial (Chebyshev MPS) spectral functions vs dense ED.

The moments are pinned to the dense Chebyshev recursion at near
machine precision — that validates the rescaled MPO, the MPS
recurrence, and the compression scale-keeping all at once; the
reconstruction is then checked through its exact integral identities
(sum rule, positivity, spectral mean).
"""

import jax
import numpy as np

from contractn_tpu.models import dmrg, tfim_mpo
from contractn_tpu.models.chebyshev import (
    chebyshev_moments,
    jackson_kernel,
    spectral_function,
)
from contractn_tpu.models.mps import MPS

from test_lindblad import X, Z, _site_op


def test_kpm_spectral_function_dense_parity():
    n = 6
    h = 1.2
    mpo = tfim_mpo(n, h=h)
    gs, e0, _ = dmrg(mpo, MPS.random(jax.random.PRNGKey(0), n, 2, 8),
                     max_bond=16, sweeps=6)
    e0 = float(np.real(e0))

    hd = np.zeros((2**n, 2**n))
    for i in range(n - 1):
        hd -= _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    for i in range(n):
        hd -= h * _site_op(X, i, n)
    evals, evecs = np.linalg.eigh(hd)
    assert abs(evals[0] - e0) < 1e-10
    bounds = (evals[0] - 0.1, evals[-1] + 0.1)

    n_mom = 96
    site = n // 2
    mom, a, b = chebyshev_moments(mpo, gs, [(site, Z)], n_mom, bounds,
                                  max_bond=32)

    # dense Chebyshev recursion oracle
    v0 = evecs[:, 0]
    ov = _site_op(Z, site, n) @ v0
    hp = (hd - b * np.eye(2**n)) / a
    t_prev, t_cur = ov, hp @ ov
    dm = [ov @ t_prev, ov @ t_cur]
    for _ in range(2, n_mom):
        t_prev, t_cur = t_cur, 2 * hp @ t_cur - t_prev
        dm.append(ov @ t_cur)
    assert np.max(np.abs(np.real(mom) - np.array(dm))) < 1e-10
    assert np.max(np.abs(np.imag(mom))) < 1e-12

    # reconstruction identities
    w = np.linspace(-1.0, (evals[-1] - evals[0]) + 1.0, 4001)
    s = spectral_function(mom, a, b, w, e0=e0)
    assert np.all(s >= -1e-12)  # Jackson kernel is positive
    assert abs(np.trapezoid(s, w) - np.real(mom[0])) < 1e-4  # sum rule

    # spectral mean: symmetric broadening preserves the first moment
    weights = np.abs(evecs.conj().T @ ov) ** 2
    mean_dense = np.sum((evals - evals[0]) * weights) / np.sum(weights)
    mean_kpm = np.trapezoid(s * w, w) / np.trapezoid(s, w)
    assert abs(mean_kpm - mean_dense) < 0.05

    # Jackson factors: g_0 = 1, monotone decreasing, g_{N-1} ~ 0
    g = jackson_kernel(n_mom)
    assert abs(g[0] - 1.0) < 1e-12
    assert np.all(np.diff(g) < 1e-12)
    assert g[-1] < 1e-3


def test_scanned_recurrence_matches_host_loop():
    """chebyshev_moments_scanned (one jitted lax.scan) reproduces the
    host-loop moments at machine precision — same per-step truncation
    rank, zero host round-trips."""
    from contractn_tpu.models.chebyshev import chebyshev_moments_scanned

    n, h = 6, 1.2
    mpo = tfim_mpo(n, h=h)
    gs, e0, _ = dmrg(mpo, MPS.random(jax.random.PRNGKey(0), n, 2, 8),
                     max_bond=16, sweeps=6)
    bounds = (float(np.real(e0)) - 0.3, -float(np.real(e0)) + 3.0)
    m_host, a1, b1 = chebyshev_moments(mpo, gs, [(3, Z)], 40, bounds,
                                       max_bond=24)
    m_scan, a2, b2 = chebyshev_moments_scanned(mpo, gs, [(3, Z)], 40,
                                               bounds, max_bond=24)
    assert a1 == a2 and b1 == b2
    assert np.max(np.abs(m_host - m_scan)) < 1e-12
