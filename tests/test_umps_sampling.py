"""Perfect Born-rule sampling of infinite MPS windows."""

import jax
import numpy as np

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.umps import (
    correlate,
    umps_sample,
    umps_window_distribution,
)
from contractn_tpu.models.vumps import vumps

_SZ = np.diag([1.0, -1.0])


def test_window_distribution_matches_correlators():
    """The exact enumerated window distribution is normalized and its
    ZZ marginals equal the transfer-fixed-point correlators at machine
    precision — this pins the mixed-gauge chain rule (rho_0 = C^H C,
    right-isometric updates) without any sampling noise."""
    g = vumps(tfim_mpo(2, h=1.3), 10, iters=100)
    al = np.asarray(g["al"])
    p = umps_window_distribution(al, 5)
    assert abs(p.sum() - 1.0) < 1e-12
    zv = np.array([1.0, -1.0])
    for r in (1, 2, 4):
        ax = tuple(j for j in range(1, 5) if j != r)
        marg = p.sum(axis=ax)
        zz = float((marg * np.outer(zv, zv)).sum())
        zz_u = float(np.real(correlate(al, _SZ, _SZ, [r])[0]))
        assert abs(zz - zz_u) < 1e-10, r


def test_samples_reproduce_distribution():
    """8192 independent draws (one jitted vmap-of-scan program):
    every outcome frequency lands within 5 sigma of the exact window
    distribution, and the sampled ZZ estimator within 5 sigma of the
    exact correlator."""
    g = vumps(tfim_mpo(2, h=1.3), 10, iters=100)
    al = np.asarray(g["al"])
    n, ns = 4, 8192
    p = umps_window_distribution(al, n)
    s = umps_sample(al, n, ns, jax.random.PRNGKey(7))
    assert s.shape == (ns, n)
    freq = np.zeros((2,) * n)
    for row in s:
        freq[tuple(row)] += 1
    freq /= ns
    sig = np.sqrt(np.maximum(p * (1 - p), 1e-12) / ns)
    assert np.max(np.abs(freq - p) / (sig + 1e-12)) < 5.0

    zv = np.array([1.0, -1.0])
    z = zv[s]
    zz_est = float(np.mean(z[:, 0] * z[:, 3]))
    zz_u = float(np.real(correlate(al, _SZ, _SZ, [3])[0]))
    assert abs(zz_est - zz_u) < 5.0 / np.sqrt(ns)
