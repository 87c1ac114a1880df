"""VUMPS variational uniform MPS vs exact infinite-chain results."""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.vumps import mixed_gauge, vumps


def test_mixed_gauge_isometries_and_state():
    """AL/AR are proper isometries and both gauges represent the same
    state (full dense transfer spectra match up to normalization —
    power iteration can't be used here: lam2 is a complex pair)."""
    a = 0.6 * jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6),
                                jnp.float64)
    al, ar, c = mixed_gauge(a)
    eye = np.eye(6)
    assert np.allclose(np.einsum("dji,djk->ik", np.asarray(al),
                                 np.asarray(al)), eye, atol=1e-10)
    assert np.allclose(np.einsum("dij,dkj->ik", np.asarray(ar),
                                 np.asarray(ar)), eye, atol=1e-10)

    def ratios(core):
        t = sum(np.kron(np.asarray(core)[s], np.asarray(core)[s])
                for s in range(2))
        ev = np.sort(np.abs(np.linalg.eigvals(t)))[::-1]
        return ev / ev[0]

    assert np.allclose(ratios(a), ratios(al), atol=1e-9)
    assert np.allclose(ratios(a), ratios(ar), atol=1e-9)


def test_vumps_tfim_machine_precision_energy():
    """Gapped TFIM: VUMPS hits the exact bulk energy at ~1e-10 with a
    TINY bond dimension — no Trotter error (cf. iTEBD's 5e-5)."""
    def tfim_exact(h):
        k = np.linspace(0, np.pi, 200001)
        return -np.trapezoid(np.sqrt(1 + h * h - 2 * h * np.cos(k)),
                             k) / np.pi

    res = vumps(tfim_mpo(2, h=1.5), bond_dim=8, iters=12)
    assert abs(res["energy"] - tfim_exact(1.5)) < 1e-9, res["energy"]
    assert res["gradient_norm"] < 1e-6


def test_vumps_observables_through_umps_tooling():
    """The converged AL is a valid uniform core: fixed-point
    magnetization matches the exact elliptic integral, and the
    correlation length approaches the exact 1/ln(h)."""
    from contractn_tpu.models.umps import correlation_length, expect_local

    res = vumps(tfim_mpo(2, h=2.0), bond_dim=8, iters=15)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    mx = expect_local(res["al"], sx, iters=600)
    ks = np.linspace(0.0, np.pi, 20001)
    eps = np.sqrt(1.0 + 4.0 - 4.0 * np.cos(ks))
    mx_exact = np.trapezoid((2.0 - np.cos(ks)) / eps, ks) / np.pi
    assert np.isclose(mx, mx_exact, atol=1e-6), (mx, mx_exact)
    xi = correlation_length(res["al"], iters=600)
    assert np.isclose(xi, 1.0 / np.log(2.0), rtol=0.05), xi
