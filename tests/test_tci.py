"""Tensor cross interpolation: exact-rank recovery, quantics functions
from adaptive samples, integration, and 2D parity with the dense path."""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu.models import (
    MPS,
    function_mps_2d,
    function_tci,
    function_tci_2d,
    quantics_integral,
    quantics_to_dense_2d,
    tci_cross,
)


def _eval_mps(mps, idx):
    """Dense amplitudes of ``mps`` at integer multi-indices (one-hot)."""
    idx = np.asarray(idx)
    b, n = idx.shape
    d = mps.phys_dim
    x = np.zeros((b, n, d))
    x[np.arange(b)[:, None], np.arange(n)[None, :], idx] = 1.0
    amp, log = mps.evaluate(jnp.asarray(x))
    return np.asarray(amp * jnp.exp(log))


def test_tci_recovers_low_rank_tensor_exactly():
    """A random bond-3 MPS sampled as a black box is recovered to
    machine precision with far fewer evaluations than the full tensor."""
    n, d, chi = 14, 2, 3
    mps0 = MPS.random(jax.random.PRNGKey(0), n, d, chi, dtype=jnp.float64)

    def f(idx):
        return _eval_mps(mps0, idx)

    mps, info = tci_cross(f, (d,) * n, max_bond=6, tol=1e-13, sweeps=6)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, d, size=(300, n))
    got = _eval_mps(mps, idx)
    want = _eval_mps(mps0, idx)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-10 * scale
    assert info.n_evals < 2 ** n // 3  # adaptive, not exhaustive
    assert max(info.ranks) <= 6


def test_tci_sin_is_rank_two():
    """sin on a 2^16 grid: TCI at max_bond=2 reproduces the exact
    values (quantics rank of sin is exactly 2)."""
    n_bits = 16
    mps, info = function_tci(lambda x: np.sin(2 * np.pi * x), n_bits,
                             max_bond=2, tol=1e-12)
    rng = np.random.default_rng(2)
    j = rng.integers(0, 2 ** n_bits, size=400)
    bits = (j[:, None] >> np.arange(n_bits - 1, -1, -1)[None, :]) & 1
    got = _eval_mps(mps, bits)
    want = np.sin(2 * np.pi * j / 2 ** n_bits)
    assert np.abs(got - want).max() < 1e-10
    assert info.n_evals < 3000


def test_tci_gaussian_integral():
    """exp(-x^2) on [-6, 6], 2^20 points: the Riemann sum of the TCI
    MPS hits sqrt(pi) to 1e-10 (periodic-grid superconvergence) while
    touching a vanishing fraction of the grid."""
    n_bits = 20
    mps, info = function_tci(lambda x: np.exp(-x * x), n_bits,
                             domain=(-6.0, 6.0), max_bond=14, tol=1e-12)
    val = quantics_integral(mps, domain=(-6.0, 6.0))
    assert abs(complex(val).real - np.sqrt(np.pi)) < 1e-10
    assert info.n_evals < 2 ** n_bits / 50


def test_tci_2d_matches_dense_path():
    """2D TCI == the dense function_mps_2d pipeline on a 32x32 grid."""
    n_bits = 5

    def f(x, y):
        return 1.0 / (1.0 + x + 2.0 * y)

    dense = quantics_to_dense_2d(function_mps_2d(f, n_bits))
    mps, info = function_tci_2d(f, n_bits, max_bond=12, tol=1e-12)
    got = quantics_to_dense_2d(mps)
    assert np.abs(np.asarray(got) - np.asarray(dense)).max() < 1e-9


def test_tci_zero_function_raises():
    import pytest

    with pytest.raises(ValueError):
        tci_cross(lambda idx: np.zeros(len(idx)), (2,) * 6)


def test_tci_2d_gaussian_integral():
    """Isotropic Gaussian on [-5, 5]^2 learned by 2D TCI from adaptive
    samples; the 2D Riemann sum hits pi to 1e-8."""
    from contractn_tpu.models import function_tci_2d, quantics_integral_2d

    dom = ((-5.0, 5.0), (-5.0, 5.0))
    mps, info = function_tci_2d(
        lambda x, y: np.exp(-(x * x + y * y)), 10, domains=dom,
        max_bond=12, tol=1e-12)
    val = quantics_integral_2d(mps, domains=dom)
    assert abs(complex(val).real - np.pi) < 1e-8
    assert info.n_evals < 4 ** 10 / 100
