"""Pallas fused MPS kernel: interpret-mode parity with the XLA scan.

On CPU the kernel runs in the Pallas interpreter (bit-for-bit the same
program logic as the Mosaic-compiled TPU kernel, minus the hardware); real
TPU execution is covered by the benchmark harness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contractn_tpu.ops.pallas_mps import pallas_mps_evaluate
from contractn_tpu.ops.scan import mps_evaluate


def _setup(N=12, d=2, D=8, B=16, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    kc, kl, kr, kx = jax.random.split(key, 4)
    cores = jax.random.normal(kc, (N, d, D, D), dtype) / 4.0
    left = jax.random.normal(kl, (D,), dtype)
    right = jax.random.normal(kr, (D,), dtype)
    x = jax.random.normal(kx, (B, N, d), dtype)
    return cores, left, right, x


def test_pallas_matches_scan():
    cores, left, right, x = _setup()
    a1, l1 = mps_evaluate(cores, left, right, x)
    a2, l2 = pallas_mps_evaluate(cores, left, right, x, block_b=16,
                                 interpret=True)
    v1 = np.asarray(a1) * np.exp(np.asarray(l1))
    v2 = np.asarray(a2) * np.exp(np.asarray(l2))
    assert np.allclose(v1, v2, rtol=1e-4)
    # split invariant: mean |mantissa| == 1 per sample (scalar -> |m| == 1)
    assert np.allclose(np.abs(np.asarray(a2)), 1.0, rtol=1e-5)


def test_pallas_multiple_batch_blocks():
    cores, left, right, x = _setup(B=32)
    a1, l1 = mps_evaluate(cores, left, right, x)
    a2, l2 = pallas_mps_evaluate(cores, left, right, x, block_b=16,
                                 interpret=True)
    v1 = np.asarray(a1) * np.exp(np.asarray(l1))
    v2 = np.asarray(a2) * np.exp(np.asarray(l2))
    assert np.allclose(v1, v2, rtol=1e-4)


def test_pallas_block_validation():
    cores, left, right, x = _setup(B=16)
    with pytest.raises(ValueError):
        pallas_mps_evaluate(cores, left, right, x, block_b=5, interpret=True)
    with pytest.raises(ValueError):
        # not a multiple of 8 and != batch
        pallas_mps_evaluate(
            cores, left, right, jnp.tile(x, (3, 1, 1)), block_b=12,
            interpret=True,
        )


def test_mps_evaluate_kernel_option():
    from contractn_tpu.models import MPS

    mps = MPS.random(jax.random.PRNGKey(1), 10, 2, 8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 10, 2), jnp.float32)
    a1, l1 = mps.evaluate(x, kernel="scan")
    a2, l2 = mps.evaluate(x, kernel="pallas")
    v1 = np.asarray(a1) * np.exp(np.asarray(l1))
    v2 = np.asarray(a2) * np.exp(np.asarray(l2))
    assert np.allclose(v1, v2, rtol=1e-4)


def test_epilogue_kernel_matches_scan():
    """Round-3 fused-epilogue kernel (ONE dot per grid step, VMEM
    carry) == the scan evaluator, interpret mode, several shapes."""
    from contractn_tpu.ops.pallas_epilogue import mps_evaluate_epilogue
    from contractn_tpu.ops.scan import mps_evaluate

    for (n, d, bond, batch) in [(12, 2, 8, 16), (6, 3, 4, 8),
                                (9, 2, 16, 24)]:
        key = jax.random.PRNGKey(n)
        kc, kl, kr, kx = jax.random.split(key, 4)
        cores = (1 / np.sqrt(d * bond)) * jax.random.normal(
            kc, (n, d, bond, bond), jnp.float32)
        left = jax.random.normal(kl, (bond,), jnp.float32)
        right = jax.random.normal(kr, (bond,), jnp.float32)
        x = jax.random.normal(kx, (batch, n, d), jnp.float32)
        a1, l1 = mps_evaluate(cores, left, right, x)
        a2, l2 = mps_evaluate_epilogue(cores, left, right, x,
                                       interpret=True)
        ref = np.asarray(a1) * np.exp(np.asarray(l1) - float(l1[0]))
        got = np.asarray(a2) * np.exp(np.asarray(l2) - float(l1[0]))
        assert np.allclose(got, ref, rtol=2e-4), (n, d, bond, batch)


def test_mpo_expectation_pallas_matches_reference():
    """The multi-GEMM VMEM-resident MPO body (interpret mode) ==
    MPO.expectation values at f32 (split-format recombined)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contractn_tpu.models import MPS, tfim_mpo
    from contractn_tpu.ops.pallas_mpo import mpo_expectation_pallas

    n_sites, bond, batch, btile = 6, 8, 4, 2
    mpo = tfim_mpo(n_sites, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    cores = (1.0 / (2 * bond) ** 0.5) * jax.random.normal(
        key, (batch, n_sites, 2, bond, bond), jnp.float32)
    left = jnp.ones((bond,), jnp.float32)
    right = jnp.ones((bond,), jnp.float32)

    val, log = mpo_expectation_pallas(mpo, cores, left, right,
                                      btile=btile, interpret=True)
    want = jax.vmap(
        lambda c: mpo.expectation(MPS(c, left, right)))(cores)
    got = np.asarray(val, np.float64) * np.exp(np.asarray(log,
                                                          np.float64))
    ref = np.asarray(want[0], np.float64) * np.exp(
        np.asarray(want[1], np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_mpo_expectation_pallas_validates():
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from contractn_tpu.models import MPO, tfim_mpo
    from contractn_tpu.ops.pallas_mpo import mpo_expectation_pallas

    mpo = tfim_mpo(4, dtype=jnp.float32)
    cores = jnp.zeros((3, 4, 2, 8, 8), jnp.float32)
    left = jnp.ones((8,), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        mpo_expectation_pallas(mpo, cores, left, left, btile=2)
    w = np.random.default_rng(0).standard_normal((4, 2, 2, 3, 3))
    nonuni = MPO(jnp.asarray(w, jnp.float32),
                 jnp.asarray([1.0, 0, 0], jnp.float32),
                 jnp.asarray([0, 0, 1.0], jnp.float32))
    cores4 = jnp.zeros((4, 4, 2, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="uniform"):
        mpo_expectation_pallas(nonuni, cores4, left, left, btile=2)
