"""Measure the fused-epilogue Pallas kernel against the XLA scan kernels.

Round-3 roofline work (docs/ROOFLINE.md D=128 ladder): the target is
the 137.7 TFLOP/s bare-chain ceiling of the single-GEMM layout that the
XLA scan cannot reach (its weighting intermediate unfuses at width 128).
Also re-measures the premix kernel at D=128 to resolve the round-2
docstring/ROOFLINE discrepancy.

Same RTT-corrected chained-fori_loop protocol as bench.py.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 4


def measure_rtt():
    f = jax.jit(lambda a: jnp.sum(a + 1.0))
    x = jnp.ones((8, 128))
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_one(name, fn, cores, left, right, x, k_inner, rtt, flops):
    @jax.jit
    def bench_fn(cores, left, right, x):
        def body(_, carry):
            total, xc = carry
            amp, log = fn(cores, left, right, xc)
            s = (jnp.sum(amp.astype(jnp.float32))
                 + jnp.sum(log.astype(jnp.float32)))
            xc = x + (s * 0.0).astype(x.dtype)
            return total + s, xc

        total, _ = jax.lax.fori_loop(
            0, k_inner, body, (jnp.zeros((), jnp.float32), x))
        return total

    t0 = time.perf_counter()
    try:
        v = float(bench_fn(cores, left, right, x))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    print(f"# {name} compile+first {time.perf_counter()-t0:.1f}s "
          f"(value {v:.3g})")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(bench_fn(cores, left, right, x))
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / k_inner
    print(f"{name}: {per*1e3:.3f} ms/fwd, {flops/per/1e12:.1f} TFLOP/s")


def main():
    from contractn_tpu.ops.pallas_epilogue import mps_evaluate_epilogue
    from contractn_tpu.ops.scan import (
        mps_evaluate_perphys,
        mps_evaluate_premix,
    )

    rtt = measure_rtt()
    print(f"# rtt {rtt*1e3:.1f} ms platform {jax.devices()[0].platform}")
    on_tpu = jax.devices()[0].platform != "cpu"

    for bond in (128, 64):
        if on_tpu:
            n_sites, phys_dim, batch = 1000, 2, 4096
            dtype = jnp.bfloat16
            k_inner = 30
        else:
            n_sites, phys_dim, batch = 50, 2, 64
            bond = 16
            dtype = jnp.float32
            k_inner = 2
        key = jax.random.PRNGKey(0)
        kc, kl, kr, kx = jax.random.split(key, 4)
        scale = 1.0 / (phys_dim * bond) ** 0.5
        cores = scale * jax.random.normal(
            kc, (n_sites, phys_dim, bond, bond), dtype)
        left = jax.random.normal(kl, (bond,), dtype)
        right = jax.random.normal(kr, (bond,), dtype)
        x = jax.random.normal(kx, (batch, n_sites, phys_dim), dtype)
        flops = batch * n_sites * (
            2 * phys_dim * bond * bond + 2 * phys_dim * bond)

        print(f"== bond {bond} ==")
        # value sanity: pallas vs perphys on a short prefix
        short = 20
        a1, l1 = jax.jit(mps_evaluate_perphys)(
            cores[:short], left, right, x[:64, :short])
        a2, l2 = mps_evaluate_epilogue(
            cores[:short], left, right, x[:64, :short],
            interpret=not on_tpu)
        r1 = np.asarray(a1, np.float64) * np.exp(
            np.asarray(l1, np.float64) - float(l1[0]))
        r2 = np.asarray(a2, np.float64) * np.exp(
            np.asarray(l2, np.float64) - float(l1[0]))
        err = np.max(np.abs(r1 - r2) / np.maximum(np.abs(r1), 1e-9))
        print(f"# value agreement pallas vs perphys: {err:.2e}")

        run_one(
            "pallas-epilogue",
            lambda c, l, r, xx: mps_evaluate_epilogue(
                c, l, r, xx, interpret=not on_tpu),
            cores, left, right, x, k_inner, rtt, flops)
        run_one("scan-perphys", mps_evaluate_perphys,
                cores, left, right, x, k_inner, rtt, flops)
        run_one("scan-premix", mps_evaluate_premix,
                cores, left, right, x, k_inner, rtt, flops)
        if not on_tpu:
            break


if __name__ == "__main__":
    main()
