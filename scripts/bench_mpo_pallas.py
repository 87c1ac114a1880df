"""Real-chip measurement of the multi-GEMM Pallas MPO body (r3 #2).

BASELINE config 6 (50 sites, bond 64, batch 1000, bf16) — the Pallas
kernel vs the shipped XLA v0 path, same session, same RTT-corrected
device-side protocol as bench.py.

Run (plain python = the real TPU through the axon tunnel; probe first):
  python scripts/bench_mpo_pallas.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


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


def main():
    from contractn_tpu.models import MPS, tfim_mpo
    from contractn_tpu.ops.pallas_mpo import (make_mpo_pallas_fn,
                                              mpo_expectation_pallas)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        n_sites, bond, batch, k_inner, reps = 50, 64, 1000, 10, 5
        dtype = jnp.bfloat16
        # Pallas block constraint: second-to-last block dim % 8 == 0,
        # so btile must be a multiple of 8 that divides the batch.
        # unroll=True fully unrolls the sample loop (static VMEM
        # indices; Mosaic interleaves independent GEMM chains).
        configs = ((8, True), (40, True), (40, False))
    else:
        n_sites, bond, batch, k_inner, reps = 8, 8, 8, 2, 2
        dtype = jnp.float32
        configs = ((4, True),)
    rtt = measure_rtt()
    print(f"# devices={jax.devices()} rtt={rtt*1e3:.1f} ms", flush=True)

    mpo = tfim_mpo(n_sites, dtype=dtype)
    key = jax.random.PRNGKey(1)
    scale = 1.0 / (2 * bond) ** 0.5
    cores = scale * jax.random.normal(
        key, (batch, n_sites, 2, bond, bond), dtype)
    left = jnp.ones((bond,), dtype)
    right = jnp.ones((bond,), dtype)

    w = 3
    flops_site = 4 * 2 * w * bond ** 3 + 2 * (2 * w * bond) ** 2
    total_flops = batch * n_sites * flops_site

    def timed(make_fn, label):
        @jax.jit
        def loop(cores):
            def body(_, carry):
                total, cc = carry
                s = make_fn(cc)
                cc = cores + (s * 0.0).astype(cores.dtype)
                return total + s, cc

            total, _ = jax.lax.fori_loop(
                0, k_inner, body, (jnp.zeros((), jnp.float32), cores))
            return total

        t0 = time.perf_counter()
        v = float(loop(cores))
        print(f"# {label} compile+first {time.perf_counter()-t0:.1f}s "
              f"(value {v:.4g})", flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(cores))
            times.append(time.perf_counter() - t0)
        per = (min(times) - rtt) / k_inner
        arr = sorted((t - rtt) / k_inner * 1e3 for t in times)
        print(f"{label}: {per*1e3:.2f} ms/fwd  "
              f"eff {total_flops/per/1e12:.2f} TFLOP/s  "
              f"spread[{arr[0]:.2f},{arr[len(arr)//2]:.2f},{arr[-1]:.2f}]",
              flush=True)

    def ref_fn(cc):
        def one(c):
            val, log = mpo.expectation(MPS(c, left, right))
            return (val.astype(jnp.float32)
                    + log.astype(jnp.float32) * 1e-3)
        return jnp.sum(jax.vmap(one)(cc))

    timed(ref_fn, "xla-v0")

    for bt, un in configs:
        pallas = make_mpo_pallas_fn(mpo, left, right, btile=bt,
                                    unroll=un)

        def pal_fn(cc, pallas=pallas):
            val, log = pallas(cc)
            return jnp.sum(val.astype(jnp.float32)
                           + log.astype(jnp.float32) * 1e-3)

        timed(pal_fn, f"pallas-btile{bt}-unroll{un}")

    # value sanity at f32 on a small slice
    v_p, l_p = mpo_expectation_pallas(
        mpo, cores[:8].astype(jnp.float32), left.astype(jnp.float32),
        right.astype(jnp.float32), btile=8)
    ref = jax.vmap(lambda c: mpo.expectation(
        MPS(c.astype(jnp.float32), left.astype(jnp.float32),
            right.astype(jnp.float32))))(cores[:8])
    got = np.asarray(v_p, np.float64) * np.exp(np.asarray(l_p, np.float64))
    want = (np.asarray(ref[0], np.float64)
            * np.exp(np.asarray(ref[1], np.float64)))
    err = float(np.max(np.abs(got - want) / np.maximum(np.abs(want),
                                                       1e-30)))
    print(f"# f32 value check max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
