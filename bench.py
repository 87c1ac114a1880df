"""Benchmark harness: batched MPS-chain contraction throughput on TPU.

Headline config (BASELINE.md): 1000-site bond-64 MPS, split-format, batched
evaluation — the tensor-network analog of a long-sequence forward pass.  The
useful-FLOP count is the FLOP-optimal vector-carry algorithm's
(``B * N * 2 d D^2`` for the per-site boundary GEMM, plus the input
weighting), and the kernel runs exactly that algorithm
(:func:`contractn_tpu.ops.scan.mps_evaluate`).

Timing protocol: this TPU is reached through a relay with ~28 ms round-trip
latency and fully asynchronous dispatch (``block_until_ready`` returns before
execution), so the benchmark runs K forward passes chained by a data
dependency inside ONE jitted ``fori_loop`` and forces a single scalar
readback; the measured RTT of a trivial readback is subtracted.

``vs_baseline`` compares effective throughput against the reference's
measured 8.3 GFLOP/s on its bond-64 MPS config (BASELINE.md, container CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from contractn_tpu.ops.scan import mps_evaluate

REFERENCE_GFLOPS = 8.3  # BASELINE.md: bond-64 MPS, warm, container CPU
K_INNER = 100  # forward passes per timed readback
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


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        n_sites, phys_dim, bond_dim, batch = 1000, 2, 64, 4096
        dtype = jnp.bfloat16
        k_inner = K_INNER
    else:  # keep the harness runnable on CPU for smoke tests
        n_sites, phys_dim, bond_dim, batch = 100, 2, 16, 64
        dtype = jnp.float32
        k_inner = 2

    key = jax.random.PRNGKey(0)
    kc, kl, kr, kx = jax.random.split(key, 4)
    scale = 1.0 / (phys_dim * bond_dim) ** 0.5
    cores = scale * jax.random.normal(
        kc, (n_sites, phys_dim, bond_dim, bond_dim), dtype
    )
    left = jax.random.normal(kl, (bond_dim,), dtype)
    right = jax.random.normal(kr, (bond_dim,), dtype)
    x = jax.random.normal(kx, (batch, n_sites, phys_dim), dtype)

    @jax.jit
    def bench_fn(cores, left, right, x):
        def body(_, carry):
            total, xc = carry
            amp, log = mps_evaluate(cores, left, right, xc)
            s = jnp.sum(amp.astype(jnp.float32)) + jnp.sum(
                log.astype(jnp.float32)
            )
            # data dependency so iterations cannot be collapsed or reordered
            xc = x + (s * 0.0).astype(x.dtype)
            return total + s, xc

        total, _ = jax.lax.fori_loop(
            0, k_inner, body, (jnp.zeros((), jnp.float32), x)
        )
        return total

    rtt = measure_rtt()
    print(f"# readback RTT: {rtt*1e3:.1f} ms", file=sys.stderr)

    t0 = time.perf_counter()
    v = float(bench_fn(cores, left, right, x))
    compile_s = time.perf_counter() - t0
    print(f"# compile+first: {compile_s:.1f}s (value {v:.3g})", file=sys.stderr)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(bench_fn(cores, left, right, x))
        times.append(time.perf_counter() - t0)
    per_iter = (min(times) - rtt) / k_inner

    flops = batch * n_sites * (
        2 * phys_dim * bond_dim * bond_dim + 2 * phys_dim * bond_dim
    )
    tflops = flops / per_iter / 1e12
    vs_baseline = tflops * 1e3 / REFERENCE_GFLOPS

    print(f"# per-forward {per_iter*1e3:.3f} ms over {REPS}x{k_inner} runs",
          file=sys.stderr)
    print(json.dumps({
        "metric": "batched MPS evaluate, 1000 sites x bond 64 x batch 4096, "
                  "split format, effective throughput",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(vs_baseline, 1),
    }))


if __name__ == "__main__":
    main()
