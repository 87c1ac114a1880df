"""Benchmark harness: the BASELINE.md config suite on real TPU hardware.

Prints one JSON line per config: {"metric", "value", "unit",
"vs_baseline"} (vs_baseline is null where the reference publishes no
comparable number).  The FIRST line is the headline throughput config.

Configs (BASELINE.md "Benchmark configs"):
  1. batched MPS evaluate — 1000 sites x bond 64 x batch 4096, split
     format, shape-tuned kernel (premix GEMM at D=64: ~98% of the bare
     dependent-GEMM ceiling; see docs/ROOFLINE.md for the measured
     ladder), plus a bond-128 line on the per-phys-GEMM kernel.
  2. MPS training step (loss + grad + SGD), 512 sites x bond 64
  3. README 1000-link 3x3 all-ones chain, split format, warm contract()
  4. order-101 copy tensor (x) 100 vectors, full contract()
  5. CP + Tucker rank-4 contractions
  6. bond-64 MPO expectation vmapped over 1k MPS parameter sets
  7. 4x4 PEPS (bond 2, closed) exact contraction
  8. 300-node chain cold graph->HLO (build+compile+first run)

Timing protocol: this TPU is reached through a relay with ~28 ms
round-trip latency and fully asynchronous dispatch (block_until_ready
returns before execution), so device-bound configs run K iterations
chained by a data dependency inside ONE jitted fori_loop with a single
scalar readback, and full-API configs dispatch K calls before one
readback; the measured RTT of a trivial readback is subtracted.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_GFLOPS = 8.3     # BASELINE.md: bond-64 MPS, warm, container CPU
REF_CHAIN_MS = 39.4        # BASELINE.md: warm split-format 1000-link chain
REF_COPY_MS = 5.44         # BASELINE.md: order-101 copy example, local run
REPS = 6                   # >= 5 so every line carries min/median/max


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


def emit(metric, value, unit, vs_baseline=None, spread=None):
    """One JSON line; ``spread`` = (min, median, max) in the same unit —
    the tunnel RTT drifts between sessions, so a single number cannot
    distinguish a real regression from relay noise (round-3 VERDICT)."""
    rec = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
    }
    if spread is not None:
        rec["spread"] = {
            "min": spread[0], "median": spread[1], "max": spread[2],
        }
    print(json.dumps(rec))
    sys.stdout.flush()


def spread_of(times, rtt=0.0, scale=1.0, to=1e3, digits=3):
    """(min, median, max) of RTT-corrected per-iteration times."""
    arr = sorted(times)
    med = arr[len(arr) // 2]
    return tuple(round((t - rtt) / scale * to, digits)
                 for t in (arr[0], med, arr[-1]))


def note(msg):
    print(f"# {msg}", file=sys.stderr)
    sys.stderr.flush()


# --------------------------------------------------------------------- #
# 1. Flagship: batched MPS evaluate (shape-tuned kernels)
# --------------------------------------------------------------------- #


def bench_flagship(rtt, on_tpu):
    from contractn_tpu.ops.scan import mps_evaluate_auto

    if on_tpu:
        n_sites, phys_dim, bond_dim, batch = 1000, 2, 64, 4096
        dtype = jnp.bfloat16
        k_inner = 100
    else:  # smoke-test shapes off-TPU
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
            amp, log = mps_evaluate_auto(cores, left, right, xc)
            s = jnp.sum(amp.astype(jnp.float32)) + jnp.sum(
                log.astype(jnp.float32)
            )
            xc = x + (s * 0.0).astype(x.dtype)
            return total + s, xc

        total, _ = jax.lax.fori_loop(
            0, k_inner, body, (jnp.zeros((), jnp.float32), x)
        )
        return total

    t0 = time.perf_counter()
    v = float(bench_fn(cores, left, right, x))
    note(f"flagship compile+first: {time.perf_counter()-t0:.1f}s "
         f"(value {v:.3g})")
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
    tf_spread = tuple(
        round(flops / ((t - rtt) / k_inner) / 1e12, 2)
        for t in (max(times), sorted(times)[len(times) // 2], min(times))
    )
    note(f"flagship per-forward {per_iter*1e3:.3f} ms")
    emit(
        f"batched MPS evaluate (premix GEMM), {n_sites} sites x bond "
        f"{bond_dim} x batch {batch}, split format, effective throughput",
        round(tflops, 2), "TFLOP/s",
        round(tflops * 1e3 / REFERENCE_GFLOPS, 1),
        spread=tf_spread,
    )

    if on_tpu:  # secondary line: the large-bond kernel (per-phys GEMMs)
        bond2 = 128
        cores2 = (1.0 / (phys_dim * bond2) ** 0.5) * jax.random.normal(
            jax.random.PRNGKey(9),
            (n_sites, phys_dim, bond2, bond2), dtype,
        )
        l2 = jax.random.normal(jax.random.PRNGKey(10), (bond2,), dtype)
        r2 = jax.random.normal(jax.random.PRNGKey(11), (bond2,), dtype)

        @jax.jit
        def bench2(cores, left, right, x):
            def body(_, carry):
                total, xc = carry
                amp, log = mps_evaluate_auto(cores, left, right, xc)
                s = jnp.sum(amp.astype(jnp.float32)) + jnp.sum(
                    log.astype(jnp.float32)
                )
                xc = x + (s * 0.0).astype(x.dtype)
                return total + s, xc

            total, _ = jax.lax.fori_loop(
                0, 30, body, (jnp.zeros((), jnp.float32), x)
            )
            return total

        float(bench2(cores2, l2, r2, x))
        times2 = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(bench2(cores2, l2, r2, x))
            times2.append(time.perf_counter() - t0)
        per2 = (min(times2) - rtt) / 30
        fl2 = batch * n_sites * (
            2 * phys_dim * bond2 * bond2 + 2 * phys_dim * bond2
        )
        tf2_spread = tuple(
            round(fl2 / ((t - rtt) / 30) / 1e12, 2)
            for t in (max(times2), sorted(times2)[len(times2) // 2],
                      min(times2))
        )
        emit(
            f"batched MPS evaluate (per-phys GEMMs), {n_sites} sites x "
            f"bond {bond2} x batch {batch}, split format",
            round(fl2 / per2 / 1e12, 2), "TFLOP/s", None,
            spread=tf2_spread,
        )


# --------------------------------------------------------------------- #
# Full-API configs: warm contract() wall time, K dispatches + 1 readback
# --------------------------------------------------------------------- #


def timed_api(fn, readback, rtt, k=20):
    """(min, median, max) ms per call over REPS measurement rounds."""
    fn()  # warm (build + compile)
    readback(fn())
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = fn()
        readback(last)
        times.append(time.perf_counter() - t0)
    return spread_of(times, rtt=rtt, scale=k)


def bench_train(rtt, on_tpu):
    """Full training step (value+grad+SGD) on the flagship model."""
    from contractn_tpu.models import MPS
    from contractn_tpu.parallel import make_train_step

    if on_tpu:
        n_sites, bond, batch = 512, 64, 1024
        dtype = jnp.bfloat16
        k_inner = 20
    else:
        n_sites, bond, batch = 32, 8, 16
        dtype = jnp.float32
        k_inner = 2
    mps = MPS.random(jax.random.PRNGKey(0), n_sites, 2, bond, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_sites, 2),
                          dtype)
    y = jnp.zeros((batch,), dtype)
    step = make_train_step(lr=1e-3)

    @jax.jit
    def loop(mps, x, y):
        def body(_, carry):
            m, tot = carry
            m, loss = step(m, x, y)
            return m, tot + loss.astype(jnp.float32)

        m, tot = jax.lax.fori_loop(
            0, k_inner, body, (mps, jnp.zeros((), jnp.float32))
        )
        return tot

    float(loop(mps, x, y))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(loop(mps, x, y))
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / k_inner
    emit(
        f"MPS training step (loss+grad+SGD), {n_sites} sites x bond "
        f"{bond} x batch {batch}",
        round(per * 1e3, 3), "ms/step", None,
        spread=spread_of(times, rtt=rtt, scale=k_inner),
    )


def bench_born(rtt, on_tpu):
    """Exact-NLL generative training step (Born machine: amplitude scan
    + split-format norm + grad + adam), the round-4 ML path."""
    from contractn_tpu.models.born import born_machine, fit_born_machine

    if on_tpu:
        n_sites, bond, batch, k_inner = 64, 64, 4096, 10
    else:
        n_sites, bond, batch, k_inner = 16, 8, 64, 2
    model = born_machine(jax.random.PRNGKey(0), n_sites, 2, bond,
                         dtype=jnp.float32)
    data = jax.random.randint(jax.random.PRNGKey(1), (batch, n_sites),
                              0, 2)

    def run():
        _, losses = fit_born_machine(model, data, steps=k_inner, lr=1e-3)
        return float(losses[-1])

    run()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / k_inner
    emit(
        f"Born-machine exact-NLL training step, {n_sites} sites x bond "
        f"{bond} x batch {batch}",
        round(per * 1e3, 3), "ms/step", None,
        spread=spread_of(times, rtt=rtt, scale=k_inner),
    )


def bench_chain(rtt):
    from contractn_tpu import TN

    tn = TN()
    prev = tn.add_dense_node(np.ones((3, 3), np.float32))
    for _ in range(999):
        nxt = tn.add_dense_node(np.ones((3, 3), np.float32))
        tn.connect_nodes(prev, nxt, 1, 0)
        prev = nxt
    vec = tn.add_dense_node(np.ones(3, np.float32))
    tn.connect_nodes(prev, vec, 1, 0)

    def run():
        return tn.contract(split_format=True)

    def readback(res):
        m, log = res
        lv = float(log)  # the one scalar sync
        want = 1000 * np.log(3.0)
        assert abs(lv - want) / want < 1e-4, (lv, want)

    lo, med, hi = timed_api(run, readback, rtt, k=10)
    emit("README 1000-link 3x3 chain, split format, warm contract()",
         lo, "ms", round(REF_CHAIN_MS / lo, 1), spread=(lo, med, hi))


def bench_copy101(rtt):
    from contractn_tpu import TN

    tn = TN()
    hub = tn.add_copy_node(101, dim=2)
    for i in range(100):
        v = tn.add_dense_node(np.array([1.0, 0.99], np.float32))
        tn.connect_nodes(hub, v, i, 0)

    def run():
        return tn.contract()

    def readback(res):
        out = np.asarray(res)
        assert np.allclose(out, [1.0, 0.99 ** 100], rtol=1e-4), out

    lo, med, hi = timed_api(run, readback, rtt)
    emit("order-101 copy tensor (x) 100 vectors, full contract()",
         lo, "ms", round(REF_COPY_MS / lo, 1), spread=(lo, med, hi))


def bench_cp_tucker(rtt):
    from contractn_tpu.models import cp_tn, tucker_tn

    rng = np.random.default_rng(0)
    facs = [rng.standard_normal((4, 6)).astype(np.float32)
            for _ in range(3)]
    cp = cp_tn(facs)
    core = rng.standard_normal((4, 4, 4)).astype(np.float32)
    tk = tucker_tn(core, facs)
    want_cp = np.einsum("ac,ad,ae->cde", *facs)
    want_tk = np.einsum("abc,ae,bf,cg->efg", core, *facs)

    def run():
        return cp.contract(), tk.contract()

    def readback(res):
        out_cp, out_tk = np.asarray(res[0]), np.asarray(res[1])
        assert np.allclose(out_cp, want_cp, rtol=1e-3)
        assert np.allclose(out_tk, want_tk, rtol=1e-3)

    lo, med, hi = timed_api(run, readback, rtt)
    emit("CP + Tucker rank-4 contraction pair, warm contract()",
         lo, "ms", None, spread=(lo, med, hi))


def bench_mpo_expectation(rtt, on_tpu):
    from contractn_tpu.models import MPS, tfim_mpo

    if on_tpu:
        n_sites, bond, batch = 50, 64, 1000
        dtype = jnp.bfloat16
        k_inner = 10
    else:
        n_sites, bond, batch = 10, 8, 16
        dtype = jnp.float32
        k_inner = 2
    mpo = tfim_mpo(n_sites, dtype=dtype)
    key = jax.random.PRNGKey(1)
    scale = 1.0 / (2 * bond) ** 0.5
    cores = scale * jax.random.normal(
        key, (batch, n_sites, 2, bond, bond), dtype
    )
    left = jnp.ones((bond,), dtype)
    right = jnp.ones((bond,), dtype)

    def one(c):
        val, log = mpo.expectation(MPS(c, left, right))
        return val.astype(jnp.float32) + log.astype(jnp.float32) * 1e-3

    @jax.jit
    def bench_fn(cores):
        def body(_, carry):
            total, cc = carry
            s = jnp.sum(jax.vmap(one)(cc))
            cc = cores + (s * 0.0).astype(cores.dtype)
            return total + s, cc

        total, _ = jax.lax.fori_loop(
            0, k_inner, body, (jnp.zeros((), jnp.float32), cores)
        )
        return total

    t0 = time.perf_counter()
    float(bench_fn(cores))
    note(f"mpo-exp compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(bench_fn(cores))
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / k_inner
    w = 3  # TFIM MPO bond
    flops_site = 4 * 2 * w * bond ** 3 + 2 * (2 * w * bond) ** 2
    tflops = batch * n_sites * flops_site / per / 1e12
    emit(
        f"MPO expectation, bond-{bond} MPS vmapped over {batch} parameter "
        "sets, split format",
        round(per * 1e3, 3), "ms/batch",
        None,
        spread=spread_of(times, rtt=rtt, scale=k_inner),
    )
    note(f"mpo-exp effective ~{tflops:.1f} TFLOP/s")

    if not on_tpu:
        return  # interpret-mode Pallas is not a measurement
    # the fused multi-GEMM Pallas body (VMEM-resident environment,
    # fully unrolled sample loop; docs/ROOFLINE.md round-4)
    from contractn_tpu.ops.pallas_mpo import make_mpo_pallas_fn

    pallas = make_mpo_pallas_fn(mpo, left, right, btile=40)

    @jax.jit
    def bench_pallas(cores):
        def body(_, carry):
            total, cc = carry
            val, log = pallas(cc)
            s = jnp.sum(val.astype(jnp.float32)
                        + log.astype(jnp.float32) * 1e-3)
            cc = cores + (s * 0.0).astype(cores.dtype)
            return total + s, cc

        total, _ = jax.lax.fori_loop(
            0, k_inner, body, (jnp.zeros((), jnp.float32), cores)
        )
        return total

    t0 = time.perf_counter()
    float(bench_pallas(cores))
    note(f"mpo-exp-pallas compile+first: {time.perf_counter()-t0:.1f}s")
    times_p = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(bench_pallas(cores))
        times_p.append(time.perf_counter() - t0)
    per_p = (min(times_p) - rtt) / k_inner
    emit(
        f"MPO expectation, bond-{bond} MPS x {batch} parameter sets, "
        "fused Pallas body (VMEM-resident environments)",
        round(per_p * 1e3, 3), "ms/batch",
        None,
        spread=spread_of(times_p, rtt=rtt, scale=k_inner),
    )
    note(f"mpo-exp-pallas effective ~"
         f"{batch * n_sites * flops_site / per_p / 1e12:.1f} TFLOP/s "
         f"({per / per_p:.2f}x the XLA path)")


def bench_peps(rtt):
    from contractn_tpu.models import peps_tn

    rng = np.random.default_rng(2)
    tn, grid = peps_tn(4, 4, bond_dim=2, rng=rng)
    want = None

    def run():
        return tn.contract(split_format=True)

    def readback(res):
        nonlocal want
        m, log = res
        got = float(m) * float(np.exp(float(log)))
        if want is None:
            want = float(np.asarray(
                tn.contract(split_format=False, backend="numpy")
            ))
        assert abs(got - want) / abs(want) < 1e-3, (got, want)

    lo, med, hi = timed_api(run, readback, rtt)
    emit("4x4 PEPS (bond 2, closed) exact contraction, warm contract()",
         lo, "ms", None, spread=(lo, med, hi))


def bench_graph_scale():
    """Graph-layer scale proof: 10k-node chain build + einsum string.

    The reference's graph layer revalidates the whole networkx graph per
    operation (SURVEY.md §2: 1.3 s to BUILD 1001 nodes,
    /root/reference/contractn/nodes.py:129-136); this layer is O(1) per
    operation (dict adjacency + incremental symbol allocator), so 10k
    nodes must land in the tens of milliseconds.  vs_baseline is the
    reference's measured 1001-node build time scaled LINEARLY to 10k
    nodes (13 s) — generous to the reference, whose revalidation cost
    grows superlinearly.
    """
    from contractn_tpu import TN

    ref_10k_ms = 1.3e3 * 10  # linear extrapolation of the 1001-node run
    times = []
    for _ in range(max(REPS - 1, 5)):
        t0 = time.perf_counter()
        tn = TN()
        mat = np.ones((2, 2), np.float32)
        prev = tn.add_dense_node(mat)
        for _ in range(9999):
            nxt = tn.add_dense_node(mat)
            tn.connect_nodes(prev, nxt, 1, 0)
            prev = nxt
        s = tn.einsum_str
        times.append(time.perf_counter() - t0)
        assert s.count(",") == 9999
    lo, med, hi = spread_of(times)
    emit("10k-node chain: graph build + einsum string (pure Python)",
         lo, "ms", round(ref_10k_ms / lo, 1), spread=(lo, med, hi))


def bench_compile(on_tpu):
    """Cold graph->HLO (+first run) for a fresh 300-node mixed chain."""
    import opt_einsum as oe

    from contractn_tpu import contract

    rng = np.random.default_rng(3)
    n = 300
    mats = [rng.standard_normal((7, 7)).astype(np.float32) * 0.4
            for _ in range(n)]
    terms = [oe.get_symbol(i) + oe.get_symbol(i + 1) for i in range(n)]
    einstr = ",".join(terms) + "->" + oe.get_symbol(0) + oe.get_symbol(n)
    t0 = time.perf_counter()
    m, log = contract(einstr, *mats, split_format=True, optimize="greedy")
    jax.block_until_ready(m)
    float(log)
    ms = (time.perf_counter() - t0) * 1e3
    emit("300-node chain, cold graph->HLO + first run (bucketed lowering)",
         round(ms, 1), "ms", None)


def bench_hotrg3d(rtt, on_tpu):
    """3D HOTRG flow (round 5): a genuinely 3D contraction workload —
    the chi^11 merge einsum is one large GEMM-shaped contraction per
    step, so the flow rides the MXU; reports effective TFLOP/s over
    the whole jitted scan (isometry eigh included)."""
    from contractn_tpu.models.hotrg3d import _hotrg3_flow, _pad6
    from contractn_tpu.models.hotrg3d import ising3d_tensor_smooth

    if on_tpu:
        # chi=12 is the single-chip ceiling: the merge's two chi^8
        # working buffers are 1.7 GB each here, 17 GB each at chi=16
        # (> HBM).  See docs/ROOFLINE.md round-5 section for the
        # measured ladder (einsum conv-lowering OOM'd at chi=12 from
        # x10.7 tile padding; the GEMM-form merge runs it).
        chi, steps, dtype = 12, 10, jnp.float32
    else:
        chi, steps, dtype = 5, 8, jnp.float64

    a = jnp.asarray(ising3d_tensor_smooth(np.float64(0.2)), dtype)
    a0 = _pad6(a, chi)

    t0 = time.perf_counter()
    lz = float(_hotrg3_flow(a0, a0, chi, steps)[0])
    note(f"hotrg3d compile+first: {time.perf_counter()-t0:.1f}s "
         f"(log z {lz:.6f})")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(_hotrg3_flow(a0, a0, chi, steps)[0])
        times.append(time.perf_counter() - t0)
    # 3 truncated merges (pure + 2 impurity halves) x ~2 chi^11 FMA
    # flops each per step; chi^8/chi^9 stages and the density halves
    # are < 3% at chi >= 12
    flops = steps * 3 * 2 * chi ** 11
    best = min(times) - rtt
    tflops = flops / best / 1e12
    spread = tuple(
        round(flops / (t - rtt) / 1e12, 2)
        for t in (max(times), sorted(times)[len(times) // 2], min(times))
    )
    emit(
        f"3D HOTRG cubic-lattice flow, chi {chi} x {steps} steps, "
        f"one jitted scan, effective throughput",
        round(tflops, 2), "TFLOP/s", None, spread=spread,
    )


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    rtt = measure_rtt()
    note(f"devices={jax.devices()} readback RTT {rtt*1e3:.1f} ms")

    bench_flagship(rtt, on_tpu)
    bench_train(rtt, on_tpu)
    bench_born(rtt, on_tpu)
    bench_chain(rtt)
    bench_copy101(rtt)
    bench_cp_tucker(rtt)
    bench_mpo_expectation(rtt, on_tpu)
    bench_peps(rtt)
    bench_hotrg3d(rtt, on_tpu)
    bench_graph_scale()
    bench_compile(on_tpu)


if __name__ == "__main__":
    main()
