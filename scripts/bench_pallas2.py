"""Round-3 follow-up: pallas epilogue variants (bf16 carry, k sites/step)."""
import time
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
        float(bench_fn(cores, left, right, x))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    print(f"# {name} compile {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(bench_fn(cores, left, right, x))
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / k_inner
    print(f"{name}: {per*1e3:.3f} ms/fwd, {flops/per/1e12:.1f} TFLOP/s")


def main():
    from contractn_tpu.ops.pallas_epilogue import mps_evaluate_epilogue

    rtt = measure_rtt()
    print(f"# rtt {rtt*1e3:.1f} ms")
    for bond in (128,):
        n_sites, phys_dim, batch = 1000, 2, 4096
        dtype = jnp.bfloat16
        k_inner = 30
        key = jax.random.PRNGKey(0)
        kc, kl, kr, kx = jax.random.split(key, 4)
        cores = (1.0 / (phys_dim * bond) ** 0.5) * jax.random.normal(
            kc, (n_sites, phys_dim, bond, bond), dtype)
        left = jax.random.normal(kl, (bond,), dtype)
        right = jax.random.normal(kr, (bond,), dtype)
        x = jax.random.normal(kx, (batch, n_sites, phys_dim), dtype)
        flops = batch * n_sites * (
            2 * phys_dim * bond * bond + 2 * phys_dim * bond)
        print(f"== bond {bond} ==")
        for (adt, kstep) in [(jnp.bfloat16, 1), (jnp.float32, 2),
                             (jnp.bfloat16, 2), (jnp.bfloat16, 4),
                             (jnp.bfloat16, 8)]:
            name = f"pallas acc={jnp.dtype(adt).name} k={kstep}"
            run_one(
                name,
                lambda c, l, r, xx, adt=adt, kstep=kstep:
                    mps_evaluate_epilogue(c, l, r, xx, acc_dtype=adt,
                                          sites_per_step=kstep),
                cores, left, right, x, k_inner, rtt, flops)


if __name__ == "__main__":
    main()
