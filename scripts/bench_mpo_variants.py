"""Measure MPO-expectation kernel layout variants on the real TPU.

Round-3 roofline work for BASELINE config 6 (bond-64 MPO expectation
vmapped over 1k parameter sets).  The round-2 kernel (`MPO.expectation`)
delivered ~5.8 TFLOP/s effective: its middle contraction (the MPO
channel mix, K = d*W = 6) is MXU-hostile and its (B, D, W, d, D)
intermediates round-trip HBM unfused.  Variants measured here (same
value, different contraction association — all checked against the
baseline at f32 before timing):

  v0 baseline   ket GEMM -> W mix (K=6 on the big t) -> bra GEMM
  v1 w-first    W mix on the SMALL env (K=W=3) -> ket GEMM (K=d*D)
                -> bra GEMM; tiny-K step touches 1/4 the bytes
  v2 ket-premix per-site Bmat[(w k), (d v l)] = W . a inside the scan;
                ONE K=W*D GEMM + bra GEMM (2x flops, zero tiny-K steps)
  v3 per-chan   (w, e)-batched square GEMMs env_w @ a_e, then the W mix
                as a (B*i*l, 6) x (6, 6) matmul, then bra GEMM
  v4 bra-premix C = conj(a) . W per site; ket GEMM -> one K=d*W*D GEMM

Protocol: same RTT-corrected chained-fori_loop single-readback scheme
as bench.py (async dispatch through the ~28 ms relay).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from contractn_tpu.ops.stabilize import dot_precision

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


def _stab(env, log):
    norm = jnp.mean(jnp.abs(env)).astype(log.dtype)
    ok = norm > 1e-7
    scale = jnp.where(ok, norm, 1.0).astype(env.dtype)
    return env / scale, log + jnp.where(ok, jnp.log(norm), 0.0)


def make_step(variant, w_site, prec):
    """Per-site env update ``(env (B,D,W,D), a (B,d,D,D)) -> env``.

    ``w_site (d, e, W, V)`` is the (shared) MPO core.
    """
    w = w_site

    if variant == "v0":
        def step(env, a):
            t = jnp.einsum("biwk,bekl->biwel", env, a, precision=prec)
            t = jnp.einsum("dewv,biwel->bidvl", w, t, precision=prec)
            return jnp.einsum("bdij,bidvl->bjvl", jnp.conj(a), t,
                              precision=prec)
    elif variant == "v1":
        def step(env, a):
            u = jnp.einsum("dewv,biwk->bdevik", w, env, precision=prec)
            t = jnp.einsum("bdevik,bekl->bdvil", u, a, precision=prec)
            return jnp.einsum("bdij,bdvil->bjvl", jnp.conj(a), t,
                              precision=prec)
    elif variant == "v2":
        def step(env, a):
            bm = jnp.einsum("dewv,bekl->bwkdvl", w, a, precision=prec)
            d_, _, wb, vb = w.shape
            bond = a.shape[-1]
            bsz = a.shape[0]
            t = jnp.einsum(
                "bix,bxy->biy",
                env.reshape(bsz, bond, wb * bond),
                bm.reshape(bsz, wb * bond, d_ * vb * bond),
                precision=prec,
            ).reshape(bsz, bond, d_, vb, bond)
            return jnp.einsum("bdij,bidvl->bjvl", jnp.conj(a), t,
                              precision=prec)
    elif variant == "v3":
        def step(env, a):
            g = jnp.einsum("biwk,bekl->bweil", env, a, precision=prec)
            t = jnp.einsum("dewv,bweil->bdvil", w, g, precision=prec)
            return jnp.einsum("bdij,bdvil->bjvl", jnp.conj(a), t,
                              precision=prec)
    elif variant == "v4":
        def step(env, a):
            c = jnp.einsum("bdij,dewv->bewvij", jnp.conj(a), w,
                           precision=prec)
            t = jnp.einsum("biwk,bekl->biwel", env, a, precision=prec)
            return jnp.einsum("bewvij,biwel->bjvl", c, t,
                              precision=prec)
    else:
        raise ValueError(variant)
    return step


def build_fn(variant, mpo_cores, mpo_left, mpo_right, n_sites, prec):
    w0 = mpo_cores[0]  # uniform TFIM MPO: same core every site

    def forward(cores, left, right):
        b = cores.shape[0]
        env = jnp.einsum("i,w,k->iwk", jnp.conj(left), mpo_left, left)
        env = jnp.broadcast_to(env, (b,) + env.shape).astype(cores.dtype)
        log = jnp.zeros((b,), jnp.float32)
        step = make_step(variant, w0.astype(cores.dtype), prec)

        def body(carry, a):
            env, log = carry
            env = step(env, a)
            env, log = _stab(env, log)
            return (env, log), None

        (env, log), _ = jax.lax.scan(
            body, (env, log), jnp.moveaxis(cores, 1, 0))
        val = jnp.einsum("biwk,i,w,k->b", env, jnp.conj(right),
                         mpo_right, right, precision=prec)
        return val, log

    return forward


def main():
    from contractn_tpu.models import tfim_mpo

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        n_sites, bond, batch = 50, 64, 1000
        dtype = jnp.bfloat16
        k_inner = 10
    else:
        n_sites, bond, batch = 10, 16, 32
        dtype = jnp.float32
        k_inner = 2
    rtt = measure_rtt()
    print(f"# rtt {rtt*1e3:.1f} ms, platform {jax.devices()[0].platform}")

    mpo = tfim_mpo(n_sites, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    scale = 1.0 / (2 * bond) ** 0.5
    cores = scale * jax.random.normal(
        key, (batch, n_sites, 2, bond, bond), dtype)
    left = jnp.ones((bond,), dtype)
    right = jnp.ones((bond,), dtype)
    prec = dot_precision(dtype)

    wb = mpo.cores.shape[-1]
    flops_site = 4 * 2 * wb * bond ** 3 + 2 * (2 * wb * bond) ** 2
    total_flops = batch * n_sites * flops_site

    # value check at f32 against v0
    ref = None
    for variant in ("v0", "v1", "v2", "v3", "v4"):
        f32 = build_fn(variant, mpo.cores, mpo.left, mpo.right,
                       n_sites, jax.lax.Precision.HIGHEST)
        v, lg = jax.jit(f32)(cores.astype(jnp.float32)[:8],
                             left.astype(jnp.float32),
                             right.astype(jnp.float32))
        got = np.asarray(v) * np.exp(np.asarray(lg) - np.asarray(lg)[0])
        if ref is None:
            ref = got
        else:
            err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9))
            print(f"# {variant} value check rel err {err:.2e}")
            assert err < 1e-4, (variant, err)

    for variant in ("v0", "v1", "v2", "v3", "v4"):
        fwd = build_fn(variant, mpo.cores, mpo.left, mpo.right,
                       n_sites, prec)

        @jax.jit
        def bench_fn(cores, left, right):
            def body(_, carry):
                total, cc = carry
                v, lg = fwd(cc, left, right)
                s = (jnp.sum(v.astype(jnp.float32))
                     + jnp.sum(lg) * 1e-3)
                cc = cores + (s * 0.0).astype(cores.dtype)
                return total + s, cc

            total, _ = jax.lax.fori_loop(
                0, k_inner, body, (jnp.zeros((), jnp.float32), cores))
            return total

        t0 = time.perf_counter()
        float(bench_fn(cores, left, right))
        print(f"# {variant} compile+first {time.perf_counter()-t0:.1f}s")
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(bench_fn(cores, left, right))
            times.append(time.perf_counter() - t0)
        per = (min(times) - rtt) / k_inner
        print(f"{variant}: {per*1e3:.2f} ms/fwd, "
              f"effective {total_flops/per/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
