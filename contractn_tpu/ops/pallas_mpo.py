"""Multi-GEMM Pallas body for the batched MPO expectation (VERDICT r3 #2).

docs/ROOFLINE.md ("MPO expectation") measured every XLA contraction
reassociation at 5.4-5.7 TFLOP/s against a ~29 TFLOP/s minimal-traffic
bound, and attributed the gap to HBM round-trips + relayouts of the
``(B, D, W, d, D)`` intermediates — claiming the fix needs the per-site
three-GEMM update to run on a VMEM-resident environment, a shape Mosaic
was EXPECTED (extrapolating the round-1 finding) to serialize.  This
kernel builds exactly that body so the claim rests on a measurement:

* grid ``(B/btile, n_sites)`` — sites innermost, so the per-sample
  environment scratch ``(btile, W*D, D)`` (f32) persists across the
  chain and NEVER touches HBM;
* ALL block structure (the ``w``/``e``/``d``/``v`` channel and phys
  indices) lives along SUBLANES; the lane dimension is always the pure
  bond index.  This is forced by Mosaic: slicing the lane dimension at
  an offset that is not a multiple of 128 (bond 64 blocks) produces
  vectors with a nonzero lane offset that neither ``tpu.concatenate``
  nor the GEMM lowering accepts ("result/input offset mismatch on
  non-concat dimension").  Sublane offsets only need 8-alignment, so a
  ``(w i)``-rows-by-``k``-lanes environment with per-``e`` ket GEMMs
  and per-``v`` bra GEMMs lowers cleanly;
* the channel mix is pure contiguous sublane block-FMAs: for each
  nonzero MPO element ``W[d,e,w,v]`` (baked in as compile-time
  immediates; uniform-W MPOs),
  ``t2[(v d i), l] += W[d,e,w,v] * t1_e[(w i), l]``;
* per sample: ``phys`` ket GEMMs ``(W D, D) x (D, D)``, the mix,
  ``wdim`` bra GEMMs ``(d D, D)^T x (d D, D)``, then the split-format
  mean-|.| rescale — semantics pinned against ``MPO.expectation`` in
  the tests;
* the ``btile`` samples run in an in-body ``fori_loop`` with dynamic
  VMEM slices (the round-1 serialization caveat applies; that cost IS
  the thing being measured).

Measured result on the real chip: see docs/ROOFLINE.md round-4 section.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stabilize import MIN_NORM


def _kernel(ket_ref, bra_ref, env0_ref, env_out_ref, log_out_ref,
            env_scr, log_scr, t2_scr, *, w_entries, btile, bond, wdim,
            phys, n_sites, gemm_dtype, unroll):
    si = pl.program_id(1)
    # f32 "matmuls" on the MXU default to one bf16 pass (the 6%-error
    # hazard; see ops.stabilize) — request full passes except when the
    # caller explicitly asked for bf16 GEMMs
    prec = (None if gemm_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    @pl.when(si == 0)
    def _init():
        env_scr[:] = jnp.broadcast_to(env0_ref[:], env_scr.shape)
        log_scr[:] = jnp.zeros_like(log_scr)

    def body(b, _):
        env_m = env_scr[b].astype(gemm_dtype)  # ((w i), k)
        ket = ket_ref[0, b]   # ((e k), l)
        bra = bra_ref[0, b]   # ((d i), j)
        # per-e ket GEMMs: t1_e[(w i), l] = env @ ket_e  (K = bond)
        t1 = [jnp.dot(env_m, ket[e * bond:(e + 1) * bond, :],
                      preferred_element_type=jnp.float32,
                      precision=prec)
              for e in range(phys)]
        # channel mix: contiguous SUBLANE block FMAs, W entries as
        # immediates; (v, d) blocks are disjoint and assemble by
        # static sublane-slice stores into the VMEM t2 scratch
        blocks = {}
        for (d, e, w, v, coef) in w_entries:
            blk = coef * t1[e][w * bond:(w + 1) * bond, :]
            key = (v, d)
            blocks[key] = blk if key not in blocks else blocks[key] + blk
        zero_blk = jnp.zeros((bond, bond), jnp.float32)
        for v in range(wdim):
            for d in range(phys):
                r0 = (v * phys + d) * bond
                t2_scr[r0:r0 + bond, :] = blocks.get((v, d), zero_blk)
        # per-v bra GEMMs: out_v[j, l] = bra^T @ t2_v  (K = phys*bond)
        outs = [jax.lax.dot_general(
            bra,
            t2_scr[v * phys * bond:(v + 1) * phys * bond,
                   :].astype(gemm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec) for v in range(wdim)]
        norm = sum(jnp.sum(jnp.abs(o)) for o in outs) / (
            wdim * bond * bond)
        safe = jnp.where(norm > MIN_NORM, norm, 1.0)
        inv = 1.0 / safe
        for v in range(wdim):  # new env ((v j), l), stored per block
            env_scr[b, v * bond:(v + 1) * bond, :] = outs[v] * inv
        log_scr[b] = log_scr[b] + jnp.log(safe)
        return 0

    # Mosaic supports only unroll=1 or full unroll; full unroll also
    # makes every env_scr[b] index static (no dynamic VMEM slices) and
    # lets the scheduler interleave independent samples' GEMM chains
    jax.lax.fori_loop(0, btile, body, 0,
                      unroll=btile if unroll else 1)

    @pl.when(si == n_sites - 1)
    def _finish():
        env_out_ref[:] = env_scr[:]
        log_out_ref[:] = log_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("w_entries", "wdim", "btile", "interpret",
                     "unroll"))
def _mpo_pallas_run(cores, env0, w_entries, wdim, btile, interpret,
                    unroll):
    batch, n_sites, phys, bond, _ = cores.shape
    # one-time XLA relayouts (amortized over the chain):
    # ket operand ((e k), l); bra operand ((d i), j) — SAME layout
    # (conj apart), so XLA CSEs them into one buffer for real dtypes
    ket = jnp.transpose(cores, (1, 0, 2, 3, 4)).reshape(
        n_sites, batch, phys * bond, bond)
    bra = jnp.conj(ket)
    n_tiles = batch // btile
    kernel = functools.partial(
        _kernel, w_entries=w_entries, btile=btile, bond=bond,
        wdim=wdim, phys=phys, n_sites=n_sites, gemm_dtype=cores.dtype,
        unroll=unroll)
    env, log = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_sites),
        in_specs=[
            pl.BlockSpec((1, btile, phys * bond, bond),
                         lambda bi, si: (si, bi, 0, 0)),
            pl.BlockSpec((1, btile, phys * bond, bond),
                         lambda bi, si: (si, bi, 0, 0)),
            pl.BlockSpec((wdim * bond, bond), lambda bi, si: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((btile, wdim * bond, bond),
                         lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((btile, 128), lambda bi, si: (bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, wdim * bond, bond),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((btile, wdim * bond, bond), jnp.float32),
            pltpu.VMEM((btile, 128), jnp.float32),
            pltpu.VMEM((wdim * phys * bond, bond), jnp.float32),
        ],
        interpret=interpret,
    )(ket, bra, env0)
    return env, log[:, 0]


def make_mpo_pallas_fn(mpo, left, right, btile=64, interpret=False,
                       unroll=True):
    """JIT-safe closure ``cores -> (val, log)`` with the MPO elements
    and boundary environment prepared ONCE (numpy preprocessing cannot
    run under an outer trace — e.g. a benchmark's fori_loop)."""
    w0 = np.asarray(mpo.cores[0])
    if not np.allclose(np.asarray(mpo.cores), w0[None]):
        raise ValueError("mpo_expectation_pallas needs a uniform-W MPO")
    phys, _, wdim, _ = w0.shape
    bond = left.shape[0]
    entries = tuple(
        (int(d), int(e), int(w), int(v), float(w0[d, e, w, v]))
        for d in range(phys) for e in range(phys)
        for w in range(wdim) for v in range(wdim)
        if w0[d, e, w, v] != 0.0
    )
    env0 = jnp.einsum("w,i,k->wik", jnp.asarray(mpo.left, jnp.float32),
                      jnp.conj(left).astype(jnp.float32),
                      left.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).reshape(
                          wdim * bond, bond)
    mpo_right = jnp.asarray(mpo.right, jnp.float32)
    right_f = right.astype(jnp.float32)

    def fn(cores):
        batch = cores.shape[0]
        if batch % btile:
            raise ValueError(
                f"batch={batch} must divide by btile={btile}")
        env, log = _mpo_pallas_run(cores, env0, entries, int(wdim),
                                   int(btile), bool(interpret),
                                   bool(unroll))
        env = env.reshape(batch, wdim, bond, bond)
        val = jnp.einsum("bwik,w,i,k->b", env, mpo_right,
                         jnp.conj(right_f), right_f,
                         precision=jax.lax.Precision.HIGHEST)
        norm = jnp.abs(val)
        safe = jnp.where(norm > MIN_NORM, norm, jnp.ones_like(norm))
        return (val / safe).astype(cores.dtype), log + jnp.log(safe)

    return fn


def mpo_expectation_pallas(mpo, cores, left, right, btile=64,
                           interpret=False, unroll=True):
    """Batched ``<psi| H |psi>`` through the VMEM-resident Pallas body.

    Args:
        mpo: UNIFORM-W MPO (same core at every site, e.g. ``tfim_mpo``)
            — its elements become compile-time immediates.
        cores: ``(B, N, d, D, D)`` per-sample MPS cores.
        left, right: shared ``(D,)`` MPS boundary vectors.
        btile: samples per grid step (VMEM-bounded; ``B % btile == 0``).

    Returns split-format ``(val, log)`` of shape ``(B,)`` with
    :meth:`contractn_tpu.models.mpo.MPO.expectation` semantics (f32
    environment carry).
    """
    return make_mpo_pallas_fn(mpo, left, right, btile=btile,
                              interpret=interpret,
                              unroll=unroll)(cores)
