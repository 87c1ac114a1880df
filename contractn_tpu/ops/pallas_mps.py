"""Pallas TPU kernel: fused stabilized MPS evaluation.

Design (v2 — latency-hiding schedule):

A single site step — ``(B, D) @ (D, d*D)`` GEMM, input weighting, L1-mean
rescale — is a *dependent* chain along sites, so one chain is latency-bound
(~6 us/site measured on v5e through this stack, regardless of batch width).
The kernel therefore splits the batch into ``n_blocks`` INDEPENDENT chains
and walks the grid ``(site_steps, blocks)`` with blocks innermost: while one
chain waits on its GEMM latency, the MXU is fed with the other chains'
GEMMs.  Each chain's carry ``v`` and log register live in VMEM scratch for
the whole contraction (``(n_blocks, block_b, D)``); the per-site core block
is indexed by the outer grid axis only, so it stays resident across the
inner sweep, and Pallas double-buffers the streaming core/input blocks.

Per-site rescale semantics match the engine (L1-mean to 1, reference
``einsum.py:89-107``).  Mosaic constraints honored: no in-kernel
reshape/transpose (cores pre-flattened to ``(N, D, d*D)`` XLA-side, physical
index handled with static lane slices), all refs >= 2-D.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep the rescale guard identical to the engine's
from .stabilize import MIN_NORM


def _mps_kernel(x_ref, core_ref, left_ref, right_ref,
                amp_ref, log_ref, v_ref, acc_ref, *,
                n_steps, block_b, phys_dim, sites_per_step):
    """One grid step: advance ``sites_per_step`` sites of ONE batch chain.

    Refs (VMEM blocks):
        x_ref:     (S, block_b, d)    this step's inputs (site-major layout)
        core_ref:  (S, D, d*D)        this step's cores, phys index in lanes
        left_ref:  (1, D)             left boundary (replicated)
        right_ref: (1, D)             right boundary (replicated)
        amp_ref:   (block_b, 1)       output mantissa column (this chain)
        log_ref:   (block_b, 1)       output log-scale column
        v_ref:     (n_blocks, block_b, D)  all chains' carries (scratch)
        acc_ref:   (n_blocks, block_b, 1)  all chains' log registers
    """
    step = pl.program_id(0)
    chain = pl.program_id(1)
    bond = left_ref.shape[1]

    @pl.when(step == 0)
    def _init():
        v_ref[chain] = jnp.broadcast_to(
            left_ref[0][None, :], (block_b, bond)
        ).astype(v_ref.dtype)
        acc_ref[chain] = jnp.zeros((block_b, 1), acc_ref.dtype)

    v = v_ref[chain]
    acc = acc_ref[chain]
    # full-precision multiplies for f32 cores (TPU default is bf16 passes)
    prec = (jax.lax.Precision.HIGHEST
            if core_ref.dtype == jnp.float32 else None)
    for s in range(sites_per_step):
        # MXU: (B, D) @ (D, d*D) with f32 accumulation
        mat = core_ref[s]
        u = jnp.dot(
            v.astype(mat.dtype), mat, preferred_element_type=jnp.float32,
            precision=prec,
        )
        # VPU: weight by the site input (static lane slices, no reshape)
        xb = x_ref[s].astype(jnp.float32)  # (block_b, d)
        v = xb[:, 0:1] * u[:, 0:bond]
        for k in range(1, phys_dim):
            v = v + xb[:, k:k + 1] * u[:, k * bond:(k + 1) * bond]
        # VPU: rescale to unit mean |element| per row, accumulate the log
        norm = jnp.sum(jnp.abs(v), axis=1, keepdims=True) / bond
        safe = jnp.where(norm > (MIN_NORM / bond), norm, jnp.ones_like(norm))
        v = v / safe
        acc = acc + jnp.log(safe)
    v_ref[chain] = v.astype(v_ref.dtype)
    acc_ref[chain] = acc

    @pl.when(step == n_steps - 1)
    def _finish():
        amp = jnp.sum(
            v * right_ref[0][None, :].astype(v.dtype),
            axis=1, keepdims=True,
        )
        mag = jnp.abs(amp)
        safe_a = jnp.where(mag > MIN_NORM, mag, jnp.ones_like(mag))
        amp_ref[:] = (amp / safe_a).astype(amp_ref.dtype)
        log_ref[:] = acc + jnp.log(safe_a)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "sites_per_step")
)
def pallas_mps_evaluate(cores, left, right, x, block_b=None, interpret=False,
                        sites_per_step=2):
    """Fused stabilized MPS evaluation (drop-in for ``mps_evaluate``).

    Args:
        cores: ``(N, d, D, D)`` site tensors (bf16 or f32).
        left, right: ``(D,)`` boundary vectors.
        x: ``(B, N, d)`` batched inputs; ``B`` must divide by ``block_b``.
        block_b: batch rows per independent chain; must equal ``B`` or be a
            multiple of 8 (TPU sublane tiling).  Default: enough chains to
            hide GEMM latency (``B/8`` capped at 512 rows).
        interpret: run in interpreter mode (for CPU tests).
        sites_per_step: sites advanced per grid step per chain.  ``N`` must
            divide by it (auto-clamped to a divisor); bounded by the VMEM
            budget for the unrolled f32 intermediates.

    Returns:
        ``(amp, log)`` of shape ``(B,)`` each: split-format amplitudes.
    """
    n_sites, phys_dim, bond, _ = cores.shape
    batch = x.shape[0]
    if block_b is None:
        # Largest divisor of batch that is <=512 and a multiple of 8
        # (several independent chains hide the per-chain GEMM latency)
        candidates = [
            b for b in range(8, min(512, batch) + 1, 8) if batch % b == 0
        ]
        block_b = candidates[-1] if candidates else batch
    if batch % block_b:
        raise ValueError(f"batch {batch} not divisible by block_b {block_b}")
    if block_b != batch and block_b % 8:
        raise ValueError(
            "block_b must equal the batch size or be a multiple of 8 "
            f"(TPU sublane tiling); got block_b={block_b}, batch={batch}"
        )
    while n_sites % sites_per_step:
        sites_per_step -= 1
    n_steps = n_sites // sites_per_step
    n_blocks = batch // block_b

    # One-time XLA-side layout changes (fused into the surrounding program):
    # phys index into the lane dimension, sites major for streaming.
    cores_mat = cores.transpose(0, 2, 1, 3).reshape(
        n_sites, bond, phys_dim * bond
    )
    x_site_major = x.swapaxes(0, 1)  # (N, B, d)

    grid = (n_steps, n_blocks)  # blocks innermost: independent chains
    kernel = functools.partial(
        _mps_kernel, n_steps=n_steps, block_b=block_b, phys_dim=phys_dim,
        sites_per_step=sites_per_step,
    )
    s = sites_per_step
    amp, log = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, block_b, phys_dim), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, bond, phys_dim * bond), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bond), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bond), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, 1), lambda n, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda n, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_blocks, block_b, bond), jnp.float32),
            pltpu.VMEM((n_blocks, block_b, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * n_sites * phys_dim * bond * bond,
            bytes_accessed=(cores.size * cores.dtype.itemsize
                            + x.size * x.dtype.itemsize),
            transcendentals=batch * n_sites,
        ),
        interpret=interpret,
    )(x_site_major, cores_mat, left.reshape(1, -1), right.reshape(1, -1))
    return amp[:, 0], log[:, 0]
