"""Narrow Pallas kernel: batched MPS evaluate with a VMEM-resident carry.

Round-3 attack on the D=128 fusion wall (docs/ROOFLINE.md): the
single-GEMM layout's ``(B, d, D)`` weighting intermediate stops fusing
at width 128 in XLA and round-trips HBM, capping the layout at 33.5
effective TFLOP/s against a 137.7 bare-chain ceiling.  This kernel puts
ONE ``(B, D) x (D, d*D)`` MXU dot per grid step with the input
weighting and the split-format rescale as a VPU epilogue on the VMEM
accumulator — the carry never touches HBM, and the per-site core block
DMA pipelines against the previous step's compute.

Design constraints honored (round-1 negative result, project memory
``pallas-mps-kernel-status``: Mosaic serializes multi-GEMM bodies and
in-body ``fori_loop`` chains):

* exactly one ``jnp.dot`` per kernel body;
* the chain runs in the GRID (sequential on TPU, scratch persists
  across steps), not in an in-body loop, so Pallas' automatic
  double-buffering overlaps the next site's DMA with this GEMM;
* the weighting is two (``phys_dim``) lane-aligned slice-scale-adds,
  the rescale a row reduction — pure VPU, no extra memory passes.

The carry accumulates in f32 regardless of the input dtype (the GEMM
takes bf16 inputs and f32 accumulation), so the kernel is slightly MORE
accurate than the bf16-carry XLA scan it competes with.

Value semantics match :func:`contractn_tpu.ops.scan.mps_evaluate`
(split format, per-site L1-mean rescale) and are pinned against it in
``tests/test_pallas.py``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stabilize import MIN_NORM


def _kernel(mats_ref, x_ref, left_ref, v_out_ref, log_out_ref,
            v_scr, log_scr, *, phys_dim, bond_dim, n_steps, k_sites,
            acc_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        v_scr[:] = jnp.broadcast_to(
            left_ref[0].astype(acc_dtype), v_scr.shape
        )
        log_scr[:] = jnp.zeros_like(log_scr)

    gemm_dt = mats_ref.dtype
    v = v_scr[:]
    log = log_scr[:]
    for s_idx in range(k_sites):  # static unroll: k dots per grid step
        z = jnp.dot(
            v.astype(gemm_dt),
            mats_ref[s_idx],
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.DEFAULT,  # lint: explicit
        )  # (B, d*D)
        w = x_ref[s_idx].astype(acc_dtype)  # (B, d)
        acc = z[:, 0:bond_dim] * w[:, 0:1]
        for k in range(1, phys_dim):
            acc = acc + (z[:, k * bond_dim:(k + 1) * bond_dim]
                         * w[:, k:k + 1])
        norm = jnp.sum(jnp.abs(acc), axis=1, keepdims=True) / bond_dim
        safe = jnp.where(norm > MIN_NORM, norm, jnp.ones_like(norm))
        v = acc / safe
        log = log + jnp.log(safe.astype(jnp.float32))
    v_scr[:] = v
    log_scr[:] = log

    @pl.when(i == n_steps - 1)
    def _finish():
        v_out_ref[:] = v_scr[:]
        log_out_ref[:] = log_scr[:]


@functools.partial(jax.jit, static_argnames=("interpret", "acc_dtype",
                                              "sites_per_step"))
def mps_evaluate_epilogue(cores, left, right, x, interpret=False,
                          acc_dtype=None, sites_per_step=1):
    """Batched MPS evaluation via the fused-epilogue Pallas kernel.

    Args:
        cores: ``(N, d, D, D)`` stacked site tensors (bf16/f32).
        left, right: ``(D,)`` boundary vectors.
        x: ``(B, N, d)`` input weights.
        interpret: run under the Pallas interpreter (CPU tests).
        acc_dtype: carry/accumulator dtype (default f32; bf16 trades
            the per-step casts for carry precision).
        sites_per_step: sites advanced per grid step (static unroll of
            ``k`` dependent dots per body — fewer grid-step scheduling
            bubbles at the same math).

    Returns:
        Split-format ``(amp, log)`` of shape ``(B,)`` — identical
        semantics to :func:`contractn_tpu.ops.scan.mps_evaluate` with
        ``stabilize_every=1`` (an f32 carry; see module docstring).
    """
    n_sites, phys_dim, bond_dim, _ = cores.shape
    batch = x.shape[0]
    if acc_dtype is None:
        acc_dtype = jnp.float32
    acc_dtype = jnp.dtype(acc_dtype)
    ks = int(sites_per_step)
    if n_sites % ks:
        raise ValueError(
            f"n_sites={n_sites} must divide by sites_per_step={ks}")
    n_steps = n_sites // ks
    # (N, D_in, d*D_out): GEMM RHS per site
    mats = jnp.transpose(cores, (0, 2, 1, 3)).reshape(
        n_sites, bond_dim, phys_dim * bond_dim
    )
    x_t = jnp.swapaxes(x, 0, 1)  # (N, B, d)

    kernel = functools.partial(
        _kernel,
        phys_dim=phys_dim,
        bond_dim=bond_dim,
        n_steps=n_steps,
        k_sites=ks,
        acc_dtype=acc_dtype,
    )
    v, log = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((ks, bond_dim, phys_dim * bond_dim),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((ks, batch, phys_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, bond_dim), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((batch, bond_dim), lambda i: (0, 0)),
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, bond_dim), acc_dtype),
            # the log register stays f32 even under a bf16 carry: N
            # accumulated adds would lose the split-format exactness
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, bond_dim), acc_dtype),
            pltpu.VMEM((batch, 1), jnp.float32),
        ],
        interpret=interpret,
    )(mats, x_t, left.reshape(1, bond_dim).astype(cores.dtype))

    amp = jnp.einsum(
        "bi,i->b", v.astype(jnp.float32), right.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    log = log[:, 0]
    # final rescale, same as the scan paths
    norm = jnp.abs(amp)
    safe = jnp.where(norm > MIN_NORM, norm, jnp.ones_like(norm))
    return (amp / safe).astype(cores.dtype), log + jnp.log(safe)
