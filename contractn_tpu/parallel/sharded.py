"""Mesh-sharded MPS contraction.

Two named axes:

* ``dp`` — data parallel over the input batch.  Embarrassingly parallel;
  the only collective is the loss/grad reduction.
* ``sp`` — sequence parallel over chain *sites*.  Each device contracts its
  contiguous segment of the chain into a per-sample ``(D, D)`` segment
  product (a log-depth batched tree, MXU-friendly), then the ``n_sp``
  segment results are all-gathered (tiny: ``n_sp * B_local * D^2``) and
  folded with the boundary vectors.  Per-sample log-scale registers ride
  along and simply add across segments, so split-format semantics survive
  sharding unchanged.

This is the TPU-native answer to "scale the number of cores n" — the
reference's only scaling axis (SURVEY.md §5, long-context row): O(N/n_sp)
compute depth per device, one all-gather of O(D^2) per sample on the ICI.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.chain import tree_chain_product
from ..ops.stabilize import stabilize_batched
from ..ops.stabilize import peinsum


def check_divisible(mesh, cores, x, dp_axis, sp_axis, tp_axis=None):
    """Fail early with actionable messages instead of deep XLA errors."""
    sp = mesh.shape.get(sp_axis, 1)
    dp = mesh.shape.get(dp_axis, 1)
    if cores.shape[0] % sp:
        raise ValueError(
            f"n_sites={cores.shape[0]} must divide by the '{sp_axis}' mesh "
            f"axis (size {sp})"
        )
    if x.shape[0] % dp:
        raise ValueError(
            f"batch={x.shape[0]} must divide by the '{dp_axis}' mesh axis "
            f"(size {dp})"
        )
    if tp_axis is not None:
        tp = mesh.shape.get(tp_axis, 1)
        if cores.shape[-1] % tp:
            raise ValueError(
                f"bond_dim={cores.shape[-1]} must divide by the "
                f"'{tp_axis}' mesh axis (size {tp})"
            )


def segment_mps_forward(cores_seg, left, right, x_seg, axis_name="sp"):
    """Per-shard body: contract a site segment, combine across ``axis_name``.

    Args:
        cores_seg: ``(N_local, d, D, D)`` this shard's sites.
        left, right: ``(D,)`` boundary vectors (replicated).
        x_seg: ``(B_local, N_local, d)`` this shard's inputs.
        axis_name: mesh axis spanning the chain segments.

    Returns:
        ``(amp, log)`` of shape ``(B_local,)``: split-format amplitudes,
        replicated across ``axis_name``.
    """
    # Site matrices for this segment: one einsum, (B, N_local, D, D)
    mats = peinsum("bnd,ndij->bnij", x_seg, cores_seg)
    seg, seg_log = tree_chain_product(mats)  # (B, D, D), (B,)

    n_seg = jax.lax.axis_size(axis_name)
    all_seg = jax.lax.all_gather(seg, axis_name)        # (n_sp, B, D, D)
    all_log = jax.lax.all_gather(seg_log, axis_name)    # (n_sp, B)

    batch = seg.shape[0]
    v = jnp.broadcast_to(left.astype(seg.dtype), (batch, left.shape[0]))
    log = jnp.sum(all_log, axis=0)
    for k in range(n_seg):  # n_sp is small and static: unrolled fold
        v = peinsum("bi,bij->bj", v, all_seg[k])
        v, log = stabilize_batched(v, log, 1)
    amp = peinsum("bi,i->b", v, right.astype(seg.dtype))
    return stabilize_batched(amp, log, 1)


def sharded_mps_forward(mesh, cores, left, right, x,
                        dp_axis="dp", sp_axis="sp"):
    """Shard-mapped batched MPS evaluation over a ``(dp, sp)`` mesh.

    ``cores`` shards over sites on ``sp``; ``x`` shards over batch on ``dp``
    and sites on ``sp``.  Returns split-format ``(amp, log)`` sharded over
    ``dp`` (replicated over ``sp``).
    """
    check_divisible(mesh, cores, x, dp_axis, sp_axis)
    fn = jax.shard_map(
        lambda c, l, r, xx: segment_mps_forward(c, l, r, xx, sp_axis),
        mesh=mesh,
        in_specs=(
            P(sp_axis, None, None, None),
            P(),
            P(),
            P(dp_axis, sp_axis, None),
        ),
        out_specs=(P(dp_axis), P(dp_axis)),
        check_vma=False,
    )
    return fn(cores, left, right, x)
