"""Tensor-parallel (bond-dimension) sharding for chain contraction.

When the bond dimension is too large for one chip, site matrices shard
column-wise over a ``tp`` mesh axis.  The product then follows the classic
column-parallel pattern: each step computes the local column block
``Z_local = P @ M_local`` and an all-gather over ``tp`` reassembles the
replicated running product — the collective XLA would insert for a matmul
whose contracting dimension is sharded.  Combined with ``dp`` (batch) and
``sp`` (chain segments, :mod:`contractn_tpu.parallel.sharded`) this gives a
full 3-axis ``dp x sp x tp`` training step.

The reference has no distribution of any kind (SURVEY.md §2); bond sharding
is an additive capability of this framework.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.stabilize import stabilize_batched
from ..ops.stabilize import dot_precision, peinsum


def tp_segment_product(mats_local, tp_axis):
    """Stabilized product of column-sharded site matrices.

    Args:
        mats_local: ``(B, N_local, D, D/tp)`` this shard's column blocks of
            the per-sample site matrices.
        tp_axis: mesh axis name sharding the last (column) dimension.

    Returns:
        ``(product, log)`` with ``product`` the REPLICATED ``(B, D, D)``
        running product and per-sample ``log`` scales ``(B,)``.
    """
    batch, _, bond, _ = mats_local.shape
    p0 = jnp.broadcast_to(
        jnp.eye(bond, dtype=mats_local.dtype), (batch, bond, bond)
    )
    log0 = jnp.zeros((batch,), jnp.float32 if mats_local.dtype != jnp.float64
                     else jnp.float64)

    def step(carry, m_local):
        p, log = carry
        z_local = jnp.matmul(p, m_local,
                             precision=dot_precision(p.dtype))
        p = jax.lax.all_gather(z_local, tp_axis, axis=-1, tiled=True)
        p, log = stabilize_batched(p, log, 1)
        return (p, log), None

    (p, log), _ = jax.lax.scan(step, (p0, log0), mats_local.swapaxes(0, 1))
    return p, log


def segment_mps_forward_3d(cores_local, left, right, x_local,
                           sp_axis="sp", tp_axis="tp"):
    """Per-shard forward over a ``(dp, sp, tp)`` mesh.

    ``cores_local``: ``(N_local, d, D, D/tp)`` — sites sharded over ``sp``,
    bond columns over ``tp``.  ``x_local``: ``(B_local, N_local, d)`` —
    batch over ``dp``, sites over ``sp``.  Returns split-format ``(amp,
    log)`` of shape ``(B_local,)``, replicated over ``sp`` and ``tp``.
    """
    # Column-sharded site matrices, one einsum
    mats_local = peinsum("bnd,ndij->bnij", x_local, cores_local)
    seg, seg_log = tp_segment_product(mats_local, tp_axis)  # replicated cols

    n_seg = jax.lax.axis_size(sp_axis)
    all_seg = jax.lax.all_gather(seg, sp_axis)      # (n_sp, B, D, D)
    all_log = jax.lax.all_gather(seg_log, sp_axis)  # (n_sp, B)

    batch = seg.shape[0]
    v = jnp.broadcast_to(left.astype(seg.dtype), (batch, left.shape[0]))
    log = jnp.sum(all_log, axis=0)
    for k in range(n_seg):
        v = peinsum("bi,bij->bj", v, all_seg[k])
        v, log = stabilize_batched(v, log, 1)
    amp = peinsum("bi,i->b", v, right.astype(seg.dtype))
    return stabilize_batched(amp, log, 1)


def make_tp_train_step(mesh, lr=1e-2, dp_axis="dp", sp_axis="sp",
                       tp_axis="tp"):
    """Jitted SGD step over a 3-axis ``(dp, sp, tp)`` mesh.

    Shardings: MPS cores ``P(sp, None, None, tp)`` (sites x bond columns),
    inputs ``P(dp, sp, None)``, targets ``P(dp)``.  Gradients flow through
    the tp all-gathers (transpose: dynamic-slice) and the dp loss psum.
    """

    def local_loss(cores, left, right, x, y):
        amp, log = segment_mps_forward_3d(
            cores, left, right, x, sp_axis, tp_axis
        )
        pred = jnp.log(jnp.abs(amp) + 1e-30) + log
        total = jax.lax.psum(jnp.sum((pred - y) ** 2), dp_axis)
        n = jax.lax.psum(jnp.float32(x.shape[0]), dp_axis)
        return total / n

    sharded_loss = jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(
            P(sp_axis, None, None, tp_axis),
            P(),
            P(),
            P(dp_axis, sp_axis, None),
            P(dp_axis),
        ),
        out_specs=P(),
        check_vma=False,
    )

    def full_loss(mps, x, y):
        return sharded_loss(mps.cores, mps.left, mps.right, x, y)

    @jax.jit
    def _step(mps, x, y):
        loss, grads = jax.value_and_grad(full_loss)(mps, x, y)
        new_mps = jax.tree_util.tree_map(lambda p, g: p - lr * g, mps, grads)
        return new_mps, loss

    def train_step(mps, x, y):
        from .sharded import check_divisible

        check_divisible(mesh, mps.cores, x, dp_axis, sp_axis, tp_axis)
        return _step(mps, x, y)

    return train_step
