"""Pipeline parallelism over MPS chain stages.

The third way to lay a long chain across a mesh, complementing
:mod:`contractn_tpu.parallel.sharded` (``sp``: segment products +
all-gather) and :mod:`contractn_tpu.parallel.tp` (bond columns + psum):
the chain's ``N`` sites are split into ``S`` contiguous *stages*, one per
device along a ``pp`` mesh axis, and the batch streams through them in
microbatches — the classic GPipe schedule mapped onto tensor-network
contraction.

At pipeline step ``t``, stage ``s`` contracts its site segment for
microbatch ``t - s`` and hands the ``(B_micro, D)`` boundary carry (plus
its split-format log register) to stage ``s + 1`` over the ICI via
``lax.ppermute``.  After ``n_micro + S - 1`` steps every microbatch has
flowed through the whole chain.

Communication per step is one ``(B_micro, D)`` vector per stage —
independent of segment length and ``D``-fold smaller than the
``(B, D, D)`` segment products the ``sp`` all-gather moves — so pipelining
wins when bonds are fat or batches long; ``sp`` wins at small ``D`` where
its single collective beats ``S``-step streaming latency.  Split-format
semantics are untouched: the per-site rescale cadence is identical to
:func:`~contractn_tpu.ops.scan.mps_evaluate`, and the log register rides
the pipe next to the carry, so results match the single-device kernel to
float associativity.

The reference has no multi-device execution of any kind (SURVEY.md §5,
distributed row); this subsystem is TPU-native additive capability.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.scan import _real, _stab_step
from ..ops.stabilize import dot_precision


def _check_pipeline_shapes(mesh, cores, x, n_micro, pp_axis):
    stages = mesh.shape.get(pp_axis, 1)
    if cores.shape[0] % stages:
        raise ValueError(
            f"n_sites={cores.shape[0]} must divide by the '{pp_axis}' mesh "
            f"axis (size {stages})"
        )
    if x.shape[0] % n_micro:
        raise ValueError(
            f"batch={x.shape[0]} must divide by n_micro={n_micro}"
        )


def _stage_body(cores_loc, left, right, x_loc, n_micro, axis):
    """Per-stage program: stream ``n_micro`` microbatches through the pipe.

    ``cores_loc (N_local, d, D, D)`` is this stage's site segment;
    ``x_loc (B, N_local, d)`` its site slice of the full batch.  Returns
    split-format ``(amp, log)`` of shape ``(B,)``, replicated across the
    ``pp`` axis (non-final stages contribute zeros; a psum replicates the
    final stage's result).
    """
    stages = jax.lax.axis_size(axis)
    sid = jax.lax.axis_index(axis)
    n_loc, phys_dim, bond, _ = cores_loc.shape
    batch = x_loc.shape[0]
    b_micro = batch // n_micro
    rdt = _real(cores_loc.dtype)
    prec = dot_precision(cores_loc.dtype)

    xm = x_loc.reshape(batch // b_micro, b_micro, n_loc, phys_dim)
    # Per-site GEMM layout (D, d*D), identical to mps_evaluate
    mats = cores_loc.transpose(0, 2, 1, 3).reshape(
        n_loc, bond, phys_dim * bond
    )
    left_b = jnp.broadcast_to(left.astype(cores_loc.dtype), (b_micro, bond))
    right_c = right.astype(cores_loc.dtype)

    def segment(v0, log0, x_seg):
        """Contract this stage's sites starting from carry ``(v0, log0)``."""

        def step(carry, inp):
            v, log = carry
            mat, xn = inp  # (D, d*D), (Bm, d)
            u = jnp.matmul(v, mat, precision=prec)
            u = u.reshape(b_micro, phys_dim, bond)
            v = jnp.einsum("bd,bdk->bk", xn, u, precision=prec)
            v, log = _stab_step(v, log, 1)
            return (v, log), None

        (v, log), _ = jax.lax.scan(
            step, (v0, log0), (mats, x_seg.swapaxes(0, 1))
        )
        return v, log

    perm = [(i, i + 1) for i in range(stages - 1)]
    is_first = sid == 0
    is_last = sid == stages - 1

    def pipe_step(carry, t):
        v_recv, log_recv, out_amp, out_log = carry
        mb = t - sid
        active = jnp.logical_and(mb >= 0, mb < n_micro)
        mb_c = jnp.clip(mb, 0, n_micro - 1)
        x_seg = jax.lax.dynamic_index_in_dim(xm, mb_c, keepdims=False)

        v_in = jnp.where(is_first, left_b, v_recv)
        log_in = jnp.where(is_first, jnp.zeros_like(log_recv), log_recv)
        v_out, log_out = segment(v_in, log_in, x_seg)
        v_out = jnp.where(active, v_out, jnp.zeros_like(v_out))
        log_out = jnp.where(active, log_out, jnp.zeros_like(log_out))

        # Final stage closes the chain and records the microbatch result
        amp = jnp.einsum("bi,i->b", v_out, right_c, precision=prec)
        amp, amp_log = _stab_step(amp, log_out, 1)
        write = jnp.logical_and(active, is_last)
        out_amp = jnp.where(
            write,
            jax.lax.dynamic_update_index_in_dim(out_amp, amp, mb_c, 0),
            out_amp,
        )
        out_log = jnp.where(
            write,
            jax.lax.dynamic_update_index_in_dim(out_log, amp_log, mb_c, 0),
            out_log,
        )

        # Hand the carry to the next stage (stage 0 receives zeros, unused)
        v_next = jax.lax.ppermute(v_out, axis, perm)
        log_next = jax.lax.ppermute(log_out, axis, perm)
        return (v_next, log_next, out_amp, out_log), None

    init = (
        jnp.zeros((b_micro, bond), cores_loc.dtype),
        jnp.zeros((b_micro,), rdt),
        jnp.zeros((n_micro, b_micro), cores_loc.dtype),
        jnp.zeros((n_micro, b_micro), rdt),
    )
    (_, _, out_amp, out_log), _ = jax.lax.scan(
        pipe_step, init, jnp.arange(n_micro + stages - 1)
    )
    # Only the final stage holds non-zero results; psum replicates them.
    out_amp = jax.lax.psum(out_amp, axis)
    out_log = jax.lax.psum(out_log, axis)
    return out_amp.reshape(batch), out_log.reshape(batch)


def pipeline_mps_forward(mesh, cores, left, right, x, n_micro=None,
                         pp_axis="pp"):
    """Batched MPS evaluation pipelined over chain stages.

    Args:
        mesh: mesh with a ``pp_axis`` of size ``S`` (other axes may
            exist; cores/x are replicated over them).
        cores: ``(N, d, D, D)`` site tensors; ``N % S == 0``.
        left, right: ``(D,)`` boundary vectors.
        x: ``(B, N, d)`` batch of inputs; ``B % n_micro == 0``.
        n_micro: microbatch count (default ``S``, the minimum that keeps
            every stage busy in the steady state; more microbatches
            shrink the pipeline-fill bubble ``(S-1)/(n_micro+S-1)`` at
            the cost of smaller per-step GEMMs).

    Returns:
        Split-format ``(amp, log)`` of shape ``(B,)`` each, replicated
        across the mesh.  Differentiable end-to-end — gradients stream
        backwards through the ``ppermute`` handoffs in reverse schedule
        order, so the same schedule serves training.
    """
    stages = mesh.shape[pp_axis]
    if n_micro is None:
        n_micro = stages
    _check_pipeline_shapes(mesh, cores, x, n_micro, pp_axis)
    fn = jax.shard_map(
        lambda c, l, r, xx: _stage_body(c, l, r, xx, n_micro, pp_axis),
        mesh=mesh,
        in_specs=(
            P(pp_axis, None, None, None),
            P(),
            P(),
            P(None, pp_axis, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(cores, left, right, x)


def make_pipeline_train_step(mesh, lr=1e-2, pp_axis="pp", n_micro=None):
    """Jitted SGD step with the forward pipelined over chain stages.

    Same log-MSE loss as :func:`~contractn_tpu.parallel.training.
    make_train_step`; the backward pass streams cotangents through the
    ``ppermute`` handoffs in reverse schedule order (its transpose), so
    gradients — and therefore updates — match the single-device step to
    float tolerance.
    """

    def full_loss(mps, x, y):
        amp, log = pipeline_mps_forward(
            mesh, mps.cores, mps.left, mps.right, x,
            n_micro=n_micro, pp_axis=pp_axis,
        )
        pred = jnp.log(jnp.abs(amp) + 1e-30) + log
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def train_step(mps, x, y):
        loss, grads = jax.value_and_grad(full_loss)(mps, x, y)
        new_mps = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, mps, grads
        )
        return new_mps, loss

    return train_step
