"""Mesh-sharded Born-machine training (data parallelism).

The exact-NLL loss of :mod:`contractn_tpu.models.born` is a mean over
independent per-sample amplitude scans plus one replicated ``log Z``
term, so data parallelism is the natural mesh axis: each device scans
its own shard of the batch, one ``psum`` folds the global mean into the
loss, and ``jax.grad`` differentiates straight through the collective
(the psum's transpose is a broadcast) — the same recipe as
:func:`contractn_tpu.parallel.training.make_sharded_train_step`.

The WHOLE optimization is one jitted ``lax.scan`` whose body is the
shard-mapped loss + adam update; parameters stay replicated, data stays
sharded ``P(dp)`` for the full run.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

import optax

from ..models.born import mps_log_amp2
from ..models.mps import MPS
from ..ops.scan import mps_norm


def make_sharded_born_loss(mesh, dp_axis="dp"):
    """Shard-mapped exact NLL: data over ``dp``, parameters replicated."""

    def local_loss(cores, left, right, x):
        la = mps_log_amp2(MPS(cores, left, right), x)
        total = lax.psum(jnp.sum(la), dp_axis)
        n = lax.psum(x.shape[0] * 1.0, dp_axis)
        m, ls = mps_norm(cores, left, right)
        return -(total / n - (jnp.log(jnp.real(m)) + ls))

    sharded = jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(dp_axis, None)),
        out_specs=P(),
        check_vma=False,
    )

    def loss(mps, data):
        return sharded(mps.cores, mps.left, mps.right, data)

    return loss


def fit_born_machine_sharded(mps, data, mesh, steps=1000, lr=0.01,
                             dp_axis="dp"):
    """Data-parallel exact-ML Born-machine training over a mesh.

    Full-batch per step (the exact gradient — minibatching stays on the
    single-device :func:`~contractn_tpu.models.born.fit_born_machine`).
    The per-step losses match the single-device run to machine
    precision (not bitwise: XLA reschedules reductions at the local
    batch size).  Returns ``(mps, losses)``.
    """
    n_dp = mesh.shape[dp_axis]
    data = jnp.asarray(data)
    if data.shape[0] % n_dp:
        raise ValueError(
            f"data size {data.shape[0]} not divisible by dp={n_dp}")
    data = jax.device_put(data, NamedSharding(mesh, P(dp_axis, None)))
    loss = make_sharded_born_loss(mesh, dp_axis)
    return _fit(loss, mps, data, int(steps), float(lr))


@partial(jax.jit, static_argnames=("loss", "steps"))
def _fit(loss, mps, data, steps, lr):
    opt = optax.adam(lr)
    state = opt.init(mps)

    def body(carry, _):
        m, s = carry
        value, g = jax.value_and_grad(loss)(m, data)
        updates, s = opt.update(g, s, m)
        return (optax.apply_updates(m, updates), s), value

    (mps, _), losses = lax.scan(body, (mps, state), None, length=steps)
    return mps, losses
