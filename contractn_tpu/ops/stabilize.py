"""Split-format numerical stabilization.

The framework's flagship auxiliary mechanism (reference ``einsum.py:89-114``
and paper §5 Algorithm 1): after every pairwise contraction the intermediate
is rescaled so its mean absolute element is 1, and the log of the accumulated
rescale factor rides along in a scalar register.  A 1000-term product that
would overflow float32 by hundreds of orders of magnitude is returned exactly
as ``(mantissa, log_scale)`` with representable range ~10^(±10^40).

All branches are ``jnp.where``-selected (shape-static, branchless), so under
``jit`` XLA fuses the rescale into the producing contraction — stabilization
costs one extra elementwise pass per intermediate, nothing more.

The guarded form keeps gradients clean: the untaken log/divide branch is
computed on a safe value, so no NaNs leak through ``jnp.where`` cotangents.
"""

import jax
import jax.numpy as jnp

# Below this total L1 mass a tensor is considered negligible and is left
# unscaled (avoids division by ~0; parity with reference ``einsum.py:94``).
MIN_NORM = 1e-7


def dot_precision(*dtypes):
    """Matmul precision for the given operand dtypes.

    TPU matmuls on float32 inputs default to bfloat16 multiplications,
    which is catastrophic for cancellation-heavy contractions (observed 6%
    relative error on random regular TNs).  A numerics library must default
    to full precision for float32/64 and complex operands; users chasing
    MXU speed opt in explicitly by passing bfloat16 tensors, which are
    unaffected by this setting.
    """
    for dt in dtypes:
        d = jnp.dtype(dt)
        if d in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)) or \
                jnp.issubdtype(d, jnp.complexfloating):
            return jax.lax.Precision.HIGHEST
    return None


def peinsum(subscripts, *operands, **kwargs):
    """``jnp.einsum`` with the package precision invariant applied.

    Every contraction in this package must request full precision for
    f32/f64/complex operands (CLAUDE.md invariant; TPUs otherwise run
    f32 matmuls as bf16 passes).  This wrapper derives the precision from
    the operand dtypes so call sites cannot forget it — the lint test
    ``tests/test_precision_lint.py`` rejects bare ``jnp.einsum`` calls.
    """
    ops = [jnp.asarray(o) for o in operands]
    kwargs.setdefault("precision", dot_precision(*(o.dtype for o in ops)))
    return jnp.einsum(subscripts, *ops, **kwargs)


def stabilize(tensor, log_scale):
    """Move the scale of ``tensor`` into ``log_scale``; mean|out| becomes 1.

    Returns ``(rescaled, new_log_scale)`` with
    ``rescaled * exp(new_log_scale) == tensor * exp(log_scale)``.
    """
    norm = jnp.sum(jnp.abs(tensor))
    rescale = norm / tensor.size
    apply = norm > MIN_NORM
    safe = jnp.where(apply, rescale, jnp.ones_like(rescale))
    # safe == 1 when not applying, so the divide/log are no-ops there
    return tensor / safe, log_scale + jnp.log(safe)


def stabilize_batched(tensor, log_scale, batch_ndim):
    """Per-slice stabilization over leading batch axes.

    ``tensor`` has ``batch_ndim`` leading batch dimensions; each slice gets
    its own rescale, and ``log_scale`` (shape = batch shape) accumulates the
    per-slice logs.  This is the building block for tree-reduced chain
    contraction, where every pairwise product in a level is an independent
    intermediate.
    """
    reduce_axes = tuple(range(batch_ndim, tensor.ndim))
    slice_size = 1
    for ax in reduce_axes:
        slice_size *= tensor.shape[ax]
    norm = jnp.sum(jnp.abs(tensor), axis=reduce_axes)
    rescale = norm / slice_size
    apply = norm > MIN_NORM
    safe = jnp.where(apply, rescale, jnp.ones_like(rescale))
    expand = safe.reshape(safe.shape + (1,) * len(reduce_axes))
    return tensor / expand, log_scale + jnp.log(safe)


def destabilize(tensor, log_scale):
    """Fold the log-scale register back into the tensor."""
    return tensor * jnp.exp(log_scale)
