"""Native-autograd interop: backprop through ``contract()`` in torch / TF.

The reference dispatched its interpreted pairwise loop *into* each array
library (``/root/reference/contractn/einsum.py:24-87``), so a torch user
could backprop through ``contract()`` inside a torch graph for free.  This
framework runs every contraction through the one XLA engine instead — by
default foreign tensors are detached on entry, which was the single
documented parity departure.  This module closes it:

* ``backend="torch"`` operands with ``requires_grad=True`` are routed
  through a :class:`torch.autograd.Function` whose backward calls the
  **jitted JAX VJP** of the same stabilized program, so gradients flow
  natively into the surrounding torch graph.
* ``backend="tensorflow"`` operands are wrapped in ``tf.custom_gradient``,
  so a ``tf.GradientTape`` watching them records the contraction.

Both bridges recompute the forward inside the VJP (standard rematerialize:
the residual transfer host<->device would cost more than the FLOPs), and
both are cached per ``(einstr, shapes, dtypes, ...)`` signature exactly
like the forward program.  Split format is supported — ``(mantissa,
log_scale)`` are two differentiable outputs; note the pair is a redundant
representation of ``mantissa * exp(log_scale)``, so cotangents on each
component combine exactly as that product rule implies.

Complex gradients follow the shared JAX/torch convention for real-valued
losses (cotangent = conjugate Wirtinger derivative), so chained real
losses agree across the bridge.  Second-order autograd is not supported
(the backward is itself not differentiable by torch); call
``jax.hessian`` on the JAX side for that.
"""

from functools import lru_cache

import jax
import numpy as np

__all__ = ["torch_contract", "tf_contract"]


@lru_cache(maxsize=None)
def _diff_program(einstr, shapes, dtypes, optimize, memory_limit, split_format):
    """(jitted forward, jitted VJP) over a tuple of operand arrays."""
    from .engine import _build_jax_program

    pack, fn = _build_jax_program(
        einstr, shapes, optimize, memory_limit, split_format
    )

    def g(ts):
        return fn(*pack(list(ts)))

    def pull(ts, cts):
        _, vjp_fn = jax.vjp(g, ts)
        return vjp_fn(cts)[0]

    return jax.jit(g), jax.jit(pull)


def _np_in(t, dtype):
    """Host array from a torch/tf/numpy operand, optionally cast."""
    if hasattr(t, "detach"):  # torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=dtype)


def _zeros_like_out(out):
    return np.zeros(np.shape(out), np.asarray(out).dtype)


def torch_contract(
    einstr, tensors, dtype, optimize, memory_limit, split_format, wrap
):
    """Contract with native torch autograd (called from ``contract()``)."""
    import torch

    shapes = tuple(tuple(int(d) for d in t.shape) for t in tensors)
    arrs = tuple(_np_in(t, dtype) for t in tensors)
    dtypes = tuple(str(a.dtype) for a in arrs)
    fwd, bwd = _diff_program(
        einstr, shapes, dtypes, optimize, memory_limit, split_format
    )

    class _Contract(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *ts):
            out = fwd(arrs)
            ctx.save_for_backward()  # rematerialized backward: no residuals
            ctx._n_out = len(out) if isinstance(out, tuple) else 1
            if isinstance(out, tuple):
                return tuple(wrap(r) for r in out)
            return wrap(out)

        @staticmethod
        def backward(ctx, *grads):
            cts = tuple(
                np.zeros(shapes_out[i], dtypes_out[i])
                if g is None
                else _np_in(g, dtypes_out[i])
                for i, g in enumerate(grads)
            )
            gs = bwd(arrs, cts if ctx._n_out > 1 else cts[0])
            outs = []
            for t, g in zip(tensors, gs):
                if isinstance(t, torch.Tensor) and t.requires_grad:
                    outs.append(torch.from_numpy(np.array(g)).to(t.dtype))
                else:
                    outs.append(None)
            return tuple(outs)

    # output shapes/dtypes for zero-filling missing cotangents
    probe = jax.eval_shape(
        fwd, tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs)
    )
    if isinstance(probe, tuple):
        shapes_out = tuple(p.shape for p in probe)
        dtypes_out = tuple(str(p.dtype) for p in probe)
    else:
        shapes_out = (probe.shape,)
        dtypes_out = (str(probe.dtype),)

    # Function.apply receives every operand positionally so autograd hooks
    # the grad-requiring ones; backward maps grads back to all positions.
    return _Contract.apply(*tensors)


def tf_contract(
    einstr, tensors, dtype, optimize, memory_limit, split_format, wrap
):
    """Contract with TF GradientTape support (called from ``contract()``)."""
    import tensorflow as tf

    shapes = tuple(tuple(int(d) for d in t.shape) for t in tensors)
    # custom_gradient requires every positional input to be a tf.Tensor.
    # Variables MUST go through tf.convert_to_tensor (the tape records the
    # read and links gradients back); a numpy round-trip would sever it.
    def _as_tf(t):
        if isinstance(t, tf.Tensor):
            return t
        if hasattr(t, "detach"):  # torch operand in a tf-backend call
            t = _np_in(t, None)
        return tf.convert_to_tensor(t)

    tensors = tuple(_as_tf(t) for t in tensors)

    @tf.custom_gradient
    def f(*xs):
        arrs = tuple(_np_in(x, dtype) for x in xs)
        dtypes = tuple(str(a.dtype) for a in arrs)
        fwd, bwd = _diff_program(
            einstr, shapes, dtypes, optimize, memory_limit, split_format
        )
        out = fwd(arrs)

        def grad(*dys):
            cts = tuple(np.asarray(dy) for dy in dys)
            gs = bwd(arrs, cts if isinstance(out, tuple) else cts[0])
            return [
                tf.convert_to_tensor(np.asarray(g, a.dtype))
                for g, a in zip(gs, arrs)
            ]

        if isinstance(out, tuple):
            return tuple(wrap(r) for r in out), grad
        return wrap(out), grad

    return f(*tensors)
