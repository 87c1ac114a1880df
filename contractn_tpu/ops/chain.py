"""Stabilized matrix-chain contraction via log-depth tree reduction.

The reference's headline example — a vector pushed through 1000 identical 3x3
matrices with per-step rescaling (``README.md:63-77``) — is an interpreted
loop of 1000 tiny sequential GEMMs.  On TPU that shape is wrong twice over:
sequential dependency (no MXU utilization) and 1000 separately dispatched
kernels.

The TPU-native formulation exploits associativity: rescaled pairs compose as
``(A, la) . (B, lb) = (stab(A @ B), la + lb + log kappa)``, so the chain
reduces as a binary tree — ceil(log2 N) levels, each ONE batched matmul over
the whole level plus a fused per-matrix rescale.  Wall-clock depth drops from
O(N) to O(log N) and every level is a large batched GEMM that XLA tiles onto
the systolic array.  Because the final stabilize normalizes the mantissa to
mean |element| = 1, the split-format output is *canonical* — identical
(up to float rounding) to the reference's sequential left-to-right loop.

An extra leading batch axis is supported throughout, so a vmapped model can
contract thousands of parameter sets with one compiled program.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .stabilize import dot_precision, stabilize_batched


def _real_dtype(dtype):
    """Real counterpart of a (possibly complex) floating dtype."""
    return np.empty(0, dtype=dtype).real.dtype


def _pad_pow2(mats, logs):
    """Pad the chain axis with identity matrices up to a power of two."""
    n, d = mats.shape[-3], mats.shape[-1]
    target = 1 << max(0, (n - 1)).bit_length()
    if target == n:
        return mats, logs
    pad = target - n
    eye = jnp.broadcast_to(jnp.eye(d, dtype=mats.dtype), (*mats.shape[:-3], pad, d, d))
    mats = jnp.concatenate([mats, eye], axis=-3)
    logs = jnp.concatenate([logs, jnp.zeros((*logs.shape[:-1], pad), logs.dtype)], -1)
    return mats, logs


def tree_chain_product(mats, logs=None):
    """Product of a stack of square matrices with per-level stabilization.

    Args:
        mats: ``(..., N, D, D)`` stack; leading axes are batch dimensions.
        logs: optional ``(..., N)`` per-matrix log scales (default zeros).

    Returns:
        ``(product, log_scale)`` with shapes ``(..., D, D)`` / ``(...,)`` such
        that the true product is ``product * exp(log_scale)`` (before any
        final normalization — callers stabilize the result as needed).
    """
    if logs is None:
        logs = jnp.zeros(mats.shape[:-2], _real_dtype(mats.dtype))
    mats, logs = _pad_pow2(mats, logs)
    n = mats.shape[-3]
    batch_ndim = mats.ndim - 3
    levels = int(math.log2(n)) if n > 1 else 0
    for _ in range(levels):
        half = mats.shape[-3] // 2
        a = mats[..., 0::2, :, :]
        b = mats[..., 1::2, :, :]
        prod = jnp.matmul(a, b, precision=dot_precision(mats.dtype))
        logs = logs[..., 0::2] + logs[..., 1::2]
        prod, logs = stabilize_batched(prod, logs, batch_ndim + 1)
        mats = prod
        assert mats.shape[-3] == half
    return mats[..., 0, :, :], logs[..., 0]


def stabilized_ring_product(mats):
    """Trace of a cyclic matrix product, ``tr(M_1 ... M_N)``, in split form.

    Tree-reduces the ring's matrices like an open chain, then closes the
    loop with a stabilized trace.  Args/batching as
    :func:`tree_chain_product`.  Returns ``(mantissa, log)`` scalars (per
    batch element).
    """
    batch_ndim = mats.ndim - 3
    prod, log = tree_chain_product(mats)
    tr = jnp.trace(prod, axis1=-2, axis2=-1)
    return stabilize_batched(tr, log, batch_ndim)


def stabilized_hadamard_product(stack, sum_output=False):
    """Elementwise product of N same-shape tensors with per-level rescaling.

    This is the lowering of a pure copy-tensor (hyperedge) contraction like
    the reference's order-101 copy example: ``"a,a,...,a->a"`` is an N-way
    Hadamard product.  A flat ``prod`` over the stack could underflow long
    before finishing; reducing the stack as a binary tree with a global
    rescale per level keeps every intermediate near unit scale, exactly like
    the pairwise-stabilized reference loop.

    Args:
        stack: ``(N, ...)`` stack of identical-shape tensors.
        sum_output: if True, sum the final product to a scalar (the einsum
            output ``->`` case) before the last stabilization.

    Returns:
        ``(mantissa, log_scale)`` split-format pair.
    """
    n = stack.shape[0]
    target = 1 << max(0, (n - 1)).bit_length()
    if target != n:
        pad_shape = (target - n,) + stack.shape[1:]
        stack = jnp.concatenate([stack, jnp.ones(pad_shape, stack.dtype)], axis=0)
    # Per-entry log registers: a shared rescale would be multiplied back in
    # once per remaining factor, so each entry carries its own scale.
    logs = jnp.zeros((target,), _real_dtype(stack.dtype))
    levels = int(math.log2(target)) if target > 1 else 0
    for _ in range(levels):
        half = stack.shape[0] // 2
        stack = stack[:half] * stack[half:]
        logs = logs[:half] + logs[half:]
        stack, logs = stabilize_batched(stack, logs, 1)
    result, log_scale = stack[0], logs[0]
    if sum_output:
        result = jnp.sum(result)
    return stabilize_batched(result, log_scale, 0)


def _scan_chain_small(mats, left, right, prec):
    """Sequential stabilized chain for the small-D regime (see caller).

    Same split-format invariant (mean ``|mantissa| = 1``, one rescale
    per step) as the tree path; the rescale ORDER differs, which is
    allowed — only ``mantissa * exp(log)`` is pinned.
    """
    rdt = _real_dtype(mats.dtype)

    def make_step(combine):
        def step(carry, m):
            acc, log = carry
            acc = combine(acc, m)
            acc, log = stabilize_batched(acc, log, 0)
            return (acc, log), None

        return step

    log0 = jnp.zeros((), rdt)
    if left is not None:
        step = make_step(
            lambda v, m: jnp.einsum("i,ij->j", v, m, precision=prec))
        (res, log), _ = jax.lax.scan(
            step, (left.astype(mats.dtype), log0), mats)
        if right is not None:
            res = jnp.einsum("j,j->", res, right.astype(res.dtype),
                             precision=prec)
    elif right is not None:
        step = make_step(
            lambda v, m: jnp.einsum("ij,j->i", m, v, precision=prec))
        (res, log), _ = jax.lax.scan(
            step, (right.astype(mats.dtype), log0), mats[::-1])
    else:
        step = make_step(
            lambda acc, m: jnp.matmul(acc, m, precision=prec))
        eye = jnp.eye(mats.shape[-1], dtype=mats.dtype)
        (res, log), _ = jax.lax.scan(step, (eye, log0), mats)
    return stabilize_batched(res, log, 0)


def stabilized_chain_product(mats, left=None, right=None):
    """Contract ``left^T . (M_1 M_2 ... M_N) . right`` in split format.

    Args:
        mats: ``(..., N, D, D)`` matrix stack (batch axes leading).
        left: optional ``(..., D)`` row vector applied from the left.
        right: optional ``(..., D)`` column vector applied from the right.

    Returns:
        ``(mantissa, log_scale)``: mantissa has mean absolute value 1 (split
        format invariant) and the exact result is ``mantissa * exp(log)``.
        Result shape: scalar if both boundary vectors are given, ``(D,)`` if
        one is, ``(D, D)`` if neither (per batch element).
    """
    batch_ndim = mats.ndim - 3
    prec = dot_precision(mats.dtype)
    n, d = mats.shape[-3], mats.shape[-1]
    if batch_ndim == 0 and d <= 32 and n >= 32:
        # Small matrices, long unbatched chain: the log-depth tree emits
        # log2(N) distinct-shape HLO levels and dominates COLD compile
        # (measured: 0.8 s of the 300-node bench's 1.3 s), while a
        # lax.scan is O(1) HLO and its sequential tiny matmuls are
        # runtime-negligible at D <= 32.  Boundary vectors fold into
        # the carry so the scan works on (D,) instead of (D, D).
        return _scan_chain_small(mats, left, right, prec)
    result, log_scale = tree_chain_product(mats)
    if left is not None and right is not None:
        vec = jnp.einsum("...i,...ij->...j", left, result, precision=prec)
        result = jnp.einsum("...j,...j->...", vec, right, precision=prec)
    elif left is not None:
        result = jnp.einsum("...i,...ij->...j", left, result, precision=prec)
    elif right is not None:
        result = jnp.einsum("...ij,...j->...i", result, right, precision=prec)
    return stabilize_batched(result, log_scale, batch_ndim)
