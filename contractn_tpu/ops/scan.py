"""Stabilized sequential contractions as ``lax.scan`` programs.

Long inhomogeneous chains (site-dependent MPS cores, input-dependent site
matrices) contract as a scan whose carry holds ``(state, log_scale)`` — the
split-format register rides in the carry, so arbitrarily long products never
leave the representable range.  This is the TPU-native analog of the
reference's interpreted pairwise loop (``einsum.py:341-391``): one compiled
program, O(1) compile size in the chain length, per-step rescale fused by XLA.

The input-weighted evaluation step is deliberately shaped as a GEMM
``(B, D) x (D, d*D)`` so the MXU does the work; the input contraction that
follows is a cheap VPU reduction.  Materializing per-site matrices
``sum_d x[n,d] A_n[d]`` (B*D*D per site of HBM traffic) is avoided entirely.
"""

import jax
import jax.numpy as jnp

from .stabilize import MIN_NORM, dot_precision


def _stab_step(state, log_scale, batch_ndim):
    """Per-step rescale of the scan carry (same math as ops.stabilize)."""
    reduce_axes = tuple(range(batch_ndim, state.ndim))
    size = 1
    for ax in reduce_axes:
        size *= state.shape[ax]
    norm = jnp.sum(jnp.abs(state), axis=reduce_axes)
    rescale = norm / size
    safe = jnp.where(norm > MIN_NORM, rescale, jnp.ones_like(rescale))
    expand = safe.reshape(safe.shape + (1,) * len(reduce_axes))
    return state / expand, log_scale + jnp.log(safe)


def scan_matrix_chain(mats, init=None):
    """Stabilized left-to-right product of ``(N, D, D)`` matrices via scan.

    Lower compile cost than the tree reduction for very long chains and the
    building block for pipelined/sharded execution.  Returns
    ``(product, log_scale)``.
    """
    d = mats.shape[-1]
    if init is None:
        init = jnp.eye(d, dtype=mats.dtype)

    prec = dot_precision(mats.dtype)

    def step(carry, m):
        acc, log = carry
        acc = jnp.matmul(acc, m, precision=prec)
        acc, log = _stab_step(acc, log, 0)
        return (acc, log), None

    (acc, log), _ = jax.lax.scan(
        step, (init, jnp.zeros((), _real(mats.dtype))), mats
    )
    return acc, log


def mps_evaluate(cores, left, right, x, stabilize_every=1,
                 remat_segments=None):
    """Batched MPS evaluation: ``psi(x_b) = l^T (prod_n sum_d x[b,n,d] A_n[d]) r``.

    Args:
        cores: ``(N, d, D, D)`` site tensors.
        left: ``(D,)`` left boundary vector.
        right: ``(D,)`` right boundary vector.
        x: ``(B, N, d)`` input weights per site (one-hot for discrete data,
            arbitrary feature maps otherwise).
        stabilize_every: rescale cadence (1 = every site, matching the
            reference's per-step stabilization; larger values trade a bit of
            dynamic range for fewer VPU passes).
        remat_segments: if set, the chain is scanned as that many
            checkpointed segments — backward-pass memory drops from O(N)
            stored carries to O(remat_segments + N/remat_segments) at the
            cost of one extra forward recompute (the standard sqrt(N)
            rematerialization trade for long sequences).

    Returns:
        ``(mantissa, log_scale)`` of shape ``(B,)`` each: the amplitude in
        split format, ``psi = mantissa * exp(log_scale)``.

    The hot op per site is ``v @ A_n`` with ``A_n`` reshaped ``(D, d*D)`` —
    a ``(B, D) x (D, d*D)`` GEMM on the MXU — followed by the ``x`` weighting
    as a VPU reduction.  HBM traffic per site is just the core itself.
    """
    n_sites, phys_dim, bond_dim, _ = cores.shape
    batch = x.shape[0]
    v0 = jnp.broadcast_to(left.astype(cores.dtype), (batch, bond_dim))
    log0 = jnp.zeros((batch,), _real(cores.dtype))

    prec = dot_precision(cores.dtype)

    def step(carry, inputs):
        v, log, i = carry[0], carry[1], carry[2]
        core, xn = inputs  # (d, D, D), (B, d)
        # MXU: (B, D) @ (D, d*D)
        u = jnp.matmul(
            v,
            core.transpose(1, 0, 2).reshape(bond_dim, phys_dim * bond_dim),
            precision=prec,
        )
        u = u.reshape(batch, phys_dim, bond_dim)
        # VPU: weight by the site input
        v = jnp.einsum("bd,bdk->bk", xn, u, precision=prec)
        do_stab = (i % stabilize_every) == 0
        vs, logs = _stab_step(v, log, 1)
        v = jnp.where(do_stab, vs, v)
        log = jnp.where(do_stab, logs, log)
        return (v, log, i + 1), None

    init = (v0, log0, jnp.zeros((), jnp.int32))
    xs = (cores, x.swapaxes(0, 1))
    if remat_segments and remat_segments > 1:
        k = remat_segments
        while n_sites % k:
            k -= 1
        seg = n_sites // k

        @jax.checkpoint
        def segment(carry, seg_xs):
            return jax.lax.scan(step, carry, seg_xs)

        seg_xs = jax.tree_util.tree_map(
            lambda a: a.reshape((k, seg) + a.shape[1:]), xs
        )
        (v, log, _), _ = jax.lax.scan(segment, init, seg_xs)
    else:
        (v, log, _), _ = jax.lax.scan(step, init, xs)
    amp = jnp.einsum("bi,i->b", v, right.astype(cores.dtype),
                     precision=prec)
    amp, log = _stab_step(amp, log, 1)
    return amp, log


def mps_evaluate_premix(cores, left, right, x, stabilize_every=1):
    """Batched MPS evaluation with the input weighting INSIDE the GEMM.

    Algebraic identity: ``sum_d x_d (v A_d) = (x (x) v) A_flat`` where
    ``A_flat ((d D), D)`` stacks the ``A_d`` blocks row-wise and
    ``x (x) v`` is the per-sample outer product ``(B, d D)``.  The
    per-site GEMM becomes ``(B, dD) x (dD, D)`` — contraction depth
    ``K = d D`` (2x the bond, a full or multi-pass MXU) — and the
    weighting is a cheap elementwise producer that XLA fuses into the
    GEMM's input, instead of an epilogue reduction pass over the
    ``(B, d, D)`` intermediate that (measured, D=128) fails to fuse and
    goes through HBM.

    Measured on the v5e: D=64 bf16 forward 72 effective TFLOP/s (the
    shape-tuned winner, ~98% of the bare-chain ceiling).  At D=128 the
    premixed ``(B, 256)`` carry layout is PATHOLOGICAL (10.2 TFLOP/s,
    re-confirmed round 3) — use :func:`mps_evaluate_perphys` there
    (``mps_evaluate_auto`` picks correctly).

    Same split-format semantics as :func:`mps_evaluate`.
    """
    n_sites, phys_dim, bond_dim, _ = cores.shape
    batch = x.shape[0]
    v0 = jnp.broadcast_to(left.astype(cores.dtype), (batch, bond_dim))
    log0 = jnp.zeros((batch,), _real(cores.dtype))
    prec = dot_precision(cores.dtype)
    mats = cores.reshape(n_sites, phys_dim * bond_dim, bond_dim)

    def step(carry, inputs):
        v, log, i = carry
        mat, xn = inputs  # (d*D, D), (B, d)
        vx = (xn[:, :, None].astype(v.dtype) * v[:, None, :]).reshape(
            batch, phys_dim * bond_dim
        )
        v = jnp.matmul(vx, mat, precision=prec)
        do_stab = (i % stabilize_every) == 0
        vs, logs = _stab_step(v, log, 1)
        v = jnp.where(do_stab, vs, v)
        log = jnp.where(do_stab, logs, log)
        return (v, log, i + 1), None

    init = (v0, log0, jnp.zeros((), jnp.int32))
    (v, log, _), _ = jax.lax.scan(step, init, (mats, x.swapaxes(0, 1)))
    amp = jnp.einsum("bi,i->b", v, right.astype(cores.dtype),
                     precision=prec)
    amp, log = _stab_step(amp, log, 1)
    return amp, log


def mps_evaluate_perphys(cores, left, right, x, stabilize_every=1):
    """Batched MPS evaluation as per-physical-index square GEMMs.

    ``v' = sum_d x_d (v A_d)`` computed as ``d`` separate
    ``(B, D) x (D, D)`` GEMMs with the ``x_d`` row scaling fused into
    each GEMM's epilogue (an unrolled static loop — ``d`` is small).
    At large bond the ``(B, d, D)`` intermediate of the single-GEMM
    layout stops fusing and round-trips HBM (measured: D=128 falls to
    33 eff TFLOP/s); this form keeps everything in the MXU pipeline.

    Measured on the v5e (round 2): D=128 bf16 forward 2.93 ms =
    92 effective TFLOP/s (99% of the bare square-GEMM chain rate).
    """
    n_sites, phys_dim, bond_dim, _ = cores.shape
    batch = x.shape[0]
    v0 = jnp.broadcast_to(left.astype(cores.dtype), (batch, bond_dim))
    log0 = jnp.zeros((batch,), _real(cores.dtype))
    prec = dot_precision(cores.dtype)

    def step(carry, inputs):
        v, log, i = carry
        core, xn = inputs  # (d, D, D), (B, d)
        acc = xn[:, 0:1].astype(v.dtype) * jnp.matmul(
            v, core[0], precision=prec
        )
        for k in range(1, phys_dim):
            acc = acc + xn[:, k:k + 1].astype(v.dtype) * jnp.matmul(
                v, core[k], precision=prec
            )
        do_stab = (i % stabilize_every) == 0
        vs, logs = _stab_step(acc, log, 1)
        v = jnp.where(do_stab, vs, acc)
        log = jnp.where(do_stab, logs, log)
        return (v, log, i + 1), None

    init = (v0, log0, jnp.zeros((), jnp.int32))
    (v, log, _), _ = jax.lax.scan(step, init, (cores, x.swapaxes(0, 1)))
    amp = jnp.einsum("bi,i->b", v, right.astype(cores.dtype),
                     precision=prec)
    amp, log = _stab_step(amp, log, 1)
    return amp, log


def mps_evaluate_auto(cores, left, right, x, stabilize_every=1):
    """Shape-tuned batched evaluation (the measured v5e winners).

    ``d * D <= 128``: :func:`mps_evaluate_premix` — the flattened
    ``(B, dD) x (dD, D)`` GEMM uses the MXU's full contraction depth
    (D=64: 69 eff TFLOP/s, 98% of the bare-chain ceiling).  Larger
    ``d * D``: :func:`mps_evaluate_perphys` (D=128: 92 eff TFLOP/s).
    """
    _, phys_dim, bond_dim, _ = cores.shape
    if phys_dim * bond_dim <= 128:
        return mps_evaluate_premix(cores, left, right, x,
                                   stabilize_every=stabilize_every)
    return mps_evaluate_perphys(cores, left, right, x,
                                stabilize_every=stabilize_every)


def mps_evaluate_fused(cores, left, right, x, sites_per_step=2,
                       stabilize_every=1):
    """Batched MPS evaluation with ``k`` sites fused per scan step.

    Identical math to :func:`mps_evaluate`, restructured for the MXU's
    latency envelope: the per-site GEMM ``(B, D) x (D, d*D)`` has
    contraction depth ``K = D``, so a dependent chain of N of them is
    latency-bound.  Fusing ``k`` sites pre-contracts core blocks
    ``T_g = A_{gk} A_{gk+1} ... `` over their shared bonds (cheap: no
    batch dimension) and premixes the inputs ``w[b, g] = x_{gk} (x)
    x_{gk+1} ...``, so the scan runs ``N/k`` steps of a ``k``-times wider
    GEMM ``(B, D) x (D, d^k D)`` — same total multiply count for
    ``d = k = 2``, half the sequential dependency depth.

    Measured on the v5e (round 2): 1000x64x4096 bf16 forward 1.20 ms ->
    0.63 ms with ``k = 2`` (57 -> 109 effective TFLOP/s).
    """
    n_sites, phys_dim, bond_dim, _ = cores.shape
    k = sites_per_step
    if n_sites % k:
        raise ValueError(
            f"sites_per_step={k} must divide n_sites={n_sites}"
        )
    batch = x.shape[0]
    groups = n_sites // k
    prec = dot_precision(cores.dtype)

    blocks = cores.reshape(groups, k, phys_dim, bond_dim, bond_dim)
    t = blocks[:, 0]  # (G, d, D, D)
    for s in range(1, k):
        t = jnp.einsum("g...ij,gbjk->g...bik", t, blocks[:, s],
                       precision=prec)
    # (G, d^k, D, D) -> GEMM layout (G, D, d^k * D)
    t = t.reshape(groups, phys_dim ** k, bond_dim, bond_dim)
    mats = t.transpose(0, 2, 1, 3).reshape(
        groups, bond_dim, phys_dim ** k * bond_dim
    )

    xb = x.reshape(batch, groups, k, phys_dim)
    w = xb[:, :, 0]
    for s in range(1, k):
        w = (w[..., :, None] * xb[:, :, s][..., None, :]).reshape(
            batch, groups, -1
        )  # (B, G, d^s+1); C-order matches the block reshape above

    v0 = jnp.broadcast_to(left.astype(cores.dtype), (batch, bond_dim))
    log0 = jnp.zeros((batch,), _real(cores.dtype))

    def step(carry, inputs):
        v, log, i = carry
        mat, wn = inputs  # (D, d^k D), (B, d^k)
        u = jnp.matmul(v, mat, precision=prec)
        u = u.reshape(batch, phys_dim ** k, bond_dim)
        v = jnp.einsum("bd,bdk->bk", wn, u, precision=prec)
        do_stab = (i % stabilize_every) == 0
        vs, logs = _stab_step(v, log, 1)
        v = jnp.where(do_stab, vs, v)
        log = jnp.where(do_stab, logs, log)
        return (v, log, i + 1), None

    init = (v0, log0, jnp.zeros((), jnp.int32))
    (v, log, _), _ = jax.lax.scan(step, init, (mats, w.swapaxes(0, 1)))
    amp = jnp.einsum("bi,i->b", v, right.astype(cores.dtype),
                     precision=prec)
    amp, log = _stab_step(amp, log, 1)
    return amp, log


def mps_norm(cores, left, right):
    """Stabilized ``<psi|psi>`` of an MPS via density-matrix transfer scan.

    Carries ``rho_n = E_n^T ... E_1^T (l l^T)`` without ever materializing the
    ``(D^2, D^2)`` transfer matrices: each site costs two ``(d*D, D)``-shaped
    GEMMs instead of a ``D^2 x D^2`` product (a ``D^2 / d`` flop saving —
    4096x for d=2, D=64... vs the naive transfer-matrix product).

    Returns ``(mantissa, log_scale)`` scalars with
    ``<psi|psi> = mantissa * exp(log_scale)``.
    """
    left = left.astype(cores.dtype)
    right = right.astype(cores.dtype)
    rho0 = jnp.outer(jnp.conj(left), left)
    log0 = jnp.zeros((), _real(cores.dtype))

    prec = dot_precision(cores.dtype)

    def step(carry, core):
        rho, log = carry
        # X[d] = rho @ A[d]  -> one (D, D) x (D, d*D) GEMM
        x = jnp.einsum("ij,djk->dik", rho, core, precision=prec)
        # rho' = sum_d conj(A[d])^T X[d] -> one (D, d*D) x (d*D, D) GEMM
        rho = jnp.einsum("dji,djk->ik", jnp.conj(core), x, precision=prec)
        rho, log = _stab_step(rho, log, 0)
        return (rho, log), None

    (rho, log), _ = jax.lax.scan(step, (rho0, log0), cores)
    val = jnp.einsum("i,ij,j->", jnp.conj(right), rho, right,
                     precision=prec)
    return _stab_step(val, log, 0)


def _real(dtype):
    import numpy as np

    return np.empty(0, dtype=dtype).real.dtype
