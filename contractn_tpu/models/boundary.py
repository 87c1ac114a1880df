"""Boundary-MPS contraction of 2D (PEPS) grid networks.

Exact contraction of a 2D grid is exponential in the linear size; the
standard scalable algorithm sweeps a "boundary MPS" down the grid: row 1 is
an MPS over its vertical bonds, every interior row acts on it as an MPO, and
after each absorption the boundary is SVD-compressed back to bond ``chi``
(:mod:`contractn_tpu.models.canonical`).  Cost is polynomial,
O(rows * cols * chi^3)-ish, with a controllable truncation error, while the
log of the contracted value accumulates in split format so arbitrarily large
grids neither overflow nor underflow.

This composes three framework primitives — stacked MPS, MPO application,
canonical compression — into the BASELINE stretch capability (4x4 PEPS and
beyond).  The reference can only contract grids exactly through opt_einsum.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .canonical import (
    _fixed_svd_sweep,
    _left_qr_sweep,
    compress,
    compress_fixed,
)
from .mpo import MPO
from .mps import MPS
from ..ops.stabilize import dot_precision, peinsum


def apply_mpo_to_mps(mpo, mps):
    """Exact MPO application: bond dimensions multiply (``W * D``)."""
    w = mpo.cores  # (N, do, di, W, W)
    a = mps.cores  # (N, di, D, D)
    n, do, di, wb, _ = w.shape
    bond = a.shape[-1]
    new = peinsum("nabwv,nbij->nawivj", w, a).reshape(
        n, do, wb * bond, wb * bond
    )
    left = jnp.kron(mpo.left, mps.left)
    right = jnp.kron(mpo.right, mps.right)
    return MPS(new, left, right)


def _padded_site(grid, r, c, rows, cols):
    """Site tensor with all four (up, left, down, right) axes present."""
    t = np.asarray(grid[r][c].tensor)
    if r == 0:
        t = t[None]
    if c == 0:
        t = t[:, None]
    if r == rows - 1:
        t = t[:, :, None]
    if c == cols - 1:
        t = t[..., None]
    return t  # (up, left, down, right)


def _embed(mats, phys_first):
    """Stack per-column tensors into uniform cores, zero-padding horizontal
    bonds; returns ``(stacked, e_left, e_right)`` boundary basis vectors."""
    h = max(max(m.shape[-2], m.shape[-1]) for m in mats)
    out = np.zeros((len(mats),) + phys_first + (h, h), mats[0].dtype)
    for i, m in enumerate(mats):
        sl = (i,) + tuple(slice(0, s) for s in m.shape)
        out[sl] = m
    e = np.zeros((h,), mats[0].dtype)
    e[0] = 1.0
    return jnp.asarray(out), jnp.asarray(e)


@partial(jax.jit, static_argnums=(4,))
def _absorb_rows_scanned(cores, left, right, w_rows, chi):
    """Absorb a stack of interior rows into the boundary MPS — ONE
    compiled program.

    ``cores (C, dv, chi, chi)``: boundary at fixed bond ``chi``;
    ``w_rows (R, C, dd, du, h, h)``: the interior rows as uniform MPO
    stacks.  Per scanned row: exact MPO application (bond ``h * chi``),
    scanned QR canonicalization, scanned fixed-``chi`` SVD truncation —
    all static shapes, so the whole 2D sweep is a scan-of-scans with
    zero host round-trips (the round-1 implementation dispatched O(rows
    * cols) host-looped QR/SVD steps).

    Returns ``(cores, left, right, log, err_sq)``.
    """
    r, c, dd, du, h, _ = w_rows.shape
    dt = cores.dtype
    prec = dot_precision(dt)
    e_row = jnp.zeros((h,), dt).at[0].set(1.0)
    rdt = jnp.zeros((), dt).real.dtype

    def body(carry, w):
        cores, left, right, log, err = carry
        grown = jnp.einsum("nabwv,nbij->nawivj", w, cores,
                           precision=prec).reshape(c, dd, h * chi, h * chi)
        l2 = jnp.kron(e_row, left)
        r2 = jnp.kron(e_row, right)
        qs, e0, wv, log_qr = _left_qr_sweep(grown, l2, r2)
        sites, nl, nr, log_svd, err_sq = _fixed_svd_sweep(qs, e0, wv, chi)
        return (sites, nl, nr, log + log_qr + log_svd, err + err_sq), None

    init = (cores, left, right, jnp.zeros((), rdt), jnp.zeros((), rdt))
    (cores, left, right, log, err), _ = jax.lax.scan(body, init, w_rows)
    return cores, left, right, log, err


def _rows_uniform(tensor_grid):
    """Whether all interior rows share one (padded) embedding shape."""
    rows = len(tensor_grid)
    cols = len(tensor_grid[0])
    shapes = set()
    for r in range(1, rows - 1):
        mats = [np.transpose(tensor_grid[r][c], (2, 0, 1, 3))
                for c in range(cols)]
        cores, _ = _embed(mats, mats[0].shape[:2])
        shapes.add(tuple(cores.shape))
    return len(shapes) <= 1


def _boundary_sweep_scanned(tensor_grid, chi):
    """Device-side boundary sweep: host work is only the row embedding.

    Requires all interior rows to share one (padded) shape — true for
    uniform-bond PEPS grids; the caller checks and falls back to the
    host sweep otherwise.  Returns split-format ``(mantissa, log)``.
    """
    rows = len(tensor_grid)
    cols = len(tensor_grid[0])

    mats = [np.moveaxis(tensor_grid[0][c][0], 1, 0) for c in range(cols)]
    cores0, e = _embed(mats, (mats[0].shape[0],))
    boundary, log_norm, _ = compress_fixed(MPS(cores0, e, e), chi)
    total_log = log_norm

    row_stacks = []
    for r in range(1, rows - 1):
        mats = [
            np.transpose(tensor_grid[r][c], (2, 0, 1, 3))  # (down, up, l, r)
            for c in range(cols)
        ]
        cores, _ = _embed(mats, mats[0].shape[:2])
        row_stacks.append(cores)
    if row_stacks:
        w_rows = jnp.stack(row_stacks)
        cores, left, right, log, _ = _absorb_rows_scanned(
            boundary.cores, boundary.left, boundary.right, w_rows, int(chi)
        )
        boundary = MPS(cores, left, right)
        total_log = total_log + log

    mats = [tensor_grid[rows - 1][c][:, :, 0] for c in range(cols)]
    cores, e = _embed(mats, (mats[0].shape[0],))
    closing = MPS(cores, e, e)
    val, log = closing.inner(boundary, conjugate=False)
    return val, log + total_log


def _single_row_sweep(row):
    """A 1-row grid is a plain matrix chain over the horizontal bonds.

    ``_boundary_sweep`` would use row 0 both as the opening boundary and
    as the closing row (squaring the value), so the single-row case gets
    its own stabilized left-to-right product.  Returns split-format
    ``(mantissa, log)`` with mean ``|mantissa| = 1``.
    """
    v = row[0][0, :, 0, :]  # (left=1, right)
    log = 0.0
    for t in row[1:]:
        v = np.matmul(v, t[0, :, 0, :])
        norm = float(np.mean(np.abs(v)))
        if norm > 1e-7:
            v = v / norm
            log += np.log(norm)
    val = v[0, 0]
    mag = abs(val)
    if mag > 1e-7:
        val, log = val / mag, log + np.log(mag)
    return jnp.asarray(val), jnp.asarray(log)


def _sweep_dispatch(tensor_grid, chi):
    """Scanned device-side sweep when a fixed ``chi`` is given and the
    grid is uniform; exact host sweep otherwise."""
    if len(tensor_grid) == 1:
        return _single_row_sweep(tensor_grid[0])
    if (chi is not None and len(tensor_grid) >= 2
            and _rows_uniform(tensor_grid)):
        return _boundary_sweep_scanned(tensor_grid, chi)
    return _boundary_sweep(tensor_grid, chi)


def _boundary_sweep(tensor_grid, chi):
    """Core sweep over a grid of full ``(up, left, down, right)`` arrays.

    Host-loop fallback (exact when ``chi`` is None; also used for
    non-uniform grids).  Returns split-format ``(mantissa, log)``.
    """
    rows = len(tensor_grid)
    cols = len(tensor_grid[0])

    # Row 0 as a boundary MPS over its down-bonds
    mats = [np.moveaxis(tensor_grid[0][c][0], 1, 0) for c in range(cols)]
    cores, e = _embed(mats, (mats[0].shape[0],))
    boundary = MPS(cores, e, e)
    total_log = 0.0

    for r in range(1, rows - 1):
        mats = [
            np.transpose(tensor_grid[r][c], (2, 0, 1, 3))  # (down, up, l, r)
            for c in range(cols)
        ]
        cores, e = _embed(mats, mats[0].shape[:2])
        row_mpo = MPO(cores, e, e)
        boundary = apply_mpo_to_mps(row_mpo, boundary)
        if chi is not None and boundary.bond_dim > chi:
            boundary, log_norm, _ = compress(boundary, max_bond=chi)
            total_log += log_norm

    # Last row as an MPS over its up-bonds; value = <last_row | boundary>
    mats = [tensor_grid[rows - 1][c][:, :, 0] for c in range(cols)]
    cores, e = _embed(mats, (mats[0].shape[0],))
    closing = MPS(cores, e, e)

    # Bilinear pairing, NOT the Hermitian inner product: the closing row's
    # tensors enter the network as-is, so no conjugation anywhere (complex
    # grids would otherwise contract to the wrong value).
    val, log = closing.inner(boundary, conjugate=False)
    return val, log + total_log


def boundary_contract(tn, grid, chi=None, split_format=True):
    """Contract a closed PEPS grid by boundary-MPS sweeping.

    Args:
        tn: the TN returned by :func:`contractn_tpu.models.peps.peps_tn`
            (with ``phys_dim=None`` — a closed, scalar-valued network).
        grid: the node grid returned alongside it.
        chi: maximum boundary bond dimension (None = no truncation: exact,
            but bonds grow as ``D^row``).
        split_format: return ``(mantissa, log)`` or the dense scalar.

    Returns:
        The contracted scalar in split or dense format.
    """
    rows, cols = len(grid), len(grid[0])
    if any(n.ndim not in (2, 3, 4) for row in grid for n in row):
        raise ValueError(
            "boundary_contract expects a closed grid (phys_dim=None)"
        )
    tensor_grid = [
        [_padded_site(grid, r, c, rows, cols) for c in range(cols)]
        for r in range(rows)
    ]
    val, log = _sweep_dispatch(tensor_grid, chi)
    if split_format:
        return val, log
    from ..ops.stabilize import destabilize

    return destabilize(val, log)


def _double_layer_site(grid, r, c, rows, cols, op=None):
    """One closed double-layer site of an open PEPS, optionally with a
    one-site operator inserted between the layers."""
    node = grid[r][c]
    # virtual legs = number of existing lattice neighbors (NOT a corner
    # table: an interior site of a 1xN or Nx1 grid has only 2 neighbors)
    n_virtual = (r > 0) + (c > 0) + (r < rows - 1) + (c < cols - 1)
    if node.ndim != n_virtual + 1:
        raise ValueError("expected an open grid (phys_dim set)")
    t = np.asarray(node.tensor)
    # pad the four virtual bonds (phys stays last)
    if r == 0:
        t = t[None]
    if c == 0:
        t = t[:, None]
    if r == rows - 1:
        t = t[:, :, None]
    if c == cols - 1:
        t = t[:, :, :, None]
    if op is not None:
        # <bra| O |ket>: O[P, p] with the bra index first
        dbl = np.einsum("uldrp,Pp,ULDRP->uUlLdDrR",
                        t, np.asarray(op), np.conj(t))
    else:
        dbl = np.einsum("uldrp,ULDRp->uUlLdDrR", t, np.conj(t))
    s = t.shape
    return dbl.reshape(s[0] ** 2, s[1] ** 2, s[2] ** 2, s[3] ** 2)


def _double_layer_grid(grid):
    """Closed double-layer tensor grid of an open PEPS."""
    rows, cols = len(grid), len(grid[0])
    return [
        [_double_layer_site(grid, r, c, rows, cols)
         for c in range(cols)]
        for r in range(rows)
    ]


def peps_expectation(tn, grid, op, site, chi=None):
    """``<P| O_site |P> / <P|P>`` for an open finite PEPS.

    Two boundary-MPS sweeps (impurity and norm) of the double-layer
    grid; ``op (d, d)``, ``site = (row, col)``.  Validated against the
    dense contraction of the same PEPS in ``tests/test_boundary.py``.
    """
    rows, cols = len(grid), len(grid[0])
    r, c = site
    if not (0 <= r < rows and 0 <= c < cols):
        raise ValueError(f"site {site} outside the {rows}x{cols} grid")
    norm_grid = _double_layer_grid(grid)
    # the impurity grid differs at exactly one site: build just that one
    dressed = _double_layer_site(grid, r, c, rows, cols, op=op)
    num_grid = [
        [dressed if (rr, cc) == (r, c) else norm_grid[rr][cc]
         for cc in range(cols)]
        for rr in range(rows)
    ]
    num_v, num_l = _sweep_dispatch(num_grid, chi)
    den_v, den_l = _sweep_dispatch(norm_grid, chi)
    return (num_v / den_v) * jnp.exp(num_l - den_l)


def peps_norm(tn, grid, chi=None, split_format=True):
    """``<P|P>`` of an OPEN PEPS (physical modes) via the double layer.

    Each double-layer site is ``T (x) conj(T)`` with the physical index
    contracted, giving a closed grid with squared bond dimensions that the
    boundary sweep contracts at polynomial cost.  This is how 2D quantum
    state norms / expectation values are actually computed at scale.
    """
    tensor_grid = _double_layer_grid(grid)
    val, log = _sweep_dispatch(tensor_grid, chi)
    if split_format:
        return val, log
    from ..ops.stabilize import destabilize

    return destabilize(val, log)
