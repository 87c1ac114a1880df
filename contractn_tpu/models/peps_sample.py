"""Direct (autoregressive) sampling of finite open PEPS.

Perfect Born-rule sampling of a 2D state — the 2D counterpart of
:mod:`contractn_tpu.models.sampling` (MPS) and the sampling half of the
Born-machine stack (:mod:`contractn_tpu.models.born`).  Sites are drawn
in raster order from their EXACT conditionals

    ``p(s_rc | s_<) = <traced below, projected above, s_rc patch>``

computed in the double layer: already-sampled sites are projected onto
their drawn values (rank-1 in the physical pair), unsampled sites are
physically traced, and the two half-plane contractions ride the
framework's boundary-MPS machinery —

* **below environments** (rows under the current one, traced): built
  once bottom-up with :func:`boundary.apply_mpo_to_mps` +
  :func:`canonical.compress_fixed`; they carry no sample dependence.
* **above environment** (sampled rows, projected): per sample, absorbed
  row by row with the same two primitives.
* **within the row**: right partial contractions of the
  (above MPS) x (row) x (below MPS) sandwich, and a left vector that
  grows as sites are drawn.

TPU shape: one sample is a fixed sequence of einsums, scanned
QR/SVD compressions (``compress_fixed`` — static bond ``chi``,
zero-padded ranks) and ``searchsorted`` draws — fully jittable, so the
sampler is ONE ``jit(vmap(...))`` program over the whole batch of keys
(the per-site categorical draws are data-dependent *values*, never
data-dependent *shapes*).

Exactness: with ``chi`` at the exact half-plane rank the conditionals
are exact and the returned ``log_prob`` equals the dense
``log |<s|P>|^2 / <P|P>`` to machine precision (pinned in
``tests/test_peps_sample.py``); smaller ``chi`` trades accuracy the
standard boundary-MPS way while the per-site conditionals remain
normalized (samples stay a valid distribution).

The reference has no sampling of any kind (SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .boundary import apply_mpo_to_mps
from .canonical import compress_fixed
from .mpo import MPO
from .mps import MPS


def _check_grid(grid):
    rows, cols = len(grid), len(grid[0])
    grid = [[jnp.asarray(grid[r][c]) for c in range(cols)]
            for r in range(rows)]
    dt = jnp.result_type(*(t.dtype for row in grid for t in row))
    grid = [[t.astype(dt) for t in row] for row in grid]
    for r in range(rows):
        for c in range(cols):
            d_, u_, l_, dn_, r_ = grid[r][c].shape
            if r == 0 and u_ != 1:
                raise ValueError(f"site (0, {c}): up dim must be 1")
            if r == rows - 1 and dn_ != 1:
                raise ValueError(f"site ({r}, {c}): down dim must be 1")
            if c == 0 and l_ != 1:
                raise ValueError(f"site ({r}, 0): left dim must be 1")
            if c == cols - 1 and r_ != 1:
                raise ValueError(f"site ({r}, {c}): right dim must be 1")
    for r in range(rows):
        shapes = {grid[r][c].shape[:2] + grid[r][c].shape[3:4]
                  for c in range(cols)}
        if len(shapes) != 1:
            raise ValueError(
                f"row {r}: (d, up, down) dims must match across the row"
            )
    return grid, rows, cols, dt


def _open_dbl(t):
    """Open-physical double layer of ``t (d, u, l, dn, r)``:
    ``(d, u^2, l^2, dn^2, r^2)`` — diagonal in the physical index
    (ket and bra projected onto the SAME value)."""
    d, u, l, dn, r = t.shape
    dbl = peinsum("suldr,sULDR->suUlLdDrR", t, jnp.conj(t))
    return dbl.reshape(d, u * u, l * l, dn * dn, r * r)


def _pad_h(t, h):
    """Zero-pad the two horizontal axes (2 and 4) of an open double
    layer to the uniform embedding width ``h`` (live block at 0)."""
    d, pu, lw, pd, rw = t.shape
    out = jnp.zeros((d, pu, h, pd, h), t.dtype)
    return out.at[:, :, :lw, :, :rw].set(t)


def _trivial_mps(cols, dtype):
    one = jnp.ones((1,), dtype)
    return MPS(jnp.ones((cols, 1, 1, 1), dtype), one, one)


def _below_envs(rows_open, w, h, chi, dtype):
    """``below[r]``: boundary MPS of the rows ``r+1 ..`` — free sites
    traced, observed sites projected via the physical weight vectors
    ``w[r][c] (d,)`` — with open legs on row ``r``'s down bonds
    (sample-independent: the observations are fixed per call)."""
    rows = len(rows_open)
    cols = len(rows_open[0])
    below = [None] * rows
    below[rows - 1] = _trivial_mps(cols, dtype)
    for r in range(rows - 2, -1, -1):
        # absorbing from below: the row maps its dn legs (toward the
        # already-built environment) to its u legs -> do = u^2, di = dn^2
        cores = jnp.stack([
            jnp.transpose(peinsum("s,suldr->uldr", w[r + 1, c],
                                  rows_open[r + 1][c]), (0, 2, 1, 3))
            for c in range(cols)
        ])
        e0 = jnp.zeros((h,), dtype).at[0].set(1.0)
        grown = apply_mpo_to_mps(MPO(cores, e0, e0), below[r + 1])
        below[r], _, _ = compress_fixed(grown, chi)
    return below


def _right_partials(a_mps, b_mps, row_tr, cols):
    """``R[c] (a, r, b)``: sandwich closure of the columns STRICTLY
    right of ``c`` (``c+1 .. cols-1``) with traced row tensors;
    ``R[cols-1]`` is the bare right-boundary triple."""
    r_vec = peinsum("a,l,b->alb", a_mps.right,
                    jnp.zeros((row_tr[0].shape[3],),
                              row_tr[0].dtype).at[0].set(1.0),
                    b_mps.right)
    parts = [r_vec]
    for c in range(cols - 1, 0, -1):
        r_vec = peinsum("uax,uldr,dby,xry->alb",
                        a_mps.cores[c], row_tr[c], b_mps.cores[c], r_vec)
        r_vec = r_vec / jnp.maximum(jnp.max(jnp.abs(r_vec)), 1e-300)
        parts.append(r_vec)
    return parts[::-1]  # parts[c] closes columns c+1..cols-1


def sample_peps(grid, key, num_samples, chi, observed=None):
    """Draw ``num_samples`` configurations from ``|<s|P>|^2 / <P|P>``.

    Args:
        grid: ``grid[r][c]`` site tensors ``(d, u, l, dn, r)`` with
            boundary bond dims 1 (uniform interior bond recommended;
            anything stackable per row works).
        key: PRNG key.
        num_samples: batch size (one vmapped program).
        chi: boundary bond for BOTH half-plane environments.  At the
            exact half-plane rank the conditionals (and ``log_prob``)
            are exact.
        observed: optional ``(rows, cols)`` ints, ``-1`` = free —
            exact conditional sampling (inpainting) from
            ``p(free | observed)``.  Both environments and the in-row
            closures carry the observations as projections (free
            conditionals condition on observations ANYWHERE on the
            lattice, not just already-visited sites), branchlessly via
            per-site physical weight vectors.

    Returns:
        ``(samples, log_probs)`` — ``(num_samples, rows, cols)`` int32
        (observed values copied in) and the exact log of each sample's
        model probability (conditional ``log p(free | observed)`` when
        ``observed`` is given: only free sites accumulate).
    """
    grid, rows, cols, dt = _check_grid(grid)
    d = grid[0][0].shape[0]
    if observed is None:
        observed = -jnp.ones((rows, cols), jnp.int32)
    else:
        observed = jnp.asarray(observed, jnp.int32)
        if observed.shape != (rows, cols):
            raise ValueError(f"observed must be ({rows}, {cols})")
    w = jnp.where(
        (observed >= 0)[:, :, None],
        jax.nn.one_hot(jnp.clip(observed, 0), d, dtype=dt),
        jnp.ones((rows, cols, d), dt),
    )
    h = max(max(t.shape[2], t.shape[4]) for row in grid for t in row)
    h = h * h
    rows_open = [[_pad_h(_open_dbl(t), h) for t in row] for row in grid]
    below = _below_envs(rows_open, w, h, chi, dt)
    below_flat = tuple((m.cores, m.left, m.right) for m in below)
    rows_stacked = tuple(jnp.stack(row) for row in rows_open)

    keys = jax.random.split(key, num_samples)
    return _sample_batch(rows_stacked, below_flat, keys, observed, w,
                         rows, cols, d, h, chi)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _sample_batch(rows_stacked, below_flat, keys, observed, w, rows,
                  cols, d, h, chi):
    def single(key):
        return _sample_one(rows_stacked, below_flat, key, observed, w,
                           rows, cols, d, h, chi)

    return jax.vmap(single)(keys)


def _sample_one(rows_stacked, below_flat, key, observed, w, rows,
                cols, d, h, chi):
    dt = rows_stacked[0].dtype
    rdt = jnp.zeros((), dt).real.dtype
    above = _trivial_mps(cols, dt)
    e0 = jnp.zeros((h,), dt).at[0].set(1.0)
    log_p = jnp.zeros((), rdt)
    samples = []
    keys = jax.random.split(key, rows * cols).reshape(rows, cols, -1)

    for r in range(rows):
        row_open = [rows_stacked[r][c] for c in range(cols)]
        row_tr = [peinsum("s,suldr->uldr", w[r, c], row_open[c])
                  for c in range(cols)]
        b_mps = MPS(*below_flat[r])
        rps = _right_partials(above, b_mps, row_tr, cols)
        l_vec = peinsum("a,l,b->alb", above.left, e0, b_mps.left)
        row_samp = []
        sel_cores = []
        for c in range(cols):
            wv = peinsum("alb,uax,suldr,dby,xry->s",
                         l_vec, above.cores[c], row_open[c],
                         b_mps.cores[c], rps[c])
            wv = jnp.clip(jnp.real(wv), 0.0, None) + 1e-300
            p = wv / jnp.sum(wv)
            drawn = jnp.searchsorted(jnp.cumsum(p),
                                     jax.random.uniform(keys[r, c], (),
                                                        rdt))
            drawn = jnp.clip(drawn, 0, d - 1)
            s = jnp.where(observed[r, c] >= 0, observed[r, c], drawn)
            log_p = log_p + jnp.where(observed[r, c] >= 0, 0.0,
                                      jnp.log(p[s]))
            row_samp.append(s)
            t_sel = jnp.take(row_open[c], s, axis=0)
            sel_cores.append(jnp.transpose(t_sel, (2, 0, 1, 3)))
            l_vec = peinsum("alb,uax,uldr,dby->xry",
                            l_vec, above.cores[c], t_sel,
                            b_mps.cores[c])
            l_vec = l_vec / jnp.maximum(jnp.max(jnp.abs(l_vec)),
                                        1e-300)
        if r < rows - 1:
            grown = apply_mpo_to_mps(MPO(jnp.stack(sel_cores), e0, e0),
                                     above)
            above, _, _ = compress_fixed(grown, chi)
        samples.append(jnp.stack(row_samp))
    return jnp.stack(samples).astype(jnp.int32), log_p
