"""PEPS Born machines: exact-likelihood 2D generative modeling.

The 2D member of the generative stack: :mod:`born` (MPS, 1D chains),
:mod:`peps_sample` (the sampling half).  A finite open PEPS over
discrete variables defines ``p(x) = |<x|P>|^2 / <P|P>``; both terms are
boundary-MPS contractions —

* **amplitude** ``<x|P>``: single layer, each site tensor gathered at
  its sample value, rows absorbed top-down with the differentiable
  ragged compressor :func:`~contractn_tpu.models.canonical.
  truncate_safe` (``svd_safe`` sweeps — the rank-deficient bonds these
  contractions produce NaN stock SVD gradients);
* **partition function** ``<P|P>``: the traced double layer through the
  same compressor.

With ``chi`` at the exact boundary ranks the likelihood is EXACT (no
ELBO, no contrastive approximation), pinned against dense enumeration
in ``tests/test_peps_born.py``; smaller ``chi`` trades accuracy the
standard boundary-MPS way.

TPU shape: one sample's log-amplitude is a fixed einsum/SVD sequence,
vmapped over the batch; ``fit_peps_born`` runs the whole training loop
(adam on the grid pytree, exact NLL) as ONE jitted ``lax.scan`` — zero
host dispatch per step, exactly like :func:`born.fit_born_machine`.
Gradients of the ``log Z`` "negative phase" are exact autodiff through
the double-layer sweep, not sampled.

The reference ships no learning loop of any kind (SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .canonical import truncate_safe


def _real(dtype):
    return jnp.zeros((), dtype).real.dtype


def _close_rows(boundary, closing):
    """Contract a compressed boundary (list of ``(d, Dl, Dr)``) against
    the closing row (list of ``(d, l, r)``) -> scalar."""
    lx = len(boundary)
    carry = jnp.zeros((closing[0].shape[1], boundary[0].shape[1]),
                      boundary[0].dtype).at[0, 0].set(1.0)
    for c in range(lx):
        carry = peinsum("ab,dai,dbj->ij", carry, closing[c],
                        boundary[c])
    return carry[0, 0]


def _sweep(rows, chi):
    """Top-down boundary sweep over ``rows`` (each a list of
    ``(phys_out, phys_in, l, r)`` MPO-like cores; row 0 has
    ``phys_in = 1``, the last row ``phys_out = 1``).  Returns
    ``(value, log_scale)`` in split form."""
    ly = len(rows)
    lx = len(rows[0])
    if ly < 2:
        raise ValueError("boundary sweep needs >= 2 rows; single-row "
                         "grids are MPS (use models.born)")
    boundary = [w[:, 0] for w in rows[0]]  # (d, l, r)
    dt = boundary[0].dtype
    lvec = jnp.zeros((boundary[0].shape[1],), dt).at[0].set(1.0)
    rvec = jnp.zeros((boundary[-1].shape[2],), dt).at[0].set(1.0)
    boundary, log = truncate_safe(boundary, lvec, rvec, chi)
    for r in range(1, ly - 1):
        grown = []
        for c in range(lx):
            g = peinsum("DUlr,Uij->Dlirj", rows[r][c], boundary[c])
            d2, l_, i_, r_, j_ = g.shape
            grown.append(g.reshape(d2, l_ * i_, r_ * j_))
        lvec = jnp.zeros((grown[0].shape[1],), dt).at[0].set(1.0)
        rvec = jnp.zeros((grown[-1].shape[2],), dt).at[0].set(1.0)
        boundary, lg = truncate_safe(grown, lvec, rvec, chi)
        log = log + lg
    closing = [w[0] for w in rows[ly - 1]]  # (d_in, l, r)
    val = _close_rows(boundary, closing)
    return val, log


def peps_log_amp2(grid, samples, chi):
    """``log |<x|P>|^2`` (unnormalized) for ``(B, rows, cols)`` integer
    configurations; single-layer boundary sweeps, vmapped over the
    batch.  ``grid[r][c]`` are ``(d, u, l, dn, r)`` site tensors with
    size-1 boundary bonds (the :func:`~contractn_tpu.models.
    peps_sample.sample_peps` convention)."""
    rows_n = len(grid)

    def single(sample):
        rows = []
        for r in range(rows_n):
            row = []
            for c, t in enumerate(grid[r]):
                sel = jnp.take(t, sample[r, c], axis=0)  # (u, l, dn, r)
                row.append(jnp.transpose(sel, (2, 0, 1, 3)))
            rows.append(row)
        val, log = _sweep(rows, chi)
        tiny = jnp.asarray(jnp.finfo(_real(val.dtype)).tiny)
        return 2.0 * (log + jnp.log(jnp.abs(val) + tiny))

    return jax.vmap(single)(samples)


def peps_log_norm(grid, chi):
    """``log <P|P>`` via the traced double layer (scalar)."""
    rows = []
    for grow in grid:
        row = []
        for t in grow:
            dbl = peinsum("suldr,sULDR->dDuUlLrR", t, jnp.conj(t))
            d, u, l, rr = t.shape[3], t.shape[1], t.shape[2], t.shape[4]
            row.append(dbl.reshape(d * d, u * u, l * l, rr * rr))
        rows.append(row)
    val, log = _sweep(rows, chi)
    return log + jnp.log(jnp.real(val))


def peps_born_nll(grid, samples, chi):
    """Mean exact negative log-likelihood (nats) of the batch."""
    return (peps_log_norm(grid, chi)
            - jnp.mean(peps_log_amp2(grid, samples, chi)))


def peps_log_prob(grid, samples, chi):
    """Exact ``(B,)`` Born log-probabilities of integer configs."""
    return (peps_log_amp2(grid, samples, chi)
            - peps_log_norm(grid, chi))


@partial(jax.jit, static_argnames=("steps", "batch", "chi"))
def _fit(grid, data, steps, batch, chi, lr, key):
    import optax

    opt = optax.adam(lr)
    state = opt.init(grid)
    n_data = data.shape[0]

    def body(carry, k):
        g, s = carry
        if batch is None:
            mb = data
        else:
            idx = jax.random.randint(k, (batch,), 0, n_data)
            mb = jnp.take(data, idx, axis=0)
        loss, grads = jax.value_and_grad(peps_born_nll)(g, mb, chi)
        updates, s = opt.update(grads, s, g)
        return (optax.apply_updates(g, updates), s), loss

    keys = jax.random.split(key, steps)
    (grid, _), losses = jax.lax.scan(body, (grid, state), keys)
    return grid, losses


def fit_peps_born(grid, data, steps=300, batch=None, chi=8, lr=0.02,
                  key=None):
    """Train a PEPS Born machine on ``(n_data, rows, cols)`` integer
    samples by exact maximum likelihood — the whole loop one jitted
    scan.  Returns ``(grid, losses)``; at the optimum the loss is the
    empirical entropy of the data distribution.  Sample from the
    trained model with :func:`~contractn_tpu.models.peps_sample.
    sample_peps`."""
    if key is None:
        key = jax.random.PRNGKey(0)
    data = jnp.asarray(data)
    return _fit(grid, data, int(steps), batch, int(chi), float(lr),
                key)


def peps_born_machine(key, rows, cols, phys_dim=2, bond_dim=2,
                      dtype=jnp.float64):
    """Fresh random PEPS Born machine: ``grid[r][c]`` site tensors
    ``(d, u, l, dn, r)`` with size-1 boundary bonds.  All-positive
    init (uniform in ``[0.3, 1.0]``) keeps every configuration's
    log-amplitude finite at step 0 — the 2D analogue of
    :func:`born.born_machine`'s positive boundaries."""
    grid = []
    keys = jax.random.split(key, rows * cols)
    for r in range(rows):
        row = []
        for c in range(cols):
            u = bond_dim if r > 0 else 1
            l = bond_dim if c > 0 else 1
            dn = bond_dim if r < rows - 1 else 1
            rr = bond_dim if c < cols - 1 else 1
            shape = (phys_dim, u, l, dn, rr)
            t = jax.random.uniform(keys[r * cols + c], shape, dtype,
                                   0.3, 1.0)
            row.append(t / (bond_dim ** 0.5))
        grid.append(row)
    return grid
