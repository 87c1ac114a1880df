"""Variational Monte Carlo for finite PEPS: sampled energies and
gradients.

The optimization route PAST exact-contraction sizes: with perfect
Born-rule samples (:func:`~contractn_tpu.models.peps_sample.
sample_peps` — no Markov chain, no autocorrelation), the energy and
its gradient are the standard VMC estimators

    E        = E_s[ E_loc(s) ],
    E_loc(s) = sum_{s'} H[s, s'] psi(s') / psi(s),
    grad E   = 2 Re E_s[ O(s) (E_loc(s) - E) ],   O = d log psi / dθ,

with every expectation over ``p(s) = |psi(s)|^2 / <psi|psi>``.  Both
estimators are EXACT identities — passing the full configuration set
with its Born weights reproduces the deterministic Rayleigh quotient
and its autodiff gradient to machine precision, which is how the
tests pin them (no flaky stochastic assertions for correctness; the
sampled path is checked for consistency at loose statistical bars).

TPU shape: one sample's amplitude is a fixed einsum chain (exact
single-layer row absorption, split-format log carried per row), so
``E_loc`` is a vmapped batch of ``n_bonds * d^2 + 1`` amplitude
evaluations and ``O`` a vmapped ``jax.grad`` of the log-amplitude —
everything jitted, host loop only over optimization steps.  Amplitude
evaluations recompute the full contraction per matrix element
(clean and exact at the few-column widths this targets); environment
caching across flips is the standard production optimization and is
deliberately out of scope here.

Real tensors only (the gradient estimator above is the real-parameter
form; complex PEPS need the conjugate-pair convention — rejected
explicitly rather than silently wrong).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import peinsum


def _check_real(grid):
    for row in grid:
        for t in row:
            if jnp.iscomplexobj(t):
                raise ValueError(
                    "peps_vmc is real-only (the gradient estimator "
                    "uses the real-parameter form)")


def peps_log_amp(grid, sample):
    """``(sign, log|amp|)`` of ``<sample|P>`` — exact single-layer
    contraction (row-by-row MPO absorption, no truncation),
    differentiable."""
    rows = len(grid)
    cols = len(grid[0])
    # selected row r: tensors (u, l, dn, rr)
    # boundary: after absorbing rows 0..r, an MPS over the dn bonds
    # with ragged horizontal bond products — keep as a list
    log = jnp.zeros(())
    env = [jnp.ones((1, 1, 1)) for _ in range(cols)]  # (dn, l, r)
    for r in range(rows):
        new = []
        for c in range(cols):
            t = jnp.take(grid[r][c], sample[r, c], axis=0)
            g = peinsum("uij,uldr->dlirj", env[c], t)
            d_, l_, i_, r_, j_ = g.shape
            new.append(g.reshape(d_, l_ * i_, r_ * j_))
        env = new
        scale = jnp.maximum(
            jnp.max(jnp.abs(env[cols // 2])), 1e-300)
        env = [e / scale if c == cols // 2 else e
               for c, e in enumerate(env)]
        log = log + jnp.log(scale)
    vec = jnp.ones((1,))
    for c in range(cols):
        vec = peinsum("l,dlr->r", vec, env[c])
        s = jnp.maximum(jnp.max(jnp.abs(vec)), 1e-300)
        vec = vec / s
        log = log + jnp.log(s)
    amp = vec[0]
    return jnp.sign(amp), log + jnp.log(jnp.abs(amp) + 1e-300)


def _bonds(rows, cols):
    hb = [(r, c, r, c + 1) for r in range(rows)
          for c in range(cols - 1)]
    vb = [(r, c, r + 1, c) for r in range(rows - 1)
          for c in range(cols)]
    return hb, vb


def local_energy(grid, sample, h2h, h2v):
    """``E_loc(s)`` for nearest-neighbor Hamiltonians given as dense
    two-site terms ``h2h`` (horizontal) / ``h2v`` (vertical), each
    ``(d^2, d^2)`` ordered ``(s_first, s_second)``."""
    rows, cols = len(grid), len(grid[0])
    d = grid[0][0].shape[0]
    sgn0, log0 = peps_log_amp(grid, sample)
    hb, vb = _bonds(rows, cols)
    e = jnp.zeros(())
    for (r1, c1, r2, c2), h2 in (
        [(b, h2h) for b in hb] + [(b, h2v) for b in vb]
    ):
        h4 = jnp.asarray(h2).reshape(d, d, d, d)
        cur = h4[sample[r1, c1], sample[r2, c2]]  # (d, d) over (a, b)

        def flip_amp(a, b, r1=r1, c1=c1, r2=r2, c2=c2):
            s2 = sample.at[r1, c1].set(a).at[r2, c2].set(b)
            return peps_log_amp(grid, s2)

        phys = jnp.arange(d, dtype=sample.dtype)
        sgns, logs = jax.vmap(
            lambda a: jax.vmap(lambda b: flip_amp(a, b))(phys))(phys)
        ratio = sgns * sgn0 * jnp.exp(logs - log0)
        e = e + jnp.sum(cur * ratio)
    return e


@partial(jax.jit, static_argnames=())
def _estimators(grid, samples, h2h, h2v, weights):
    def one(s):
        el = local_energy(grid, s, h2h, h2v)
        o = jax.grad(lambda g: peps_log_amp(g, s)[1])(grid)
        return el, o

    els, os = jax.vmap(one)(samples)
    w = weights / jnp.sum(weights)
    energy = jnp.sum(w * els)
    centered = els - energy

    def red(o):
        return 2.0 * jnp.tensordot(w * centered, o, axes=[[0], [0]],
                                   precision=jax.lax.Precision.HIGHEST)

    grads = jax.tree_util.tree_map(red, os)
    var = jnp.sum(w * centered ** 2)
    return energy, grads, var


def vmc_energy_and_grad(grid, samples, h2h, h2v, weights=None):
    """VMC estimators over a batch of integer configurations.

    Args:
        grid: ``grid[r][c]`` real ``(d, u, l, dn, r)`` tensors.
        samples: ``(B, rows, cols)`` configurations — Born-rule draws
            for the stochastic estimator, or ALL ``d^(rows cols)``
            configurations with ``weights = p(s)`` for the exact
            identity (how the tests pin this module).
        h2h / h2v: dense two-site bond terms ``(d^2, d^2)``.
        weights: optional per-sample weights (default uniform — the
            correct choice for Born-rule samples).

    Returns:
        ``(energy, grads, variance)`` — ``grads`` matches the grid
        pytree; ``variance`` is the weighted local-energy variance
        (zero exactly at an eigenstate: the standard zero-variance
        certificate).
    """
    _check_real(grid)
    samples = jnp.asarray(samples, jnp.int32)
    if weights is None:
        weights = jnp.ones((samples.shape[0],))
    return _estimators(grid, samples, jnp.asarray(h2h, jnp.float64),
                       jnp.asarray(h2v, jnp.float64),
                       jnp.asarray(weights, jnp.float64))


def fit_peps_vmc(grid, h2h, h2v, key, steps=200, num_samples=128,
                 chi=8, lr=0.02):
    """Gradient-descent VMC ground-state search.

    Per step: ``num_samples`` perfect Born samples
    (:func:`sample_peps`), the estimators above, one adam update.
    Returns ``(grid, energies)`` with the per-step sampled energy
    trace.  The energy is variational only in expectation — judge
    convergence with the variance certificate, not single steps.
    """
    import optax

    from .peps_sample import sample_peps

    _check_real(grid)
    opt = optax.adam(lr)
    state = opt.init(grid)
    energies = []
    h2h = jnp.asarray(h2h, jnp.float64)
    h2v = jnp.asarray(h2v, jnp.float64)
    for it in range(int(steps)):
        key, k = jax.random.split(key)
        samples, _ = sample_peps(grid, k, num_samples, chi)
        e, g, _ = vmc_energy_and_grad(grid, samples, h2h, h2v)
        updates, state = opt.update(g, state, grid)
        grid = jax.tree_util.tree_map(
            lambda a, u: a + u, grid, updates)
        energies.append(float(e))
    return grid, energies
