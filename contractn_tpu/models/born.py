"""MPS Born machines: exact-likelihood generative modeling.

The reference is a QTNML library (its paper is a NeurIPS-QTNML
workshop submission) but ships no learning loop of any kind (SURVEY.md
section 2).  This module provides the canonical TN generative model:
an MPS over discrete variables defines ``p(x) = |psi(x)|^2 / <psi|psi>``
(a "Born machine"), whose log-likelihood is EXACT — no ELBO, no
contrastive approximation — because both the amplitude and the
partition function are chain contractions.

TPU shape: ``mps_log_prob`` is one ``lax.scan`` over sites whose body
is a batched per-sample core gather + one ``(B, D) x (B, D, D)``
batched GEMM, with the framework's split-format rescale carried per
sample so 1000-site amplitudes neither under- nor overflow — the same
invariant as the contraction engine.  ``fit_born_machine`` runs the
WHOLE training loop (minibatching, adam, NLL) as one jitted
``lax.scan``: zero host dispatch per step.  Sampling from the trained
model is :mod:`contractn_tpu.models.sampling` (exact autoregressive).

Gradients flow through both terms of ``log p = log|psi(x)|^2 - log Z``
by plain autodiff; the ``log Z`` term's gradient is the standard
"negative phase" and is exact here (computed from
:func:`contractn_tpu.ops.scan.mps_norm`, not sampled).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..ops.scan import mps_norm
from ..ops.stabilize import dot_precision
from .mps import MPS


def _real(dtype):
    return jnp.zeros((), dtype).real.dtype


def mps_log_amp2(mps, samples):
    """``log |psi(x)|^2`` (unnormalized), stabilized, for ``(B, N)``
    integer configurations.  One scan over sites; per-sample rescale
    carried in log space."""
    cores = mps.cores  # (N, d, D, D)
    n, d, bond, _ = cores.shape
    b = samples.shape[0]
    prec = dot_precision(cores.dtype)
    v0 = jnp.broadcast_to(mps.left.astype(cores.dtype), (b, bond))
    log0 = jnp.zeros((b,), _real(cores.dtype))
    tiny = jnp.asarray(jnp.finfo(_real(cores.dtype)).tiny)

    def step(carry, inp):
        v, log = carry
        core, x = inp  # (d, D, D), (B,)
        a = jnp.take(core, x, axis=0)  # (B, D, D)
        v = jnp.einsum("bi,bij->bj", v, a, precision=prec)
        s = jnp.mean(jnp.abs(v), axis=1)
        s_safe = jnp.where(s > tiny, s, 1.0)
        v = v / s_safe[:, None]
        return (v, log + jnp.log(s_safe)), None

    (v, log), _ = jax.lax.scan(step, (v0, log0), (cores, samples.T))
    amp = jnp.einsum("bi,i->b", v, mps.right.astype(cores.dtype),
                     precision=prec)
    return 2.0 * (log + jnp.log(jnp.abs(amp) + tiny))


def mps_log_prob(mps, samples):
    """Exact ``(B,)`` log-probabilities ``log p(x)`` of integer
    configurations under the Born distribution of ``mps``."""
    m, ls = mps_norm(mps.cores, mps.left, mps.right)
    log_z = jnp.log(jnp.real(m)) + ls
    return mps_log_amp2(mps, samples) - log_z


def born_nll(mps, samples):
    """Mean negative log-likelihood (nats) of the batch — the exact
    training loss."""
    return -jnp.mean(mps_log_prob(mps, samples))


@partial(jax.jit, static_argnames=("steps", "batch"))
def _fit(mps, data, steps, batch, lr, key):
    opt = optax.adam(lr)
    state = opt.init(mps)
    n_data = data.shape[0]

    def body(carry, k):
        m, s = carry
        if batch is None:
            mb = data
        else:
            idx = jax.random.randint(k, (batch,), 0, n_data)
            mb = jnp.take(data, idx, axis=0)
        loss, g = jax.value_and_grad(born_nll)(m, mb)
        updates, s = opt.update(g, s, m)
        return (optax.apply_updates(m, updates), s), loss

    keys = jax.random.split(key, steps)
    (mps, _), losses = jax.lax.scan(body, (mps, state), keys)
    return mps, losses


def fit_born_machine(mps, data, steps=1000, batch=None, lr=0.01,
                     key=None):
    """Train an MPS Born machine on ``(n_data, N)`` integer samples by
    exact maximum likelihood.

    The whole loop is one jitted scan.  ``batch=None`` uses the full
    dataset each step (exact gradient); an integer draws a random
    minibatch per step.  Returns ``(mps, losses)`` — ``losses`` are
    per-step NLLs in nats (at the optimum: the empirical entropy of
    the data distribution).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    data = jnp.asarray(data)
    return _fit(mps, data, int(steps), batch, float(lr), key)


def born_machine(key, n_sites, phys_dim=2, bond_dim=8,
                 dtype=jnp.float64):
    """Fresh random Born machine (an :class:`MPS` with training-friendly
    init — positive boundary vectors keep early log-amplitudes finite
    on every configuration)."""
    m = MPS.random(key, n_sites, phys_dim, bond_dim, dtype=dtype)
    return MPS(m.cores, jnp.abs(m.left) + 0.1, jnp.abs(m.right) + 0.1)
