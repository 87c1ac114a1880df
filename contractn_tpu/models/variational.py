"""Variational iPEPS: gradient optimization through the CTMRG fixed point.

Simple update (:func:`~contractn_tpu.models.ipeps.simple_update`)
optimizes bonds LOCALLY — its environment is a product approximation —
so its energies are not optimal at fixed bond dimension.  This module
implements the modern alternative (Liao-Liu-Wang-Xiang,
"Differentiable programming tensor networks", PRX 9, 031041): treat the
TRUE variational energy — the CTMRG-contracted expectation value — as a
differentiable function of the iPEPS tensor and descend its gradient
with optax.

Gradient strategy (the standard truncated-backprop fixed-point recipe):

* each step warm-starts from the previous environment and refreshes it
  with ``refresh_iters`` CTMRG absorptions under ``stop_gradient``
  (convergence without tape);
* then ``grad_iters`` further absorptions are differentiated through,
  using :func:`~contractn_tpu.ops.linalg_ad.eigh_safe` — the
  degeneracy-broadened eigendecomposition — because symmetric phases
  have exactly degenerate corner spectra where the stock ``eigh``
  gradient is NaN;
* the energy is the nearest-neighbor bond patch of
  :mod:`~contractn_tpu.models.ipeps` (times two bonds per site).

As the environment converges, backprop through the last ``grad_iters``
absorptions approaches the exact fixed-point gradient geometrically
(the truncated Neumann series of the implicit-function solution).

TPU shape: the ENTIRE optimization — value-and-grad, optax update,
environment carry — is one ``lax.scan`` over steps inside one jitted
program: zero host syncs, static shapes throughout (the C4v growth
phase runs once, before the scan).  Scope matches the C4v machinery:
single-site rotation-invariant states (the projection
``symmetrize_c4v`` is applied inside the loss, so the raw parameters
are unconstrained).

Validated in ``tests/test_variational.py``: on the 2D TFIM the
variational D=2 energy strictly beats the simple-update energy measured
with the identical environment, and the gradient path is NaN-free
despite the Z2-degenerate corner spectrum.

No counterpart in the reference (no autodiff, no 2D; SURVEY.md §2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg_ad import eigh_safe
from ..ops.stabilize import dot_precision
from .ctmrg import _converge, _step, ctmrg_environment
from .ipeps import (
    _pair_weight,
    _pair_weight_op,
    ipeps_energy,
    peps_double_layer,
    peps_double_layer_open,
    simple_update,
    su_absorb_weights,
    symmetrize_c4v,
)


def make_ipeps_loss(h2, chi, refresh_iters=10, grad_iters=10):
    """Differentiable energy ``(params, c, t) -> (E, (c', t'))``.

    ``params`` is an unconstrained ``(d, D, D, D, D)`` tensor (the C4v
    projection happens inside); ``(c, t)`` is the warm-start
    environment at width ``chi``, returned refreshed for the next call.
    """
    h2 = jnp.asarray(h2)

    def loss(params, c, t):
        a_sym = symmetrize_c4v(params)
        dtype = a_sym.dtype
        prec = dot_precision(dtype)
        d = a_sym.shape[0]
        op4 = h2.astype(dtype).reshape(d, d, d, d)
        dl = peps_double_layer(a_sym)
        # converge without tape, then differentiate the last few steps
        c0, t0 = jax.lax.stop_gradient(
            _converge(c, t, dl, chi, refresh_iters))
        cc, tt = c0, t0
        for _ in range(grad_iters):
            cc, tt = _step(cc, tt, dl, chi, prec, eigh_fn=eigh_safe)
        ao = peps_double_layer_open(a_sym)
        num = _pair_weight_op(cc, tt, ao, ao, op4, prec)
        den = _pair_weight(cc, tt, dl, dl, prec)
        energy = 2.0 * jnp.real(num / den)
        return energy, (cc, tt)

    return loss


def variational_ipeps(h2, bond_dim, chi, d=2, steps=200, lr=2e-3,
                      optimizer=None, refresh_iters=10, grad_iters=10,
                      init=None,
                      su_schedule=((0.1, 150), (0.02, 150), (0.005, 80)),
                      env_iters=150, dtype=jnp.float64):
    """Gradient-optimized C4v iPEPS ground state of ``H = sum h2``.

    Args:
        h2: nearest-neighbor bond term ``(d^2, d^2)`` (swap-symmetric,
            rotation-invariant Hamiltonians — e.g.
            :func:`~contractn_tpu.models.ipeps.tfim_bond_term_2d`).
        bond_dim: iPEPS virtual dimension D.
        chi: environment bond dimension (``>= D**2``).
        steps: optimization steps (one jitted scan).
        lr / optimizer: optax learning rate or a full optax optimizer.
        refresh_iters / grad_iters: environment refresh absorptions per
            step (untaped) and differentiated absorptions.
        init: optional ``(d, D, D, D, D)`` start; default is the
            simple-update state (so the gradient flow starts from the
            local-update optimum and can only improve it).

    Returns:
        ``(a_site, energy, energies)`` — the optimized C4v tensor, its
        fresh fully-converged CTMRG energy, and the per-step energy
        trace from the optimization (loosely converged estimates).
    """
    import optax

    if init is None:
        gamma, lam = simple_update(h2, bond_dim, d=d,
                                   schedule=su_schedule, dtype=dtype)
        init = su_absorb_weights(gamma, lam)
    params = symmetrize_c4v(jnp.asarray(init, dtype))
    params = params / jnp.max(jnp.abs(params))

    env = ctmrg_environment(peps_double_layer(params), chi,
                            iters=env_iters)
    opt = optimizer if optimizer is not None else optax.adam(lr)
    opt_state = opt.init(params)
    loss = make_ipeps_loss(h2, chi, refresh_iters=refresh_iters,
                           grad_iters=grad_iters)

    @jax.jit
    def run(params, c, t, opt_state):
        def body(carry, _):
            p, c, t, s = carry
            (e, (cn, tn)), g = jax.value_and_grad(
                loss, has_aux=True)(p, c, t)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            cn = jax.lax.stop_gradient(cn)
            tn = jax.lax.stop_gradient(tn)
            return (p, cn, tn, s), e

        (p, c, t, s), es = jax.lax.scan(
            body, (params, c, t, opt_state), None, length=steps)
        return p, c, t, es

    params, c, t, es = run(params, env[0], env[1], opt_state)
    a_site = symmetrize_c4v(params)
    e_final = float(ipeps_energy(np.asarray(a_site), h2, chi,
                                 iters=env_iters))
    return a_site, e_final, [float(x) for x in np.asarray(es)]
