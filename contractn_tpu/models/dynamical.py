"""Correction-vector dynamical DMRG: spectral functions at fixed omega.

The frequency-domain route to dynamics (Jeckelmann's dynamical DMRG),
complementing the framework's time-domain (W^II / TDVP + Fourier) and
Chebyshev (KPM) routes: for each frequency solve a LINEAR SYSTEM instead
of evolving or expanding,

    ``S_B(w) = -(1/pi) Im <0| B+ [w + E0 - H + i eta]^{-1} B |0>``.

With ``K = (w + E0) I - H`` the resolvent splits into real arithmetic:
``1/(K + i eta) = (K - i eta)/(K^2 + eta^2)``, so ONE Hermitian
positive-definite solve

    ``(K^2 + eta^2) |y> = |b>,    |b> = B |0>``

yields the full complex Green's function: ``Im G = -eta <b|y>``,
``Re G = <b|K y>``.  The HPD operator rides
:func:`~contractn_tpu.models.linsolve.mps_linear_solve` unchanged (the
same environment CG the PDE solves use); ``K^2`` is exact MPO algebra
(:func:`~contractn_tpu.models.mpo.mpo_multiply`) compressed to a fixed
bond so every frequency reuses one compiled program shape.

This is the method of choice when a few frequencies need HIGH
resolution (eta can be taken small at fixed cost per point), where KPM
needs O(1/eta) moments and time evolution needs O(1/eta) propagation.

Anchored in tests against the dense Lehmann representation
sum_n |<n|B|0>|^2 * eta/pi / ((w + E0 - E_n)^2 + eta^2) on exact chains.
The reference has no solver or model layer (SURVEY.md section 2).
"""

import numpy as np
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .boundary import apply_mpo_to_mps
from .canonical import compress_mpo
from .linsolve import mps_linear_solve
from .mpo import MPO, mpo_multiply, mpo_sum
from .mps import MPS

__all__ = [
    "apply_site_operator",
    "correction_vector",
    "cv_greens_function",
    "cv_spectral_function",
    "scale_mpo",
    "shifted_normal_mpo",
]


def scale_mpo(mpo, c):
    """``c * O`` exactly, through the left boundary vector."""
    return MPO(mpo.cores, c * jnp.asarray(mpo.left), mpo.right)


def apply_site_operator(mps, op, site):
    """``(I x .. x op_site x .. x I) |mps>`` — one-site operator applied
    in place on the physical leg (no bond growth)."""
    op = jnp.asarray(op, mps.cores.dtype)
    core = peinsum("st,tjq->sjq", op, mps.cores[site])
    return MPS(mps.cores.at[site].set(core), mps.left, mps.right)


def shifted_normal_mpo(h_mpo, shift, eta, compress_bond=None):
    """``A = K^2 + eta^2`` with ``K = shift*I - H`` (Hermitian PD).

    Returns ``(a_mpo, k_mpo)``; pass ``compress_bond`` to cap the
    squared operator's bond at a STATIC value so scans over frequency
    reuse one compiled solver shape.
    """
    n, d = int(h_mpo.cores.shape[0]), int(h_mpo.cores.shape[1])
    dt = jnp.asarray(h_mpo.cores).dtype
    ident = MPO.identity(n, d, dtype=dt)
    k_mpo = mpo_sum(scale_mpo(ident, shift), scale_mpo(h_mpo, -1.0))
    k2 = mpo_multiply(k_mpo, k_mpo)
    a_mpo = mpo_sum(k2, scale_mpo(ident, eta * eta))
    if compress_bond is not None:
        comp, log_norm, _ = compress_mpo(a_mpo, max_bond=compress_bond)
        a_mpo = MPO(comp.cores, jnp.exp(log_norm) * comp.left,
                    comp.right)
    return a_mpo, k_mpo


def _inner(a, b):
    v, log = a.inner(b)
    return complex(v) * float(np.exp(log))


def correction_vector(h_mpo, e0, b_mps, omega, eta, max_bond=None,
                      sweeps=6, cg_iters=64, compress_bond=None, x0=None):
    """Solve ``(K^2 + eta^2)|y> = |b>`` at ``K = (omega + e0) - H``.

    Returns ``(y, g)`` — the correction vector (reusable as the warm
    start ``x0`` of the next frequency) and the complex Green's
    function value ``g = <b| (K + i eta)^{-1} |b>``... precisely
    ``Re g = <b|K|y>``, ``Im g = -eta <b|y>``.
    """
    a_mpo, k_mpo = shifted_normal_mpo(h_mpo, omega + e0, eta,
                                      compress_bond=compress_bond)
    y, _ = mps_linear_solve(a_mpo, b_mps, x0=x0, sweeps=sweeps,
                            max_bond=max_bond, cg_iters=cg_iters)
    ky = apply_mpo_to_mps(k_mpo, y)
    g = _inner(b_mps, ky) - 1j * eta * _inner(b_mps, y)
    return y, g


def cv_greens_function(h_mpo, ground, e0, op, site, omegas, eta,
                       max_bond=None, sweeps=6, cg_iters=64,
                       compress_bond=None):
    """``G(w) = <0|B+ [w + E0 - H + i eta]^{-1} B|0>`` on a frequency
    grid, ``B`` a one-site operator at ``site``.

    Consecutive frequencies warm-start from the previous correction
    vector (the resolvent varies smoothly in ``w``), so dense grids
    converge in very few sweeps per point.  Returns the complex
    ``(len(omegas),)`` array, normalized by ``<0|0>``.
    """
    b_mps = apply_site_operator(ground, op, site)
    norm = _inner(ground, ground).real
    out = []
    y = None
    for w in np.atleast_1d(omegas):
        y, g = correction_vector(
            h_mpo, e0, b_mps, float(w), eta, max_bond=max_bond,
            sweeps=sweeps, cg_iters=cg_iters,
            compress_bond=compress_bond, x0=y,
        )
        out.append(g / norm)
    return np.asarray(out)


def cv_spectral_function(h_mpo, ground, e0, op, site, omegas, eta,
                         **kwargs):
    """``S(w) = -(1/pi) Im G(w)`` — an eta-Lorentzian-broadened local
    spectral function (see :func:`cv_greens_function` for kwargs)."""
    g = cv_greens_function(h_mpo, ground, e0, op, site, omegas, eta,
                           **kwargs)
    return -g.imag / np.pi
