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

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .boundary import apply_mpo_to_mps
from .canonical import compress_mpo
from .dmrg import (
    _ovl_left_update,
    _ovl_right_update,
    _penalty_vector,
    _ragged_sites,
    _split_theta,
    _update_left,
    _update_right,
)
from .linsolve import _local_cg, mps_linear_solve
from .mpo import MPO, mpo_multiply, mpo_sum
from .mps import MPS

__all__ = [
    "apply_site_operator",
    "correction_vector",
    "cv_greens_function",
    "cv_greens_function_batched",
    "cv_spectral_function",
    "cv_spectral_function_batched",
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


# --------------------------------------------------------------------- #
# The whole frequency grid as ONE jit(vmap) program                      #
# --------------------------------------------------------------------- #
#
# The TPU-first observation: A(w) = ((w+E0) - H)^2 + eta^2 has
# FREQUENCY-INDEPENDENT cores.  The shift enters mpo_sum(I, -H) only
# through the left boundary vector, mpo_multiply Kroneckers boundary
# vectors, and the eta^2 identity concatenates one more entry — so the
# whole frequency family is one static operator with a (n_w, W)-batched
# left vector, and the full ALS solve vmaps over it: every frequency of
# the spectrum runs in ONE compiled program, batched onto the MXU.

def _freq_family(h_mpo, eta):
    """Static ``(K, A)`` cores + the per-shift boundary-vector maps."""
    n, d = int(h_mpo.cores.shape[0]), int(h_mpo.cores.shape[1])
    dt = jnp.asarray(h_mpo.cores).dtype
    ident = MPO.identity(n, d, dtype=dt)
    k_t = mpo_sum(ident, scale_mpo(h_mpo, -1.0))  # shift = 1 template
    a_t = mpo_sum(mpo_multiply(k_t, k_t), scale_mpo(ident, eta * eta))
    h_left = np.asarray(h_mpo.left)

    def k_left(shift):
        return np.concatenate([[shift], -h_left])

    def a_left(shift):
        kl = k_left(shift)
        return np.concatenate([np.kron(kl, kl), [eta * eta]])

    return k_t, a_t, k_left, a_left


def _solve_pure(a_cores, a_left, a_right, bs, sweeps, max_bond,
                cg_iters):
    """Trace-pure two-site ALS (the :func:`mps_linear_solve` sweeps
    without host conversions) — vmappable over the boundary vector."""
    n = len(bs)
    sites = list(bs)
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = a_left[None, :, None]
    R[n] = a_right[None, :, None]
    lb = [None] * (n + 1)
    rb = [None] * (n + 1)
    one = jnp.ones((1, 1), bs[0].dtype)
    lb[0] = one
    rb[n] = one
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], a_cores[i])
        rb[i] = _ovl_right_update(rb[i + 1], bs[i], sites[i])
    for _ in range(sweeps):
        for i in range(n - 1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            rhs = _penalty_vector(lb[i], bs[i], bs[i + 1], rb[i + 2])
            theta, _ = _local_cg(L[i], a_cores[i], a_cores[i + 1],
                                 R[i + 2], rhs, theta0, int(cg_iters))
            t1, t2 = _split_theta(theta, max_bond, to_left=True)
            scale = jnp.linalg.norm(theta.reshape(-1))
            sites[i], sites[i + 1] = t1, scale * t2
            L[i + 1] = _update_left(L[i], sites[i], a_cores[i])
            lb[i + 1] = _ovl_left_update(lb[i], bs[i], sites[i])
        for i in range(n - 2, -1, -1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            rhs = _penalty_vector(lb[i], bs[i], bs[i + 1], rb[i + 2])
            theta, _ = _local_cg(L[i], a_cores[i], a_cores[i + 1],
                                 R[i + 2], rhs, theta0, int(cg_iters))
            t1, t2 = _split_theta(theta, max_bond, to_left=False)
            scale = jnp.linalg.norm(theta.reshape(-1))
            sites[i], sites[i + 1] = scale * t1, t2
            R[i + 1] = _update_right(R[i + 2], sites[i + 1],
                                     a_cores[i + 1])
            rb[i + 1] = _ovl_right_update(rb[i + 2], bs[i + 1],
                                          sites[i + 1])
    return sites


def _overlap_pure(bs, ys):
    t = jnp.ones((1, 1), bs[0].dtype)
    for bi, yi in zip(bs, ys):
        t = peinsum("xy,dxp,dyq->pq", t, jnp.conj(bi), yi)
    return t[0, 0]


def _sandwich_pure(bs, k_cores, k_left, k_right, ys):
    t = k_left[None, :, None].astype(bs[0].dtype)  # (bra, W, ket)
    for bi, ki, yi in zip(bs, k_cores, ys):
        t = peinsum("iwp,bpq->iwbq", t, yi)
        t = peinsum("abwv,iwbq->iavq", ki, t)
        t = peinsum("aij,iavq->jvq", jnp.conj(bi), t)
    return peinsum("jvq,v->jq", t, k_right)[0, 0]


def cv_greens_function_batched(h_mpo, ground, e0, op, site, omegas,
                               eta, max_bond=None, sweeps=6,
                               cg_iters=64):
    """The full frequency grid of ``G(w)`` as ONE jit(vmap) program.

    Same contract as :func:`cv_greens_function`; instead of one solve
    per frequency with warm starts, every frequency solves from
    ``x0 = b`` concurrently, batched over the (tiny) frequency-
    dependent boundary vector.  No operator compression (the squared
    bond ``(W+1)^2 + 1`` is static) — on accelerators the batch pays
    for the few extra channels many times over.
    """
    b_mps = apply_site_operator(ground, op, site)
    bs = _ragged_sites(b_mps)
    norm = _inner(ground, ground).real
    k_t, a_t, k_left_fn, a_left_fn = _freq_family(h_mpo, eta)
    n = len(bs)
    max_bond = max_bond or b_mps.bond_dim
    shifts = np.atleast_1d(np.asarray(omegas, float)) + e0
    k_lefts = jnp.asarray(np.stack([k_left_fn(s) for s in shifts]))
    a_lefts = jnp.asarray(np.stack([a_left_fn(s) for s in shifts]))
    a_cores = [a_t.cores[i] for i in range(n)]
    k_cores = [k_t.cores[i] for i in range(n)]

    def one(a_left, k_left):
        ys = _solve_pure(a_cores, a_left, jnp.asarray(a_t.right), bs,
                         int(sweeps), int(max_bond), int(cg_iters))
        by = _overlap_pure(bs, ys)
        bky = _sandwich_pure(bs, k_cores, k_left,
                             jnp.asarray(k_t.right), ys)
        return bky, by

    bky, by = jax.jit(jax.vmap(one))(a_lefts, k_lefts)
    return (np.asarray(bky) - 1j * eta * np.asarray(by)) / norm


def cv_spectral_function_batched(h_mpo, ground, e0, op, site, omegas,
                                 eta, **kwargs):
    """``-(1/pi) Im G`` over the grid — one compiled program."""
    g = cv_greens_function_batched(h_mpo, ground, e0, op, site, omegas,
                                   eta, **kwargs)
    return -g.imag / np.pi
