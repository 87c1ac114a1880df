"""Linear systems in MPS form: ``A |x> = |b>`` by two-site ALS.

The DMRG-family algorithm the framework was still missing: given an
MPO ``A`` (Hermitian positive definite) and an MPS ``|b>``, sweep a
two-site window minimizing the quadratic functional
``(1/2) <x|A|x> - Re <b|x>`` — whose stationary point is the solution
— solving each local problem ``A_eff theta = b_eff`` with a
device-side conjugate-gradient on the SAME environment matvec DMRG
uses (:func:`~contractn_tpu.models.dmrg._heff_matvec`; never
materializing the effective operator), and splitting by SVD so the
bond adapts up to ``max_bond`` exactly like the energy solver.

General (non-Hermitian / indefinite) systems go through the normal
equations: ``(A+ A) x = A+ b`` with
:func:`~contractn_tpu.models.mpo.mpo_multiply` /
:func:`~contractn_tpu.models.mpo.mpo_dagger` (exact, at the squared
bond; :func:`normal_equations` packages the pair).

This powers grid PDE solves in the quantics representation
(tests/test_linsolve.py: the screened Poisson equation on a 2^8 grid
matches the dense solve at 1e-8 with tiny bonds) — and any
shifted-inverse / correction-vector style computation downstream.
The reference has no solver of any kind (SURVEY.md section 2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .boundary import apply_mpo_to_mps
from .canonical import mps_add
from .dmrg import (
    _heff_matvec,
    _ovl_left_update,
    _ovl_right_update,
    _penalty_vector,
    _ragged_sites,
    _rebuild_uniform,
    _split_theta,
    _update_left,
    _update_right,
)
from .mpo import mpo_dagger, mpo_multiply
from .mps import MPS


@partial(jax.jit, static_argnums=(6,))
def _local_cg(L, w1, w2, R, rhs, theta0, iters):
    """Conjugate gradient on ``A_eff theta = rhs`` (Hermitian PD
    ``A_eff`` applied through the DMRG environment matvec).  Static
    iteration count; converged directions are masked, not branched."""

    def matvec(t):
        return _heff_matvec(L, w1, w2, R, t)

    r0 = rhs - matvec(theta0)
    rs0 = jnp.real(jnp.vdot(r0, r0))
    tol2 = 1e-28 * jnp.maximum(jnp.real(jnp.vdot(rhs, rhs)), 1e-300)

    def body(carry, _):
        x, r, p, rs = carry
        live = rs > tol2
        ap = matvec(p)
        denom = jnp.real(jnp.vdot(p, ap))
        alpha = jnp.where(live & (denom > 0), rs / jnp.maximum(
            denom, 1e-300), 0.0).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.real(jnp.vdot(r, r))
        beta = jnp.where(live, rs_new / jnp.maximum(rs, 1e-300),
                         0.0).astype(x.dtype)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (theta, r, _, rs), _ = jax.lax.scan(
        body, (theta0, r0, r0, rs0), None, length=iters)
    return theta, jnp.sqrt(jnp.maximum(rs, 0.0))


def mps_linear_solve(a_mpo, b_mps, x0=None, sweeps=6, max_bond=None,
                     cg_iters=64):
    """Solve ``A |x> = |b>`` for Hermitian positive definite ``A``.

    Args:
        a_mpo: the operator (HPD; wrap general systems with
            :func:`normal_equations` first).
        b_mps: right-hand side.
        x0: initial guess (default: ``b``).
        sweeps: full left-right + right-left ALS sweeps.
        max_bond: solution bond cap (default ``b``'s bond + headroom
            is NOT assumed — pass what the solution needs).
        cg_iters: local conjugate-gradient iterations.

    Returns ``(x, local_residuals)``: the solution MPS and the
    per-sweep final local CG residual (diagnostic; use
    :func:`linear_residual` for the true global residual).
    """
    n = b_mps.n_sites
    if n < 2:
        raise ValueError("mps_linear_solve needs at least 2 sites")
    if x0 is None:
        x0 = b_mps
    max_bond = max_bond or max(x0.bond_dim, b_mps.bond_dim)
    sites = _ragged_sites(x0)
    bs = _ragged_sites(b_mps)
    ws = [a_mpo.cores[i] for i in range(n)]
    dt = jnp.result_type(sites[0].dtype, bs[0].dtype, ws[0].dtype)
    sites = [s.astype(dt) for s in sites]
    bs = [b.astype(dt) for b in bs]
    ws = [w.astype(dt) for w in ws]

    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = jnp.asarray(a_mpo.left, dt)[None, :, None]
    R[n] = jnp.asarray(a_mpo.right, dt)[None, :, None]
    lb = [None] * (n + 1)
    rb = [None] * (n + 1)
    one = jnp.ones((1, 1), dt)
    lb[0] = one
    rb[n] = one
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])
        rb[i] = _ovl_right_update(rb[i + 1], bs[i], sites[i])

    residuals = []
    res = np.inf
    for _ in range(sweeps):
        for i in range(n - 1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            rhs = _penalty_vector(lb[i], bs[i], bs[i + 1], rb[i + 2])
            theta, res = _local_cg(L[i], ws[i], ws[i + 1], R[i + 2],
                                   rhs, theta0, int(cg_iters))
            t1, t2 = _split_theta(theta, max_bond, to_left=True)
            # _split_theta normalizes; restore the solution's scale
            scale = jnp.linalg.norm(theta.reshape(-1))
            sites[i], sites[i + 1] = t1, scale * t2
            L[i + 1] = _update_left(L[i], sites[i], ws[i])
            lb[i + 1] = _ovl_left_update(lb[i], bs[i], sites[i])
        for i in range(n - 2, -1, -1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            rhs = _penalty_vector(lb[i], bs[i], bs[i + 1], rb[i + 2])
            theta, res = _local_cg(L[i], ws[i], ws[i + 1], R[i + 2],
                                   rhs, theta0, int(cg_iters))
            t1, t2 = _split_theta(theta, max_bond, to_left=False)
            scale = jnp.linalg.norm(theta.reshape(-1))
            sites[i], sites[i + 1] = scale * t1, t2
            R[i + 1] = _update_right(R[i + 2], sites[i + 1], ws[i + 1])
            rb[i + 1] = _ovl_right_update(rb[i + 2], bs[i + 1],
                                          sites[i + 1])
        residuals.append(float(res))
    return _rebuild_uniform(sites, np.dtype(dt)), residuals


def normal_equations(a_mpo, b_mps, compress_bond=None):
    """``(A+ A, A+ b)`` for general systems: feed the pair to
    :func:`mps_linear_solve` (the normal operator is HPD whenever
    ``A`` has full column rank).  ``compress_bond`` optionally
    SVD-compresses the squared operator."""
    ada = mpo_multiply(mpo_dagger(a_mpo), a_mpo)
    if compress_bond is not None:
        from .canonical import compress_mpo

        ada, log_norm, _ = compress_mpo(ada, max_bond=compress_bond)
        ada = type(ada)(ada.cores, jnp.exp(log_norm) * ada.left,
                        ada.right)
    adb = apply_mpo_to_mps(mpo_dagger(a_mpo), b_mps)
    return ada, adb


def linear_residual(a_mpo, x_mps, b_mps):
    """True global relative residual ``||A x - b|| / ||b||`` via exact
    MPO application and MPS addition (no truncation)."""
    ax = apply_mpo_to_mps(a_mpo, x_mps)
    neg_b = MPS(b_mps.cores, -jnp.asarray(b_mps.left), b_mps.right)
    diff = mps_add(ax, neg_b)  # exact direct sum, no truncation
    dv, dl = diff.norm_squared()
    bv, bl = b_mps.norm_squared()
    num = 0.5 * (jnp.log(jnp.maximum(jnp.real(dv), 1e-300)) + dl)
    den = 0.5 * (jnp.log(jnp.maximum(jnp.real(bv), 1e-300)) + bl)
    return float(jnp.exp(num - den))
