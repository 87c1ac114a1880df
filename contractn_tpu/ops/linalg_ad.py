"""Degeneracy-safe linear-algebra VJPs for fixed-point autodiff.

Reverse-mode gradients of ``eigh``/``svd`` contain ``1 / (lam_i -
lam_j)`` factors that blow up (NaN) on degenerate spectra.  Physical
tensor networks are FULL of exact degeneracies — every unbroken
symmetry pairs corner-spectrum eigenvalues — so differentiating a CTMRG
environment with the stock decompositions fails precisely on the
interesting states.  The standard cure (Liao-Liu-Wang-Xiang,
"Differentiable programming tensor networks", PRX 9, 031041; also
peps-torch) is Lorentzian broadening of the inverse gaps:

    ``1 / x  ->  x / (x^2 + eps)``

which leaves non-degenerate gradients untouched to ``O(eps)`` and
regularizes degenerate ones to the (gauge-averaged) finite value.  The
dropped component is a pure gauge rotation inside the degenerate
subspace, which cancels in any gauge-invariant downstream quantity
(e.g. a CTMRG energy, where the projectors appear once transposed and
once not).

Only the real-symmetric case is implemented — the C4v CTMRG path is
real — and inputs are assumed already symmetrized (callers do
``0.5 * (m + m.T)``); the returned cotangent is symmetrized, which is
the correct projection onto the symmetric tangent space.

No counterpart in the reference (no autodiff of any kind).
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def eigh_safe(m, eps=_EPS):
    """``(vals, vecs) = eigh(m)`` with a degeneracy-broadened VJP.

    Forward pass is exactly ``jnp.linalg.eigh``; only the reverse rule
    differs (Lorentzian-broadened eigenvalue gaps).  REAL symmetric
    input only — the VJP uses plain transposes and omits the complex
    phase terms, so complex input would get silently wrong gradients;
    it is rejected instead.
    """
    if jnp.iscomplexobj(m):
        raise TypeError(
            "eigh_safe implements the REAL-symmetric VJP only; a "
            "complex input would receive a silently wrong gradient"
        )
    return jnp.linalg.eigh(m)


def _eigh_fwd(m, eps):
    # under jax.grad this fwd rule runs INSTEAD of the primal body, so
    # the real-only guard must live here too
    if jnp.iscomplexobj(m):
        raise TypeError(
            "eigh_safe implements the REAL-symmetric VJP only; a "
            "complex input would receive a silently wrong gradient"
        )
    vals, vecs = jnp.linalg.eigh(m)
    return (vals, vecs), (vals, vecs)


def _eigh_bwd(eps, res, cot):
    vals, vecs = res
    gvals, gvecs = cot
    gap = vals[None, :] - vals[:, None]
    f = gap / (gap * gap + eps)  # broadened 1/gap, zero on the diagonal
    vt_gv = jnp.matmul(vecs.T, gvecs,
                       precision=jax.lax.Precision.HIGHEST)
    mid = jnp.diag(gvals) + f * vt_gv
    gm = jnp.matmul(jnp.matmul(vecs, mid,
                               precision=jax.lax.Precision.HIGHEST),
                    vecs.T, precision=jax.lax.Precision.HIGHEST)
    return (0.5 * (gm + gm.T),)


eigh_safe.defvjp(_eigh_fwd, _eigh_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def svd_safe(m, eps=_EPS):
    """Compact ``(u, s, vh) = svd(m)`` with a degeneracy-broadened VJP.

    Forward is ``jnp.linalg.svd(m, full_matrices=False)``; the reverse
    rule broadens both the ``1/(s_i^2 - s_j^2)`` gap factors and the
    ``1/s`` inverses (rank deficiency).  REAL matrices only (see
    :func:`eigh_safe`); complex input is rejected rather than given a
    silently wrong gradient.
    """
    if jnp.iscomplexobj(m):
        raise TypeError(
            "svd_safe implements the REAL VJP only; a complex input "
            "would receive a silently wrong gradient"
        )
    return jnp.linalg.svd(m, full_matrices=False)


def _svd_fwd(m, eps):
    if jnp.iscomplexobj(m):  # see _eigh_fwd
        raise TypeError(
            "svd_safe implements the REAL VJP only; a complex input "
            "would receive a silently wrong gradient"
        )
    out = jnp.linalg.svd(m, full_matrices=False)
    return out, out


def _svd_bwd(eps, res, cot):
    u, s, vh = res
    gu, gs, gvh = cot
    v, gv = vh.T, gvh.T
    prec = jax.lax.Precision.HIGHEST
    k = s.shape[0]
    s2 = s * s
    gap = s2[None, :] - s2[:, None]
    f = gap / (gap * gap + eps)  # broadened 1/(s_j^2 - s_i^2), 0 diag
    s_inv = s / (s2 + eps)       # broadened 1/s

    ut_gu = jnp.matmul(u.T, gu, precision=prec)
    vt_gv = jnp.matmul(v.T, gv, precision=prec)
    j_mat = f * (ut_gu - ut_gu.T)
    k_mat = f * (vt_gv - vt_gv.T)
    # core term: U (J S + S K + diag(gs)) V^T with S = diag(s)
    mid = j_mat * s[None, :] + s[:, None] * k_mat + jnp.diag(gs)
    gm = jnp.matmul(jnp.matmul(u, mid, precision=prec), v.T,
                    precision=prec)
    # off-range corrections for rectangular m
    m_rows, m_cols = u.shape[0], v.shape[0]
    if m_rows > k:
        proj_u = gu - jnp.matmul(u, ut_gu, precision=prec)
        gm = gm + jnp.matmul(proj_u * s_inv[None, :], v.T,
                             precision=prec)
    if m_cols > k:
        proj_v = gv - jnp.matmul(v, vt_gv, precision=prec)
        gm = gm + jnp.matmul(u * s_inv[None, :], proj_v.T,
                             precision=prec)
    return (gm,)


svd_safe.defvjp(_svd_fwd, _svd_bwd)
