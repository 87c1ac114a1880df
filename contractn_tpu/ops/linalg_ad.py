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

Both REAL and COMPLEX dtypes are supported (round 3; round 2 was
real-only, which barred variational iPEPS from time-reversal-breaking
Hamiltonians).  Rather than hand-transposing the complex cotangent
formulas — where the extra anti-Hermitian-diagonal ``dUdV`` term and
the conjugation pattern are classic sign-error territory — each VJP is
derived as the exact adjoint of the Lorentzian-BROADENED forward
tangent map (the textbook JVP formulas below, complex-safe, matching
``jax._src.lax.linalg``'s own rules with ``1/gap`` broadened): the
tangent map is linear in ``dA``, so one ``jax.vjp`` of it — which only
differentiates matmuls, never a decomposition — is its adjoint.  For
real inputs this reproduces the round-2 hand-written rules.

Hermitian inputs are assumed already symmetrized (callers do
``0.5 * (m + m.H)``); the returned eigh cotangent is Hermitian-
projected, which is the correct projection onto that tangent space.

No counterpart in the reference (no autodiff of any kind).
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _h(x):
    return jnp.conj(x.T)


def _eigh_jvp_broadened(vals, vecs, dm, eps):
    """Broadened tangent of ``eigh`` at a Hermitian point.

    ``dvals_i = Re (V^H dM V)_ii``; ``dvecs = V (F o V^H dM V)`` with
    ``F_ij = 1/(lam_j - lam_i)`` Lorentzian-broadened (zero diagonal —
    the phase/sign gauge direction, dropped by convention).
    """
    vhdv = _mm(_h(vecs), _mm(dm, vecs))
    dvals = jnp.real(jnp.diagonal(vhdv))
    gap = vals[None, :] - vals[:, None]
    f = gap / (gap * gap + eps)
    dvecs = _mm(vecs, f.astype(vecs.dtype) * vhdv)
    return dvals, dvecs


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def eigh_safe(m, eps=_EPS):
    """``(vals, vecs) = eigh(m)`` with a degeneracy-broadened VJP.

    Forward pass is exactly ``jnp.linalg.eigh``; only the reverse rule
    differs (Lorentzian-broadened eigenvalue gaps).  Real-symmetric or
    complex-Hermitian input.  Returns a PLAIN tuple (not jax's
    ``EighResult`` namedtuple) so the primal pytree structure matches
    the fwd rule's — custom_vjp rejects the mismatch when a gradient
    is traced through.
    """
    vals, vecs = jnp.linalg.eigh(m)
    return vals, vecs


def _eigh_fwd(m, eps):
    vals, vecs = jnp.linalg.eigh(m)
    return (vals, vecs), (vals, vecs)


def _eigh_bwd(eps, res, cot):
    vals, vecs = res
    dm0 = jnp.zeros_like(vecs)
    _, pull = jax.vjp(
        lambda dm: _eigh_jvp_broadened(vals, vecs, dm, eps), dm0
    )
    (gm,) = pull(tuple(cot))  # cot may be an EighResult namedtuple
    # project onto the Hermitian tangent space (input contract)
    return (0.5 * (gm + _h(gm)),)


eigh_safe.defvjp(_eigh_fwd, _eigh_bwd)


def _svd_jvp_broadened(u, s, vh, dm, eps):
    """Broadened tangent of compact SVD (complex-safe).

    Mirrors ``jax._src.lax.linalg._svd_jvp_rule`` with every inverse —
    the ``1/(s_j^2 - s_i^2)`` gap factors AND the ``1/s`` in the
    anti-Hermitian-diagonal and off-range terms — Lorentzian-broadened.
    """
    v = _h(vh)
    ut = _h(u)
    ds_mat = _mm(ut, _mm(dm, v))
    ds = jnp.real(jnp.diagonal(ds_mat))

    s_j, s_i = s[None, :], s[:, None]
    gap = (s_j + s_i) * (s_j - s_i)  # s_j^2 - s_i^2, zero diagonal
    f = (gap / (gap * gap + eps)).astype(dm.dtype)
    s_inv = (s / (s * s + eps)).astype(dm.dtype)

    dss = s_j.astype(dm.dtype) * ds_mat          # dS . diag(s)
    sds = s_i.astype(dm.dtype) * ds_mat          # diag(s) . dS
    anti_diag = 0.5 * (ds_mat - _h(ds_mat)) * jnp.diag(s_inv)
    du = _mm(u, f * (dss + _h(dss)) + anti_diag)
    dv = _mm(v, f * (sds + _h(sds)))

    m_rows, n_cols = dm.shape
    k = s.shape[0]
    if m_rows > k:
        dav = _mm(dm, v)
        du = du + (dav - _mm(u, _mm(ut, dav))) * s_inv[None, :]
    if n_cols > k:
        dahu = _mm(_h(dm), u)
        dv = dv + (dahu - _mm(v, _mm(vh, dahu))) * s_inv[None, :]
    return du, ds, _h(dv)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def svd_safe(m, eps=_EPS):
    """Compact ``(u, s, vh) = svd(m)`` with a degeneracy-broadened VJP.

    Forward is ``jnp.linalg.svd(m, full_matrices=False)``; the reverse
    rule broadens the ``1/(s_i^2 - s_j^2)`` gap factors and the ``1/s``
    inverses (rank deficiency).  Real or complex input.
    """
    return jnp.linalg.svd(m, full_matrices=False)


def _svd_fwd(m, eps):
    out = jnp.linalg.svd(m, full_matrices=False)
    return out, out


def _svd_bwd(eps, res, cot):
    u, s, vh = res
    dm0 = jnp.zeros((u.shape[0], vh.shape[1]), u.dtype)
    _, pull = jax.vjp(
        lambda dm: _svd_jvp_broadened(u, s, vh, dm, eps), dm0
    )
    (gm,) = pull(tuple(cot))  # cot may be an SVDResult namedtuple
    return (gm,)


svd_safe.defvjp(_svd_fwd, _svd_bwd)
