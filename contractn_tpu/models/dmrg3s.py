"""Strictly single-site DMRG with subspace expansion (DMRG3S).

Hubig-McCulloch-Schollwoeck single-site DMRG: each local solve
optimizes ONE site tensor — cost ``O(d D^3 W)`` per site versus the
two-site sweep's ``O(d^2 D^3 W)`` solve plus its ``(dD, dD)`` SVD — and
bond growth, which plain single-site DMRG cannot do at all, is restored
by *subspace expansion*: before each truncation the active bond is
enriched with the mixing term ``P = alpha * L . W . M`` (left-to-right;
mirrored with ``R`` on the way back), the leading-order direction a
two-site update would have explored.  The mixing strength decays
geometrically over sweeps, so late sweeps are pure Rayleigh-quotient
descent.

This matters on TPU at production bond dimensions: the two-site solver's
Krylov space lives in ``(d, d, D, D)`` blocks (4x the memory traffic of
the single-site ``(d, D, D)``), while DMRG3S keeps the MXU on ``D x D``
GEMMs with a ``W``-fold expansion only at the SVD.

Builds on the same ragged-site machinery as
:mod:`contractn_tpu.models.dmrg`; no counterpart in the reference
(SURVEY.md §2: no optimizer of any kind).
"""

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..ops.krylov import lanczos_ground as _lanczos_ground_impl
from ..ops.stabilize import peinsum
from .dmrg import (
    _DENSE_EIGH_LIMIT,
    _ragged_sites,
    _rebuild_uniform,
    _update_left,
    _update_right,
)
from .tdvp import _h1_matvec


@partial(jax.jit, static_argnums=(4,))
def _ground_one_site_lanczos(envs_l, w, envs_r, m0, iters):
    return _lanczos_ground_impl(
        lambda m: _h1_matvec(envs_l, w, envs_r, m), m0, iters
    )


def _ground_one_site(envs_l, w, envs_r, m0, iters=24):
    """Lowest eigenpair of the one-site effective Hamiltonian.

    Dense eigh below the shared size limit, device-side Lanczos above.
    """
    d, dl, dr = m0.shape
    dim = d * dl * dr
    if dim > _DENSE_EIGH_LIMIT:
        e, m = _ground_one_site_lanczos(envs_l, w, envs_r, m0, iters)
        return float(e), m
    # H[(a,i,j), (b,p,q)] = L[i,w,p] W[a,b,w,v] R[j,v,q]
    h = peinsum("iwp,abwv,jvq->aijbpq", envs_l, w, envs_r)
    hmat = h.reshape(dim, dim)
    hmat = 0.5 * (hmat + jnp.conj(hmat.T))
    vals, vecs = jnp.linalg.eigh(hmat)
    return float(vals[0]), vecs[:, 0].reshape(d, dl, dr)


def _scaled_mix(p, m, alpha):
    """Mixing term rescaled relative to the optimized site tensor."""
    pn = jnp.linalg.norm(p.reshape(-1))
    mn = jnp.linalg.norm(m.reshape(-1))
    return p * (alpha * mn / jnp.maximum(pn, 1e-300))


def _expand_right(m, nxt, envs_l, w, alpha, max_bond):
    """Enrich the bond between ``m`` and ``nxt`` while moving right.

    ``m (d, Dl, Dr)`` optimized site, ``nxt (d, Dr, Dr2)``.  Returns the
    isometric replacement for ``m`` (bond grown up to ``max_bond``) and
    the updated next site.
    """
    d, dl, dr = m.shape
    wdim = w.shape[2]
    # P[a, i, (v, q)] = L[i,w,p] W[a,b,w,v] M[b,p,q]
    p = peinsum("iwp,abwv,bpq->aivq", envs_l, w, m)
    p = _scaled_mix(p.reshape(d, dl, wdim * dr), m, alpha)
    ext = jnp.concatenate([m, p], axis=2)  # (d, Dl, Dr + W Dr)
    mat = ext.reshape(d * dl, -1)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    k = min(int(s.shape[0]), max_bond)
    u, s, vh = u[:, :k], s[:k], vh[:k]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    new_m = u.reshape(d, dl, k)
    carry = s[:, None] * vh  # (k, Dr + W Dr)
    nxt_ext = jnp.concatenate(
        [nxt, jnp.zeros((d, wdim * dr, nxt.shape[2]), nxt.dtype)], axis=1
    )
    new_nxt = peinsum("kx,dxj->dkj", carry, nxt_ext)
    return new_m, new_nxt


def _expand_left(m, prv, w, envs_r, alpha, max_bond):
    """Mirror of :func:`_expand_right` while moving left."""
    d, dl, dr = m.shape
    wdim = w.shape[2]
    # P[a, (v, p), j] = W[a,b,v,u] M[b,p,q] R[j,u,q]
    p = peinsum("abvu,bpq,juq->avpj", w, m, envs_r)
    p = _scaled_mix(p.reshape(d, wdim * dl, dr), m, alpha)
    ext = jnp.concatenate([m, p], axis=1)  # (d, Dl + W Dl, Dr)
    mat = ext.transpose(1, 0, 2).reshape(dl + wdim * dl, d * dr)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    k = min(int(s.shape[0]), max_bond)
    u, s, vh = u[:, :k], s[:k], vh[:k]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    new_m = vh.reshape(k, d, dr).transpose(1, 0, 2)
    carry = u * s[None, :]  # (Dl + W Dl, k)
    prv_ext = jnp.concatenate(
        [prv, jnp.zeros((d, prv.shape[1], wdim * dl), prv.dtype)], axis=2
    )
    new_prv = peinsum("dpx,xk->dpk", prv_ext, carry)
    return new_m, new_prv


def dmrg3s(mpo, mps0, max_bond=None, sweeps=6, mixing=1e-2, decay=0.5,
           lanczos_iters=24):
    """Single-site DMRG ground-state search with subspace expansion.

    Args:
        mpo: Hermitian Hamiltonian as an :class:`~.mpo.MPO`.
        mps0: initial state; may have a SMALLER bond than ``max_bond`` —
            the expansion grows bonds (plain single-site DMRG cannot),
            which is the regression the tests pin.
        max_bond: bond cap (default ``mps0.bond_dim``).
        sweeps: full left-right + right-left sweeps.
        mixing: initial expansion strength ``alpha`` (relative to the
            optimized site's norm); decays by ``decay`` each sweep.
        decay: per-sweep geometric decay of ``alpha``.

    Returns:
        ``(ground_mps, energy, energies)`` as :func:`~.dmrg.dmrg`.
    """
    n = mps0.n_sites
    if n < 2:
        raise ValueError("dmrg3s needs at least 2 sites")
    max_bond = max_bond or mps0.bond_dim
    sites = _ragged_sites(mps0)
    ws = [mpo.cores[i] for i in range(n)]

    envs_l = [None] * (n + 1)
    envs_r = [None] * (n + 1)
    envs_l[0] = mpo.left[None, :, None].astype(sites[0].dtype)
    envs_r[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        envs_r[i] = _update_right(envs_r[i + 1], sites[i], ws[i])

    energies = []
    energy = np.inf
    alpha = float(mixing)
    for _ in range(sweeps):
        for i in range(n - 1):  # left -> right, expand the right bond
            energy, m = _ground_one_site(
                envs_l[i], ws[i], envs_r[i + 1], sites[i],
                iters=lanczos_iters,
            )
            sites[i], sites[i + 1] = _expand_right(
                m, sites[i + 1], envs_l[i], ws[i], alpha, max_bond
            )
            envs_l[i + 1] = _update_left(envs_l[i], sites[i], ws[i])
        for i in range(n - 1, 0, -1):  # right -> left, expand the left
            energy, m = _ground_one_site(
                envs_l[i], ws[i], envs_r[i + 1], sites[i],
                iters=lanczos_iters,
            )
            sites[i], sites[i - 1] = _expand_left(
                m, sites[i - 1], ws[i], envs_r[i + 1], alpha, max_bond
            )
            envs_r[i] = _update_right(envs_r[i + 1], sites[i], ws[i])
        energies.append(energy)
        alpha *= decay

    return (
        _rebuild_uniform(sites, np.asarray(mps0.cores).dtype),
        energy,
        energies,
    )
