"""CTMRG: corner-transfer-matrix environments for infinite 2D networks.

The corner transfer matrix renormalization group (Nishino-Okunishi,
symmetric C4v variant) computes the environment of a translation-
invariant 2D tensor network directly in the thermodynamic limit: a
corner matrix ``C (chi, chi)`` and an edge tensor ``T (chi, q, chi)``
absorb one row/column of the lattice per iteration, truncated back to
``chi`` by the corner's own eigenbasis.  Converged environments give

* the partition function per site via Baxter's corner ratio
  ``kappa = w_site * w_corner / w_edge^2`` (free energy per site);
* local observables by inserting an impurity tensor into the site patch.

TPU shape: the growth phase (``chi`` expanding from ``q`` to
``chi_max``) is a short host loop; after that every iteration has
static shapes and the whole convergence loop runs as ONE jitted
``lax.fori_loop`` (enlarged-corner eigh + projected renormalization per
step, zero host syncs).  Scale normalization per step keeps everything
O(1); the free energy needs only converged RATIOS, so no log register
is required here.

Validated against Onsager's exact 2D Ising results (free energy and
the spontaneous magnetization ``(1 - sinh(2 beta)^-4)^(1/8)``).  No 2D
capability of any kind exists in the reference.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision


def _step(c, t, a, chi, prec, eigh_fn=jnp.linalg.eigh):
    """One symmetric CTMRG absorption; returns renormalized ``(c, t)``.

    ``c (chi0, chi0)``, ``t (chi0, q, chi0)``, ``a (q, q, q, q)``
    C4v-symmetric.  Output bond is ``min(chi0 * q, chi)``.
    ``eigh_fn`` lets the variational layer substitute the
    degeneracy-safe eigendecomposition for autodiff
    (:func:`contractn_tpu.ops.linalg_ad.eigh_safe`).
    """
    chi0, q = t.shape[0], t.shape[1]
    # Enlarged corner: C2[(c_out, r), (d_out, d2)]
    tmp = jnp.einsum("cua,ab->cub", t, c, precision=prec)
    tmp = jnp.einsum("cub,bld->culd", tmp, t, precision=prec)
    c2 = jnp.einsum("culd,ulxr->crdx", tmp, a, precision=prec)
    m = c2.reshape(chi0 * q, chi0 * q)
    m = 0.5 * (m + m.T)
    vals, vecs = eigh_fn(m)
    k = min(chi0 * q, chi)
    order = jnp.argsort(-jnp.abs(vals))[:k]
    lam = vals[order]
    p = vecs[:, order]  # (chi0*q, k) isometry
    scale = jnp.maximum(jnp.max(jnp.abs(lam)), 1e-300)
    c_new = jnp.diag(lam / scale)

    # Edge absorption: T2[(a_, l), d, (b, r)]
    t2 = jnp.einsum("aub,uldr->aldbr", t, a, precision=prec)
    t2 = t2.reshape(chi0 * q, q, chi0 * q)
    t_new = jnp.einsum("xi,xdy,yj->idj", p, t2, p, precision=prec)
    t_new = 0.5 * (t_new + t_new.transpose(2, 1, 0))
    t_new = t_new / jnp.maximum(jnp.max(jnp.abs(t_new)), 1e-300)
    return c_new, t_new


@partial(jax.jit, static_argnums=(3, 4))
def _converge(c, t, a, chi, iters):
    prec = dot_precision(a.dtype)

    def body(_, ct):
        return _step(ct[0], ct[1], a, chi, prec)

    return jax.lax.fori_loop(0, iters, body, (c, t))


def ctmrg_environment(a, chi, iters=200, boundary=None):
    """Converged ``(C, T)`` environment of the infinite lattice of ``a``.

    Args:
        a: C4v-symmetric site tensor ``(q, q, q, q)`` in (up, left,
            down, right) order.
        chi: environment bond dimension.
        iters: fixed-point iterations at full ``chi``.
        boundary: optional ``(C0, T0)`` seed — e.g. a symmetry-breaking
            fixed-spin boundary (:func:`ising_boundary`); default is the
            tensor's own partial traces (free boundary).
    """
    a = jnp.asarray(a)
    q = a.shape[0]
    if chi < q:
        raise ValueError(
            f"chi ({chi}) must be >= the site tensor's bond dimension "
            f"({q}) — the seed environment already has that width"
        )
    if jnp.iscomplexobj(a):
        raise TypeError(
            "the C4v CTMRG renormalizes with a SYMMETRIC-corner eigh "
            "(m + m.T), which is structurally real-only — a complex "
            "double layer's enlarged corner is Hermitian only up to a "
            "layer swap, so the projectors silently degrade.  Use the "
            "checkerboard cell machinery (models.ipeps_cell / "
            "models.ctmrg_cell / variational_ipeps_cell), whose "
            "biorthogonal SVD projectors are complex-safe."
        )
    prec = dot_precision(a.dtype)
    if boundary is None:
        c = jnp.einsum("uldr->dr", a, precision=prec)
        t = jnp.einsum("uldr->ldr", a, precision=prec)
    else:
        c, t = boundary
        c, t = jnp.asarray(c, a.dtype), jnp.asarray(t, a.dtype)
    c = c / jnp.maximum(jnp.max(jnp.abs(c)), 1e-300)
    t = t / jnp.maximum(jnp.max(jnp.abs(t)), 1e-300)

    # Growth phase: chi expands by a factor q per step (host loop, each
    # shape compiles once); then one jitted fixed-point loop.
    while c.shape[0] < chi:
        c, t = _step(c, t, a, chi, prec)
        if c.shape[0] == chi:
            break
    c, t = _converge(c, t, a, chi, int(iters))
    return c, t


def _site_weight(c, t, a, prec):
    """Ring of 4 corners + 4 edges around the center tensor:
    ``[C T C; T a T; C T C]``."""
    return jnp.einsum(
        "ab,buc,cd,dre,ef,fxg,gh,hla,ulxr->",
        c, t, c, t, c, t, c, t, a, precision=prec,
    )


def _corner_weight(c, prec):
    """``tr(C^4)``: the corners-only patch."""
    return jnp.trace(jnp.matmul(
        jnp.matmul(c, c, precision=prec),
        jnp.matmul(c, c, precision=prec), precision=prec,
    ))


def _edge_weight(c, t, prec):
    """Patch ``[C T C; C T C]``: two edges, q-legs contracted."""
    return jnp.einsum(
        "ab,buc,cd,de,euf,fa->", c, t, c, c, t, c, precision=prec
    )


def free_energy_per_site(a, chi, iters=200, boundary=None):
    """``log(partition function per site)`` via Baxter's corner ratio."""
    a = jnp.asarray(a)
    prec = dot_precision(a.dtype)
    c, t = ctmrg_environment(a, chi, iters=iters, boundary=boundary)
    w_site = _site_weight(c, t, a, prec)
    w_corner = _corner_weight(c, prec)
    w_edge = _edge_weight(c, t, prec)
    kappa = w_site * w_corner / (w_edge * w_edge)
    return float(jnp.log(jnp.abs(kappa)))


def expectation(a, impurity, chi, iters=200, boundary=None):
    """``<impurity> = w[impurity] / w[a]`` at the center of the lattice."""
    a = jnp.asarray(a)
    impurity = jnp.asarray(impurity, a.dtype)
    prec = dot_precision(a.dtype)
    c, t = ctmrg_environment(a, chi, iters=iters, boundary=boundary)
    return float(
        _site_weight(c, t, impurity, prec) / _site_weight(c, t, a, prec)
    )


# ---------------------------------------------------------------------- #
# Classical 2D Ising model tensors (the canonical benchmark)
# ---------------------------------------------------------------------- #


def ising_tensor(beta, field_op=None):
    """Partition-function site tensor of the square-lattice Ising model.

    ``a[u,l,d,r] = sum_s W[s,u] W[s,l] W[s,d] W[s,r]`` with
    ``W = V sqrt(E)`` from the bond Boltzmann matrix
    ``B = [[e^b, e^-b], [e^-b, e^b]] = W W^T``.  ``field_op`` (a length-2
    vector over spin values +1/-1, e.g. ``[1, -1]`` for the
    magnetization) turns the tensor into the matching impurity.
    """
    b = np.array([[np.exp(beta), np.exp(-beta)],
                  [np.exp(-beta), np.exp(beta)]])
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    weight = np.ones(2) if field_op is None else np.asarray(field_op)
    a = np.einsum("s,su,sl,sd,sr->uldr", weight, w, w, w, w)
    return jnp.asarray(a)


def potts_tensor(beta, q=3, field_op=None):
    """Partition-function site tensor of the q-state Potts model
    ``H = -sum_<ij> delta(s_i, s_j)`` (same W-decomposition as
    :func:`ising_tensor`, which is the ``q = 2`` case up to the spin
    relabeling).  Self-dual critical point: ``beta_c = ln(1+sqrt(q))``;
    for the continuous transitions (``q <= 4``) the internal energy
    there is exactly ``d ln z / d beta = 1 + 1/sqrt(q)``."""
    b = (np.exp(beta) - 1.0) * np.eye(q) + np.ones((q, q))
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    weight = np.ones(q) if field_op is None else np.asarray(field_op)
    a = np.einsum("s,su,sl,sd,sr->uldr", weight, w, w, w, w)
    return jnp.asarray(a)


def ising_boundary(beta):
    """Fixed-spin (+1) boundary seed ``(C0, T0)`` — breaks the Z2
    symmetry so the ordered phase converges to one pure state."""
    b = np.array([[np.exp(beta), np.exp(-beta)],
                  [np.exp(-beta), np.exp(beta)]])
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    c0 = np.einsum("u,l->ul", w[0], w[0])
    t0 = np.einsum("l,d,r->ldr", w[0], w[0], w[0])
    return jnp.asarray(c0), jnp.asarray(t0)


def ising_magnetization(beta, chi=16, iters=200):
    """``<sigma>`` of the square-lattice Ising model at inverse
    temperature ``beta`` (symmetry-broken branch; exact Onsager-Yang
    value ``(1 - sinh(2 beta)^-4)^(1/8)`` below the critical point)."""
    a = ising_tensor(beta)
    m = ising_tensor(beta, field_op=[1.0, -1.0])
    return expectation(a, m, chi, iters=iters,
                       boundary=ising_boundary(beta))
