"""iPEPS on the cubic lattice: infinite 3D quantum ground states.

The 3D counterpart of :mod:`contractn_tpu.models.ipeps`: a translation-
invariant PEPS tensor ``A (d, D, D, D, D, D, D)`` (phys + six virtual
legs ``u, l, d, r, f, k`` matching :mod:`.hotrg3d`'s axis convention)
optimized by the symmetric single-site simple update (Jiang-Weng-Xiang
generalized to coordination 6), and measured by contracting the
**double-layer** norm network — a genuinely 3D tensor network with bond
``q = D^2`` — with the 3D HOTRG impurity flows of :mod:`.hotrg3d`.
That closes the loop: the classical 3D coarse-grainer doubles as the
quantum 3D environment contractor, exactly the way 2D CTMRG serves
:mod:`.ipeps`.

Scope mirrors the 2D module: the cubic-symmetric single-tensor variant
(one gamma, ONE shared bond weight, full octahedral averaging of the
virtual legs), suitable for rotation-invariant phases — the 3D
transverse-field Ising model is the flagship.  The same documented
pathology applies as in 2D: staggered phases (3D Heisenberg AFM) stall
under full symmetrization; a multi-tensor cubic cell would be the 3D
analog of :mod:`.ipeps_cell` (not implemented — the 2D module
documents the mechanism).

Validation (tests/test_ipeps3d.py) pins both limits of the 3D TFIM
``H = -sum_<ij> Z Z - h sum X`` with second-order perturbation theory
(E/site = -3 - h^2/12 for small h, -h - 3/(4h) for large h), the exact
h = 0 product limit, and the order-parameter jump across the 3D
quantum critical point (h_c ~ 5.2 at this mean-field-like D = 2).
Everything is one jitted ``fori_loop`` per Trotter stage, static
shapes throughout.  No 3D capability of any kind exists in the
reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .hotrg3d import hotrg3d_bond_expectation, hotrg3d_expectation

__all__ = [
    "symmetrize_cubic",
    "tfim_bond_term_3d",
    "simple_update_3d",
    "su3d_absorb_weights",
    "peps3d_double_layer",
    "ipeps3d_expect_local",
    "ipeps3d_expect_bond",
    "ipeps3d_energy",
    "ipeps3d_ground_state",
]

_LAM_TOL = 1e-12


def _cubic_group():
    """The 48 virtual-leg permutations of the cube's symmetry group,
    acting on legs ``(u, l, d, r, f, k)`` = axis pairs z/x/y."""
    rot = (1, 4, 3, 5, 0, 2)   # axes cycle z -> x -> y (hotrg3d._rot3)
    swap_ud = (2, 1, 0, 3, 4, 5)
    swap_lr = (0, 3, 2, 1, 4, 5)
    swap_zx = (1, 0, 3, 2, 4, 5)  # exchange the z and x axes
    perms = {(0, 1, 2, 3, 4, 5)}
    frontier = [(0, 1, 2, 3, 4, 5)]
    while frontier:
        p = frontier.pop()
        for g in (rot, swap_ud, swap_lr, swap_zx):
            q = tuple(p[i] for i in g)
            if q not in perms:
                perms.add(q)
                frontier.append(q)
    return sorted(perms)


_CUBIC_PERMS = _cubic_group()


def symmetrize_cubic(a):
    """Average a ``(d, D, D, D, D, D, D)`` tensor over the full cubic
    point group on its virtual legs (48 images)."""
    acc = 0.0
    for p in _CUBIC_PERMS:
        acc = acc + jnp.transpose(a, (0,) + tuple(i + 1 for i in p))
    return acc / len(_CUBIC_PERMS)


def tfim_bond_term_3d(j=1.0, h=1.0):
    """Bond term of the cubic-lattice TFIM with the field split across
    the SIX bonds each site touches: ``-j Z(x)Z - (h/6)(X(x)I +
    I(x)X)`` — summing over all bonds reproduces ``-j sum ZZ -
    h sum X`` (the coordination-6 analog of ``tfim_bond_term_2d``)."""
    z = np.diag([1.0, -1.0])
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    eye = np.eye(2)
    return (
        -j * np.kron(z, z)
        - (h / 6.0) * (np.kron(x, eye) + np.kron(eye, x))
    )


def _su_bond_update3(gamma, lam, gate):
    """One simple-update gate on an x-axis (r) bond, then cubic
    re-symmetrization — gates on the five other leg orientations are
    redundant by symmetry (as in the 2D C4v update)."""
    d, bond = gamma.shape[0], gamma.shape[1]
    cut = _LAM_TOL * jnp.max(lam)
    linv = jnp.where(lam > cut, 1.0 / jnp.maximum(lam, 1e-300), 0.0)

    def dress(g, axes):
        for ax in axes:
            shape = [1] * 7
            shape[ax] = bond
            g = g * lam.reshape(shape)
        return g

    # left site: weights on u, l, d, f, k and the shared r bond
    wl = dress(gamma, (1, 2, 3, 4, 5, 6))
    # right site: weights on u, d, r, f, k (l is the shared bond)
    wr = dress(gamma, (1, 3, 4, 5, 6))

    # theta[s, u1, l1, d1, f1, k1, t, u2, d2, r2, f2, k2]
    theta = peinsum("suldmfk,tvmwxyz->suldfktvwxyz", wl, wr)
    theta = peinsum(
        "STst,suldfktvwxyz->SuldfkTvwxyz",
        gate.reshape(d, d, d, d), theta,
    )
    mat = theta.reshape(d * bond ** 5, d * bond ** 5)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    lam_new = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)

    g1 = u.reshape(d, bond, bond, bond, bond, bond, bond)
    # (s, u, l, d, f, k, m) -> (s, u, l, d, m, f, k)
    g1 = jnp.transpose(g1, (0, 1, 2, 3, 6, 4, 5))

    def undress(g, axes):
        for ax in axes:
            shape = [1] * 7
            shape[ax] = bond
            g = g * linv.reshape(shape)
        return g

    g1 = undress(g1, (1, 2, 3, 5, 6))
    g2 = vh.reshape(bond, d, bond, bond, bond, bond, bond)
    # (m, s, u, d, r, f, k) -> (s, u, m, d, r, f, k)
    g2 = jnp.transpose(g2, (1, 2, 0, 3, 4, 5, 6))
    g2 = undress(g2, (1, 3, 4, 5, 6))

    # g1's fresh bond sits at 'r', g2's at 'l': mirror g2 onto g1's
    # orientation, average, project onto the cubic orbit
    g2m = jnp.transpose(g2, (0, 1, 4, 3, 2, 5, 6))
    gamma_new = symmetrize_cubic(0.5 * (g1 + g2m))
    nrm = jnp.sqrt(jnp.sum(jnp.abs(gamma_new) ** 2))
    return gamma_new / jnp.maximum(nrm, 1e-300), lam_new


def _su_stage3(gamma, lam, gate, n_iter):
    def body(_, carry):
        g, lm = carry
        return _su_bond_update3(g, lm, gate)

    return jax.lax.fori_loop(0, n_iter, body, (gamma, lam))


_su_stage3_jit = jax.jit(_su_stage3, static_argnums=(3,))


def product_peps3d(vec, bond_dim=1, dtype=None):
    """Rank-1 cubic PEPS encoding the product state ``|vec>^(x)N``."""
    vec = np.asarray(vec, dtype)
    d = vec.shape[0]
    a = np.zeros((d,) + (bond_dim,) * 6, vec.dtype if dtype is None
                 else dtype)
    a[(slice(None),) + (0,) * 6] = vec
    return a


def simple_update_3d(h2, bond_dim, d=2,
                     schedule=((0.1, 150), (0.02, 150), (0.005, 80)),
                     dtype=jnp.float64, init=None):
    """Cubic-symmetric simple-update imaginary-time evolution.

    Returns ``(gamma, lam)``; measure via :func:`su3d_absorb_weights`
    + the expectation functions.  Suitable for rotation-invariant,
    weakly-entangled 3D phases (TFIM); see the module docstring for
    the staggered-phase caveat inherited from the 2D symmetric update.
    """
    from .itebd import two_site_gate

    if init is None:
        v = np.cos(0.3 + 0.4 * np.arange(d))
        v = v / np.linalg.norm(v)
        gamma = jnp.asarray(product_peps3d(v, bond_dim, dtype=dtype))
        rng = np.random.default_rng(0)
        noise = symmetrize_cubic(jnp.asarray(
            0.01 * rng.normal(size=gamma.shape), dtype))
        gamma = gamma + noise
    else:
        gamma = jnp.asarray(init, dtype)
    rdt = jnp.zeros((), dtype).real.dtype
    lam = jnp.ones((bond_dim,), rdt) / np.sqrt(bond_dim)

    h2 = jnp.asarray(h2, dtype)
    for dt, n_iter in schedule:
        gate = two_site_gate(h2, dt)
        gamma, lam = _su_stage3_jit(gamma, lam, gate, int(n_iter))
    return gamma, lam


def su3d_absorb_weights(gamma, lam):
    """The measurable tensor: ``sqrt(lam)`` absorbed on all six legs."""
    root = jnp.sqrt(lam)
    a = gamma
    for ax in range(1, 7):
        shape = [1] * 7
        shape[ax] = lam.shape[0]
        a = a * root.reshape(shape)
    return a


def peps3d_double_layer(a_site, op=None):
    """Norm-network tensor ``sum_s A[s] (x) conj(A[s])`` with fused
    ``(ket, bra)`` bonds ``q = D^2`` — or the ``op`` impurity when
    given.  Legs ``(u, l, d, r, f, k)``, ready for :mod:`.hotrg3d`."""
    a_site = jnp.asarray(a_site)
    if op is None:
        pair = peinsum("suldrfk,sULDRFK->uUlLdDrRfFkK",
                       a_site, jnp.conj(a_site))
    else:
        op = jnp.asarray(op, a_site.dtype)
        pair = peinsum("st,tuldrfk,sULDRFK->uUlLdDrRfFkK",
                       op, a_site, jnp.conj(a_site))
    q = a_site.shape[1] ** 2
    return pair.reshape((q,) * 6)


def ipeps3d_expect_local(a_site, op, chi, steps=25):
    """``<op>`` per site from the 3D HOTRG impurity flow over the
    double layer (``chi`` is the flow bond, needs ``chi >= D^2``)."""
    a2 = peps3d_double_layer(a_site)
    imp = peps3d_double_layer(a_site, op)
    return hotrg3d_expectation(a2, imp, chi, steps=steps)


def ipeps3d_expect_bond(a_site, h2, chi, steps=25):
    """Nearest-neighbor ``<h2>`` on a bond via the pinned-pair seed
    merge (operator Schmidt split of ``h2`` over the two sites)."""
    a_site = jnp.asarray(a_site)
    d = a_site.shape[0]
    h2 = np.asarray(h2, float).reshape(d, d, d, d)
    # operator-Schmidt: h2[s1 t1, s2 t2] = sum_c oa_c (x) ob_c
    mat = np.transpose(h2, (0, 2, 1, 3)).reshape(d * d, d * d)
    uu, ss, vv = np.linalg.svd(mat)
    total = 0.0
    a2 = peps3d_double_layer(a_site)
    for c in range(len(ss)):
        if ss[c] < 1e-14:
            continue
        oa = (uu[:, c] * ss[c]).reshape(d, d)
        ob = vv[c, :].reshape(d, d)
        it = peps3d_double_layer(a_site, jnp.asarray(oa))
        ib = peps3d_double_layer(a_site, jnp.asarray(ob))
        total += hotrg3d_bond_expectation(a2, it, ib, chi, steps=steps)
    return float(total)


def ipeps3d_energy(a_site, h2, chi, steps=25):
    """Energy per site: three bonds per site on the cubic lattice."""
    return 3.0 * ipeps3d_expect_bond(a_site, h2, chi, steps=steps)


def ipeps3d_ground_state(h2, bond_dim, chi, d=2,
                         schedule=((0.1, 150), (0.02, 150), (0.005, 80)),
                         steps=25, dtype=jnp.float64):
    """Ground state of ``H = sum_<ij> h2`` on the cubic lattice by
    simple update, measured with the 3D HOTRG environment.  Returns
    ``(a_site, energy_per_site)``."""
    gamma, lam = simple_update_3d(h2, bond_dim, d=d, schedule=schedule,
                                  dtype=dtype)
    a_site = su3d_absorb_weights(gamma, lam)
    return a_site, ipeps3d_energy(a_site, h2, chi, steps=steps)
