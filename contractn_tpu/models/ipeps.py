"""iPEPS expectation values via CTMRG environments.

Extends :mod:`contractn_tpu.models.ctmrg` from classical partition
functions to infinite 2D *quantum* states: an iPEPS is a translation-
invariant PEPS tensor ``A (d, D, D, D, D)`` (phys, up, left, down,
right), its norm network is the **double-layer** tensor
``a = sum_s A[s] (x) conj(A[s])`` with fused bra+ket bonds ``q = D**2``,
and local / nearest-neighbor observables come from inserting operator
impurities between the layers inside the converged ``(C, T)``
environment.

Scope: the single-site C4v-symmetric variant, matching the symmetric
CTMRG this framework ships (``ctmrg.py``; Nishino-Okunishi).  That is
the standard ansatz for rotation-invariant phases (transverse-field
Ising, Heisenberg on the square lattice); :func:`symmetrize_c4v`
projects any tensor onto it.  Directional (Corboz) CTMRG for generic
unit cells is the natural extension and deliberately out of scope here.

Everything is pure-JAX with static shapes: environments converge in one
jitted ``fori_loop`` (see ``ctmrg._converge``), expectation patches are
single einsums, and the functions are differentiable for fixed
iteration counts (note: gradients flow through ``eigh`` — degenerate
corner spectra need care, as in all CTMRG autodiff literature).

Cross-validation strategy (see ``tests/test_ipeps.py``): the
square-root-Boltzmann PEPS maps ``<psi|psi>`` exactly onto the classical
Ising partition function, so iPEPS magnetization/free energy must equal
the classical CTMRG values and Onsager's exact results — two
independent code paths meeting on one number.

The reference has no 2D capability of any kind (SURVEY.md §2).
"""

import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision, peinsum
from .ctmrg import _site_weight, ctmrg_environment


def symmetrize_c4v(a_site):
    """Project a PEPS tensor onto the C4v-symmetric subspace.

    Averages over the 8 dihedral-group images (4 rotations x optional
    reflection) of the virtual legs ``(u, l, d, r)``.  Symmetric CTMRG
    requires the double layer of its input to be C4v-invariant.
    """
    a_site = jnp.asarray(a_site)
    # Leg order (phys, u, l, d, r); rotation by 90deg: u<-l<-d<-r<-u
    rot = (0, 2, 3, 4, 1)
    refl = (0, 1, 4, 3, 2)  # mirror: swap left/right
    images = []
    cur = a_site
    for _ in range(4):
        images.append(cur)
        images.append(jnp.transpose(cur, refl))
        cur = jnp.transpose(cur, rot)
    return sum(images) / len(images)


def peps_double_layer(a_site, op=None):
    """Closed double-layer tensor ``(q, q, q, q)`` with ``q = D**2``.

    ``a[(u u'), (l l'), (d d'), (r r')] = sum_{s s'} conj(A[s']) O[s', s]
    A[s]`` — the norm-network site tensor (``op=None`` means ``O = id``),
    or the impurity for a one-site observable ``O (d, d)``.
    """
    a_site = jnp.asarray(a_site)
    d, bond = a_site.shape[0], a_site.shape[1]
    bra = jnp.conj(a_site)
    if op is None:
        ket = a_site
    else:
        ket = peinsum("ts,suldr->tuldr", jnp.asarray(op, a_site.dtype),
                      a_site)
    dbl = peinsum("suldr,sULDR->uUlLdDrR", ket, bra)
    q = bond * bond
    return dbl.reshape(q, q, q, q)


def peps_double_layer_open(a_site):
    """Open double-layer tensor ``(d, d, q, q, q, q)``: (ket, bra) physical
    indices left uncontracted, for multi-site operator insertions."""
    a_site = jnp.asarray(a_site)
    bond = a_site.shape[1]
    dbl = peinsum("suldr,SULDR->sSuUlLdDrR", a_site, jnp.conj(a_site))
    q = bond * bond
    d = a_site.shape[0]
    return dbl.reshape(d, d, q, q, q, q)


def _pair_weight(c, t, a1, a2, prec):
    """Weight of a horizontal 1x2 patch inside the environment ring:
    ``[C T T C; T a1 a2 T; C T T C]`` (same edge/corner conventions as
    ``ctmrg._site_weight``)."""
    return jnp.einsum(
        "ab,buc,cvd,de,erf,fg,gyh,hxi,ij,jla,ulxm,vmyr->",
        c, t, t, c, t, c, t, t, c, t, a1, a2, precision=prec,
    )


def _pair_weight_op(c, t, ao1, ao2, op4, prec):
    """Same patch with OPEN pair tensors ``(d, d, q, q, q, q)`` contracted
    against a two-site operator ``op4[s1', s2', s1, s2]`` (bra first)."""
    return jnp.einsum(
        "ab,buc,cvd,de,erf,fg,gyh,hxi,ij,jla,pPulxm,qQvmyr,PQpq->",
        c, t, t, c, t, c, t, t, c, t, ao1, ao2, op4, precision=prec,
    )


def ipeps_expect_local(a_site, op, chi, iters=200, boundary=None):
    """``<psi| O_i |psi> / <psi|psi>`` for a one-site observable.

    Args:
        a_site: iPEPS tensor ``(d, D, D, D, D)``; its double layer must
            be C4v-symmetric (use :func:`symmetrize_c4v`).
        op: ``(d, d)`` observable.
        chi: environment bond dimension (``>= D**2``).
        boundary: optional ``(C0, T0)`` seed in double-layer bonds (e.g.
            a symmetry-breaking product boundary for ordered phases).
    """
    a_norm = peps_double_layer(a_site)
    a_imp = peps_double_layer(a_site, op)
    prec = dot_precision(a_norm.dtype)
    c, t = ctmrg_environment(a_norm, chi, iters=iters, boundary=boundary)
    num = _site_weight(c, t, a_imp, prec)
    den = _site_weight(c, t, a_norm, prec)
    return num / den


def ipeps_expect_bond(a_site, h2, chi, iters=200, boundary=None):
    """``<psi| h_{i,i+x} |psi> / <psi|psi>`` for a nearest-neighbor term.

    ``h2`` is the dense two-site operator, ``(d^2, d^2)`` (same
    convention as ``mpo_from_bond_term`` / the TEBD gates) or already
    reshaped ``(d, d, d, d)`` as ``[s1', s2', s1, s2]``.
    """
    a_site = jnp.asarray(a_site)
    d = a_site.shape[0]
    h2 = jnp.asarray(h2, a_site.dtype)
    op4 = h2.reshape(d, d, d, d)
    a_norm = peps_double_layer(a_site)
    ao = peps_double_layer_open(a_site)
    prec = dot_precision(a_norm.dtype)
    c, t = ctmrg_environment(a_norm, chi, iters=iters, boundary=boundary)
    num = _pair_weight_op(c, t, ao, ao, op4, prec)
    den = _pair_weight(c, t, a_norm, a_norm, prec)
    return num / den


def ipeps_energy(a_site, h2, chi, iters=200, boundary=None):
    """Energy per site of ``H = sum_<ij> h2`` on the square lattice.

    For a C4v-symmetric state the horizontal and vertical bond energies
    are equal, and each site owns two bonds: ``E = 2 <h2>_bond``.
    """
    return 2.0 * ipeps_expect_bond(a_site, h2, chi, iters=iters,
                                   boundary=boundary)


def product_peps(vec, bond_dim=1, dtype=None):
    """The product state ``|v>^(x) N`` as a (trivially C4v) iPEPS.

    ``bond_dim > 1`` zero-pads the virtual bonds — useful as a seed for
    variational optimization.
    """
    vec = np.asarray(vec)
    dtype = dtype or vec.dtype
    d = vec.shape[0]
    a_site = np.zeros((d,) + (bond_dim,) * 4, dtype)
    a_site[(slice(None),) + (0,) * 4] = vec
    return jnp.asarray(a_site)
