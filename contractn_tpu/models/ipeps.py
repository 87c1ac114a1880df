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
the standard ansatz for rotation-invariant phases (e.g. the 2D
transverse-field Ising model); :func:`symmetrize_c4v` projects any
tensor onto it.  Staggered phases (Neel antiferromagnets) and generic
tensors live in the companion modules: directional (Corboz) CTMRG for
arbitrary unit cells in :mod:`~contractn_tpu.models.ctmrg_cell` and the
checkerboard two-site-cell simple update in
:mod:`~contractn_tpu.models.ipeps_cell`.

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

import jax
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
        # promote, never narrow: a complex observable on a real state
        # must NOT be silently cast to real (e.g. <S_y>)
        op = jnp.asarray(op)
        dt = jnp.result_type(a_site.dtype, op.dtype)
        ket = peinsum("ts,suldr->tuldr", op.astype(dt),
                      a_site.astype(dt))
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


def tfim_bond_term_2d(j=1.0, h=1.0):
    """Square-lattice TFIM bond term: ``-J Z(x)Z - (h/4)(X(x)1 + 1(x)X)``.

    The field is split ``h/4`` per bond side because every site belongs
    to FOUR bonds on the square lattice (coordination z = 4), so
    ``H = sum_<ij> h2`` reproduces ``-J sum ZZ - h sum X`` exactly —
    unlike the 1D :func:`~contractn_tpu.models.itebd.tfim_h2` whose
    ``h/2`` split assumes z = 2.  Critical field ``h_c ~ 3.044 J``.
    """
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sz = np.array([[1.0, 0.0], [0.0, -1.0]])
    eye = np.eye(2)
    return (-j * np.kron(sz, sz)
            - 0.25 * h * (np.kron(sx, eye) + np.kron(eye, sx)))


def heisenberg_bond_term_2d(j=1.0, rotated=True):
    """Square-lattice spin-1/2 Heisenberg bond term ``J S_i . S_j``.

    ``rotated=True`` (default) applies the standard sublattice rotation
    — spins on one checkerboard sublattice turned by pi about the y axis
    (``Sx -> -Sx, Sz -> -Sz``) — which maps the staggered Neel order
    onto a TRANSLATION-INVARIANT state:

        ``S . S  ->  -Sx Sx + Sy Sy - Sz Sz``   (real matrix).

    Every bond couples one A and one B site, so the rotated term is
    uniform and swap-symmetric; the spectrum (hence the energy) is
    unitarily invariant, and in the rotated frame the staggered
    magnetization of the Neel phase appears as the UNIFORM ``<Sz>``.
    NOTE: optimize with the two-site-cell update
    (:func:`~contractn_tpu.models.ipeps_cell.simple_update_cell`) in
    either frame — the symmetrized single-site :func:`simple_update`
    stalls for this model (see its docstring).

    ``rotated=False`` returns the bare ``J S . S`` (the staggered Neel
    formulation for the checkerboard cell).
    """
    sx = np.array([[0.0, 1.0], [1.0, 0.0]]) / 2.0
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]]) / 2.0
    sz = np.array([[1.0, 0.0], [0.0, -1.0]]) / 2.0
    syy = np.real(np.kron(sy, sy))  # purely real: (+-i/2)(+-i/2) entries
    if rotated:
        h2 = j * (-np.kron(sx, sx) + syy - np.kron(sz, sz))
    else:
        h2 = j * (np.kron(sx, sx) + syy + np.kron(sz, sz))
    return h2


# --------------------------------------------------------------------- #
# Simple-update ground states
# --------------------------------------------------------------------- #

_LAM_TOL = 1e-9  # relative to max(lambda); matches itebd's guarded inverse


def _su_bond_update(gamma, lam, gate):
    """One simple-update gate application on a horizontal bond.

    ``gamma (d, D, D, D, D)`` in (phys, u, l, d, r) order, ``lam (D,)``
    the shared C4v bond weight.  Weights are absorbed on every external
    bond and the shared bond, the gate acts on the two-site block, an SVD
    truncates back to ``D``, external weights are divided back out, and
    the two updated tensors are averaged into one C4v-symmetric gamma
    (the symmetric single-site simple update; gates on the other three
    bond orientations are then redundant).
    """
    d, bond = gamma.shape[0], gamma.shape[1]
    cut = _LAM_TOL * jnp.max(lam)
    linv = jnp.where(lam > cut, 1.0 / jnp.maximum(lam, 1e-300), 0.0)

    wl = gamma * lam[None, :, None, None, None]  # up
    wl = wl * lam[None, None, :, None, None]     # left
    wl = wl * lam[None, None, None, :, None]     # down
    wl = wl * lam[None, None, None, None, :]     # right (the shared bond)
    wr = gamma * lam[None, :, None, None, None]  # up
    wr = wr * lam[None, None, None, :, None]     # down
    wr = wr * lam[None, None, None, None, :]     # right

    # theta[s1, u1, l1, d1, s2, u2, d2, r2]
    theta = peinsum("sulxm,tvmyr->sulxtvyr", wl, wr)
    theta = peinsum(
        "STst,sulxtvyr->SulxTvyr",
        gate.reshape(d, d, d, d), theta,
    )
    mat = theta.reshape(d * bond ** 3, d * bond ** 3)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    lam_new = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)

    g1 = u.reshape(d, bond, bond, bond, bond)  # (s, u, l, d, m)
    g1 = g1 * linv[None, :, None, None, None]
    g1 = g1 * linv[None, None, :, None, None]
    g1 = g1 * linv[None, None, None, :, None]
    g2 = vh.reshape(bond, d, bond, bond, bond)  # (m, s, u, d, r)
    g2 = jnp.transpose(g2, (1, 2, 0, 3, 4))     # (s, u, m, d, r)
    g2 = g2 * linv[None, :, None, None, None]
    g2 = g2 * linv[None, None, None, :, None]
    g2 = g2 * linv[None, None, None, None, :]

    # g1's new bond sits at 'right', g2's at 'left': mirror g2 and average,
    # then project the pair onto the full C4v orbit.
    g2m = jnp.transpose(g2, (0, 1, 4, 3, 2))
    gamma_new = symmetrize_c4v(0.5 * (g1 + g2m))
    nrm = jnp.sqrt(jnp.sum(jnp.abs(gamma_new) ** 2))
    return gamma_new / jnp.maximum(nrm, 1e-300), lam_new


def _su_stage(gamma, lam, gate, n_iter):
    def body(_, carry):
        g, l = carry
        return _su_bond_update(g, l, gate)

    return jax.lax.fori_loop(0, n_iter, body, (gamma, lam))


_su_stage_jit = jax.jit(_su_stage, static_argnums=(3,))


def su_absorb_weights(gamma, lam):
    """The measurable iPEPS tensor: ``sqrt(lam)`` absorbed on every bond."""
    root = jnp.sqrt(lam)
    a_site = gamma * root[None, :, None, None, None]
    a_site = a_site * root[None, None, :, None, None]
    a_site = a_site * root[None, None, None, :, None]
    return a_site * root[None, None, None, None, :]


def simple_update(h2, bond_dim, d=2,
                  schedule=((0.1, 200), (0.02, 200), (0.005, 100)),
                  dtype=jnp.float64, init=None):
    """Symmetric simple-update imaginary-time evolution on the square
    lattice: the 2D counterpart of :func:`~contractn_tpu.models.itebd.
    itebd_ground_state` (Jiang-Weng-Xiang), restricted to the C4v
    single-site cell this module's CTMRG measures.

    Each stage (fixed Trotter step) runs as ONE jitted ``fori_loop`` —
    static shapes, SVD-per-gate inside the loop, zero host syncs; the
    host only walks the ``(dt, n_iter)`` schedule.

    Suitable for rotation-invariant, weakly-entangled phases (e.g. the
    2D transverse-field Ising model).  For the Heisenberg
    antiferromagnet this symmetrized update STALLS at the product fixed
    point — the C4v rotation averaging destructively cancels the
    entanglement-growth direction (the freshly-SVD'd bond basis on one
    leg interferes with the stale bases on the other three) — even in
    the sublattice-rotated frame where the ground state itself is C4v.
    Use :func:`~contractn_tpu.models.ipeps_cell.simple_update_cell`,
    which keeps two tensors and four independent bond weights and has
    no such pathology.

    Returns:
        ``(gamma, lam)`` — pass through :func:`su_absorb_weights` and
        the expectation functions to measure.
    """
    from .itebd import two_site_gate

    if init is None:
        v = np.cos(0.3 + 0.4 * np.arange(d))
        v = v / np.linalg.norm(v)
        gamma = jnp.asarray(np.asarray(
            product_peps(v, bond_dim, dtype=dtype)
        ))
        # tiny symmetric noise so gates can grow entanglement out of the
        # rank-1 start
        rng = np.random.default_rng(0)
        noise = symmetrize_c4v(
            0.01 * rng.normal(size=gamma.shape).astype(dtype)
        )
        gamma = gamma + jnp.asarray(noise, dtype)
    else:
        gamma = jnp.asarray(init, dtype)
    # bond weights are singular values: REAL even for complex dtypes
    # (a complex lam would break the fori_loop carry when the SVD
    # returns real s)
    rdt = jnp.zeros((), dtype).real.dtype
    lam = jnp.ones((bond_dim,), rdt) / np.sqrt(bond_dim)

    h2 = jnp.asarray(h2, dtype)
    for dt, n_iter in schedule:
        gate = two_site_gate(h2, dt)
        gamma, lam = _su_stage_jit(gamma, lam, gate, int(n_iter))
    return gamma, lam


def ipeps_ground_state(h2, bond_dim, chi, d=2,
                       schedule=((0.1, 200), (0.02, 200), (0.005, 100)),
                       iters=200, dtype=jnp.float64):
    """Ground state of ``H = sum_<ij> h2`` by simple update + CTMRG.

    Returns ``(a_site, energy)``: the optimized iPEPS tensor (weights
    absorbed) and its **true variational energy per site** measured with
    :func:`ipeps_energy` — the CTMRG contraction of the returned state,
    not the simple-update bond estimate.
    """
    gamma, lam = simple_update(h2, bond_dim, d=d, schedule=schedule,
                               dtype=dtype)
    a_site = su_absorb_weights(gamma, lam)
    return a_site, ipeps_energy(a_site, h2, chi, iters=iters)


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
