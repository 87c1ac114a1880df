"""Two-dimensional spinless fermions on the framework's MPS machinery.

Two complementary routes (both exact-testable against quadratic
Hamiltonians):

1. **Snake Jordan-Wigner + string MPO (this module's DMRG route).**
   Order an ``Lx x Ly`` open lattice in a boustrophedon ("snake") path;
   under JW in that ordering, in-row hopping is string-free while
   vertical bonds carry a ``Z``-string across the intervening snake
   segment.  :func:`string_mpo` compiles ANY sum of such string
   operators into per-site MPO cores exactly (one virtual channel per
   term's active span — no compression, no approximation), and the
   existing finite DMRG then solves 2D fermions the way production 2D
   fermionic DMRG actually works (cylinder/strip mapping).  Validated
   against Fock-space ED (operator-level) and against the exact free /
   BdG ground energies.

2. **Parity swap gates (``models.fswap``)** for fermionic PEPS
   contraction, where the 2D network is contracted directly with
   crossing gates instead of strings.

Sign conventions (pinned by the Fock-space oracle test): with
``c_i = (prod_{j<i} Z_j) S^-_i`` and ``m < n``, the string's ``Z_m``
anticommutes past ``S^+_m``, so

    ``c^d_m c_n   = - S^+_m (prod_{m<j<n} Z_j) S^-_n``
    ``c^d_m c^d_n = - S^+_m (prod_{m<j<n} Z_j) S^+_n``

and ``n_i = (1 + Z_i) / 2`` (the FIRST basis state is the
occupied one in this convention: ``S^- |0> = |1>`` annihilates into
the second state).

The reference has no fermionic or 2D capability (SURVEY.md §2).
"""

import numpy as np
import jax.numpy as jnp

from .mpo import MPO

_SP = np.array([[0.0, 1.0], [0.0, 0.0]])   # S^+ (|0> = empty = spin up)
_SM = _SP.T
_Z = np.diag([1.0, -1.0])
_I2 = np.eye(2)


def string_mpo(n_sites, terms, onsite=None, d=2, dtype=jnp.float64):
    """Exact MPO for ``H = sum_t coeff_t O_{i1} F ... F O_{i2} + onsite``.

    Args:
        n_sites: chain length (snake-flattened lattice size).
        terms: list of ``(coeff, [(site, op), ...], fill)`` — operators
            at strictly increasing sites, ``fill`` (e.g. the JW ``Z``)
            inserted on every site strictly between the first and last.
            Single-site "terms" go in ``onsite`` instead.
        onsite: optional list of ``(site, matrix)`` one-site terms.

    Construction: the standard first-order finite-state MPO with ONE
    virtual channel per term, active over the term's span — exact for
    any term set (bond ``W = n_terms + 2``; channels are dead outside
    their span, so Heff cost in practice tracks the largest number of
    spans crossing one cut).
    """
    n_terms = len(terms)
    wdim = n_terms + 2
    last = wdim - 1
    cores = np.zeros((n_sites, d, d, wdim, wdim), dtype=np.dtype(dtype))
    for i in range(n_sites):
        cores[i, :, :, 0, 0] = np.eye(d)
        cores[i, :, :, last, last] = np.eye(d)
    if onsite:
        for site, mat in onsite:
            cores[site, :, :, 0, last] += np.asarray(mat)
    for t_idx, (coeff, ops, fill) in enumerate(terms):
        ch = 1 + t_idx
        sites = [s for s, _ in ops]
        if sorted(sites) != sites or len(set(sites)) != len(sites):
            raise ValueError(f"term {t_idx}: sites must strictly increase")
        if len(ops) < 2:
            raise ValueError(
                f"term {t_idx}: single-site terms go in `onsite`")
        first_s, last_s = sites[0], sites[-1]
        opd = dict(ops)
        for i in range(first_s, last_s + 1):
            if i == first_s:
                cores[i, :, :, 0, ch] = coeff * np.asarray(opd[i])
            elif i == last_s:
                cores[i, :, :, ch, last] = np.asarray(opd[i])
            elif i in opd:
                cores[i, :, :, ch, ch] = np.asarray(opd[i])
            else:
                cores[i, :, :, ch, ch] = np.asarray(fill)
    left = np.zeros((wdim,))
    left[0] = 1.0
    right = np.zeros((wdim,))
    right[last] = 1.0
    return MPO(jnp.asarray(cores, dtype), jnp.asarray(left, dtype),
               jnp.asarray(right, dtype))


def snake_index(r, c, lx):
    """Boustrophedon flattening: even rows left-to-right, odd reversed.

    Keeps in-row neighbors adjacent (string-free hopping) and bounds
    every vertical bond's JW string inside two rows.
    """
    return r * lx + (c if r % 2 == 0 else lx - 1 - c)


def _neighbors_2d(r, c, lx, ly, periodic_x):
    """Forward neighbor pairs of ``(r, c)`` incl. the optional x-wrap.

    The wrap bond ``(r, lx-1) - (r, 0)`` makes the lattice a CYLINDER
    (periodic around x, open along y) — the geometry 2D DMRG actually
    runs on.  ``lx >= 3`` required when periodic (lx = 2 would double
    the same bond)."""
    out = [(r, c + 1), (r + 1, c)]
    if periodic_x and c == lx - 1:
        out[0] = (r, 0)
    elif not periodic_x and c + 1 >= lx:
        out = out[1:]
    return [(r2, c2) for (r2, c2) in out if r2 < ly and c2 < lx]


def fermion2d_mpo(lx, ly, t=1.0, mu=0.0, delta=0.0, dtype=jnp.float64,
                  periodic_x=False):
    """Snake-JW MPO of 2D spinless fermions on the ``lx x ly`` lattice
    (open, or a CYLINDER with ``periodic_x=True``):

        ``H = -t sum_<ij> (c^d_i c_j + h.c.)
              + delta sum_<ij> (c^d_i c^d_j + h.c.)  - mu sum_i n_i``

    ``delta = 0`` is free tight-binding; ``delta != 0`` the 2D
    (s-wave-signed p-wave-like) BdG model — both quadratic, so
    :func:`free_fermion_energy_2d` gives the exact ground energy.
    The wrap bonds are ordinary string terms (any ``m < n`` pair rides
    the same JW construction as the multi-site vertical bonds).
    """
    if periodic_x and lx < 3:
        raise ValueError("periodic_x needs lx >= 3")
    terms = []
    onsite = []
    for r in range(ly):
        for c in range(lx):
            i = snake_index(r, c, lx)
            onsite.append((i, -mu * 0.5 * (_I2 + _Z)))
            for (r2, c2) in _neighbors_2d(r, c, lx, ly, periodic_x):
                j = snake_index(r2, c2, lx)
                m, n = (i, j) if i < j else (j, i)
                # c^d_m c_n + c^d_n c_m = -(S+ Z.. S- + S- Z.. S+)
                terms.append((t, [(m, _SP), (n, _SM)], _Z))
                terms.append((t, [(m, _SM), (n, _SP)], _Z))
                if delta != 0.0:
                    # pairing direction matters: c^d_i c^d_j with i, j
                    # in LATTICE order; reversing the pair flips sign,
                    # and the JW string contributes the global minus
                    sgn = 1.0 if m == i else -1.0
                    terms.append((-sgn * delta, [(m, _SP), (n, _SP)], _Z))
                    terms.append((-sgn * delta, [(m, _SM), (n, _SM)], _Z))
    return string_mpo(lx * ly, terms, onsite=onsite, dtype=dtype)


def free_fermion_energy_2d(lx, ly, t=1.0, mu=0.0, delta=0.0,
                           periodic_x=False):
    """Exact ground energy of :func:`fermion2d_mpo`'s Hamiltonian.

    Free case: fill the negative single-particle modes of the hopping
    matrix.  BdG case: ``E0 = -(1/2) sum_k |eps_k| - (mu N)/2`` from
    the Bogoliubov spectrum of ``[[h, D], [-D, -h]]``.
    """
    n = lx * ly
    h = np.zeros((n, n))
    dmat = np.zeros((n, n))
    for r in range(ly):
        for c in range(lx):
            i = snake_index(r, c, lx)
            h[i, i] += -mu
            for (r2, c2) in _neighbors_2d(r, c, lx, ly, periodic_x):
                j = snake_index(r2, c2, lx)
                h[i, j] += -t
                h[j, i] += -t
                dmat[i, j] += delta
                dmat[j, i] -= delta
    if delta == 0.0:
        ev = np.linalg.eigvalsh(h)
        return float(ev[ev < 0].sum())
    big = np.block([[h, dmat], [-dmat, -h]])
    ev = np.linalg.eigvals(big).real
    ev.sort()
    return float(0.5 * ev[: n].sum() + 0.5 * np.trace(h))
