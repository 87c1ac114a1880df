"""2D spin systems on open rectangles: snake MPOs at minimal bond.

Finite 2D quantum spin models ride the 1D machinery by boustrophedon
(snake) flattening: in-row neighbors stay adjacent, vertical bonds span
at most ``2 lx - 1`` chain sites with identity fill (no strings — spins
commute; contrast :mod:`~contractn_tpu.models.fermions2d`, whose
vertical bonds carry Jordan-Wigner ``Z`` fill).  The generic
:func:`~contractn_tpu.models.fermions2d.string_mpo` compiler gives one
virtual channel per term (exact, ``W = n_terms + 2``); exact-rank SVD
compression (:func:`~contractn_tpu.models.canonical.compress_mpo`)
then collapses the parallel channels to the minimal automaton — for
the snake-flattened rectangle that is ``W = k * lx + 2`` with ``k``
the number of bond-term products (one in-flight operator per column),
e.g. ``W: 26 -> 6`` on the 4x4 TFIM.  DMRG/TDVP and every other MPO
consumer then run at the compressed bond.

Validated against dense exact diagonalization (MPO matrix equality and
DMRG ground energies).  The reference has no Hamiltonian machinery of
any kind (SURVEY.md section 2).
"""

import jax.numpy as jnp
import numpy as np

from .canonical import compress_mpo
from .fermions2d import snake_index, string_mpo
from .mpo import MPO

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])
_SY_IM = np.array([[0.0, -1.0], [1.0, 0.0]])  # i * sigma_y (real)


def spin2d_mpo(lx, ly, bond_terms, field=None, d=2, compress=True,
               cutoff=1e-12, dtype=jnp.float64):
    """MPO of ``H = sum_<ij> sum_k c_k O1_k(i) O2_k(j) + sum_i field``
    on the open ``ly x lx`` rectangle (snake-flattened).

    Args:
        bond_terms: list of ``(coeff, op1, op2)`` — ``op1`` acts on the
            snake-earlier site of each nearest-neighbor pair (order only
            matters for asymmetric products).
        field: optional one-site term applied at every site.
        compress: SVD-compress the one-channel-per-term MPO to its
            minimal exact rank (the scale is folded back into the
            boundary, so the result IS the Hamiltonian).

    Returns the :class:`~contractn_tpu.models.mpo.MPO`.
    """
    n = lx * ly
    eye = np.eye(d)
    pairs = []
    for r in range(ly):
        for c in range(lx):
            i = snake_index(r, c, lx)
            if c + 1 < lx:
                pairs.append((i, snake_index(r, c + 1, lx)))
            if r + 1 < ly:
                pairs.append((i, snake_index(r + 1, c, lx)))
    terms = []
    for (i, j) in pairs:
        a, b = (i, j) if i < j else (j, i)
        for coeff, op1, op2 in bond_terms:
            oa, ob = (op1, op2) if i < j else (op2, op1)
            terms.append((coeff, [(a, np.asarray(oa)),
                                  (b, np.asarray(ob))], eye))
    onsite = ([(i, np.asarray(field)) for i in range(n)]
              if field is not None else None)
    mpo = string_mpo(n, terms, onsite=onsite, d=d, dtype=dtype)
    if not compress:
        return mpo
    comp, log_norm, err = compress_mpo(mpo, cutoff=cutoff)
    if float(err) > 1e-10:
        raise ValueError(f"exact-rank compression lost weight ({err})")
    # compress_mpo Frobenius-normalizes; restore the physical scale.
    return MPO(comp.cores, comp.left * jnp.exp(log_norm), comp.right)


def tfim2d_mpo(lx, ly, j=1.0, h=1.0, **kwargs):
    """2D transverse-field Ising ``-j sum ZZ - h sum X`` (open)."""
    return spin2d_mpo(lx, ly, [(-j, _SZ, _SZ)], field=-h * _SX, **kwargs)


def heisenberg2d_mpo(lx, ly, jx=1.0, jz=1.0, **kwargs):
    """2D XXZ ``sum (jx/4)(XX + YY) + (jz/4) ZZ`` (open; real form —
    ``YY = -(i sigma_y)(i sigma_y)``)."""
    terms = [(0.25 * jx, _SX, _SX),
             (-0.25 * jx, _SY_IM, _SY_IM),
             (0.25 * jz, _SZ, _SZ)]
    return spin2d_mpo(lx, ly, terms, **kwargs)
