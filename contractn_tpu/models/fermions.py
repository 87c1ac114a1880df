"""Spinless fermion chains through the Jordan-Wigner mapping.

One-dimensional fermions map EXACTLY onto the framework's spin
machinery: under Jordan-Wigner, nearest-neighbor hopping and p-wave
pairing have no residual string, so

    ``H = sum_i [ -t (c^d_i c_{i+1} + h.c.)
                  + delta (c_i c_{i+1} + h.c.) - mu n_i ]``

becomes an anisotropic XY chain in a transverse field,

    ``H = sum_i [ -(t + delta)/2 X X - (t - delta)/2 Y Y ]
         - (mu/2) sum_i (1 - Z)  (+ const)``,

with ``n_i = (1 - Z_i)/2`` and real ``Y Y = -(iY)(iY)``.  ``delta = 0``
is the free tight-binding chain; ``delta != 0`` is the Kitaev chain,
whose topological phase (``|mu| < 2t``) hosts Majorana edge modes.
Every MPS algorithm in the framework (DMRG, TDVP, sampling, thermal
states) then applies verbatim to fermions.

Exactness anchor: these are quadratic Hamiltonians, so the OPEN-chain
ground energy follows from the single-particle Bogoliubov-de-Gennes
spectrum; ``free_fermion_energy`` computes it (filled negative modes /
``-(1/2) sum |eps_bdg|``) and the tests pin DMRG against it at 1e-9.
In the thermodynamic limit, VUMPS on this MPO reproduces the BdG
bulk-energy integral to machine precision, and the tangent-space
quasiparticle band equals the BdG dispersion at the Jordan-Wigner-
shifted momentum ``omega(k) = eps_BdG(pi - k)`` (the string attaches a
momentum-pi offset to single fermions in the even parity sector).

The reference has no fermionic (or any model) capability; SURVEY.md §2.
"""

import jax.numpy as jnp
import numpy as np

from .dmrg import _ID, _SX, _SY_IM, _SZ
from .mpo import MPO


def kitaev_chain_mpo(n_sites, t=1.0, delta=0.0, mu=0.0,
                     dtype=jnp.float64):
    """MPO of the open Kitaev / tight-binding chain (see module doc).

    ``delta = 0`` gives the free hopping chain; the constant
    ``-mu n/2``-shift is INCLUDED so the spectrum equals the fermion
    Hamiltonian's exactly (not just up to a constant).
    """
    jx = -(t + delta) / 2.0
    jy = -(t - delta) / 2.0
    # field term: -mu (1 - Z)/2 per site = -(mu/2) I + (mu/2) Z
    onsite = (mu / 2.0) * _SZ - (mu / 2.0) * _ID
    w = np.zeros((2, 2, 4, 4))
    w[:, :, 0, 0] = _ID
    w[:, :, 3, 3] = _ID
    w[:, :, 0, 1] = _SX
    w[:, :, 1, 3] = jx * _SX
    w[:, :, 0, 2] = _SY_IM
    w[:, :, 2, 3] = -jy * _SY_IM  # YY = -(iY)(iY)
    w[:, :, 0, 3] = onsite
    cores = jnp.asarray(np.broadcast_to(w, (n_sites, 2, 2, 4, 4)), dtype)
    left = jnp.asarray(np.array([1.0, 0.0, 0.0, 0.0]), dtype)
    right = jnp.asarray(np.array([0.0, 0.0, 0.0, 1.0]), dtype)
    return MPO(cores, left, right)


def free_fermion_energy(n_sites, t=1.0, delta=0.0, mu=0.0):
    """Exact open-chain ground energy from the BdG spectrum.

    ``H = (1/2) Psi^d H_BdG Psi + const`` with Majorana-free
    Nambu form ``H_BdG = [[A, B], [-B, -A]]``; the ground energy is
    ``-(1/2) sum_k eps_k + (1/2) tr(A)`` over the positive Bogoliubov
    modes ``eps_k`` (and ``tr(A)`` restores the normal-ordering
    constant of the ``-mu n`` convention).
    """
    a = np.zeros((n_sites, n_sites))
    b = np.zeros((n_sites, n_sites))
    for i in range(n_sites - 1):
        a[i, i + 1] = a[i + 1, i] = -t
        b[i, i + 1] = delta
        b[i + 1, i] = -delta
    np.fill_diagonal(a, -mu)
    h_bdg = np.block([[a, b], [-b, -a]])
    eps = np.linalg.eigvalsh(h_bdg)
    pos = eps[eps > 1e-14]
    # E0 = (1/2) (tr A - sum_k eps_k); zero modes contribute nothing
    return 0.5 * (np.trace(a) - np.sum(pos))
