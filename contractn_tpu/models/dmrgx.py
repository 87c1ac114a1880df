"""DMRG-X: targeting ARBITRARY eigenstates by maximum overlap.

The many-body-localization workhorse (Khemani-Pollmann-Sondhi): in an
MBL phase every eigenstate — not just the ground state — has area-law
entanglement, so each is an MPS.  Standard DMRG can't reach them (it
optimizes energy; orthogonality-penalty ladders from the bottom are
exponential in the target's index).  DMRG-X instead sweeps two-site
updates that pick the effective-Hamiltonian eigenvector with MAXIMUM
OVERLAP against the current local block: seeded with a product state
(an exact eigenstate at infinite disorder), the iteration flows to the
exact eigenstate that state adiabatically connects to.

Each local problem diagonalizes the dense two-site H_eff (the same
``(d Dl) x (d Dr)`` operator the ground solver uses below its Lanczos
crossover) — full spectra are required for the overlap choice, which
caps practical bonds at the dense-eigh scale; MBL physics lives at
small bond anyway (that's the point of the phase).

The energy-VARIANCE certificate ``<H^2> - <H>^2`` (exact MPO algebra,
:func:`~contractn_tpu.models.mpo.mpo_multiply`) measures eigenstate
quality without any reference data.  Tests pin an interior eigenstate
of the strongly disordered Heisenberg chain against exact
diagonalization: energy, overlap, and variance.

The reference has no solver of any kind (SURVEY.md section 2).
"""

import numpy as np
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .dmrg import (
    _ragged_sites,
    _rebuild_uniform,
    _split_theta,
    _update_left,
    _update_right,
)
from .mpo import mpo_multiply, rayleigh

__all__ = ["dmrgx", "energy_variance"]


def energy_variance(mpo, mps):
    """``<H^2> - <H>^2`` — the eigenstate certificate (0 iff exact)."""
    e = rayleigh(mpo, mps)
    e2 = rayleigh(mpo_multiply(mpo, mpo), mps)
    return float(e2 - e * e)


def _local_max_overlap(L, w1, w2, R, theta0):
    """Eigenpair of the dense two-site H_eff with max ``|<v|theta0>|``."""
    d = w1.shape[0]
    dl, dr = L.shape[0], R.shape[0]
    dim = d * d * dl * dr
    h = peinsum("iwp,XAwv,YBvu,kuq->XYikABpq", L, w1, w2, R)
    hmat = h.reshape(dim, dim)
    hmat = 0.5 * (hmat + jnp.conj(hmat.T))
    vals, vecs = jnp.linalg.eigh(hmat)
    ovl = jnp.abs(peinsum("dk,d->k", jnp.conj(vecs),
                          theta0.reshape(dim)))
    k = int(jnp.argmax(ovl))
    return float(vals[k]), vecs[:, k].reshape(d, d, dl, dr)


def dmrgx(mpo, mps0, sweeps=6, max_bond=None):
    """Converge ``mps0`` to the exact eigenstate it overlaps most.

    Args:
        mpo: Hermitian operator as an :class:`MPO`.
        mps0: the seed — e.g. a product state that is an eigenstate of
            the strong-disorder limit.  Its identity selects WHICH
            eigenstate the sweeps lock onto.
        sweeps: full back-and-forth passes.
        max_bond: bond cap (default: the seed's bond).  Dense local
            eigh is O((d^2 Dl Dr)^3) — keep bonds at MBL scale.

    Returns ``(mps, energy, variance)`` — the converged eigenstate,
    its energy, and the ``<H^2> - <H>^2`` certificate.
    """
    n = mps0.n_sites
    if n < 2:
        raise ValueError("dmrgx needs at least 2 sites")
    max_bond = max_bond or mps0.bond_dim
    sites = _ragged_sites(mps0)
    ws = [mpo.cores[i] for i in range(n)]
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
    R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    energy = np.inf
    for _ in range(sweeps):
        for i in range(n - 1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            energy, theta = _local_max_overlap(
                L[i], ws[i], ws[i + 1], R[i + 2], theta0)
            t1, t2 = _split_theta(theta, max_bond, to_left=True)
            sites[i], sites[i + 1] = t1, t2
            L[i + 1] = _update_left(L[i], sites[i], ws[i])
        for i in range(n - 2, -1, -1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            energy, theta = _local_max_overlap(
                L[i], ws[i], ws[i + 1], R[i + 2], theta0)
            t1, t2 = _split_theta(theta, max_bond, to_left=False)
            sites[i], sites[i + 1] = t1, t2
            R[i + 1] = _update_right(R[i + 2], sites[i + 1], ws[i + 1])

    # rebuild in the SITES' dtype: a complex MPO (e.g. Sy channels)
    # makes the local eigenvectors complex even from a real seed, and
    # casting back to the seed's dtype would silently discard the
    # imaginary parts (observed: variance 0.63 on a converged state)
    out = _rebuild_uniform(sites, np.asarray(sites[0]).dtype)
    return out, float(energy), energy_variance(mpo, out)
