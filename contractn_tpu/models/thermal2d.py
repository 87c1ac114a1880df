"""Thermal 2D quantum states: purification iPEPS on the checkerboard.

The 1D thermal machinery (:mod:`contractn_tpu.models.thermal`) purifies
``rho(beta) = e^{-beta H}`` as ``|Psi(beta)> = e^{-beta H / 2} |Phi>``
with ``|Phi>`` the site-local identity purification; tracing the ancilla
factor of ``<Psi|O|Psi>`` gives ``Tr(O rho)``.  This module is the 2D
analog: the fused ``(phys x ancilla)`` site (dimension ``d^2``) rides the
checkerboard simple update (:func:`ipeps_cell.simple_update_cell`)
UNCHANGED — the Trotter gates and the measured operators are lifted to
act on the physical factor only, and expectation values are measured
through the directional cell CTMRG exactly like ground states (the
ancilla trace is what the double layer's physical contraction does for
free on the fused site).

Two structural points make this quantitatively trustworthy:

* **The infinite-temperature start is exact**: the identity purification
  is a product PEPS (``vec(1)/sqrt(d)`` on every site, all bonds
  trivial), so the imaginary-time flow starts from the true
  ``beta = 0`` state, not an ansatz.
* **Commuting Hamiltonians are exact at ANY step size**: for a pure
  Ising term every bond gate has operator-Schmidt rank 2, the thermal
  PEPS has exact bond dimension 2, and the simple-update SVD cuts
  nothing — the measured ``<Z Z>`` must reproduce the CLASSICAL 2D
  Ising nearest-neighbor correlation (Onsager) to CTMRG precision.
  This is the module's machine-checkable anchor
  (``tests/test_thermal2d.py``); the non-commuting case is pinned by
  the exact high-temperature cumulant expansion
  (``E(beta) = -beta Var(H)/N + O(beta^3)`` — the third cumulant
  vanishes on the triangle-free square lattice).

Known accuracy model (same as 1D, see ``thermal.py``): the simple-update
truncation is mean-field, so away from the exactly-representable cases
observables carry an ``O(D)``-truncation bias on top of the first-order
Trotter error of the sequential bond sweep.  ``ln Z`` is NOT tracked (in
2D the simple-update norm accumulation has no controlled meaning; use
:mod:`contractn_tpu.models.hotrg` for classical partition functions).

No thermal or 2D capability exists in the reference (SURVEY.md §2).
"""

import numpy as np
import jax.numpy as jnp

from .ipeps_cell import (cell_energy, cell_site_expectations,
                         simple_update_cell, su_cell_absorb)


def lift_onsite(op, d=2):
    """``op (d, d)`` on the physical factor of the fused ``(phys, anc)``
    site: ``op (x) 1_anc`` as a ``(d^2, d^2)`` matrix."""
    return np.kron(np.asarray(op), np.eye(d))


def lift_bond(h2, d=2):
    """Two-site bond term ``h2 (d^2, d^2)`` lifted to a pair of fused
    sites: acts on ``(p1, p2)``, identity on ``(a1, a2)`` — returned as
    ``(d^4, d^4)`` with the fused ordering ``(p, a)`` per site."""
    h4 = np.asarray(h2).reshape(d, d, d, d)
    eye = np.eye(d)
    lift = np.einsum("PQpq,xy,uv->PxQupyqv", h4, eye, eye)
    return lift.reshape(d * d * d * d, d * d * d * d)


def infinite_temperature_site(bond_dim, d=2, dtype=jnp.float64):
    """The exact ``beta = 0`` fused-site tensor: ``vec(1)/sqrt(d)`` on
    the physical-ancilla pair, trivial (zero-padded) virtual bonds."""
    g = np.zeros((d * d,) + (bond_dim,) * 4)
    g[:, 0, 0, 0, 0] = np.eye(d).reshape(-1) / np.sqrt(d)
    return jnp.asarray(g, dtype)


def thermal_ipeps_cell(h2, beta, bond_dim, n_steps, d=2,
                       dtype=jnp.float64):
    """Purification iPEPS at inverse temperature ``beta``.

    Starts from the exact identity purification and flows
    ``e^{-beta H / 2}`` with ``n_steps`` first-order checkerboard
    sweeps (step ``beta / (2 n_steps)``); every bond gate is the lifted
    ``exp(-dt h2) (x) 1_anc``.

    Returns ``(a_site, b_site)`` — fused-site tensors
    ``(d^2, D, D, D, D)`` ready for the cell-CTMRG observables below.
    """
    g0 = infinite_temperature_site(bond_dim, d=d, dtype=dtype)
    dt = float(beta) / 2.0 / int(n_steps)
    ga, gb, lams = simple_update_cell(
        lift_bond(h2, d), bond_dim, d=d * d,
        schedule=((dt, int(n_steps)),), dtype=dtype, init=(g0, g0))
    return su_cell_absorb(ga, gb, lams)


def thermal2d_energy(a_site, b_site, h2, chi, d=2, iters=100):
    """``<H>/N = Tr(H rho)/Tr(rho)`` per site of the purified pair —
    :func:`ipeps_cell.cell_energy` on the lifted bond term."""
    return cell_energy(a_site, b_site, lift_bond(h2, d), chi,
                       iters=iters)


def thermal2d_site_expectation(a_site, b_site, op, chi, d=2, iters=100):
    """One-site thermal ``<op>`` at every cell position (2x2 tuple)."""
    return cell_site_expectations(a_site, b_site, lift_onsite(op, d),
                                  chi, iters=iters)
