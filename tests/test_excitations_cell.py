"""Native multi-site-cell excitations (models/excitations_cell.py).

Anchors: an n=1 cell reproduces the single-site tangent machinery on
the SAME ground state to machine precision (every band, every
momentum — the cell environments, phases, and regularization reduce
exactly); a uniform TFIM run on a redundant 2-site cell keeps the
folded Pfeuty band min(omega(K/2), omega(K/2 + pi)) exact; and the
dimerized XX chain — a genuinely inequivalent cell, per-site
regularization constants and all — matches the exact JW band
|t1 + t2 e^{i(K + pi)}| natively at d=2 (round 3 needed the folded
d=4 block for this), doubly degenerate (Delta Sz = +-1).
"""

import numpy as np

from contractn_tpu.models import tfim_mpo, vumps
from contractn_tpu.models.dmrg import xx_dimerized_mpo
from contractn_tpu.models.excitations import (
    excitation_spectrum,
    prepare_excitations,
)
from contractn_tpu.models.excitations_cell import (
    excitation_spectrum_cell,
    prepare_excitations_cell,
    quasiparticle_dispersion_cell,
)
from contractn_tpu.models.vumps_cell import vumps_cell


def pfeuty(k, h):
    return 2.0 * np.sqrt(h * h - 2.0 * h * np.cos(k) + 1.0)


def test_cell_n1_reduces_to_single_site_exactly():
    """The n=1 cell path IS the single-site algorithm: full-spectrum
    agreement at machine precision on the same ground state."""
    h = 1.5
    mpo = tfim_mpo(2, j=1.0, h=h)
    w = mpo.cores[0]
    gs = vumps(mpo, bond_dim=8, iters=60)
    gcell = {"als": (gs["al"],), "ars": (gs["ar"],),
             "cs": (gs["c"],), "acs": (gs["ac"],),
             "energy": gs["energy"]}
    p_cell = prepare_excitations_cell(gcell, [w])
    p_single = prepare_excitations(gs, mpo)
    for k in [0.0, 0.7]:
        om_c = np.asarray(excitation_spectrum_cell(
            gcell, [w], k, prep=p_cell))
        om_s = np.asarray(excitation_spectrum(
            gs, mpo, k, prep=p_single))
        assert np.max(np.abs(om_c - om_s)) < 1e-10, k
        assert abs(om_c[0] - pfeuty(k, h)) < 1e-7, k


def test_cell_n2_uniform_folded_pfeuty_band():
    """A uniform Hamiltonian on a redundant 2-site cell: the lowest
    band at CELL momentum K is min over the folded site momenta
    {K/2, K/2 + pi} of the exact Pfeuty dispersion — including K = 0,
    which exercises the marginal cell-transfer corner solves."""
    h = 1.5
    w = tfim_mpo(2, j=1.0, h=h).cores[0]
    g = vumps_cell([w, w], bond_dim=8, iters=60)
    assert g["gradient_norm"] < 1e-8
    prep = prepare_excitations_cell(g, [w, w])
    for big_k in [0.0, 2.2]:
        om = np.asarray(excitation_spectrum_cell(
            g, [w, w], big_k, prep=prep))
        want = min(pfeuty(big_k / 2, h), pfeuty(big_k / 2 + np.pi, h))
        assert abs(om[0] - want) < 1e-7, (big_k, om[0], want)


def test_cell_dimerized_xx_native_exact_band():
    """The genuine inequivalent cell: native d=2 dimerized XX band ==
    exact JW |t1 + t2 e^{i(K + pi)}|, Sz = +-1 degenerate.  Pins the
    PER-SITE regularization constants (the sites' Rayleigh quotients
    differ here) and the cross-block phase bookkeeping."""
    j, delta = 1.0, 0.5
    t1, t2 = j * (1 + delta) / 2, j * (1 - delta) / 2
    m = xx_dimerized_mpo(4, j=j, delta=delta)
    cores = [m.cores[0], m.cores[1]]
    ks = [0.0, 2.0]
    g, om = quasiparticle_dispersion_cell(cores, ks, bond_dim=12,
                                          n_bands=2, iters=80)
    for i, big_k in enumerate(ks):
        want = abs(t1 + t2 * np.exp(1j * (big_k + np.pi)))
        assert abs(om[i, 0] - want) < 1e-8, (big_k, om[i, 0], want)
        assert abs(om[i, 1] - want) < 1e-8  # Sz = +-1 degeneracy
