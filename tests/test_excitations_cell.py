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
import pytest

from contractn_tpu.models import tfim_mpo, vumps
from contractn_tpu.models.dmrg import xx_dimerized_mpo
from contractn_tpu.models.excitations import (
    excitation_spectrum,
    prepare_excitations,
    spectral_weights,
)
from contractn_tpu.models.excitations_cell import (
    excitation_spectrum_cell,
    prepare_excitations_cell,
    quasiparticle_dispersion_cell,
    spectral_weights_cell,
)
from contractn_tpu.models.vumps_cell import (
    static_structure_factor_cell,
    vumps_cell,
)

J_DIM, DELTA_DIM = 1.0, 0.5
T1 = J_DIM * (1 + DELTA_DIM) / 2
T2 = J_DIM * (1 - DELTA_DIM) / 2


@pytest.fixture(scope="module")
def dimer_ground():
    """Converged native dimerized-XX cell ground at D = 12, shared by
    the dispersion and spectral-weight tests."""
    m = xx_dimerized_mpo(4, j=J_DIM, delta=DELTA_DIM)
    cores = [m.cores[0], m.cores[1]]
    g = vumps_cell(cores, bond_dim=12, iters=80)
    return g, cores


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


def test_cell_dimerized_xx_native_exact_band(dimer_ground):
    """The genuine inequivalent cell: native d=2 dimerized XX band ==
    exact JW |t1 + t2 e^{i(K + pi)}|, Sz = +-1 degenerate.  Pins the
    PER-SITE regularization constants (the sites' Rayleigh quotients
    differ here) and the cross-block phase bookkeeping."""
    g, cores = dimer_ground
    ks = [0.0, 2.0]
    _, om = quasiparticle_dispersion_cell(cores, ks, ground=g,
                                          n_bands=2)
    for i, big_k in enumerate(ks):
        want = abs(T1 + T2 * np.exp(1j * (big_k + np.pi)))
        assert abs(om[i, 0] - want) < 1e-8, (big_k, om[i, 0], want)
        assert abs(om[i, 1] - want) < 1e-8  # Sz = +-1 degeneracy


def test_spectral_weights_cell_n1_reduction_and_sum_rule():
    """spectral_weights_cell == the single-site spectral_weights at
    n = 1 (same ground: energies and weights at 1e-12), and the total
    weight saturates the independently-computed static structure
    factor on a 2-site cell (sum rule, 1e-6)."""
    h = 1.5
    mpo = tfim_mpo(2, j=1.0, h=h)
    w = mpo.cores[0]
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    gs = vumps(mpo, bond_dim=8, iters=60)
    g1 = {"als": (gs["al"],), "ars": (gs["ar"],), "cs": (gs["c"],),
          "acs": (gs["ac"],), "energy": gs["energy"]}
    om_c, wt_c = spectral_weights_cell(g1, [w], sx, 0.4)
    om_s, wt_s = spectral_weights(gs, mpo, sx, 0.4)
    assert np.max(np.abs(np.asarray(om_c) - np.asarray(om_s))) < 1e-10
    assert np.max(np.abs(np.asarray(wt_c) - np.asarray(wt_s))) < 1e-12

    g2 = vumps_cell([w, w], bond_dim=8, iters=60)
    prep = prepare_excitations_cell(g2, [w, w])
    for kappa in (0.4, 1.7):
        _, wt = spectral_weights_cell(g2, [w, w], sx, kappa,
                                      prep=prep)
        s_exact = static_structure_factor_cell(g2, sx, kappa,
                                               max_distance=50)
        assert abs(float(np.sum(np.asarray(wt))) - s_exact) < 1e-6

    # broadened map: the omega integral recovers S(kappa)
    from contractn_tpu.models.excitations_cell import (
        dynamic_structure_factor_cell,
    )

    omegas = np.linspace(-40.0, 60.0, 4001)
    smap = dynamic_structure_factor_cell(g1, [w], sx, [0.4], omegas,
                                         eta=0.2)
    integral = np.trapezoid(smap[0], omegas)
    s_tot = float(np.sum(np.asarray(wt_c)))
    assert abs(integral - s_tot) < 2e-2 * max(s_tot, 1.0)


def test_spectral_weights_cell_native_unfolding(dimer_ground):
    """Native extended-zone unfolding: on the dimerized XX cell, the
    dominant pole of S+ at per-site momenta kappa and kappa + pi sits
    at the SAME energy |t1 + t2 e^{i(2 kappa + pi)}| (one cell-sector
    eigenstate) while the weights differ (sublattice interference) —
    the content of `unfolded_bands`, without the d^4 fold it needs."""
    g, cores = dimer_ground
    prep = prepare_excitations_cell(g, cores)
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    kappa = 0.7
    res = []
    for kk in (kappa, kappa + np.pi):
        om, wt = spectral_weights_cell(g, cores, sp, kk, prep=prep)
        om, wt = np.asarray(om), np.asarray(wt)
        idx = int(np.argmax(wt))
        res.append((float(om[idx]),
                    float(wt[idx]) / float(np.sum(wt))))
    want = abs(T1 + T2 * np.exp(1j * (2 * kappa + np.pi)))
    for om_dom, share in res:
        assert abs(om_dom - want) < 1e-6, (om_dom, want)
        assert share > 0.8, share  # clean quasiparticle pole
    assert abs(res[0][0] - res[1][0]) < 1e-9     # same eigenstate
    assert abs(res[0][1] - res[1][1]) > 0.02     # different weight


def test_excitation_minimum_cell_matches_dense(dimer_ground):
    """The projected-Lanczos lowest band == the dense H_eff bottom
    (same momentum, same ground) — the scalable path for bond
    dimensions where the dense build is prohibitive."""
    from contractn_tpu.models.excitations_cell import (
        excitation_minimum_cell,
    )

    g, cores = dimer_ground
    prep = prepare_excitations_cell(g, cores)
    for big_k in (0.0, 2.0):
        want = abs(T1 + T2 * np.exp(1j * (big_k + np.pi)))
        e, bs = excitation_minimum_cell(g, cores, big_k, prep=prep)
        assert abs(float(e) - want) < 1e-7, (big_k, float(e), want)
        assert len(bs) == 2
        # returned tensors are gauge-fixed: sum_s AL^H B == 0
        for i in range(2):
            al = np.asarray(g["als"][i]).astype(complex)
            b = np.asarray(bs[i])
            ov = np.einsum("sji,sjk->ik", al.conj(), b)
            assert np.abs(ov).max() < 1e-10, i
