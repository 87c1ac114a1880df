"""Charge-masked cell VUMPS (models/u1_vumps_cell.py).

Anchors: the gapped XXZ chain at Delta = 2 run NATIVELY at d=2 with
alternating even/odd bond ladders — the exact cell class the
single-site masked solver's docstring excludes — against Baxter's
exact energy and the folded d=4 solver; and the half-filled Hubbard
chain NATIVELY at d=4 (per-site packed relative charges) against
Lieb-Wu, without the round-4 d=16 two-site fold.  Sector leak is
structurally zero (exact zeros) on every gauge tensor.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from contractn_tpu.models import xxz_mpo_u1
from contractn_tpu.models.dmrg import xx_dimerized_mpo
from contractn_tpu.models.excitations_cell import (
    prepare_excitations_cell,
)
from contractn_tpu.models.hubbard import (
    hubbard_chain_cell,
    lieb_wu_energy,
)
from contractn_tpu.models.u1 import _DEAD_VALUE
from contractn_tpu.models.u1_vumps_cell import (
    sector_excitation_minimum_cell,
    u1_cell_charges,
    vumps_u1_cell,
)
from test_u1_vumps import baxter_energy_per_cell


def test_cell_ladders_alternate_lattices():
    """Spin-1/2 +-1 charges: bond-0 ladder even, bond-1 ladder odd,
    both mirror-symmetric with no singleton live classes."""
    qs = u1_cell_charges([(1, -1), (1, -1)], 24)
    assert len(qs) == 2
    for i, q in enumerate(qs):
        live = q[q != _DEAD_VALUE]
        assert live.size >= 22
        assert np.all(live % 2 == i % 2)
        vals, counts = np.unique(live, return_counts=True)
        assert set(vals.tolist()) == set((-vals).tolist())
        assert counts.min() >= 2


def test_vumps_u1_cell_native_xxz_baxter():
    """Native d=2 masked cell == Baxter exact and structural zero
    leak; this cell has NO translation-invariant single ladder."""
    e_exact = baxter_energy_per_cell(2.0) / 2  # per native site
    w = xxz_mpo_u1(2, jz=2.0).cores[0]
    res = vumps_u1_cell([w, w], 24, (1, -1), iters=100)
    assert res["gradient_norm"] < 1e-8
    assert abs(res["energy"] - e_exact) < 2e-5
    for i in range(2):
        sm = res["sector"]["site_masks"][i]
        for k in ("als", "ars", "acs"):
            assert float(jnp.abs(res[k][i] * (1 - sm)).max()) == 0.0
        bm = res["sector"]["bond_masks"][i]
        assert float(jnp.abs(res["cs"][i] * (1 - bm)).max()) == 0.0


def test_vumps_u1_cell_native_hubbard_lieb_wu():
    """Half-filled Hubbard chain natively at d=4 (one lattice site per
    cell site, packed (2n_up-1)*A + (2n_dn-1) relative charges) ==
    Lieb-Wu — no d=16 fold.  The masks pin half filling structurally
    where mu = 0 cannot (grand-canonical saddle)."""
    a = 32
    q4 = (a + 1, a - 1, -a + 1, -a - 1)
    u = 4.0
    cell = hubbard_chain_cell(t=1.0, u=u)
    w = cell.cores[0]
    res = vumps_u1_cell([w, w], 16, q4, iters=50,
                        left=cell.left, right=cell.right)
    want = lieb_wu_energy(u)
    assert res["gradient_norm"] < 1e-6
    # small-D suite run: the PACKED 2-component charge lattice is
    # capacity-limited here (measured: 8.8e-2 at D=16, 1.3e-2 at
    # D=24, 2.5e-3 at D=32, 2.7e-4 at D=48 — beating the folded d=16
    # solver's 4.2e-4 at equal D; docs/ARCHITECTURE.md).  The
    # structural claims below are the point of this suite test.
    assert abs(res["energy"] - want) < 1.2e-1
    # structural leak zero + densities pinned at half filling
    for i in range(2):
        sm = res["sector"]["site_masks"][i]
        assert float(jnp.abs(res["acs"][i] * (1 - sm)).max()) == 0.0
    # the mask pins the CELL-average density exactly (the per-site
    # expectations telescope through the bond charge distributions:
    # <n>_i - 1 = E[q_{i+1}] - E[q_i], and bond 2 IS bond 0; each
    # site individually may deviate by a compensating ~1e-5)
    n4 = np.diag([2.0, 1.0, 1.0, 0.0])  # occupied-first, up-major
    nup = np.diag([1.0, 1.0, 0.0, 0.0])
    dens, dups = [], []
    for i in range(2):
        ac = np.asarray(res["acs"][i])
        nrm = np.einsum("sij,sij->", ac.conj(), ac)
        dens.append(np.einsum("sij,st,tij->", ac.conj(), n4, ac) / nrm)
        dups.append(np.einsum("sij,st,tij->", ac.conj(), nup, ac) / nrm)
    assert abs(0.5 * (dens[0] + dens[1]) - 1.0) < 1e-10
    assert abs(0.5 * (dups[0] + dups[1]) - 0.5) < 1e-10
    # per-site deviation shrinks with capacity (2.8e-3 at D=16,
    # ~1e-5 at D=24); only the cell average is structurally exact
    assert abs(dens[0] - 1.0) < 1e-2
    # native charged quasiparticle bands: electron removal/addition
    # carry packed offsets -+2a; the masked cell ansatz preserves
    # particle-hole symmetry EXACTLY at equal cell momentum (the
    # transformation shifts site momentum by pi = one full cell
    # phase), so E_add - E_rem == U structurally at any D
    prep = prepare_excitations_cell(res, [w, w], tol=1e-10)
    e_rem, _ = sector_excitation_minimum_cell(res, [w, w], -2 * a,
                                              np.pi, prep=prep,
                                              iters=40)
    e_add, _ = sector_excitation_minimum_cell(res, [w, w], +2 * a,
                                              np.pi, prep=prep,
                                              iters=40)
    assert abs((float(e_add) - float(e_rem)) - u) < 1e-6
    # mu = 0: the removal band is NEGATIVE (half filling sits above
    # the grand minimum of U n n — the regime penalties cannot hold)
    assert float(e_rem) < 0.0 < float(e_add)


J_DIM, DELTA_DIM = 1.5, 1.0 / 3.0
T1_DIM = J_DIM * (1 + DELTA_DIM) / 2
T2_DIM = J_DIM * (1 - DELTA_DIM) / 2


@pytest.fixture(scope="module")
def masked_dimer():
    """Masked native dimerized-XX cell ground (D = 16) plus its
    excitation prep, shared by the charged-band and ARPES tests."""
    from contractn_tpu.models.excitations_cell import (
        prepare_excitations_cell as prep_cell,
    )

    m = xx_dimerized_mpo(4, j=J_DIM, delta=DELTA_DIM)
    cores = [m.cores[0], m.cores[1]]
    g = vumps_u1_cell(cores, 16, (1, -1), iters=150)
    return g, cores, prep_cell(g, cores, tol=1e-10)


def test_sector_excitation_minimum_cell_dimerized_exact(masked_dimer):
    """Charged bands above the NATIVE masked cell ground (d=2, no
    folding): the dimerized XX dq = +-2 minima land on the exact JW
    band |t1 + t2 e^{i(K + pi)}| (1.9e-3 at D=16, 2e-6 at D=24 —
    referenced to the variational ground, so small undershoot is
    D-convergence, not a bound violation), the neutral sector starts
    at the two-particle continuum bottom, and unreachable charges
    fail loudly."""
    g, cores, prep = masked_dimer
    assert g["gradient_norm"] < 1e-8

    def band(big_k):
        return abs(T1_DIM + T2_DIM * np.exp(1j * (big_k + np.pi)))

    for dq in (2, -2):
        e, _ = sector_excitation_minimum_cell(g, cores, dq, 0.0,
                                              prep=prep)
        assert abs(float(e) - band(0.0)) < 5e-3, dq
    e, _ = sector_excitation_minimum_cell(g, cores, 2, np.pi,
                                          prep=prep)
    assert abs(float(e) - band(np.pi)) < 5e-3
    e0, _ = sector_excitation_minimum_cell(g, cores, 0, 0.0,
                                           prep=prep)
    assert float(e0) > 2 * band(0.0) - 5e-3
    with pytest.raises(ValueError, match="live tangent"):
        sector_excitation_minimum_cell(g, cores, 99, 0.0, prep=prep)


def test_fermionic_spectral_function_free_chain(masked_dimer):
    """Single-particle (ARPES) spectral function on the masked cell
    ground, free-fermion exact.

    The JW string telescopes on the exact-U(1) manifold
    (string_parities_cell; Z AL = P_l . AL . P_r pinned at 0.0), so
    the removal operator c(kappa) rides spectral_weights_cell
    unchanged.  Pins: (1) the removal sum rule — total weight ==
    n(kappa) from INDEPENDENT string correlators at 1e-8 and == the
    exact free-fermion momentum distribution at the state's
    convergence level; (2) the dominant pole on the exact valence
    band |t1 + t2 e^{2 i kappa}| carrying > 99.9% of the sector
    weight; (3) the string eigenvalues must be (-1)^n — the
    OPPOSITE sign convention shifts the whole spectrum by pi
    (invisible to finite string correlators, whose even-r terms
    vanish at half filling; measured before fixing)."""
    from contractn_tpu.models.excitations_cell import (
        spectral_weights_cell,
    )
    from contractn_tpu.models.u1_vumps_cell import (
        string_parities_cell,
    )
    from contractn_tpu.models.vumps_cell import (
        correlate_cell,
        expect_local_cell,
    )

    g, cores, prep = masked_dimer
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    strz = np.diag([-1.0, 1.0])  # (-1)^n, occupied = index 0
    nop = np.diag([1.0, 0.0])
    parities, cell_sign = string_parities_cell(g["sector"], (-1, 1))
    assert cell_sign == -1.0  # one fermion per cell at half filling
    # parity identity: Z AL_i == P_i . AL_i . P_{i+1}, exactly
    for i in range(2):
        al = np.asarray(g["als"][i])
        zal = np.einsum("st,tab->sab", strz, al)
        pl = np.asarray(parities[i])
        pr = np.asarray(parities[(i + 1) % 2]) * (
            cell_sign if i == 1 else 1.0)
        rhs = np.einsum("a,sab,b->sab", pl, al, pr)
        assert np.abs(zal - rhs).max() == 0.0, i

    xs = list(range(1, 50))
    cs0 = np.asarray(correlate_cell(g, sp, sm, 0, xs, string=strz))
    cs1 = np.asarray(correlate_cell(g, sp, sm, 1, xs, string=strz))
    n_avg = 0.5 * (expect_local_cell(g, nop, 0)
                   + expect_local_cell(g, nop, 1))

    def n_of(kappa):
        v = n_avg
        for r, (c0, c1) in enumerate(zip(cs0, cs1), start=1):
            v += 2 * np.real(np.exp(-1j * kappa * r)
                             * 0.5 * (c0 + c1))
        return v

    for kappa in (1.2, 2.4):
        om, wt = spectral_weights_cell(g, cores, sm, kappa,
                                       prep=prep,
                                       string_parities=parities,
                                       cell_sign=cell_sign)
        om, wt = np.asarray(om), np.asarray(wt)
        tot = float(np.sum(wt))
        assert abs(tot - n_of(kappa)) < 1e-8, kappa  # sum rule
        idx = int(np.argmax(wt))
        want = abs(T1_DIM + T2_DIM * np.exp(2j * kappa))
        assert abs(om[idx] - want) < 2e-3, (kappa, om[idx], want)
        assert wt[idx] / tot > 0.998, kappa  # clean quasiparticle
