"""Infinite half-filled Hubbard chain: masked VUMPS vs Lieb-Wu.

The uniform d=4 folded-site cell is pinned at the operator level
against the spinful Fock oracle (exact zeros), the Lieb-Wu integral
against its two closed anchors (U -> 0 free value -4/pi; the classic
-0.573729 at U = 4), and the charge-masked VUMPS ground energy against
the exact Bethe-ansatz value with BOTH spin populations conserved
structurally (packed relative charges; leak exactly zero).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from contractn_tpu.models.hubbard import (
    hubbard_chain_cell,
    hubbard_charge_gap,
    hubbard_fock_hamiltonian,
    hubbard_vumps,
    lieb_wu_energy,
)


@pytest.fixture(scope="module")
def ground8():
    """U = 8 infinite-chain ground at D = 32 (warm-grown 16 -> 32),
    shared by the energy and charge-gap tests."""
    return hubbard_vumps(8.0, bond_dims=(16, 32), iters=100)


def _dense_from_cell(cell, n):
    w = np.asarray(cell.cores[0])
    cur = np.einsum("w,abwv->abv", np.asarray(cell.left), w)
    for _ in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w).reshape(
            4 * dd, 4 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(cell.right))


def test_hubbard_chain_cell_matches_fock_oracle():
    """The folded-site uniform cell (JW string absorbed locally via
    S+Z = -S+) equals the snake-JW Hamiltonian exactly."""
    for (n, t, u, mu) in [(2, 1.0, 4.0, 0.75), (3, 1.0, 2.5, 1.25)]:
        hc = _dense_from_cell(hubbard_chain_cell(t, u, mu), n)
        hf = hubbard_fock_hamiltonian(n, 1, t, u, mu)
        assert np.abs(hc - hf).max() == 0.0, (n, u)


def test_lieb_wu_anchors():
    # U -> 0: two free half-filled bands, -4/pi (truncation-limited
    # without the exponential cut, hence the loose tolerance)
    assert abs(lieb_wu_energy(1e-12) + 4 / np.pi) < 5e-4
    # the classic benchmark value at U = 4
    assert abs(lieb_wu_energy(4.0) + 0.573729) < 1e-5
    # large U: kinetic exchange shrinks as 1/U
    assert -0.2 < lieb_wu_energy(20.0) < -0.1


def test_hubbard_vumps_matches_lieb_wu(ground8):
    """U = 8 infinite chain at D = 32 (warm-grown): energy per site
    within 2e-3 of the exact Bethe-ansatz value, sector leak exactly
    zero.  Note the sector is held STRUCTURALLY: at mu = 0 the
    half-filled state is not the grand-canonical minimum (removing
    electrons lowers U n n), so this is precisely the regime where
    penalty/chemical-potential methods struggle."""
    e_lw = lieb_wu_energy(8.0)
    r = ground8
    assert r["gradient_norm"] < 1e-8
    assert abs(r["energy_per_site"] - e_lw) < 2e-3
    mask = r["sector"]["site_mask"]
    for k in ("al", "ar", "ac"):
        assert float(jnp.abs(r[k] * (1 - mask)).max()) == 0.0


def test_hubbard_mott_gap_from_charged_bands(ground8):
    """The Mott charge gap from EXACT-charge quasiparticle bands.

    Electron removal/addition carry packed charge offsets -+2a (one up
    electron changes the site's relative charge `2 n_up - 1` by -+2,
    packed with a = 32); the tangent-space sector minima approximate
    the Lieb-Wu single-particle band edges FROM ABOVE (variational),
    the ansatz preserves particle-hole symmetry exactly (`E_add -
    E_rem == U` pointwise), and their sum is the charge gap: measured
    +1.4% above the exact `hubbard_charge_gap` integral at D = 32.
    The penalty route cannot produce these bands at all — the mu = 0
    removal band is NEGATIVE (the half-filled sector sits above the
    grand minimum of `U n n`)."""
    from contractn_tpu.models.excitations import prepare_excitations
    from contractn_tpu.models.mpo import MPO, block_mpo
    from contractn_tpu.models.u1_vumps import sector_excitation_minimum

    u = 8.0
    cell4 = hubbard_chain_cell(t=1.0, u=u, mu=0.0)
    rep = jnp.broadcast_to(cell4.cores[0],
                           (2,) + tuple(cell4.cores.shape[1:]))
    cell16 = block_mpo(MPO(rep, cell4.left, cell4.right), 2)
    prep = prepare_excitations(ground8, cell16, tol=1e-10)

    gap = hubbard_charge_gap(u)
    rem_bottom = (gap - u) / 2     # mu = 0 convention: negative
    add_bottom = (gap + u) / 2
    e_rem, _ = sector_excitation_minimum(ground8, cell16, -64, np.pi,
                                         prep=prep)
    e_add, _ = sector_excitation_minimum(ground8, cell16, +64, np.pi,
                                         prep=prep)
    # variationally above each exact band edge, within a few percent
    assert rem_bottom - 1e-6 < float(e_rem) < rem_bottom + 0.06
    assert add_bottom - 1e-6 < float(e_add) < add_bottom + 0.06
    # exact particle-hole symmetry of the masked ansatz
    assert abs((float(e_add) - float(e_rem)) - u) < 1e-3
    # the gap itself: E(N+1) + E(N-1) - 2 E(N)
    est = float(e_add) + float(e_rem)
    assert gap - 1e-6 < est < gap + 0.12
