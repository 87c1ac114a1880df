"""Charge-masked VUMPS: exact-U(1) infinite chains.

Anchors: the gapped XXZ chain at Delta = 2 against Baxter's exact
ground energy (the closed form reproduces 1/4 - ln 2 at Delta -> 1),
with structural sector conservation (exact zeros) at every probe, and
warm-started bond growth descending monotonically where cold inits on
thin-outer-class ladders provably stall (the measured failure that
shaped the allocator).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from contractn_tpu.models import block_mpo, heisenberg_mpo, xxz_mpo_u1
from contractn_tpu.models.u1 import _DEAD_VALUE
from contractn_tpu.models.u1_vumps import (
    expand_sector_state,
    u1_uniform_charges,
    u1_uniform_sector,
    vumps_u1,
)

FOLDED = (2, 0, 0, -2)  # two spin-1/2 sites, s1-major


def baxter_energy_per_cell(delta):
    """Exact XXZ ground energy (Delta > 1), Baxter/Orbach-Walker:
    e_std = Delta/4 - sinh(l) (1/2 + 2 sum_n 1/(e^{2nl} + 1)); our
    folded cell is 4 * e_std per site x 2 sites."""
    lam = np.arccosh(delta)
    s, n = 0.0, 1
    while True:  # adaptive: terms decay on the scale n ~ 1/lam
        t = 1.0 / (np.exp(2 * n * lam) + 1)
        s += t
        n += 1
        if t < 1e-18:
            break
    return 8 * (delta / 4 - np.sinh(lam) * (0.5 + 2 * s))


def test_baxter_formula_recovers_heisenberg_limit():
    # Delta -> 1+: e_std -> 1/4 - ln 2, approached as O(lam^2)
    assert abs(baxter_energy_per_cell(np.cosh(0.01)) / 8
               - (0.25 - np.log(2))) < 1e-5


def test_uniform_ladder_symmetric_and_thick():
    for bond in (16, 24, 32, 48):
        q = u1_uniform_charges(FOLDED, bond)
        live = q[q != _DEAD_VALUE]
        assert live.size == bond  # even ladders fill every slot
        vals, counts = np.unique(live, return_counts=True)
        # +- symmetric with mirrored multiplicities
        assert set(vals.tolist()) == set((-vals).tolist())
        for v, c in zip(vals, counts):
            assert counts[vals.tolist().index(-v)] == c
            assert c >= 2  # no singleton classes (VUMPS traps)


def test_vumps_u1_rejects_indefinite_mpo():
    cell = block_mpo(heisenberg_mpo(2), 2)  # SX/iY channels: no charges
    with pytest.raises(ValueError, match="definite"):
        vumps_u1(cell, 8, FOLDED, iters=1)


def test_vumps_u1_matches_baxter_with_warm_growth():
    """Cold D=24 lands ~1e-6 from the exact infinite-chain energy;
    warm-started growth to D=48 descends to ~1e-8.  Sector leak is
    EXACTLY zero on every gauge tensor at both bonds."""
    e_exact = baxter_energy_per_cell(2.0)
    cell = block_mpo(xxz_mpo_u1(2, jz=2.0), 2)

    r24 = vumps_u1(cell, 24, FOLDED, iters=100)
    assert r24["gradient_norm"] < 1e-9
    assert abs(r24["energy"] - e_exact) < 1e-5

    r48 = vumps_u1(cell, 48, FOLDED, iters=100,
                   init=expand_sector_state(r24, 48))
    assert r48["gradient_norm"] < 1e-9
    assert abs(r48["energy"] - e_exact) < 5e-7
    assert abs(r48["energy"] - e_exact) < abs(r24["energy"] - e_exact)

    for r in (r24, r48):
        mask = r["sector"]["site_mask"]
        for k in ("al", "ar", "ac"):
            assert float(jnp.abs(r[k] * (1 - mask)).max()) == 0.0
        bm = r["sector"]["bond_mask"]
        assert float(jnp.abs(r["c"] * (1 - bm)).max()) == 0.0


def test_expand_sector_state_requires_room():
    sec = u1_uniform_sector(FOLDED, 16)
    fake = {
        "sector": sec,
        "c": jnp.eye(16),
        "ac": jnp.zeros((4, 16, 16)),
        "al": jnp.zeros((4, 16, 16)),
        "ar": jnp.zeros((4, 16, 16)),
    }
    # a 3-slot ladder cannot hold the 16-slot state's charge classes
    with pytest.raises(ValueError, match="room"):
        expand_sector_state(fake, 3, charges=np.asarray([0, 0, 0]))


def test_sector_excitation_minimum_dimerized_exact_bands():
    """Charged quasiparticle bands above a masked VUMPS ground state.

    The dimerized XX chain is free-fermion exact: the folded cell's
    single-magnon band |t1 + t2 e^{i(k + pi)}| carries excitation
    charge +-2 (one flipped spin), so the dq = +-2 sector minima must
    land ON the band while the NEUTRAL sector starts at the two-
    particle continuum bottom (>= 2 * band minimum).  This pins both
    the charge-mask restriction and the projected-Lanczos fix (without
    per-iteration re-projection the gauge junk grows x3/step and the
    minima deflate to ~0.08 — far below the band)."""
    import pytest as _pytest
    from contractn_tpu.models import xx_dimerized_mpo
    from contractn_tpu.models.excitations import prepare_excitations
    from contractn_tpu.models.u1_vumps import sector_excitation_minimum

    j, delta = 1.5, 1.0 / 3.0
    t1, t2 = j * (1 + delta) / 2, j * (1 - delta) / 2
    cell = block_mpo(xx_dimerized_mpo(2, j, delta), 2)
    ground = vumps_u1(cell, 16, FOLDED, iters=200)
    assert ground["gradient_norm"] < 1e-7
    prep = prepare_excitations(ground, cell, tol=1e-10)

    def band(k):
        return abs(t1 + t2 * np.exp(1j * (k + np.pi)))

    # k = 0: charged minima on the exact band (0.5), both signs
    for dq in (2, -2):
        e, b = sector_excitation_minimum(ground, cell, dq, 0.0,
                                         prep=prep)
        assert abs(float(e) - band(0.0)) < 1e-4, dq
    # k = pi: the band top of this branch (1.5)
    e, _ = sector_excitation_minimum(ground, cell, 2, np.pi, prep=prep)
    assert abs(float(e) - band(np.pi)) < 1e-4
    # neutral sector: two-particle continuum, bottom at 2 * min(band)
    e0, _ = sector_excitation_minimum(ground, cell, 0, 0.0, prep=prep)
    assert float(e0) > 2 * band(0.0) - 1e-6
    # unreachable charge offsets fail loudly
    with _pytest.raises(ValueError, match="live tangent"):
        sector_excitation_minimum(ground, cell, 99, 0.0, prep=prep)
