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

from contractn_tpu.models import xxz_mpo_u1
from contractn_tpu.models.hubbard import (
    hubbard_chain_cell,
    lieb_wu_energy,
)
from contractn_tpu.models.u1 import _DEAD_VALUE
from contractn_tpu.models.u1_vumps_cell import (
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
