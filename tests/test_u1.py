"""Charge-masked exact-U(1) DMRG: sector energies == sector-resolved ED.

The mask construction is STRUCTURAL (a masked MPS lies in its sector
for any tensor values), so conservation checks are exact-zero asserts,
not tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models import (
    dmrg_u1,
    heisenberg_mpo,
    mpo_channel_charges,
    tfim_mpo,
    total_sz_penalty_mpo,
    u1_bond_charges,
    u1_masks,
    xxz_mpo_u1,
)
from contractn_tpu.models.mpo import mpo_sum
from contractn_tpu.models.u1 import _DEAD_VALUE


def _dense_heisenberg(n):
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    sz = np.diag([1.0, -1.0])
    h = np.zeros((2 ** n, 2 ** n), complex)

    def op(o, i):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, o if k == i else np.eye(2))
        return m

    for i in range(n - 1):
        h += (op(sx, i) @ op(sx, i + 1) + op(sy, i) @ op(sy, i + 1)
              + op(sz, i) @ op(sz, i + 1))
    return h.real


def _sector_indices(n, q):
    szs = np.zeros(2 ** n)
    for i in range(n):
        szs += np.array([1 if (k >> (n - 1 - i)) & 1 == 0 else -1
                         for k in range(2 ** n)])
    return szs == q


def test_xxz_mpo_u1_equals_heisenberg_mpo_operator():
    """Same operator, different channel basis (S+/S- vs SX/iY)."""
    n = 5

    def dense(mpo):
        w = np.asarray(mpo.cores)
        cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
        for i in range(1, n):
            dd = cur.shape[0]
            cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
                2 * dd, 2 * dd, -1)
        return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))

    np.testing.assert_allclose(dense(xxz_mpo_u1(n)),
                               dense(heisenberg_mpo(n)), atol=1e-13)


def test_mpo_channel_charges_detects_definiteness():
    c = mpo_channel_charges(xxz_mpo_u1(4), (1, -1))
    # per-bond labels now; every interior bond of the uniform MPO
    # carries the same assignment: raising/lowering -+2 vs identity
    assert c.shape == (5, 5)
    assert (c[1:, 1] - c[1:, 0] == -2).all()
    assert (c[1:, 2] - c[1:, 0] == 2).all()
    with pytest.raises(ValueError, match="definite"):
        mpo_channel_charges(heisenberg_mpo(4), (1, -1))
    with pytest.raises(ValueError, match="definite"):
        mpo_channel_charges(tfim_mpo(4), (1, -1))


def test_dmrg_u1_matches_sector_resolved_ed():
    n = 8
    h = _dense_heisenberg(n)
    for q, bond in [(0, 20), (2, 16), (4, 16)]:
        e_ed = float(np.linalg.eigvalsh(
            h[np.ix_(_sector_indices(n, q), _sector_indices(n, q))])[0])
        mps, e, _, masks = dmrg_u1(xxz_mpo_u1(n), q, bond_dim=bond,
                                   sweeps=10)
        assert abs(float(e) - e_ed) < 1e-9, (q, float(e), e_ed)
        # structural conservation: EXACT zero outside the blocks
        assert float(jnp.max(jnp.abs(mps.cores * (1 - masks)))) == 0.0
        # the state reproduces the energy through the MPO machinery
        v, lg = xxz_mpo_u1(n).expectation(mps)
        nv, nl = mps.norm_squared()
        ray = (float(v) * np.exp(float(lg))) / (
            float(nv) * np.exp(float(nl)))
        assert abs(ray - e_ed) < 1e-8


def test_dmrg_u1_spin_gap_matches_ed():
    n = 8
    h = _dense_heisenberg(n)
    es = {}
    for q in (0, 2):
        idx = _sector_indices(n, q)
        e_ed = float(np.linalg.eigvalsh(h[np.ix_(idx, idx)])[0])
        _, e, _, _ = dmrg_u1(xxz_mpo_u1(n), q, bond_dim=20, sweeps=10)
        es[q] = (float(e), e_ed)
    gap = es[2][0] - es[0][0]
    gap_ed = es[2][1] - es[0][1]
    assert abs(gap - gap_ed) < 1e-8


def test_masked_cheaper_than_penalty():
    """The penalty route pays MPO width W_H + 3 per Heff matvec (cost
    linear in W) and conserves only energetically; the masks run at the
    plain W_H and conserve structurally."""
    n = 8
    w_masked = xxz_mpo_u1(n).cores.shape[-1]
    w_penalty = mpo_sum(heisenberg_mpo(n),
                        total_sz_penalty_mpo(n, 0)).cores.shape[-1]
    assert w_masked < w_penalty  # 5 vs 8: >= 1.6x cheaper matvecs


def test_u1_bond_charges_validation():
    with pytest.raises(ValueError, match="unreachable"):
        u1_bond_charges(4, (1, -1), 5, 8)  # odd total on even lattice
    bc = u1_bond_charges(6, (1, -1), 0, 8)
    assert bc[0][0] == 0 and bc[-1][0] == 0
    assert np.all(bc[0][1:] == _DEAD_VALUE)
    masks = u1_masks(bc, (1, -1))
    assert masks.shape == (6, 2, 8, 8)
    assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}


def test_dmrg_u1_ensemble_matches_sector_ed_per_coupling():
    """A vmapped XXZ anisotropy scan in the Sz = 1 sector: one mask
    set, one batched program, every energy == its sector-resolved ED."""
    import jax as _jax

    from contractn_tpu.models import dmrg_u1_ensemble, stack_pytrees

    n, q = 6, 2
    jzs = [0.5, 1.0, 2.0]
    mpos = stack_pytrees([xxz_mpo_u1(n, jz=jz) for jz in jzs])
    mpss, energies, traces, masks = dmrg_u1_ensemble(
        mpos, q, bond_dim=8, sweeps=8)
    idx = _sector_indices(n, q)
    for k, jz in enumerate(jzs):
        hd = _dense_xxz(n, jz)
        e_ed = float(np.linalg.eigvalsh(hd[np.ix_(idx, idx)])[0])
        assert abs(float(energies[k]) - e_ed) < 1e-9, (jz,)
        cores_k = _jax.tree_util.tree_map(lambda x: x[k], mpss).cores
        assert float(jnp.max(jnp.abs(cores_k * (1 - masks)))) == 0.0


def _dense_xxz(n, jz):
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    sz = np.diag([1.0, -1.0])
    h = np.zeros((2 ** n, 2 ** n), complex)

    def op(o, i):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, o if k == i else np.eye(2))
        return m

    for i in range(n - 1):
        h += (op(sx, i) @ op(sx, i + 1) + op(sy, i) @ op(sy, i + 1)
              + jz * op(sz, i) @ op(sz, i + 1))
    return h.real


def test_tdvp_u1_quench_matches_dense_sector_ed():
    """Real-time quench in the 2Sz=0 sector: ground state of XXZ
    (jz=1.5) evolved under XXZ (jz=0.3) by BOTH masked integrators.

    At bond 10 the charge-slot allocation covers the full sector
    Schmidt rank on every bond of the 6-site chain, so the masked TDVP
    flows are exact up to Krylov tolerance — pinned against dense
    exp(-iHt) at 1e-10, far past the 1e-8 target.  Conservation is
    STRUCTURAL: the sector leak is exactly zero at every step, not a
    tolerance.
    """
    import scipy.linalg as sla

    from contractn_tpu.models import dmrg_u1, xxz_mpo_u1
    from contractn_tpu.models.u1 import tdvp1_u1, tdvp_u1, u1_sector

    n, bond = 6, 10
    h1 = xxz_mpo_u1(n, jz=1.5)
    h2 = xxz_mpo_u1(n, jz=0.3)
    mps0, _, _, _ = dmrg_u1(h1, 0, bond)
    sec = u1_sector(n, 0, bond)

    def dense(m):
        cores = np.asarray(m.cores)
        acc = np.asarray(m.left)[None, :].astype(complex)
        for i in range(m.n_sites):
            acc = np.einsum("xi,dij->xdj", acc, cores[i])
            acc = acc.reshape(-1, cores.shape[-1])
        v = acc @ np.asarray(m.right)
        return v / np.linalg.norm(v)

    sz = np.diag([1.0, -1.0])

    def op(o, i):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, o if k == i else np.eye(2))
        return m

    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    h_dense = sum(
        np.real(op(sx, i) @ op(sx, i + 1) + op(sy, i) @ op(sy, i + 1)
                + 0.3 * op(sz, i) @ op(sz, i + 1))
        for i in range(n - 1)
    )
    dt, steps = 5e-3, 10
    psi_t = sla.expm(-1j * h_dense * dt * steps) @ dense(mps0)
    sz_tot = sum(op(sz, i) for i in range(n))

    for evolve in (tdvp_u1, tdvp1_u1):
        m, _ = evolve(h2, mps0, sec, dt, steps)
        # structural conservation: exact zero, along the whole run
        leak = float(jnp.max(jnp.abs(m.cores * (1 - sec["masks"]))))
        assert leak == 0.0, evolve.__name__
        psi = dense(m)
        assert abs(np.vdot(psi, psi_t)) > 1 - 1e-10, evolve.__name__
        for i in range(n):
            zi = np.real(np.vdot(psi, op(sz, i) @ psi))
            want = np.real(np.vdot(psi_t, op(sz, i) @ psi_t))
            assert abs(zi - want) < 1e-8, (evolve.__name__, i)
        assert abs(np.vdot(psi, sz_tot @ psi)) < 1e-12


def test_masked_tdvp_requires_aligned_hooks():
    """The masked entry points refuse to run without the structural
    hooks (a plain QR/SVD plus masking corrupts the evolution — the
    failure mode is documented in u1._aligned_ortho)."""
    from contractn_tpu.models import xxz_mpo_u1 as mk
    from contractn_tpu.models.tdvp import tdvp1_step, tdvp_step
    from contractn_tpu.models.u1 import random_masked_mps, u1_sector

    n, bond = 4, 6
    sec = u1_sector(n, 0, bond)
    mps = random_masked_mps(jax.random.PRNGKey(0), sec["masks"])
    h = mk(n)
    with pytest.raises(ValueError, match="theta_masks and splitter"):
        tdvp_step(h, mps, 0.01, masks=sec["masks"])
    with pytest.raises(ValueError, match="bond_masks and orth"):
        tdvp1_step(h, mps, 0.01, masks=sec["masks"])
