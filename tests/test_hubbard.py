"""2D Hubbard (spinful fermions): spin-orbital snake-JW MPO + DMRG.

The MPO is pinned at the OPERATOR level against the spinful Fock
oracle (exact zeros — same discipline as test_fermions2d), then DMRG
ground energies against interacting dense ED (no quadratic shortcut
exists at U != 0), the U=0 limit against two decoupled copies of the
free spinless band filling, and the particle-hole symmetric point
``mu = U/2`` against unit lattice-site density.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS, dmrg_uniform
from contractn_tpu.models.fermions2d import free_fermion_energy_2d
from contractn_tpu.models import mpo_channel_charges
from contractn_tpu.models.hubbard import (
    hubbard2d_mpo,
    hubbard_dmrg_sector,
    hubbard_ed_energy,
    hubbard_fock_hamiltonian,
    hubbard_phys_charges,
    hubbard_sector_ed,
    so_index,
    spin_densities,
)

def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def test_hubbard_mpo_equals_fock_oracle():
    # dyadic parameters -> every float op is exact, so the pin is
    # literal equality (same discipline as test_fermions2d)
    for (lx, ly, t, u, mu) in [(2, 2, 1.0, 4.0, 0.75),
                               (3, 2, 1.0, 2.5, 1.25)]:
        hf = hubbard_fock_hamiltonian(lx, ly, t, u, mu)
        hm = _mpo_dense(hubbard2d_mpo(lx, ly, t, u, mu), 2 * lx * ly)
        assert np.abs(hf - hm).max() == 0.0, (lx, ly, u)


def test_hubbard_u0_is_two_free_copies():
    """U = 0 decouples the spins: ED == 2x the spinless band filling."""
    lx, ly, mu = 3, 2, 0.8
    e = hubbard_ed_energy(lx, ly, 1.0, 0.0, mu)
    e_free = free_fermion_energy_2d(lx, ly, 1.0, mu, 0.0)
    assert abs(e - 2.0 * e_free) < 1e-12


def test_hubbard_mpo_channel_definite_per_site():
    """The snake-JW Hubbard MPO carries definite PACKED (N_up, N_dn)
    channel charges with the per-site spin-orbital assignment — the
    structural precondition of the exact-sector DMRG."""
    phys, a = hubbard_phys_charges(2, 2)
    assert a == 5 and phys[0] == (5, 0) and phys[1] == (1, 0)
    c = mpo_channel_charges(hubbard2d_mpo(2, 2, 1.0, 4.0, 0.5), phys)
    assert c.shape[0] == 9  # one label row per bond


def test_hubbard_sector_dmrg_matches_sector_ed():
    """Charge-masked DMRG at fixed (N_up, N_dn): the doped (2,1) and
    half-filled (2,2) sectors of the 2x2 cluster equal sector-resolved
    ED at machine precision, with STRUCTURALLY exact conservation
    (zero leak outside the masks).  Exercises the per-site/packed
    phys-charge generalization of the U(1) machinery end to end."""
    for (nu, nd, bd) in [(2, 1, 24), (2, 2, 32)]:
        e_ed = hubbard_sector_ed(2, 2, nu, nd, 1.0, 4.0)
        mps, en, _, masks = hubbard_dmrg_sector(
            2, 2, nu, nd, bond_dim=bd, sweeps=10, lanczos_iters=30)
        assert abs(float(en) - e_ed) < 1e-10, (nu, nd, float(en), e_ed)
        assert float(jnp.abs(mps.cores * (1 - masks)).max()) == 0.0


def test_hubbard_sector_quench_matches_dense():
    """Real-time quench inside a fixed (N_up, N_dn) = (1, 1) sector:
    the U=6 ground state of the 3-site chain evolved under U=1 by BOTH
    masked TDVP integrators — overlap with dense exp(-iHt) at machine
    precision, sector leak exactly zero.  The per-site packed charges
    flow through tdvp_u1/tdvp1_u1 unchanged."""
    import scipy.linalg as sla

    from contractn_tpu.models.u1 import tdvp1_u1, tdvp_u1, u1_sector

    lx, ly, bond = 3, 1, 16
    phys, a = hubbard_phys_charges(lx, ly)
    n_orb = 2 * lx * ly
    mps0, _, _, _ = hubbard_dmrg_sector(lx, ly, 1, 1, bond_dim=bond,
                                        sweeps=8, lanczos_iters=30,
                                        t=1.0, u=6.0)
    sec = u1_sector(n_orb, a + 1, bond, phys_charges=phys)
    h2 = hubbard2d_mpo(lx, ly, 1.0, 1.0, 0.0)
    h_dense = hubbard_fock_hamiltonian(lx, ly, 1.0, 1.0, 0.0)

    def dense(m):
        cores = np.asarray(m.cores)
        acc = np.asarray(m.left)[None, :].astype(complex)
        for i in range(m.n_sites):
            acc = np.einsum("xi,dij->xdj", acc, cores[i]).reshape(
                -1, cores.shape[-1])
        v = acc @ np.asarray(m.right)
        return v / np.linalg.norm(v)

    dt, steps = 5e-3, 10
    psi_t = sla.expm(-1j * h_dense * dt * steps) @ dense(mps0)
    for evolve in (tdvp_u1, tdvp1_u1):
        m, _ = evolve(h2, mps0, sec, dt, steps)
        leak = float(jnp.max(jnp.abs(m.cores * (1 - sec["masks"]))))
        assert leak == 0.0, evolve.__name__
        ov = abs(np.vdot(dense(m), psi_t))
        assert ov > 1 - 1e-12, (evolve.__name__, ov)


def test_hubbard_dmrg_2x2_matches_ed():
    lx, ly, t, u, mu = 2, 2, 1.0, 4.0, 2.0
    e_ed = hubbard_ed_energy(lx, ly, t, u, mu)
    mpo = hubbard2d_mpo(lx, ly, t, u, mu)
    mps0 = MPS.random(jax.random.PRNGKey(0), 2 * lx * ly, 2, 16,
                      dtype=jnp.float64)
    _, e, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=30)
    assert abs(float(e) - e_ed) < 1e-8, (float(e), e_ed)


def test_hubbard_dmrg_3x2_matches_ed_and_densities():
    """3x2 at the particle-hole symmetric point: DMRG == interacting
    ED AND every lattice site holds exactly one electron (half per
    spin) — the half-filling signature."""
    lx, ly, t, u = 3, 2, 1.0, 6.0
    mu = u / 2
    e_ed = hubbard_ed_energy(lx, ly, t, u, mu)
    mpo = hubbard2d_mpo(lx, ly, t, u, mu)
    # bond 64 is load-bearing: 48 plateaus 2.2e-2 high (truncation,
    # seed-independent); 64 reaches 6e-14
    mps0 = MPS.random(jax.random.PRNGKey(1), 2 * lx * ly, 2, 64,
                      dtype=jnp.float64)
    mps, e, _ = dmrg_uniform(mpo, mps0, sweeps=16, lanczos_iters=40)
    assert abs(float(e) - e_ed) < 1e-9, (float(e), e_ed)
    up, dn = spin_densities(mps, lx, ly)
    np.testing.assert_allclose(up, 0.5, atol=1e-5)
    np.testing.assert_allclose(dn, 0.5, atol=1e-5)
    assert so_index(1, 0, 1, lx) == 2 * (2 * lx - 1) + 1  # snake turn
