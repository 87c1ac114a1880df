"""Fermion chains: JW-mapped MPO vs dense fermions, BdG, and DMRG.

The Kitaev-chain MPO must reproduce the EXACT many-body spectrum of the
explicitly-constructed (JW-string) fermion Hamiltonian, the BdG
single-particle formula must give the same ground energy, and DMRG on a
40-site chain (far beyond exact diagonalization) must land on the BdG
energy — fermions running verbatim on the spin machinery.
"""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu.models import MPS
from contractn_tpu.models.dmrg import dmrg
from contractn_tpu.models.fermions import (
    free_fermion_energy,
    kitaev_chain_mpo,
)


def fermion_dense(n, t, delta, mu):
    dim = 2 ** n

    def c_op(i):
        m = np.zeros((dim, dim))
        for s in range(dim):
            bits = [(s >> (n - 1 - j)) & 1 for j in range(n)]
            if bits[i] == 1:
                m[s & ~(1 << (n - 1 - i)), s] = (-1) ** sum(bits[:i])
        return m

    cs = [c_op(i) for i in range(n)]
    ham = np.zeros((dim, dim))
    for i in range(n - 1):
        ham += -t * (cs[i].T @ cs[i + 1] + cs[i + 1].T @ cs[i])
        ham += delta * (cs[i] @ cs[i + 1] + cs[i + 1].T @ cs[i].T)
    for i in range(n):
        ham += -mu * (cs[i].T @ cs[i])
    return ham


def mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    out = np.tensordot(np.asarray(mpo.left), w[0], axes=([0], [2]))
    for i in range(1, n):
        out = np.tensordot(out, w[i], axes=([-1], [2]))
    out = np.tensordot(out, np.asarray(mpo.right), axes=([-1], [0]))
    perm = list(range(0, 2 * n, 2)) + list(range(1, 2 * n, 2))
    return out.transpose(perm).reshape(2 ** n, 2 ** n)


def test_kitaev_mpo_full_spectrum_matches_fermions():
    """EVERY eigenvalue of the JW-mapped MPO equals the explicit
    fermion Hamiltonian's, for hopping-only, generic, and deep-trivial
    parameter points."""
    n = 6
    for (t, d, mu) in [(1.0, 0.0, 0.7), (1.0, 0.6, 0.4),
                       (1.0, 1.0, 2.5)]:
        sf = np.linalg.eigvalsh(fermion_dense(n, t, d, mu))
        ss = np.linalg.eigvalsh(mpo_dense(kitaev_chain_mpo(n, t, d, mu),
                                          n))
        assert np.allclose(sf, ss, atol=1e-10)
        assert np.isclose(sf[0], free_fermion_energy(n, t, d, mu),
                          atol=1e-10)


def test_dmrg_kitaev_matches_bdg_at_40_sites():
    """Beyond-ED scale: 40-site Kitaev chain in the topological phase,
    DMRG vs the exact Bogoliubov-de-Gennes ground energy."""
    n, t, d, mu = 40, 1.0, 0.6, 0.8  # |mu| < 2t: topological
    mpo = kitaev_chain_mpo(n, t, d, mu)
    # bond 20 pushes the local problem over _DENSE_EIGH_LIMIT, so this
    # also exercises the device-side Lanczos path (and is faster)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, 20,
                      dtype=jnp.float64)
    _, e, _ = dmrg(mpo, mps0, max_bond=20, sweeps=5)
    want = free_fermion_energy(n, t, d, mu)
    assert np.isclose(e, want, rtol=1e-8), (e, want)


def test_majorana_degeneracy_in_topological_phase():
    """The topological phase's Majorana pair gives a ground-state
    doublet exponentially split in n; the trivial phase is gapped."""
    n = 10
    topo = np.linalg.eigvalsh(fermion_dense(n, 1.0, 1.0, 0.0))
    triv = np.linalg.eigvalsh(fermion_dense(n, 1.0, 1.0, 4.0))
    # Kitaev point (delta=t, mu=0): exact zero-mode doublet
    assert topo[1] - topo[0] < 1e-12
    assert triv[1] - triv[0] > 0.5


def test_vumps_and_excitations_match_bdg_bulk():
    """Thermodynamic limit: VUMPS on the Kitaev MPO reproduces the BdG
    bulk-energy integral to machine precision, and the tangent-space
    quasiparticle band equals the BdG dispersion at the JW-shifted
    momentum ``omega(k) = eps_BdG(pi - k)`` (the string attaches a
    momentum-pi offset to single fermions in the spin chain's trivial
    parity sector)."""
    from scipy.integrate import quad

    from contractn_tpu.models import vumps
    from contractn_tpu.models.excitations import excitation_spectrum

    t, d, mu = 1.0, 0.4, 3.0  # trivial phase: single-particle gap
    mpo = kitaev_chain_mpo(2, t, d, mu)
    g = vumps(mpo, bond_dim=12, iters=80)

    def eps(k):
        return np.sqrt((2 * t * np.cos(k) + mu) ** 2
                       + 4 * d * d * np.sin(k) ** 2)

    e_exact = -mu / 2.0 - quad(eps, -np.pi, np.pi)[0] / (4 * np.pi)
    assert np.isclose(g["energy"], e_exact, atol=1e-10)

    for k in (0.0, 1.0, np.pi):
        om = np.asarray(excitation_spectrum(g, mpo, k))
        assert np.isclose(om[0], eps(np.pi - k), atol=1e-7), (
            k, om[0], eps(np.pi - k))
