"""DMRG-X vs exact diagonalization on the disordered Heisenberg chain.

The oracle diagonalizes the dense Hamiltonian, identifies the eigenstate
of maximal overlap with the product seed, and checks DMRG-X lands on
exactly that INTERIOR eigenstate — energy, full state overlap, and the
reference-free variance certificate.
"""

import numpy as np
import pytest

from contractn_tpu.models.autompo import OpSum, op_sum_mpo
from contractn_tpu.models.chemistry import determinant_mps
from contractn_tpu.models.dmrgx import dmrgx, energy_variance


def _disordered_heisenberg(n, seed):
    rng = np.random.default_rng(seed)
    fields = rng.uniform(-8, 8, n)
    ops = OpSum()
    for i in range(n - 1):
        ops.add(0.5, "S+", i, "S-", i + 1)
        ops.add(0.5, "S-", i, "S+", i + 1)
        ops.add(1.0, "Sz", i, "Sz", i + 1)
    for i in range(n):
        ops.add(fields[i], "Sz", i)
    return op_sum_mpo(ops, n)


def _dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right)).real


def _vec(mps, n):
    cores = np.asarray(mps.cores)
    v = np.asarray(mps.left)
    for i in range(n):
        v = np.einsum("...j,pjq->...pq", v, cores[i])
    v = np.einsum("...q,q->...", v, np.asarray(mps.right)).reshape(-1)
    return v / np.linalg.norm(v)


def test_dmrgx_targets_interior_eigenstate():
    n = 8
    mpo = _disordered_heisenberg(n, seed=7)
    evals, evecs = np.linalg.eigh(_dense(mpo, n))

    occ = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    seed = determinant_mps(occ, bond_dim=8)
    prod = np.zeros(2 ** n)
    prod[int("".join(map(str, occ)), 2)] = 1.0
    k = int(np.argmax(np.abs(np.dot(evecs.T, prod))))
    assert 0 < k < 2 ** n - 1  # genuinely interior — not reachable by
    # ground-state DMRG or a short orthogonality ladder

    mps, e, var = dmrgx(mpo, seed, sweeps=6, max_bond=8)
    assert abs(e - evals[k]) < 1e-9
    assert var < 1e-8  # the reference-free eigenstate certificate
    assert abs(np.dot(_vec(mps, n), evecs[:, k])) > 1.0 - 1e-9


def test_dmrgx_different_seeds_find_different_eigenstates():
    n = 6
    mpo = _disordered_heisenberg(n, seed=3)
    evals, evecs = np.linalg.eigh(_dense(mpo, n))
    energies = set()
    for occ in ([0, 1, 0, 1, 0, 1], [1, 0, 1, 0, 1, 0],
                [1, 1, 0, 0, 1, 0]):
        seedm = determinant_mps(np.asarray(occ), bond_dim=8)
        _, e, var = dmrgx(mpo, seedm, sweeps=6, max_bond=8)
        assert var < 1e-8
        # each converged energy IS an exact eigenvalue
        assert np.min(np.abs(evals - e)) < 1e-9
        energies.add(round(e, 9))
    assert len(energies) == 3  # distinct targets from distinct seeds


def test_energy_variance_is_zero_only_for_eigenstates():
    import jax
    from contractn_tpu.models.dmrg import dmrg, tfim_mpo
    from contractn_tpu.models.mps import MPS

    mpo = tfim_mpo(6, h=1.3)
    rand = MPS.random(jax.random.PRNGKey(0), 6, 2, 8, dtype=np.float64)
    assert energy_variance(mpo, rand) > 1e-2
    gs, _, _ = dmrg(mpo, rand, max_bond=12, sweeps=5)
    assert energy_variance(mpo, gs) < 1e-8
