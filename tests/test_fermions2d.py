"""2D spinless fermions: snake-JW string MPOs + DMRG vs exact results.

The string-MPO compiler and the JW sign conventions are pinned at the
OPERATOR level against a Fock-space oracle built from explicit
``c_i = (prod Z) S^-`` matrices in the same snake ordering — exact
zeros, not tolerances — then the energies against the quadratic
(free / BdG) formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS, dmrg_uniform
from contractn_tpu.models.fermions2d import (
    _SM,
    _SP,
    _Z,
    fermion2d_mpo,
    free_fermion_energy_2d,
    snake_index,
    string_mpo,
)


def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def _fock_oracle(lx, ly, t, mu, delta, periodic_x=False):
    n = lx * ly
    sm = np.array([[0.0, 0.0], [1.0, 0.0]])
    z = np.diag([1.0, -1.0])

    def op_at(mats):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, mats.get(k, np.eye(2)))
        return m

    cs = [op_at({**{j: z for j in range(i)}, i: sm}) for i in range(n)]
    h = np.zeros((2 ** n, 2 ** n))
    for r in range(ly):
        for c in range(lx):
            i = snake_index(r, c, lx)
            h += -mu * (cs[i].T @ cs[i])
            from contractn_tpu.models.fermions2d import _neighbors_2d
            for (r2, c2) in _neighbors_2d(r, c, lx, ly, periodic_x):
                j = snake_index(r2, c2, lx)
                h += -t * (cs[i].T @ cs[j] + cs[j].T @ cs[i])
                h += delta * (cs[i].T @ cs[j].T + cs[j] @ cs[i])
    return h


def test_string_mpo_exact_operators():
    m = string_mpo(3, [(2.0, [(0, _SP), (2, _SM)], _Z)])
    want = 2.0 * np.kron(np.kron(_SP, _Z), _SM)
    assert np.abs(_mpo_dense(m, 3) - want).max() == 0.0
    m2 = string_mpo(3, [(1.5, [(1, _SP), (2, _SM)], _Z)],
                    onsite=[(0, 0.3 * _Z)])
    want2 = (1.5 * np.kron(np.kron(np.eye(2), _SP), _SM)
             + 0.3 * np.kron(_Z, np.eye(4)))
    assert np.abs(_mpo_dense(m2, 3) - want2).max() == 0.0


def test_fermion2d_mpo_equals_fock_oracle():
    for (lx, ly, t, mu, delta) in [(3, 2, 1.0, 0.7, 0.0),
                                   (2, 3, 1.0, 0.5, 0.6),
                                   (3, 3, 1.0, 0.3, 0.4)]:
        hf = _fock_oracle(lx, ly, t, mu, delta)
        hm = _mpo_dense(fermion2d_mpo(lx, ly, t, mu, delta), lx * ly)
        assert np.abs(hf - hm).max() == 0.0, (lx, ly, delta)
        # and the quadratic formula equals Fock ED
        e_ed = float(np.linalg.eigvalsh(hf)[0])
        e_q = free_fermion_energy_2d(lx, ly, t, mu, delta)
        assert abs(e_ed - e_q) < 1e-12


def test_fermion2d_dmrg_free_matches_band_filling():
    """4x4 open free fermions: DMRG == sum of negative single-particle
    modes (gapped at mu = 1)."""
    lx, ly, mu = 4, 4, 1.0
    mpo = fermion2d_mpo(lx, ly, 1.0, mu, 0.0)
    e_exact = free_fermion_energy_2d(lx, ly, 1.0, mu, 0.0)
    mps0 = MPS.random(jax.random.PRNGKey(0), lx * ly, 2, 24,
                      dtype=jnp.float64)
    _, e, _ = dmrg_uniform(mpo, mps0, sweeps=6, lanczos_iters=30)
    assert abs(float(e) - e_exact) < 1e-5, (float(e), e_exact)


def test_fermion2d_dmrg_bdg_matches_bogoliubov():
    """3x3 BdG (pairing delta = 0.8): DMRG == the Bogoliubov ground
    energy."""
    lx, ly, mu, delta = 3, 3, 0.5, 0.8
    mpo = fermion2d_mpo(lx, ly, 1.0, mu, delta)
    e_exact = free_fermion_energy_2d(lx, ly, 1.0, mu, delta)
    mps0 = MPS.random(jax.random.PRNGKey(1), lx * ly, 2, 24,
                      dtype=jnp.float64)
    _, e, _ = dmrg_uniform(mpo, mps0, sweeps=8, lanczos_iters=30)
    assert abs(float(e) - e_exact) < 1e-6, (float(e), e_exact)


def test_fermion2d_cylinder_mpo_equals_fock_oracle():
    """x-periodic wrap bonds: the JW string construction stays exact
    (the wrap is just another m < n string term)."""
    for (lx, ly, t, mu, delta) in [(3, 2, 1.0, 0.7, 0.0),
                                   (3, 2, 1.0, 0.5, 0.6),
                                   (3, 3, 1.0, 0.3, 0.4)]:
        hf = _fock_oracle(lx, ly, t, mu, delta, periodic_x=True)
        hm = _mpo_dense(
            fermion2d_mpo(lx, ly, t, mu, delta, periodic_x=True),
            lx * ly)
        assert np.abs(hf - hm).max() < 1e-13, (lx, ly, delta)
        e_ed = float(np.linalg.eigvalsh(hf)[0])
        e_q = free_fermion_energy_2d(lx, ly, t, mu, delta,
                                     periodic_x=True)
        assert abs(e_ed - e_q) < 1e-12


def test_fermion2d_cylinder_dmrg_matches_band_filling():
    """4x3 CYLINDER free fermions: DMRG == negative-mode filling —
    the quasi-2D geometry DMRG is actually used for."""
    lx, ly, mu = 4, 3, 0.8
    mpo = fermion2d_mpo(lx, ly, 1.0, mu, 0.0, periodic_x=True)
    e_exact = free_fermion_energy_2d(lx, ly, 1.0, mu, 0.0,
                                     periodic_x=True)
    mps0 = MPS.random(jax.random.PRNGKey(0), lx * ly, 2, 32,
                      dtype=jnp.float64)
    _, e, _ = dmrg_uniform(mpo, mps0, sweeps=7, lanczos_iters=30)
    assert abs(float(e) - e_exact) < 1e-4, (float(e), e_exact)
