"""Binary tree tensor networks vs dense oracles.

The structural tests run on RANDOM NON-ISOMETRIC trees so they pin the
block-flow machinery itself (energy == dense Rayleigh quotient of the
reconstructed vector at machine precision), independent of any
optimization; the ground-state tests pin the variational quality
against dense ED.  The reference has no tree algorithms (SURVEY.md
section 2: contractn/ is a contraction engine only).
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import heisenberg_mpo, tfim_mpo
from contractn_tpu.models.ttn import (
    product_mpo,
    random_ttn,
    ttn_energy,
    ttn_expectation,
    ttn_ground_state,
    ttn_to_dense,
)

from test_lindblad import X, Z, _site_op


def _dense_tfim(n, h):
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd -= _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    for i in range(n):
        hd -= h * _site_op(X, i, n)
    return hd


def test_block_flow_matches_dense_rayleigh():
    # random NON-isometric tree: the MPO block flow must equal the
    # dense Rayleigh quotient of the reconstructed state exactly.
    n, h = 8, 1.05
    h_mpo = tfim_mpo(n, h=h)
    hd = _dense_tfim(n, h)
    params = random_ttn(jax.random.PRNGKey(1), n, 2, 6)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jax.random.normal(
            jax.random.PRNGKey(7), a.shape, a.dtype), params)
    v = np.asarray(ttn_to_dense(params))
    e_flow = float(ttn_energy(params, h_mpo))
    e_dense = float(np.real(v.conj() @ hd @ v / (v.conj() @ v)))
    assert abs(e_flow - e_dense) < 1e-12

    zmpo = product_mpo(n, [(3, Z)], dtype=jnp.float64)
    o_flow = complex(ttn_expectation(params, zmpo))
    o_dense = complex(v.conj() @ _site_op(Z, 3, n) @ v / (v.conj() @ v))
    assert abs(o_flow - o_dense) < 1e-12

    zz = product_mpo(n, [(1, Z), (6, Z)], dtype=jnp.float64)
    o2_flow = complex(ttn_expectation(params, zz))
    o2_dense = complex(
        v.conj() @ (_site_op(Z, 1, n) @ _site_op(Z, 6, n)) @ v
        / (v.conj() @ v))
    assert abs(o2_flow - o2_dense) < 1e-12


def test_tfim_ground_state_exact_manifold_and_chi_monotone():
    # chi=16 saturates every cut of the n=8 tree (leaf 4, level-1 16),
    # so the variational minimum IS the exact ground state; adam gets
    # within its step-noise floor (measured 3e-5 at 3000 steps).
    n, h = 8, 1.05
    h_mpo = tfim_mpo(n, h=h)
    e0 = float(np.linalg.eigvalsh(_dense_tfim(n, h))[0])
    _, es16 = ttn_ground_state(h_mpo, chi=16, steps=3000, lr=0.02)
    err16 = float(es16[-1]) - e0
    assert -1e-9 < err16 < 1e-4, err16

    _, es4 = ttn_ground_state(h_mpo, chi=4, steps=3000, lr=0.02)
    err4 = float(es4[-1]) - e0
    assert err4 > -1e-9  # variational
    assert err16 < err4  # truncation hierarchy
    # energies non-increasing over the optimization (up to adam noise)
    e = np.asarray(es16)
    assert e[-1] <= e[0]
    assert float(np.min(e[-100:])) <= float(np.min(e[:100]))


def test_heisenberg_ground_state():
    # heisenberg_mpo is in PAULI convention (4x the spin-1/2 S form).
    n = 8
    h_mpo = heisenberg_mpo(n)
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd += 2.0 * (_site_op(sp, i, n) @ _site_op(sm, i + 1, n)
                     + _site_op(sm, i, n) @ _site_op(sp, i + 1, n))
        hd += _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    e0 = float(np.linalg.eigvalsh(hd)[0])
    params, es = ttn_ground_state(h_mpo, chi=16, steps=4000, lr=0.02)
    err = float(es[-1]) - e0
    assert -1e-9 < err < 3e-4, err
    # staggered magnetization pattern of the converged state: total
    # <Z_i> vanishes on the SU(2)-symmetric ground state.
    zs = [float(np.real(ttn_expectation(
        params, product_mpo(n, [(i, Z)], dtype=jnp.float64))))
        for i in range(n)]
    assert abs(sum(zs)) < 5e-2, zs


def test_ttn_dmrg_machine_precision_and_truncated():
    """Sweeped eigensolves (TTN-DMRG): machine-precision ED parity on
    the chi-saturated tree in a few sweeps (where adam stalls at its
    step-noise floor), monotone sweep energies, and a truncated chi=4
    optimum far below the gradient route's."""
    from contractn_tpu.models.ttn import ttn_dmrg

    n, h = 8, 1.05
    h_mpo = tfim_mpo(n, h=h)
    e0 = float(np.linalg.eigvalsh(_dense_tfim(n, h))[0])
    params, es = ttn_dmrg(h_mpo, chi=16, sweeps=4)
    assert abs(es[-1] - e0) < 1e-10, es[-1] - e0
    assert float(np.real(ttn_energy(params, h_mpo))) - e0 < 1e-10
    e = np.asarray(es)
    assert np.all(np.diff(e) < 1e-10)  # variational sweeps
    # consistency: the returned gauge is globally normalized
    v = np.asarray(ttn_to_dense(params))
    assert abs(np.linalg.norm(v) - 1.0) < 1e-10

    _, es4 = ttn_dmrg(h_mpo, chi=4, sweeps=5)
    err4 = es4[-1] - e0
    assert -1e-9 < err4 < 1e-5, err4  # truncated but sharp


def test_ttn_dmrg_heisenberg():
    from contractn_tpu.models.ttn import ttn_dmrg

    n = 8
    h_mpo = heisenberg_mpo(n)
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd += 2.0 * (_site_op(sp, i, n) @ _site_op(sm, i + 1, n)
                     + _site_op(sm, i, n) @ _site_op(sp, i + 1, n))
        hd += _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    e0 = float(np.linalg.eigvalsh(hd)[0])
    _, es = ttn_dmrg(h_mpo, chi=16, sweeps=5)
    assert abs(es[-1] - e0) < 1e-9, es[-1] - e0


def test_ttn_dmrg_2d_snake_hamiltonian():
    """Trees are natural for 2D: ttn_dmrg consumes the snake-flattened
    4x4 TFIM MPO unchanged and agrees with converged chain DMRG."""
    import jax as _jax

    from contractn_tpu.models import MPS, dmrg, tfim2d_mpo
    from contractn_tpu.models.ttn import ttn_dmrg

    lx = ly = 4
    n = lx * ly
    h = 3.5  # strongly polarized: modest chi suffices
    h_mpo = tfim2d_mpo(lx, ly, h=h)
    # 2^16 dense ED is infeasible; the oracle is converged chain DMRG
    # on the SAME snake MPO (an independent optimizer on an
    # independent manifold).
    gs, e_dmrg, _ = dmrg(
        h_mpo, MPS.random(_jax.random.PRNGKey(0), n, 2, 16,
                          dtype=np.float64),
        max_bond=48, sweeps=6)
    e_dmrg = float(np.real(e_dmrg))
    _, es = ttn_dmrg(h_mpo, chi=32, sweeps=5)
    err = abs(es[-1] - e_dmrg) / abs(e_dmrg)
    assert err < 2e-6, (es[-1], e_dmrg)


def test_ttn_inner_matches_dense_overlap():
    from contractn_tpu.models.ttn import ttn_inner

    ka, kb = jax.random.PRNGKey(21), jax.random.PRNGKey(22)
    pa = random_ttn(ka, 8, 2, 5)
    pb = random_ttn(kb, 8, 2, 5)
    # deform both away from isometric gauge
    pa = jax.tree_util.tree_map(
        lambda a: a + 0.2 * jax.random.normal(ka, a.shape, a.dtype), pa)
    pb = jax.tree_util.tree_map(
        lambda a: a + 0.2 * jax.random.normal(kb, a.shape, a.dtype), pb)
    va = np.asarray(ttn_to_dense(pa))
    vb = np.asarray(ttn_to_dense(pb))
    ref = np.vdot(va, vb)
    val = complex(ttn_inner(pa, pb))
    assert abs(val - ref) < 1e-11
    # norm special case
    assert abs(complex(ttn_inner(pa, pa)) - np.vdot(va, va)) < 1e-11
