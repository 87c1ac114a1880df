"""Differentiable BP: energy parity, gradients, and ground states.

Oracles: dense Rayleigh quotients and dense ED.  On trees the BP
energy IS the exact Rayleigh quotient (messages converge in <= diameter
sweeps), so gradient descent is gradient-based DMRG; on the ring the
Bethe estimate lands within a fraction of a percent of ED for a gapped
Hamiltonian.
"""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu import TN
from contractn_tpu.compiler.bp_variational import (
    bp_energy,
    bp_ground_state,
    make_bp_energy,
)

SX = np.array([[0.0, 1.0], [1.0, 0.0]])
SZ = np.diag([1.0, -1.0])


def _chain_tn(rng, n, chi):
    tn = TN()
    for i in range(n):
        shape = [2] + ([chi] if i < n - 1 else []) \
            + ([chi] if i > 0 else [])
        tn.add_dense_node(0.3 * rng.standard_normal(tuple(shape)),
                          name=f"s{i}")
    for i in range(n - 1):
        tn.connect_nodes(f"s{i}", f"s{i+1}", 1, 2 if i + 1 < n - 1 else 1)
    return tn


def _op(o, i, n):
    m = np.eye(1)
    for j in range(n):
        m = np.kron(m, o if j == i else np.eye(2))
    return m


def _dense_tfim(n, h, periodic=False):
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n if periodic else n - 1):
        hd -= _op(SZ, i, n) @ _op(SZ, (i + 1) % n, n)
    for i in range(n):
        hd -= h * _op(SX, i, n)
    return hd


def _tfim_terms(n, h, periodic=False):
    bonds = [(f"s{i}", f"s{(i+1) % n}", -np.kron(SZ, SZ))
             for i in range(n if periodic else n - 1)]
    local = [(f"s{i}", -h * SX) for i in range(n)]
    return bonds, local


def test_energy_is_exact_rayleigh_on_chain():
    rng = np.random.default_rng(0)
    n, h = 6, 1.05
    tn = _chain_tn(rng, n, 4)
    bonds, local = _tfim_terms(n, h)
    e_bp = bp_energy(tn, bonds, local, n_sweeps=20)
    psi = np.asarray(tn.contract()).reshape(-1)
    hd = _dense_tfim(n, h)
    e_ref = float(psi @ hd @ psi / (psi @ psi))
    assert abs(e_bp - e_ref) < 1e-12


def test_unrolled_gradient_matches_finite_differences():
    rng = np.random.default_rng(1)
    n, h = 4, 0.7
    tn = _chain_tn(rng, n, 3)
    bonds, local = _tfim_terms(n, h)
    fn, ts = make_bp_energy(tn, bonds, local, n_sweeps=15)
    g = jax.grad(fn)(ts)
    eps = 1e-6
    base = [np.asarray(t).copy() for t in ts]
    idx = (1, 1, 2)
    plus = [t.copy() for t in base]
    plus[1][idx] += eps
    minus = [t.copy() for t in base]
    minus[1][idx] -= eps
    fd = (fn(tuple(jnp.asarray(t) for t in plus))
          - fn(tuple(jnp.asarray(t) for t in minus))) / (2 * eps)
    assert abs(float(fd) - float(np.asarray(g[1])[idx])) < 1e-7


def test_chain_descent_is_gradient_dmrg():
    rng = np.random.default_rng(0)
    n, h, chi = 6, 1.05, 8
    tn = _chain_tn(rng, n, chi)
    bonds, local = _tfim_terms(n, h)
    tn2, es = bp_ground_state(tn, bonds, local, steps=600, lr=0.02,
                              n_sweeps=20)
    e0 = np.linalg.eigvalsh(_dense_tfim(n, h))[0]
    assert float(es[-1]) < float(es[0])
    assert abs(float(es[-1]) - e0) < 1e-3
    # the rebuilt network reproduces the optimized energy (es[-1] is
    # evaluated BEFORE the final adam update, so only near-converged
    # agreement is expected)
    assert abs(bp_energy(tn2, bonds, local, n_sweeps=20)
               - float(es[-1])) < 1e-5


def test_ring_descent_matches_ed_for_gapped_hamiltonian():
    rng = np.random.default_rng(2)
    n, h, chi = 8, 2.0, 3
    tn = TN()
    for i in range(n):
        tn.add_dense_node(0.3 * rng.standard_normal((2, chi, chi)),
                          name=f"s{i}")
    for i in range(n):
        tn.connect_nodes(f"s{i}", f"s{(i+1) % n}", 1, 2)
    bonds, local = _tfim_terms(n, h, periodic=True)
    tn2, es = bp_ground_state(tn, bonds, local, steps=500, lr=0.03,
                              n_sweeps=25)
    e0 = np.linalg.eigvalsh(_dense_tfim(n, h, periodic=True))[0]
    assert abs(float(es[-1]) - e0) / abs(e0) < 5e-3
