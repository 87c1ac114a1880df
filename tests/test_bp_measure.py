"""BP expectation values: exact on trees, Bethe estimate on loops.

Oracles: the exact engine's dense reconstruction (``tn.contract()``,
output legs in dangler order = site order for these builders).
"""

import numpy as np
import pytest

from contractn_tpu import TN, TNError, bp_measure

SX = np.array([[0.0, 1.0], [1.0, 0.0]])
SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def _chain_tn(rng, n, d, chi):
    tn = TN()
    for i in range(n):
        shape = [d]
        if i < n - 1:
            shape.append(chi)
        if i > 0:
            shape.append(chi)
        t = rng.standard_normal(tuple(shape)) \
            + 1j * rng.standard_normal(tuple(shape))
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n - 1):
        left_mode = 2 if i + 1 < n - 1 else 1
        tn.connect_nodes(f"s{i}", f"s{i+1}", 1, left_mode)
    return tn


def _dense_expect(psi, op, sites):
    """<psi|op|psi>/<psi|psi> with ``op`` on the given site tuple."""
    n = psi.ndim
    d = psi.shape[0]
    op = np.asarray(op).reshape((d,) * (2 * len(sites)))
    out = np.tensordot(op, psi, axes=[list(range(len(sites), 2 * len(sites))),
                                      list(sites)])
    out = np.moveaxis(out, range(len(sites)), sites)
    del n
    return np.vdot(psi, out) / np.vdot(psi, psi)


def test_chain_local_and_bond_exact():
    rng = np.random.default_rng(3)
    n = 6
    tn = _chain_tn(rng, n, 2, 3)
    psi = np.asarray(tn.contract())
    zz = np.kron(SZ, SZ)
    local, bonds = bp_measure(
        tn,
        local=[(f"s{i}", SZ) for i in range(n)],
        bonds=[(f"s{i}", f"s{i+1}", zz) for i in range(n - 1)])
    for i in range(n):
        ref = _dense_expect(psi, SZ, (i,))
        assert abs(local[i] - ref) < 1e-10
    for i in range(n - 1):
        ref = _dense_expect(psi, zz, (i, i + 1))
        assert abs(bonds[i] - ref) < 1e-10


def test_branched_tree_exact():
    # Y junction: center with 3 bonds + phys; one extra site per arm.
    rng = np.random.default_rng(5)
    d, chi = 2, 3
    tn = TN()
    tn.add_dense_node(
        rng.standard_normal((d, chi, chi, chi))
        + 1j * rng.standard_normal((d, chi, chi, chi)), name="c")
    for a in range(3):
        tn.add_dense_node(
            rng.standard_normal((d, chi))
            + 1j * rng.standard_normal((d, chi)), name=f"a{a}")
        tn.connect_nodes("c", f"a{a}", 1 + a, 1)
    psi = np.asarray(tn.contract())  # legs: (c, a0, a1, a2)
    zz = np.kron(SZ, SZ)
    local, bonds = bp_measure(
        tn, local=[("c", SZ), ("a1", SX)],
        bonds=[("c", "a2", zz), ("a0", "c", zz)])
    assert abs(local[0] - _dense_expect(psi, SZ, (0,))) < 1e-10
    assert abs(local[1] - _dense_expect(psi, SX, (2,))) < 1e-10
    assert abs(bonds[0] - _dense_expect(psi, zz, (0, 3))) < 1e-10
    assert abs(bonds[1] - _dense_expect(psi, zz, (1, 0))) < 1e-10


def test_multi_dangler_node_fused_operator():
    # one node carrying TWO physical legs: op acts on the fused space
    rng = np.random.default_rng(7)
    tn = TN()
    tn.add_dense_node(rng.standard_normal((2, 2, 3)), name="pair")
    tn.add_dense_node(rng.standard_normal((2, 3)), name="tail")
    tn.connect_nodes("pair", "tail", 2, 1)
    psi = np.asarray(tn.contract())  # (2, 2, 2)
    zx = np.kron(SZ, SX)
    local, _ = bp_measure(tn, local=[("pair", zx)])
    ref = _dense_expect(psi, zx, (0, 1))
    assert abs(local[0] - ref) < 1e-10


def test_ring_is_bethe_estimate():
    # weakly-correlated ring: identity is exactly 1, observables close
    # to dense (single-loop corrections small for a gapped state)
    rng = np.random.default_rng(9)
    n, d, chi = 8, 2, 2
    tn = TN()
    base = np.array([1.0, 0.2])
    for i in range(n):
        t = np.zeros((d, chi, chi))
        t[:, 0, 0] = base
        t += 0.05 * rng.standard_normal((d, chi, chi))
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n):
        tn.connect_nodes(f"s{i}", f"s{(i+1) % n}", 1, 2)
    psi = np.asarray(tn.contract())
    local, bonds = bp_measure(
        tn, local=[("s0", np.eye(2)), ("s3", SZ)],
        bonds=[("s2", "s3", np.kron(SZ, SZ))])
    assert abs(local[0] - 1.0) < 1e-12
    assert abs(local[1] - _dense_expect(psi, SZ, (3,))) < 2e-2
    ref = _dense_expect(psi, np.kron(SZ, SZ), (2, 3))
    assert abs(bonds[0] - ref) < 2e-2


def test_error_paths():
    rng = np.random.default_rng(1)
    tn = _chain_tn(rng, 4, 2, 2)
    with pytest.raises(TNError):
        bp_measure(tn, bonds=[("s0", "s2", np.eye(4))])
    with pytest.raises(TNError):
        bp_measure(tn, local=[("s0", np.eye(3))])
    with pytest.raises(TNError):
        bp_measure(tn, local=[("nope", np.eye(2))])
