"""Belief-propagation contraction: tree exactness (dense + copy nodes,
split-format stability), the single-loop Bethe value, environments."""

import numpy as np
import pytest

import jax.numpy as jnp

from contractn_tpu import TN, TNError, bp_contract, bp_environment


def _value(pair):
    m, log = pair
    return complex(m * jnp.exp(log))


def _random_tree_tn(n_nodes, seed):
    """Random tree of dense nodes with random bond dims in 2..4."""
    rng = np.random.default_rng(seed)
    parents = [None] + [int(rng.integers(i)) for i in range(1, n_nodes)]
    dims = [0] + [int(rng.integers(2, 5)) for _ in range(1, n_nodes)]
    order = [0] * n_nodes  # tensor order per node
    for i in range(1, n_nodes):
        order[i] += 1
        order[parents[i]] += 1
    tn = TN()
    slots = [0] * n_nodes  # next free mode per node
    shapes = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        shapes[i].append(dims[i])
        shapes[parents[i]].append(dims[i])
    for i in range(n_nodes):
        t = rng.standard_normal(tuple(shapes[i]))
        tn.add_dense_node(t, name=f"n{i}")
    for i in range(1, n_nodes):
        tn.connect_nodes(f"n{i}", f"n{parents[i]}", slots[i],
                         slots[parents[i]])
        slots[i] += 1
        slots[parents[i]] += 1
    return tn


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bp_exact_on_random_trees(seed):
    tn = _random_tree_tn(12, seed)
    want = _value(tn.contract(split_format=True))
    got = _value(bp_contract(tn))
    assert abs(got - want) < 1e-10 * max(abs(want), 1e-30)


def test_bp_exact_on_copy_node_star():
    """The README copy-hub workflow, closed: sum over the shared index
    of a product of 60 vectors."""
    tn = TN()
    hub = tn.add_copy_node(60)
    for i in range(60):
        v = tn.add_dense_node(np.array([1.0, 0.99]))
        tn.connect_nodes(hub, v, i, 0)
    want = 1.0 + 0.99 ** 60
    got = _value(bp_contract(tn))
    assert abs(got - want) < 1e-12


def test_bp_split_format_on_long_chain():
    """500-link ones chain (a tree): BP must carry the log like the
    exact engine — the dense value overflows by design."""
    tn = TN()
    prev = tn.add_dense_node(np.ones(3))
    for _ in range(500):
        mat = tn.add_dense_node(np.ones((3, 3)))
        tn.connect_nodes(prev, mat, -1, 0)
        prev = mat
    end = tn.add_dense_node(np.ones(3))
    tn.connect_nodes(prev, end, -1, 0)
    m_exact, log_exact = tn.contract(split_format=True)
    m_bp, log_bp = bp_contract(tn)
    want = float(jnp.log(jnp.abs(m_exact)) + log_exact)
    got = float(jnp.log(jnp.abs(m_bp)) + log_bp)
    assert abs(got - want) < 1e-8


def test_bp_ring_gives_dominant_eigenvalue():
    """On a single loop BP is exactly lambda_max^N (the Bethe value),
    dropping the subleading eigenvalue orbits of the true trace."""
    rng = np.random.default_rng(3)
    m = rng.uniform(0.5, 1.5, size=(4, 4))  # positive -> BP converges
    n = 6
    tn = TN()
    nodes = [tn.add_dense_node(m, name=f"m{i}") for i in range(n)]
    for i in range(n):
        tn.connect_nodes(nodes[i], nodes[(i + 1) % n], 1, 0)
    lam = np.linalg.eigvals(m)
    lam_max = lam[np.argmax(np.abs(lam))].real
    got = _value(bp_contract(tn, max_iter=500))
    assert abs(got - lam_max ** n) < 1e-8 * lam_max ** n
    # and the exact engine sees all orbits
    exact = _value(tn.contract(split_format=True))
    assert abs(exact - np.sum(lam ** n)) < 1e-8 * abs(exact)


def test_bp_environment_on_chain():
    """3-node chain: the BP environment of the middle node is the two
    boundary vectors (up to the message normalization)."""
    v1 = np.array([0.3, 0.7, 1.1])
    v2 = np.array([1.0, -0.2, 0.5, 0.9])
    mat = np.arange(12.0).reshape(3, 4) + 1.0
    tn = TN()
    a = tn.add_dense_node(v1)
    b = tn.add_dense_node(mat, name="mid")
    c = tn.add_dense_node(v2)
    tn.connect_nodes(a, b, 0, 0)
    tn.connect_nodes(b, c, 1, 0)
    env, iters = bp_environment(tn, "mid")
    for got, want in zip(env, (v1, v2)):
        got = np.asarray(got)
        cos = got @ want / (np.linalg.norm(got) * np.linalg.norm(want))
        assert abs(abs(cos) - 1.0) < 1e-12
    z_bp = _value(bp_contract(tn))
    z_exact = v1 @ mat @ v2
    assert abs(z_exact - _value(tn.contract(split_format=True))) < 1e-10
    # on a tree the normalization-invariant Bethe assembly is exact
    assert abs(z_bp - z_exact) < 1e-10 * abs(z_exact)
    assert iters <= 10


def test_bp_rejects_open_networks():
    tn = TN()
    tn.add_dense_node(np.ones((2, 2)))
    with pytest.raises(TNError):
        bp_contract(tn)
