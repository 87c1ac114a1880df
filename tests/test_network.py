"""TN topology invariants: connect/remove, copy clusters, einstrings.

Mirrors the reference's ``test_ctn.py`` invariants and closes its coverage
gaps: name-based connect (reference defect D2), copy-cluster symbol
unification through bonds, and removal round-trips.
"""

from itertools import combinations

import numpy as np
import pytest

from contractn_tpu import TN, TNError
from tests.test_nodes import assert_index_inverse


@pytest.mark.parametrize("node_type", ["dense", "hyper"])
@pytest.mark.parametrize("graph_topology", ["path", "complete"])
@pytest.mark.parametrize("num_nodes", [2, 4, 6])
@pytest.mark.parametrize("neg_indices", [False, True])
def test_connect_nodes(node_type, graph_topology, num_nodes, neg_indices):
    tn = TN()
    bond_dim, input_dim = 2, 3

    if graph_topology == "path":
        if node_type == "dense":
            make = lambda: tn.add_dense_node(  # noqa: E731
                np.ones((input_dim, bond_dim, bond_dim))
            )
        else:
            make = lambda: tn.add_copy_node(3, dim=bond_dim)  # noqa: E731
        node_list = [make() for _ in range(num_nodes)]
        for i in range(num_nodes - 1):
            indices = (-1, -2) if neg_indices else (2, 1)
            tn.connect_nodes(node_list[i], node_list[i + 1], *indices)

        assert len(tn.nodes()) == tn.num_cores == num_nodes
        assert tn.num_duplicate == tn.num_input == 0
        assert len(tn.nodes(danglers=True)) == 2 * num_nodes + 2
        assert len(tn.edges()) == 2 * num_nodes + 1
        if node_type == "dense":
            assert tn.num_copy == 0
            assert tn.num_dense == num_nodes
            assert len(tn.edge_symbols) == 2 * num_nodes + 1
        else:
            assert tn.num_dense == 0
            assert tn.num_copy == num_nodes
            assert len(tn.edge_symbols) == 1

        for i, node in enumerate(node_list):
            full_neighbors = set(node.neighbors)
            neighbor_set = set(node_list[i - 1:i] + node_list[i + 1:i + 2])
            assert len(full_neighbors - neighbor_set) == 1 + int(
                i in (0, num_nodes - 1)
            )
            assert neighbor_set.issubset(full_neighbors)

    else:  # complete graph
        if node_type == "dense":
            shape = (input_dim,) + (bond_dim,) * (num_nodes - 1)
            make = lambda: tn.add_dense_node(np.ones(shape))  # noqa: E731
        else:
            make = lambda: tn.add_copy_node(num_nodes, dim=bond_dim)  # noqa: E731
        node_list = [make() for _ in range(num_nodes)]
        for i, j in combinations(range(num_nodes), 2):
            indices = (
                (j - num_nodes, i + 1 - num_nodes) if neg_indices else (j, i + 1)
            )
            tn.connect_nodes(node_list[i], node_list[j], *indices)

        assert len(tn.nodes()) == tn.num_cores == num_nodes
        assert tn.num_duplicate == tn.num_input == 0
        assert len(tn.edges()) == (num_nodes ** 2 + num_nodes) / 2
        assert len(tn.nodes(danglers=True)) == 2 * num_nodes
        if node_type == "dense":
            assert tn.num_copy == 0
            assert tn.num_dense == num_nodes
            assert len(tn.edge_symbols) == (num_nodes ** 2 + num_nodes) / 2
        else:
            assert tn.num_dense == 0
            assert tn.num_copy == num_nodes
            assert len(tn.edge_symbols) == 1

        for i, node in enumerate(node_list):
            full_neighbors = set(node.neighbors)
            neighbor_set = set(node_list[:i] + node_list[i + 1:])
            assert len(full_neighbors) == len(neighbor_set) + 1
            assert neighbor_set.issubset(full_neighbors)

    # Symbol unification must be idempotent
    tn._cleanup_edge_symbols()
    assert_index_inverse(tn)


def test_connect_nodes_by_name():
    """Name-based connect works (broken in the reference — defect D2)."""
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 2)), name="a")
    tn.add_dense_node(np.ones((2, 2)), name="b")
    tn.connect_nodes("a", "b", 1, 0)
    assert set(n.name for n in a.neighbors if not n.dangler) == {"b"}
    es = tn.einsum_str
    assert es.count(",") == 1


def test_connect_already_bonded_mode_raises():
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 2)))
    b = tn.add_dense_node(np.ones((2, 2)))
    c = tn.add_dense_node(np.ones((2, 2)))
    tn.connect_nodes(a, b, 1, 0)
    with pytest.raises(TNError):
        tn.connect_nodes(a, c, 1, 0)


def test_connect_dim_mismatch_raises():
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 3)))
    b = tn.add_dense_node(np.ones((4, 5)))
    with pytest.raises(TNError):
        tn.connect_nodes(a, b, 1, 0)


def test_variable_dim_merge():
    tn = TN()
    copy = tn.add_copy_node(3)  # variable dims
    vec = tn.add_dense_node(np.ones(7))
    tn.connect_nodes(copy, vec, 0, 0)
    edge = vec[0]
    assert edge.dim == 7
    assert not edge.var_dim


@pytest.mark.parametrize("num_nodes", [2, 4, 6])
@pytest.mark.parametrize("single_edges", [False, True])
@pytest.mark.parametrize("use_names", [False, True])
def test_remove_edges(num_nodes, single_edges, use_names):
    """Fully connect a TN, remove everything, verify only danglers remain."""
    tn = TN()
    node_list = [
        tn.add_dense_node(np.ones((2,) * (num_nodes - 1)))
        for _ in range(num_nodes)
    ]
    for i, j in combinations(range(num_nodes), 2):
        tn.connect_nodes(node_list[i], node_list[j], j - 1, i)

    if single_edges:
        for e in tn.edges():
            tn.remove_edge(e.name if use_names else e)
    else:
        tn.remove_edges_from(
            [e.name for e in tn.edges()] if use_names else tn.edges()
        )

    assert tn.num_dense == tn.num_cores == num_nodes
    assert tn.num_duplicate == tn.num_copy == tn.num_input == 0
    assert len(tn.edges()) == len(tn.edge_symbols) == num_nodes * (num_nodes - 1)
    assert all(e.dangler for e in tn.edges())
    assert_index_inverse(tn)


def test_remove_edge_from_copy_cluster_keeps_unified_symbols():
    """After breaking a copy-node bond, the cluster still has one symbol."""
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    vecs = [tn.add_dense_node(np.ones(2)) for _ in range(3)]
    for i, v in enumerate(vecs):
        tn.connect_nodes(hub, v, i, 0)
    bond = hub[0]
    tn.remove_edge(bond)
    # hub's remaining (incl. restored dangler) edges all share one symbol
    assert len(set(hub.edge_symbols)) == 1
    assert_index_inverse(tn)


def test_copy_node_einstring_structure():
    """CP-decomposition einstring regression (reference ``test_ctn.py:145``)."""
    cp = TN()
    hub = cp.add_copy_node(3)
    for i in range(3):
        mat = cp.add_dense_node(np.eye(4, 10))
        cp.connect_nodes(hub, mat, i, 0)
    inputs, output = cp.einsum_str.split("->")
    inputs = inputs.split(",")
    assert len(set(s[0] for s in inputs)) == 1
    assert len(set(s[1] for s in inputs)) == 3
    assert output == "".join(s[1] for s in inputs)


def test_hyper_bond_symbol_consistency_with_user_symbols():
    """A copy cluster's symbol must cover bonds to dense nodes too.

    In the reference, connecting a copy node whose symbol sorts *after* the
    dense node's symbol could leave the bond labeled differently from the
    cluster (defect family D4); here all incident edges are unified.
    """
    tn = TN()
    vec = tn.add_dense_node(np.ones(2))  # symbol 'a'
    hub = tn.add_copy_node(3, edge_symbols="z")
    tn.connect_nodes(hub, vec, 0, 0)
    symbols = set(hub.edge_symbols)
    assert len(symbols) == 1
    assert vec.edge_symbols[0] in symbols


def test_params_order_and_pytree():
    tn = TN()
    t1, t2 = np.ones((2, 2)), np.zeros((3,))
    tn.add_dense_node(t1)
    tn.add_copy_node(2)
    tn.add_dense_node(t2)
    params = tn.params
    assert len(params) == 2
    assert params[0] is t1 and params[1] is t2


def test_getitem_contains():
    tn = TN()
    node = tn.add_dense_node(np.ones(2), name="x")
    assert "x" in tn
    assert node in tn
    assert tn["x"] is node
    with pytest.raises(TNError):
        tn["missing"]
