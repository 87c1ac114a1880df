"""Node-type invariants, mirroring the reference property tests
(``/root/reference/contractn/tests/test_nodes.py``) without the hypothesis
randomization — each (order, option) combination is exercised explicitly.
"""

from string import ascii_lowercase as alph

import numpy as np
import pytest

from contractn_tpu import TN, TNError


def assert_index_inverse(tn):
    """Node.__getitem__ and Node.index are inverses (reference invariant)."""
    for node in tn.nodes():
        for i in range(node.ndim):
            assert node.index(node[i]) == i
        for e in node.edges:
            assert node[node.index(e)] is e


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("use_name", [False, True])
@pytest.mark.parametrize("use_edge_symbols", [False, True])
def test_add_dense_node(order, use_name, use_edge_symbols):
    tn = TN()
    tensor = np.ones((2,) * order)
    name = "boring_core" if use_name else None
    edge_symbols = tuple(alph[26 - order:]) if use_edge_symbols else None
    good_symbols = tuple(alph[:order]) if edge_symbols is None else edge_symbols
    node = tn.add_dense_node(tensor, name=name, edge_symbols=edge_symbols)

    assert node.node_type == "dense"
    assert node.name == (name if use_name else "node_0")
    assert tn.num_duplicate == tn.num_copy == tn.num_input == 0
    assert tn.num_dense == tn.num_cores == 1
    assert tn.edge_symbols == set(good_symbols)
    assert all(n.dangler for n in node.neighbors)

    assert node.ndim == order
    assert node.shape == tensor.shape
    assert node.edge_symbols == good_symbols
    assert node.size == node.numel == tensor.size
    assert_index_inverse(tn)

    for attr in ["base_node", "degree", "dim", "var_axes"]:
        with pytest.raises(Exception):
            getattr(node, attr)


@pytest.mark.parametrize("order", [0, 2])
@pytest.mark.parametrize("use_dense_name", [False, True])
def test_add_duplicate_node(order, use_dense_name):
    tn = TN()
    tensor = np.ones((2,) * order)
    dense_node = tn.add_dense_node(tensor)
    dense = dense_node.name if use_dense_name else dense_node

    dense_symbols = set(alph[:order])
    good_symbols = tuple(alph[order:2 * order])
    node = tn.add_duplicate_node(dense)

    assert node.node_type == "clone"
    assert node.name == "node_1"
    assert tn.num_copy == tn.num_input == 0
    assert tn.num_dense == tn.num_duplicate == 1
    assert tn.num_cores == 2
    assert tn.edge_symbols == dense_symbols.union(good_symbols)
    assert all(n.dangler for n in node.neighbors)

    assert node.ndim == order
    assert node.shape == tensor.shape
    assert node.edge_symbols == good_symbols
    assert node.base_node is dense_node
    assert node.size == tensor.size
    assert node.numel == 0
    assert_index_inverse(tn)

    for attr in ["tensor", "degree", "dim", "var_axes"]:
        with pytest.raises(Exception):
            getattr(node, attr)


def test_clone_of_non_dense_rejected():
    tn = TN()
    hub = tn.add_copy_node(3)
    with pytest.raises(TNError):
        tn.add_duplicate_node(hub)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("use_dim", [False, True])
@pytest.mark.parametrize("single_symbol", [False, True])
def test_add_copy_node(order, use_dim, single_symbol):
    tn = TN()
    dim = 5 if use_dim else None
    edge_symbols = "z" if single_symbol else ("z",) * order
    good_symbols = ("z",) * order
    good_shape = ((dim if use_dim else -1),) * order

    if order == 0:
        with pytest.raises(Exception):
            tn.add_copy_node(order, dim=dim, edge_symbols=edge_symbols)
        return
    node = tn.add_copy_node(order, dim=dim, edge_symbols=edge_symbols)

    assert node.node_type == "hyper"
    assert tn.num_duplicate == tn.num_dense == tn.num_input == 0
    assert tn.num_copy == tn.num_cores == 1
    assert tn.edge_symbols == set(good_symbols)
    assert all(n.dangler for n in node.neighbors)

    assert node.ndim == order
    assert node.shape == good_shape
    assert node.edge_symbols == good_symbols
    if use_dim:
        assert node.size == 5 ** order
    else:
        assert node.size is None
    assert node.numel == 0
    assert_index_inverse(tn)

    for attr in ["tensor", "base_node", "var_axes"]:
        with pytest.raises(Exception):
            getattr(node, attr)


def test_copy_node_auto_symbol():
    tn = TN()
    node = tn.add_copy_node(4)
    assert node.edge_symbols == ("a",) * 4
    assert tn.edge_symbols == {"a"}


def test_copy_node_distinct_symbols_rejected():
    tn = TN()
    with pytest.raises(TNError):
        tn.add_copy_node(2, edge_symbols=("a", "b"))


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("use_var_axis", [False, True])
def test_add_input_node(order, use_var_axis):
    tn = TN()
    shape = tuple(range(2, 2 + order))
    var_axes = (order - 1,) if (use_var_axis and order > 0) else ()
    good_symbols = tuple(alph[:order])
    node = tn.add_input_node(shape, var_shape_axes=var_axes)

    assert node.node_type == "input"
    assert tn.num_duplicate == tn.num_copy == tn.num_dense == 0
    assert tn.num_input == tn.num_cores == 1
    assert tn.edge_symbols == set(good_symbols)
    assert all(n.dangler for n in node.neighbors)

    assert node.ndim == order
    assert node.shape == tuple(
        -1 if i in var_axes else d for i, d in enumerate(shape)
    )
    assert node.edge_symbols == good_symbols
    if not var_axes:
        assert node.size == int(np.prod(shape, dtype=int))
    else:
        assert node.size is None
    assert node.numel == 0
    assert_index_inverse(tn)

    for attr in ["tensor", "base_node", "degree", "dim"]:
        with pytest.raises(Exception):
            getattr(node, attr)


def test_duplicate_name_rejected():
    tn = TN()
    tn.add_dense_node(np.ones(2), name="x")
    with pytest.raises(TypeError):
        tn.add_dense_node(np.ones(2), name="x")


def test_tensor_setter():
    tn = TN()
    node = tn.add_dense_node(np.ones((2, 3)))
    node.tensor = np.zeros((4, 5))
    assert node.shape == (4, 5)
    with pytest.raises(TNError):
        node.tensor = np.zeros((4, 5, 6))
