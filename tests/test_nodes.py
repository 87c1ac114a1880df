"""Property tests for the node layer (hypothesis-randomized).

Organized around a small behavioral model rather than per-assertion
prose: ``surface(node)`` snapshots everything a node exposes, and the
``expect_*`` helpers state what that snapshot must look like after each
``add_*`` call.  The randomization strategy mirrors the reference's test
suite (SURVEY.md §4: ``@given`` over order and option booleans, full
name/edge-symbol kwarg matrix on every node type) while the invariants
themselves are this framework's contract: five node types, dangler
termination of every open mode, per-type symbol allocation policy, and
``size``/``numel`` semantics including variable (-1) dimensions.
"""

import string

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from contractn_tpu import TN, TNError

ALPHA = string.ascii_letters  # allocator order: a..z then A..Z

# Attributes that must raise when read on the wrong node type
TYPE_ONLY_ATTRS = {
    "tensor": {"dense"},
    "base_node": {"clone"},
    "degree": {"hyper"},
    "dim": {"hyper"},
    "var_axes": {"input"},
}

orders = st.integers(min_value=0, max_value=4)
flags = st.booleans()


def allocator_symbols(start, count):
    """The symbols a fresh TN hands out for ``count`` new modes."""
    return tuple(ALPHA[start + k] for k in range(count))


def custom_symbols(count):
    """A user-chosen symbol tuple disjoint from early allocator output."""
    return tuple(ALPHA[-(k + 1)] for k in range(count))


def surface(node):
    """Snapshot of a node's public read surface."""
    return {
        "type": node.node_type,
        "name": node.name,
        "ndim": node.ndim,
        "shape": node.shape,
        "size": node.size,
        "numel": node.numel,
        "symbols": node.edge_symbols,
    }


def check_mode_bookkeeping(tn):
    """Per-mode invariants every TN must satisfy at all times:
    ``node[i]``/``node.index`` are inverse, and every open mode ends in a
    dangler whose only neighbor is the node itself."""
    for node in tn.nodes():
        assert len(node.edges) == node.ndim
        for i, edge in enumerate(node.edges):
            assert node.index(edge) == i
            assert node[i] is edge
        for nb in node.neighbors:
            if nb.dangler:
                assert set(nb.neighbors) == {node}


def check_counts(tn, *, dense=0, clone=0, hyper=0, inputs=0, open_modes=0):
    assert tn.num_dense == dense
    assert tn.num_duplicate == clone
    assert tn.num_copy == hyper
    assert tn.num_input == inputs
    assert tn.num_cores == dense + clone + hyper + inputs
    assert len(tn.nodes()) == tn.num_cores
    danglers = [n for n in tn.nodes(danglers=True) if n.dangler]
    assert len(danglers) == open_modes


def check_type_gating(node):
    allowed = {a for a, types in TYPE_ONLY_ATTRS.items()
               if node.node_type in types}
    for attr in TYPE_ONLY_ATTRS:
        if attr in allowed:
            getattr(node, attr)
        else:
            with pytest.raises(Exception):
                getattr(node, attr)


@settings(max_examples=25, deadline=None)
@given(order=orders, named=flags, own_syms=flags)
def test_dense_node(order, named, own_syms):
    tn = TN()
    shape = tuple(np.arange(2, 2 + order))
    tensor = np.zeros(shape)
    syms = custom_symbols(order) if own_syms else None
    node = tn.add_dense_node(
        tensor, name="core" if named else None, edge_symbols=syms
    )

    want_syms = syms if own_syms else allocator_symbols(0, order)
    assert surface(node) == {
        "type": "dense",
        "name": "core" if named else "node_0",
        "ndim": order,
        "shape": shape,
        "size": tensor.size,
        "numel": tensor.size,  # dense nodes own real parameters
        "symbols": want_syms,
    }
    assert tn.edge_symbols == set(want_syms)
    check_counts(tn, dense=1, open_modes=order)
    check_mode_bookkeeping(tn)
    check_type_gating(node)
    assert node.tensor is tensor


@settings(max_examples=25, deadline=None)
@given(order=orders, named=flags, own_syms=flags, by_name=flags)
def test_clone_node(order, named, own_syms, by_name):
    tn = TN()
    tensor = np.zeros(tuple(np.arange(2, 2 + order)))
    base = tn.add_dense_node(tensor)
    syms = custom_symbols(order) if own_syms else None
    node = tn.add_duplicate_node(
        base.name if by_name else base,
        name="twin" if named else None,
        edge_symbols=syms,
    )

    want_syms = syms if own_syms else allocator_symbols(order, order)
    assert surface(node) == {
        "type": "clone",
        "name": "twin" if named else "node_1",
        "ndim": order,
        "shape": tensor.shape,
        "size": tensor.size,  # logical size follows the base tensor
        "numel": 0,           # ...but a clone owns NO parameters
        "symbols": want_syms,
    }
    assert node.base_node is base
    assert tn.edge_symbols == set(base.edge_symbols) | set(want_syms)
    check_counts(tn, dense=1, clone=1, open_modes=2 * order)
    check_mode_bookkeeping(tn)
    check_type_gating(node)


@settings(max_examples=25, deadline=None)
@given(degree=st.integers(min_value=1, max_value=5), sized=flags,
       named=flags, own_syms=flags, sym_as_str=flags)
def test_copy_node(degree, sized, named, own_syms, sym_as_str):
    tn = TN()
    dim = 3 if sized else None
    if own_syms:
        sym = ALPHA[-1]
        syms = sym if sym_as_str else (sym,) * degree
    else:
        syms = None
    node = tn.add_copy_node(
        degree, dim=dim, name="hub" if named else None, edge_symbols=syms
    )

    # Policy: ALL modes of a copy tensor share ONE symbol (that repetition
    # in >= 2 einsum terms IS the hyperedge)
    want = ALPHA[-1] if own_syms else ALPHA[0]
    assert surface(node) == {
        "type": "hyper",
        "name": "hub" if named else "node_0",
        "ndim": degree,
        "shape": (dim if sized else -1,) * degree,
        "size": dim ** degree if sized else None,  # None = not yet known
        "numel": 0,  # copy tensors are never materialized
        "symbols": (want,) * degree,
    }
    assert node.degree == degree
    assert node.dim == dim  # None until a bond fixes it
    assert tn.edge_symbols == {want}
    check_counts(tn, hyper=1, open_modes=degree)
    check_mode_bookkeeping(tn)
    check_type_gating(node)


@settings(max_examples=25, deadline=None)
@given(order=orders, named=flags, own_syms=flags, data=st.data())
def test_input_node(order, named, own_syms, data):
    tn = TN()
    shape = tuple(range(2, 2 + order))
    var_axes = tuple(sorted(data.draw(
        st.sets(st.integers(min_value=0, max_value=max(order - 1, 0)),
                max_size=order)
    ))) if order else ()
    syms = custom_symbols(order) if own_syms else None
    node = tn.add_input_node(
        shape, var_shape_axes=var_axes,
        name="feed" if named else None, edge_symbols=syms,
    )

    want_syms = syms if own_syms else allocator_symbols(0, order)
    want_shape = tuple(
        -1 if ax in var_axes else d for ax, d in enumerate(shape)
    )
    assert surface(node) == {
        "type": "input",
        "name": "feed" if named else "node_0",
        "ndim": order,
        "shape": want_shape,
        # size is unknowable until a concrete input arrives
        "size": None if var_axes else int(np.prod(shape, dtype=int)),
        "numel": 0,  # inputs are supplied at contract time, not owned
        "symbols": want_syms,
    }
    assert node.var_axes == tuple(var_axes)
    check_counts(tn, inputs=1, open_modes=order)
    check_mode_bookkeeping(tn)
    check_type_gating(node)


# -- targeted edge cases ------------------------------------------------- #


def test_clone_requires_dense_base():
    tn = TN()
    hub = tn.add_copy_node(2)
    with pytest.raises(TNError):
        tn.add_duplicate_node(hub)


def test_copy_node_rejects_degree_zero_and_mixed_symbols():
    tn = TN()
    with pytest.raises(Exception):
        tn.add_copy_node(0)
    with pytest.raises(TNError):
        tn.add_copy_node(2, edge_symbols=("p", "q"))


def test_node_names_are_unique():
    tn = TN()
    tn.add_dense_node(np.ones(2), name="dup")
    with pytest.raises(TypeError):
        tn.add_input_node((3,), name="dup")


def test_tensor_setter_keeps_ndim():
    tn = TN()
    node = tn.add_dense_node(np.ones((2, 3)))
    replacement = np.zeros((5, 6))
    node.tensor = replacement
    assert node.shape == replacement.shape
    with pytest.raises(TNError):
        node.tensor = np.zeros((2, 3, 4))  # rank change = different node


def test_node_g_graph_handle():
    """Reference-parity ``Node.G``: the backing graph as networkx
    (reference ``nodes.py`` exposed the raw MultiGraph; here it is the
    same snapshot as ``TN.to_networkx``)."""
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 3)))
    b = tn.add_dense_node(np.ones((3, 4)))
    tn.connect_nodes(a, b, 1, 0)
    g = a.G
    assert g.nodes[a.name]["node_type"] == "dense"
    assert g.has_edge(a.name, b.name)
    # snapshot semantics: mutating the export leaves the TN untouched
    g.remove_node(b.name)
    assert b.name in tn
