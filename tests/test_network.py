"""Topology-level TN invariants (hypothesis-randomized).

Built around two generators — ``chain_tn`` and ``clique_tn`` — plus a
single ``audit`` helper that re-derives the expected global state (node/
edge/dangler/symbol counts, neighbor sets, mode bookkeeping) from the
bond list itself, so every wiring test checks the full contract instead
of hand-picked numbers.  Randomization follows the reference's strategy
(SURVEY.md §4: sizes 2-6, dense vs copy nodes, negative-index variants)
and additionally covers the reference's blind spots: name-based connect
(defect D2), removal round-trips by Edge object and by id, and copy-
cluster symbol unification across bonds.
"""

from itertools import combinations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from contractn_tpu import TN, TNError
from tests.test_nodes import check_mode_bookkeeping

sizes = st.integers(min_value=2, max_value=6)
flags = st.booleans()

BOND = 2


def chain_tn(n, kind):
    """Open chain of ``n`` order-3 nodes: mode 0 dangles, 2-1 bonds."""
    tn = TN()
    if kind == "dense":
        nodes = [tn.add_dense_node(np.ones((3, BOND, BOND)))
                 for _ in range(n)]
    else:
        nodes = [tn.add_copy_node(3, dim=BOND) for _ in range(n)]
    bonds = [(i, 2, i + 1, 1) for i in range(n - 1)]
    return tn, nodes, bonds


def clique_tn(n, kind):
    """Complete graph on ``n`` order-``n`` nodes; mode 0 dangles."""
    tn = TN()
    if kind == "dense":
        shape = (3,) + (BOND,) * (n - 1)
        nodes = [tn.add_dense_node(np.ones(shape)) for _ in range(n)]
    else:
        nodes = [tn.add_copy_node(n, dim=BOND) for _ in range(n)]
    # node i uses mode j for its bond to j (j > i), mode k+1 for k < i
    bonds = [(i, j, j, i + 1) for i, j in combinations(range(n), 2)]
    return tn, nodes, bonds


def wire(tn, nodes, bonds, negative=False):
    for i, mi, j, mj in bonds:
        ndim_i, ndim_j = nodes[i].ndim, nodes[j].ndim
        if negative:
            tn.connect_nodes(nodes[i], nodes[j], mi - ndim_i, mj - ndim_j)
        else:
            tn.connect_nodes(nodes[i], nodes[j], mi, mj)


def audit(tn, nodes, bonds, kind):
    """Re-derive and assert the complete global state from the bond list."""
    n = len(nodes)
    n_bonds = len(bonds)
    open_modes = sum(nd.ndim for nd in nodes) - 2 * n_bonds

    assert tn.num_cores == len(tn.nodes()) == n
    assert len(tn.edges()) == n_bonds + open_modes
    danglers = [x for x in tn.nodes(danglers=True) if x.dangler]
    assert len(danglers) == open_modes
    if kind == "dense":
        assert (tn.num_dense, tn.num_copy) == (n, 0)
        # every edge keeps its own symbol
        assert len(tn.edge_symbols) == n_bonds + open_modes
    else:
        assert (tn.num_dense, tn.num_copy) == (0, n)
        # a connected copy cluster collapses to ONE symbol
        assert len(tn.edge_symbols) == 1

    # neighbor sets derived from the bond list
    expect = {i: set() for i in range(n)}
    for i, _, j, _ in bonds:
        expect[i].add(nodes[j])
        expect[j].add(nodes[i])
    for i, node in enumerate(nodes):
        got = set(node.neighbors)
        got_danglers = {x for x in got if x.dangler}
        assert got - got_danglers == expect[i]
        assert len(got_danglers) == node.ndim - sum(
            1 for b in bonds if i in (b[0], b[2])
        )
    check_mode_bookkeeping(tn)


@settings(max_examples=20, deadline=None)
@given(n=sizes, kind=st.sampled_from(["dense", "hyper"]), neg=flags,
       topology=st.sampled_from(["chain", "clique"]))
def test_wiring_invariants(n, kind, neg, topology):
    build = chain_tn if topology == "chain" else clique_tn
    tn, nodes, bonds = build(n, kind)
    wire(tn, nodes, bonds, negative=neg)
    audit(tn, nodes, bonds, kind)
    # symbol unification must be a fixed point
    tn._cleanup_edge_symbols()
    audit(tn, nodes, bonds, kind)


@settings(max_examples=20, deadline=None)
@given(n=sizes, one_by_one=flags, by_id=flags)
def test_unwire_restores_open_network(n, one_by_one, by_id):
    """Wiring then removing every bond must round-trip to all-danglers,
    with every freed mode re-terminated and freshly symbolled."""
    tn, nodes, bonds = clique_tn(n, "dense")
    wire(tn, nodes, bonds)

    live = [e for e in tn.edges() if not e.dangler]
    targets = [e.name for e in live] if by_id else live
    if one_by_one:
        for t in targets:
            tn.remove_edge(t)
    else:
        tn.remove_edges_from(targets)

    audit(tn, nodes, [], "dense")
    assert all(e.dangler for e in tn.edges())
    # removal must not leak symbols: each open mode has exactly one
    assert len(tn.edge_symbols) == sum(nd.ndim for nd in nodes)


@settings(max_examples=20, deadline=None)
@given(n=sizes)
def test_rewire_after_removal_is_equivalent(n):
    """remove + reconnect reproduces a freshly wired network's einsum
    semantics (same contracted value)."""
    rng = np.random.default_rng(n)
    tn = TN()
    nodes = [tn.add_dense_node(rng.standard_normal((BOND, BOND)))
             for _ in range(n)]
    for i in range(n - 1):
        tn.connect_nodes(nodes[i], nodes[i + 1], 1, 0)
    want = np.asarray(tn.contract(backend="numpy"))

    mid = nodes[n // 2]
    bond = next(e for e in mid.edges if not e.dangler)
    a, b = bond.nodes
    ia = [k for k, en in enumerate(a.edge_names) if en == bond.name][0]
    ib = [k for k, en in enumerate(b.edge_names) if en == bond.name][-1]
    tn.remove_edge(bond)
    tn.connect_nodes(a, b, ia, ib)
    got = np.asarray(tn.contract(backend="numpy"))
    assert np.allclose(got, want, rtol=1e-10)


# -- copy-cluster symbol policy ------------------------------------------ #


def test_copy_cluster_single_symbol_through_bonds():
    """Bonding dense nodes into a copy hub pulls them into its symbol."""
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    spokes = [tn.add_dense_node(np.ones(2)) for _ in range(3)]
    for k, sp in enumerate(spokes):
        tn.connect_nodes(hub, sp, k, 0)
    cluster_sym = set(hub.edge_symbols)
    assert len(cluster_sym) == 1
    assert all(sp.edge_symbols[0] in cluster_sym for sp in spokes)


def test_copy_cluster_unification_beats_user_symbols():
    """Unification wins even when the hub's symbol sorts late (the
    reference's D4 family left such bonds inconsistently labeled)."""
    tn = TN()
    vec = tn.add_dense_node(np.ones(2))
    hub = tn.add_copy_node(3, edge_symbols="z")
    tn.connect_nodes(hub, vec, 0, 0)
    assert len(set(hub.edge_symbols)) == 1
    assert vec.edge_symbols[0] == hub.edge_symbols[0]


def test_breaking_copy_bond_keeps_cluster_unified():
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    vecs = [tn.add_dense_node(np.ones(2)) for _ in range(3)]
    for k, v in enumerate(vecs):
        tn.connect_nodes(hub, v, k, 0)
    tn.remove_edge(hub[0])
    assert len(set(hub.edge_symbols)) == 1
    check_mode_bookkeeping(tn)


def test_cp_hub_einstring_shape():
    """CP decomposition: one shared hub symbol + per-factor outputs."""
    tn = TN()
    hub = tn.add_copy_node(3)
    for k in range(3):
        tn.connect_nodes(hub, tn.add_dense_node(np.eye(4, 10)), k, 0)
    lhs, out = tn.einsum_str.split("->")
    terms = lhs.split(",")
    hub_syms = {t[0] for t in terms}
    free_syms = [t[1] for t in terms]
    assert len(hub_syms) == 1          # the hyperedge
    assert len(set(free_syms)) == 3    # three factor outputs
    assert out == "".join(free_syms)   # dangler creation order


# -- error paths and small contracts -------------------------------------- #


def test_connect_by_name_matches_connect_by_node():
    """String names are first-class (the reference's D2 made them crash)."""
    by_node, by_name = TN(), TN()
    for tn, use_names in ((by_node, False), (by_name, True)):
        m1 = tn.add_dense_node(np.arange(4.0).reshape(2, 2), name="m1")
        m2 = tn.add_dense_node(np.arange(4.0, 8.0).reshape(2, 2), name="m2")
        if use_names:
            tn.connect_nodes("m1", "m2", 1, 0)
        else:
            tn.connect_nodes(m1, m2, 1, 0)
    assert by_node.einsum_str == by_name.einsum_str
    assert np.allclose(
        np.asarray(by_node.contract(backend="numpy")),
        np.asarray(by_name.contract(backend="numpy")),
    )


def test_connect_rejects_bonded_mode_and_dim_mismatch():
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 2)))
    b = tn.add_dense_node(np.ones((2, 4)))
    c = tn.add_dense_node(np.ones((4, 2)))
    tn.connect_nodes(a, b, 1, 0)
    with pytest.raises(TNError):
        tn.connect_nodes(a, c, 1, 1)  # mode 1 of a already bonded
    with pytest.raises(TNError):
        tn.connect_nodes(b, c, 1, 1)  # 4 vs 2
    # out-of-range mode index is a typed error too (a raw IndexError
    # used to leak from the dangler lookup); negative indices stay legal
    with pytest.raises(TNError):
        tn.connect_nodes(a, c, 99, 0)
    tn.connect_nodes(b, c, -1, 0)  # -1 == mode 1 of b (dim 4)


def test_bond_dim_resolution_with_variable_modes():
    tn = TN()
    hub = tn.add_copy_node(2)  # dims unknown (-1)
    vec = tn.add_dense_node(np.ones(7))
    edge_id = tn.connect_nodes(hub, vec, 0, 0)
    edge = tn.get_edge(edge_id)
    assert edge.dim == 7 and not edge.var_dim
    assert hub[1].var_dim  # the unbonded mode stays variable


def test_dense_param_registry():
    tn = TN()
    first = np.ones((2, 2))
    second = np.zeros(3)
    tn.add_dense_node(first)
    tn.add_copy_node(2)
    tn.add_input_node((4,))
    tn.add_dense_node(second)
    assert len(tn.params) == 2
    assert tn.params[0] is first
    assert tn.params[1] is second


def test_lookup_protocols():
    tn = TN()
    node = tn.add_dense_node(np.ones(2), name="probe")
    assert "probe" in tn and node in tn
    assert tn["probe"] is node
    with pytest.raises(TNError):
        tn["ghost"]


def test_compiled_spec_cache_invalidation():
    """The cached einstring/packer must refresh on ANY topology mutation:
    adds, connects, removals, symbol cleanups, merges."""
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 2)))
    s1 = tn.einsum_str
    b = tn.add_dense_node(np.ones((2, 2)))
    s2 = tn.einsum_str
    assert s1 != s2
    tn.connect_nodes(a, b, 1, 0)
    s3 = tn.einsum_str
    assert s3 != s2
    bond = next(e for e in tn.edges() if not e.dangler)
    tn.remove_edge(bond)
    s4 = tn.einsum_str
    assert s4 != s3
    hub = tn.add_copy_node(2, edge_symbols="z")
    tn.connect_nodes(hub, a, 0, 1)
    s5 = tn.einsum_str
    assert s5 != s4
    # contraction value tracks the live topology
    v = np.asarray(tn.contract(backend="numpy"))
    assert v.shape == (2, 2, 2, 2)


def test_failed_connect_leaves_tn_intact():
    """A rejected connect_nodes must not consume danglers or corrupt the
    graph: validation happens before any mutation (regression for a bug
    where a dim-mismatch connect dropped the danglers first, making every
    later contract() raise KeyError)."""
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 3)))
    b = tn.add_dense_node(np.ones((4,)))
    with pytest.raises(TNError, match="Incompatible dimensions"):
        tn.connect_nodes(a, b, 1, 0)
    with pytest.raises(TNError, match="No node named"):
        tn.connect_nodes("ghost", b, 0, 0)
    other = TN()
    foreign = other.add_dense_node(np.ones((4,)))
    with pytest.raises(TNError, match="does not belong"):
        tn.connect_nodes(foreign, b, 0, 0)
    # all modes still dangling, symbols untouched, contraction works
    assert sum(x.dangler for x in tn.nodes(danglers=True)) == 3
    out = np.asarray(tn.contract(backend="numpy"))
    assert out.shape == (2, 3, 4)
