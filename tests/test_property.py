"""Hypothesis property tests over random graph-construction histories.

The reference's suite is hypothesis-driven (``tests/test_ctn.py``,
``tests/test_nodes.py``); this file extends that style to randomized
build/connect/remove histories and checks global invariants after every
operation — including the copy-cluster symbol invariant the reference never
enforced through bonds (defect family D4).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from contractn_tpu import TN


def check_invariants(tn):
    # symbol bookkeeping matches the actual edge registry
    from collections import Counter

    actual = Counter(e.symbol for e in tn.edges(as_iter=True))
    assert actual == tn._symbol_counts
    # every non-dangler node: edge list consistent, index inverse holds
    # (for self-loop/trace edges both modes share one edge id, so index()
    # is inherently multivalued — the weak inverse is the invariant there)
    for node in tn.nodes(as_iter=True):
        assert len(node.edge_names) == node.ndim
        for i in range(node.ndim):
            edge = node[i]
            j = node.index(edge)
            assert node[j] is edge
            if node.edge_names.count(edge.name) == 1:
                assert j == i
    # copy clusters present one symbol on every incident edge
    seen = set()
    for node in tn.nodes(as_iter=True):
        if not node.is_copy or node.name in seen:
            continue
        cluster = tn._copy_cluster(node.name)
        seen |= cluster
        symbols = set()
        for n in cluster:
            for eid in tn._incident[n]:
                symbols.add(tn._edges[eid].symbol)
        assert len(symbols) == 1, f"copy cluster carries {symbols}"
    # dangler count == number of dangling edges
    danglers = [n for n in tn._nodes.values() if n.dangler]
    dangling_edges = [e for e in tn.edges(as_iter=True) if e.dangler]
    assert len(danglers) == len(dangling_edges)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 2 ** 31 - 1), min_size=1, max_size=25))
def test_random_histories(seeds):
    """Apply a random op sequence; invariants hold after every step."""
    tn = TN()
    nodes = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        op = rng.integers(0, 5)
        if op == 0 or not nodes:  # add dense
            order = int(rng.integers(1, 4))
            nodes.append(tn.add_dense_node(np.ones((2,) * order)))
        elif op == 1:  # add copy
            nodes.append(tn.add_copy_node(int(rng.integers(1, 4)), dim=2))
        elif op == 2:  # add clone of a random dense node
            dense = [n for n in nodes if n.node_type == "dense"]
            if dense:
                nodes.append(
                    tn.add_duplicate_node(dense[rng.integers(len(dense))])
                )
        elif op == 3:  # connect two random dangling modes
            open_modes = []
            for n in nodes:
                for i in range(n.ndim):
                    if n[i].dangler:
                        open_modes.append((n, i))
            if len(open_modes) >= 2:
                k1, k2 = rng.choice(len(open_modes), 2, replace=False)
                (n1, i1), (n2, i2) = open_modes[k1], open_modes[k2]
                if n1[i1] is not n2[i2]:
                    tn.connect_nodes(n1, n2, i1, i2)
        elif op == 4:  # remove a random bond
            bonds = [e for e in tn.edges(as_iter=True) if not e.dangler]
            if bonds:
                tn.remove_edge(bonds[rng.integers(len(bonds))])
        check_invariants(tn)

    # the einsum string is always well-formed
    es = tn.einsum_str
    lhs = es.split("->")[0]
    n_terms = len(lhs.split(",")) if lhs else 0
    expected_terms = sum(
        1 for n in tn.nodes(as_iter=True) if not n.is_copy
    )
    assert n_terms == expected_terms


@settings(max_examples=15, deadline=None)
@given(st.integers(2, 5), st.integers(1, 3))
def test_copy_cluster_merge(n_hubs, extra_links):
    """Connecting copy nodes into one cluster collapses to ONE symbol."""
    tn = TN()
    hubs = [tn.add_copy_node(3, dim=2) for _ in range(n_hubs)]
    for i in range(n_hubs - 1):
        tn.connect_nodes(hubs[i], hubs[i + 1], 2, 0)
    assert len(tn.edge_symbols) == 1
    # attach some dense nodes: still one symbol everywhere
    for k in range(extra_links):
        hub = hubs[k % n_hubs]
        free = next(
            (i for i in range(hub.ndim) if hub[i].dangler), None
        )
        if free is None:
            continue
        vec = tn.add_dense_node(np.ones(2))
        tn.connect_nodes(hub, vec, free, 0)
    assert len(tn.edge_symbols) == 1
    check_invariants(tn)
