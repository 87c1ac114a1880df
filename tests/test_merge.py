"""TN.merge_nodes: pairwise graph-level contraction (coarse-graining)."""

import numpy as np
import pytest

from contractn_tpu import TN, TNError


def test_merge_simple_bond():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal((2, 3)), rng.standard_normal((3, 4))
    tn = TN()
    na = tn.add_dense_node(a)
    nb = tn.add_dense_node(b)
    tn.connect_nodes(na, nb, 1, 0)
    merged = tn.merge_nodes(na, nb)
    assert tn.num_cores == 1
    assert merged.shape == (2, 4)
    assert np.allclose(np.asarray(merged.tensor), a @ b, rtol=1e-12)
    # the merged TN still contracts (fully dangling -> identity)
    assert np.allclose(np.asarray(tn.contract()), a @ b, rtol=1e-10)


def test_merge_preserves_outer_bonds():
    """Merging the middle pair of a 4-chain keeps the network's value."""
    rng = np.random.default_rng(1)
    mats = [rng.standard_normal((3, 3)) for _ in range(4)]
    tn = TN()
    nodes = [tn.add_dense_node(m) for m in mats]
    for i in range(3):
        tn.connect_nodes(nodes[i], nodes[i + 1], 1, 0)
    before = tn.contract(backend="numpy")
    tn.merge_nodes(nodes[1], nodes[2])
    assert tn.num_cores == 3
    after = tn.contract(backend="numpy")
    assert np.allclose(before, after, rtol=1e-10)


def test_merge_parallel_edges_and_self_loops():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((3, 3, 2))
    b = rng.standard_normal((3, 3, 4))
    tn = TN()
    na = tn.add_dense_node(a)
    nb = tn.add_dense_node(b)
    tn.connect_nodes(na, nb, 0, 0)
    tn.connect_nodes(na, nb, 1, 1)  # parallel bond
    merged = tn.merge_nodes(na, nb)
    expect = np.einsum("ijp,ijq->pq", a, b)
    assert merged.shape == (2, 4)
    assert np.allclose(np.asarray(merged.tensor), expect, rtol=1e-12)


def test_merge_keeps_hyperedge_legs():
    """Indices shared only through a copy cluster are NOT contracted."""
    rng = np.random.default_rng(3)
    a, b = rng.standard_normal((2, 3)), rng.standard_normal((2, 4))
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    na = tn.add_dense_node(a)
    nb = tn.add_dense_node(b)
    tn.connect_nodes(hub, na, 0, 0)
    tn.connect_nodes(hub, nb, 1, 0)
    before = tn.contract(backend="numpy")  # shape (3, 4, 2)-ish
    merged = tn.merge_nodes(na, nb)
    # both hyperedge legs survive on the merged node
    assert merged.ndim == 4  # (2, 3, 2, 4): hub leg a, free a, hub leg b, free b
    after = tn.contract(backend="numpy")
    assert np.allclose(np.sort(np.asarray(before).ravel()),
                       np.sort(np.asarray(after).ravel()), rtol=1e-9)


def test_merge_validation():
    tn = TN()
    n = tn.add_dense_node(np.ones((2,)))
    hub = tn.add_copy_node(2, dim=2)
    with pytest.raises(TNError):
        tn.merge_nodes(n, n)
    with pytest.raises(TNError):
        tn.merge_nodes(n, hub)


def test_merge_rejects_clone_base():
    import pytest

    from contractn_tpu import TN
    from contractn_tpu.utils.errors import TNError

    tn = TN()
    a = tn.add_dense_node(np.eye(2))
    b = tn.add_dense_node(np.eye(2))
    tn.add_duplicate_node(a)
    tn.connect_nodes(a, b, 1, 0)
    with pytest.raises(TNError, match="base of clone"):
        tn.merge_nodes(a, b)


def test_merge_beyond_52_edges():
    """merge_nodes on a pair with > 52 combined modes (unicode symbols)."""
    from contractn_tpu import TN

    tn = TN()
    order = 30  # 60 total modes on the pair; dim-1 modes keep it tiny
    shape = (2,) + (1,) * (order - 1)
    a = tn.add_dense_node(np.full(shape, 2.0))
    b = tn.add_dense_node(np.full(shape, 3.0))
    tn.connect_nodes(a, b, 0, 0)
    merged = tn.merge_nodes(a, b)
    assert merged.ndim == 2 * order - 2
    # sum over the dim-2 bond: 2*3 + 2*3 = 12
    assert float(np.asarray(merged.tensor).reshape(-1)[0]) == 12.0
