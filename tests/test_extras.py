"""Feature maps, networkx export, standalone contract_expression."""

import numpy as np
import pytest

from contractn_tpu import TN, contract_expression
from contractn_tpu.models import one_hot, trig_features, fourier_features


def test_one_hot():
    x = np.array([[0, 1, 2], [2, 0, 1]])
    f = np.asarray(one_hot(x, 3))
    assert f.shape == (2, 3, 3)
    assert np.allclose(f.sum(-1), 1.0)
    assert f[0, 1, 1] == 1.0 and f[1, 0, 2] == 1.0


def test_trig_features_normalized():
    x = np.linspace(0, 1, 7).reshape(1, 7)
    f = np.asarray(trig_features(x))
    assert f.shape == (1, 7, 2)
    assert np.allclose((f ** 2).sum(-1), 1.0, atol=1e-6)


def test_fourier_features_shape():
    f = np.asarray(fourier_features(np.zeros((2, 5)), 4))
    assert f.shape == (2, 5, 4)


def test_to_networkx_roundtrip_attrs():
    nx = pytest.importorskip("networkx")
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    vec = tn.add_dense_node(np.ones(2))
    tn.connect_nodes(hub, vec, 0, 0)
    g = tn.to_networkx()
    assert isinstance(g, nx.MultiGraph)
    core_nodes = [n for n, t in g.nodes(data="node_type")
                  if t not in (None, "dangler")]
    assert len(core_nodes) == 2
    symbols = {d["symbol"] for _, _, d in g.edges(data=True)}
    assert symbols == tn.edge_symbols
    dims = [d["dim"] for _, _, d in g.edges(data=True)]
    assert 2 in dims


def test_contract_expression_reuse_and_validation():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal((3, 4)), rng.standard_normal((4, 5))
    expr = contract_expression("ab,bc->ac", (3, 4), (4, 5))
    out = np.asarray(expr(a, b))
    assert np.allclose(out, a @ b, rtol=1e-10)
    assert expr.einsum_str == "ab,bc->ac"
    with pytest.raises(ValueError):
        expr(a.T, b)


def test_to_dot_renders_all_types():
    import numpy as np

    from contractn_tpu import TN

    tn = TN()
    a = tn.add_dense_node(np.ones((2, 3)), name="core_a")
    tn.add_duplicate_node(a, name="twin")
    hub = tn.add_copy_node(3, dim=2, name="hub")
    tn.add_input_node((4,), name="feed")
    tn.connect_nodes(hub, a, 0, 0)
    dot = tn.to_dot()
    assert dot.startswith("graph TN {") and dot.endswith("}")
    for name in ("core_a", "twin", "hub", "feed"):
        assert f'"{name}"' in dot
    assert "shape=box" in dot and "shape=house" in dot
    assert "--" in dot  # at least the hub-core bond plus danglers
    # graphviz DOT must be parseable enough: balanced brackets per line
    assert dot.count("[") == dot.count("]")
