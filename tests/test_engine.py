"""Contraction engine tests: values, split format, fast paths, autodiff.

Numerical strategy (SURVEY.md §4): the reference's multi-backend matrix
collapses to {numpy oracle, jax-cpu-x64}; every jax result is checked against
the eager numpy oracle (same step sequence) and/or a closed form.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu import TN, TNError, contract
from contractn_tpu.compiler.engine import _detect_chain, _detect_hadamard


def build_mps(bond_dims, input_dims, fill=np.ones):
    """All-`fill` MPS chain TN with given bond/input dims."""
    tn = TN()
    n = len(input_dims)
    tn.add_dense_node(fill((input_dims[0], bond_dims[0])))
    for i in range(1, n - 1):
        tn.add_dense_node(fill((input_dims[i], bond_dims[i - 1], bond_dims[i])))
    tn.add_dense_node(fill((input_dims[-1], bond_dims[-1])))
    nodes = tn.nodes()
    for i in range(n - 1):
        tn.connect_nodes(nodes[i], nodes[i + 1], -1, -2 if i != n - 2 else -1)
    return tn


@pytest.mark.parametrize("split_format", [False, True])
@pytest.mark.parametrize(
    "bond_dims,input_dims",
    [
        ((1,), (1, 2)),
        ((3, 2), (2, 1, 3)),
        ((5, 2, 4, 3), (2, 3, 1, 2, 2)),
    ],
)
def test_contract_mps_closed_form(split_format, bond_dims, input_dims):
    """All-ones MPS: log of contraction equals sum of log bond dims
    (the reference's only numerical test, ``test_einsum.py:28-64``)."""
    tn = build_mps(bond_dims, input_dims)
    out = tn.contract(split_format=split_format)
    if split_format:
        log_value = jnp.log(out[0]) + out[1]
    else:
        log_value = jnp.log(out)
    assert log_value.shape == tuple(input_dims)
    correct = sum(math.log(bd) for bd in bond_dims)
    assert np.allclose(np.asarray(log_value), correct, atol=1e-10)


def test_jax_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    tn = build_mps((3, 2), (2, 2, 2), fill=lambda s: rng.standard_normal(s))
    jax_out = np.asarray(tn.contract())
    np_out = tn.contract(backend="numpy")
    assert np.allclose(jax_out, np_out, rtol=1e-10)


def test_split_format_identity():
    rng = np.random.default_rng(1)
    tn = build_mps((2, 3), (2, 1, 2), fill=lambda s: rng.standard_normal(s))
    plain = np.asarray(tn.contract())
    mant, log = tn.contract(split_format=True)
    assert np.allclose(np.asarray(mant) * np.exp(float(log)), plain, rtol=1e-10)
    # Split-format invariant: mean |mantissa| == 1
    assert np.isclose(np.mean(np.abs(np.asarray(mant))), 1.0, rtol=1e-10)


def test_clone_contraction_weight_sharing():
    """Clones contract using the base node's tensor (reference defect D1)."""
    tn = TN()
    base = tn.add_dense_node(np.array([[1.0, 2.0], [3.0, 4.0]]))
    clone = tn.add_duplicate_node(base)
    tn.connect_nodes(base, clone, 1, 0)
    out = np.asarray(tn.contract())
    expect = np.array([[1.0, 2.0], [3.0, 4.0]]) @ np.array([[1.0, 2.0], [3.0, 4.0]])
    assert np.allclose(out, expect, rtol=1e-10)
    # Only ONE parameter backs both operands
    assert len(tn.params) == 1


def test_input_node_contraction():
    """Inputs supplied at contract time (gap in the reference's tests)."""
    tn = TN()
    w = tn.add_dense_node(np.arange(6.0).reshape(2, 3))
    x = tn.add_input_node((3,))
    tn.connect_nodes(w, x, 1, 0)
    out = np.asarray(tn.contract(inputs=(np.array([1.0, 0.0, 1.0]),)))
    assert np.allclose(out, np.array([0 + 2, 3 + 5]), rtol=1e-12)


def test_input_node_variable_axis():
    tn = TN()
    w = tn.add_dense_node(np.ones((4, 3)))
    x = tn.add_input_node((-1, 4), var_shape_axes=(0,))
    tn.connect_nodes(w, x, 0, 1)
    fun = tn.make_contract_fun()
    # Output order follows dangler creation: w's free mode, then x's batch
    for batch in (2, 5):
        out = fun(tn.params, (np.ones((batch, 4)),))
        assert out.shape == (3, batch)
        assert np.allclose(np.asarray(out), 4.0)


def test_copy_hub_cp_value():
    """Copy-tensor hub: CP contraction equals explicit diagonal numpy sum."""
    rng = np.random.default_rng(2)
    mats = [rng.standard_normal((4, 5)) for _ in range(3)]
    cp = TN()
    hub = cp.add_copy_node(3)
    for i, m in enumerate(mats):
        node = cp.add_dense_node(m)
        cp.connect_nodes(hub, node, i, 0)
    out = np.asarray(cp.contract())
    expect = np.einsum("ac,ad,ae->cde", *mats)
    assert np.allclose(out, expect, rtol=1e-10)


def test_repeated_output_diagonal():
    """Copy node with 2 dangling edges -> diagonal embedding (defect D3:
    the reference raises ValueError here)."""
    tn = TN()
    hub = tn.add_copy_node(3)
    vec = tn.add_dense_node(np.array([2.0, 3.0, 5.0]))
    tn.connect_nodes(hub, vec, 0, 0)
    assert tn.einsum_str == "a->aa"
    out = np.asarray(tn.contract())
    assert np.allclose(out, np.diag([2.0, 3.0, 5.0]), rtol=1e-12)


def test_repeated_output_via_contract_fn():
    out = contract("ab->abb", np.arange(6.0).reshape(2, 3))
    expect = np.zeros((2, 3, 3))
    for i in range(2):
        for j in range(3):
            expect[i, j, j] = i * 3 + j
    assert np.allclose(np.asarray(out), expect, rtol=1e-12)


def test_chain_fast_path_detection_and_parity():
    n = 24
    einstr_terms = ["a"]
    sym = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    for i in range(n):
        einstr_terms.append(sym[i] + sym[i + 1])
    einstr = ",".join(einstr_terms) + "->" + sym[n]
    shapes = tuple([(3,)] + [(3, 3)] * n)
    assert _detect_chain(einstr, shapes) == (n, True, False)

    rng = np.random.default_rng(3)
    vec = rng.standard_normal(3)
    mats = [rng.standard_normal((3, 3)) * 0.5 for _ in range(n)]
    fast = np.asarray(contract(einstr, vec, *mats))
    # Force the general path with an explicit contraction path
    path = [(0, 1)] * n
    slow = contract(einstr, vec, *mats, optimize=path, backend="numpy")
    assert np.allclose(fast, slow, rtol=1e-9)


def test_hadamard_fast_path_detection_and_parity():
    einstr = ",".join(["a"] * 8) + "->a"
    shapes = tuple([(4,)] * 8)
    assert _detect_hadamard(einstr, shapes) is False  # not summed
    rng = np.random.default_rng(4)
    vecs = [rng.standard_normal(4) for _ in range(8)]
    out = np.asarray(contract(einstr, *vecs))
    assert np.allclose(out, np.prod(np.stack(vecs), axis=0), rtol=1e-10)


def test_ring_fast_path_trace():
    """Cyclic matrix product (trace) reroutes to the stabilized ring tree."""
    import opt_einsum as oe
    from contractn_tpu.compiler.engine import _detect_ring

    n = 24
    syms = [oe.get_symbol(i) for i in range(n)]
    terms = [syms[i] + syms[(i + 1) % n] for i in range(n)]
    einstr = ",".join(terms) + "->"
    rng = np.random.default_rng(13)
    mats = [rng.standard_normal((4, 4)) * 0.5 for _ in range(n)]
    shapes = tuple(m.shape for m in mats)
    assert _detect_ring(einstr, shapes)
    fast = float(np.asarray(contract(einstr, *mats)))
    acc = np.eye(4)
    for m in mats:
        acc = acc @ m
    assert np.isclose(fast, np.trace(acc), rtol=1e-10)
    mant, log = contract(einstr, *mats, split_format=True)
    assert np.isclose(
        float(mant) * np.exp(float(log)), np.trace(acc), rtol=1e-10
    )


# The reference documents 9 strategies (/root/reference/contractn/ctn.py:
# 362-367) plus explicit paths; all pass through to opt_einsum, plus this
# framework's additive "native-greedy" (C++ optimizer).  Every strategy
# must produce oracle-identical VALUES (paths change cost, never results).
ALL_STRATEGIES = [
    "auto", "auto-hq", "optimal", "dp", "greedy", "random-greedy",
    "random-greedy-128", "branch-all", "branch-2", "native-greedy",
]


@pytest.mark.parametrize("strategy", ALL_STRATEGIES)
def test_optimize_strategies(strategy):
    # Mixed-rank network (not a pure chain) so strategies pick real paths
    rng = np.random.default_rng(14)
    t3 = rng.standard_normal((3, 4, 5))
    m1 = rng.standard_normal((3, 6))
    m2 = rng.standard_normal((4, 6))
    m3 = rng.standard_normal((5, 2))
    v = rng.standard_normal((2,))
    einstr = "abc,ax,bx,cy,y->"
    out = np.asarray(
        contract(einstr, t3, m1, m2, m3, v, optimize=strategy)
    )
    ref = contract(einstr, t3, m1, m2, m3, v, backend="numpy")
    assert np.allclose(out, ref, rtol=1e-10)


def test_native_greedy_path_quality():
    """The C++ greedy optimizer's path cost must be within a small factor
    of opt_einsum's greedy on a random 3-regular graph."""
    from contractn_tpu.models.decompositions import random_regular_tn
    from contractn_tpu.native import native_available
    from contractn_tpu.utils.introspect import contraction_info

    if not native_available():
        pytest.skip("no C++ toolchain in this environment")
    rng = np.random.default_rng(5)
    tn, _ = random_regular_tn(12, 3, 4, rng=rng)
    oe_cost = contraction_info(tn, optimize="greedy").flops
    native_cost = contraction_info(tn, optimize="native-greedy").flops
    assert native_cost <= 4.0 * oe_cost
    # and the value is still exact
    a = np.asarray(tn.contract(optimize="native-greedy"))
    b = np.asarray(tn.contract(backend="numpy"))
    assert np.allclose(a, b, rtol=1e-10)


def test_long_product_overflow_resistance():
    """1000 factors of 10: plain overflows f64? No — split format is exact."""
    vecs = [np.full((2,), 10.0) for _ in range(500)]
    einstr = ",".join(["a"] * 500) + "->a"
    mant, log = contract(einstr, *vecs, split_format=True)
    assert np.allclose(np.asarray(mant), 1.0, rtol=1e-10)
    assert np.isclose(float(log), 500 * math.log(10.0), rtol=1e-12)


def test_gradient_through_contraction():
    """Contraction is differentiable (upgrade over the reference)."""
    tn = build_mps((2,), (2, 2))
    fun = tn.make_contract_fun(split_format=True)

    def loss(params):
        mant, log = fun(params, ())
        return log + jnp.log(jnp.sum(jnp.abs(mant)))

    params = tuple(jnp.asarray(p) for p in tn.params)
    grads = jax.grad(loss)(params)
    assert all(g.shape == p.shape for g, p in zip(grads, params))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_vmap_over_params():
    """One compiled path serves a batch of parameter sets."""
    tn = build_mps((3,), (2, 2))
    fun = tn.make_contract_fun(split_format=True)
    batch = 5
    rng = np.random.default_rng(5)
    stacked = tuple(
        jnp.asarray(rng.standard_normal((batch,) + p.shape)) for p in tn.params
    )
    mant, log = jax.vmap(lambda *ps: fun(ps, ()))(*stacked)
    assert mant.shape == (batch, 2, 2)
    assert log.shape == (batch,)
    for b in range(batch):
        single = np.einsum("ia,ja->ij", *[np.asarray(p[b]) for p in stacked])
        assert np.allclose(
            np.asarray(mant[b]) * np.exp(float(log[b])), single, rtol=1e-8
        )


def test_contract_kwargs_validation():
    with pytest.raises(TypeError):
        contract("a,a->a", np.ones(2), np.ones(2), bogus_kwarg=1)
    with pytest.raises(Exception):
        contract("a,b->ab", np.ones(2))  # operand count mismatch
    with pytest.raises(Exception):
        contract("a->ab", np.ones(2))  # output index with unknown dim


def test_all_node_types_integration():
    """dense + clone + copy + input in one contraction, vs a numpy oracle.

    Layout: a copy hub fans a shared index into a dense matrix and its
    clone; each matrix contracts a separate runtime input. The result is
    the elementwise product of the two matrix-vector products — exercising
    weight sharing, hyperedge fusion, and input packing together.
    """
    rng = np.random.default_rng(21)
    w = rng.standard_normal((2, 3))
    v1, v2 = rng.standard_normal(3), rng.standard_normal(3)

    tn = TN()
    a = tn.add_dense_node(w, name="w")
    b = tn.add_duplicate_node("w", name="w2")
    hub = tn.add_copy_node(3, dim=2, name="hub")
    i1 = tn.add_input_node((3,), name="in1")
    i2 = tn.add_input_node((3,), name="in2")
    tn.connect_nodes(a, hub, 0, 0)
    tn.connect_nodes(b, hub, 0, 1)
    tn.connect_nodes(a, i1, 1, 0)
    tn.connect_nodes(b, i2, 1, 0)
    assert tn.num_dense == 1 and tn.num_duplicate == 1
    assert tn.num_copy == 1 and tn.num_input == 2

    out = np.asarray(tn.contract(inputs=(v1, v2)))
    oracle = (w @ v1) * (w @ v2)  # shared hub index = elementwise product
    assert np.allclose(out, oracle, rtol=1e-10)
    # numpy oracle path agrees too
    out_np = tn.contract(inputs=(v1, v2), backend="numpy")
    assert np.allclose(out_np, oracle, rtol=1e-12)
    # gradients flow into the single shared parameter
    import jax

    fun = tn.make_contract_fun(split_format=True)

    def loss(params):
        mant, log = fun(params, (v1, v2))
        return jnp.sum(mant) + log

    grads = jax.grad(loss)(tuple(jnp.asarray(p) for p in tn.params))
    assert len(grads) == 1 and grads[0].shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(grads[0])))


def test_complex_operands():
    """Complex tensors flow through contraction and split format (the
    mantissa stays complex, the log register is real)."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 2)) + 1j * rng.standard_normal((4, 2))
    out = np.asarray(contract("ab,bc->ac", a, b))
    assert np.allclose(out, a @ b, rtol=1e-12)
    mant, log = contract("ab,bc->ac", a, b, split_format=True)
    assert np.iscomplexobj(np.asarray(mant))
    assert not np.iscomplexobj(np.asarray(log))
    assert np.allclose(
        np.asarray(mant) * np.exp(np.asarray(log)), a @ b, rtol=1e-12
    )


def test_complex_chain_fast_path():
    rng = np.random.default_rng(12)
    tn = TN()
    prev = tn.add_dense_node(np.ones(3) + 0.5j * np.ones(3))
    for _ in range(30):
        mat = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        node = tn.add_dense_node(mat)
        tn.connect_nodes(prev, node, -1, 0)
        prev = node
    v1 = np.asarray(tn.contract())
    v2 = tn.contract(backend="numpy")
    assert np.allclose(v1, v2, rtol=1e-10)


def test_contract_dtype_and_nojit():
    tn = build_mps((2,), (2, 2))
    out64 = tn.contract(dtype=np.float64)
    assert np.asarray(out64).dtype == np.float64
    out_eager = tn.contract(jit=False)
    assert np.allclose(np.asarray(out_eager), np.asarray(out64), rtol=1e-6)


def test_contract_memory_limit_respected():
    """memory_limit reaches the path optimizer (bounds intermediates)."""
    rng = np.random.default_rng(7)
    mats = [rng.standard_normal((4, 4)) for _ in range(5)]
    einstr = "ab,bc,cd,de,ef->af"
    out = contract(einstr, *mats, memory_limit=16, backend="numpy")
    ref = contract(einstr, *mats, backend="numpy")
    assert np.allclose(out, ref, rtol=1e-10)


def test_torch_tensor_operands():
    """Torch CPU tensors are accepted as operands (migration parity with
    the reference's multi-backend support)."""
    torch = pytest.importorskip("torch")
    tn = TN()
    a = tn.add_dense_node(torch.ones((2, 3), dtype=torch.float64))
    b = tn.add_dense_node(torch.full((3,), 2.0, dtype=torch.float64))
    tn.connect_nodes(a, b, 1, 0)
    out = np.asarray(tn.contract())
    assert np.allclose(out, [6.0, 6.0], rtol=1e-12)


def test_torch_backend_round_trip():
    """backend='torch' computes via XLA and returns torch tensors,
    including requires_grad operands (which now stay connected to the
    torch graph — compiler/interop.py) and split format pairs."""
    torch = pytest.importorskip("torch")
    tn = TN()
    a = tn.add_dense_node(
        torch.ones((2, 3), dtype=torch.float64, requires_grad=True)
    )
    b = tn.add_dense_node(torch.full((3,), 2.0, dtype=torch.float64))
    tn.connect_nodes(a, b, 1, 0)
    out = tn.contract(backend="torch")
    assert isinstance(out, torch.Tensor)
    # native autograd: the result participates in the torch graph
    assert out.requires_grad
    assert np.allclose(out.detach().numpy(), [6.0, 6.0], rtol=1e-12)
    m, log = tn.contract(backend="torch", split_format=True)
    assert isinstance(m, torch.Tensor) and isinstance(log, torch.Tensor)
    assert np.allclose(
        m.detach().numpy() * np.exp(log.detach().numpy()),
        [6.0, 6.0], rtol=1e-12,
    )


def test_tensorflow_backend_gated():
    """backend='tensorflow' works when TF is installed, raises an
    actionable TNError otherwise (TF is not in this image)."""
    tn = TN()
    a = tn.add_dense_node(np.ones((2, 2)))
    b = tn.add_dense_node(np.ones(2))
    tn.connect_nodes(a, b, 1, 0)
    try:
        import tensorflow  # noqa: F401
    except ImportError:
        with pytest.raises(TNError, match="tensorflow is not installed"):
            tn.contract(backend="tensorflow")
    else:
        out = tn.contract(backend="tensorflow")
        assert np.allclose(np.asarray(out), [2.0, 2.0], rtol=1e-12)


def test_self_loop_trace():
    """Connecting a node to itself is a partial trace (repeated in-term
    index); the engine lowers it through the diagonal semantics."""
    tn = TN()
    t = np.arange(8.0).reshape(2, 2, 2)
    node = tn.add_dense_node(t)
    tn.connect_nodes(node, node, 0, 1)
    out = np.asarray(tn.contract())
    assert np.allclose(out, np.einsum("aab->b", t), rtol=1e-12)


def test_unicode_symbols_beyond_52():
    """Networks with >52 edges use opt_einsum's unicode symbol range."""
    tn = TN()
    prev = tn.add_dense_node(np.full((2,), 1.0))
    for _ in range(30):
        mat = tn.add_dense_node(np.full((2, 2), 0.75))
        tn.connect_nodes(prev, mat, -1, 0)
        prev = mat
    # 30 mats x 2 symbols + vec exceeds 52 symbols during construction
    out_jax = np.asarray(tn.contract())
    out_np = tn.contract(backend="numpy")
    assert np.allclose(out_jax, out_np, rtol=1e-10)


def test_bucketed_lowering_plan_and_parity():
    """Long regular paths lower to batch/scan buckets with oracle parity."""
    import opt_einsum as oe

    from contractn_tpu.compiler.engine import _find_steps
    from contractn_tpu.compiler.lowering import plan_program

    rng = np.random.default_rng(3)
    n = 60
    mats = [rng.standard_normal((5, 5)) * 0.5 for _ in range(n)]
    terms = [oe.get_symbol(i) + oe.get_symbol(i + 1) for i in range(n)]
    einstr = ",".join(terms) + "->" + oe.get_symbol(0) + oe.get_symbol(n)
    shapes = tuple(m.shape for m in mats)

    steps = _find_steps(einstr, shapes, "greedy", None)
    plan, result_id = plan_program(steps, n, shapes)
    assert plan is not None
    kinds = [item["kind"] for item in plan]
    assert "batch" in kinds and "scan" in kinds
    # the plan collapses ~n steps into a handful of items
    assert len(plan) < 10

    ref_m, ref_l = contract(einstr, *mats, split_format=True,
                            backend="numpy", optimize="greedy")
    m, log = contract(einstr, *mats, split_format=True, optimize="greedy")
    assert np.allclose(np.asarray(m), ref_m, rtol=1e-10)
    assert np.isclose(float(log), float(ref_l), rtol=1e-12)


def test_bucketed_lowering_mixed_dims_parity():
    """Shape changes split buckets but never change values."""
    import opt_einsum as oe

    rng = np.random.default_rng(4)
    n = 48
    dims = [3 if (i // 12) % 2 == 0 else 5 for i in range(n + 1)]
    mats = [rng.standard_normal((dims[i], dims[i + 1])) * 0.5
            for i in range(n)]
    terms = [oe.get_symbol(i) + oe.get_symbol(i + 1) for i in range(n)]
    einstr = ",".join(terms) + "->" + oe.get_symbol(0) + oe.get_symbol(n)
    ref = contract(einstr, *mats, split_format=True, backend="numpy")
    got = contract(einstr, *mats, split_format=True)
    assert np.allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-10)
    assert np.isclose(float(got[1]), float(ref[1]), rtol=1e-12)


def test_bucketed_lowering_gradients_flow():
    """Buckets (gather + scan) must be differentiable end to end."""
    import jax
    import jax.numpy as jnp
    import opt_einsum as oe

    n = 24
    terms = [oe.get_symbol(i) + oe.get_symbol(i + 1) for i in range(n)]
    einstr = ",".join(terms) + "->" + oe.get_symbol(0) + oe.get_symbol(n)
    rng = np.random.default_rng(5)
    mats = [jnp.asarray(rng.standard_normal((3, 3)) * 0.5)
            for i in range(n)]

    def loss(m0):
        val, log = contract(einstr, m0, *mats[1:], split_format=True)
        return jnp.sum(val ** 2) + log

    g = jax.grad(loss)(mats[0])
    eps = 1e-6
    probe = np.zeros((3, 3))
    probe[1, 2] = 1.0
    num = (loss(mats[0] + eps * probe) - loss(mats[0] - eps * probe)) / (
        2 * eps
    )
    assert np.isclose(float(g[1, 2]), float(num), rtol=1e-4)


def test_step_with_more_than_52_indices():
    """A pairwise step with > 52 distinct indices must canonicalize
    through opt_einsum's unicode range (regression: the bucketing pass
    crashed on its 52-letter table)."""
    import opt_einsum as oe

    big = np.ones((2,) + (1,) * 53) * 0.5
    mat = np.ones((2, 3))
    terms = "".join(oe.get_symbol(i) for i in range(54))
    einstr = (terms + "," + oe.get_symbol(0) + oe.get_symbol(60)
              + "->" + oe.get_symbol(60))
    # closed form (the numpy oracle itself is capped: np.einsum only
    # accepts ascii subscripts, and raises a clean TNError)
    got = contract(einstr, big, mat)
    assert np.allclose(np.asarray(got), np.ones(3), rtol=1e-12)
    with pytest.raises(TNError, match="52"):
        contract(einstr, big, mat, backend="numpy")
