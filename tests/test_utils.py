"""Introspection and checkpoint tests."""

import numpy as np
import pytest

from contractn_tpu import TN
from contractn_tpu.utils.checkpoint import save_tn, load_tn, tn_spec, tn_from_spec
from contractn_tpu.utils.introspect import compile_stats, Timings


def build_mixed_tn():
    tn = TN()
    a = tn.add_dense_node(np.arange(6.0).reshape(2, 3), name="a")
    b = tn.add_dense_node(np.ones((3, 4)), name="b")
    hub = tn.add_copy_node(3, dim=4, name="hub")
    c = tn.add_dense_node(np.full((4,), 2.0), name="c")
    clone = tn.add_duplicate_node("b", name="b2")
    tn.connect_nodes(a, b, 1, 0)
    tn.connect_nodes(b, hub, 1, 0)
    tn.connect_nodes(hub, c, 1, 0)
    tn.connect_nodes(hub, clone, 2, 1)
    return tn


def test_spec_roundtrip_einstring_and_value(tmp_path):
    tn = build_mixed_tn()
    spec = tn_spec(tn)
    tn2 = tn_from_spec(spec, tn.params)
    assert tn2.einsum_str == tn.einsum_str
    v1 = np.asarray(tn.contract(backend="numpy"))
    v2 = np.asarray(tn2.contract(backend="numpy"))
    assert np.allclose(v1, v2, rtol=1e-12)


def test_save_load_npz(tmp_path):
    tn = build_mixed_tn()
    path = tmp_path / "net.npz"
    save_tn(path, tn)
    tn2 = load_tn(path)
    assert tn2.einsum_str == tn.einsum_str
    assert tn2.num_dense == tn.num_dense
    assert tn2.num_copy == tn.num_copy
    assert tn2.num_duplicate == tn.num_duplicate
    v1 = np.asarray(tn.contract(backend="numpy"))
    v2 = np.asarray(tn2.contract(backend="numpy"))
    assert np.allclose(v1, v2, rtol=1e-12)


def test_tn_copy_independent():
    tn = build_mixed_tn()
    dup = tn.copy()
    assert dup.einsum_str == tn.einsum_str
    v1 = np.asarray(tn.contract(backend="numpy"))
    assert np.allclose(np.asarray(dup.contract(backend="numpy")), v1)
    # layout mutations don't leak back
    bond = [e for e in dup.edges() if not e.dangler][0]
    dup.remove_edge(bond)
    assert dup.einsum_str != tn.einsum_str
    assert np.allclose(np.asarray(tn.contract(backend="numpy")), v1)


def test_contraction_info():
    tn = build_mixed_tn()
    info = tn.contraction_info()
    assert info.einsum_str == tn.einsum_str
    assert info.flops > 0
    assert info.largest_intermediate >= 1
    assert len(info.path) >= 1
    assert "estimated FLOPs" in str(info)


def test_contraction_info_requires_input_shapes():
    tn = TN()
    w = tn.add_dense_node(np.ones((2, 3)))
    x = tn.add_input_node((3,))
    tn.connect_nodes(w, x, 1, 0)
    with pytest.raises(ValueError):
        tn.contraction_info()
    info = tn.contraction_info(inputs_shapes=[(3,)])
    assert info.flops > 0


def test_compile_stats():
    import jax.numpy as jnp

    compiled, stats = compile_stats(lambda a: jnp.sum(a * 2), np.ones((4, 4)))
    assert stats.compile_ms > 0
    assert stats.total_ms > 0
    assert float(compiled(np.ones((4, 4)))) == 32.0


def test_compiled_contraction_expression():
    tn = build_mixed_tn()
    expr = tn.compile(split_format=True)
    mant, log = expr()
    direct_m, direct_l = tn.contract(split_format=True)
    assert np.allclose(np.asarray(mant), np.asarray(direct_m), rtol=1e-12)
    assert np.isclose(float(log), float(direct_l), rtol=1e-12)
    assert expr.info().flops > 0
    stats = expr.measure_compile()
    assert stats.compile_ms > 0
    assert "CompiledContraction" in repr(expr)


def test_timings_registry():
    Timings.reset()
    Timings.enabled = True
    try:
        with Timings.measure("phase"):
            pass
        assert "phase" in Timings.report()
    finally:
        Timings.enabled = False
        Timings.reset()


def test_spec_roundtrip_self_loop(tmp_path):
    """Trace edges must record both mode positions — regression for the
    round-1 advisor's medium finding (TN.copy / save_tn crashed)."""
    import numpy as np

    from contractn_tpu import TN
    from contractn_tpu.utils.checkpoint import load_tn, save_tn

    tn = TN()
    t = np.random.default_rng(0).standard_normal((3, 2, 3))
    a = tn.add_dense_node(t)
    b = tn.add_dense_node(np.random.default_rng(1).standard_normal((2,)))
    tn.connect_nodes(a, a, 0, 2)  # self-loop (partial trace)
    tn.connect_nodes(a, b, 1, 0)
    expected = float(np.asarray(tn.contract(backend="numpy")))

    copied = tn.copy()
    assert np.isclose(
        float(np.asarray(copied.contract(backend="numpy"))), expected
    )
    path = tmp_path / "selfloop.npz"
    save_tn(path, tn)
    loaded = load_tn(path)
    assert loaded.einsum_str == tn.einsum_str
    assert np.isclose(
        float(np.asarray(loaded.contract(backend="numpy"))), expected
    )


def test_profile_trace_produces_artifacts(tmp_path):
    import numpy as np

    from contractn_tpu import TN
    from contractn_tpu.utils.introspect import profile_trace

    tn = TN()
    a = tn.add_dense_node(np.ones((4, 4)))
    b = tn.add_dense_node(np.ones(4))
    tn.connect_nodes(a, b, 1, 0)
    with profile_trace(tmp_path):
        tn.contract()
    import os

    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
             for f in fs]
    assert files, "profiler produced no trace files"


def test_compile_guard_clears_on_new_compiles():
    """CompileGuard.tick fires exactly when every_n NEW backend
    compiles accumulated (counted via jax's monitoring stream, which
    survives clear_caches — jit-cache miss counters do not)."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.utils import CompileGuard, cache_guard

    guard = CompileGuard(every_n=4)
    fired = []
    for i in range(10):
        jax.jit(lambda x, c=float(i): x * c)(jnp.ones((2 + i,)))
        fired.append(guard.tick())
    # each distinct shape triggers 1-2 backend compile events (jax adds
    # internal helper programs), so the guard fires every 2-4 ticks
    assert 1 <= guard.clears <= 6
    assert any(fired) and not all(fired)

    with cache_guard():
        jax.jit(lambda x: x + 1.0)(jnp.ones(3))
    with pytest.raises(ValueError):
        CompileGuard(every_n=0)


def test_many_compile_loop_survives_with_guard():
    """The documented jaxlib hazard workload shape — one process
    compiling hundreds of DISTINCT programs — survives with the guard
    in the loop (the round-3 segfault region starts near ~300 live
    complex executables; the guard keeps the live count bounded)."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.utils import CompileGuard

    guard = CompileGuard(every_n=100)
    acc = 0.0
    for i in range(330):
        f = jax.jit(lambda x, c=float(i % 7): jnp.sum(x) * c + i)
        acc += float(f(jnp.ones((1 + i % 13,))))
        guard.tick()
    assert np.isfinite(acc)
    assert guard.clears >= 2
