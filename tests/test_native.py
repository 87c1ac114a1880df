"""Native C++ greedy path optimizer: build, path validity, engine hook."""

import time

import numpy as np
import pytest

from contractn_tpu import TN, contract
from contractn_tpu.native import greedy_path, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def test_simple_chain_path():
    terms = ["ab", "bc", "cd"]
    path = greedy_path(terms, "ad", {s: 8 for s in "abcd"})
    assert len(path) == 2
    # A valid pairwise path: simulate list shrinking
    n = len(terms)
    for i, j in path:
        assert 0 <= i < j < n
        n -= 1
    assert n == 1


def test_path_values_match_engine():
    """Contract with the native path: values equal the auto-path result."""
    rng = np.random.default_rng(0)
    # a small nontrivial network: 2x3 grid (6 tensors)
    from contractn_tpu.models.peps import peps_tn

    tn, _ = peps_tn(2, 3, bond_dim=3, rng=rng)
    auto = np.asarray(tn.contract(backend="numpy"))
    native = np.asarray(tn.contract(backend="numpy", optimize="native-greedy"))
    assert np.allclose(auto, native, rtol=1e-10)


def test_native_greedy_on_jax_path():
    rng = np.random.default_rng(1)
    mats = [rng.standard_normal((4, 4)) for _ in range(6)]
    einstr = "ab,bc,cd,de,ef,fg->ag"
    out1 = np.asarray(contract(einstr, *mats))
    out2 = np.asarray(contract(einstr, *mats, optimize="native-greedy"))
    assert np.allclose(out1, out2, rtol=1e-10)


def test_native_handles_hyperedges_and_disconnected():
    rng = np.random.default_rng(2)
    # hyperedge 'a' shared across three terms + a disconnected factor
    a, b, c = (rng.standard_normal((3, 4)) for _ in range(3))
    d = rng.standard_normal((2,))
    einstr = "ax,ay,az,w->xyzw"
    out1 = contract(einstr, a, b, c, d, backend="numpy")
    out2 = contract(einstr, a, b, c, d, backend="numpy",
                    optimize="native-greedy")
    assert np.allclose(out1, out2, rtol=1e-10)


def test_native_path_quality_long_chain():
    """The greedy path on a 200-link chain must be linear-cost (no blowup),
    and native pathfinding should be fast."""
    terms = []
    syms = []
    import opt_einsum as oe

    for i in range(201):
        syms.append(oe.get_symbol(i))
    terms = [syms[0]] + [syms[i] + syms[i + 1] for i in range(200)]
    dims = {s: 32 for s in set("".join(terms))}
    t0 = time.perf_counter()
    path = greedy_path(terms, syms[-1], dims)
    elapsed = time.perf_counter() - t0
    assert len(path) == 200
    assert elapsed < 0.5  # native pathfinding is sub-ms-to-ms scale

    # Validate cost: simulate and bound the largest intermediate
    live = [set(t) for t in terms]
    out = {syms[-1]}
    largest = 0
    for i, j in path:
        a, b = live[i], live[j]
        rest = [t for k, t in enumerate(live) if k not in (i, j)]
        keep = set()
        for s in a | b:
            if s in out or any(s in t for t in rest):
                keep.add(s)
        largest = max(largest, 32 ** len(keep))
        live = rest + [keep]
    assert largest <= 32 ** 2  # never beyond a matrix: linear-cost path
