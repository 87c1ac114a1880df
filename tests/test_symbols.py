"""Symbol allocator unit tests (reference semantics: gap reuse, >52 symbols)."""

import pytest
from opt_einsum import get_symbol

from contractn_tpu.symbols import allocate_symbols, symbol_index, check_symbol


def test_roundtrip_base_and_unicode():
    for i in [0, 1, 25, 26, 51, 52, 100, 500]:
        assert symbol_index(get_symbol(i)) == i


def test_allocation_from_empty():
    assert allocate_symbols(set(), 3) == ("a", "b", "c")
    assert allocate_symbols(set(), 0) == ()


def test_gap_reuse_before_extension():
    # 'b' freed: the gap at index 1 is reused before extending past 'c'
    assert allocate_symbols({"a", "c"}, 1) == ("b",)
    assert allocate_symbols({"a", "c"}, 3) == ("b", "d", "e")


def test_extension_past_52():
    used = {get_symbol(i) for i in range(52)}
    new = allocate_symbols(used, 2)
    assert new == (get_symbol(52), get_symbol(53))


def test_invalid_symbols_rejected():
    with pytest.raises(TypeError):
        check_symbol("ab")
    with pytest.raises(TypeError):
        check_symbol(3)


# ---------------------------------------------------------------------- #
# Differential test: the TN's incremental heap allocator must match the
# reference-parity O(n) allocator above on random alloc/free histories.
# allocate_symbols is the ORACLE here — the TN uses the O(log n) heap
# (network.py) whose gap-reuse order this pins.
# ---------------------------------------------------------------------- #


def test_heap_allocator_matches_reference_oracle():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from contractn_tpu import TN
    from contractn_tpu.symbols import allocate_symbols

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                    max_size=25))
    def run(ops):
        tn = TN()
        nodes = []
        for op in ops:
            if op <= 3:  # add a node of order op (0..3)
                expected = allocate_symbols(tn.edge_symbols, op)
                node = tn.add_dense_node(np.zeros((2,) * op))
                assert node.edge_symbols == expected
                nodes.append(node)
            else:  # connect the first two dangling modes, if any exist
                free = [
                    (n, i) for n in nodes
                    for i in range(n.ndim) if n[i].dangler
                ]
                if len(free) >= 2 and free[0][0] is not free[1][0]:
                    (n1, i1), (n2, i2) = free[0], free[1]
                    tn.connect_nodes(n1, n2, i1, i2)

    run()
