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
