"""Einsum index-symbol allocation.

Every edge of a tensor network carries a single-character einsum symbol.  The
first 52 symbols are ``a..zA..Z``; beyond that we follow ``opt_einsum``'s
unicode extension (``opt_einsum.get_symbol``) so arbitrarily large networks can
be labeled.

Allocation policy (behavioral parity with the reference allocator,
``/root/reference/contractn/utils.py:44-81``): freed symbol indices ("gaps"
below the current maximum index) are reused before the symbol range is
extended.  This gap-reuse rule is load-bearing for producing the exact einsum
strings documented in the reference README (e.g. ``"abc,ae,bf,cg->efg"`` for
the Tucker example).
"""

from functools import lru_cache
from typing import Iterable, Tuple

from opt_einsum import get_symbol

_BASE_SYMBOLS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_BASE_INDEX = {s: i for i, s in enumerate(_BASE_SYMBOLS)}


def is_valid_symbol(symbol) -> bool:
    """A symbol is any single-character string."""
    return isinstance(symbol, str) and len(symbol) == 1


def check_symbol(symbol) -> None:
    if not is_valid_symbol(symbol):
        raise TypeError(
            f"Edge symbols must be single-character strings, got {symbol!r}"
        )


@lru_cache(maxsize=None)
def symbol_index(symbol: str) -> int:
    """Numeric index of a symbol; inverse of ``opt_einsum.get_symbol``.

    Mirrors ``/root/reference/contractn/utils.py:66-81``.
    """
    check_symbol(symbol)
    if symbol in _BASE_INDEX:
        return _BASE_INDEX[symbol]
    idx = ord(symbol) - 140
    if idx < 52 or get_symbol(idx) != symbol:
        raise ValueError(f"{symbol!r} is not a valid einsum symbol")
    return idx


def allocate_symbols(used_symbols: Iterable[str], num_new: int) -> Tuple[str, ...]:
    """Return ``num_new`` fresh symbols not present in ``used_symbols``.

    Gap indices below the current maximum used index are consumed first (in
    increasing order), then the range is extended past the maximum.  Matches
    the reference's ``get_new_symbols`` (``utils.py:44-63``) so that generated
    einsum strings agree byte-for-byte with the reference on its documented
    examples.
    """
    used_idxs = {symbol_index(s) for s in used_symbols}
    if num_new == 0:
        return ()
    max_idx = max(used_idxs) if used_idxs else -1
    gaps = [i for i in range(max_idx) if i not in used_idxs]
    new_idxs = gaps[:num_new]
    if len(new_idxs) < num_new:
        need = num_new - len(new_idxs)
        new_idxs.extend(range(max_idx + 1, max_idx + 1 + need))
    return tuple(get_symbol(i) for i in new_idxs)
