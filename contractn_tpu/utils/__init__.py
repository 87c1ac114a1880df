from .cache_guard import CompileGuard, cache_guard
from .errors import (
    TNError,
    attribute_error_for,
    check_valid_tensor,
)

__all__ = [
    "CompileGuard",
    "cache_guard",
    "TNError",
    "attribute_error_for",
    "check_valid_tensor",
]
