from .errors import (
    TNError,
    attribute_error_for,
    check_valid_tensor,
)

__all__ = ["TNError", "attribute_error_for", "check_valid_tensor"]
