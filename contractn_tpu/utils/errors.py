"""Error types and validation helpers.

The reference signals most misuse with bare ``assert`` statements
(``/root/reference/contractn/utils.py:84-116``); here every user-facing
failure raises a real exception with an actionable message.
"""


class TNError(ValueError):
    """Base class for tensor-network construction/contraction errors."""


_FULL_NODE_NAMES = {
    "dense": "dense",
    "clone": "duplicate",
    "hyper": "copy",
    "input": "input",
    "dangler": "dangling",
}


def attribute_error_for(node_type: str, attr_name: str, node_name, actual_type):
    """Error for accessing a node-type-specific attribute on the wrong type.

    Parity with ``node_specific_attr_error`` (reference ``utils.py:84-92``).
    """
    full = _FULL_NODE_NAMES.get(node_type, node_type)
    return TNError(
        f"Only {full} nodes have {attr_name} attributes "
        f"(node '{node_name}' has node type '{actual_type}')"
    )


def check_valid_tensor(tensor) -> None:
    """Duck-typed tensor check: anything with ``.ndim`` and ``.shape`` works.

    Mirrors the reference's backend-agnostic acceptance of numpy / jax / torch
    arrays (``utils.py:7-12``).
    """
    if not (hasattr(tensor, "ndim") and hasattr(tensor, "shape")):
        raise TypeError(
            "Core tensors must expose .ndim and .shape attributes "
            f"(got object of type {type(tensor).__name__})"
        )
