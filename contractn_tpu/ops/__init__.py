from .stabilize import MIN_NORM, dot_precision, stabilize, destabilize
from .chain import (
    stabilized_chain_product,
    stabilized_hadamard_product,
    tree_chain_product,
)
from .scan import mps_evaluate, mps_norm, scan_matrix_chain

__all__ = [
    "MIN_NORM",
    "dot_precision",
    "stabilize",
    "destabilize",
    "stabilized_chain_product",
    "stabilized_hadamard_product",
    "tree_chain_product",
    "mps_evaluate",
    "mps_norm",
    "scan_matrix_chain",
]
