from .stabilize import MIN_NORM, dot_precision, stabilize, destabilize
from .chain import (
    stabilized_chain_product,
    stabilized_hadamard_product,
    tree_chain_product,
)
from .krylov import lanczos_basis, lanczos_ground, masked_tridiagonal
from .scan import (
    mps_evaluate,
    mps_evaluate_auto,
    mps_evaluate_fused,
    mps_evaluate_premix,
    mps_evaluate_perphys,
    mps_norm,
    scan_matrix_chain,
)

__all__ = [
    "MIN_NORM",
    "dot_precision",
    "stabilize",
    "destabilize",
    "stabilized_chain_product",
    "stabilized_hadamard_product",
    "tree_chain_product",
    "mps_evaluate",
    "mps_evaluate_auto",
    "mps_evaluate_fused",
    "mps_evaluate_premix",
    "mps_evaluate_perphys",
    "lanczos_basis",
    "lanczos_ground",
    "masked_tridiagonal",
    "mps_norm",
    "scan_matrix_chain",
]
