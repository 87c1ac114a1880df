from .mps import MPS
from .mpo import MPO
from .canonical import compress, left_canonicalize
from .decompositions import cp_tn, tucker_tn, tensor_ring_tn, mps_tn
from .peps import peps_tn

__all__ = [
    "MPS",
    "MPO",
    "compress",
    "left_canonicalize",
    "cp_tn",
    "tucker_tn",
    "tensor_ring_tn",
    "mps_tn",
    "peps_tn",
]
