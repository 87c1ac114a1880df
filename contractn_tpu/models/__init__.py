from .mps import MPS
from .mpo import MPO
from .decompositions import cp_tn, tucker_tn, tensor_ring_tn, mps_tn
from .peps import peps_tn

__all__ = ["MPS", "MPO", "cp_tn", "tucker_tn", "tensor_ring_tn", "mps_tn", "peps_tn"]
