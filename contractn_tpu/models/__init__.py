from .mps import MPS
from .mpo import MPO
from .canonical import compress, left_canonicalize, mps_add, right_canonicalize
from .decompositions import cp_tn, tucker_tn, tensor_ring_tn, mps_tn
from .features import one_hot, trig_features, fourier_features
from .dmrg import dmrg, heisenberg_mpo, tfim_mpo
from .peps import peps_tn
from .sampling import sample, sample_canonical

__all__ = [
    "MPS",
    "MPO",
    "compress",
    "left_canonicalize",
    "right_canonicalize",
    "mps_add",
    "cp_tn",
    "tucker_tn",
    "tensor_ring_tn",
    "mps_tn",
    "peps_tn",
    "dmrg",
    "tfim_mpo",
    "heisenberg_mpo",
    "sample",
    "sample_canonical",
    "one_hot",
    "trig_features",
    "fourier_features",
]
