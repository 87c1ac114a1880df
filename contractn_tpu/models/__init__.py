from .mps import MPS
from .mpo import MPO, mpo_from_bond_term, mpo_sum
from .boundary import apply_mpo_to_mps, peps_expectation, peps_norm
from .canonical import (
    compress,
    compress_fixed,
    compress_mpo,
    imaginary_time_step,
    left_canonicalize,
    mps_add,
    right_canonicalize,
)
from .circuits import (
    CircuitState,
    tebd_evolve,
    thermal_correlation,
    thermal_expectation,
    thermal_state,
)
from .ctmrg import (
    ctmrg_environment,
    free_energy_per_site,
    ising_magnetization,
    ising_tensor,
)
from .ctmrg_cell import (
    ctmrg_cell,
    pair_expectation_h,
    row_correlator,
    row_transfer_spectrum,
    site_expectation,
)
from .decompositions import cp_tn, tucker_tn, tensor_ring_tn, mps_tn
from .ipeps import (
    heisenberg_bond_term_2d,
    ipeps_energy,
    ipeps_expect_bond,
    ipeps_expect_local,
    ipeps_ground_state,
    peps_double_layer,
    product_peps,
    simple_update,
    su_absorb_weights,
    symmetrize_c4v,
    tfim_bond_term_2d,
)
from .ipeps_cell import (
    cell_energy,
    cell_site_expectations,
    ipeps_cell_ground_state,
    ipeps_cell_scan,
    simple_update_cell,
    su_cell_absorb,
)
from .features import one_hot, trig_features, fourier_features
from .fermions import free_fermion_energy, kitaev_chain_mpo
from .dmrg import (
    dmrg,
    dmrg_excited,
    dmrg_sector,
    heisenberg_mpo,
    idmrg,
    tfim_mpo,
    total_sz_penalty_mpo,
)
from .dmrg3s import dmrg3s
from .ensemble import dmrg_ensemble, dmrg_uniform, stack_pytrees
from .peps import peps_tn
from .itebd import (
    heisenberg_h2,
    itebd_ground_state,
    tfim_h2 as tfim_bond_term,
    unit_cell_core,
)
from .sampling import sample, sample_canonical
from .vumps import mixed_gauge, vumps
from .umps import (
    correlate,
    correlation_length,
    expect_local,
    log_norm_per_site,
    transfer_spectrum,
)
from .tdvp import tdvp1_evolve, tdvp1_step, tdvp_evolve, tdvp_step
from .variational import (
    make_cell_loss,
    make_ipeps_loss,
    variational_ipeps,
    variational_ipeps_cell,
)
from .excitations import (
    excitation_spectrum,
    quasiparticle_dispersion,
    spectral_weights,
)

__all__ = [
    "MPS",
    "MPO",
    "mpo_from_bond_term",
    "mpo_sum",
    "compress",
    "compress_fixed",
    "left_canonicalize",
    "right_canonicalize",
    "mps_add",
    "apply_mpo_to_mps",
    "peps_expectation",
    "peps_norm",
    "compress_mpo",
    "imaginary_time_step",
    "cp_tn",
    "tucker_tn",
    "tensor_ring_tn",
    "mps_tn",
    "peps_tn",
    "CircuitState",
    "tebd_evolve",
    "thermal_state",
    "thermal_expectation",
    "thermal_correlation",
    "ctmrg_environment",
    "ctmrg_cell",
    "site_expectation",
    "pair_expectation_h",
    "row_correlator",
    "row_transfer_spectrum",
    "free_energy_per_site",
    "ipeps_energy",
    "ipeps_expect_bond",
    "ipeps_expect_local",
    "ipeps_ground_state",
    "simple_update",
    "simple_update_cell",
    "su_absorb_weights",
    "su_cell_absorb",
    "cell_energy",
    "cell_site_expectations",
    "ipeps_cell_ground_state",
    "ipeps_cell_scan",
    "tfim_bond_term_2d",
    "heisenberg_bond_term_2d",
    "variational_ipeps",
    "variational_ipeps_cell",
    "make_ipeps_loss",
    "make_cell_loss",
    "excitation_spectrum",
    "quasiparticle_dispersion",
    "spectral_weights",
    "peps_double_layer",
    "product_peps",
    "symmetrize_c4v",
    "ising_tensor",
    "ising_magnetization",
    "dmrg",
    "dmrg3s",
    "dmrg_ensemble",
    "dmrg_uniform",
    "stack_pytrees",
    "dmrg_excited",
    "dmrg_sector",
    "total_sz_penalty_mpo",
    "idmrg",
    "tfim_mpo",
    "heisenberg_mpo",
    "kitaev_chain_mpo",
    "free_fermion_energy",
    "sample",
    "itebd_ground_state",
    "unit_cell_core",
    "heisenberg_h2",
    "tfim_bond_term",
    "sample_canonical",
    "tdvp_step",
    "tdvp1_step",
    "tdvp1_evolve",
    "transfer_spectrum",
    "vumps",
    "mixed_gauge",
    "correlation_length",
    "correlate",
    "log_norm_per_site",
    "expect_local",
    "tdvp_evolve",
    "one_hot",
    "trig_features",
    "fourier_features",
]
