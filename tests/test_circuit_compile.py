"""MPS -> staircase circuit compilation vs independent reconstruction.

The compiled gates are validated by running them through
:class:`CircuitState` (a separate gate-application code path) and
measuring fidelity against the original state; unitarity of every
extracted gate is checked directly.
"""

import numpy as np
import jax
import pytest

from contractn_tpu.models import circuit_compile as cc
from contractn_tpu.models.canonical import compress
from contractn_tpu.models.dmrg import dmrg, tfim_mpo
from contractn_tpu.models.mps import MPS


def test_chi2_mps_compiles_exactly():
    mps = MPS.random(jax.random.PRNGKey(3), 7, 2, 2, dtype=np.float64)
    mps, _, _ = compress(mps, max_bond=2)
    layers = cc.mps_to_circuit(mps, n_layers=1)
    rec = cc.circuit_mps(layers, 7)
    assert abs(cc.mps_fidelity(mps, rec) - 1.0) < 1e-10


def test_extracted_gates_are_unitary():
    mps = MPS.random(jax.random.PRNGKey(5), 6, 2, 4, dtype=np.float64)
    gates, last = cc.staircase_layer(mps)
    for g in gates:
        assert np.allclose(np.dot(g.conj().T, g), np.eye(4), atol=1e-12)
    assert np.allclose(np.dot(last.conj().T, last), np.eye(2),
                       atol=1e-12)


def test_layers_improve_fidelity_on_tfim_ground_state():
    gs, _, _ = dmrg(
        tfim_mpo(8, h=1.3),
        MPS.random(jax.random.PRNGKey(0), 8, 2, 8, dtype=np.float64),
        max_bond=8, sweeps=4,
    )
    f1 = cc.mps_fidelity(gs, cc.circuit_mps(cc.mps_to_circuit(gs, 1), 8))
    f3 = cc.mps_fidelity(gs, cc.circuit_mps(cc.mps_to_circuit(gs, 3), 8))
    assert f1 > 0.999
    assert f3 > f1  # the dense-oracle-verified monotone regime


def test_complex_mps_compiles_exactly_at_chi2():
    key = jax.random.PRNGKey(9)
    re = MPS.random(key, 6, 2, 2, dtype=np.float64)
    cores = np.asarray(re.cores) * np.exp(
        1j * np.linspace(0.1, 2.0, re.cores.size).reshape(re.cores.shape)
    )
    mps = MPS(np.asarray(cores), np.asarray(re.left, complex),
              np.asarray(re.right, complex))
    mps, _, _ = compress(mps, max_bond=2)
    layers = cc.mps_to_circuit(mps, n_layers=1)
    rec = cc.circuit_mps(layers, 6)
    assert abs(cc.mps_fidelity(mps, rec) - 1.0) < 1e-10
