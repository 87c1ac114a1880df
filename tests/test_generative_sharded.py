"""Sharded Born-machine training == single-device at machine precision.

Bitwise equality is impossible (XLA reschedules batched reductions at
the local batch size — see parallel/ensembles.py); machine-precision
agreement of the whole loss trajectory is the contract.
"""

import jax
import numpy as np
import pytest

from contractn_tpu.models import MPS
from contractn_tpu.models.born import born_machine, fit_born_machine
from contractn_tpu.models.sampling import sample
from contractn_tpu.parallel import fit_born_machine_sharded, make_mesh


def test_sharded_matches_single_device_trajectory():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n = 6
    ghz = np.zeros(2 ** n)
    ghz[0] = 1.0
    ghz[-1] = 1.0
    target = MPS.from_dense(np.asarray(ghz) / np.sqrt(2.0), 2)
    data, _ = sample(target, jax.random.PRNGKey(1), 800)

    m0 = born_machine(jax.random.PRNGKey(5), n, 2, 4)
    _, l_single = fit_born_machine(m0, data, steps=60, lr=0.02)
    mesh = make_mesh({"dp": 8})
    _, l_sharded = fit_born_machine_sharded(m0, data, mesh, steps=60,
                                            lr=0.02)
    diff = np.max(np.abs(np.asarray(l_single) - np.asarray(l_sharded)))
    assert diff < 1e-12
    assert float(l_sharded[-1]) < float(l_sharded[0])


def test_divisibility_validation():
    mesh = make_mesh({"dp": 8})
    m0 = born_machine(jax.random.PRNGKey(0), 4, 2, 2)
    data = np.zeros((9, 4), dtype=np.int32)
    with pytest.raises(ValueError):
        fit_born_machine_sharded(m0, data, mesh, steps=1)
