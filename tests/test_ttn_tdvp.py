"""TTN-TDVP vs dense propagation and sweeped-DMRG oracles.

The projector-splitting tree integrator inherits the chain
integrator's exactness property: on the saturated manifold (``chi`` =
full Hilbert space) one step reproduces ``exp(-i dt H)`` to machine
precision, and at truncated ``chi`` both the norm and the energy are
conserved exactly (each substep is a unitary restricted flow).  The
reference has no time-evolution layer (SURVEY.md section 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import tfim_mpo
from contractn_tpu.models.ttn import random_ttn, ttn_dmrg, ttn_energy, \
    ttn_to_dense
from contractn_tpu.models.ttn_tdvp import ttn_tdvp_evolve, ttn_tdvp_step

from test_ttn import _dense_tfim


def test_real_time_exact_on_saturated_manifold():
    n, h = 8, 1.05
    h_mpo = tfim_mpo(n, h=h)
    hd = _dense_tfim(n, h)
    w, u = np.linalg.eigh(hd)
    params = random_ttn(jax.random.PRNGKey(3), n, 2, 16)
    v0 = np.asarray(ttn_to_dense(params))
    dt, steps = 0.05, 8
    params2, _ = ttn_tdvp_evolve(h_mpo, params, dt, steps)
    v = np.asarray(ttn_to_dense(params2))
    vd = u @ (np.exp(-1j * w * dt * steps) * (u.conj().T @ v0))
    # incl. the global phase: the splitting integrator is EXACT here
    assert np.linalg.norm(v - vd) < 1e-10
    assert abs(np.linalg.norm(v) - 1.0) < 1e-10


def test_truncated_chi_conserves_norm_and_energy():
    n, h = 8, 1.3
    h_mpo = tfim_mpo(n, h=h)
    params = random_ttn(jax.random.PRNGKey(5), n, 2, 6)
    cparams = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.complex128), params)
    e0 = float(ttn_energy(cparams, h_mpo))
    p2 = params
    for _ in range(6):
        p2 = ttn_tdvp_step(h_mpo, p2, 0.08)
    assert abs(float(ttn_energy(p2, h_mpo)) - e0) < 1e-10
    assert abs(float(jnp.linalg.norm(p2["top"])) - 1.0) < 1e-10
    # the state actually moved (not a frozen integrator)
    v0 = np.asarray(ttn_to_dense(cparams))
    v = np.asarray(ttn_to_dense(p2))
    assert abs(abs(np.vdot(v0, v)) - 1.0) > 1e-3


def test_imaginary_time_reaches_the_variational_optimum():
    n, h, chi = 8, 1.05, 4
    h_mpo = tfim_mpo(n, h=h)
    _, es = ttn_dmrg(h_mpo, chi, sweeps=4)
    params = random_ttn(jax.random.PRNGKey(11), n, 2, chi)
    params, vals = ttn_tdvp_evolve(h_mpo, params, 0.2, 150,
                                   imaginary=True)
    assert vals[-1] < vals[0]
    assert abs(vals[-1] - es[-1]) < 1e-9
