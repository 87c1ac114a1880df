"""iTEBD infinite-chain ground states vs exact closed forms."""

import numpy as np

import jax.numpy as jnp

from contractn_tpu.models.itebd import (
    heisenberg_h2,
    itebd_ground_state,
    tfim_h2,
)


def test_tfim_critical_ground_energy():
    """J = h = 1: exact infinite-chain energy per site is -4/pi."""
    _, e = itebd_ground_state(tfim_h2(), bond_dim=12)
    assert abs(e + 4.0 / np.pi) < 5e-4, e


def test_heisenberg_ground_energy():
    """S.S chain: exact energy per site is 1/4 - ln 2 (Bethe ansatz)."""
    _, e = itebd_ground_state(
        heisenberg_h2(), bond_dim=16,
        schedule=((0.1, 400), (0.01, 600), (0.001, 600)),
    )
    assert abs(e - (0.25 - np.log(2.0))) < 1e-3, e


def test_paramagnetic_magnetization_via_umps():
    """h >> J: the ground state is X-polarized; <Z> = 0 and <X> -> 1.
    Cross-checks the iTEBD unit cell through the uMPS fixed-point
    machinery (blocked two-site core)."""
    from contractn_tpu.models.itebd import unit_cell_core
    from contractn_tpu.models.umps import expect_local

    st, _ = itebd_ground_state(tfim_h2(j=1.0, h=3.0), bond_dim=8)
    blocked = unit_cell_core(st)
    sz = np.diag([1.0, -1.0])
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    ident = np.eye(2)
    z_avg = 0.5 * (np.kron(sz, ident) + np.kron(ident, sz))
    x_avg = 0.5 * (np.kron(sx, ident) + np.kron(ident, sx))
    assert abs(expect_local(blocked, z_avg, iters=400)) < 1e-6
    mx = expect_local(blocked, x_avg, iters=400)
    # exact transverse magnetization: (1/pi) int (h - cos k)/eps(k) dk
    ks = np.linspace(0.0, np.pi, 20001)
    eps = np.sqrt(1.0 + 3.0 ** 2 - 2.0 * 3.0 * np.cos(ks))
    mx_exact = np.trapezoid((3.0 - np.cos(ks)) / eps, ks) / np.pi
    assert np.isclose(mx, mx_exact, rtol=1e-5), (mx, mx_exact)
