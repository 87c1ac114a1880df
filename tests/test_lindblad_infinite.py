"""Open-system dynamics in the thermodynamic limit: uniform Lindblad
evolution on vectorized density operators, trace-gauge observables."""

import numpy as np

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.lindblad_infinite import (
    lindblad_evolve_infinite,
    liouvillian_umpo,
    maximally_mixed,
    product_density,
    trace_correlate,
    trace_expect,
    vectorize_umps,
)
from contractn_tpu.models.umps import correlate, expect_local
from contractn_tpu.models.vumps import vumps

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])
_SM = np.array([[0.0, 0.0], [1.0, 0.0]])  # |down><up|


def test_trace_gauge_reproduces_pure_state_observables():
    """On a vectorized pure state A (x) conj(A) the (D^2, D^2) trace
    transfer IS the usual transfer matrix, so the trace gauge must
    reproduce the uMPS observables to machine precision — this pins
    the vectorization convention, the trace functional, and the
    left/right eigen-pairing at once."""
    g = vumps(tfim_mpo(2, h=1.5), 8, iters=80)
    rho = vectorize_umps(np.asarray(g["al"]))
    x_tr = trace_expect(rho, _SX)
    x_ps = complex(expect_local(g["al"], _SX))
    assert abs(x_tr - x_ps) < 1e-12
    zz_tr = trace_correlate(rho, _SZ, _SZ, [1, 2, 3])
    zz_ps = np.asarray(correlate(g["al"], _SZ, _SZ, [1, 2, 3]))
    assert np.max(np.abs(zz_tr - zz_ps)) < 1e-12


def test_pure_dephasing_is_exact():
    """H = 0, uniform Z dephasing: site superoperators commute and the
    W^II propagator reduces to its exactly-exponentiated one-site
    corner channel, so <X>(t) = e^{-2 gamma t} to machine precision —
    and the unconditional fixed point vec(I) of the same (unital)
    dissipator stays exactly fixed."""
    gam, t = 0.35, 0.5
    rho0 = product_density(0.5 * (np.eye(2) + _SX))
    out = lindblad_evolve_infinite(rho0, None, jumps=[_SZ], rates=[gam], t=t,
                          n_steps=10, bond_dim=4)
    assert abs(trace_expect(out, _SX) - np.exp(-2 * gam * t)) < 1e-12
    assert abs(trace_expect(out, _SZ)) < 1e-12


def test_unital_dynamics_fixes_maximally_mixed():
    """vec(I) is stationary under any unital Liouvillian (Hermitian
    jumps): TFIM + dephasing leaves the infinite-temperature state's
    observables at exactly zero through a full evolution."""
    hc = np.asarray(tfim_mpo(2, h=1.2).cores)[0]
    out = lindblad_evolve_infinite(maximally_mixed(2), hc, jumps=[_SZ],
                          rates=[0.4], t=0.3, n_steps=6, bond_dim=8)
    assert abs(trace_expect(out, _SX)) < 1e-12
    assert abs(trace_expect(out, _SZ)) < 1e-12


def test_liouvillian_umpo_validates():
    import pytest

    with pytest.raises(ValueError):
        liouvillian_umpo(None, jumps=())


def test_tfim_amplitude_damping_matches_dense():
    """The interacting, non-unital case: infinite TFIM with uniform
    amplitude damping from an X-polarized product state, against a
    dense n=8 RK4 Lindblad oracle at the center site (bound set by the
    W^II step and the open oracle's boundary; measured 6e-5)."""
    h, gam, t = 1.2, 0.5, 0.3
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    rho0 = product_density(0.5 * (np.eye(2) + _SX))
    out = lindblad_evolve_infinite(rho0, hc, jumps=[_SM], rates=[gam], t=t,
                          n_steps=12, bond_dim=16)
    xi = trace_expect(out, _SX).real
    zi = trace_expect(out, _SZ).real
    zz = trace_correlate(out, _SZ, _SZ, [1, 2]).real

    n, c = 8, 4
    eye = np.eye(2)

    def op(mat, i):
        o = np.eye(1)
        for j in range(n):
            o = np.kron(o, mat if j == i else eye)
        return o

    ham = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham -= op(_SZ, i) @ op(_SZ, i + 1)
    for i in range(n):
        ham -= h * op(_SX, i)
    ls = [op(_SM, i) for i in range(n)]
    ldl = [lj.conj().T @ lj for lj in ls]

    def rhs(r):
        o = -1j * (ham @ r - r @ ham)
        for lj, k in zip(ls, ldl):
            o += gam * (lj @ r @ lj.conj().T - 0.5 * (k @ r + r @ k))
        return o

    r = np.eye(1, dtype=complex)
    v = np.array([1.0, 1.0]) / np.sqrt(2)
    for _ in range(n):
        r = np.kron(r, np.outer(v, v.conj()))
    dt = 0.01
    for _ in range(int(round(t / dt))):
        k1 = rhs(r)
        k2 = rhs(r + dt / 2 * k1)
        k3 = rhs(r + dt / 2 * k2)
        k4 = rhs(r + dt * k3)
        r = r + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    assert abs(xi - np.trace(op(_SX, c) @ r).real) < 5e-4
    assert abs(zi - np.trace(op(_SZ, c) @ r).real) < 5e-4
    for rr in (1, 2):
        zzd = np.trace(op(_SZ, c) @ op(_SZ, c + rr) @ r).real
        assert abs(zz[rr - 1] - zzd) < 5e-4


def test_long_time_matches_finite_mps_lindblad():
    """Accumulation check at t = 2 (80 W^II applications at bond 32):
    the infinite evolution agrees with the package's own finite n=20
    MPS Lindblad evolution at the center site to 1e-3 — a boundary-
    safe oracle (the dense n=8 chain is 2e-2 off HERE, its boundary
    reaches the center by t ~ 1.5; measured 8e-4)."""
    from contractn_tpu.models.lindblad import (
        density_expectation,
        density_trace,
        lindblad_evolve_wii,
        vectorized_product_state,
    )

    h, gam, t = 1.2, 0.6, 2.0
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    rho0 = product_density(0.5 * (np.eye(2) + _SX))
    out = lindblad_evolve_infinite(rho0, hc, jumps=[_SM], rates=[gam],
                                   t=t, n_steps=40, bond_dim=32)
    xi = trace_expect(out, _SX).real

    n = 20
    hm = tfim_mpo(n, h=h)
    v = np.array([1.0, 1.0]) / np.sqrt(2)
    rho_f = lindblad_evolve_wii(
        vectorized_product_state([v] * n), hm, t, 40,
        jumps=[np.sqrt(gam) * _SM], max_bond=48)
    xf = complex(density_expectation(rho_f, _SX, n // 2)
                 / density_trace(rho_f)).real
    assert abs(xi - xf) < 3e-3, (xi, xf)


def test_bond_dissipator_matches_dense():
    """Two-site (bond) dissipators: infinite TFIM with uniform
    dissipative hopping S+ (x) S- from an X-polarized product state,
    against a dense n=8 RK4 Lindblad oracle with per-bond jumps at
    the center (the operator-Schmidt channel construction rides
    mpo_from_bond_term, which never assumes Hermiticity)."""
    h, gam, t = 1.2, 0.5, 0.3
    sp = _SM.T
    bj = np.kron(sp, _SM)
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    rho0 = product_density(0.5 * (np.eye(2) + _SX))
    out = lindblad_evolve_infinite(rho0, hc, t=t, n_steps=12,
                                   bond_dim=16, bond_jumps=[bj],
                                   bond_rates=[gam])
    xi = trace_expect(out, _SX).real
    zi = trace_expect(out, _SZ).real

    n, c = 8, 4
    eye = np.eye(2)

    def op(mat, i):
        o = np.eye(1)
        for j in range(n):
            o = np.kron(o, mat if j == i else eye)
        return o

    def bop(mat4, i):
        o = np.eye(2 ** i)
        o = np.kron(o, mat4)
        return np.kron(o, np.eye(2 ** (n - 2 - i)))

    ham = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham -= op(_SZ, i) @ op(_SZ, i + 1)
    for i in range(n):
        ham -= h * op(_SX, i)
    ls = [bop(bj, i) for i in range(n - 1)]
    ldl = [lj.conj().T @ lj for lj in ls]

    def rhs(r):
        o = -1j * (ham @ r - r @ ham)
        for lj, k in zip(ls, ldl):
            o += gam * (lj @ r @ lj.conj().T - 0.5 * (k @ r + r @ k))
        return o

    r = np.eye(1, dtype=complex)
    v = np.array([1.0, 1.0]) / np.sqrt(2)
    for _ in range(n):
        r = np.kron(r, np.outer(v, v.conj()))
    dt = 0.01
    for _ in range(int(round(t / dt))):
        k1 = rhs(r)
        k2 = rhs(r + dt / 2 * k1)
        k3 = rhs(r + dt / 2 * k2)
        k4 = rhs(r + dt * k3)
        r = r + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    assert abs(xi - np.trace(op(_SX, c) @ r).real) < 1e-3
    assert abs(zi - np.trace(op(_SZ, c) @ r).real) < 1e-3


def test_ness_infinite_exact_fixed_points():
    """ness_infinite lands on analytically known steady states: pure
    loss -> the all-down projector (drift-certified), and unital
    TFIM + dephasing -> the maximally mixed state, from a polarized
    start in both cases."""
    from contractn_tpu.models.lindblad_infinite import (
        ness_infinite,
        one_site_density,
    )

    out = ness_infinite(None, jumps=[_SM], rates=[0.8], bond_dim=4,
                        t_chunk=2.0, tol=1e-8)
    assert out["converged"]
    assert np.max(np.abs(out["rho1"] - np.diag([0.0, 1.0]))) < 1e-7

    hc = np.asarray(tfim_mpo(2, h=1.2).cores)[0]
    rho0 = product_density(0.5 * (np.eye(2) + _SX))
    out2 = ness_infinite(hc, jumps=[_SZ], rates=[0.7], rho0=rho0,
                         bond_dim=12, t_chunk=2.0, tol=1e-5,
                         max_chunks=12)
    assert out2["converged"]
    assert np.max(np.abs(out2["rho1"] - 0.5 * np.eye(2))) < 1e-4
    # one_site_density on the initial product state is the projector
    r1 = one_site_density(rho0)
    assert np.max(np.abs(r1 - 0.5 * (np.eye(2) + _SX))) < 1e-12
