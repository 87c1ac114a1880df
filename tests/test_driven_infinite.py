"""Time-dependent (driven) evolution of infinite chains against the
exact per-momentum free-fermion oracle."""

import numpy as np

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.mpo_evolution import (
    umps_mpo_evolve,
    umps_mpo_evolve_driven,
)
from contractn_tpu.models.umps import expect_local
from contractn_tpu.models.vumps import vumps

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])


def _x_exact_ramp(h_of_t, h0, t_final, n_report):
    """Exact driven-TFIM transverse magnetization: each (k, -k) pair
    block {|0>, c+_k c+_{-k}|0>} evolves under
    H_k = [[0, 2i sin k], [-2i sin k, 4h(t) - 4 cos k]]
    (this block reproduces the static vumps <X> to 7e-14 — calibrated
    before the drive was trusted); <X> = 1 - (2/pi) int |b_k|^2 dk."""
    ks = np.linspace(1e-6, np.pi, 2001)

    def hk_mats(h):
        z = np.zeros_like(ks)
        return np.stack(
            [np.stack([z, 2j * np.sin(ks)], -1),
             np.stack([-2j * np.sin(ks), 4 * h - 4 * np.cos(ks) + 0j],
                      -1)], -2)

    m0 = hk_mats(h0)
    psi = np.zeros((len(ks), 2), complex)
    for i in range(len(ks)):
        _, v = np.linalg.eigh(m0[i])
        psi[i] = v[:, 0]

    def rhs(p, t):
        return -1j * np.einsum("kab,kb->ka", hk_mats(h_of_t(t)), p)

    dt = 1e-3
    out = {}
    t = 0.0
    step = t_final / n_report
    for _ in range(int(round(t_final / dt))):
        k1 = rhs(psi, t)
        k2 = rhs(psi + dt / 2 * k1, t + dt / 2)
        k3 = rhs(psi + dt / 2 * k2, t + dt / 2)
        k4 = rhs(psi + dt * k3, t + dt)
        psi = psi + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += dt
        if abs(t / step - round(t / step)) < 1e-9:
            b2 = np.abs(psi[:, 1]) ** 2
            out[int(round(t / step)) - 1] = \
                1.0 - (2 / np.pi) * np.trapezoid(b2, ks)
    return out


def test_driven_ramp_matches_exact_bdg():
    """TFIM field ramp h: 2.0 -> 1.4 over t = 0.8 from the vumps
    ground state: <X>(t) tracks the exact per-k Bogoliubov dynamics
    along the whole trajectory (measured 2.9e-4 at dt = 0.05), and
    halving dt collapses the endpoint error by the midpoint rule's
    factor 4 (measured 3.86)."""
    h0, h1, t_final = 2.0, 1.4, 0.8

    def h_of_t(t):
        return h0 + (h1 - h0) * t / t_final

    g = vumps(tfim_mpo(2, h=h0), 12, iters=100)
    al = np.asarray(g["al"])
    exact = _x_exact_ramp(h_of_t, h0, t_final, 16)

    xs = {}

    def cb(k, core):
        xs[k] = float(np.real(expect_local(core, _SX, iters=200)))

    umps_mpo_evolve_driven(
        al, lambda t: np.asarray(tfim_mpo(2, h=h_of_t(t)).cores)[0],
        t_final, 16, 24, order=2, callback=cb)
    errs = [abs(xs[k] - exact[k]) for k in xs]
    assert max(errs) < 1e-3, max(errs)

    core32 = umps_mpo_evolve_driven(
        al, lambda t: np.asarray(tfim_mpo(2, h=h_of_t(t)).cores)[0],
        t_final, 32, 24, order=2)
    x32 = float(np.real(expect_local(core32, _SX, iters=200)))
    e16, e32 = abs(xs[15] - exact[15]), abs(x32 - exact[15])
    assert e32 < e16 / 2.5, (e16, e32)


def test_constant_drive_equals_static_evolver():
    """h_core_fn = const must reproduce umps_mpo_evolve exactly (same
    propagator cores, same program)."""
    hc = np.asarray(tfim_mpo(2, h=1.6).cores)[0]
    g = vumps(tfim_mpo(2, h=2.0), 8, iters=80)
    al = np.asarray(g["al"])
    c1 = umps_mpo_evolve(al, hc, 0.2, 4, 16)
    c2 = umps_mpo_evolve_driven(al, lambda t: hc, 0.2, 4, 16)
    x1 = complex(expect_local(c1, _SX, iters=200))
    x2 = complex(expect_local(c2, _SX, iters=200))
    assert abs(x1 - x2) < 1e-12


def test_floquet_drive_matches_exact_bdg():
    """Sinusoidal (Floquet) drive h(t) = 1.6 + 0.4 sin(4 pi t / 0.5)
    over three periods: the stroboscopic and intra-period <X>(t) both
    track the exact per-k dynamics (measured 5.2e-4 at ~10 steps per
    period — accumulation over an oscillating drive, not just a
    monotone ramp)."""
    h0, amp, om, t_final = 1.6, 0.4, 2 * np.pi / 0.5, 1.5

    def h_of_t(t):
        return h0 + amp * np.sin(om * t)

    g = vumps(tfim_mpo(2, h=h0), 12, iters=100)
    exact = _x_exact_ramp(h_of_t, h0, t_final, 30)
    xs = {}

    def cb(k, core):
        xs[k] = float(np.real(expect_local(core, _SX, iters=200)))

    umps_mpo_evolve_driven(
        np.asarray(g["al"]),
        lambda t: np.asarray(tfim_mpo(2, h=h_of_t(t)).cores)[0],
        t_final, 30, 24, order=2, callback=cb)
    errs = [abs(xs[k] - exact[k]) for k in xs]
    assert max(errs) < 2e-3, max(errs)
