"""Infinite boundary conditions: window dynamics in the thermodynamic
limit, against exactness-of-embedding and dense-oracle anchors."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spl

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.ibc import (
    ibc_window,
    window_apply_local,
    window_evolve,
    window_expectations,
)
from contractn_tpu.models.umps import expect_local
from contractn_tpu.models.vumps import vumps

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def test_ibc_ground_window_is_stationary():
    """The embedded ground window is an eigenstate of the infinite-chain
    effective Hamiltonian: real-time evolution leaves every site
    expectation at the uniform bulk value to solver precision (this
    pins the FL/FR environment layout AND the integrator)."""
    hm = tfim_mpo(2, h=1.5)
    g = vumps(hm, 8, iters=80)
    win = ibc_window(g, np.asarray(hm.cores)[0], 8)
    x0 = np.real(np.asarray(window_expectations(win, _SX)))
    xb = float(np.real(expect_local(g["al"], _SX)))
    assert np.max(np.abs(x0 - xb)) < 1e-9
    win2 = window_evolve(win, 0.05, 4, max_bond=8)
    x1 = np.real(np.asarray(window_expectations(win2, _SX)))
    z1 = np.real(np.asarray(window_expectations(win2, _SZ)))
    assert np.max(np.abs(x1 - x0)) < 1e-8
    assert np.max(np.abs(z1)) < 1e-12


def test_ibc_local_quench_matches_dense():
    """Z-quench light cone in the infinite TFIM: the window's <X>(t)
    response profile matches a dense Krylov evolution (open n=14
    chain, quench at the center; static edge offsets cancel in the
    response, and the light cone stays inside both frames)."""
    h, t, nw, qj = 1.5, 0.6, 12, 5
    hm = tfim_mpo(2, h=h)
    g = vumps(hm, 12, iters=100)
    win = ibc_window(g, np.asarray(hm.cores)[0], nw)
    x0 = np.real(np.asarray(window_expectations(win, _SX)))
    win_t = window_evolve(window_apply_local(win, _SZ, qj),
                          t / 16, 16, max_bond=24)
    dx_ibc = np.real(np.asarray(window_expectations(win_t, _SX))) - x0
    z_ibc = np.real(np.asarray(window_expectations(win_t, _SZ)))

    n, c = 14, 7

    def sop(op, i):
        return sp.kron(
            sp.kron(sp.identity(2 ** i), sp.csr_matrix(op)),
            sp.identity(2 ** (n - 1 - i)), format="csr")

    ham = sp.csr_matrix((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham = ham - sop(_SZ, i) @ sop(_SZ, i + 1)
    for i in range(n):
        ham = ham - h * sop(_SX, i)
    _, vecs = spl.eigsh(ham, k=1, which="SA")
    psi0 = vecs[:, 0]
    psit = spl.expm_multiply(-1j * t * ham.tocsc(),
                             (sop(_SZ, c) @ psi0).astype(complex))
    for j in range(nw):
        dj = j + c - qj
        dx_d = np.real(np.vdot(psit, sop(_SX, dj) @ psit)) - np.real(
            psi0 @ (sop(_SX, dj) @ psi0))
        assert abs(dx_ibc[j] - dx_d) < 5e-4, (j, dx_ibc[j], dx_d)
    # Z stays zero (the quench preserves the spin-flip symmetry) and
    # the response is light-cone local: negligible 5 sites out.
    assert np.max(np.abs(z_ibc)) < 1e-10
    assert abs(dx_ibc[0]) < 1e-4
    assert abs(dx_ibc[qj]) > 0.5


def test_ibc_dynamic_correlator_matches_dense():
    """C(j, t) = <gs| Z_j(t) Z_0 |gs> in the infinite TFIM: the t=0 row
    is the static correlator (uMPS transfer oracle), the time rows
    match a dense Krylov oracle (h=2: the oracle chain's boundary
    contamination of the STATIC correlator is what limits the bound —
    measured 3e-3 at h=1.5, xi=2.5, vs 3e-4 here)."""
    from contractn_tpu.models.ibc import ibc_dynamic_correlator
    from contractn_tpu.models.umps import correlate

    h, dt, nsteps, nw, qj = 2.0, 0.05, 10, 12, 5
    hm = tfim_mpo(2, h=h)
    g = vumps(hm, 12, iters=100)
    C = ibc_dynamic_correlator(g, np.asarray(hm.cores)[0], _SZ, _SZ,
                               nw, qj, dt, nsteps, max_bond=24)
    assert C.shape == (nw, nsteps + 1)

    # t=0 row == static correlator of the SAME uniform state
    stat = np.asarray(correlate(g["al"], _SZ, _SZ, [1, 2, 3]))
    assert abs(C[qj, 0] - 1.0) < 1e-9
    for r in (1, 2, 3):
        assert abs(C[qj + r, 0] - stat[r - 1]) < 1e-8
        assert abs(C[qj - r, 0] - stat[r - 1]) < 1e-8

    n, c = 14, 7

    def sop(op, i):
        return sp.kron(
            sp.kron(sp.identity(2 ** i), sp.csr_matrix(op)),
            sp.identity(2 ** (n - 1 - i)), format="csr")

    ham = sp.csr_matrix((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham = ham - sop(_SZ, i) @ sop(_SZ, i + 1)
    for i in range(n):
        ham = ham - h * sop(_SX, i)
    vals, vecs = spl.eigsh(ham, k=1, which="SA")
    e0, psi0 = vals[0], vecs[:, 0]
    cur = (sop(_SZ, c) @ psi0).astype(complex)
    for k in range(nsteps + 1):
        if k:
            cur = spl.expm_multiply(-1j * dt * ham.tocsc(), cur)
        ph = np.exp(1j * e0 * k * dt)
        for j in range(nw):
            cd = ph * np.vdot(psi0, sop(_SZ, j + c - qj) @ cur)
            assert abs(C[j, k] - cd) < 5e-4, (j, k, C[j, k], cd)


def test_ibc_dispersion_from_phase_fit():
    """The quasiparticle dispersion read off the real-time signal:
    eps(k) = -arg(C(k, t+dt)/C(k, t))/dt on the spatially Fourier-
    transformed correlator matches the exact Pfeuty band (Z creates a
    single quasiparticle in the paramagnetic phase; the few-percent
    multiparticle weight limits the fit).  Also pins the
    ibc_spectral_function wiring: the w-integral recovers the static
    structure factor row."""
    from contractn_tpu.models.ibc import (ibc_dynamic_correlator,
                                          ibc_spectral_function)

    h, dt, nsteps, nw, qj = 2.0, 0.05, 10, 12, 5
    hm = tfim_mpo(2, h=h)
    g = vumps(hm, 12, iters=100)
    C = ibc_dynamic_correlator(g, np.asarray(hm.cores)[0], _SZ, _SZ,
                               nw, qj, dt, nsteps, max_bond=24)
    js = np.arange(nw) - qj
    for k in (0.0, np.pi / 3, 2 * np.pi / 3, np.pi):
        ck = np.exp(-1j * k * js) @ C
        # average the step phase over the trajectory
        eps_fit = np.mean(
            [-np.angle(ck[m + 1] / ck[m]) / dt for m in range(nsteps)])
        eps_exact = 2.0 * np.sqrt(1 + h * h - 2 * h * np.cos(k))
        assert abs(eps_fit - eps_exact) < 0.07, (k, eps_fit, eps_exact)

    # S(k, w) wiring: integral over w recovers C(k, t=0) (the damping
    # window's own normalization cancels in the w-integral limit; at
    # finite t_max the Gaussian-broadened sum rule holds to its
    # truncation level)
    ws = np.linspace(-20.0, 30.0, 801)
    ks = np.array([np.pi / 3])
    s = ibc_spectral_function(C, qj, dt, ks, ws)
    ck0 = float(np.real(np.exp(-1j * ks[0] * js) @ C[:, 0]))
    integral = np.trapezoid(s[0], ws) / (2 * np.pi)
    assert abs(integral - ck0) < 0.05 * abs(ck0), (integral, ck0)
    assert np.all(s[0] > -0.05)
    # the ridge sits on the dispersion
    eps_exact = 2.0 * np.sqrt(1 + h * h - 2 * h * np.cos(ks[0]))
    assert abs(ws[np.argmax(s[0])] - eps_exact) < 0.6
