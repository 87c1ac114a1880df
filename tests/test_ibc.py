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
