"""MCWF quantum trajectories: exact path parity + statistical closure.

The load-bearing test is the second one: the MPS trajectory engine and
a dense-state oracle consume the SAME uniform draws and apply the SAME
Trotter gates, so the entire decision sequence (jump times, channel
picks) and the final state must agree to machine precision — the
stochastic machinery is pinned deterministically.  The ensemble test
then only needs to certify unbiased averaging at O(1/sqrt(n_traj)).
"""

import numpy as np
import scipy.linalg as sla

import jax

from contractn_tpu.models import MPS
from contractn_tpu.models.circuits import tebd_evolve
from contractn_tpu.models.itebd import tfim_h2, two_site_gate
from contractn_tpu.models.trajectories import (
    mcwf_ensemble,
    mcwf_trajectory,
)

Z = np.diag([1.0, -1.0])
X = np.array([[0.0, 1.0], [1.0, 0.0]])
SM = np.array([[0.0, 1.0], [0.0, 0.0]])  # lowering: index 1 -> 0
N = 3


def _kron_all(ops):
    out = np.array([[1.0 + 0j]])
    for o in ops:
        out = np.kron(out, o)
    return out


def _embed1(op, j):
    return _kron_all([np.eye(2)] * j + [op] + [np.eye(2)] * (N - j - 1))


def _initial():
    """Mostly |111> with a small X rotation (decaying, entangling)."""
    psi = np.zeros(2**N)
    psi[-1] = 1.0
    u1 = np.cos(0.2) * np.eye(2) - 1j * np.sin(0.2) * X
    psi = _kron_all([u1] * N) @ psi.astype(complex)
    return psi, MPS.from_dense(psi, 2)


def test_no_jumps_is_deterministic_tebd():
    _, mps0 = _initial()
    h2 = np.asarray(tfim_h2(1.0, 1.2))
    out, rec, jl = mcwf_trajectory(mps0, h2, [], 1.0, 20, max_bond=8,
                                   op=Z)
    assert jl == []
    ref, _ = tebd_evolve(mps0, h2, 1.0, 20, 8)
    v, lg = out.inner(ref)
    _, ln_a = out.norm_squared()
    _, ln_b = ref.norm_squared()
    overlap = abs(complex(v)) * np.exp(
        float(lg) - 0.5 * float(ln_a) - 0.5 * float(ln_b)
    )
    assert abs(overlap - 1.0) < 1e-10


def test_trajectory_matches_dense_oracle_with_shared_draws():
    psi0, mps0 = _initial()
    h2 = np.asarray(tfim_h2(1.0, 1.2))
    gamma = 1.0
    jumps = [(np.sqrt(gamma) * SM, s) for s in range(N)]
    uni = np.random.RandomState(3).uniform(size=(60, 2))
    out, rec, jl = mcwf_trajectory(mps0, h2, jumps, 3.0, 60, max_bond=8,
                                   uniforms=uni, op=Z)
    assert len(jl) >= 2  # the draws actually exercise the jump branch

    # dense oracle: same Trotter splitting, same decision rule
    dt = 3.0 / 60
    gh = np.asarray(two_site_gate(h2, 1j * dt / 2.0)).reshape(4, 4)
    gf = np.asarray(two_site_gate(h2, 1j * dt)).reshape(4, 4)

    def bond(g, i):
        return np.kron(
            np.kron(np.eye(2**i), g), np.eye(2 ** (N - i - 2))
        )

    k1 = gamma * (SM.conj().T @ SM)
    dhalf = np.eye(2**N, dtype=complex)
    for j in range(N):
        dhalf = _embed1(sla.expm(-0.25 * dt * k1), j) @ dhalf
    step_u = dhalf @ bond(gh, 0) @ bond(gf, 1) @ bond(gh, 0) @ dhalf

    psi = psi0.copy()
    jl_dense = []
    for s in range(60):
        psi = step_u @ psi
        q = np.vdot(psi, psi).real
        psi = psi / np.sqrt(q)
        if uni[s, 0] > q:
            w = np.array(
                [np.vdot(psi, _embed1(k1, j) @ psi).real
                 for j in range(N)]
            )
            pick = int(np.searchsorted(np.cumsum(w / w.sum()),
                                       uni[s, 1]))
            psi = _embed1(np.sqrt(gamma) * SM, pick) @ psi
            psi = psi / np.linalg.norm(psi)
            jl_dense.append((s, pick))
    assert jl == jl_dense  # identical jump record, step by step
    z_dense = np.array(
        [np.vdot(psi, _embed1(Z, j) @ psi).real for j in range(N)]
    )
    np.testing.assert_allclose(rec[-1].real, z_dense, atol=1e-12)


def test_ensemble_average_approaches_lindblad():
    psi0, mps0 = _initial()
    h2 = np.asarray(tfim_h2(1.0, 1.2))
    gamma = 0.8
    jumps = [(np.sqrt(gamma) * SM, s) for s in range(N)]

    # dense Lindblad RK4 oracle
    ham = np.zeros((2**N,) * 2, dtype=complex)
    h4 = h2.reshape(4, 4)
    for i in range(N - 1):
        ham += np.kron(
            np.kron(np.eye(2**i), h4), np.eye(2 ** (N - i - 2))
        )
    ls = [np.sqrt(gamma) * _embed1(SM, j) for j in range(N)]

    def lind(rho):
        out = -1j * (ham @ rho - rho @ ham)
        for lo in ls:
            out += lo @ rho @ lo.conj().T - 0.5 * (
                lo.conj().T @ lo @ rho + rho @ lo.conj().T @ lo
            )
        return out

    rho = np.outer(psi0, psi0.conj())
    dtr = 1.0 / 200
    for _ in range(200):
        f1 = lind(rho)
        f2 = lind(rho + dtr / 2 * f1)
        f3 = lind(rho + dtr / 2 * f2)
        f4 = lind(rho + dtr * f3)
        rho = rho + dtr / 6 * (f1 + 2 * f2 + 2 * f3 + f4)
    z_lind = np.array(
        [np.trace(rho @ _embed1(Z, j)).real for j in range(N)]
    )

    mean, n_jumps = mcwf_ensemble(
        mps0, h2, jumps, 1.0, 20, Z, 24, max_bond=8,
        key=jax.random.PRNGKey(5), measure_every=20,
    )
    assert n_jumps > 0
    # statistical closure: per-site shot noise is ~1/sqrt(24) ~ 0.2, so
    # pin each site at ~2.5 sigma and the (noise-averaged) site mean
    # tighter — both deterministic for the fixed seed
    assert np.abs(mean[-1].real - z_lind).max() < 0.45
    assert abs(np.mean(mean[-1].real - z_lind)) < 0.2
    # and the dissipation is actually visible: Z grew toward +1
    z0 = np.array([np.vdot(psi0, _embed1(Z, j) @ psi0).real
                   for j in range(N)])
    assert np.all(mean[-1].real > z0 + 0.1)
