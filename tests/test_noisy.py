"""Noisy circuit simulation vs dense density-matrix evolution."""

import numpy as np

from contractn_tpu.models.noisy import (
    NoisyCircuit,
    amplitude_damping_kraus,
    depolarizing_kraus,
    phase_damping_kraus,
)

X = np.array([[0.0, 1.0], [1.0, 0.0]])
Y = np.array([[0.0, -1j], [1j, 0.0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]])
H = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)
CNOT = np.eye(4)[[0, 1, 3, 2]]
CZ = np.diag([1.0, 1.0, 1.0, -1.0])
I2 = np.eye(2)


def _lift1(mat, site, n):
    out = np.eye(1)
    for k in range(n):
        out = np.kron(out, mat if k == site else I2)
    return out


def _lift2(mat, site, n):
    out = np.eye(1)
    k = 0
    while k < n:
        if k == site:
            out = np.kron(out, mat)
            k += 2
        else:
            out = np.kron(out, I2)
            k += 1
    return out


class DenseRho:
    def __init__(self, n):
        self.n = n
        v = np.zeros(2**n, complex)
        v[0] = 1.0
        self.rho = np.outer(v, v.conj())

    def gate(self, u, site, two=False):
        g = _lift2(u, site, self.n) if two else _lift1(u, site, self.n)
        self.rho = g @ self.rho @ g.conj().T

    def channel(self, kraus, site, two=False):
        lift = _lift2 if two else _lift1
        out = np.zeros_like(self.rho)
        for k in kraus:
            g = lift(np.asarray(k, complex), site, self.n)
            out += g @ self.rho @ g.conj().T
        self.rho = out


def _run_pair(n):
    nc = NoisyCircuit(n)
    dr = DenseRho(n)
    theta = 0.35
    corr_deph = [np.cos(theta) * np.eye(4),
                 np.sin(theta) * np.kron(Z, Z)]
    ops = [
        ("g1", H, 0), ("g1", H, 1), ("g1", H, 2), ("g1", H, 3),
        ("g2", CNOT, 0), ("g2", CNOT, 2),
        ("c1", amplitude_damping_kraus(0.15), 1),
        ("g2", CZ, 1),
        ("c1", depolarizing_kraus(0.1), 0),
        ("c1", phase_damping_kraus(0.2), 3),
        ("c2", corr_deph, 1),
        ("g2", CNOT, 1),
    ]
    for kind, op, site in ops:
        if kind == "g1":
            nc.apply_gate(op, site)
            dr.gate(op, site)
        elif kind == "g2":
            nc.apply_gate2(op, site)
            dr.gate(op, site, two=True)
        elif kind == "c1":
            nc.apply_channel(op, site)
            dr.channel(op, site)
        else:
            nc.apply_channel2(op, site)
            dr.channel(op, site, two=True)
    return nc, dr


def test_noisy_circuit_matches_dense():
    n = 4
    nc, dr = _run_pair(n)
    assert abs(nc.trace() - 1.0) < 1e-10  # CPTP, no truncation
    for i in range(n):
        zd = np.trace(_lift1(Z, i, n) @ dr.rho).real
        assert abs(nc.expectation(Z, i).real - zd) < 1e-10
    xx_d = np.trace(_lift1(X, 0, n) @ _lift1(X, 3, n) @ dr.rho).real
    xx = nc.expectation_multi([(0, X), (3, X)]).real
    assert abs(xx - xx_d) < 1e-10
    pur_d = np.trace(dr.rho @ dr.rho).real
    assert abs(nc.purity() - pur_d) < 1e-10
    assert pur_d < 0.9  # noise genuinely mixed the state


def test_noiseless_circuit_stays_pure():
    n = 3
    nc = NoisyCircuit(n)
    nc.apply_gate(H, 0)
    nc.apply_gate2(CNOT, 0)
    nc.apply_gate2(CNOT, 1)  # GHZ
    assert abs(nc.purity() - 1.0) < 1e-10
    zzz = nc.expectation_multi([(0, X), (1, X), (2, X)]).real
    assert abs(zzz - 1.0) < 1e-10  # <XXX> = +1 on GHZ
    assert abs(nc.expectation(Z, 0)) < 1e-10


def test_mixed_init_and_channel_fixed_points():
    n = 2
    nc = NoisyCircuit(n, init="mixed")
    assert abs(nc.purity() - 1.0 / 2**n) < 1e-12
    # maximally mixed is a fixed point of depolarizing + dephasing
    nc.apply_channel(depolarizing_kraus(0.3), 0)
    nc.apply_channel(phase_damping_kraus(0.4), 1)
    assert abs(nc.purity() - 1.0 / 2**n) < 1e-12
    # amplitude damping pumps toward |0><0|: <Z> grows
    nc.apply_channel(amplitude_damping_kraus(0.5), 0)
    assert nc.expectation(Z, 0).real > 0.4
    assert abs(nc.trace() - 1.0) < 1e-12
