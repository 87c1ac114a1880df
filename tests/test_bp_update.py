"""BP simple update: full-rank gate layers are exact on trees AND
loops, single-bond truncation after a gate is Eckart-Young optimal,
and imaginary-time simple update finds the TFIM chain ground state."""

import numpy as np
import pytest

import jax.numpy as jnp

from contractn_tpu import TN, TNError, bp_apply_gates, gate_from_term

SX = np.array([[0.0, 1.0], [1.0, 0.0]])
SZ = np.array([[1.0, 0.0], [0.0, -1.0]])
I2 = np.eye(2)


def _tfim_bond(h, coord=2):
    """-ZZ - h/coord (X1 + 1X) as a (4,4) bond term."""
    return (-np.kron(SZ, SZ)
            - (h / coord) * (np.kron(SX, I2) + np.kron(I2, SX)))


def _chain_tn(rng, n, d, chi, complex_=True):
    tn = TN()
    for i in range(n):
        shape = [d]
        if i < n - 1:
            shape.append(chi)
        if i > 0:
            shape.append(chi)
        t = rng.standard_normal(tuple(shape))
        if complex_:
            t = t + 1j * rng.standard_normal(tuple(shape))
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n - 1):
        left_mode = 2 if i + 1 < n - 1 else 1
        tn.connect_nodes(f"s{i}", f"s{i+1}", 1, left_mode)
    return tn


def _ring_tn(rng, n, d, chi):
    tn = TN()
    for i in range(n):
        t = rng.standard_normal((d, chi, chi)) \
            + 1j * rng.standard_normal((d, chi, chi))
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n):
        tn.connect_nodes(f"s{i}", f"s{(i+1) % n}", 1, 2)
    return tn


def _dense_apply(psi, gate, i, j):
    """Apply gate(out_a,out_b,in_a,in_b) to dense psi on sites (i, j)."""
    out = np.tensordot(np.asarray(gate), psi, axes=[[2, 3], [i, j]])
    return np.moveaxis(out, (0, 1), (i, j))


@pytest.mark.parametrize("topology", ["chain", "ring"])
def test_full_rank_gate_layer_is_exact(topology):
    rng = np.random.default_rng(1)
    n, d = 5, 2
    if topology == "chain":
        tn = _chain_tn(rng, n, d, 2)
        pairs = [(0, 1), (2, 3), (1, 2), (3, 4)]
    else:
        tn = _ring_tn(rng, n, d, 2)
        pairs = [(0, 1), (2, 3), (4, 0), (1, 2)]
    psi = np.asarray(tn.contract())
    gate = gate_from_term(_tfim_bond(1.3), dt=0.37)
    gates = [(gate, f"s{i}", f"s{j}") for i, j in pairs]
    new, _ = bp_apply_gates(tn, gates, damping=0.2, max_iter=400)
    got = np.asarray(new.contract())
    want = psi
    for i, j in pairs:
        want = _dense_apply(want, gate, i, j)
    assert np.max(np.abs(got - want)) < 1e-8 * np.max(np.abs(want))


def test_truncated_gate_is_optimal_on_tree():
    """One entangling gate on a chain, capped bond: squared error equals
    the discarded Schmidt weight across that bond."""
    rng = np.random.default_rng(4)
    n, d = 4, 2
    tn = _chain_tn(rng, n, d, 2, complex_=False)
    psi = np.asarray(tn.contract())
    gate = gate_from_term(_tfim_bond(0.9), dt=0.9)
    want = _dense_apply(psi, gate, 1, 2)
    k = 2
    new, spectra = bp_apply_gates(tn, [(gate, "s1", "s2")], max_bond=k)
    got = np.asarray(new.contract())
    err2 = np.sum(np.abs(got - want) ** 2)
    s = np.linalg.svd(want.reshape(d ** 2, -1), compute_uv=False)
    discarded = np.sum(s[k:] ** 2)
    assert abs(err2 - discarded) < 1e-10 * max(discarded, 1e-12)
    assert len(spectra[1]) == k


def test_imaginary_time_simple_update_reaches_tfim_ground():
    """Trotterized imaginary time on a 6-site chain: energy within
    Trotter error of the dense ground state."""
    rng = np.random.default_rng(0)
    n, d, h = 6, 2, 1.2
    # dense Hamiltonian + ground energy
    H = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        H += np.kron(np.eye(2 ** i),
                     np.kron(-np.kron(SZ, SZ), np.eye(2 ** (n - i - 2))))
    for i in range(n):
        H += -h * np.kron(np.eye(2 ** i), np.kron(SX, np.eye(2 ** (n - i - 1))))
    e0 = np.linalg.eigvalsh(H)[0]

    # bond terms with the field split by interior coordination
    def bond(i):
        ca = 1 if i == 0 else 2
        cb = 1 if i == n - 2 else 2
        return (-np.kron(SZ, SZ) - h * np.kron(SX, I2) / ca
                - h * np.kron(I2, SX) / cb)

    tn = _chain_tn(rng, n, d, 2, complex_=False)
    dt = 0.1
    pairs = list(range(0, n - 1, 2)) + list(range(1, n - 1, 2))
    for _ in range(30):
        gates = [(gate_from_term(bond(i), dt, imaginary=True),
                  f"s{i}", f"s{i+1}") for i in pairs]
        tn, _ = bp_apply_gates(tn, gates, max_bond=8)
    psi = np.asarray(tn.contract()).reshape(-1)
    e = (psi @ H @ psi) / (psi @ psi)
    assert abs(e - e0) < 5e-3 * abs(e0)


def test_gate_shape_and_topology_errors():
    rng = np.random.default_rng(2)
    tn = _chain_tn(rng, 3, 2, 2)
    good = gate_from_term(_tfim_bond(1.0), 0.1)
    with pytest.raises(TNError):
        bp_apply_gates(tn, [(good, "s0", "s2")])  # not adjacent
    with pytest.raises(TNError):
        bp_apply_gates(tn, [(np.eye(4), "s0", "s1")])  # wrong shape
    with pytest.raises(TNError):
        bp_apply_gates(tn, [(good, "s0", "nope")])
    with pytest.raises(TNError):
        gate_from_term(np.eye(3), 0.1)
