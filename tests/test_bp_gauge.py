"""BP gauging: exact Schmidt spectra on trees, exact state preservation
on trees AND loopy graphs, optimal single-bond truncation, BP norm."""

import numpy as np
import pytest

import jax.numpy as jnp

from contractn_tpu import TN, TNError, bp_gauge, bp_norm, bp_truncate


def _chain_tn(rng, n, d, chis, complex_=True):
    """Open-boundary MPS as a TN: node i has modes (phys[, right][, left])
    in add order (left bond connected second)."""
    tn = TN()
    tensors = []
    for i in range(n):
        shape = [d]
        if i < n - 1:
            shape.append(chis[i])
        if i > 0:
            shape.append(chis[i - 1])
        t = rng.standard_normal(tuple(shape))
        if complex_:
            t = t + 1j * rng.standard_normal(tuple(shape))
        tensors.append(t)
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n - 1):
        left_mode = 2 if i + 1 < n - 1 else 1
        tn.connect_nodes(f"s{i}", f"s{i+1}", 1, left_mode)
    return tn


def _dense_state(tn):
    return np.asarray(tn.contract())


def _exact_bond_spectrum(psi, d, cut):
    """Schmidt values across bond `cut` (between site cut and cut+1)."""
    mat = psi.reshape(d ** (cut + 1), -1)
    s = np.linalg.svd(mat, compute_uv=False)
    s = s[s > 1e-14 * s[0]]
    return s / np.linalg.norm(s)


@pytest.mark.parametrize("seed", [0, 1])
def test_gauge_spectra_match_dense_schmidt_on_chain(seed):
    rng = np.random.default_rng(seed)
    n, d = 6, 2
    chis = [3, 4, 5, 4, 3]
    tn = _chain_tn(rng, n, d, chis)
    psi = _dense_state(tn)
    _, spectra = bp_gauge(tn)
    assert len(spectra) == n - 1
    for cut, s_bp in enumerate(spectra):
        s_exact = _exact_bond_spectrum(psi, d, cut)
        s_bp = np.asarray(s_bp)
        s_bp = s_bp[s_bp > 1e-12]
        assert s_bp.shape == s_exact.shape
        assert np.max(np.abs(np.sort(s_bp)[::-1] - s_exact)) < 1e-10


def test_gauge_preserves_state_on_chain():
    rng = np.random.default_rng(7)
    tn = _chain_tn(rng, 5, 2, [2, 3, 3, 2])
    psi = _dense_state(tn)
    gauged, _ = bp_gauge(tn)
    psi2 = _dense_state(gauged)
    assert np.max(np.abs(psi2 - psi)) < 1e-10 * np.max(np.abs(psi))


def _ring_tn(rng, n, d, chi):
    """Periodic MPS (single loop) — BP is approximate for spectra but
    gauging must still be an exact state transformation."""
    tn = TN()
    for i in range(n):
        t = rng.standard_normal((d, chi, chi)) \
            + 1j * rng.standard_normal((d, chi, chi))
        tn.add_dense_node(t, name=f"s{i}")
    for i in range(n):
        tn.connect_nodes(f"s{i}", f"s{(i+1) % n}", 1, 2)
    return tn


def test_gauge_preserves_state_on_loop():
    rng = np.random.default_rng(3)
    tn = _ring_tn(rng, 4, 2, 2)
    psi = _dense_state(tn)
    gauged, spectra = bp_gauge(tn, max_iter=400, damping=0.2)
    psi2 = _dense_state(gauged)
    assert np.max(np.abs(psi2 - psi)) < 1e-8 * np.max(np.abs(psi))
    for s in spectra:
        assert abs(float(jnp.linalg.norm(s)) - 1.0) < 1e-10


def test_truncate_single_bond_is_optimal_on_tree():
    """One oversize middle bond: squared truncation error == discarded
    sum(S^2) — the Eckart-Young optimum across that cut."""
    rng = np.random.default_rng(11)
    n, d = 4, 2
    chis = [2, 6, 2]
    tn = _chain_tn(rng, n, d, chis)
    psi = _dense_state(tn)
    k = 3
    trunc, spectra = bp_truncate(tn, max_bond=k)
    psi_k = _dense_state(trunc)
    err2 = np.sum(np.abs(psi - psi_k) ** 2)
    # exact discarded weight, unnormalized
    mat = psi.reshape(d ** 2, -1)
    s_full = np.linalg.svd(mat, compute_uv=False)
    want = np.sum(s_full[k:] ** 2)
    assert abs(err2 - want) < 1e-10 * max(want, 1e-12)
    # untouched small bonds keep full rank
    assert len(spectra[0]) == 2 and len(spectra[2]) == 2
    assert len(spectra[1]) == k


def test_truncate_cutoff_drops_null_directions():
    """A bond padded with an exact zero direction is trimmed by cutoff."""
    rng = np.random.default_rng(5)
    tn = TN()
    a = rng.standard_normal((2, 3))
    b = np.zeros((2, 3))
    b[:, :2] = rng.standard_normal((2, 2))
    a[:, 2] = 0.0  # third bond direction dead on both sides
    tn.add_dense_node(a, name="a")
    tn.add_dense_node(b, name="b")
    tn.connect_nodes("a", "b", 1, 1)
    psi = _dense_state(tn)
    trunc, spectra = bp_truncate(tn, max_bond=8, cutoff=1e-10)
    assert len(spectra[0]) == 2
    psi2 = _dense_state(trunc)
    assert np.max(np.abs(psi2 - psi)) < 1e-10 * np.max(np.abs(psi))


def test_bp_norm_exact_on_tree():
    rng = np.random.default_rng(9)
    tn = _chain_tn(rng, 5, 2, [2, 3, 3, 2])
    psi = _dense_state(tn)
    want = np.sum(np.abs(psi) ** 2)
    m, log = bp_norm(tn)
    got = complex(m * jnp.exp(log))
    assert abs(got.imag) < 1e-10 * abs(got.real)
    assert abs(got.real - want) < 1e-10 * want


def test_bp_gauge_rejects_copy_and_input_nodes():
    tn = TN()
    hub = tn.add_copy_node(3, dim=2)
    for i in range(3):
        tn.connect_nodes(hub, tn.add_dense_node(np.ones((2, 2))), i, 0)
    with pytest.raises(TNError):
        bp_gauge(tn)
    tn2 = TN()
    tn2.add_input_node((2, 2))
    tn2.add_dense_node(np.ones((2, 2)))
    tn2.connect_nodes(tn2.nodes()[0], tn2.nodes()[1], 0, 0)
    with pytest.raises(TNError):
        bp_norm(tn2)
