"""Multi-site-cell VUMPS (models/vumps_cell.py).

Validation ladder: n=1 reduces to the single-site solver (same
energies on the TFIM, which is itself Pfeuty-pinned there); a 2-site
cell on a UNIFORM Hamiltonian reproduces the single-site energy
(translation invariance the algorithm does not impose); the dimerized
XX chain matches the exact Jordan-Wigner two-band integral natively at
d=2 (round 3 needed the folded d=4 block for this model).
"""

import numpy as np
import jax.numpy as jnp

from contractn_tpu.models.dmrg import tfim_mpo, xx_dimerized_mpo
from contractn_tpu.models.vumps import vumps
from contractn_tpu.models.vumps_cell import (
    mixed_gauge_cell,
    vumps_cell,
)


def _pfeuty_energy(h, nk=4001):
    k = np.linspace(-np.pi, np.pi, nk)
    return -0.5 * np.trapezoid(
        np.sqrt(1 + h * h - 2 * h * np.cos(k)), k) / (2 * np.pi) * 2


def test_mixed_gauge_cell_isometries():
    """Gauge conditions: AL left-isometric, AR right-isometric, and
    AL_i C_{i+1} == C_i AR_i per site (mixed-gauge consistency)."""
    rng = np.random.default_rng(0)
    cell = tuple(jnp.asarray(rng.standard_normal((d, 6, 6)))
                 for d in (2, 3))
    als, ars, cs = mixed_gauge_cell(cell, iters=200)
    n = len(cell)
    for i in range(n):
        al = np.asarray(als[i])
        ar = np.asarray(ars[i])
        d = al.shape[0]
        lsum = sum(al[s].T @ al[s] for s in range(d))
        rsum = sum(ar[s] @ ar[s].T for s in range(d))
        assert np.allclose(lsum, np.eye(6), atol=1e-10)
        assert np.allclose(rsum, np.eye(6), atol=1e-10)
        lhs = np.einsum("dij,jk->dik", al, np.asarray(cs[(i + 1) % n]))
        rhs = np.einsum("ij,djk->dik", np.asarray(cs[i]), ar)
        assert np.max(np.abs(lhs - rhs)) < 1e-8, i


def test_cell_n1_matches_single_site_tfim():
    h = 1.3
    w = tfim_mpo(2, h=h).cores[0]
    single = vumps(tfim_mpo(2, h=h), bond_dim=8, iters=40)
    multi = vumps_cell([w], bond_dim=8, iters=40)
    want = _pfeuty_energy(h)
    assert abs(single["energy"] - want) < 1e-6
    assert abs(multi["energy"] - single["energy"]) < 1e-8
    assert multi["gradient_norm"] < 1e-8


def test_cell_n2_uniform_translation_invariance():
    h = 0.7
    w = tfim_mpo(2, h=h).cores[0]
    single = vumps(tfim_mpo(2, h=h), bond_dim=8, iters=40)
    multi = vumps_cell([w, w], bond_dim=8, iters=40)
    assert abs(multi["energy"] - single["energy"]) < 1e-8
    # both cell sites converge to the same physics: equal bond spectra
    c0 = np.linalg.svd(np.asarray(multi["cs"][0]), compute_uv=False)
    c1 = np.linalg.svd(np.asarray(multi["cs"][1]), compute_uv=False)
    assert np.max(np.abs(c0 - c1)) < 1e-6


def test_cell_dimerized_xx_exact_band():
    """Native 2-site cell at d=2 == the exact JW two-band integral
    E/site = -(1/2) <|t1 + t2 e^{ik}|>_k."""
    j, delta = 1.0, 0.5
    mpo = xx_dimerized_mpo(4, j=j, delta=delta)
    cores = [mpo.cores[0], mpo.cores[1]]
    t1, t2 = j * (1 + delta) / 2, j * (1 - delta) / 2
    k = np.linspace(-np.pi, np.pi, 20001)
    want = -0.5 * np.mean(np.abs(t1 + t2 * np.exp(1j * k)))
    res = vumps_cell(cores, bond_dim=16, iters=60)
    assert res["gradient_norm"] < 1e-6
    assert abs(res["energy"] - want) < 2e-5
    # the two inequivalent bonds carry different entanglement (the
    # strong bond holds the dimer singlets): distinguishable spectra
    c0 = np.linalg.svd(np.asarray(res["cs"][0]), compute_uv=False)
    c1 = np.linalg.svd(np.asarray(res["cs"][1]), compute_uv=False)
    assert np.max(np.abs(c0 - c1)) > 1e-3


def test_cell_observables_match_single_site_oracle():
    """expect_local_cell / correlate_cell / static_structure_factor_
    cell on an n=1 cell == the transfer-spectrum-based umps oracle
    (different algorithm: the mixed gauge IS the fixed point, no
    leading-eigenvector solves), at 1e-10."""
    from contractn_tpu.models.umps import (
        correlate,
        static_structure_factor,
    )
    from contractn_tpu.models.vumps_cell import (
        correlate_cell,
        expect_local_cell,
        static_structure_factor_cell,
    )

    h = 1.5
    gs = vumps(tfim_mpo(2, j=1.0, h=h), bond_dim=8, iters=60)
    g1 = {"acs": (gs["ac"],), "ars": (gs["ar"],), "als": (gs["al"],),
          "cs": (gs["c"],)}
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sz = np.array([[1.0, 0.0], [0.0, -1.0]])
    assert abs(expect_local_cell(g1, sz, 0)) < 1e-10  # paramagnet
    cc = correlate_cell(g1, sx, sx, 0, [1, 3, 7])
    cu = correlate(gs["al"], sx, sx, [1, 3, 7])
    assert np.max(np.abs(np.asarray(cc) - np.asarray(cu))) < 1e-9
    ks = np.array([0.0, 1.0, 2.5])
    s_c = static_structure_factor_cell(g1, sx, ks, max_distance=40)
    s_u = static_structure_factor(gs["al"], sx, ks, max_distance=40)
    assert np.max(np.abs(s_c - s_u)) < 1e-9
