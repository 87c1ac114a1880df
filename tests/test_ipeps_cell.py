"""Checkerboard iPEPS: cross-path TFIM check and the 2D Heisenberg AFM.

Anchors: (1) one C4v simple-update TFIM state measured by BOTH the
symmetric and the directional-cell environments (independent code
paths, one number); (2) the Heisenberg antiferromagnet, where the
rotated (translation-invariant) and unrotated (Neel) formulations are
unitarily equivalent so their energies must coincide, and the D=2
simple-update energy/staggered moment must land in the known windows
(exact QMC: E = -0.669437, m = 0.307; best product state: -0.5,
m = 0.5; D=2 simple update sits between).
"""

import numpy as np

from contractn_tpu.models import (
    cell_energy,
    cell_site_expectations,
    heisenberg_bond_term_2d,
    ipeps_cell_ground_state,
    ipeps_ground_state,
    tfim_bond_term_2d,
)

SX = np.array([[0.0, 1.0], [1.0, 0.0]]) / 2.0
SZ = np.diag([0.5, -0.5])


def test_cell_energy_matches_c4v_path_on_tfim():
    h2 = tfim_bond_term_2d(1.0, 3.5)
    a_site, e_c4v = ipeps_ground_state(
        h2, bond_dim=2, chi=8,
        schedule=((0.1, 150), (0.02, 150), (0.005, 80)), iters=120,
    )
    a_np = np.asarray(a_site)
    e_cell = float(cell_energy(a_np, a_np, h2, chi=8, iters=120))
    assert np.isclose(e_cell, float(e_c4v), rtol=1e-10), (e_cell, e_c4v)


def test_heisenberg_neel_ground_state():
    """Unrotated Heisenberg on the two-site cell: energy in the D=2
    window, staggered moment alternating on the checkerboard."""
    h2 = heisenberg_bond_term_2d(rotated=False)
    a, b, e = ipeps_cell_ground_state(
        h2, bond_dim=2, chi=12,
        schedule=((0.1, 200), (0.02, 200), (0.005, 100)), iters=120,
    )
    e = float(np.real(e))
    assert -0.6695 < e < -0.64, e  # variational, near known D=2 value

    # SU(2) is broken in a run-dependent direction; measure x and z
    mx = cell_site_expectations(a, b, SX, chi=12, iters=120)
    mz = cell_site_expectations(a, b, SZ, chi=12, iters=120)
    mvec = [[np.hypot(float(np.real(mx[x][y])),
                      float(np.real(mz[x][y])))
             for y in range(2)] for x in range(2)]
    # full moment magnitude equal on all sites, in the D=2 window
    for x in range(2):
        for y in range(2):
            assert np.isclose(mvec[x][y], mvec[0][0], atol=1e-6)
    assert 0.25 < mvec[0][0] < 0.5, mvec[0][0]
    # staggering: the dominant component alternates in sign
    comp = mx if abs(float(np.real(mx[0][0]))) > abs(
        float(np.real(mz[0][0]))) else mz
    c = [[float(np.real(comp[x][y])) for y in range(2)]
         for x in range(2)]
    assert np.isclose(c[0][0], c[1][1], atol=1e-6)
    assert np.isclose(c[0][0], -c[0][1], atol=1e-6)
    assert np.isclose(c[0][1], c[1][0], atol=1e-6)


def test_heisenberg_rotated_frame_same_energy():
    """Sublattice rotation is a unitary: both formulations converge to
    the same energy per site."""
    kw = dict(bond_dim=2, chi=12,
              schedule=((0.1, 200), (0.02, 200), (0.005, 100)),
              iters=120)
    _, _, e_neel = ipeps_cell_ground_state(
        heisenberg_bond_term_2d(rotated=False), **kw)
    _, _, e_rot = ipeps_cell_ground_state(
        heisenberg_bond_term_2d(rotated=True), **kw)
    assert np.isclose(float(np.real(e_neel)), float(np.real(e_rot)),
                      rtol=1e-6), (e_neel, e_rot)


def test_rotated_bond_term_is_unitary_image():
    """The rotated term is exactly (1 x U) h2 (1 x U)^dagger with
    U = exp(-i pi S_y): same spectrum, real matrix."""
    h2 = heisenberg_bond_term_2d(rotated=False)
    h2r = heisenberg_bond_term_2d(rotated=True)
    u = np.array([[0.0, -1.0], [1.0, 0.0]])  # exp(-i pi Sy)
    w = np.kron(np.eye(2), u)
    assert np.allclose(w @ h2 @ w.T, h2r, atol=1e-12)
    assert np.allclose(np.sort(np.linalg.eigvalsh(h2)),
                       np.sort(np.linalg.eigvalsh(h2r)), atol=1e-12)
    assert np.isrealobj(h2r)


def test_ipeps_cell_scan_matches_unbatched_and_sees_transition():
    """One jit(vmap) program over a family of 2D TFIM fields: energies
    bit-identical to the unbatched pipeline, and the magnetization
    order parameter distinguishes the phases across h_c ~ 3.04."""
    from contractn_tpu.models.ipeps_cell import ipeps_cell_scan

    hs = [2.0, 3.5]
    h2s = np.stack([np.asarray(tfim_bond_term_2d(1.0, h)) for h in hs])
    sz = np.diag([1.0, -1.0])
    out = ipeps_cell_scan(h2s, bond_dim=2, chi=8,
                          schedule=((0.1, 100), (0.02, 100)),
                          iters=100, ops=(sz,))
    for i, h in enumerate(hs):
        _, _, e = ipeps_cell_ground_state(
            tfim_bond_term_2d(1.0, h), 2, 8,
            schedule=((0.1, 100), (0.02, 100)), iters=100)
        assert np.isclose(float(out["energy"][i]), float(np.real(e)),
                          rtol=1e-12)
    mz = np.abs(np.asarray(out["moments"])[:, 0])
    assert mz[0] > 0.5  # ordered at h = 2.0
    assert mz[1] < 1e-3  # paramagnetic at h = 3.5
