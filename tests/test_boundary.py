"""Boundary-MPS PEPS contraction vs the exact engine (BASELINE stretch)."""

import numpy as np
import pytest

from contractn_tpu.models.boundary import apply_mpo_to_mps, boundary_contract
from contractn_tpu.models.peps import peps_tn


def test_apply_mpo_identity():
    import jax
    import jax.numpy as jnp

    from contractn_tpu.models import MPO, MPS
    from tests.test_models import dense_mps_vector

    mps = MPS.random(jax.random.PRNGKey(0), 4, 2, 3, dtype=jnp.float64)
    mpo = MPO.identity(4, 2)
    out = apply_mpo_to_mps(mpo, mps)
    assert np.allclose(
        dense_mps_vector(out), dense_mps_vector(mps), rtol=1e-10
    )


@pytest.mark.parametrize("rows,cols", [(3, 3), (4, 4)])
def test_boundary_matches_exact_random(rows, cols):
    rng = np.random.default_rng(0)
    tn, grid = peps_tn(rows, cols, bond_dim=2, rng=rng)
    exact = float(np.asarray(tn.contract(backend="numpy")))
    val, log = boundary_contract(tn, grid, chi=None)
    approx = float(val) * np.exp(float(log))
    assert np.isclose(approx, exact, rtol=1e-8)


def test_boundary_truncated_is_close():
    rng = np.random.default_rng(1)
    tn, grid = peps_tn(4, 4, bond_dim=2, rng=rng)
    exact = float(np.asarray(tn.contract(backend="numpy")))
    val, log = boundary_contract(tn, grid, chi=4)
    approx = float(val) * np.exp(float(log))
    # chi=4 on a bond-2 4x4 grid captures nearly all weight
    assert np.isclose(approx, exact, rtol=1e-3)


def test_peps_norm_matches_dense():
    from contractn_tpu.models.boundary import peps_norm

    rng = np.random.default_rng(2)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    amps = np.asarray(tn.contract(backend="numpy")).reshape(-1)
    exact = float(np.sum(amps ** 2))
    val, log = peps_norm(tn, grid, chi=None)
    assert np.isclose(float(val) * np.exp(float(log)), exact, rtol=1e-8)


def test_peps_norm_truncated_3x3():
    from contractn_tpu.models.boundary import peps_norm

    rng = np.random.default_rng(3)
    tn, grid = peps_tn(3, 3, bond_dim=2, phys_dim=2, rng=rng)
    amps = np.asarray(tn.contract(backend="numpy")).reshape(-1)
    exact = float(np.sum(amps ** 2))
    val, log = peps_norm(tn, grid, chi=8)
    approx = float(val) * np.exp(float(log))
    assert np.isclose(approx, exact, rtol=1e-2)


def test_peps_norm_rejects_closed_grid():
    from contractn_tpu.models.boundary import peps_norm

    tn, grid = peps_tn(3, 3, bond_dim=2)
    with pytest.raises(ValueError):
        peps_norm(tn, grid)


def test_boundary_large_grid_no_overflow():
    """8x8 all-ones grid: value is 2^(#bonds) = 2^112 — far beyond f64
    comfort for naive accumulation chains; split format stays exact."""
    tn, grid = peps_tn(8, 8, bond_dim=2)
    val, log = boundary_contract(tn, grid, chi=8)
    n_bonds = 2 * 8 * 7
    assert np.isclose(float(log) + np.log(abs(float(val))),
                      n_bonds * np.log(2.0), rtol=1e-6)


def test_boundary_complex_grid_matches_exact():
    """Complex closed grids must use the bilinear closing pairing (no
    conjugation) — regression for the round-1 advisor's high finding."""
    rng = np.random.default_rng(7)
    tn, grid = peps_tn(3, 3, bond_dim=2, rng=rng)
    for row in grid:
        for node in row:
            t = np.asarray(node.tensor)
            node.tensor = t + 1j * rng.standard_normal(t.shape)
    exact = complex(np.asarray(tn.contract(backend="numpy")))
    val, log = boundary_contract(tn, grid, chi=None)
    approx = complex(val) * np.exp(float(log))
    assert np.isclose(approx, exact, rtol=1e-8)


def test_peps_norm_complex_grid():
    from contractn_tpu.models.boundary import peps_norm

    rng = np.random.default_rng(8)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    for row in grid:
        for node in row:
            t = np.asarray(node.tensor)
            node.tensor = t + 1j * rng.standard_normal(t.shape)
    amps = np.asarray(tn.contract(backend="numpy")).reshape(-1)
    exact = float(np.sum(np.abs(amps) ** 2))
    val, log = peps_norm(tn, grid, chi=None)
    got = complex(val) * np.exp(float(log))
    assert abs(got.imag) < 1e-8 * abs(got.real)
    assert np.isclose(got.real, exact, rtol=1e-8)


def test_scanned_sweep_matches_host_sweep():
    """The device-side scan-of-scans sweep must reproduce the host-loop
    sweep (same per-row truncations) and stay close to exact."""
    from contractn_tpu.models.boundary import (
        _boundary_sweep,
        _boundary_sweep_scanned,
        _padded_site,
    )

    rng = np.random.default_rng(11)
    tn, grid = peps_tn(5, 5, bond_dim=2, rng=rng)
    rows, cols = 5, 5
    tg = [[_padded_site(grid, r, c, rows, cols) for c in range(cols)]
          for r in range(rows)]

    for chi in (4, 8):
        vh, lh = _boundary_sweep(tg, chi)
        vs, ls = _boundary_sweep_scanned(tg, chi)
        host = float(vh) * np.exp(float(lh))
        scanned = float(vs) * np.exp(float(ls))
        assert np.isclose(scanned, host, rtol=1e-8), (chi, scanned, host)

    exact = float(np.asarray(tn.contract(backend="numpy")))
    v, log = boundary_contract(tn, grid, chi=8)
    assert np.isclose(float(v) * np.exp(float(log)), exact, rtol=1e-6)


def test_scanned_sweep_complex():
    from contractn_tpu.models.boundary import (
        _boundary_sweep,
        _boundary_sweep_scanned,
        _padded_site,
    )

    rng = np.random.default_rng(12)
    tn, grid = peps_tn(4, 4, bond_dim=2, rng=rng)
    for row in grid:
        for node in row:
            t = np.asarray(node.tensor)
            node.tensor = t + 1j * rng.standard_normal(t.shape)
    tg = [[_padded_site(grid, r, c, 4, 4) for c in range(4)]
          for r in range(4)]
    vh, lh = _boundary_sweep(tg, 6)
    vs, ls = _boundary_sweep_scanned(tg, 6)
    host = complex(vh) * np.exp(float(lh))
    scanned = complex(vs) * np.exp(float(ls))
    assert np.isclose(scanned, host, rtol=1e-8)


def test_scanned_sweep_large_grid_no_overflow():
    """A 16x16 all-ones grid: value is astronomically large; the scanned
    split-format sweep keeps it finite and matches the 2D Ising-like
    closed form growth qualitatively (finite log, mantissa O(1))."""
    tn, grid = peps_tn(16, 16, bond_dim=2, fill=0.7)
    v, log = boundary_contract(tn, grid, chi=8)
    assert np.isfinite(float(v)) and np.isfinite(float(log))
    assert abs(float(v)) > 0


def test_peps_expectation_matches_dense_oracle():
    """One-site observables of a random open PEPS via two boundary
    sweeps == the dense contraction of the same network (row-major
    dangler order pins the flat-index mapping)."""
    from contractn_tpu.models.boundary import peps_expectation

    rng = np.random.default_rng(0)
    tn, grid = peps_tn(2, 3, bond_dim=2, phys_dim=2, rng=rng)
    psi = np.asarray(tn.contract(split_format=False)).reshape(-1)
    sz = np.diag([1.0, -1.0])
    for site, flat in [((0, 0), 0), ((1, 2), 5), ((0, 1), 1)]:
        got = complex(np.asarray(peps_expectation(tn, grid, sz, site)))
        op_full = np.eye(1)
        for k in range(6):
            op_full = np.kron(op_full, sz if k == flat else np.eye(2))
        want = (psi.conj() @ op_full @ psi) / (psi.conj() @ psi)
        assert abs(got - want) < 1e-12, (site, got, want)
    import pytest

    with pytest.raises(ValueError):
        peps_expectation(tn, grid, sz, (5, 0))


def test_peps_expectation_single_row_and_column_grids():
    """1xN and Nx1 open grids are valid (interior sites have 2 virtual
    legs, not the corner table's 3) and match the dense oracle —
    regression for the round-2 advisor finding on ``_double_layer_site``.
    """
    from contractn_tpu.models.boundary import peps_expectation

    sz = np.diag([1.0, -1.0])
    for rows, cols in [(1, 4), (4, 1), (1, 1)]:
        rng = np.random.default_rng(7 * rows + cols)
        tn, grid = peps_tn(rows, cols, bond_dim=2, phys_dim=2, rng=rng)
        psi = np.asarray(tn.contract(split_format=False)).reshape(-1)
        n = rows * cols
        for site, flat in [((0, 0), 0), ((rows - 1, cols - 1), n - 1)]:
            got = complex(np.asarray(peps_expectation(tn, grid, sz, site)))
            op_full = np.eye(1)
            for k in range(n):
                op_full = np.kron(op_full, sz if k == flat else np.eye(2))
            want = (psi.conj() @ op_full @ psi) / (psi.conj() @ psi)
            assert abs(got - want) < 1e-10, (rows, cols, site, got, want)
