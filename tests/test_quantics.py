"""Quantics tensor-train numerics vs dense/numpy oracles.

Everything here is exact linear algebra, so the pins are tight: the
adder automata reproduce the dense permutation/sub-permutation
matrices entrywise, derivatives equal the dense finite-difference
stencils at 1e-12 (and the analytic derivative at the O(h^2) stencil
error), and the QFT circuit equals ``sqrt(N) ifft`` at 1e-12.
"""

import numpy as np

import jax.numpy as jnp

from contractn_tpu.models.boundary import apply_mpo_to_mps
from contractn_tpu.models.mps import MPS
from contractn_tpu.models.quantics import (
    adder_mpo,
    derivative_mpo,
    function_mps,
    grid,
    laplacian_mpo,
    position_mpo,
    qft_mps,
    quantics_integral,
    quantics_to_dense,
    reverse_mps,
    shift_mpo,
)


def _mpo_dense(mpo, n):
    cores = np.asarray(mpo.cores)
    cur = np.tensordot(np.asarray(mpo.left), cores[0], axes=(0, 2))
    for i in range(1, n):
        cur = np.einsum("abw,cdwv->acbdv", cur, cores[i])
        cur = cur.reshape(cur.shape[0] * cur.shape[1],
                          cur.shape[2] * cur.shape[3], -1)
    return np.tensordot(cur, np.asarray(mpo.right), axes=(2, 0))


def test_adder_matches_dense_permutations():
    n, big = 6, 64
    a3 = _mpo_dense(adder_mpo(n, 3), n)
    p3 = np.zeros((big, big))
    for y in range(big):
        p3[(y + 3) % big, y] = 1.0
    assert np.array_equal(a3, p3)

    ao = _mpo_dense(adder_mpo(n, 3, boundary="open"), n)
    po = np.zeros((big, big))
    for y in range(big - 3):
        po[y + 3, y] = 1.0
    assert np.array_equal(ao, po)

    am = _mpo_dense(adder_mpo(n, -5, boundary="open"), n)
    pm = np.zeros((big, big))
    for y in range(5, big):
        pm[y - 5, y] = 1.0
    assert np.array_equal(am, pm)


def test_function_roundtrip_and_shift():
    n = 6
    rng = np.random.default_rng(0)
    f = rng.standard_normal(2 ** n)
    fm = function_mps(f, n)
    assert np.max(np.abs(quantics_to_dense(fm) - f)) < 1e-12
    sm = apply_mpo_to_mps(shift_mpo(n, 2), fm)
    assert np.max(np.abs(quantics_to_dense(sm) - np.roll(f, -2))) < 1e-12
    rm = reverse_mps(fm)
    idx = ((np.arange(2 ** n)[:, None]
            >> (np.arange(n))[None, :]) & 1)  # bit-reversed order
    rev = f[(idx * (2 ** (n - 1 - np.arange(n)))[None, :]).sum(1)]
    assert np.max(np.abs(quantics_to_dense(rm) - rev)) < 1e-12


def test_calculus_mpos_on_sin():
    nb = 10
    x = grid(nb)
    s = np.sin(2 * np.pi * x)
    sf = function_mps(s, nb, cutoff=1e-13)
    assert sf.bond_dim == 2  # sin is exactly quantics rank 2
    h = 1.0 / 2 ** nb

    df = quantics_to_dense(apply_mpo_to_mps(derivative_mpo(nb), sf))
    fd = (np.roll(s, -1) - np.roll(s, 1)) / (2 * h)
    assert np.max(np.abs(df - fd)) < 1e-10  # exact stencil identity
    # analytic derivative at the stencil's O(h^2) error
    assert np.max(np.abs(df - 2 * np.pi * np.cos(2 * np.pi * x))) < 1e-4

    lap = quantics_to_dense(apply_mpo_to_mps(laplacian_mpo(nb), sf))
    assert np.max(np.abs(lap + (2 * np.pi) ** 2 * s)) < 2e-4

    px = quantics_to_dense(
        apply_mpo_to_mps(position_mpo(nb, (0.0, 2.0)), sf))
    assert np.max(np.abs(px - grid(nb, (0.0, 2.0)) * s)) < 1e-12

    val = quantics_integral(function_mps(s ** 2, nb))
    assert abs(val - 0.5) < 1e-12  # exact for a bandlimited integrand


def test_qft_matches_fft():
    n = 8
    rng = np.random.default_rng(3)
    g = rng.standard_normal(2 ** n) + 1j * rng.standard_normal(2 ** n)
    gm = MPS.from_dense(jnp.asarray(g), 2)
    got = quantics_to_dense(qft_mps(gm))
    want = np.sqrt(2 ** n) * np.fft.ifft(g)
    assert np.max(np.abs(got - want)) < 1e-12
    got_i = quantics_to_dense(qft_mps(gm, inverse=True))
    want_i = np.fft.fft(g) / np.sqrt(2 ** n)
    assert np.max(np.abs(got_i - want_i)) < 1e-12
    # low-rank in, low-rank out: a plane wave transforms to a delta
    k0 = 11
    wave = np.exp(2j * np.pi * k0 * np.arange(2 ** n) / 2 ** n)
    wm = function_mps(wave / np.sqrt(2 ** n), n, cutoff=1e-13)
    assert wm.bond_dim == 1
    delta = quantics_to_dense(qft_mps(wm, inverse=True))
    expect = np.zeros(2 ** n)
    expect[k0] = 1.0
    assert np.max(np.abs(delta - expect)) < 1e-12


def test_register_embedding_and_2d_poisson():
    """2D quantics: register-embedded operators act on their own bit
    register exactly, and the screened 2D Poisson equation solves to
    the dense oracle entrywise through the ALS solver."""
    from contractn_tpu.models.linsolve import mps_linear_solve
    from contractn_tpu.models.mpo import MPO, mpo_sum
    from contractn_tpu.models.quantics import (
        function_mps_2d,
        quantics_to_dense_2d,
        register_mpo,
    )

    nb = 4
    side = 2 ** nb
    x = grid(nb)

    # embedding oracle: shift acting on the x register only
    sh = register_mpo(shift_mpo(nb, 1), 2 * nb, 0)
    f2 = function_mps_2d(
        lambda xx, yy: np.sin(2 * np.pi * xx) + 0.3 * yy, nb)
    got = quantics_to_dense_2d(apply_mpo_to_mps(sh, f2))
    vals = np.sin(2 * np.pi * x)[:, None] + 0.3 * x[None, :]
    assert np.max(np.abs(got - np.roll(vals, -1, axis=0))) < 1e-12
    shy = register_mpo(shift_mpo(nb, 1), 2 * nb, nb)
    got_y = quantics_to_dense_2d(apply_mpo_to_mps(shy, f2))
    assert np.max(np.abs(got_y - np.roll(vals, -1, axis=1))) < 1e-12

    # separable function: rank 1 across the register cut
    fsep = function_mps_2d(
        lambda xx, yy: np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy),
        nb, cutoff=1e-13)
    assert fsep.bond_dim <= 2

    # screened 2D Poisson vs dense solve
    lap = laplacian_mpo(nb)
    lap2d = mpo_sum(register_mpo(MPO(lap.cores, -lap.left, lap.right),
                                 2 * nb, 0),
                    register_mpo(MPO(lap.cores, -lap.left, lap.right),
                                 2 * nb, nb))
    ident = MPO.identity(2 * nb, 2)
    a_op = mpo_sum(lap2d, MPO(ident.cores, 30.0 * ident.left,
                              ident.right))
    rhs_vals = (np.sin(2 * np.pi * x)[:, None]
                * np.cos(2 * np.pi * x)[None, :])
    rhs = function_mps_2d(rhs_vals, nb, cutoff=1e-13)
    u, _ = mps_linear_solve(a_op, rhs, sweeps=8, max_bond=8)

    dense_a = _mpo_dense(a_op, 2 * nb)
    u_exact = np.linalg.solve(dense_a, rhs_vals.reshape(-1))
    assert np.max(np.abs(quantics_to_dense_2d(u).reshape(-1)
                         - u_exact)) < 1e-9
    # continuum: u -> rhs / (2 (2 pi)^2 + 30) + O(h^2)
    cont = rhs_vals / (2 * (2 * np.pi) ** 2 + 30.0)
    assert np.max(np.abs(u_exact.reshape(side, side) - cont)) < 2e-2
