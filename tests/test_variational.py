"""Degeneracy-safe autodiff linalg + variational iPEPS.

The VJP rules are pinned against the stock gradients on non-degenerate
inputs and against finite differences of gauge-invariant losses on
exactly degenerate spectra (where the stock rules are NaN).  The
variational optimizer must strictly improve the simple-update energy of
the near-critical 2D TFIM at fixed (D, chi) with a monotone trace.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.ops.linalg_ad import eigh_safe, svd_safe


def test_eigh_safe_matches_stock_when_nondegenerate():
    rng = np.random.default_rng(0)
    m0 = rng.normal(size=(6, 6))
    m0 = 0.5 * (m0 + m0.T)

    def loss(m, safe):
        f = eigh_safe if safe else jnp.linalg.eigh
        w, v = f(0.5 * (m + m.T))
        return jnp.sum(w ** 2) + jnp.sum(jnp.abs(v[:, -1]) ** 3)

    g_stock = jax.grad(loss)(jnp.asarray(m0), False)
    g_safe = jax.grad(loss)(jnp.asarray(m0), True)
    assert np.allclose(np.asarray(g_stock), np.asarray(g_safe),
                       atol=1e-10)


def test_eigh_safe_degenerate_matches_finite_differences():
    """Gauge-invariant loss (subspace projector) on an exactly
    degenerate spectrum: stock eigh gradient is NaN, the broadened one
    equals finite differences."""

    def loss(m, safe):
        f = eigh_safe if safe else jnp.linalg.eigh
        w, v = f(0.5 * (m + m.T))
        p = v[:, -2:] @ v[:, -2:].T
        tgt = jnp.arange(9.0).reshape(3, 3)
        return jnp.sum(p * tgt) + jnp.sum(w ** 3)

    md = jnp.asarray(np.diag([1.0, 2.0, 2.0]))
    assert np.any(np.isnan(np.asarray(jax.grad(loss)(md, False))))
    g_safe = np.asarray(jax.grad(loss)(md, True))
    assert not np.any(np.isnan(g_safe))
    eps = 1e-6
    for i in range(3):
        for j in range(3):
            e = np.zeros((3, 3))
            e[i, j] = eps
            fd = (loss(md + e, True) - loss(md - e, True)) / (2 * eps)
            assert np.isclose(g_safe[i, j], float(fd), atol=1e-6)


def test_svd_safe_matches_stock_when_nondegenerate():
    rng = np.random.default_rng(1)
    a0 = jnp.asarray(rng.normal(size=(7, 4)))

    def loss(a, safe):
        if safe:
            u, s, vh = svd_safe(a)
        else:
            u, s, vh = jnp.linalg.svd(a, full_matrices=False)
        return (jnp.sum(s ** 2) + jnp.sum(u[:, 0] ** 3)
                + jnp.sum(vh[0] ** 3) + jnp.sum(jnp.abs(u[:, 1] * s[1])))

    g_stock = jax.grad(loss)(a0, False)
    g_safe = jax.grad(loss)(a0, True)
    assert np.allclose(np.asarray(g_stock), np.asarray(g_safe),
                       atol=1e-10)
    # degenerate singular values: stock NaN, safe finite
    ad = jnp.asarray(np.diag([2.0, 2.0, 1.0]))
    assert np.any(np.isnan(np.asarray(jax.grad(loss)(ad, False))))
    assert not np.any(np.isnan(np.asarray(jax.grad(loss)(ad, True))))


def test_variational_ipeps_beats_simple_update():
    from contractn_tpu.models.ipeps import (
        ipeps_ground_state,
        tfim_bond_term_2d,
    )
    from contractn_tpu.models.variational import variational_ipeps

    h2 = tfim_bond_term_2d(1.0, 3.0)  # near h_c ~ 3.044
    _, e_su = ipeps_ground_state(
        h2, bond_dim=2, chi=8,
        schedule=((0.1, 150), (0.02, 150), (0.005, 80)), iters=150)
    _, e_var, trace = variational_ipeps(h2, bond_dim=2, chi=8,
                                        steps=120, lr=3e-3)
    e_su = float(e_su)
    assert not np.any(np.isnan(trace))
    # starts at the simple-update energy (same measurement machinery)
    assert np.isclose(trace[0], e_su, atol=1e-6)
    # strict improvement; near-monotone (Adam may micro-oscillate),
    # converged at the tail
    assert e_var < e_su - 1e-4, (e_var, e_su)
    assert all(b <= a + 1e-4 for a, b in zip(trace, trace[1:]))
    assert trace[-1] < trace[0] - 1e-4
    assert abs(trace[-1] - trace[-10]) < 1e-5


def test_variational_cell_beats_simple_update_heisenberg():
    """Checkerboard gradient flow through the directional cell CTMRG
    (svd_safe adjoints in the projectors): strictly improves the
    two-site-cell simple-update Heisenberg energy while staying above
    the exact QMC bound -0.669437."""
    from contractn_tpu.models.ipeps import heisenberg_bond_term_2d
    from contractn_tpu.models.ipeps_cell import ipeps_cell_ground_state
    from contractn_tpu.models.variational import variational_ipeps_cell

    h2 = heisenberg_bond_term_2d(rotated=False)
    _, _, e_su = ipeps_cell_ground_state(
        h2, bond_dim=2, chi=8,
        schedule=((0.1, 150), (0.02, 150), (0.005, 80)), iters=100)
    e_su = float(np.real(e_su))
    _, _, e_var, trace = variational_ipeps_cell(
        h2, bond_dim=2, chi=8, steps=60, lr=3e-3, env_iters=100)
    assert not np.any(np.isnan(trace))
    assert np.isclose(trace[0], e_su, atol=1e-4)  # starts at the SU state
    assert e_var < e_su - 1e-3, (e_var, e_su)
    assert e_var > -0.669437 - 1e-9  # variational bound (exact QMC)
    assert all(b <= a + 1e-4 for a, b in zip(trace, trace[1:]))


def _complex_fd(loss, m0, g, atol):
    """Check a JAX complex gradient elementwise against central finite
    differences (convention: d/dRe = Re(g), d/dIm = -Im(g))."""
    eps = 1e-6
    n, k = m0.shape
    for i in range(n):
        for j in range(k):
            e = np.zeros((n, k), complex)
            e[i, j] = eps
            fd_re = (loss(m0 + e) - loss(m0 - e)) / (2 * eps)
            fd_im = (loss(m0 + 1j * e) - loss(m0 - 1j * e)) / (2 * eps)
            assert np.isclose(float(fd_re), np.real(g[i, j]),
                              atol=atol), (i, j)
            assert np.isclose(float(fd_im), -np.imag(g[i, j]),
                              atol=atol), (i, j)


def test_eigh_safe_complex_matches_stock_when_nondegenerate():
    """Complex-Hermitian input (round 3): the broadened VJP equals the
    stock complex eigh gradient away from degeneracies."""
    rng = np.random.default_rng(4)
    m0 = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5))
    m0 = jnp.asarray(0.5 * (m0 + m0.conj().T))

    def loss(m, safe):
        f = eigh_safe if safe else jnp.linalg.eigh
        w, v = f(0.5 * (m + m.conj().T))
        p = v[:, -2:] @ v[:, -2:].conj().T  # gauge-invariant projector
        tgt = jnp.arange(25.0).reshape(5, 5)
        return jnp.sum(jnp.real(p) * tgt) + jnp.sum(w ** 2)

    g_stock = jax.grad(lambda m: loss(m, False))(m0)
    g_safe = jax.grad(lambda m: loss(m, True))(m0)
    assert np.allclose(np.asarray(g_stock), np.asarray(g_safe),
                       atol=1e-9)


def test_eigh_safe_complex_degenerate_matches_finite_differences():
    """Exactly degenerate complex-Hermitian spectrum: stock gradient is
    NaN, the broadened one matches finite differences of a
    gauge-invariant loss to 1e-6."""

    def loss(m, safe=True):
        f = eigh_safe if safe else jnp.linalg.eigh
        w, v = f(0.5 * (m + jnp.conj(m.T)))
        p = v[:, -2:] @ jnp.conj(v[:, -2:].T)
        tgt = jnp.arange(9.0).reshape(3, 3)
        return jnp.sum(jnp.real(p) * tgt) + jnp.sum(w ** 3)

    md_exact = jnp.asarray(np.diag([1.0, 2.0, 2.0]).astype(complex))
    assert np.any(np.isnan(np.asarray(
        jax.grad(lambda m: loss(m, False))(md_exact))))
    g_safe = np.asarray(jax.grad(loss)(md_exact))
    assert not np.any(np.isnan(g_safe))
    _complex_fd(lambda m: float(loss(jnp.asarray(m))),
                np.asarray(md_exact), g_safe, atol=1e-6)


def test_svd_safe_complex_matches_stock_and_finite_differences():
    """Complex rectangular input: equals the stock complex SVD gradient
    when nondegenerate; finite and FD-correct on degenerate spectra
    where stock is NaN."""
    rng = np.random.default_rng(5)
    a0 = jnp.asarray(rng.normal(size=(6, 4))
                     + 1j * rng.normal(size=(6, 4)))

    def loss(a, safe):
        if safe:
            u, s, vh = svd_safe(a)
        else:
            u, s, vh = jnp.linalg.svd(a, full_matrices=False)
        # gauge-invariant pieces: singular values + |entries| of the
        # partial isometry over the top-2 subspace (invariant under the
        # joint U(2) gauge rotation of a degenerate pair — a rank-1
        # factor would make the PRIMAL discontinuous at degeneracy and
        # FD meaningless)
        r2 = u[:, :2] @ vh[:2, :]
        tgt = jnp.arange(float(r2.size)).reshape(r2.shape)
        return jnp.sum(s ** 2) + jnp.sum(jnp.abs(r2) ** 2 * tgt)

    g_stock = jax.grad(lambda a: loss(a, False))(a0)
    g_safe = jax.grad(lambda a: loss(a, True))(a0)
    assert np.allclose(np.asarray(g_stock), np.asarray(g_safe),
                       atol=1e-9)

    ad = np.zeros((4, 3), complex)
    ad[:3, :3] = np.diag([2.0, 2.0, 1.0])
    ad[0, 1] = 0.05j
    ad[1, 0] = 0.05j
    adx = jnp.asarray(np.diag([2.0, 2.0, 1.0]).astype(complex))
    assert np.any(np.isnan(np.asarray(
        jax.grad(lambda a: loss(a, False))(adx))))
    g_deg = np.asarray(jax.grad(lambda a: loss(a, True))(adx))
    assert not np.any(np.isnan(g_deg))
    _complex_fd(lambda a: float(loss(jnp.asarray(a), True)),
                np.asarray(adx), g_deg, atol=1e-5)


def test_variational_cell_complex_hamiltonian_converges():
    """Time-reversal-breaking (complex Hermitian) Hamiltonian: the cell
    variational flow runs in complex128 end-to-end — complex simple
    update, biorthogonal cell CTMRG, conjugated-gradient Adam — and
    strictly improves the simple-update energy with a stable trace.
    The C4v path raises instead (symmetric-corner eigh is real-only)."""
    import pytest

    from contractn_tpu.models.ipeps import tfim_bond_term_2d
    from contractn_tpu.models.ipeps_cell import ipeps_cell_ground_state
    from contractn_tpu.models.variational import (
        variational_ipeps,
        variational_ipeps_cell,
    )

    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    h2 = np.asarray(tfim_bond_term_2d(1.0, 3.0)).astype(complex)
    h2 = h2 + 0.15 * (np.kron(sx, sy) + np.kron(sy, sx))
    assert np.allclose(h2, h2.conj().T)
    sched = ((0.1, 60), (0.02, 40))

    _, _, e_su = ipeps_cell_ground_state(
        h2, bond_dim=2, chi=8, schedule=sched, iters=60,
        dtype=jnp.complex128)
    e_su = float(np.real(np.asarray(e_su)))
    _, _, e_var, trace = variational_ipeps_cell(
        jnp.asarray(h2), bond_dim=2, chi=8, steps=25, lr=3e-3,
        su_schedule=sched, env_iters=60, dtype=jnp.complex128)
    trace = np.asarray(trace)
    assert np.all(np.isfinite(trace))
    assert np.isclose(trace[0], e_su, atol=1e-4)
    assert e_var < e_su - 1e-6, (e_var, e_su)
    # near-monotone (Adam micro-oscillates), same tolerance as the
    # real-dtype optimizer tests
    assert all(b <= a + 1e-4 for a, b in zip(trace, trace[1:]))

    with pytest.raises(TypeError, match="complex"):
        variational_ipeps(jnp.asarray(h2), bond_dim=2, chi=8,
                          steps=2, dtype=jnp.complex128)
