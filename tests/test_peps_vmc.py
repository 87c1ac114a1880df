"""PEPS VMC estimators: exact identities, FD gradients, optimization.

Correctness is pinned DETERMINISTICALLY: feeding every configuration
with its Born weight must reproduce the dense Rayleigh quotient and
its finite-difference gradient exactly — no stochastic assertions on
the correctness path.  The sampled path gets a statistical
consistency check at a wide bar.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contractn_tpu.models.peps_vmc import (
    fit_peps_vmc,
    local_energy,
    peps_log_amp,
    vmc_energy_and_grad,
)


def _rand_grid(key, rows, cols, d, bond):
    grid = []
    keys = jax.random.split(key, rows * cols)
    for r in range(rows):
        row = []
        for c in range(cols):
            u = bond if r > 0 else 1
            left = bond if c > 0 else 1
            dn = bond if r < rows - 1 else 1
            rr = bond if c < cols - 1 else 1
            row.append(jax.random.normal(
                keys[r * cols + c], (d, u, left, dn, rr),
                jnp.float64))
        grid.append(row)
    return grid


def _dense_psi_2x3(grid):
    t = [[np.asarray(x) for x in row] for row in grid]
    return np.einsum(
        t[0][0][:, 0, 0, :, :], [0, 6, 7],
        t[0][1][:, 0, :, :, :], [1, 7, 8, 9],
        t[0][2][:, 0, :, :, 0], [2, 9, 10],
        t[1][0][:, :, 0, 0, :], [3, 6, 11],
        t[1][1][:, :, :, 0, :], [4, 8, 11, 12],
        t[1][2][:, :, :, 0, 0], [5, 10, 12],
        [0, 1, 2, 3, 4, 5],
    ).reshape(-1)


def _dense_psi_2x2(grid):
    t = [[np.asarray(x) for x in row] for row in grid]
    return np.einsum(
        t[0][0][:, 0, 0, :, :], [0, 4, 5],
        t[0][1][:, 0, :, :, 0], [1, 5, 6],
        t[1][0][:, :, 0, 0, :], [2, 4, 7],
        t[1][1][:, :, :, 0, 0], [3, 6, 7],
        [0, 1, 2, 3],
    ).reshape(-1)


def _dense_h(rows, cols, h2h, h2v, d=2):
    n = rows * cols
    dim = d ** n
    ham = np.zeros((dim, dim))

    def embed(h2, i, j):
        # two-site term on flat (row-major) sites i < j
        op = h2.reshape(d, d, d, d)
        full = np.zeros((dim, dim))
        for a in range(dim):
            digits = [(a // d ** (n - 1 - k)) % d for k in range(n)]
            for x in range(d):
                for y in range(d):
                    dg = list(digits)
                    si, sj = dg[i], dg[j]
                    dg[i], dg[j] = x, y
                    b = 0
                    for v in dg:
                        b = b * d + v
                    full[b, a] += op[x, y, si, sj]
        return full

    for r in range(rows):
        for c in range(cols - 1):
            ham += embed(np.asarray(h2h), r * cols + c, r * cols + c + 1)
    for r in range(rows - 1):
        for c in range(cols):
            ham += embed(np.asarray(h2v), r * cols + c, (r + 1) * cols + c)
    return ham


def _all_cfgs(rows, cols, d=2):
    n = rows * cols
    idx = np.arange(d ** n)
    out = np.zeros((d ** n, n), np.int32)
    for k in range(n):
        out[:, n - 1 - k] = (idx // d ** k) % d
    return out.reshape(-1, rows, cols)


def test_log_amp_matches_dense():
    grid = _rand_grid(jax.random.PRNGKey(0), 2, 3, 2, 2)
    psi = _dense_psi_2x3(grid)
    cfgs = _all_cfgs(2, 3)
    for k in [0, 7, 33, 63]:
        sgn, lg = peps_log_amp(grid, jnp.asarray(cfgs[k]))
        got = float(sgn) * np.exp(float(lg))
        assert abs(got - psi[k]) < 1e-12 * max(1, abs(psi[k]))


def test_enumeration_reproduces_rayleigh_quotient():
    """All configs + Born weights == dense <H> exactly (the estimator
    identity), for a GENERIC random bond Hamiltonian."""
    rng = np.random.default_rng(1)
    grid = _rand_grid(jax.random.PRNGKey(1), 2, 3, 2, 2)
    h2h = rng.standard_normal((4, 4))
    h2h = h2h + h2h.T
    h2v = rng.standard_normal((4, 4))
    h2v = h2v + h2v.T

    psi = _dense_psi_2x3(grid)
    p = psi ** 2 / np.sum(psi ** 2)
    ham = _dense_h(2, 3, h2h, h2v)
    want = psi @ ham @ psi / (psi @ psi)

    cfgs = jnp.asarray(_all_cfgs(2, 3))
    e, grads, var = vmc_energy_and_grad(grid, cfgs, h2h, h2v,
                                        weights=jnp.asarray(p))
    assert abs(float(e) - want) < 1e-10
    assert float(var) > 0


def test_enumeration_gradient_matches_finite_differences():
    rng = np.random.default_rng(2)
    grid = _rand_grid(jax.random.PRNGKey(2), 2, 2, 2, 2)
    h2 = rng.standard_normal((4, 4))
    h2 = h2 + h2.T

    def exact_e(g):
        psi = _dense_psi_2x2(g)
        ham = _dense_h(2, 2, h2, h2)
        return psi @ ham @ psi / (psi @ psi)

    def estimators(g):
        psi = _dense_psi_2x2(g)
        p = psi ** 2 / np.sum(psi ** 2)
        return vmc_energy_and_grad(g, jnp.asarray(_all_cfgs(2, 2)),
                                   h2, h2, weights=jnp.asarray(p))

    _, grads, _ = estimators(grid)
    eps = 1e-6
    t = np.asarray(grid[1][0])
    for idx in [(0, 0, 0, 0, 0), (1, 1, 0, 0, 1)]:
        gp = [row[:] for row in grid]
        gm = [row[:] for row in grid]
        tp, tm = t.copy(), t.copy()
        tp[idx] += eps
        tm[idx] -= eps
        gp[1] = gp[1][:]
        gp[1][0] = jnp.asarray(tp)
        gm[1] = gm[1][:]
        gm[1][0] = jnp.asarray(tm)
        fd = (exact_e(gp) - exact_e(gm)) / (2 * eps)
        assert abs(float(np.asarray(grads[1][0])[idx]) - fd) < 1e-5


def test_sampled_estimator_statistical_consistency():
    """Born-rule samples: the sampled energy sits within 6 sigma of
    the exact value (deterministic key; sigma from the returned
    variance)."""
    from contractn_tpu.models.peps_sample import sample_peps

    rng = np.random.default_rng(3)
    grid = _rand_grid(jax.random.PRNGKey(3), 2, 3, 2, 2)
    h2 = rng.standard_normal((4, 4))
    h2 = h2 + h2.T

    psi = _dense_psi_2x3(grid)
    ham = _dense_h(2, 3, h2, h2)
    want = psi @ ham @ psi / (psi @ psi)

    nb = 512
    samples, _ = sample_peps(grid, jax.random.PRNGKey(9), nb, chi=16)
    e, _, var = vmc_energy_and_grad(grid, samples, h2, h2)
    sigma = np.sqrt(float(var) / nb)
    assert abs(float(e) - want) < 6 * sigma + 1e-9, (float(e), want,
                                                     sigma)


def test_enumeration_gradient_descent_reaches_ed():
    """Exact-gradient descent (enumeration weights) on the 2x2 TFIM
    lands within 1% of ED at D=2 — the optimization loop is sound."""
    import optax

    z = np.diag([1.0, -1.0])
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    eye = np.eye(2)
    # field split: coordination 2 interior-free on 2x2 (every site has
    # exactly 2 bonds) -> h/2 per bond endpoint
    h2 = (-np.kron(z, z) - 0.75 * (np.kron(x, eye) + np.kron(eye, x))
          / 2.0)
    ham = _dense_h(2, 2, h2, h2)
    e_ed = np.linalg.eigvalsh(ham)[0]

    grid = _rand_grid(jax.random.PRNGKey(5), 2, 2, 2, 2)
    grid = [[t * 0.5 + 0.3 for t in row] for row in grid]
    cfgs = jnp.asarray(_all_cfgs(2, 2))
    opt = optax.adam(0.05)
    state = opt.init(grid)
    e = var = None
    for it in range(450):
        psi = _dense_psi_2x2(grid)
        p = psi ** 2 / np.sum(psi ** 2)
        e, g, var = vmc_energy_and_grad(grid, cfgs, h2, h2,
                                        weights=jnp.asarray(p))
        upd, state = opt.update(g, state, grid)
        grid = jax.tree_util.tree_map(lambda a, u: a + u, grid, upd)
    # 1000-step probe reached 1.6e-6 with var -> 1.5e-5; pin the
    # 450-step level plus the zero-variance certificate trending
    assert abs(float(e) - e_ed) < 1e-4, (float(e), e_ed)
    assert float(var) < 1e-3


def test_sampled_fit_smoke():
    """Few stochastic steps run end-to-end with finite energies."""
    z = np.diag([1.0, -1.0])
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    eye = np.eye(2)
    h2 = -np.kron(z, z) - 0.5 * (np.kron(x, eye) + np.kron(eye, x))
    grid = _rand_grid(jax.random.PRNGKey(6), 2, 2, 2, 2)
    grid = [[t * 0.4 + 0.3 for t in row] for row in grid]
    grid, es = fit_peps_vmc(grid, h2, h2, jax.random.PRNGKey(0),
                            steps=3, num_samples=32, chi=4, lr=0.02)
    assert np.all(np.isfinite(es))


def test_complex_rejected():
    grid = [[jnp.ones((2, 1, 1, 1, 1), jnp.complex128)]]
    with pytest.raises(ValueError):
        vmc_energy_and_grad(grid, jnp.zeros((1, 1, 1), jnp.int32),
                            np.eye(4), np.eye(4))
