"""Model-family tests: MPS / MPO scan contractions vs dense oracles,
decomposition builders vs np.einsum, PEPS closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models import MPS, MPO, cp_tn, tucker_tn, tensor_ring_tn, peps_tn
from contractn_tpu.models.decompositions import matrix_chain_tn


def dense_mps_vector(mps):
    """Oracle: materialize the full 2^N amplitude tensor with numpy."""
    cores = np.asarray(mps.cores)
    n, d, D, _ = cores.shape
    # accumulate site by site: amp[config, bond]
    amp = np.einsum("i,dij->dj", np.asarray(mps.left), cores[0])
    for i in range(1, n):
        amp = np.einsum("cj,djk->cdk", amp.reshape(-1, D), cores[i])
        amp = amp.reshape(-1, D)
    return amp @ np.asarray(mps.right)  # (d^n,)


@pytest.fixture(scope="module")
def small_mps():
    key = jax.random.PRNGKey(0)
    return MPS.random(key, n_sites=4, phys_dim=2, bond_dim=3, dtype=jnp.float64)


def all_onehot_inputs(n, d):
    """(d^n, n, d) one-hot input batch enumerating every configuration."""
    configs = np.indices((d,) * n).reshape(n, -1).T  # (d^n, n)
    x = np.zeros((configs.shape[0], n, d))
    for b, cfg in enumerate(configs):
        for site, val in enumerate(cfg):
            x[b, site, val] = 1.0
    return x


def test_mps_evaluate_matches_dense_oracle(small_mps):
    n, d = small_mps.n_sites, small_mps.phys_dim
    x = jnp.asarray(all_onehot_inputs(n, d))
    amp, log = jax.jit(small_mps.evaluate)(x)
    values = np.asarray(amp) * np.exp(np.asarray(log))
    oracle = dense_mps_vector(small_mps)
    assert np.allclose(values, oracle, rtol=1e-10)


def test_mps_norm_matches_config_sum(small_mps):
    oracle = dense_mps_vector(small_mps)
    val, log = jax.jit(small_mps.norm_squared)()
    assert np.isclose(
        float(val) * np.exp(float(log)), np.sum(oracle ** 2), rtol=1e-10
    )


def test_mps_inner_self_is_norm(small_mps):
    v1, l1 = jax.jit(small_mps.norm_squared)()
    v2, l2 = jax.jit(lambda m: m.inner(m))(small_mps)
    assert np.isclose(
        float(v1) * np.exp(float(l1)), float(v2) * np.exp(float(l2)), rtol=1e-10
    )


def test_mps_log_norm_long_chain_no_overflow():
    """1000-site constant MPS: log-norm finite and matches closed form."""
    mps = MPS.constant(n_sites=300, phys_dim=2, bond_dim=2, fill=1.0)
    # <psi|psi> = l E^{N} r form; for all-ones cores the transfer matrix is
    # rank-one: E = 2 * (ones(2x2) kron ones(2x2)) acting as 8^... — just
    # check finiteness and agreement with float64 oracle on the log scale.
    logn = jax.jit(mps.log_norm)()
    assert np.isfinite(float(logn))
    # oracle: rho_{n+1} = sum_d A^T rho A with A = ones -> rho' = 2*(sum rho)*ones
    s = 4.0  # sum of rho0 = outer(ones, ones)
    log_acc = 0.0
    for _ in range(300):
        # rho = 2 * s * ones((2,2)); renormalize to keep s finite
        s_new = 2 * s * 4
        log_acc += np.log(s_new / 4)
        s = 4.0
    expect = log_acc + np.log(4.0)  # right @ rho @ right with rho = ones
    assert np.isclose(float(logn), expect, rtol=1e-12)


def test_mps_to_tn_parity(small_mps):
    tn = small_mps.to_tn()
    dense = np.asarray(tn.contract()).reshape(-1)
    oracle = dense_mps_vector(small_mps)
    assert np.allclose(dense, oracle, rtol=1e-9)


def test_mpo_identity_expectation_is_norm(small_mps):
    mpo = MPO.identity(small_mps.n_sites, small_mps.phys_dim)
    v1, l1 = jax.jit(small_mps.norm_squared)()
    v2, l2 = jax.jit(lambda o, m: o.expectation(m))(mpo, small_mps)
    assert np.isclose(
        float(v1) * np.exp(float(l1)), float(v2) * np.exp(float(l2)), rtol=1e-10
    )


def test_mpo_expectation_dense_oracle():
    key = jax.random.PRNGKey(3)
    mps = MPS.random(key, n_sites=3, phys_dim=2, bond_dim=2, dtype=jnp.float64)
    mpo = MPO.random(
        jax.random.PRNGKey(4), n_sites=3, phys_dim=2, bond_dim=2,
        dtype=jnp.float64,
    )
    # Dense oracle: materialize psi (d^3) and O (d^3 x d^3)
    psi = dense_mps_vector(mps)
    w = np.asarray(mpo.cores)
    op = np.einsum(
        "w,abwx,cdxy,efyz,z->acebdf",
        np.asarray(mpo.left), w[0], w[1], w[2], np.asarray(mpo.right),
    ).reshape(8, 8)
    expect = psi @ op @ psi
    val, log = jax.jit(lambda o, m: o.expectation(m))(mpo, mps)
    assert np.isclose(float(val) * np.exp(float(log)), expect, rtol=1e-10)


def test_cp_builder_value():
    rng = np.random.default_rng(0)
    factors = [rng.standard_normal((3, 4)) for _ in range(3)]
    tn = cp_tn(factors)
    out = np.asarray(tn.contract())
    expect = np.einsum("ra,rb,rc->abc", *factors)
    assert np.allclose(out, expect, rtol=1e-10)


def test_tucker_builder_value():
    rng = np.random.default_rng(1)
    core = rng.standard_normal((2, 3, 4))
    factors = [rng.standard_normal((r, 5)) for r in core.shape]
    tn = tucker_tn(core, factors)
    out = np.asarray(tn.contract())
    expect = np.einsum("ijk,ia,jb,kc->abc", core, *factors)
    assert np.allclose(out, expect, rtol=1e-10)


def test_tensor_ring_builder_value():
    rng = np.random.default_rng(2)
    cores = [rng.standard_normal((2, 3, 3)) for _ in range(3)]
    tn = tensor_ring_tn(cores)
    out = np.asarray(tn.contract())
    expect = np.einsum("aij,bjk,cki->abc", *cores)
    assert np.allclose(out, expect, rtol=1e-10)


def test_matrix_chain_builder_uses_fast_path():
    mats = [np.full((3, 3), 1.0) for _ in range(40)]
    tn = matrix_chain_tn(mats, left_vec=np.ones(3))
    mant, log = tn.contract(split_format=True)
    assert np.allclose(np.asarray(mant), 1.0, rtol=1e-12)
    assert np.isclose(float(log), 40 * np.log(3.0), rtol=1e-12)


def test_mps_from_dense_roundtrip():
    rng = np.random.default_rng(6)
    psi = rng.standard_normal(2 ** 6)
    mps = MPS.from_dense(psi, phys_dim=2)
    assert np.allclose(dense_mps_vector(mps), psi, rtol=1e-10)
    # truncated encoding of a low-rank state is exact
    prod = np.kron(np.kron(np.array([1.0, 2.0]), np.array([3.0, 1.0])),
                   np.kron(np.array([1.0, 1.0]), np.array([0.5, 2.0])))
    small = MPS.from_dense(prod, phys_dim=2, max_bond=1, cutoff=1e-12)
    assert small.bond_dim == 1
    assert np.allclose(dense_mps_vector(small), prod, rtol=1e-10)
    import pytest as _pt

    with _pt.raises(ValueError):
        MPS.from_dense(np.ones(6), phys_dim=2)


def test_random_regular_tn_value():
    """3-regular random TN (nontrivial path): jax engine vs numpy oracle."""
    from contractn_tpu.models.decompositions import random_regular_tn

    rng = np.random.default_rng(4)
    tn, nodes = random_regular_tn(8, 3, bond_dim=3, rng=rng)
    assert tn.num_dense == 8
    assert all(not e.dangler for e in tn.edges())
    v_jax = np.asarray(tn.contract())
    v_np = tn.contract(backend="numpy")
    assert np.allclose(v_jax, v_np, rtol=1e-9)
    mant, log = tn.contract(split_format=True)
    assert np.isclose(
        float(mant) * np.exp(float(log)), float(v_np), rtol=1e-9
    )


def test_random_regular_tn_odd_stubs_rejected():
    from contractn_tpu.models.decompositions import random_regular_tn
    import pytest as _pytest

    with _pytest.raises(ValueError):
        random_regular_tn(3, 3, 2)


def test_peps_closed_network_value():
    """All-ones 3x3 PEPS with bond 2: value = 2^(#bonds)."""
    tn, grid = peps_tn(3, 3, bond_dim=2)
    n_bonds = len([e for e in tn.edges() if not e.dangler])
    assert n_bonds == 12
    out = float(np.asarray(tn.contract()))
    assert np.isclose(out, 2.0 ** 12, rtol=1e-10)


def test_peps_with_physical_modes():
    tn, grid = peps_tn(2, 2, bond_dim=2, phys_dim=3)
    out = np.asarray(tn.contract())
    assert out.shape == (3, 3, 3, 3)
    # all-ones network: every amplitude = bond_dim^(#bonds) = 2^4
    assert np.allclose(out, 2.0 ** 4, rtol=1e-10)


def test_gradient_of_log_norm(small_mps):
    grads = jax.jit(jax.grad(lambda m: m.log_norm()))(small_mps)
    assert grads.cores.shape == small_mps.cores.shape
    assert np.all(np.isfinite(np.asarray(grads.cores)))


def test_vmapped_batched_evaluate(small_mps):
    """Batch axis via the built-in batch support of mps_evaluate."""
    n, d = small_mps.n_sites, small_mps.phys_dim
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, n, d)))
    amp, log = jax.jit(small_mps.evaluate)(x)
    assert amp.shape == (16,) and log.shape == (16,)
    # spot-check one sample against a dense per-sample chain
    b = 7
    mats = [
        np.einsum("d,dij->ij", np.asarray(x[b, i]), np.asarray(small_mps.cores[i]))
        for i in range(n)
    ]
    acc = np.asarray(small_mps.left)
    for m in mats:
        acc = acc @ m
    expect = acc @ np.asarray(small_mps.right)
    assert np.isclose(float(amp[b]) * np.exp(float(log[b])), expect, rtol=1e-9)


def test_fused_evaluate_matches_site_scan():
    """k-site fused evaluation is exact vs the per-site scan (all k)."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.models import MPS

    mps = MPS.random(jax.random.PRNGKey(2), 12, 2, 5, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(3), (7, 12, 2), jnp.float64)
    base = mps.evaluate(x, split_format=False)
    for k in (2, 3, 4, 6):
        fused = mps.evaluate(x, split_format=False, sites_per_step=k)
        assert np.allclose(np.asarray(fused), np.asarray(base), rtol=1e-10)
    with pytest.raises(ValueError):
        mps.evaluate(x, sites_per_step=5)  # 12 % 5 != 0


def test_premix_and_perphys_kernels_match_site_scan():
    """All three evaluation layouts are algebraically identical."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.ops.scan import (
        mps_evaluate,
        mps_evaluate_auto,
        mps_evaluate_perphys,
        mps_evaluate_premix,
    )

    key = jax.random.PRNGKey(7)
    kc, kl, kr, kx = jax.random.split(key, 4)
    n, d, bond, batch = 13, 3, 6, 5
    cores = jax.random.normal(kc, (n, d, bond, bond), jnp.float64) * 0.4
    left = jax.random.normal(kl, (bond,), jnp.float64)
    right = jax.random.normal(kr, (bond,), jnp.float64)
    x = jax.random.normal(kx, (batch, n, d), jnp.float64)

    def dense(pair):
        return np.asarray(pair[0]) * np.exp(np.asarray(pair[1]))

    base = dense(mps_evaluate(cores, left, right, x))
    for fn in (mps_evaluate_premix, mps_evaluate_perphys,
               mps_evaluate_auto):
        got = dense(fn(cores, left, right, x))
        assert np.allclose(got, base, rtol=1e-10), fn.__name__
        got = dense(fn(cores, left, right, x, stabilize_every=5))
        assert np.allclose(got, base, rtol=1e-10), (fn.__name__, "cadence")


def test_site_expectations_profile():
    """Per-site <Z_i> profile: closed form on a product MPS, and dense
    ED comparison on the open TFIM chain's inhomogeneous magnetization
    (edge effects make every site different)."""
    from contractn_tpu.models.dmrg import dmrg, tfim_mpo

    sz = np.diag([1.0, -1.0])
    # product state |v>^n through from_dense
    v = np.array([2.0, 1.0]) / np.sqrt(5.0)
    n = 5
    psi = np.array([1.0])
    for _ in range(n):
        psi = np.kron(psi, v)
    mps = MPS.from_dense(jnp.asarray(psi), 2)
    prof = np.asarray(mps.site_expectations(sz))
    want = (v[0] ** 2 - v[1] ** 2)
    assert np.allclose(prof, want, atol=1e-12)

    # open TFIM chain: edge-dependent <X_i> profile vs exact ED
    n, h = 8, 0.8
    mpo = tfim_mpo(n, j=1.0, h=h)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, 12,
                      dtype=jnp.float64)
    gs, _, _ = dmrg(mpo, mps0, max_bond=12, sweeps=5)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    prof_x = np.asarray(gs.site_expectations(sx))

    ham = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        zz = np.kron(np.kron(np.eye(2 ** i), np.kron(sz, sz)),
                     np.eye(2 ** (n - i - 2)))
        ham -= zz
    for i in range(n):
        ham -= h * np.kron(np.kron(np.eye(2 ** i), sx),
                           np.eye(2 ** (n - i - 1)))
    w, vv = np.linalg.eigh(ham)
    g0 = vv[:, 0]
    for i in range(n):
        xi = np.kron(np.kron(np.eye(2 ** i), sx),
                     np.eye(2 ** (n - i - 1)))
        want = g0 @ xi @ g0
        assert np.isclose(prof_x[i], want, atol=1e-8), (i, prof_x[i],
                                                        want)
    # edge vs bulk genuinely differ (the profile is nontrivial)
    assert abs(prof_x[0] - prof_x[n // 2]) > 1e-3
