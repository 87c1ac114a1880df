"""CP-ALS and Tucker HOSVD/HOOI decomposition algorithms.

The reference only *builds* CP/Tucker layouts (README.md:37-58); it has
no fitting algorithms.  These tests pin ours to the exact linear-algebra
identities: exact-rank recovery, ALS monotonicity, the HOSVD discarded-
mass error bound, HOOI refinement, and end-to-end consistency with the
``cp_tn``/``tucker_tn`` graph builders through the contraction engine.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.decompositions import cp_tn, tucker_tn
from contractn_tpu.models.factorize import (
    cp_als,
    cp_reconstruct,
    tucker_hooi,
    tucker_hosvd,
    tucker_reconstruct,
)


def _random_cp(key, dims, rank, dtype=jnp.float64):
    keys = jax.random.split(key, len(dims))
    factors = [jax.random.normal(k, (rank, d), dtype=dtype)
               for k, d in zip(keys, dims)]
    return cp_reconstruct(factors), factors


def test_cp_exact_rank_recovery():
    x, _ = _random_cp(jax.random.PRNGKey(3), (8, 7, 6), rank=4)
    factors, errs = cp_als(x, rank=4, steps=200,
                           key=jax.random.PRNGKey(11))
    assert float(errs[-1]) < 1e-8, float(errs[-1])
    rec = cp_reconstruct(factors)
    assert float(jnp.max(jnp.abs(rec - x))) < 1e-7


def test_cp_monotone_and_graph_consistency():
    # ALS error is non-increasing; the factors drop into cp_tn and the
    # engine contraction reproduces the algorithm's own reconstruction.
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (6, 5, 7, 4), dtype=jnp.float64)
    factors, errs = cp_als(x, rank=10, steps=60)
    e = np.asarray(errs)
    assert np.all(np.diff(e) < 1e-10), np.max(np.diff(e))
    assert e[-1] < e[0]
    got = np.asarray(
        cp_tn([np.asarray(f) for f in factors]).contract(backend="numpy"))
    rec = np.asarray(cp_reconstruct(factors))
    assert np.max(np.abs(got - rec)) < 1e-12


def test_cp_complex():
    key = jax.random.PRNGKey(9)
    x, _ = _random_cp(key, (6, 6, 5), rank=3, dtype=jnp.complex128)
    factors, errs = cp_als(x, rank=3, steps=200,
                           key=jax.random.PRNGKey(1))
    assert float(errs[-1]) < 1e-8, float(errs[-1])
    assert float(jnp.max(jnp.abs(cp_reconstruct(factors) - x))) < 1e-7


def test_hosvd_exact_rank_and_error_bound():
    # Exact-rank Tucker input is recovered to machine precision; on a
    # full-rank random tensor the squared error is bounded by the
    # discarded singular-value mass (the HOSVD quasi-optimality bound).
    key = jax.random.PRNGKey(7)
    ranks = (3, 4, 2)
    core = jax.random.normal(key, ranks, dtype=jnp.float64)
    facs = []
    for i, (r, d) in enumerate(zip(ranks, (8, 9, 6))):
        m = jax.random.normal(jax.random.fold_in(key, i), (d, r),
                              dtype=jnp.float64)
        q, _ = jnp.linalg.qr(m)
        facs.append(q.T)
    x = tucker_reconstruct(core, facs)
    core2, facs2, disc = tucker_hosvd(x, ranks)
    assert disc < 1e-12 * float(jnp.sum(jnp.abs(x) ** 2))
    rec = tucker_reconstruct(core2, facs2)
    assert float(jnp.max(jnp.abs(rec - x))) < 1e-10
    # orthonormal rows
    for f in facs2:
        g = np.asarray(f @ f.T.conj())
        assert np.max(np.abs(g - np.eye(g.shape[0]))) < 1e-12

    y = jax.random.normal(jax.random.fold_in(key, 99), (8, 9, 6),
                          dtype=jnp.float64)
    cy, fy, disc_y = tucker_hosvd(y, (4, 4, 3))
    err2 = float(jnp.sum(jnp.abs(tucker_reconstruct(cy, fy) - y) ** 2))
    assert err2 <= disc_y * (1.0 + 1e-10)
    assert err2 > 0.0


def test_hooi_refines_hosvd_and_graph_consistency():
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (9, 8, 7), dtype=jnp.float64)
    ranks = (4, 3, 3)
    ch, fh, _ = tucker_hosvd(x, ranks)
    err_hosvd = float(jnp.linalg.norm(tucker_reconstruct(ch, fh) - x))
    core, facs, errs = tucker_hooi(x, ranks, steps=8)
    e = np.asarray(errs)
    assert np.all(np.diff(e) < 1e-12)
    err_hooi = float(jnp.linalg.norm(tucker_reconstruct(core, facs) - x))
    assert err_hooi <= err_hosvd * (1.0 + 1e-12)
    # reported relative error matches the true one
    assert np.isclose(e[-1], err_hooi / float(jnp.linalg.norm(x)),
                      atol=1e-10)
    got = np.asarray(
        tucker_tn(np.asarray(core),
                  [np.asarray(f) for f in facs]).contract(backend="numpy"))
    rec = np.asarray(tucker_reconstruct(core, facs))
    assert np.max(np.abs(got - rec)) < 1e-12


def test_hooi_complex():
    key = jax.random.PRNGKey(21)
    x = (jax.random.normal(key, (6, 5, 6))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1), (6, 5, 6)))
    core, facs, errs = tucker_hooi(x, (3, 3, 3), steps=6)
    err = float(jnp.linalg.norm(tucker_reconstruct(core, facs) - x))
    assert np.isclose(float(errs[-1]),
                      err / float(jnp.linalg.norm(x)), atol=1e-10)
    for f in facs:
        g = np.asarray(f @ f.conj().T)
        assert np.max(np.abs(g - np.eye(g.shape[0]))) < 1e-12
