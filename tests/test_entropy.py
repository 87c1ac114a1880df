"""Entanglement entropy / Schmidt spectra vs dense decompositions."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.canonical import (
    entanglement_entropy,
    schmidt_spectra,
)
from contractn_tpu.models.mps import MPS


def _mps_dense(mps):
    c = np.asarray(mps.cores)
    cur = np.einsum("j,djk->dk", np.asarray(mps.left), c[0])
    for i in range(1, c.shape[0]):
        cur = np.einsum("Dk,dkl->Ddl", cur, c[i]).reshape(-1, c.shape[3])
    return cur @ np.asarray(mps.right)


def test_product_state_zero_entropy():
    n = 5
    v = np.array([0.6, 0.8])
    cores = jnp.asarray(np.tile(v[None, :, None, None], (n, 1, 1, 1)))
    one = jnp.ones((1,))
    s = entanglement_entropy(MPS(cores, one, one))
    assert s.shape == (n - 1,)
    assert np.max(np.abs(np.asarray(s))) < 1e-12


def test_ghz_log2_everywhere():
    n = 6
    core = np.zeros((2, 2, 2))
    core[0, 0, 0] = 1.0
    core[1, 1, 1] = 1.0
    cores = jnp.asarray(np.tile(core[None], (n, 1, 1, 1)))
    bnd = jnp.ones((2,))
    mps = MPS(cores, bnd, bnd)
    s1 = np.asarray(entanglement_entropy(mps))
    s2 = np.asarray(entanglement_entropy(mps, alpha=2))
    assert np.max(np.abs(s1 - np.log(2.0))) < 1e-12
    assert np.max(np.abs(s2 - np.log(2.0))) < 1e-12  # flat spectrum


def test_random_state_matches_dense_schmidt():
    n, d, bond = 6, 2, 8
    mps = MPS.random(jax.random.PRNGKey(5), n, d, bond,
                     dtype=jnp.float64)
    probs = np.asarray(schmidt_spectra(mps))
    psi = _mps_dense(mps)
    psi = psi / np.linalg.norm(psi)
    for b in range(n - 1):
        mat = psi.reshape(d ** (b + 1), -1)
        sv = np.linalg.svd(mat, compute_uv=False) ** 2
        got = np.sort(probs[b])[::-1][: sv.size]
        want = np.sort(sv)[::-1][: got.size]
        assert np.max(np.abs(got - want)) < 1e-10
    # entropies agree with the dense definition too
    s = np.asarray(entanglement_entropy(mps))
    for b in range(n - 1):
        mat = psi.reshape(d ** (b + 1), -1)
        sv = np.linalg.svd(mat, compute_uv=False) ** 2
        sv = sv[sv > 1e-300]
        assert abs(s[b] - (-np.sum(sv * np.log(sv)))) < 1e-10


def test_complex_state_and_renyi_orders():
    mps = MPS.random(jax.random.PRNGKey(9), 5, 2, 6,
                     dtype=jnp.complex128)
    s1 = np.asarray(entanglement_entropy(mps))
    s2 = np.asarray(entanglement_entropy(mps, alpha=2))
    s3 = np.asarray(entanglement_entropy(mps, alpha=0.5))
    # Renyi entropies are non-increasing in alpha
    assert np.all(s3 >= s1 - 1e-12)
    assert np.all(s1 >= s2 - 1e-12)
