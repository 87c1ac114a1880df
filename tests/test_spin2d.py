"""2D spin snake MPOs vs dense exact diagonalization."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.dmrg import dmrg
from contractn_tpu.models.fermions2d import snake_index
from contractn_tpu.models.mps import MPS
from contractn_tpu.models.spin2d import heisenberg2d_mpo, tfim2d_mpo

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def _site_op(mat, site, n):
    out = np.eye(1)
    for k in range(n):
        out = np.kron(out, mat if k == site else np.eye(2))
    return out


def _dense_tfim2d(lx, ly, j=1.0, h=1.0):
    n = lx * ly
    ham = np.zeros((2 ** n, 2 ** n))
    for r in range(ly):
        for c in range(lx):
            i = snake_index(r, c, lx)
            if c + 1 < lx:
                jj = snake_index(r, c + 1, lx)
                ham += -j * _site_op(_SZ, i, n) @ _site_op(_SZ, jj, n)
            if r + 1 < ly:
                jj = snake_index(r + 1, c, lx)
                ham += -j * _site_op(_SZ, i, n) @ _site_op(_SZ, jj, n)
            ham += -h * _site_op(_SX, i, n)
    return ham


def test_tfim2d_mpo_equals_dense():
    for lx, ly in [(2, 3), (3, 3)]:
        got = _mpo_dense(tfim2d_mpo(lx, ly), lx * ly)
        assert np.allclose(got, _dense_tfim2d(lx, ly), atol=1e-12)


def test_compression_reaches_minimal_automaton():
    # One-channel-per-term W = 26 on the 4x4 TFIM; the minimal snake
    # automaton carries one in-flight operator per column: W = lx + 2.
    raw = tfim2d_mpo(4, 4, compress=False)
    comp = tfim2d_mpo(4, 4)
    assert raw.cores.shape[3] == 26
    assert comp.cores.shape[3] == 6
    # Same operator: expectation values agree on a random state.
    mps = MPS.random(jax.random.PRNGKey(3), 16, 2, 8, dtype=jnp.float64)
    v1, l1 = raw.expectation(mps)
    v2, l2 = comp.expectation(mps)
    a = float(v1) * float(jnp.exp(l1))
    b = float(v2) * float(jnp.exp(l2))
    assert abs(a - b) < 1e-9 * max(1.0, abs(a)), (a, b)


def test_dmrg_matches_ed_tfim_3x3():
    mpo = tfim2d_mpo(3, 3)
    e_ed = np.linalg.eigvalsh(_dense_tfim2d(3, 3))[0]
    mps0 = MPS.random(jax.random.PRNGKey(0), 9, 2, 20, dtype=jnp.float64)
    _, e, _ = dmrg(mpo, mps0, sweeps=8)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_dmrg_matches_ed_heisenberg_2x3():
    mpo = heisenberg2d_mpo(2, 3)
    e_ed = np.linalg.eigvalsh(_mpo_dense(mpo, 6))[0]
    mps0 = MPS.random(jax.random.PRNGKey(1), 6, 2, 16, dtype=jnp.float64)
    _, e, _ = dmrg(mpo, mps0, sweeps=8)
    assert abs(e - e_ed) < 1e-10, (e, e_ed)
