"""DMRG ground-state search vs exact diagonalization of small spin chains."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS
from contractn_tpu.models.dmrg import dmrg, heisenberg_mpo, tfim_mpo

SX = np.array([[0.0, 1.0], [1.0, 0.0]])
SY = np.array([[0.0, -1.0j], [1.0j, 0.0]])
SZ = np.array([[1.0, 0.0], [0.0, -1.0]])


def _op_at(op, site, n):
    mats = [np.eye(2)] * n
    mats[site] = op
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def dense_tfim(n, j=1.0, h=1.0):
    ham = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        ham -= j * _op_at(SZ, i, n) @ _op_at(SZ, i + 1, n)
    for i in range(n):
        ham -= h * _op_at(SX, i, n)
    return ham


def dense_heisenberg(n, jx=1.0, jz=1.0):
    ham = np.zeros((2 ** n, 2 ** n), complex)
    for i in range(n - 1):
        ham += jx * _op_at(SX, i, n) @ _op_at(SX, i + 1, n)
        ham += jx * (_op_at(SY, i, n) @ _op_at(SY, i + 1, n)).real
        ham += jz * _op_at(SZ, i, n) @ _op_at(SZ, i + 1, n)
    return ham.real


def test_mpo_matches_dense_tfim():
    """The TFIM MPO's expectation equals the dense Hamiltonian's."""
    n = 5
    mps = MPS.random(jax.random.PRNGKey(0), n, 2, 4, dtype=jnp.float64)
    from tests.test_models import dense_mps_vector

    psi = dense_mps_vector(mps)
    ham = dense_tfim(n)
    expect = psi @ ham @ psi
    mpo = tfim_mpo(n)
    val, log = mpo.expectation(mps)
    assert np.isclose(float(val) * np.exp(float(log)), expect, rtol=1e-9)


def test_dmrg_tfim_ground_energy():
    n = 6
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, 8, dtype=jnp.float64)
    ground, energy, trace = dmrg(tfim_mpo(n), mps0, max_bond=8, sweeps=3)
    assert np.isclose(energy, e_exact, rtol=1e-8)
    # energies are monotone-ish and the state reproduces the energy
    v, log = tfim_mpo(n).expectation(ground)
    nrm_v, nrm_log = ground.norm_squared()
    e_check = (float(v) * np.exp(float(log))) / (
        float(nrm_v) * np.exp(float(nrm_log))
    )
    assert np.isclose(e_check, e_exact, rtol=1e-7)


def test_dmrg_heisenberg_ground_energy():
    n = 6
    e_exact = float(np.linalg.eigvalsh(dense_heisenberg(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(2), n, 2, 8, dtype=jnp.float64)
    _, energy, _ = dmrg(heisenberg_mpo(n), mps0, max_bond=8, sweeps=3)
    assert np.isclose(energy, e_exact, rtol=1e-8)


def test_lanczos_matches_dense_local_solve():
    """Environment-matvec Lanczos agrees with the dense eigh solve."""
    import importlib

    dm = importlib.import_module("contractn_tpu.models.dmrg")

    n = 6
    mps0 = MPS.random(jax.random.PRNGKey(5), n, 2, 8, dtype=jnp.float64)
    mpo = tfim_mpo(n)
    sites = dm._ragged_sites(mps0)
    ws = [mpo.cores[i] for i in range(n)]
    L = mpo.left[None, :, None].astype(jnp.float64)
    R = mpo.right[None, :, None].astype(jnp.float64)
    for i in range(n - 1, 1, -1):
        R = dm._update_right(R, sites[i], ws[i])
    theta0 = jnp.einsum("apj,bjq->abpq", sites[0], sites[1])
    e_dense, _ = dm._local_ground_state(L, ws[0], ws[1], R)
    e_lcz, theta = dm._lanczos_ground(L, ws[0], ws[1], R, theta0, iters=30)
    assert np.isclose(e_lcz, e_dense, rtol=1e-9)
    # returned vector is a true eigenvector: H theta = E theta
    htheta = dm._heff_matvec(L, ws[0], ws[1], R, theta)
    assert np.allclose(
        np.asarray(htheta), e_lcz * np.asarray(theta), atol=1e-7
    )


def test_dmrg_large_bond_uses_lanczos():
    """Bond 20 pushes the two-site dim past the dense limit (3200 > 1024):
    the Lanczos path engages and still matches exact diagonalization."""
    n = 8
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(6), n, 2, 20, dtype=jnp.float64)
    _, energy, _ = dmrg(tfim_mpo(n), mps0, max_bond=20, sweeps=3)
    assert np.isclose(energy, e_exact, rtol=1e-7)


def test_dmrg_truncated_bond_is_variational():
    """With a too-small bond the energy is above, but close to, exact."""
    n = 8
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    mps0 = MPS.random(jax.random.PRNGKey(3), n, 2, 4, dtype=jnp.float64)
    _, energy, _ = dmrg(tfim_mpo(n), mps0, max_bond=4, sweeps=3)
    assert energy >= e_exact - 1e-10  # variational bound
    assert energy - e_exact < 1e-3  # TFIM is weakly entangled


def test_lanczos_matches_dense_eigh(monkeypatch):
    """The device-side Lanczos path must agree with dense eigh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import importlib

    dmrg_mod = importlib.import_module("contractn_tpu.models.dmrg")

    # Random Hermitian environment pieces on a mid-size problem
    key = jax.random.PRNGKey(0)
    d, w, dl, dr = 2, 3, 6, 6
    kl, kw1, kw2, kr, kt = jax.random.split(key, 5)
    L = jax.random.normal(kl, (dl, w, dl), jnp.float64)
    L = 0.5 * (L + L.transpose(2, 1, 0))
    R = jax.random.normal(kr, (dr, w, dr), jnp.float64)
    R = 0.5 * (R + R.transpose(2, 1, 0))
    w1 = jax.random.normal(kw1, (d, d, w, w), jnp.float64)
    w1 = 0.5 * (w1 + w1.transpose(1, 0, 2, 3))
    w2 = jax.random.normal(kw2, (d, d, w, w), jnp.float64)
    w2 = 0.5 * (w2 + w2.transpose(1, 0, 2, 3))
    theta0 = jax.random.normal(kt, (d, d, dl, dr), jnp.float64)

    e_dense, _ = dmrg_mod._local_ground_state(L, w1, w2, R)
    e_lcz, theta = dmrg_mod._lanczos_ground(L, w1, w2, R, theta0, iters=60)
    assert np.isclose(e_lcz, e_dense, rtol=1e-8)
    assert np.isclose(float(jnp.linalg.norm(theta)), 1.0, rtol=1e-10)
    # Rayleigh quotient of the returned vector matches the eigenvalue
    hv = dmrg_mod._heff_matvec(L, w1, w2, R, theta)
    rq = float(jnp.vdot(theta.reshape(-1), hv.reshape(-1)))
    assert np.isclose(rq, e_dense, rtol=1e-8)


def test_lanczos_early_exhaustion_exact_start():
    """Starting AT an eigenvector exhausts the Krylov space immediately;
    the masked tridiagonal solve must still return that eigenpair."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import importlib

    dmrg_mod = importlib.import_module("contractn_tpu.models.dmrg")

    key = jax.random.PRNGKey(1)
    d, w, dl, dr = 2, 3, 4, 4
    kl, kw1, kw2, kr = jax.random.split(key, 4)
    L = jax.random.normal(kl, (dl, w, dl), jnp.float64)
    L = 0.5 * (L + L.transpose(2, 1, 0))
    R = jax.random.normal(kr, (dr, w, dr), jnp.float64)
    R = 0.5 * (R + R.transpose(2, 1, 0))
    w1 = jax.random.normal(kw1, (d, d, w, w), jnp.float64)
    w1 = 0.5 * (w1 + w1.transpose(1, 0, 2, 3))
    w2 = jax.random.normal(kw2, (d, d, w, w), jnp.float64)
    w2 = 0.5 * (w2 + w2.transpose(1, 0, 2, 3))

    e_dense, theta_dense = dmrg_mod._local_ground_state(L, w1, w2, R)
    e_lcz, theta = dmrg_mod._lanczos_ground(
        L, w1, w2, R, theta_dense, iters=24
    )
    assert np.isclose(e_lcz, e_dense, rtol=1e-8)
    overlap = abs(float(jnp.vdot(theta.reshape(-1),
                                 theta_dense.reshape(-1))))
    assert np.isclose(overlap, 1.0, rtol=1e-8)


def test_excited_states_match_dense_spectrum():
    """dmrg_excited reproduces the three lowest dense eigenvalues of
    TFIM(8, h=1.5) and the states are mutually orthogonal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contractn_tpu.models import MPS, dmrg_excited, tfim_mpo
    from tests.test_tdvp import dense_tfim

    n, bond = 8, 10
    mpo = tfim_mpo(n, j=1.0, h=1.5)
    dense = dense_tfim(n, j=1.0, h=1.5)
    want = np.linalg.eigvalsh(dense)[:3]

    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, bond, dtype=jnp.float64)
    states, energies = dmrg_excited(mpo, mps0, 3, max_bond=bond, sweeps=3)
    assert np.allclose(energies, want, rtol=1e-6), (energies, want)
    for i in range(3):
        for j in range(i + 1, 3):
            ov_v, ov_l = states[i].inner(states[j])
            overlap = abs(float(ov_v)) * float(jnp.exp(ov_l))
            assert overlap < 1e-4, (i, j, overlap)


def test_penalized_lanczos_matches_penalized_dense(monkeypatch):
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    dmrg_mod = importlib.import_module("contractn_tpu.models.dmrg")

    key = jax.random.PRNGKey(4)
    d, w, dl, dr = 2, 3, 6, 6
    kl, kw1, kw2, kr, kt, kp = jax.random.split(key, 6)
    L = jax.random.normal(kl, (dl, w, dl), jnp.float64)
    L = 0.5 * (L + L.transpose(2, 1, 0))
    R = jax.random.normal(kr, (dr, w, dr), jnp.float64)
    R = 0.5 * (R + R.transpose(2, 1, 0))
    w1 = jax.random.normal(kw1, (d, d, w, w), jnp.float64)
    w1 = 0.5 * (w1 + w1.transpose(1, 0, 2, 3))
    w2 = jax.random.normal(kw2, (d, d, w, w), jnp.float64)
    w2 = 0.5 * (w2 + w2.transpose(1, 0, 2, 3))
    theta0 = jax.random.normal(kt, (d, d, dl, dr), jnp.float64)
    pg = jax.random.normal(kp, (d, d, dl, dr), jnp.float64)
    pg = pg / jnp.linalg.norm(pg)
    penalties = [(25.0, pg)]

    e_dense, _ = dmrg_mod._local_ground_penalized(
        L, w1, w2, R, theta0, penalties
    )
    monkeypatch.setattr(dmrg_mod, "_DENSE_EIGH_LIMIT", 1)
    e_lcz, theta = dmrg_mod._local_ground_penalized(
        L, w1, w2, R, theta0, penalties
    )
    assert np.isclose(e_lcz, e_dense, rtol=1e-7)


def test_idmrg_bulk_energies_match_exact():
    """iDMRG energy-per-site differences vs exact infinite-chain values
    (TFIM elliptic integral; Heisenberg Bethe ansatz, Pauli convention).
    Exercises the Lanczos path at D=24 (dim 2304 > dense limit) — a
    regression for the double-Gram-Schmidt orthogonality fix."""
    import numpy as np

    from contractn_tpu.models import heisenberg_mpo, idmrg, tfim_mpo

    def tfim_exact(h):
        k = np.linspace(0, np.pi, 200001)
        return -np.trapezoid(np.sqrt(1 + h * h - 2 * h * np.cos(k)),
                             k) / np.pi

    e, _ = idmrg(tfim_mpo(2, h=1.5), max_bond=20, steps=40)
    assert abs(e - tfim_exact(1.5)) < 1e-9, e

    e, _ = idmrg(heisenberg_mpo(2), max_bond=24, steps=50)
    exact = 4.0 * (0.25 - np.log(2.0))  # Pauli-operator convention
    assert abs(e - exact) < 5e-4, e


def test_dmrg_sector_spin_gap_matches_exact():
    """Sector-targeted DMRG (total-Sz penalty MPO): per-sector ground
    energies of the 8-site Heisenberg chain against sector-resolved
    exact diagonalization, and the spin gap between them."""
    from contractn_tpu.models.dmrg import dmrg_sector

    n = 8
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    sz = np.diag([1.0, -1.0])

    def kron_at(op, i):
        out = np.eye(1)
        for s in range(n):
            out = np.kron(out, op if s == i else np.eye(2))
        return out

    ham = np.zeros((2 ** n, 2 ** n), complex)
    for i in range(n - 1):
        for op in (sx, sy, sz):
            ham += kron_at(op, i) @ kron_at(op, i + 1)
    ham = np.real(ham)
    szdiag = np.real(np.diag(sum(kron_at(sz / 2, i) for i in range(n))))

    mpo = heisenberg_mpo(n)
    exact = {}
    for q in (0.0, 1.0):
        idx = np.where(np.abs(szdiag - q) < 1e-9)[0]
        exact[q] = np.linalg.eigvalsh(ham[np.ix_(idx, idx)])[0]
        mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, 16,
                          dtype=jnp.float64)
        mps, e, res = dmrg_sector(mpo, mps0, q, sweeps=6)
        assert np.isclose(e, exact[q], atol=1e-9), (q, e, exact[q])
        assert res < 1e-10, res  # sector fully resolved
    # the spin gap, two sector-resolved runs apart
    assert np.isclose(exact[1.0] - exact[0.0], 1.5707684437, atol=1e-6)


def test_mpo_sum_is_operator_addition():
    """mpo_sum(H1, H2) expectation == H1 expectation + H2 expectation
    on random states (exact direct-sum construction)."""
    from contractn_tpu.models.mpo import mpo_sum

    n = 6
    m1 = tfim_mpo(n, j=1.0, h=0.7)
    m2 = heisenberg_mpo(n)
    msum = mpo_sum(m1, m2)

    def ray(op, state):
        num_v, num_l = op.expectation(state)
        den_v, den_l = state.norm_squared()
        return float(jnp.real(num_v / den_v)) * float(
            jnp.exp(num_l - den_l))

    for seed in (0, 1):
        psi = MPS.random(jax.random.PRNGKey(seed), n, 2, 5,
                         dtype=jnp.float64)
        want = ray(m1, psi) + ray(m2, psi)
        got = ray(msum, psi)
        assert np.isclose(got, want, rtol=1e-12), (got, want)
