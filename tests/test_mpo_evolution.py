"""W^II MPO time evolution vs dense oracles.

The long-range exponentially decaying Ising chain is the sharp test:
its finite-state machine has a nontrivial interior block (``A = lam I``)
that nearest-neighbor gate evolvers cannot express, and any error in
the generating-exponential block assignment (B/C transpose, A weight)
breaks the dense comparison immediately.
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

from contractn_tpu.models.dmrg import tfim_mpo
from contractn_tpu.models.mpo_evolution import (
    exp_decay_ising_mpo,
    mpo_evolve,
    wii_mpo,
)
from contractn_tpu.models.mps import MPS

X = np.array([[0.0, 1.0], [1.0, 0.0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]])
I2 = np.eye(2)
N = 6


def _site_op(mat, site, n):
    out = np.eye(1)
    for k in range(n):
        out = np.kron(out, mat if k == site else I2)
    return out


def _mps_dense(mps):
    c = np.asarray(mps.cores)
    cur = np.einsum("j,djk->dk", np.asarray(mps.left), c[0])
    for i in range(1, c.shape[0]):
        cur = np.einsum("Dk,dkl->Ddl", cur, c[i]).reshape(-1, c.shape[3])
    return cur @ np.asarray(mps.right)


def _dense_lr_ising(n, j, lam, h):
    hd = np.zeros((2**n, 2**n))
    for i in range(n):
        for k in range(i + 1, n):
            hd += (
                j * lam ** (k - i)
                * _site_op(Z, i, n) @ _site_op(Z, k, n)
            )
        hd += h * _site_op(X, i, n)
    return hd


def _tilted_product(n):
    v = np.array([np.cos(0.3), np.sin(0.3)])
    cores = jnp.asarray(
        np.tile((v / np.linalg.norm(v))[None, :, None, None], (n, 1, 1, 1))
    )
    one = jnp.ones((1,))
    return MPS(cores, one, one)


def _infidelity(mps, dense_target):
    od = _mps_dense(mps)
    ex = dense_target / np.linalg.norm(dense_target)
    return 1.0 - abs(np.vdot(ex, od / np.linalg.norm(od)))


def test_long_range_mpo_dense_parity():
    n, j, lam, h = 5, 0.7, 0.55, 1.1
    mpo = exp_decay_ising_mpo(n, j=j, lam=lam, h=h)
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1
        )
    dense = np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))
    assert np.max(np.abs(dense - _dense_lr_ising(n, j, lam, h))) < 1e-12


def test_wii_tfim_real_time_second_order():
    hm = tfim_mpo(N, j=1.0, h=0.9)
    hd = np.zeros((2**N, 2**N))
    for i in range(N - 1):
        hd -= _site_op(Z, i, N) @ _site_op(Z, i + 1, N)
    for i in range(N):
        hd -= 0.9 * _site_op(X, i, N)
    psi0 = _tilted_product(N)
    target = sla.expm(-1j * hd * 0.8) @ _mps_dense(psi0)

    errs = []
    for steps in (8, 16):
        out = mpo_evolve(psi0, hm, 0.8, steps, max_bond=32, order=1)
        errs.append(_infidelity(out, target))
    assert errs[0] < 2e-5
    assert errs[1] < 1e-6
    assert errs[0] / errs[1] > 8.0  # 1-fid ~ dt^4 => >= x16 ideally


def test_wii_long_range_orders():
    """Interior A-block exercised; order=2 complex-pair composition
    beats order=1 by >an order of magnitude and scales at dt^2."""
    hm = exp_decay_ising_mpo(N, j=0.7, lam=0.55, h=1.1)
    hd = _dense_lr_ising(N, 0.7, 0.55, 1.1)
    psi0 = _tilted_product(N)
    target = sla.expm(-1j * hd * 0.8) @ _mps_dense(psi0)

    e1 = _infidelity(mpo_evolve(psi0, hm, 0.8, 16, max_bond=32, order=1),
                     target)
    e2 = _infidelity(mpo_evolve(psi0, hm, 0.8, 16, max_bond=32, order=2),
                     target)
    e2b = _infidelity(mpo_evolve(psi0, hm, 0.8, 8, max_bond=32, order=2),
                      target)
    assert e2 < 2e-6
    assert e1 / e2 > 50.0
    assert e2b / e2 > 8.0


def test_wii_imaginary_time_ground_state():
    hm = exp_decay_ising_mpo(N, j=0.7, lam=0.55, h=1.1)
    hd = _dense_lr_ising(N, 0.7, 0.55, 1.1)
    w0, v0 = np.linalg.eigh(hd)
    psi0 = _tilted_product(N)
    gs = mpo_evolve(psi0, hm, 5.0, 50, max_bond=32, imag=True)
    gd = _mps_dense(gs)
    gd /= np.linalg.norm(gd)
    e = float(np.real(gd.conj() @ hd @ gd))
    assert abs(e - w0[0]) < 1e-5
    assert abs(np.vdot(v0[:, 0], gd)) > 1.0 - 1e-6


def test_wii_rejects_non_automaton_boundaries():
    import pytest

    hm = tfim_mpo(4)
    from contractn_tpu.models.mpo import MPO

    bad = MPO(hm.cores, hm.right, hm.left)
    with pytest.raises(ValueError):
        wii_mpo(bad, -0.1)


# --------------------------------------------------------------------- #
# Infinite chains: uniform W^II evolution
# --------------------------------------------------------------------- #


def _pfeuty_e(h, nk=4001):
    k = np.linspace(-np.pi, np.pi, nk)
    return -0.5 * np.trapezoid(
        np.sqrt(1 + h * h - 2 * h * np.cos(k)), k) / (2 * np.pi) * 2


def test_umps_wii_imag_time_pfeuty():
    """Imaginary-time uniform W^II flow from a product state reaches
    the infinite TFIM ground energy (Pfeuty exact) directly in the
    thermodynamic limit — no finite chain anywhere."""
    from contractn_tpu.models import umps
    from contractn_tpu.models.mpo_evolution import umps_mpo_evolve

    h = 1.4
    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    v = np.array([np.cos(0.3), np.sin(0.3)])
    core0 = jnp.asarray((v / np.linalg.norm(v))[:, None, None])
    core = umps_mpo_evolve(core0, hc, 5.0, 50, bond_dim=12, imag=True)
    ex = umps.expect_local(core, X)
    ez = umps.expect_local(core, Z)
    czz = umps.correlate(core, Z, Z, [1])[0]
    e = -np.real(czz + ez * ez) - h * np.real(ex)
    assert abs(e - _pfeuty_e(h)) < 2e-4


def test_umps_wii_real_time_quench_second_order():
    """Real-time infinite quench: bulk <X>(t) matches the center site
    of a dense finite chain (light cone inside), and the order=2
    conjugate-pair composition converges at dt^2."""
    from contractn_tpu.models import umps
    from contractn_tpu.models.mpo_evolution import umps_mpo_evolve

    n, h, t = 10, 0.9, 0.5
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd -= _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    for i in range(n):
        hd -= h * _site_op(X, i, n)
    v = np.array([np.cos(0.3), np.sin(0.3)])
    v /= np.linalg.norm(v)
    psi = v.copy()
    for _ in range(n - 1):
        psi = np.kron(psi, v)
    psit = sla.expm(-1j * hd * t) @ psi
    rho = psit.reshape(2 ** (n // 2), 2, -1)
    x_ex = np.einsum("asb,st,atb->", rho.conj(), X, rho).real

    hc = np.asarray(tfim_mpo(2, h=h).cores)[0]
    core0 = jnp.asarray(v[:, None, None])
    errs = []
    for steps in (8, 16):
        core = umps_mpo_evolve(core0, hc, t, steps, bond_dim=16)
        xi = umps.expect_local(core, X)
        assert abs(np.imag(xi)) < 1e-12
        errs.append(abs(np.real(xi) - x_ex))
    assert errs[1] < 2e-4
    assert errs[0] / errs[1] > 3.0  # dt^2


def test_umps_apply_truncation_error():
    """umps_apply reports the discarded Schmidt weight: zero when the
    bond is not truncated, positive and small when it is."""
    from contractn_tpu.models.mpo_evolution import umps_apply, wii_core

    hc = np.asarray(tfim_mpo(2, h=1.1).cores)[0]
    prop = wii_core(hc, -0.05)
    v = np.array([1.0, 0.4])
    core = jnp.asarray((v / np.linalg.norm(v))[:, None, None],
                       jnp.complex128)
    big, err0 = umps_apply(core, jnp.asarray(prop), 8)
    assert big.shape == (2, 2, 2)
    assert abs(float(err0)) < 1e-12
    big2, _ = umps_apply(big, jnp.asarray(prop), 8)
    big3, err = umps_apply(big2, jnp.asarray(prop), 4)
    assert big3.shape == (2, 4, 4)
    assert 0.0 <= float(err) < 1e-4
