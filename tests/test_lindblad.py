"""Open-system (Lindblad) tests: dense-superoperator parity, RK4
trajectories against ``expm``, and a boundary-driven steady state.

The reference has no density-operator machinery of any kind; these
tests pin the vectorization conventions (the transpose in the
right-multiplication lift, the ``vec(O^T)`` trace bras) against dense
oracles built independently in the standard row-major convention.
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

from contractn_tpu.models.lindblad import (
    density_expectation,
    density_expectation_multi,
    density_trace,
    lindblad_evolve,
    lindblad_evolve_wii,
    liouvillian_automaton,
    liouvillian_mpo,
    vectorized_product_state,
)
from contractn_tpu.models.lindblad import ness_dmrg
from contractn_tpu.models.mpo import (
    MPO,
    mpo_dagger,
    mpo_from_bond_term,
    mpo_multiply,
)
from contractn_tpu.models.mps import MPS

X = np.array([[0.0, 1.0], [1.0, 0.0]])
Y = np.array([[0.0, -1j], [1j, 0.0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]])
SP = np.array([[0.0, 1.0], [0.0, 0.0]])
SM = SP.T
I2 = np.eye(2)


def _site_op(mat, site, n):
    out = np.eye(1)
    for k in range(n):
        out = np.kron(out, mat if k == site else I2)
    return out


def _dense_xx(n, j=1.0):
    h = np.zeros((2**n, 2**n), complex)
    for i in range(n - 1):
        h += j * (
            _site_op(X, i, n) @ _site_op(X, i + 1, n)
            + _site_op(Y, i, n) @ _site_op(Y, i + 1, n)
        )
    return h


def _dense_liouvillian(h, jumps):
    """Row-major convention: ``vec(A rho B) = (A kron B^T) vec(rho)``."""
    dim = h.shape[0]
    eye = np.eye(dim)
    lv = -1j * (np.kron(h, eye) - np.kron(eye, h.T))
    for lk in jumps:
        ldl = lk.conj().T @ lk
        lv += np.kron(lk, lk.conj())
        lv -= 0.5 * np.kron(ldl, eye)
        lv -= 0.5 * np.kron(eye, ldl.T)
    return lv


def _mpo_dense(mpo, n, d):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            d * dd, d * dd, -1
        )
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def _fused_to_standard(mat, n):
    """Permute site-fused ``(s1 a1)(s2 a2)...`` rows/cols into the
    standard ``(s1..sn)(a1..an)`` superoperator ordering."""
    t = mat.reshape((2, 2) * n * 2)
    row_s = [2 * i for i in range(n)]
    row_a = [2 * i + 1 for i in range(n)]
    col_s = [2 * n + 2 * i for i in range(n)]
    col_a = [2 * n + 2 * i + 1 for i in range(n)]
    t = t.transpose(row_s + row_a + col_s + col_a)
    return t.reshape(4**n, 4**n)


def _standard_to_fused_vec(rho_mat, n):
    """Dense ``(2^n, 2^n)`` density matrix -> site-fused ``4^n`` vector."""
    t = rho_mat.reshape((2,) * (2 * n))
    order = []
    for i in range(n):
        order += [i, n + i]
    return t.transpose(order).reshape(-1)


def test_liouvillian_matches_dense_superoperator():
    """Assembled superoperator MPO == dense Liouvillian entrywise,
    with mixed site-specific (non-Hermitian) and uniform jumps."""
    n = 3
    h2 = (np.kron(X, X) + np.kron(Y, Y)).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jumps = [(0, 0.7 * SP), (n - 1, 0.5 * SM), np.sqrt(0.3) * Z]
    hop = np.sqrt(0.4) * (np.kron(SP, SM) + 0.5 * np.kron(SM, SP))
    l_mpo = liouvillian_mpo(h_mpo, jumps=jumps, bond_jumps=[hop])

    def _bond_op(mat, i, n):
        out = np.eye(1)
        for k in range(n):
            if k == i:
                out = np.kron(out, mat)
            elif k != i + 1:
                out = np.kron(out, I2)
        return out

    dense_jumps = [
        _site_op(0.7 * SP, 0, n),
        _site_op(0.5 * SM, n - 1, n),
    ] + [_site_op(np.sqrt(0.3) * Z, i, n) for i in range(n)] + [
        _bond_op(hop, i, n) for i in range(n - 1)
    ]
    lv_dense = _dense_liouvillian(_dense_xx(n), dense_jumps)
    lv_mpo = _fused_to_standard(_mpo_dense(l_mpo, n, 4), n)
    assert np.max(np.abs(lv_dense - lv_mpo)) < 1e-12


def test_liouvillian_automaton_dense_parity():
    """The uncompressed triangular-automaton Liouvillian equals the
    SVD-compressed one entrywise — lifting the Hamiltonian automaton's
    blocks channel by channel is exact, including bond dissipators."""
    n = 3
    h2 = (np.kron(X, X) + np.kron(Y, Y)).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jumps = [(0, 0.7 * SP), (n - 1, 0.5 * SM), np.sqrt(0.3) * Z]
    hop = np.sqrt(0.4) * (np.kron(SP, SM) + 0.5 * np.kron(SM, SP))
    da = _mpo_dense(
        liouvillian_automaton(h_mpo, jumps=jumps, bond_jumps=[hop]),
        n, 4)
    dm = _mpo_dense(
        liouvillian_mpo(h_mpo, jumps=jumps, bond_jumps=[hop]), n, 4)
    assert np.max(np.abs(da - dm)) < 1e-12


def test_wii_lindblad_second_order():
    """W^II propagation of the Liouvillian automaton: the conjugate-
    pair composition (``order=2``) tracks dense ``expm`` and gains
    ~4x per dt halving — genuinely second order even though ``L`` is
    non-Hermitian (the W^II construction never assumes Hermiticity)."""
    n = 4
    gamma = 0.35
    h2 = (np.kron(X, X) + np.kron(Y, Y)).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jump = np.sqrt(gamma) * Z
    states = [
        np.array([1.0, 0.3]) if i % 2 == 0 else np.array([0.2, 1.0])
        for i in range(n)
    ]
    rho0 = vectorized_product_state(states)
    rho_d = np.eye(1)
    for v in states:
        v = v / np.linalg.norm(v)
        rho_d = np.kron(rho_d, np.outer(v, v.conj()))
    t = 0.5
    lv_dense = _dense_liouvillian(
        _dense_xx(n), [_site_op(jump, i, n) for i in range(n)]
    )
    rho_dt = (sla.expm(lv_dense * t) @ rho_d.reshape(-1)).reshape(
        2**n, 2**n
    )

    def _max_err(n_steps):
        rho_t = lindblad_evolve_wii(
            rho0, h_mpo, t, n_steps=n_steps, jumps=[jump], max_bond=24
        )
        assert abs(density_trace(rho_t) - 1.0) < 1e-9
        return max(
            abs(np.trace(_site_op(Z, i, n) @ rho_dt).real
                - density_expectation(rho_t, Z, i).real)
            for i in range(n)
        )

    err40 = _max_err(40)
    assert err40 < 5e-4
    err80 = _max_err(80)
    assert err40 / err80 > 3.0  # second-order convergence


def test_rk4_trajectory_matches_expm():
    """Dephased XX chain: magnetization trajectory == dense ``expm``."""
    n = 4
    gamma = 0.35
    h2 = (np.kron(X, X) + np.kron(Y, Y)).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jump = np.sqrt(gamma) * Z
    l_mpo = liouvillian_mpo(h_mpo, jumps=[jump])

    states = [
        np.array([1.0, 0.3]) if i % 2 == 0 else np.array([0.2, 1.0])
        for i in range(n)
    ]
    rho0 = vectorized_product_state(states)
    assert abs(density_trace(rho0) - 1.0) < 1e-12

    t = 0.5
    rho_t = lindblad_evolve(rho0, l_mpo, t, n_steps=40, max_bond=24)
    assert abs(density_trace(rho_t) - 1.0) < 1e-9

    rho_d = np.eye(1)
    for v in states:
        v = v / np.linalg.norm(v)
        rho_d = np.kron(rho_d, np.outer(v, v.conj()))
    lv_dense = _dense_liouvillian(
        _dense_xx(n), [_site_op(jump, i, n) for i in range(n)]
    )
    rho_dt = (sla.expm(lv_dense * t) @ rho_d.reshape(-1)).reshape(
        2**n, 2**n
    )
    for i in range(n):
        zd = np.trace(_site_op(Z, i, n) @ rho_dt).real
        zm = density_expectation(rho_t, Z, i).real
        assert abs(zd - zm) < 2e-6


def test_mpo_operator_algebra_dense_parity():
    """``mpo_multiply``/``mpo_dagger`` == dense matrix product/adjoint
    for random complex MPOs (different bond dims)."""
    import jax

    n = 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    m1 = MPO.random(k1, n, 2, 3, dtype=jnp.complex128)
    m2 = MPO.random(k2, n, 2, 2, dtype=jnp.complex128)
    d1 = _mpo_dense(m1, n, 2)
    d2 = _mpo_dense(m2, n, 2)
    prod = _mpo_dense(mpo_multiply(m1, m2), n, 2)
    assert np.max(np.abs(prod - d1 @ d2)) < 1e-12
    dag = _mpo_dense(mpo_dagger(m1), n, 2)
    assert np.max(np.abs(dag - d1.conj().T)) < 1e-12


def test_driven_chain_steady_state_annihilated():
    """Boundary-driven XX chain: the dense NESS (null vector of the
    Liouvillian), converted to a vectorized MPS, is annihilated by the
    superoperator MPO, and the spin current measured through
    ``density_expectation_multi`` matches the dense value and is
    uniform across bonds (a NESS conservation law)."""
    from contractn_tpu.models.boundary import apply_mpo_to_mps

    n = 4
    gam = 0.6
    h2 = (np.kron(X, X) + np.kron(Y, Y)).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jumps = [(0, np.sqrt(gam) * SP), (n - 1, np.sqrt(gam) * SM)]
    l_mpo = liouvillian_mpo(h_mpo, jumps=jumps)

    dense_jumps = [
        _site_op(np.sqrt(gam) * SP, 0, n),
        _site_op(np.sqrt(gam) * SM, n - 1, n),
    ]
    lv_dense = _dense_liouvillian(_dense_xx(n), dense_jumps)
    w, v = np.linalg.eig(lv_dense)
    ness_vec = v[:, np.argmin(np.abs(w))]
    ness = ness_vec.reshape(2**n, 2**n)
    ness = ness / np.trace(ness)
    ness = 0.5 * (ness + ness.conj().T)  # Hermitize the null vector

    rho = MPS.from_dense(
        jnp.asarray(_standard_to_fused_vec(ness, n)), 4
    )
    assert abs(density_trace(rho) - 1.0) < 1e-10

    lrho = apply_mpo_to_mps(l_mpo, rho)
    val, log = lrho.norm_squared()
    residual = float(np.sqrt(abs(complex(val * jnp.exp(log)))))
    assert residual < 1e-8

    # spin current J_i = 2 (X_i Y_{i+1} - Y_i X_{i+1}); NESS => uniform
    currents = []
    for i in range(n - 1):
        jm = 2.0 * (
            density_expectation_multi(rho, [(i, X), (i + 1, Y)])
            - density_expectation_multi(rho, [(i, Y), (i + 1, X)])
        )
        jd = 2.0 * (
            np.trace(
                _site_op(X, i, n) @ _site_op(Y, i + 1, n) @ ness
            )
            - np.trace(
                _site_op(Y, i, n) @ _site_op(X, i + 1, n) @ ness
            )
        )
        assert abs(jm - jd) < 1e-10
        currents.append(jm.real)
    assert np.ptp(currents) < 1e-8
    assert abs(currents[0]) > 1e-3  # genuinely current-carrying

    # NESS by DMRG on L^+ L: no time evolution, residual is the
    # built-in quality certificate.
    rho_d, res = ness_dmrg(l_mpo, max_bond=16, sweeps=6)
    assert res < 1e-6
    assert abs(density_trace(rho_d) - 1.0) < 1e-10
    for i in range(n):
        zd = np.trace(_site_op(Z, i, n) @ ness).real
        zm = density_expectation(rho_d, Z, i).real
        assert abs(zd - zm) < 1e-8
    jm = 2.0 * (
        density_expectation_multi(rho_d, [(1, X), (2, Y)])
        - density_expectation_multi(rho_d, [(1, Y), (2, X)])
    )
    assert abs(jm.real - currents[1]) < 1e-8


def test_two_time_correlation_quantum_regression():
    """C(t1, t1+tau) = Tr(B e^{L tau}[A rho(t1)]) by the quantum
    regression theorem == the dense expm route at the W^II Trotter
    error, along the whole lag grid (A rho is NOT a state — this pins
    that the evolution machinery is linear, not trace-projecting)."""
    from contractn_tpu.models.lindblad import two_time_correlation

    n = 3
    h2 = (np.kron(Z, Z)
          + 0.9 * 0.5 * (np.kron(X, I2) + np.kron(I2, X))).astype(complex)
    h_mpo = mpo_from_bond_term(h2, n, dtype=complex)
    jumps = [np.sqrt(0.35) * SM]

    hd = np.zeros((2 ** n, 2 ** n), complex)
    for i in range(n - 1):
        hd += np.kron(np.kron(np.eye(2 ** i), h2),
                      np.eye(2 ** (n - i - 2)))
    lv = _dense_liouvillian(
        hd, [_site_op(np.sqrt(0.35) * SM, i, n) for i in range(n)])

    states = [np.array([1.0, 0.5]), np.array([0.3, 1.0]),
              np.array([1.0, -0.2])]
    rho0_d = np.eye(1)
    for s in states:
        v = np.array(s, complex)
        rho0_d = np.kron(rho0_d, np.outer(v, v.conj()))
    rho0 = vectorized_product_state(states)

    t1, taus = 0.3, np.array([0.0, 0.2, 0.5, 0.9])
    got = two_time_correlation(rho0, h_mpo, X, 0, Z, 2, t1, taus,
                               n_steps_per_unit=200, jumps=jumps,
                               max_bond=32)
    dim = 2 ** n
    rho1 = (sla.expm(lv * t1) @ rho0_d.reshape(-1)).reshape(dim, dim)
    sig = _site_op(X, 0, n) @ rho1
    want = np.array([
        np.trace(_site_op(Z, 2, n)
                 @ (sla.expm(lv * tau) @ sig.reshape(-1)
                    ).reshape(dim, dim)) / np.trace(rho1)
        for tau in taus])
    assert np.max(np.abs(got - want)) < 2e-5
    # tau=0 sanity: C(t1, t1) = <Z_2 X_0>_{rho(t1)}
    direct = np.trace(_site_op(Z, 2, n) @ _site_op(X, 0, n) @ rho1
                      ) / np.trace(rho1)
    assert abs(got[0] - direct) < 2e-5
