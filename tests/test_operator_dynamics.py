"""Heisenberg-picture operator dynamics: dense-oracle parity for the
adjoint Liouvillian automaton, W^II Heisenberg trajectories, OTOCs,
light cones, operator entanglement, and the forward/adjoint duality.

The reference has no operator dynamics (or evolution of any kind);
these pin the vectorization and adjoint conventions against dense
``expm`` conjugation in the standard row-major basis.
"""

import numpy as np
import scipy.linalg as sla

from contractn_tpu.models.lindblad import (
    lindblad_evolve_wii,
    liouvillian_automaton,
    vectorized_product_state,
)
from contractn_tpu.models.mpo import mpo_from_bond_term
from contractn_tpu.models.chebyshev import spectral_function
from contractn_tpu.models.operator_dynamics import (
    heisenberg_evolve_wii,
    liouvillian_kpm_moments,
    operator_entropy,
    otoc,
    vectorized_operator,
    vectorized_operator_sum,
)

from test_lindblad import (
    SM,
    SP,
    X,
    Z,
    _dense_liouvillian,
    _fused_to_standard,
    _mpo_dense,
    _site_op,
    _standard_to_fused_vec,
)
from test_mpo_evolution import _mps_dense

I2 = np.eye(2)

# mixed-field Ising bond term (nonintegrable -> genuine scrambling)
HX, HZ = 1.05, 0.5
H2 = (np.kron(Z, Z) + HX * 0.5 * (np.kron(X, I2) + np.kron(I2, X))
      + HZ * 0.5 * (np.kron(Z, I2) + np.kron(I2, Z))).astype(complex)


def _dense_h(n):
    hd = np.zeros((2**n, 2**n), complex)
    for i in range(n - 1):
        hd += np.kron(np.kron(np.eye(2**i), H2), np.eye(2**(n - i - 2)))
    return hd


def test_adjoint_automaton_is_dense_adjoint():
    """``liouvillian_automaton(adjoint=True)`` == conjugate transpose
    of the dense Liouvillian (the vec basis is Hilbert-Schmidt
    orthonormal), with site, uniform, and bond jumps mixed in."""
    n = 3
    h_mpo = mpo_from_bond_term(H2, n, dtype=complex)
    jumps = [(0, 0.7 * SP), (2, 0.5 * SM), np.sqrt(0.3) * Z]
    hop = np.sqrt(0.4) * (np.kron(SP, SM) + 0.5 * np.kron(SM, SP))

    def _bond_op(mat, i):
        out = np.eye(1)
        for k in range(n):
            if k == i:
                out = np.kron(out, mat)
            elif k != i + 1:
                out = np.kron(out, I2)
        return out

    dense_jumps = (
        [_site_op(0.7 * SP, 0, n), _site_op(0.5 * SM, n - 1, n)]
        + [_site_op(np.sqrt(0.3) * Z, i, n) for i in range(n)]
        + [_bond_op(hop, i) for i in range(n - 1)]
    )
    lv_dense = _dense_liouvillian(_dense_h(n), dense_jumps)
    la = liouvillian_automaton(h_mpo, jumps=jumps, bond_jumps=[hop],
                               adjoint=True)
    da = _fused_to_standard(_mpo_dense(la, n, 4), n)
    assert np.max(np.abs(da - lv_dense.conj().T)) < 1e-12


def test_heisenberg_otoc_and_entropy_dense_parity():
    """Closed-system Heisenberg evolution: vec(W(t)) == dense unitary
    conjugation, the infinite-T OTOC matches the dense 4-point trace,
    the squared commutator shows the light cone, and the operator
    entanglement profile equals the dense operator Schmidt entropy of
    the evolved MPS."""
    n = 4
    h_mpo = mpo_from_bond_term(H2, n, dtype=complex)
    hd = _dense_h(n)
    w0 = vectorized_operator(n, [(0, Z)])
    t = 1.0
    wt = heisenberg_evolve_wii(w0, h_mpo, t, n_steps=40, max_bond=48)

    u = sla.expm(-1j * hd * t)
    wt_dense = u.conj().T @ _site_op(Z, 0, n) @ u
    wt_vec = _standard_to_fused_vec(wt_dense, n)
    wt_mps = _mps_dense(wt)
    assert np.max(np.abs(wt_mps - wt_vec)) < 2e-3  # O(dt^2) W^II error

    f_mps, c_mps = otoc(wt, Z, 3)
    f_dense = np.trace(
        wt_dense.conj().T @ _site_op(Z, 3, n) @ wt_dense
        @ _site_op(Z, 3, n)) / 2**n
    assert abs(f_mps - f_dense) < 1e-5
    assert abs(c_mps - (1.0 - np.real(f_dense))) < 1e-5

    # light cone: at t=0.3 the front has not reached site 3
    wt_s = heisenberg_evolve_wii(w0, h_mpo, 0.3, n_steps=12, max_bond=48)
    _, c_far = otoc(wt_s, Z, 3)
    _, c_near = otoc(wt_s, Z, 1)
    assert abs(c_far) < 1e-8
    assert c_near > 1e-4

    # operator entropy == dense Schmidt entropy of the same vector
    s_mps = np.asarray(operator_entropy(wt))
    vec_f = wt_mps.reshape((4,) * n)
    for cut in range(1, n):
        sv = np.linalg.svd(vec_f.reshape(4**cut, -1), compute_uv=False)
        p = sv**2 / np.sum(sv**2)
        s_dense = -np.sum(np.where(p > 1e-300, p * np.log(p), 0.0))
        assert abs(s_mps[cut - 1] - s_dense) < 1e-9
    assert s_mps.max() > 0.1  # genuinely grown operator


def test_adjoint_duality_with_dissipation():
    """``Tr(O(t) rho(0)) == Tr(O(0) rho(t))`` — Heisenberg (adjoint
    master equation) vs Schroedinger (Lindblad) W^II propagation are
    adjoints of each other; and O(t) matches the dense adjoint
    ``expm``."""
    n = 4
    h_mpo = mpo_from_bond_term(H2, n, dtype=complex)
    jumps = [np.sqrt(0.3) * Z]
    states = [np.array([1.0, 0.4]) if i % 2 else np.array([0.6, 1.0])
              for i in range(n)]
    rho0 = vectorized_product_state(states)
    o0 = vectorized_operator(n, [(1, X)])
    t = 0.6
    ot = heisenberg_evolve_wii(o0, h_mpo, t, n_steps=40, jumps=jumps,
                               max_bond=32)
    rhot = lindblad_evolve_wii(rho0, h_mpo, t, n_steps=40, jumps=jumps,
                               max_bond=32)

    def _hs_trace(a_vec, b_vec):
        a_d = _mps_dense(a_vec).reshape((2, 2) * n)
        b_d = _mps_dense(b_vec).reshape((2, 2) * n)
        perm = [2 * i for i in range(n)] + [2 * i + 1 for i in range(n)]
        a_m = a_d.transpose(perm).reshape(2**n, 2**n)
        b_m = b_d.transpose(perm).reshape(2**n, 2**n)
        return np.trace(a_m @ b_m)

    lhs = _hs_trace(ot, rho0)
    rhs = _hs_trace(o0, rhot)
    assert abs(lhs - rhs) < 1e-4
    assert abs(np.real(lhs) - np.real(rhs)) < 1e-10

    # O(t) against the dense adjoint propagator
    lv = _dense_liouvillian(_dense_h(n),
                            [_site_op(jumps[0], i, n) for i in range(n)])
    ot_std = sla.expm(lv.conj().T * t) @ _site_op(X, 1, n).reshape(-1)
    ot_dense = _standard_to_fused_vec(ot_std.reshape(2**n, 2**n), n)
    assert np.max(np.abs(_mps_dense(ot) - ot_dense)) < 1e-3


def test_liouvillian_kpm_infinite_t_spectrum():
    """Infinite-temperature dynamical spectrum by Liouvillian KPM: the
    MPS moments equal the dense matrix Chebyshev recursion on
    ``K X = [H, X]`` at machine precision; the reconstructed S(w) is
    positive, even (Hermitian probe at T=inf), and sums to
    ``Tr(O+ O)/2^n``; the momentum probe's sum rule is ``n``."""
    n = 5
    h_mpo = mpo_from_bond_term(H2, n, dtype=complex)
    hd = _dense_h(n)
    evals = np.linalg.eigvalsh(hd)
    bounds = (evals[0] - 0.2, evals[-1] + 0.2)
    width = bounds[1] - bounds[0]

    n_mom = 64
    mom, a, b = liouvillian_kpm_moments(
        h_mpo, vectorized_operator(n, [(2, Z)]), n_mom, bounds,
        max_bond=48)
    assert abs(b) < 1e-14

    op = _site_op(Z, 2, n)
    a_d = 2 * width / (2.0 - 0.025)
    t_prev = op.copy()
    t_cur = (hd @ op - op @ hd) / a_d
    dm = [np.trace(op.conj().T @ t_prev) / 2 ** n,
          np.trace(op.conj().T @ t_cur) / 2 ** n]
    for _ in range(2, n_mom):
        t_prev, t_cur = (t_cur,
                         2 * (hd @ t_cur - t_cur @ hd) / a_d - t_prev)
        dm.append(np.trace(op.conj().T @ t_cur) / 2 ** n)
    assert np.max(np.abs(np.real(mom) - np.real(dm))) < 1e-10
    assert np.max(np.abs(np.imag(mom))) < 1e-12

    w = np.linspace(-width - 1, width + 1, 3001)
    s = spectral_function(mom, a, b, w, e0=0.0)
    assert np.all(s >= -1e-12)
    assert np.max(np.abs(s - s[::-1])) < 1e-12  # even in w at T=inf
    assert abs(np.trapezoid(s, w) - 1.0) < 1e-4  # Pauli sum rule

    phases = np.exp(1j * np.pi * np.arange(n))
    momk, _, _ = liouvillian_kpm_moments(
        h_mpo, vectorized_operator_sum(n, Z, phases), 16, bounds,
        max_bond=48)
    assert abs(momk[0] - n) < 1e-10  # Tr(Ok+ Ok)/2^n == n


def test_thermal_kpm_matches_dense_thermal_oracle():
    """Finite-temperature dynamical structure factor by KPM on the
    purification: moments equal the dense recursion traced against the
    EXACT thermal density matrix (error = Trotter error of the
    purified state), and the sum rule is Tr(rho O+ O)."""
    import scipy.linalg as _sla

    from contractn_tpu.models.circuits import thermal_state
    from contractn_tpu.models.operator_dynamics import (
        thermal_kpm_moments,
    )

    n, beta = 4, 0.8
    hd = _dense_h(n)
    evals = np.linalg.eigvalsh(hd)
    bounds = (evals[0] - 0.2, evals[-1] + 0.2)
    psi = thermal_state(H2, n, beta, max_bond=64, n_steps=200).finalize()
    h_mpo = mpo_from_bond_term(H2, n, dtype=complex)
    n_mom = 48
    mom, a, b = thermal_kpm_moments(h_mpo, psi, Z, 1, n_mom, bounds,
                                    max_bond=64)

    rho = _sla.expm(-beta * hd)
    rho /= np.trace(rho)
    od = _site_op(Z, 1, n)
    width = bounds[1] - bounds[0]
    a_d = 2 * width / (2.0 - 0.025)
    t_prev = od.copy()
    t_cur = (hd @ od - od @ hd) / a_d
    dm = [np.trace(rho @ od.conj().T @ t_prev),
          np.trace(rho @ od.conj().T @ t_cur)]
    for _ in range(2, n_mom):
        t_prev, t_cur = (t_cur,
                         2 * (hd @ t_cur - t_cur @ hd) / a_d - t_prev)
        dm.append(np.trace(rho @ od.conj().T @ t_cur))
    assert abs(mom[0] - 1.0) < 1e-10  # Tr(rho Z^2) == 1
    assert np.max(np.abs(mom - np.array(dm))) < 1e-6  # Trotter-limited

    w = np.linspace(-width - 0.5, width + 0.5, 4001)
    s = spectral_function(mom, a, b, w, e0=0.0)
    assert np.all(s >= -1e-12)
    assert abs(np.trapezoid(s, w) - 1.0) < 1e-4
    # finite T breaks the w -> -w symmetry (detailed balance weights)
    assert np.max(np.abs(s - s[::-1])) > 1e-3


def test_daoe_dissipator_and_conserved_transport():
    """DAOE: the dissipator's dense action is exactly diagonal in the
    Pauli-string basis with eigenvalue exp(-gamma max(0, w - lstar));
    lstar >= n is the identity; gamma=0 evolution reduces to the plain
    adjoint evolution; and along a DAOE trajectory of the XX chain the
    conserved-density overlaps sum to a constant (hydrodynamic
    safety)."""
    import itertools

    from contractn_tpu.models.operator_dynamics import (
        daoe_evolve,
        daoe_mpo,
        operator_overlap,
    )

    n, gamma, lstar = 3, 0.7, 1
    dis = daoe_mpo(n, gamma, lstar)
    dd = _mpo_dense(dis, n, 4)
    paulis = [np.eye(2), X, np.array([[0, -1j], [1j, 0]]), Z]
    for combo in itertools.product(range(4), repeat=n):
        vec = np.array([1.0])
        for k in combo:
            vec = np.kron(vec, paulis[k].reshape(-1))
        w = sum(1 for k in combo if k != 0)
        expect = np.exp(-gamma * max(0, w - lstar))
        got = dd @ vec
        assert np.max(np.abs(got - expect * vec)) < 1e-12, combo

    ident = _mpo_dense(daoe_mpo(n, 0.9, n), n, 4)
    assert np.max(np.abs(ident - np.eye(4 ** n))) < 1e-12

    # XX chain: [H, Z_tot] = 0; DAOE leaves the weight-1 conserved
    # density invariant, so sum_i Tr(Z_i W(t))/2^n is constant.
    nn = 6
    xx = (np.kron(X, X) + np.kron(
        np.array([[0, -1j], [1j, 0]]), np.array([[0, -1j], [1j, 0]]))
    ).astype(complex)
    h_mpo = mpo_from_bond_term(xx, nn, dtype=complex)
    w0 = vectorized_operator(nn, [(2, Z)])
    zs = [vectorized_operator(nn, [(i, Z)]) for i in range(nn)]
    s0 = sum(np.real(operator_overlap(z, w0)) for z in zs)
    wt = daoe_evolve(w0, h_mpo, 1.0, 20, gamma=0.4, lstar=1,
                     max_bond=64)  # 4^3: exact manifold at n=6
    st = sum(np.real(operator_overlap(z, wt)) for z in zs)
    assert abs(s0 - 1.0) < 1e-12
    assert abs(st - s0) < 1e-6, (s0, st)

    # gamma=0 == plain adjoint evolution
    wt0 = daoe_evolve(w0, h_mpo, 0.4, 8, gamma=0.0, lstar=2,
                      max_bond=64)
    wt_ref = heisenberg_evolve_wii(w0, h_mpo, 0.4, 8, max_bond=64)
    assert np.max(np.abs(_mps_dense(wt0) - _mps_dense(wt_ref))) < 1e-10


def test_dos_kpm_exact_trace():
    """Exact KPM density of states: moments equal the dense
    eigenvalue sums (no stochastic estimator anywhere), mu_0 = 1, the
    reconstruction is a normalized positive density, and the spectral
    mean equals Tr(H)/2^n = 0 (traceless TFIM)."""
    from contractn_tpu.models.dmrg import tfim_mpo
    from contractn_tpu.models.operator_dynamics import dos_kpm_moments

    # n=6 with bond 64 = 4^(n/2): the OPERATOR manifold is exact, so
    # the trace moments are machine-exact (operator Chebyshev vectors
    # grow in Schmidt rank much faster than states — at a truncating
    # bond the late moments drift at the truncation scale).
    n, h = 6, 1.1
    h_mpo = tfim_mpo(n, h=h)
    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd -= _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    for i in range(n):
        hd -= h * _site_op(X, i, n)
    evals = np.linalg.eigvalsh(hd)
    bounds = (evals[0] - 0.2, evals[-1] + 0.2)

    n_mom = 48
    mom, a, b = dos_kpm_moments(h_mpo, n_mom, bounds, max_bond=64)
    xs = (evals - b) / a
    dense = np.array([np.mean(np.cos(k * np.arccos(xs)))
                      for k in range(n_mom)])
    assert abs(mom[0] - 1.0) < 1e-12
    assert np.max(np.abs(np.real(mom) - dense)) < 1e-8
    assert np.max(np.abs(np.imag(mom))) < 1e-10

    w = np.linspace(bounds[0] - 0.5, bounds[1] + 0.5, 6001)
    rho = spectral_function(mom, a, b, w, e0=0.0)
    assert np.all(rho >= -1e-12)
    # the reconstruction clips hard at the reduced band edge where
    # the 1/sqrt(1-x^2) weight peaks, so the quadrature floor is ~1e-5
    # regardless of grid density
    assert abs(np.trapezoid(rho, w) - 1.0) < 1e-4
    mean = np.trapezoid(rho * w, w)
    assert abs(mean) < 1e-4  # Tr H = 0


def test_lanczos_coefficients_match_dense_liouvillian():
    """Operator-growth b_n (Krylov complexity): the MPO-compressed
    three-term recursion equals the dense commutator Lanczos exactly
    when max_bond covers the light cone."""
    from contractn_tpu.models import lanczos_coefficients, tfim_mpo

    n = 6
    h = 1.05
    h_mpo = tfim_mpo(n, h=h)
    bs = lanczos_coefficients(h_mpo, [(n // 2, Z)], 10, max_bond=64)

    hd = np.zeros((2 ** n, 2 ** n))
    for i in range(n - 1):
        hd -= _site_op(Z, i, n) @ _site_op(Z, i + 1, n)
    for i in range(n):
        hd -= h * _site_op(X, i, n)

    def ip(a, b):
        return np.trace(a.conj().T @ b) / 2 ** n

    op = _site_op(Z, n // 2, n)
    op = op / np.sqrt(ip(op, op).real)
    prev, ref = None, []
    for _ in range(10):
        w = hd @ op - op @ hd
        if prev is not None:
            w = w - ref[-1] * prev
        b = np.sqrt(ip(w, w).real)
        prev, op = op, w / b
        ref.append(b)
    assert np.abs(bs - np.array(ref)).max() < 1e-10
