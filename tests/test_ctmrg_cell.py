"""Directional (Corboz) cell CTMRG: exact cross-checks.

Three independent anchors: the symmetric-CTMRG code path on a 1x1 cell
(byte-level agreement of the free energy), translation invariance on a
uniform 2x2 cell, and the classical Ising ANTIFERROMAGNET on a genuine
checkerboard cell against Onsager-Yang (the AFM <-> FM gauge map makes
the staggered magnetization exactly the ferromagnetic one).
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.ctmrg_cell import (
    ctmrg_cell,
    pair_expectation_h,
    rotate,
    site_expectation,
)
from contractn_tpu.models.ctmrg import free_energy_per_site, ising_tensor


def afm_tensors(beta, eps=0.0):
    """Classical AFM Ising site/impurity tensors for both sublattices.

    ``B_AFM = W_A W_B^T`` with ``W_A = W_FM`` and ``W_B`` its
    spin-flipped rows; ``eps`` is a staggered symmetry-breaking field.
    """
    b_fm = np.array([[np.exp(beta), np.exp(-beta)],
                     [np.exp(-beta), np.exp(beta)]])
    vals, vecs = np.linalg.eigh(b_fm)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    wa, wb = w, np.array([[0.0, 1.0], [1.0, 0.0]]) @ w
    b_afm = np.array([[np.exp(-beta), np.exp(beta)],
                      [np.exp(beta), np.exp(-beta)]])
    assert np.allclose(wa @ wb.T, b_afm)
    spin = np.array([1.0, -1.0])
    pa, pb = np.exp(eps * spin), np.exp(-eps * spin)

    def site(wm, p):
        return jnp.asarray(np.einsum("s,su,sl,sd,sr->uldr",
                                     p, wm, wm, wm, wm))

    def imp(wm, p):
        return jnp.asarray(np.einsum("s,s,su,sl,sd,sr->uldr",
                                     spin, p, wm, wm, wm, wm))

    return site(wa, pa), site(wb, pb), imp(wa, pa), imp(wb, pb)


def cell_free_energy_1x1(a, env):
    """Baxter corner-ratio free energy from a 1x1 cell environment."""
    c1, c2, c3, c4, t1, t2, t3, t4 = (e[0][0] for e in env)
    w_a = jnp.einsum("ab,auc,ce,blf,uldr,erg,fh,hdi,gi->",
                     c1, t1, c2, t4, a, t2, c4, t3, c3)
    w_c = jnp.einsum("ab,ac,be,ce->", c1, c2, c4, c3)
    w_h = jnp.einsum("ab,auc,cd,be,euf,df->", c1, t1, c2, c4, t3, c3)
    w_v = jnp.einsum("ab,ac,ble,clf,eg,fg->", c1, c2, t4, t2, c4, c3)
    return float(jnp.log(jnp.abs(w_a * w_c / (w_h * w_v))))


def test_1x1_cell_matches_symmetric_ctmrg():
    beta = 0.3
    a = ising_tensor(beta)
    env = ctmrg_cell(((a,),), chi=16, iters=80)
    f_cell = cell_free_energy_1x1(a, env)
    f_sym = free_energy_per_site(a, chi=16, iters=150)
    assert np.isclose(f_cell, f_sym, rtol=1e-12), (f_cell, f_sym)


def test_rotation_is_order_four():
    a = (((ising_tensor(0.4)),),)
    env = ctmrg_cell(a, chi=8, iters=20)
    a_r, env_r = a, env
    for _ in range(4):
        a_r, env_r = rotate(a_r, env_r)
    for got, want in zip(jax.tree_util.tree_leaves((a_r, env_r)),
                         jax.tree_util.tree_leaves((a, env))):
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_uniform_2x2_cell_translation_invariant():
    """All four sites of a uniform cell give the symmetric-CTMRG bond
    correlator, itself pinned by the free-energy derivative."""
    beta = 0.3
    a = ising_tensor(beta)
    imp = ising_tensor(beta, field_op=[1.0, -1.0])
    cell = ((a, a), (a, a))
    env = ctmrg_cell(cell, chi=16, iters=60)
    db = 1e-5
    want = (free_energy_per_site(ising_tensor(beta + db), 16, iters=150)
            - free_energy_per_site(ising_tensor(beta - db), 16,
                                   iters=150)) / (2 * db) / 2.0
    for x in range(2):
        for y in range(2):
            got = float(pair_expectation_h(cell, env, imp, imp, x, y))
            assert np.isclose(got, want, atol=1e-8), (x, y, got, want)
            assert abs(float(site_expectation(cell, env, imp, x, y))
                       ) < 1e-10  # disordered: <sigma> = 0


def test_checkerboard_afm_matches_onsager():
    """Staggered magnetization of the AFM on a 2x2 checkerboard cell ==
    Onsager-Yang spontaneous magnetization, alternating in sign."""
    beta = 0.5
    m_exact = (1.0 - np.sinh(2 * beta) ** -4) ** 0.125
    a_a, a_b, i_a, i_b = afm_tensors(beta, eps=1e-4)
    cell = ((a_a, a_b), (a_b, a_a))
    imps = ((i_a, i_b), (i_b, i_a))
    env = ctmrg_cell(cell, chi=16, iters=120)
    ms = [[float(site_expectation(cell, env, imps[x][y], x, y))
           for y in range(2)] for x in range(2)]
    # perfect sublattice alternation
    assert np.isclose(ms[0][0], ms[1][1], atol=1e-9)
    assert np.isclose(ms[1][0], ms[0][1], atol=1e-9)
    assert np.isclose(ms[0][0], -ms[1][0], atol=1e-9)
    assert np.isclose(abs(ms[0][0]), m_exact, atol=2e-4), (
        ms[0][0], m_exact)
    # AFM bond: <s_i s_j> negative and equal to minus the FM value
    imp_fm = ising_tensor(beta, field_op=[1.0, -1.0])
    a_fm = ising_tensor(beta)
    env_fm = ctmrg_cell(((a_fm,),), chi=16, iters=120)
    ss_fm = float(pair_expectation_h(((a_fm,),), env_fm, imp_fm,
                                        imp_fm, 0, 0))
    ss_afm = float(pair_expectation_h(cell, env, imps[0][0],
                                         imps[1][0], 0, 0))
    # eps = 1e-4 symmetry-breaking field shifts the correlator O(eps)
    assert np.isclose(ss_afm, -ss_fm, atol=3e-4), (ss_afm, ss_fm)


def test_row_correlator_distance_one_equals_pair_patch():
    beta = 0.3
    a = ising_tensor(beta)
    imp = ising_tensor(beta, field_op=[1.0, -1.0])
    cell = ((a,),)
    env = ctmrg_cell(cell, chi=16, iters=80)
    from contractn_tpu.models.ctmrg_cell import row_correlator

    c1 = row_correlator(cell, env, imp, imp, [1], connected=False)[0]
    p1 = pair_expectation_h(cell, env, imp, imp, 0, 0)
    assert np.isclose(float(c1), float(p1), rtol=1e-12)


def test_transfer_spectrum_matches_onsager_correlation_length():
    """2D Ising (T > Tc): the row-channel transfer spectrum's
    correlation length against the exact axial Onsager value
    ``1/xi = ln coth(beta) - 2 beta``; and the real-space correlator
    decay agrees once the Ornstein-Zernike ``r^{-1/2}`` prefactor is
    divided out."""
    from contractn_tpu.models.ctmrg_cell import (
        row_correlator,
        row_transfer_spectrum,
    )

    beta = 0.3
    a = ising_tensor(beta)
    imp = ising_tensor(beta, field_op=[1.0, -1.0])
    cell = ((a,),)
    env = ctmrg_cell(cell, chi=24, iters=100)
    _, xi = row_transfer_spectrum(cell, env)
    xi_exact = 1.0 / (np.log(1.0 / np.tanh(beta)) - 2.0 * beta)
    assert abs(xi - xi_exact) / xi_exact < 0.02, (xi, xi_exact)

    cs = row_correlator(cell, env, imp, imp, [8, 10])
    c8, c10 = (float(np.real(v)) for v in cs)
    # pure OZ form C(r) ~ r^{-1/2} e^{-r/xi}
    rate = (np.log(c8 / c10) - 0.5 * np.log(10.0 / 8.0)) / 2.0
    assert abs(rate - 1.0 / xi_exact) < 0.02, (1.0 / rate, xi_exact)


def test_quantum_row_correlator_matches_classical():
    """sqrt-Boltzmann iPEPS <Z_0 Z_r> through the double-layer cell
    channel == the classical correlator (two independent code paths)."""
    from contractn_tpu.models.ctmrg_cell import row_correlator
    from contractn_tpu.models.ipeps import peps_double_layer

    beta = 0.35
    b = np.array([[np.exp(beta / 2), np.exp(-beta / 2)],
                  [np.exp(-beta / 2), np.exp(beta / 2)]])
    vals, vecs = np.linalg.eigh(b)
    w = vecs * np.sqrt(np.maximum(vals, 0.0))[None, :]
    a_q = jnp.asarray(np.einsum("su,sl,sd,sr->suldr", w, w, w, w))
    sz = np.diag([1.0, -1.0])
    dl = peps_double_layer(a_q)
    dl_imp = peps_double_layer(a_q, sz)
    cell_q = ((dl,),)
    env_q = ctmrg_cell(cell_q, chi=16, iters=100)
    got = [float(np.real(v)) for v in row_correlator(
        cell_q, env_q, dl_imp, dl_imp, [1, 3, 5])]

    a_c = ising_tensor(beta)
    imp_c = ising_tensor(beta, field_op=[1.0, -1.0])
    cell_c = ((a_c,),)
    env_c = ctmrg_cell(cell_c, chi=16, iters=100)
    want = [float(np.real(v)) for v in row_correlator(
        cell_c, env_c, imp_c, imp_c, [1, 3, 5])]
    assert np.allclose(got, want, rtol=1e-8), (got, want)
