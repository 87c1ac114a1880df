"""McMurchie-Davidson general-l integrals: three independent oracles.

1. **Quadrature**: the Boys function against 200-point Gauss-Legendre
   quadrature of its defining integral.
2. **s-block parity**: on s-only geometries the engine must reproduce
   ``chemistry.molecular_integrals`` — an INDEPENDENT closed-form
   implementation — to machine precision.
3. **Derivative oracle**: an unnormalized Cartesian ``p_x`` primitive
   is ``(1/2a) d/dA_x`` of the s primitive (and mixed d primitives are
   second derivatives), so every p/d integral class is pinned against
   central finite differences of the already-pinned s integrals — no
   external tables enter.
4. **Literature anchors**: LiH and H2O STO-3G RHF/FCI totals against
   published values, then DMRG == the independent determinant FCI.
"""

import numpy as np

from contractn_tpu.models import chemistry as chem
from contractn_tpu.models import gaussians as g


def test_boys_against_quadrature():
    # F_m(t) = int_0^1 u^(2m) exp(-t u^2) du
    x, w = np.polynomial.legendre.leggauss(200)
    u = 0.5 * (x + 1.0)
    w = 0.5 * w
    for t in (0.0, 1e-14, 0.3, 1.7, 12.0, 34.9, 35.1, 80.0):
        f = g.boys(6, t)
        for m in range(7):
            exact = np.sum(w * u ** (2 * m) * np.exp(-t * u * u))
            assert abs(f[m] - exact) < 1e-13


def test_s_block_parity_with_closed_forms():
    syms, xyz = chem.h_chain_geometry(3, 1.5)
    xyz = xyz + np.array([0.1, -0.2, 0.0])  # break axis alignment
    b_old, ch = chem.sto3g_basis(syms, xyz)
    s0, h0, e0, en0 = chem.molecular_integrals(b_old, ch, xyz)
    b_new, ch2 = g.sto3g_shell_basis(syms, xyz)
    s1, h1, e1, en1 = g.molecular_integrals_general(b_new, ch2, xyz)
    assert np.abs(s0 - s1).max() < 1e-12
    assert np.abs(h0 - h1).max() < 1e-12
    assert np.abs(e0 - e1).max() < 1e-12
    assert abs(en0 - en1) < 1e-12


def _fd1(f, pa, d, a, h=1e-5):
    """(1/2a) d/dA_d of f(A) by central differences."""
    up, dn = pa.copy(), pa.copy()
    up[d] += h
    dn[d] -= h
    return (f(up) - f(dn)) / (2.0 * h) / (2.0 * a)


def test_p_integrals_match_derivative_oracle():
    a, b = 0.8, 0.5
    pa = np.array([0.1, -0.2, 0.3])
    pb = np.array([1.0, 0.4, -0.7])
    pc = np.array([-0.3, 0.9, 0.2])
    pd = np.array([0.5, 0.5, 0.5])
    s = (0, 0, 0)
    for d, lmn in enumerate(((1, 0, 0), (0, 1, 0), (0, 0, 1))):
        assert abs(
            g.overlap_prim(a, lmn, pa, b, s, pb)
            - _fd1(lambda x: g.overlap_prim(a, s, x, b, s, pb), pa, d, a)
        ) < 1e-9
        assert abs(
            g.kinetic_prim(a, lmn, pa, b, s, pb)
            - _fd1(lambda x: g.kinetic_prim(a, s, x, b, s, pb), pa, d, a)
        ) < 1e-8
        assert abs(
            g.nuclear_prim(a, lmn, pa, b, s, pb, pc)
            - _fd1(
                lambda x: g.nuclear_prim(a, s, x, b, s, pb, pc), pa, d, a
            )
        ) < 1e-8
        assert abs(
            g.eri_prim(a, lmn, pa, b, s, pb, 0.6, s, pc, 0.9, s, pd)
            - _fd1(
                lambda x: g.eri_prim(
                    a, s, x, b, s, pb, 0.6, s, pc, 0.9, s, pd
                ),
                pa, d, a,
            )
        ) < 1e-8
    # ket-side p too: (s s | p_x s) via the ket center derivative
    c = 0.6
    assert abs(
        g.eri_prim(a, s, pa, b, s, pb, c, (1, 0, 0), pc, 0.9, s, pd)
        - _fd1(
            lambda x: g.eri_prim(a, s, pa, b, s, pb, c, s, x, 0.9, s, pd),
            pc, 0, c,
        )
    ) < 1e-8


def test_mixed_d_integral_is_second_derivative():
    # xy-type primitive = (1/2a)^2 d^2/dAx dAy of s (no lower term)
    a, b = 0.7, 0.45
    pa = np.array([0.2, -0.1, 0.4])
    pb = np.array([0.9, 0.6, -0.3])
    h = 1e-3

    def s_ov(x):
        return g.overlap_prim(a, (0, 0, 0), x, b, (0, 0, 0), pb)

    acc = 0.0
    for sx, sy in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        x = pa.copy()
        x[0] += sx * h
        x[1] += sy * h
        acc += sx * sy * s_ov(x)
    fd = acc / (4.0 * h * h) / (2.0 * a) ** 2
    exact = g.overlap_prim(a, (1, 1, 0), pa, b, (0, 0, 0), pb)
    assert abs(exact - fd) < 1e-6  # central-difference O(h^2) floor


def test_sto3g_shell_data_regenerates_published_exponents():
    basis, charges = g.sto3g_shell_basis(["O"], np.zeros((1, 3)))
    assert charges[0] == 8.0
    assert len(basis) == 5  # 1s, 2s, 2px, 2py, 2pz
    # published EMSL STO-3G oxygen exponents
    np.testing.assert_allclose(
        basis[0][2], [130.70932, 23.808861, 6.4436083], rtol=1e-4
    )
    np.testing.assert_allclose(
        basis[1][2], [5.0331513, 1.1695961, 0.3803890], rtol=1e-4
    )
    # unit self-overlap for every contracted function
    s, _, _, _ = g.molecular_integrals_general(
        basis, charges, np.zeros((1, 3))
    )
    np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-12)
    # 2p functions are orthogonal to everything on-site except selves
    assert abs(s[2, 3]) < 1e-12 and abs(s[0, 2]) < 1e-12


def _lih():
    xyz = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.015]])
    basis, ch = g.sto3g_shell_basis(["Li", "H"], xyz)
    return g.molecular_integrals_general(basis, ch, xyz)


def test_lih_matches_literature_and_dmrg_matches_fci():
    s, hcore, eri, e_nuc = _lih()
    e_hf, c, _ = chem.restricted_hartree_fock(s, hcore, eri, 4)
    # published STO-3G LiH near equilibrium: RHF ~ -7.8620,
    # FCI ~ -7.8824 (total energies, hartree)
    assert abs(e_hf + e_nuc - (-7.8620)) < 5e-3
    h1, g2 = chem.mo_transform(hcore, eri, c)
    e_fci = chem.fci_ground(h1, g2, n_elec=4)
    assert abs(e_fci + e_nuc - (-7.8824)) < 5e-3
    # frozen Li 1s core: the deep core barely correlates
    h1a, ga, e_core = g.freeze_core(h1, g2, 1)
    e_fc = chem.fci_ground(h1a, ga, n_elec=2)
    assert abs((e_fc + e_core) - e_fci) < 3e-4
    # DMRG on the 10-site active chain == the independent FCI
    e_dmrg, _, _ = chem.chemistry_dmrg(h1a, ga, 2, max_bond=16, sweeps=5)
    assert abs(e_dmrg - e_fc) < 1e-8


_H2O_CACHE = {}


def _h2o():
    """STO-3G water at the experimental geometry (cached: the integral
    generation is shared by the RHF/DMRG and dipole tests)."""
    if not _H2O_CACHE:
        half = np.deg2rad(104.52) / 2.0
        r = 0.9572 / 0.52917721067
        xyz = np.array(
            [
                [0.0, 0.0, 0.0],
                [r * np.sin(half), 0.0, r * np.cos(half)],
                [-r * np.sin(half), 0.0, r * np.cos(half)],
            ]
        )
        basis, ch = g.sto3g_shell_basis(["O", "H", "H"], xyz)
        _H2O_CACHE["geom"] = (basis, ch, xyz)
        _H2O_CACHE["ints"] = g.molecular_integrals_general(basis, ch, xyz)
    return _H2O_CACHE["geom"], _H2O_CACHE["ints"]


def test_h2o_matches_literature_and_dmrg_matches_fci():
    (basis, ch, xyz), (s, hcore, eri, e_nuc) = _h2o()
    e_hf, c, _ = chem.restricted_hartree_fock(s, hcore, eri, 10)
    # published STO-3G RHF at the experimental geometry: -74.9630
    assert abs(e_hf + e_nuc - (-74.9630)) < 2e-3
    h1, g2 = chem.mo_transform(hcore, eri, c)
    h1a, ga, e_core = g.freeze_core(h1, g2, 1)
    e_fci = chem.fci_ground(h1a, ga, n_elec=8)
    assert e_fci + e_core < e_hf - 1e-3  # correlation is variational
    e_dmrg, _, _ = chem.chemistry_dmrg(h1a, ga, 8, max_bond=24, sweeps=4)
    assert abs(e_dmrg - e_fci) < 1e-7


def test_h2o_dipole_literature_and_hellmann_feynman():
    (basis, ch, xyz), (s, hcore, eri, e_nuc) = _h2o()
    e_hf, c, _ = chem.restricted_hartree_fock(s, hcore, eri, 10)
    occ = c[:, :5]
    gamma = 2.0 * occ @ occ.T
    mu = g.dipole_moment(basis, ch, xyz, gamma)
    # C2v symmetry: dipole along the z bisector only
    assert abs(mu[0]) < 1e-10 and abs(mu[1]) < 1e-10
    # published STO-3G RHF water dipole ~ 1.73 debye
    assert abs(np.linalg.norm(mu) * 2.541746 - 1.73) < 0.05
    # Hellmann-Feynman: the analytic electronic dipole equals the
    # finite-field energy derivative of the VARIATIONAL RHF energy
    d_ao = g.dipole_integrals(basis)
    f = 1e-4
    ep, _, _ = chem.restricted_hartree_fock(s, hcore + f * d_ao[2],
                                            eri, 10)
    em, _, _ = chem.restricted_hartree_fock(s, hcore - f * d_ao[2],
                                            eri, 10)
    mu_elec = -np.einsum("pq,pq->", d_ao[2], gamma)
    assert abs(mu_elec + (ep - em) / (2.0 * f)) < 1e-6
