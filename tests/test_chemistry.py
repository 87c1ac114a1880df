"""Quantum-chemistry stack vs published values + an independent FCI.

Three layers of arbitration, none sharing code with the pipeline under
test:

* the integral engine against the PUBLISHED Szabo-Ostlund H2/STO-3G
  numbers (overlap, RHF energy) — pins the closed-form Gaussians;
* the OpSum/MPO/DMRG chain against :func:`fci_ground`, a bit-string
  determinant diagonalizer with its own fermionic sign bookkeeping;
* basis invariance: the electronic ground energy must agree between the
  Lowdin-orthogonalized AO basis and the RHF MO basis (completely
  different integral tensors, same physics).
"""

import numpy as np
import pytest

from contractn_tpu.models import chemistry as chem


def _h2(r=1.4011):
    syms, xyz = chem.h_chain_geometry(2, r)
    basis, charges = chem.sto3g_basis(syms, xyz)
    S, hcore, eri, e_nuc = chem.molecular_integrals(basis, charges, xyz)
    return S, hcore, eri, e_nuc


def test_h2_published_szabo_ostlund_values():
    S, hcore, eri, e_nuc = _h2()
    # Szabo & Ostlund (STO-3G, R = 1.4 a0): S12 = 0.6593,
    # E_RHF(total) = -1.1167 Ha, E_FCI(total) = -1.1373 Ha.
    assert abs(S[0, 1] - 0.6593) < 2e-3
    e_hf, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    assert abs(e_hf + e_nuc - (-1.1167)) < 2e-3
    h1, g = chem.mo_transform(hcore, eri, C)
    e_fci = chem.fci_ground(h1, g, n_elec=2)
    assert abs(e_fci + e_nuc - (-1.1373)) < 2e-3
    # correlation energy is negative (variational FCI below HF)
    assert e_fci < e_hf - 1e-3


def test_h2_dmrg_equals_fci_machine_precision():
    S, hcore, eri, e_nuc = _h2()
    e_hf, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    e_fci = chem.fci_ground(h1, g, n_elec=2)
    e_dmrg, mps, _ = chem.chemistry_dmrg(h1, g, 2, max_bond=8, sweeps=4)
    assert abs(e_dmrg - e_fci) < 1e-10
    # the neutral sector holds the global Fock-space minimum, so the
    # unconstrained DMRG ground state is the physical one
    assert abs(chem.fci_ground(h1, g, n_elec=None) - e_fci) < 1e-10


def test_h2_basis_invariance_lowdin_vs_mo():
    S, hcore, eri, e_nuc = _h2()
    x = chem.lowdin_orthogonal(S)
    h1_ao, g_ao = chem.mo_transform(hcore, eri, x)
    e_ao = chem.fci_ground(h1_ao, g_ao, n_elec=2)
    e_hf, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1_mo, g_mo = chem.mo_transform(hcore, eri, C)
    e_mo = chem.fci_ground(h1_mo, g_mo, n_elec=2)
    assert abs(e_ao - e_mo) < 1e-10
    # DMRG in the (worse-conditioned) Lowdin basis reaches the same
    # energy — the compiled operator is basis-correct, not just lucky
    e_dmrg, _, _ = chem.chemistry_dmrg(h1_ao, g_ao, 2, max_bond=8,
                                       sweeps=6)
    assert abs(e_dmrg - e_mo) < 1e-9


def test_h3_cation_chunked_mpo_and_excited_states():
    # H3+ (2 electrons, 3 orbitals): small enough for a fast exact
    # oracle, big enough to force the chunked MPO assembly path.
    syms, xyz = chem.h_chain_geometry(3, 1.65)
    basis, charges = chem.sto3g_basis(syms, xyz)
    S, hcore, eri, e_nuc = chem.molecular_integrals(basis, charges, xyz)
    e_hf, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)

    terms = chem.chemistry_terms(h1, g)
    mpo = chem.chemistry_mpo(h1, g, chunk=40)  # force >3 chunks
    assert len(terms) > 3 * 40

    e_fci = chem.fci_ground(h1, g, n_elec=2)
    e_dmrg, mps, _ = chem.chemistry_dmrg(h1, g, 2, max_bond=16,
                                         sweeps=6, mpo=mpo)
    assert abs(e_dmrg - e_fci) < 1e-8
    assert e_fci < e_hf  # correlation is variational


def test_rdms_match_independent_fci_rdms():
    S, hcore, eri, e_nuc = _h2()
    e_hf, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    e, mps, _ = chem.chemistry_dmrg(h1, g, 2, max_bond=8, sweeps=4)

    gam = chem.one_rdm(mps)
    gam2 = chem.two_rdm(mps)
    # energy reconstructed from the RDMs == the DMRG Rayleigh quotient
    assert abs(chem.rdm_energy(h1, g, gam, gam2) - e) < 1e-10
    # independent determinant-basis arbiter
    gam_fci, gam2_fci = chem.fci_rdms(h1, g, 2)
    assert np.max(np.abs(gam - gam_fci)) < 1e-8
    assert np.max(np.abs(gam2 - gam2_fci)) < 1e-8
    occ = chem.natural_occupations(mps)
    assert abs(np.sum(occ) - 2.0) < 1e-9
    assert occ[0] > 1.9  # H2 at equilibrium is single-reference


def test_charge_blocked_mpo_is_definite_and_dense_exact():
    from contractn_tpu.models.autompo import op_sum_mpo
    from contractn_tpu.models.u1 import mpo_channel_charges

    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    ops = chem.chemistry_op_sum(h1, g)
    blocked = op_sum_mpo(ops, 4, phys_charges=(0, 1))
    mpo_channel_charges(blocked, (0, 1))  # raises if SVD mixed charges
    plain = op_sum_mpo(ops, 4)
    with pytest.raises(ValueError):
        mpo_channel_charges(plain, (0, 1))  # the plain SVD DOES mix
    assert np.max(np.abs(_mpo_dense(blocked, 4)
                         - _mpo_dense(plain, 4))) < 1e-12


def test_chemistry_dmrg_u1_is_structurally_conserving():
    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    e, mps, _, masks = chem.chemistry_dmrg_u1(h1, g, 2, bond_dim=8,
                                              sweeps=8)
    assert abs(e - chem.fci_ground(h1, g, 2)) < 1e-10
    leak = np.max(np.abs(np.asarray(mps.cores)
                         * (1 - np.asarray(masks))))
    assert leak == 0.0  # exact zeros, not epsilon


def test_chemistry_dmrg_u1_holds_cation_sector_without_penalty():
    # H3+: the requested 2-electron sector is NOT the Fock-space
    # minimum; the masks hold it structurally where the plain DMRG
    # needed the Sz penalty.
    syms, xyz = chem.h_chain_geometry(3, 1.65)
    basis, charges = chem.sto3g_basis(syms, xyz)
    S, hcore, eri, e_nuc = chem.molecular_integrals(basis, charges, xyz)
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    e, mps, _, masks = chem.chemistry_dmrg_u1(h1, g, 2, bond_dim=16,
                                              sweeps=8)
    assert abs(e - chem.fci_ground(h1, g, 2)) < 1e-9
    assert np.max(np.abs(np.asarray(mps.cores)
                         * (1 - np.asarray(masks)))) == 0.0


def test_excited_states_match_fci_sector_spectrum():
    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    es, states = chem.chemistry_excited(h1, g, 2, 4, max_bond=8,
                                        sweeps=6)
    want = chem.fci_ground(h1, g, 2, k=4)
    # singlet ground + threefold-degenerate triplet
    assert np.max(np.abs(np.sort(es) - want)) < 1e-7
    assert np.std(es[1:]) < 1e-7


def test_orbital_ordering_is_spectrum_invariant():
    syms, xyz = chem.h_chain_geometry(3, 1.65)
    basis, charges = chem.sto3g_basis(syms, xyz)
    S, hcore, eri, e_nuc = chem.molecular_integrals(basis, charges, xyz)
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    perm = chem.orbital_ordering(h1, g)
    assert sorted(perm.tolist()) == [0, 1, 2]
    h1p, gp = chem.permute_orbitals(h1, g, perm)
    assert abs(chem.fci_ground(h1p, gp, 2)
               - chem.fci_ground(h1, g, 2)) < 1e-10


def test_thermal_chemistry_matches_dense_grand_canonical():
    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)

    def dense_thermal(beta, mu):
        m = 2
        ham = np.zeros((16, 16))
        nop = np.zeros((16, 16))
        terms = [
            (h1[p, q], [("cdag", 2 * p + s), ("c", 2 * q + s)])
            for p in range(m) for q in range(m) for s in (0, 1)
        ]
        for p in range(m):
            for q in range(m):
                for r in range(m):
                    for s_ in range(m):
                        gv = g[p, q, r, s_]
                        if abs(gv) < 1e-14:
                            continue
                        for sg in (0, 1):
                            for tu in (0, 1):
                                i1, i2 = 2 * p + sg, 2 * r + tu
                                i3, i4 = 2 * s_ + tu, 2 * q + sg
                                if i1 == i2 or i3 == i4:
                                    continue
                                terms.append(
                                    (0.5 * gv,
                                     [("cdag", i1), ("cdag", i2),
                                      ("c", i3), ("c", i4)])
                                )
        for det in range(16):
            for coef, ops in terms:
                hit = chem._apply_ops(ops, det)
                if hit:
                    ham[hit[1], det] += hit[0] * coef
            nop[det, det] = det.bit_count()
        kmat = ham - mu * nop
        w, v = np.linalg.eigh(kmat)
        rho = np.einsum("ik,k,jk->ij", v, np.exp(-beta * (w - w.min())),
                        v)
        rho /= np.trace(rho)
        return (np.einsum("ij,ji->", ham, rho),
                np.einsum("ij,ji->", nop, rho))

    for beta, mu, tol in ((0.5, 0.0, 5e-5), (1.0, -2.0, 5e-5)):
        e, n, psi, _ = chem.chemistry_thermal(h1, g, beta, mu=mu,
                                              max_bond=16, n_steps=20)
        ed, nd = dense_thermal(beta, mu)
        assert abs(e - ed) < tol, (beta, mu, e, ed)
        assert abs(n - nd) < tol, (beta, mu, n, nd)


def test_op_sum_mpo_triangular_form_is_dense_exact():
    from contractn_tpu.models.autompo import op_sum_mpo

    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    ops = chem.chemistry_op_sum(h1, g)
    tri = op_sum_mpo(ops, 4, compress=False)
    ref = op_sum_mpo(ops, 4)
    assert np.max(np.abs(_mpo_dense(tri, 4) - _mpo_dense(ref, 4))) \
        < 1e-12
    # triangular contract: boundary vectors are e_0 / e_last
    assert float(tri.left[0]) == 1.0 and float(tri.right[-1]) == 1.0


def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def test_determinant_mps_is_exact_product_state():
    occ = np.array([1, 0, 1, 1])
    mps = chem.determinant_mps(occ, bond_dim=4)
    cores = np.asarray(mps.cores)
    vec = np.asarray(mps.left)
    for i in range(4):
        vec = np.einsum("...j,pjq->...pq", vec, cores[i])
    vec = np.einsum("...q,q->...", vec, np.asarray(mps.right)).ravel()
    dense = np.zeros(16)
    dense[int("".join(map(str, occ)), 2)] = 1.0
    assert np.allclose(vec, dense)


def test_deparallelize_mpo_preserves_triangular_form():
    from contractn_tpu.models.autompo import op_sum_mpo
    from contractn_tpu.models.mpo import deparallelize_mpo
    from contractn_tpu.models.mpo_evolution import wii_mpo

    S, hcore, eri, e_nuc = _h2()
    _, C, _ = chem.restricted_hartree_fock(S, hcore, eri, 2)
    h1, g = chem.mo_transform(hcore, eri, C)
    fsm = op_sum_mpo(chem.chemistry_op_sum(h1, g), 4, compress=False)
    dep = deparallelize_mpo(fsm)
    # exact, much thinner, and still the triangular automaton W^II needs
    assert dep.cores.shape[-1] < fsm.cores.shape[-1] // 2
    assert np.max(np.abs(_mpo_dense(dep, 4) - _mpo_dense(fsm, 4))) \
        < 1e-12
    wii_mpo(dep, -0.05)  # raises if the form is broken

    # NN FSMs are already minimal: deparallelisation is a no-op there
    ops = chem.OpSum() if hasattr(chem, "OpSum") else None
    from contractn_tpu.models.autompo import OpSum

    ops = OpSum()
    for i in range(5):
        ops.add(1.0, "Sz", i, "Sz", i + 1)
    nn = op_sum_mpo(ops, 6, compress=False)
    dep2 = deparallelize_mpo(nn)
    assert dep2.cores.shape[-1] == nn.cores.shape[-1]
    assert np.max(np.abs(_mpo_dense(dep2, 6) - _mpo_dense(nn, 6))) \
        < 1e-13


def test_oscillator_strengths_match_fci():
    """UV spectroscopy end to end: the sector spectrum, transition
    dipoles, and length-gauge oscillator strengths of H2/STO-3G against
    a determinant-basis oracle (same sign bookkeeping as
    :func:`fci_ground`, independent of the MPS/MPO pipeline).  Spin
    selection is structural: the spin-summed dipole cannot connect the
    singlet ground state to any triplet component."""
    from contractn_tpu.models import gaussians as gau

    syms, xyz = chem.h_chain_geometry(2, 1.4011)
    basis, charges = chem.sto3g_basis(syms, xyz)
    s_mat, hcore, eri, _ = chem.molecular_integrals(basis, charges, xyz)
    _, c, _ = chem.restricted_hartree_fock(s_mat, hcore, eri, 2)
    h1, g2 = chem.mo_transform(hcore, eri, c)
    d_mo = np.einsum(
        "cpq,pi,qj->cij", gau.dipole_integrals(basis), c, c
    )

    energies, states = chem.chemistry_excited(h1, g2, 2, 6, max_bond=8,
                                              sweeps=5)
    f, tdip = chem.oscillator_strengths(energies, states, d_mo)

    # --- determinant-basis oracle (N = 2 sector, 4 spin orbitals) ---
    dets = [b for b in range(1 << 4) if bin(b).count("1") == 2]
    idx = {b: i for i, b in enumerate(dets)}

    def op_matrix(terms):
        mat = np.zeros((len(dets), len(dets)))
        for det in dets:
            for coef, ops in terms:
                hit = chem._apply_ops(ops, det)
                if hit is not None and hit[1] in idx:
                    mat[idx[hit[1]], idx[det]] += hit[0] * coef
        return mat

    terms = []
    for p in range(2):
        for q in range(2):
            for sg in (0, 1):
                terms.append(
                    (h1[p, q], [("cdag", 2 * p + sg), ("c", 2 * q + sg)])
                )
            for r in range(2):
                for s2 in range(2):
                    for sg in (0, 1):
                        for tu in (0, 1):
                            i1, i2 = 2 * p + sg, 2 * r + tu
                            i3, i4 = 2 * s2 + tu, 2 * q + sg
                            if i1 == i2 or i3 == i4:
                                continue
                            terms.append(
                                (0.5 * g2[p, q, r, s2],
                                 [("cdag", i1), ("cdag", i2),
                                  ("c", i3), ("c", i4)])
                            )
    w, v = np.linalg.eigh(op_matrix(terms))
    np.testing.assert_allclose(energies, w, atol=1e-8)

    zterms = [
        (d_mo[2][p, q], [("cdag", 2 * p + sg), ("c", 2 * q + sg)])
        for p in range(2) for q in range(2) for sg in (0, 1)
    ]
    dmat = op_matrix(zterms)
    td_fci = v[:, 0] @ dmat @ v
    f_fci = (2.0 / 3.0) * (w - w[0]) * td_fci**2

    # the bright sigma_g -> sigma_u singlet (state 4) and the dark rest
    np.testing.assert_allclose(f, f_fci, atol=1e-8)
    assert f[4] > 0.5  # the one allowed transition carries the weight
    assert np.all(f[1:4] < 1e-12)  # triplets: spin-forbidden exactly
    assert np.abs(tdip[:, :2]).max() < 1e-12  # off-axis: zero by C-inf-v
    # transition_element also handles diagonal (permanent) moments:
    # <0| z |0> == the FCI value (electrons sit mid-bond, geometry
    # starts at the origin)
    z_mpo = chem.one_body_mpo(d_mo[2])
    perm = chem.transition_element(z_mpo, states[0], states[0])
    assert abs(perm - td_fci[0]) < 1e-8


def test_uhf_symmetry_breaking_and_radical_dmrg():
    """Open-shell mean field: UHF heals to RHF at equilibrium, breaks
    to the Coulson-Fischer solution at dissociation (RHF's 0.2 Ha
    static-correlation failure), pins the Li doublet at the published
    energy, and feeds a UNO basis whose odd-electron DMRG matches the
    determinant FCI."""
    from contractn_tpu.models import gaussians as gau

    # equilibrium H2: the restricted solution IS the UHF minimum
    syms, xyz = chem.h_chain_geometry(2, 1.4011)
    basis, ch = chem.sto3g_basis(syms, xyz)
    s, h, eri, en = chem.molecular_integrals(basis, ch, xyz)
    e_r, _, _ = chem.restricted_hartree_fock(s, h, eri, 2)
    e_u, _, _ = chem.unrestricted_hartree_fock(s, h, eri, 1, 1)
    assert abs(e_u - e_r) < 1e-8

    # stretched H2: UHF dissociates to ~2 E(H), RHF is ~0.29 Ha high
    syms, xyz = chem.h_chain_geometry(2, 6.0)
    basis, ch = chem.sto3g_basis(syms, xyz)
    s, h, eri, en = chem.molecular_integrals(basis, ch, xyz)
    e_r, _, _ = chem.restricted_hartree_fock(s, h, eri, 2)
    e_u, _, _ = chem.unrestricted_hartree_fock(s, h, eri, 1, 1)
    assert abs(e_u + en - 2 * (-0.46658185)) < 2e-3
    assert e_u < e_r - 0.2

    # Li doublet: published STO-3G energy, then UNO-basis DMRG == FCI
    xyz = np.zeros((1, 3))
    basis, ch = gau.sto3g_shell_basis(["Li"], xyz)
    s, h, eri, _ = gau.molecular_integrals_general(basis, ch, xyz)
    e_u, (ca, cb), _ = chem.unrestricted_hartree_fock(s, h, eri, 2, 1)
    assert abs(e_u - (-7.315526)) < 1e-4
    c_no, occs = chem.uhf_natural_orbitals(s, ca, cb, 2, 1)
    # natural occupations of a single determinant are integers
    np.testing.assert_allclose(occs, [2, 1, 0, 0, 0], atol=1e-8)
    # the UNO basis is S-orthonormal
    ortho = np.einsum("pi,pq,qj->ij", c_no, s, c_no)
    assert np.abs(ortho - np.eye(5)).max() < 1e-10
    h1, g2 = chem.mo_transform(h, eri, c_no)
    e_fci = chem.fci_ground(h1, g2, n_elec=3)
    assert e_fci < e_u  # correlation is variational
    e_d, _, _ = chem.chemistry_dmrg(h1, g2, 3, max_bond=12, sweeps=4)
    assert abs(e_d - e_fci) < 1e-8
