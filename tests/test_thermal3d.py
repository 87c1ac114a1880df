"""Thermal cubic-lattice purification vs classical 3D Ising + high-T
cumulants — the quantum purification path (bipartite evolution +
checkerboard HOTRG measurement) and the classical impurity-flow path
meet on one number."""

import numpy as np

from contractn_tpu.models.hotrg3d import hotrg3d_bond_expectation
from contractn_tpu.models.ipeps3d import tfim_bond_term_3d
from contractn_tpu.models.thermal3d import (
    infinite_temperature_site3d,
    thermal3d_bond_expectation,
    thermal3d_energy,
    thermal3d_site_expectation,
    thermal_ipeps3d,
)
from tests.test_hotrg3d import _ising3d_pair

X = np.array([[0.0, 1.0], [1.0, 0.0]])
Z = np.diag([1.0, -1.0])


def test_infinite_temperature_exact():
    """beta = 0: maximally mixed — <X> = <Z> = 0, unit norm, through
    the full checkerboard double-layer measurement stack."""
    gamma = infinite_temperature_site3d(2)
    lams = {c: np.array([1.0, 0.0])
            for c in ("x1", "x2", "y1", "y2", "z1", "z2")}
    for op in (X, Z):
        v = thermal3d_site_expectation(gamma, gamma, lams, op, chi=4,
                                       steps=15)
        assert abs(v) < 1e-12, v
    one = thermal3d_site_expectation(gamma, gamma, lams, np.eye(2),
                                     chi=4, steps=15)
    assert np.isclose(one, 1.0, atol=1e-12), one


def test_commuting_matches_classical_3d_ising():
    """h = 0: rho ~ e^{beta sum ZZ} IS the classical 3D Ising model —
    the purification (exact rank-2 bonds, no Trotter error) must
    reproduce the classical bond correlation from the independent
    hotrg3d impurity flow at the same beta."""
    beta = 0.3
    h2 = tfim_bond_term_3d(1.0, 0.0)
    ga, gb, lams = thermal_ipeps3d(h2, beta, bond_dim=2, n_steps=3)
    # direction-resolved weights must be degenerate by symmetry
    for ax in "xyz":
        np.testing.assert_allclose(np.asarray(lams[ax + "1"]),
                                   np.asarray(lams[ax + "2"]),
                                   atol=1e-12)
    zz = np.kron(Z, Z)
    got = thermal3d_bond_expectation(ga, gb, lams, zz, chi=6, steps=22)

    # matched-chi comparison: the purification's double layer IS the
    # classical Boltzmann network in another basis, so at equal flow
    # chi the two paths agree to machine precision (the truncation
    # bias — beta=0.3 is in the ordered phase, where cuts land on Z2
    # quasi-degenerate multiplets — is IDENTICAL on both sides)
    a_cl, imp = _ising3d_pair(beta)
    want = hotrg3d_bond_expectation(a_cl, imp, imp, chi=6, steps=22)
    assert np.isclose(got, want, atol=1e-9), (got, want)

    # one-site magnetization zero by symmetry, both sublattices (the
    # ordered-phase flow amplifies roundoff symmetry breaking — 7e-9
    # measured at beta = 0.3, so the bound is loose)
    for sub in ("A", "B"):
        mz = thermal3d_site_expectation(ga, gb, lams, Z, chi=6,
                                        steps=22, sublattice=sub)
        assert abs(mz) < 1e-6, (sub, mz)


def test_high_temperature_cumulant():
    """E(beta)/site = -beta (3 J^2 + h^2) + O(beta^3) (the third
    cumulant vanishes on the triangle-free cubic lattice), and
    <X> = beta h to leading order."""
    beta, h = 0.05, 1.0
    h2 = tfim_bond_term_3d(1.0, h)
    ga, gb, lams = thermal_ipeps3d(h2, beta, bond_dim=2, n_steps=4)
    e = thermal3d_energy(ga, gb, lams, h2, chi=6, steps=22)
    want = -beta * (3.0 + h * h)
    # measured -0.20090 vs -0.2: the 4.5e-3 relative residue is the
    # O(beta^3) cumulant + first-order Trotter of the 6-class sweep
    assert np.isclose(e, want, atol=1.5e-3), (e, want)

    mx = thermal3d_site_expectation(ga, gb, lams, X, chi=6, steps=22)
    assert np.isclose(mx, beta * h, atol=5e-3), mx


def test_torus_oracle_matches_handbuilt_purification():
    """Gauge-invariant 2x2x2-torus contraction: the evolved bipartite
    representation and the hand-built exact purification of the SAME
    commuting thermal state must agree on closed-network values —
    independent of any coarse-graining flow.  This oracle caught both
    seed-geometry and frame-permutation bugs that every flow-based
    test masked (a wrong class map moves correlations to other legs;
    the torus sees it immediately)."""
    import itertools
    import string

    import opt_einsum as oe

    from contractn_tpu.models.thermal3d import thermal3d_double_layers

    beta = 0.3
    h2 = tfim_bond_term_3d(1.0, 0.0)
    lz = np.kron(Z, np.eye(2))

    def torus(ts):
        idx = {}
        letters = iter(string.ascii_letters)

        def bond(s1, s2, tag):
            key = (min(s1, s2), max(s1, s2), tag)
            if key not in idx:
                idx[key] = next(letters)
            return idx[key]

        terms, ops = [], []
        for (x, y, z) in itertools.product(range(2), repeat=3):
            u = bond((x, y, z), (x, y, (z + 1) % 2),
                     "z0" if z == 0 else "z1")
            d = bond((x, y, (z - 1) % 2), (x, y, z),
                     "z0" if z == 1 else "z1")
            r = bond((x, y, z), ((x + 1) % 2, y, z),
                     "x0" if x == 0 else "x1")
            ll = bond(((x - 1) % 2, y, z), (x, y, z),
                      "x0" if x == 1 else "x1")
            f = bond((x, y, z), (x, (y + 1) % 2, z),
                     "y0" if y == 0 else "y1")
            k = bond((x, (y - 1) % 2, z), (x, y, z),
                     "y0" if y == 1 else "y1")
            terms.append(u + ll + d + r + f + k)
            ops.append(ts[(x, y, z)])
        return oe.contract(",".join(terms) + "->", *ops)

    def build(na, nb, imp=None):
        ts = {}
        for s in itertools.product(range(2), repeat=3):
            t = na if sum(s) % 2 == 0 else nb
            if imp and s in imp:
                t = imp[s]
            ts[s] = t
        return ts

    ga, gb, lams = thermal_ipeps3d(h2, beta, bond_dim=2, n_steps=2)
    ea, eb = map(np.asarray, thermal3d_double_layers(ga, gb, lams))
    ia, _ = thermal3d_double_layers(ga, gb, lams, op_a=lz)
    _, ib = thermal3d_double_layers(ga, gb, lams, op_b=lz)
    ia, ib = np.asarray(ia), np.asarray(ib)

    b2h = beta / 2
    ch, sh = np.sqrt(np.cosh(b2h)), np.sqrt(np.sinh(b2h))
    w = np.array([[ch, sh], [ch, -sh]])
    G = np.zeros((4, 2, 2, 2, 2, 2, 2))
    for s in range(2):
        G[s * 2 + s] = np.einsum(
            "u,l,d,r,f,k->uldrfk", w[s], w[s], w[s], w[s], w[s], w[s]
        ) / np.sqrt(2)
    he = np.einsum("suldrfk,sULDRFK->uUlLdDrRfFkK", G, G).reshape(
        (4,) * 6)
    hi = np.einsum("st,tuldrfk,sULDRFK->uUlLdDrRfFkK", lz, G,
                   G).reshape((4,) * 6)

    for pair in (((0, 0, 0), (0, 0, 1)), ((0, 0, 0), (1, 0, 0)),
                 ((0, 0, 0), (0, 1, 0))):
        ev = (torus(build(ea, eb, {pair[0]: ia, pair[1]: ib}))
              / torus(build(ea, eb)))
        hv = (torus(build(he, he, {pair[0]: hi, pair[1]: hi}))
              / torus(build(he, he)))
        assert np.isclose(float(ev), float(hv), atol=1e-12), (pair, ev,
                                                              hv)
