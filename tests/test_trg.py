"""Levin-Nave TRG + GILT vs Onsager exact free energies."""

import numpy as np

from contractn_tpu.models.ctmrg import ising_tensor
from contractn_tpu.models.trg import trg_log_z
from tests.test_ctmrg import onsager_log_z


def test_free_energy_matches_onsager():
    for beta, tol in ((0.3, 1e-8), (0.5, 1e-6)):
        got = trg_log_z(ising_tensor(beta), chi=16, steps=30)
        assert np.isclose(got, onsager_log_z(beta), atol=tol), (beta, got)


def test_chi_convergence_at_criticality():
    """Truncation error shrinks with chi at the critical point (the
    hardest spot for TRG — CDL loop entanglement limits the rate)."""
    beta_c = 0.5 * np.log(1.0 + np.sqrt(2.0))
    exact = 0.5 * np.log(2.0) + 2.0 * 0.9159655941772190 / np.pi
    e8 = abs(trg_log_z(ising_tensor(beta_c), chi=8, steps=30) - exact)
    e16 = abs(trg_log_z(ising_tensor(beta_c), chi=16, steps=30) - exact)
    assert e8 < 1e-4 and e16 < 1e-5, (e8, e16)
    assert e16 < e8


def test_gilt_improves_off_critical_truncation():
    """Uniform GILT at chi=8 cuts the beta=0.3 truncation error ~10x
    (measured 5.3e-6 -> 5.8e-7) and stays exact where TRG is exact."""
    beta = 0.3
    exact = onsager_log_z(beta)
    plain = abs(trg_log_z(ising_tensor(beta), chi=8, steps=30) - exact)
    gilt = abs(
        trg_log_z(ising_tensor(beta), chi=8, steps=30, gilt_eps=1e-4)
        - exact
    )
    assert gilt < 0.3 * plain, (plain, gilt)


def test_gilt_harmless_at_criticality():
    """The single-tensor uniform GILT variant must not DEGRADE the
    critical point (full Gilt-TNR gains need the checkerboard-
    asymmetric application — documented in the module)."""
    beta_c = 0.5 * np.log(1.0 + np.sqrt(2.0))
    exact = 0.5 * np.log(2.0) + 2.0 * 0.9159655941772190 / np.pi
    plain = abs(trg_log_z(ising_tensor(beta_c), chi=8, steps=30) - exact)
    gilt = abs(
        trg_log_z(ising_tensor(beta_c), chi=8, steps=30, gilt_eps=1e-4)
        - exact
    )
    assert gilt < 1.5 * plain, (plain, gilt)


def test_cross_family_consistency():
    """TRG, HOTRG and CTMRG agree on a NON-Ising tensor (no exact
    oracle needed: three independent algorithms, one number)."""
    from contractn_tpu.models.ctmrg import free_energy_per_site
    from contractn_tpu.models.hotrg import hotrg_log_z

    rng = np.random.default_rng(7)
    q = 2
    raw = rng.uniform(0.5, 1.5, (q, q, q, q))
    # average over the full C4v point group (rotation r: (u,l,d,r) <-
    # (l,d,r,u); mirror m: l <-> r) so every algorithm's symmetry
    # assumption holds; entries stay positive
    rot = (1, 2, 3, 0)
    mir = (0, 3, 2, 1)
    perms = {(0, 1, 2, 3)}
    frontier = [(0, 1, 2, 3)]
    while frontier:
        p = frontier.pop()
        for g in (rot, mir):
            np_ = tuple(p[i] for i in g)
            if np_ not in perms:
                perms.add(np_)
                frontier.append(np_)
    a = sum(raw.transpose(p) for p in sorted(perms)) / len(perms)
    t = trg_log_z(a, chi=12, steps=30)
    h = hotrg_log_z(a, chi=12, steps=30)
    c = free_energy_per_site(a, chi=24, iters=300)
    assert np.isclose(t, h, atol=1e-8), (t, h)
    assert np.isclose(t, c, atol=1e-8), (t, c)
