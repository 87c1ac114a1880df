"""Quasiparticle excitations: exact TFIM dispersion and Hermiticity.

The transverse-field Ising single-particle band is exactly
``omega(k) = 2 sqrt(h^2 - 2h cos k + 1)`` (Pfeuty / Jordan-Wigner); on
a converged gapped uMPS ground state the tangent-space ansatz
reproduces it to solver precision — including ``k = 0``, which
exercises the projected marginal corner solves.
"""

import numpy as np

import jax.numpy as jnp

from contractn_tpu.models import tfim_mpo, vumps
from contractn_tpu.models.excitations import (
    _dense_heff,
    _null_space_left,
    excitation_spectrum,
    quasiparticle_dispersion,
)


def tfim_dispersion(k, h):
    return 2.0 * np.sqrt(h * h - 2.0 * h * np.cos(k) + 1.0)


def test_tfim_dispersion_exact():
    h = 1.5  # gapped paramagnet: single quasiparticle band
    mpo = tfim_mpo(2, j=1.0, h=h)
    ground, omegas = quasiparticle_dispersion(
        mpo, ks=[0.0, 0.3, np.pi / 2, np.pi], bond_dim=12, iters=60)
    assert ground["gradient_norm"] < 1e-10
    for k, om in zip([0.0, 0.3, np.pi / 2, np.pi], omegas[:, 0]):
        assert np.isclose(om, tfim_dispersion(k, h), atol=1e-8), (
            k, om, tfim_dispersion(k, h))


def test_tfim_ordered_phase_sees_two_domain_wall_continuum():
    """Ordered side h < 1: elementary excitations are TOPOLOGICAL
    domain walls, invisible to the trivial-sector ansatz on the
    symmetry-broken state — what it finds instead is the
    two-domain-wall continuum, whose k = 0 edge is
    ``2 * epsilon_dw(0) = 4|1 - h|`` (each Pfeuty fermion costs
    ``2|1 - h|`` at its band bottom).  The variational energy sits at
    or slightly above that edge."""
    h = 0.4
    mpo = tfim_mpo(2, j=1.0, h=h)
    ground = vumps(mpo, bond_dim=12, iters=80)
    om = np.asarray(excitation_spectrum(ground, mpo, 0.0))
    edge = 4.0 * abs(1.0 - h)
    assert om[0] >= edge - 1e-8, (om[0], edge)
    assert om[0] < edge + 0.1, (om[0], edge)


def test_heff_is_hermitian():
    """The dense effective Hamiltonian (including the momentum-phased
    excitation environments) must be Hermitian BEFORE symmetrization —
    this pins the relative phases/adjoints of the LB/RB terms."""
    import contractn_tpu.models.excitations as exc
    from contractn_tpu.models.vumps import mpo_environments

    import jax

    h = 1.3
    mpo = tfim_mpo(2, j=1.0, h=h)
    ground = vumps(mpo, bond_dim=4, iters=60)
    al, ar, c = ground["al"], ground["ar"], ground["c"]
    w = jnp.asarray(mpo.cores[0])
    w = w.at[:, :, 0, -1].add(-ground["energy"] * jnp.eye(2))
    cdt = jnp.complex128
    al, ar, c, w = (t.astype(cdt) for t in (al, ar, c, w))
    fl, fr, _ = mpo_environments(al, ar, c, w)
    vl = _null_space_left(al)
    w_np = np.asarray(w)
    is_zero = tuple(tuple(bool(v) for v in row)
                    for row in (np.abs(w_np).sum(axis=(0, 1)) == 0.0))
    eye_diag = tuple(bool(np.allclose(w_np[:, :, ch, ch], np.eye(2)))
                     for ch in range(3))
    k = jnp.asarray(0.7, cdt)
    apply = jax.jit(lambda xb: exc._heff_x(xb, vl, al, ar, c, fl, fr,
                                           w, k, is_zero, eye_diag))
    n = vl.shape[1] * al.shape[1]
    basis = np.eye(n).reshape(n, vl.shape[1], al.shape[1])
    cols = np.stack([np.asarray(apply(jnp.asarray(b, cdt)))
                     for b in basis])
    hmat = cols.reshape(n, n).T
    assert np.max(np.abs(hmat - np.conj(hmat).T)) < 1e-9


def test_dense_heff_all_bands_positive():
    """Every band lies above the (subtracted) ground state."""
    h = 1.5
    mpo = tfim_mpo(2, j=1.0, h=h)
    ground = vumps(mpo, bond_dim=8, iters=60)
    om = np.asarray(excitation_spectrum(ground, mpo, 1.0))
    assert om.shape == (8 * 8,)
    assert np.all(om > 0.0)
    assert np.all(np.diff(om) >= -1e-12)  # ascending


def test_spectral_weights_sum_rule():
    """For ANY uMPS, ``O_k|GS>`` lies exactly in the one-B tangent
    sector, so the pole weights must saturate the static structure
    factor EXACTLY (computed independently from real-space connected
    correlators) — a stringent identity linking the excitation overlap
    machinery, the deflated momentum solves (k = 0 included), and the
    transfer-spectrum correlators.  Deep in the paramagnet the lowest
    pole carries essentially all of it (Z creates one quasiparticle)."""
    from contractn_tpu.models.excitations import (
        dynamic_structure_factor,
        spectral_weights,
    )
    from contractn_tpu.models.umps import static_structure_factor

    h = 3.0  # deep paramagnet
    mpo = tfim_mpo(2, j=1.0, h=h)
    ground = vumps(mpo, bond_dim=8, iters=60)
    z = np.diag([1.0, -1.0])
    ks = (0.0, 1.0, np.pi)
    sks = static_structure_factor(ground["al"], z, ks)
    for k, sk in zip(ks, sks):
        om, wt = spectral_weights(ground, mpo, z, k)
        om, wt = np.asarray(om), np.asarray(wt)
        assert not np.any(np.isnan(wt))
        total = float(wt.sum())
        assert np.isclose(total, sk, rtol=1e-6), (k, total, sk)
        # the weight is concentrated in the lowest (single-mode) pole
        assert wt[0] > 0.99 * total, (k, wt[:4], total)

    # the broadened S(k, w) map integrates back to S(k) (Lorentzian
    # tails leak a couple of percent at this eta/grid)
    om_grid = np.linspace(0.0, 25.0, 600)
    smap = dynamic_structure_factor(ground, mpo, z, [1.0], om_grid,
                                    eta=0.05)
    integral = np.trapezoid(smap[0], om_grid)
    assert abs(integral - sks[1]) / sks[1] < 0.05, (integral, sks[1])


def test_blocked_cell_dispersion_tfim_folding():
    """Two-site-cell excitations by MPO blocking: the one-site TFIM
    re-described on a 2-site cell must reproduce the exact Pfeuty
    dispersion FOLDED into the cell Brillouin zone — the lowest band at
    cell momentum kappa equals min(omega(kappa/2), omega(kappa/2 + pi))
    to machine-ish precision.  (Higher blocked bands are genuine
    two-particle continuum states and are not pinned.)"""
    from contractn_tpu.models import tfim_mpo
    from contractn_tpu.models.mpo import block_mpo
    from contractn_tpu.models.excitations import quasiparticle_dispersion

    h = 1.5
    blocked = block_mpo(tfim_mpo(2, h=h), 2)
    assert blocked.cores.shape == (1, 4, 4, 3, 3)
    ks = [0.0, 0.9, 2.2]
    _, om = quasiparticle_dispersion(blocked, ks, bond_dim=12,
                                     n_bands=1, iters=50)

    def pfeuty(k):
        return 2 * np.sqrt(1 + h * h - 2 * h * np.cos(k))

    for i, kk in enumerate(ks):
        want = min(pfeuty(kk / 2), pfeuty(kk / 2 + np.pi))
        assert abs(om[i, 0] - want) < 1e-6, (kk, om[i, 0], want)


def test_blocked_cell_dispersion_dimerized_xx_exact_band():
    """A GENUINE two-site cell: the dimerized XX chain.  Jordan-Wigner
    gives the exact single-fermion band |t1 + t2 e^{i(kappa + pi)}|
    (the JW pi-shift, same convention as models/fermions.py) with
    t_i = J_i / 2; the blocked tangent ansatz reproduces it to 1e-6,
    doubly degenerate (Delta Sz = +-1)."""
    from contractn_tpu.models import xx_dimerized_mpo
    from contractn_tpu.models.mpo import block_mpo
    from contractn_tpu.models.excitations import quasiparticle_dispersion

    j, delta = 1.0, 0.5
    t1, t2 = j * (1 + delta) / 2, j * (1 - delta) / 2
    blocked = block_mpo(xx_dimerized_mpo(2, j, delta), 2)
    ks = [0.0, 1.0, 2.0, np.pi]
    _, om = quasiparticle_dispersion(blocked, ks, bond_dim=16,
                                     n_bands=2, iters=80)
    for i, kk in enumerate(ks):
        want = abs(t1 + t2 * np.exp(1j * (kk + np.pi)))
        assert abs(om[i, 0] - want) < 1e-6, (kk, om[i, 0], want)
        assert abs(om[i, 1] - want) < 1e-6  # Sz = +-1 degeneracy


def test_unfolded_bands_dimerized_xx_extended_zone():
    """ARPES-style unfolding of the dimerized XX chain: the dominant
    pole at every extended-zone momentum sits EXACTLY on the single
    cell-momentum band |t1 + t2 e^{i(2 kappa + pi)}| (kappa and
    kappa + pi label the same eigenstate), while the weight shares at
    kappa vs kappa + pi differ (sublattice interference — the actual
    content of band unfolding)."""
    from contractn_tpu.models import unfolded_bands, xx_dimerized_mpo

    j, delta = 1.0, 0.5
    t1, t2 = j * (1 + delta) / 2, j * (1 - delta) / 2
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    kappas = [0.7, 0.7 + np.pi, 2.0, 2.0 + np.pi]
    _, om, share = unfolded_bands(xx_dimerized_mpo(2, j, delta),
                                  kappas, sp, block=2, bond_dim=16,
                                  iters=80)
    for kk, o, s in zip(kappas, om, share):
        want = abs(t1 + t2 * np.exp(1j * (2 * kk + np.pi)))
        assert abs(o - want) < 1e-6, (kk, o, want)
        assert s > 0.8, (kk, s)  # clean quasiparticle pole
    # extended-zone partners: same energy, DIFFERENT plane-wave weight
    assert abs(om[0] - om[1]) < 1e-9
    assert abs(share[0] - share[1]) > 0.02
    assert abs(om[2] - om[3]) < 1e-9
    assert abs(share[2] - share[3]) > 0.02
