"""Quasiparticle excitations on uniform MPS: dispersion relations.

The tangent-space excitation ansatz (Haegeman et al.; reviewed in
Vanderstraeten-Haegeman-Verstraete, "Tangent-space methods for uniform
matrix product states") builds momentum eigenstates on top of a uMPS
ground state:

    ``|Phi_k(B)> = sum_n e^{ikn}  ... AL AL [B]_n AR AR ...``

with the perturbation tensor in the left-gauge-fixed tangent space,
``B = VL @ X`` where ``VL`` spans the null space of ``AL``
(``sum_s AL_s^H B_s = 0``).  In that gauge the overlap is simply
``tr(X'^H X)``, so the variational problem is a plain Hermitian
eigenproblem ``H_eff(k) X = omega X`` whose eigenvalues are excitation
energies ABOVE the ground state (the MPO is energy-subtracted first).

``H_eff(k)`` has three parts — the bra's perturbed site sits on, to the
right of, or to the left of the ket's ``B``:

* on-site: the VUMPS one-site map ``FL . W . FR`` applied to ``B``;
* ``B`` to the left: a left excitation environment ``LB`` summing
  ``e^{-ik j}`` mixed transfers (bra ``AL``, ket ``AR``) seeded by one
  (bra ``AL``, ket ``B``) insertion — a channel-ordered triangular
  solve exactly like the ground-state ``mpo_environments``, with a
  momentum phase on every step;
* ``B`` to the right: the mirrored ``RB`` with ``e^{+ik j}``.

The geometric corner channels have a marginal mode (the mixed transfer
of two gauges of the same state has leading eigenvalue 1, eigenvector
``C``), but the left gauge fixing makes every corner source EXACTLY
orthogonal to it — ``tr(C^H sum_s AL_s^H B_s) = 0`` and its mirror via
``AL C = C AR`` — so pinning the ``C`` component (which is therefore
zero anyway) makes the GMRES solves well-posed at every momentum
including ``k = 0``.

:func:`spectral_weights` adds the matching matrix elements
``|<Phi_k(B_a)| O_k |GS>|^2`` — the pole weights of the dynamical
structure factor.  Because ``O_k|GS>`` of a uMPS lies EXACTLY in the
one-``B`` sector, the weights saturate the static structure factor
``S_O(k)`` identically (pinned against independent real-space
correlators in the tests).

TPU shape: one jitted program per momentum builds the DENSE ``H_eff``
by ``vmap`` over the ``(d-1) D^2`` tangent basis vectors (each
application is einsum chains plus two batched GMRES solves) and
diagonalizes it — every band at that momentum for one compile, no host
loops.  Cross-checked against the exact transverse-field Ising
dispersion ``omega(k) = 2 sqrt(h^2 - 2 h cos k + 1)``
(Pfeuty / Jordan-Wigner) in ``tests/test_excitations.py``.

No counterpart in the reference (no optimization, no excitations).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .vumps import _h_ac, mpo_environments, vumps


def _null_space_left(al):
    """``VL (d*D, (d-1)*D)``: orthonormal complement of the left
    isometry ``AL`` viewed as a ``(d*D, D)`` matrix."""
    d, bond, _ = al.shape
    m = al.reshape(d * bond, bond)
    q, _ = jnp.linalg.qr(m, mode="complete")
    return q[:, bond:]


def _t_mix_left(x, bra, ket, op):
    """Left-to-right MPO-dressed mixed transfer of ``x (D, D)``."""
    t = peinsum("ij,djk->dik", x, ket)
    t = peinsum("sd,dik->sik", op, t)
    return peinsum("sji,sjk->ik", jnp.conj(bra), t)


def _t_mix_right(x, bra, ket, op):
    """Right-to-left mirror."""
    t = peinsum("dij,jk->dik", ket, x)
    t = peinsum("sd,dik->sik", op, t)
    return peinsum("sik,slk->il", t, jnp.conj(bra))


def _phase_solve(apply_t, b, phase, shape, pvec=None, tol=1e-10):
    """Solve ``x = b + phase * T(x)`` by GMRES on the flattened system.

    ``pvec`` projects out a marginal mode: for the identity corner
    channels the mixed transfer has eigenvalue 1 with BOTH left and
    right (Frobenius) marginal vectors equal to ``C``, and the gauge
    fixing keeps every source orthogonal to it — pinning the ``C``
    component to zero leaves the solution unchanged at ``k != 0`` and
    makes the ``k = 0`` marginal system well-conditioned.
    """
    if pvec is not None:
        nc = pvec / jnp.linalg.norm(pvec)
        b = b - nc * jnp.sum(jnp.conj(nc) * b)

    def matvec(xv):
        x = xv.reshape(shape)
        out = x - phase * apply_t(x)
        if pvec is not None:
            out = out + nc * jnp.sum(jnp.conj(nc) * x)
        return out.reshape(-1)

    sol, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b.reshape(-1), x0=jnp.zeros(b.size, b.dtype),
        tol=tol, atol=0.0, maxiter=200, solve_method="batched",
    )
    return sol.reshape(shape)


def _excitation_envs(al, ar, c, fl, fr, w, b, k, is_zero, eye_diag,
                     tol=1e-10):
    """``(LB, RB)`` stacked ``(W, D, D)`` excitation environments.
    ``is_zero`` is the static MPO sparsity mask (nested bool tuples);
    ``eye_diag[ch]`` flags identity diagonal (corner) channels whose
    marginal solves are projected against ``C``."""
    d, _, nw, _ = w.shape
    bond = al.shape[1]
    ph_l = jnp.exp(-1j * k)
    ph_r = jnp.exp(+1j * k)
    zero = jnp.zeros((bond, bond), b.dtype)

    # ---- LB: bra AL, ket B once then ket AR; channels upward -------- #
    # The bottom corner (ch = 0) source is exactly zero by the left
    # gauge fixing; the top corner's marginal solve is consistent (its
    # source is orthogonal to the marginal mode C).
    lb = [None] * nw
    for ch in range(nw):
        src = zero
        for a_idx in range(ch + 1):
            if is_zero[a_idx][ch]:
                continue
            op = w[:, :, a_idx, ch]
            src = src + _t_mix_left(fl[a_idx], al, b, op)
            if a_idx < ch:
                src = src + _t_mix_left(lb[a_idx], al, ar, op)
        src = ph_l * src
        if is_zero[ch][ch]:
            lb[ch] = src
        else:
            op = w[:, :, ch, ch]
            lb[ch] = _phase_solve(
                lambda x, op=op: _t_mix_left(x, al, ar, op),
                src, ph_l, (bond, bond),
                pvec=c if eye_diag[ch] else None, tol=tol,
            )

    # ---- RB: bra AR, ket B once then ket AL; channels downward ------ #
    # Here NEITHER corner source vanishes identically (the gauge fixing
    # is one-sided) but both marginal solves stay consistent:
    # tr(C^H src) = 0 through AL C = C AR.
    rb = [None] * nw
    for ch in range(nw - 1, -1, -1):
        src = zero
        for b_idx in range(ch, nw):
            if is_zero[ch][b_idx]:
                continue
            op = w[:, :, ch, b_idx]
            src = src + _t_mix_right(fr[b_idx], ar, b, op)
            if b_idx > ch:
                src = src + _t_mix_right(rb[b_idx], ar, al, op)
        src = ph_r * src
        if is_zero[ch][ch]:
            rb[ch] = src
        else:
            op = w[:, :, ch, ch]
            rb[ch] = _phase_solve(
                lambda x, op=op: _t_mix_right(x, ar, al, op),
                src, ph_r, (bond, bond),
                pvec=c if eye_diag[ch] else None, tol=tol,
            )

    return jnp.stack(lb), jnp.stack(rb)


def _heff_x(x, vl, al, ar, c, fl, fr, w, k, is_zero, eye_diag,
            tol=1e-10):
    """Apply the momentum-``k`` effective Hamiltonian to ``X``."""
    d, bond, _ = al.shape
    b = jnp.matmul(vl, x,
                   precision=jax.lax.Precision.HIGHEST
                   ).reshape(d, bond, bond)
    lb, rb = _excitation_envs(al, ar, c, fl, fr, w, b, k, is_zero,
                              eye_diag, tol=tol)
    out = _h_ac(fl, w, fr, b)            # bra site == ket B site
    out = out + _h_ac(lb, w, fr, ar)     # B strictly left of bra site
    out = out + _h_ac(fl, w, rb, al)     # B strictly right of bra site
    return jnp.matmul(jnp.conj(vl).T, out.reshape(d * bond, bond),
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("is_zero", "eye_diag", "tol"))
def _dense_heff(vl, al, ar, c, fl, fr, w, k, is_zero, eye_diag,
                tol=1e-10):
    n_t, bond = vl.shape[1], al.shape[1]
    n = n_t * bond
    basis = jnp.eye(n, dtype=vl.dtype).reshape(n, n_t, bond)
    cols = jax.vmap(
        lambda xb: _heff_x(xb, vl, al, ar, c, fl, fr, w, k, is_zero,
                           eye_diag, tol=tol)
    )(basis)
    h = cols.reshape(n, n).T
    return 0.5 * (h + jnp.conj(h).T)


def prepare_excitations(ground, mpo_cell, tol=1e-10):
    """Momentum-INDEPENDENT preparation for the excitation machinery:
    energy-subtracted MPO, ground environments, tangent basis, sparsity
    masks, and the regularization constant ``lam0`` — computed once and
    reused across every momentum (the GMRES environment solves are the
    expensive part)."""
    al, ar, c = ground["al"], ground["ar"], ground["c"]
    e0 = ground["energy"]
    w = jnp.asarray(mpo_cell.cores[0])
    d = w.shape[0]
    # subtract the ground energy density from the on-site channel so the
    # environments are finite and eigenvalues are excitation energies
    w = w.at[:, :, 0, -1].add(-e0 * jnp.eye(d, dtype=w.dtype))

    cdt = jnp.result_type(al.dtype, jnp.complex64)
    al, ar, c, w = (t.astype(cdt) for t in (al, ar, c, w))
    fl, fr, _ = mpo_environments(al, ar, c, w, tol=tol)
    vl = _null_space_left(al)
    w_np = np.asarray(w)
    nw = w_np.shape[2]
    is_zero = tuple(
        tuple(bool(v) for v in row)
        for row in (np.abs(w_np).sum(axis=(0, 1)) == 0.0)
    )
    eye_diag = tuple(
        bool(np.allclose(w_np[:, :, ch, ch], np.eye(w_np.shape[0])))
        for ch in range(nw)
    )
    # the corner regularization leaves the environments defined only up
    # to constants; the ground state's on-site Rayleigh quotient IS
    # that constant, and excitation energies are measured relative to it
    ac = ground["ac"].astype(cdt)
    lam0 = jnp.real(
        jnp.sum(jnp.conj(ac) * _h_ac(fl, w, fr, ac))
        / jnp.sum(jnp.conj(ac) * ac)
    )
    return {
        "al": al, "ar": ar, "c": c, "ac": ac, "w": w, "fl": fl,
        "fr": fr, "vl": vl, "is_zero": is_zero, "eye_diag": eye_diag,
        "lam0": lam0, "cdt": cdt,
    }


def excitation_spectrum(ground, mpo_cell, k, tol=1e-10, prep=None):
    """All quasiparticle bands at momentum ``k`` above a VUMPS ground
    state.

    Args:
        ground: the dict returned by :func:`~contractn_tpu.models.
            vumps.vumps` (keys ``al, ar, c, energy``).
        mpo_cell: the SAME MPO handed to VUMPS (uniform triangular
            bulk; its ``cores[0]`` is used).
        k: momentum in ``[-pi, pi]``.
        prep: optional :func:`prepare_excitations` result — pass it
            when evaluating many momenta to skip the k-independent
            environment solves.

    Returns:
        ascending ``((d-1) D^2,)`` array of excitation energies
        relative to the ground state.
    """
    p = prep if prep is not None else prepare_excitations(
        ground, mpo_cell, tol=tol)
    h = _dense_heff(p["vl"], p["al"], p["ar"], p["c"], p["fl"],
                    p["fr"], p["w"], jnp.asarray(float(k), p["cdt"]),
                    p["is_zero"], p["eye_diag"], tol=tol)
    return jnp.linalg.eigvalsh(h) - p["lam0"]


def quasiparticle_dispersion(mpo_cell, ks, bond_dim=12, ground=None,
                             n_bands=1, tol=1e-10, **vumps_kwargs):
    """Lowest ``n_bands`` excitation energies at each momentum.

    Runs VUMPS once (unless a converged ``ground`` is supplied), then
    one jitted dense-``H_eff`` diagonalization per momentum.

    Returns:
        ``(ground, omegas)`` with ``omegas`` a ``(len(ks), n_bands)``
        float array.
    """
    if ground is None:
        ground = vumps(mpo_cell, bond_dim, **vumps_kwargs)
    prep = prepare_excitations(ground, mpo_cell, tol=tol)
    omegas = np.stack([
        np.asarray(excitation_spectrum(ground, mpo_cell, k, tol=tol,
                                       prep=prep))[:n_bands]
        for k in ks
    ])
    return ground, omegas


# --------------------------------------------------------------------- #
# Spectral weights (dynamical structure factor poles)
# --------------------------------------------------------------------- #


def _e_left_mix(al, ar):
    """The (bra ``AL``, ket ``AR``) right-to-left mixed transfer and its
    Frobenius adjoint: ``z'[i, j] = sum_s conj(AL_s)[i, b] z[b, k]
    AR_s[j, k]``."""

    def e_left(z):
        t = peinsum("sjk,bk->sbj", ar, z)
        return peinsum("sib,sbj->ij", jnp.conj(al), t)

    def e_left_adj(y):
        return peinsum("sib,ij,sjk->bk", al, y, jnp.conj(ar))

    return e_left, e_left_adj


def _deflation_pair(al, ar, dtype, iters=80):
    """Dominant (right, left) eigenvectors of the marginal mixed
    transfer, by power iteration — basis-independent, computed ONCE per
    momentum and shared across every ``_overlap_g`` call."""
    bond = al.shape[1]
    e_left, e_left_adj = _e_left_mix(al, ar)

    def power(f):
        v0 = jnp.ones((bond, bond), dtype)
        v0 = v0 + 0.3 * jnp.arange(bond, dtype=dtype)[None, :]

        def body(_, v):
            w = f(v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-300)

        return jax.lax.fori_loop(0, iters, body, v0)

    rv, lv = power(e_left), power(e_left_adj)
    return rv, lv, jnp.sum(jnp.conj(lv) * rv)


def _overlap_g(b, al, ar, ac, op, k, defl, tol=1e-10):
    """``G(B) = <Phi_k(B)| O_k |GS>`` per site (linear in ``conj(B)``).

    Position classes of the operator relative to the bra's ``B``:
    on-site (``O AC`` against ``B``) and strictly left (mixed
    ``AL``-bra / ``AR``-ket transfers, ``e^{-ik}`` per step, a
    marginal-mode GMRES solve); the strictly-right branch would start
    from ``sum_s B_s^H AL_s`` — EXACTLY the left gauge-fixing
    constraint, identically zero — and is omitted.  ``defl`` is the
    precomputed :func:`_deflation_pair` (the mixed transfer is marginal,
    ``|lam| = 1``; deflating its dominant pair keeps the solve
    well-posed at ``k = 0``, where the physical source has no component
    along it — connected correlators decay).
    """
    bond = al.shape[1]
    oac = peinsum("st,tij->sij", op, ac)
    # on-site
    g = peinsum("sij,sij->", jnp.conj(b), oac)

    # O strictly left of B: accumulate right-to-left
    z1 = peinsum("sbc,skc->bk", jnp.conj(b), ar)
    phl = jnp.exp(-1j * k)
    e_left, _ = _e_left_mix(al, ar)
    rv, lv, denom = defl

    def deflate(x):
        return x - rv * (jnp.sum(jnp.conj(lv) * x) / denom)

    geol = _phase_solve(lambda z: e_left(deflate(z)), deflate(z1),
                        phl, (bond, bond), tol=tol)
    g = g + phl * peinsum("sab,sak,bk->", jnp.conj(al), oac,
                          deflate(geol))
    return g


def spectral_weights(ground, mpo_cell, op, k, tol=1e-10, prep=None):
    """Excitation energies and spectral weights of a one-site operator.

    The dynamical structure factor within the single-mode (tangent
    space) approximation is a sum of poles,

        ``S_O(k, w) = sum_a |<Phi_k(B_a)| O_k |GS>|^2 delta(w - w_a)``,

    exact for whatever part of ``O_k |GS>`` lives in the one-B sector
    (their total obeys the sum rule ``sum_a weight_a <= S_O(k)``, the
    static structure factor, saturating when the operator creates a
    single quasiparticle).

    Args (beyond the obvious):
        prep: optional dict from :func:`prepare_excitations` — the
            k-independent ground environments (GMRES solves) are the
            dominant prep cost, so callers looping over momenta (e.g.
            :func:`dynamic_structure_factor`) compute it ONCE and pass
            it through.  The k-independent deflation pair is likewise
            cached into the dict on first use.

    Returns:
        ``(omegas, weights)`` — ascending energies and the matching
        per-site pole weights.
    """
    p = prep if prep is not None else prepare_excitations(
        ground, mpo_cell, tol=tol)
    al, ar, c, ac, w = p["al"], p["ar"], p["c"], p["ac"], p["w"]
    vl, fl, fr, cdt = p["vl"], p["fl"], p["fr"], p["cdt"]
    d = w.shape[0]
    op = jnp.asarray(op, cdt)
    # subtract the disconnected part so G measures the CONNECTED weight
    op = op - (peinsum("st,tij,sij->", op, ac, jnp.conj(ac))
               / peinsum("sij,sij->", ac, jnp.conj(ac))
               ) * jnp.eye(d, dtype=cdt)
    k_arr = jnp.asarray(float(k), cdt)
    h = _dense_heff(vl, al, ar, c, fl, fr, w, k_arr, p["is_zero"],
                    p["eye_diag"], tol=tol)
    omegas, vecs = jnp.linalg.eigh(h)

    n_t, bond = vl.shape[1], al.shape[1]
    n = n_t * bond
    basis = jnp.eye(n, dtype=cdt).reshape(n, n_t, bond)

    defl = p.get("defl")
    if defl is None:
        defl = _deflation_pair(al, ar, cdt)
        p["defl"] = defl  # k-independent: cache for the next momentum

    @jax.jit
    def g_of(xb):
        b = jnp.matmul(vl, xb,
                       precision=jax.lax.Precision.HIGHEST
                       ).reshape(al.shape)
        return _overlap_g(b, al, ar, ac, op, k_arr, defl, tol=tol)

    src = jax.vmap(g_of)(basis)  # src_i = <e_i, S>
    amps = jnp.matmul(jnp.conj(vecs).T, src,
                      precision=jax.lax.Precision.HIGHEST)
    return omegas - p["lam0"], jnp.abs(amps) ** 2


def unfolded_bands(mpo, kappas, op, block=2, bond_dim=16, ground=None,
                   tol=1e-10, **vumps_kwargs):
    """Extended-zone (per-site momentum) spectral map of a
    ``block``-periodic chain: ARPES-style band unfolding.

    On a lattice with a ``block``-site cell, crystal momentum is only
    defined modulo ``2 pi / block`` — extended-zone momenta ``kappa``
    and ``kappa + 2 pi / block`` label the SAME eigenstate, so the band
    energy is single-valued in the cell momentum ``K = block * kappa``
    (for the dimerized XX chain, ``|t1 + t2 e^{i(K + pi)}|`` — pinned
    in the tests).  What distinguishes the extended-zone points is the
    spectral WEIGHT of the per-site-momentum operator

        ``O(kappa) = sum_p e^{i kappa p} O_p``  (p = cell position),

    a plain one-site operator of the folded chain: its pole weights
    measure the eigenstate's plane-wave content at ``kappa`` — exactly
    the quantity ARPES band-unfolding reports, and generally DIFFERENT
    at ``kappa`` and ``kappa + 2 pi / block`` (sublattice
    interference).  Per ``kappa`` this returns the dominant pole's
    energy and its weight share.

    Args:
        mpo: the per-site MPO with ``n_sites == block`` carrying the
            cell pattern (e.g. ``xx_dimerized_mpo(2, j, delta)``).
        kappas: per-site momenta (full BZ).
        op: ``(d, d)`` one-site excitation operator (e.g. ``S+`` —
            its quantum numbers also select the band's sector).
        block / bond_dim / vumps_kwargs: cell size and VUMPS controls.
        ground: optional converged folded VUMPS ground state.

    Returns:
        ``(ground, omegas, weights)`` — per ``kappa`` the max-weight
        pole energy and its weight share (dominant-pole weight over the
        total; near 1 when the operator creates a clean quasiparticle,
        small at symmetry-protected zero-weight points such as
        ``kappa = 0`` for a total-raising operator).
    """
    from .mpo import block_mpo

    blocked = block_mpo(mpo, block)
    if ground is None:
        ground = vumps(blocked, bond_dim, **vumps_kwargs)
    prep = prepare_excitations(ground, blocked, tol=tol)
    op = np.asarray(op)
    d = op.shape[0]
    eye = np.eye(d)
    omegas_out, shares = [], []
    for kappa in kappas:
        kk = float(kappa)
        opf = np.zeros((d ** block, d ** block), complex)
        for p in range(block):
            mats = [op if q == p else eye for q in range(block)]
            m = np.eye(1)
            for q in range(block):
                m = np.kron(m, mats[q])
            opf = opf + np.exp(1j * kk * p) * m
        om, wt = spectral_weights(ground, blocked, opf,
                                  float(block) * kk, tol=tol,
                                  prep=prep)
        om, wt = np.asarray(om), np.asarray(wt)
        idx = int(np.argmax(wt))
        omegas_out.append(float(om[idx]))
        total = float(np.sum(wt))
        shares.append(float(wt[idx]) / total if total > 0 else 0.0)
    return ground, np.asarray(omegas_out), np.asarray(shares)


def dynamic_structure_factor(ground, mpo_cell, op, ks, omegas,
                             eta=0.05, tol=1e-10):
    """Lorentzian-broadened ``S(k, w)`` map from the tangent-space
    poles: ``S(k, w) = sum_a weight_a(k) * (eta/pi) / ((w - w_a)^2 +
    eta^2)``.

    One :func:`spectral_weights` diagonalization per momentum; the
    returned array is ``(len(ks), len(omegas))``, ready for plotting a
    spectral-function intensity map.  Exact pole positions/weights are
    available from :func:`spectral_weights` directly.
    """
    ks = np.atleast_1d(np.asarray(ks, float))
    omegas = np.atleast_1d(np.asarray(omegas, float))
    out = np.zeros((ks.size, omegas.size))
    prep = prepare_excitations(ground, mpo_cell, tol=tol)
    for i, k in enumerate(ks):
        om, wt = spectral_weights(ground, mpo_cell, op, float(k),
                                  tol=tol, prep=prep)
        om, wt = np.asarray(om), np.asarray(wt)
        lor = (eta / np.pi) / (
            (omegas[None, :] - om[:, None]) ** 2 + eta * eta)
        out[i] = np.matmul(wt, lor)
    return out
