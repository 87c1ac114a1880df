"""Native multi-site-cell quasiparticle excitations.

Round 3/4 measured multi-band dispersions only through ``mpo.block_mpo``
folding (``excitations.quasiparticle_dispersion`` on the d^n site) plus
ARPES-style weight unfolding.  Folding squares the one-site cost in d
and hides the per-site tangent structure; this module runs the genuine
multi-site tangent ansatz (Vanderstraeten-Haegeman-Verstraete review,
sec. on non-trivial unit cells) directly on a
:func:`~contractn_tpu.models.vumps_cell.vumps_cell` ground state:

    ``|Phi_K({B})> = sum_m e^{iKm} sum_i  ... AL [B_i]_{cell m} AR ...``

one perturbation tensor per cell site, each left-gauge-fixed into its
own site's tangent space (``B_i = VL_i X_i``, ``sum_s AL_i,s^H B_i,s =
0``).  The gauge fixing makes the overlap block-diagonal across sites
— a bra ``B'_i`` strictly left of a ket ``B_j`` hits ``sum_s B'^H AL``
= 0 — so the variational problem is one Hermitian eigenproblem over
the CONCATENATED ``X = (X_0 .. X_{n-1})`` of size ``sum_i (d_i-1) D^2``
and ``K`` is the CELL momentum (phase per cell, ``[-pi, pi]``).

``H_eff(K)`` keeps the single-site structure per bra site ``i``: the
on-site map ``(FL_i, W_i, FR_{i+1})`` on ``B_i``, plus excitation
environments summing every ket-``B_j`` placement strictly left/right.
Both are computed exactly like the ground-state cell environments
(:func:`~contractn_tpu.models.vumps_cell.mpo_environments_cell`):
channel-ascending one-cell source accumulation — per-site ``B``
insertions against the ground ``FL/FR`` feed in at every site — then a
momentum-phased geometric GMRES against the CELL mixed transfer on
bond 0 (``e^{-iK}``/``e^{+iK}`` per cell wrap, marginal corner
channels projected against ``C_0``), then intra-cell propagation (no
phase — only cell-boundary crossings carry it).  The bond-``n``
closure reuses bond 0 times the cell phase.

The environment regularization constant is PER SITE here: each
diagonal block ``i`` is offset by its own ground Rayleigh quotient
``lam_i = <AC_i|(FL_i, W_i, FR_{i+1})|AC_i>`` (the single-site solver's
``lam0``, which no longer collapses to one number on inequivalent
sites), subtracted block-wise before diagonalization.  Cross blocks
carry no constant — pinned by the exactness tests.

Validated in ``tests/test_excitations_cell.py``: an n=1 cell
reproduces ``excitations.excitation_spectrum`` and Pfeuty exactly; a
uniform TFIM 2-cell resolves BOTH folded branches
``{omega(K/2), omega(K/2 + pi)}`` at 1e-6; the dimerized XX chain —
a genuinely inequivalent cell — matches the exact JW band
``|t1 + t2 e^{i(K + pi)}|`` natively at d=2 with the Sz = +-1
degeneracy, where round 3 needed the folded d=4 block.

No counterpart in the reference (no optimization, no excitations;
SURVEY.md §2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .excitations import (
    _null_space_left,
    _phase_solve,
    _t_mix_left,
    _t_mix_right,
)
from .vumps import _h_ac


def _lb_cell(als, ars, c0, fls, ws, bs, k, is_zeros, diag_prod_zero,
             eye_diag_cell, tol=1e-10):
    """Per-bond left excitation environments ``LB_i (W, D, D)``: every
    ket-``B`` placement strictly left of bond ``i``, bra on ``AL``,
    ket on ``AR`` after its ``B``; ``e^{-iK}`` per cell wrap."""
    n = len(als)
    nw = ws[0].shape[2]
    bond = als[0].shape[1]
    ph = jnp.exp(-1j * k)
    zero = jnp.zeros((bond, bond), bs[0].dtype)
    lb = [[None] * nw for _ in range(n)]

    def site_step(x, i, ch, lb_i):
        """One site of the affine cell map for channel ``ch``: diag
        transfer of ``x`` + lower-channel feeds + ``B_i`` insertion."""
        nxt = zero
        if not is_zeros[i][ch][ch]:
            nxt = _t_mix_left(x, als[i], ars[i], ws[i][:, :, ch, ch])
        for a in range(ch):
            if not is_zeros[i][a][ch]:
                nxt = nxt + _t_mix_left(lb_i[a], als[i], ars[i],
                                        ws[i][:, :, a, ch])
        for a in range(ch + 1):
            if not is_zeros[i][a][ch]:
                nxt = nxt + _t_mix_left(fls[i][a], als[i], bs[i],
                                        ws[i][:, :, a, ch])
        return nxt

    for ch in range(nw):
        s = zero
        for i in range(n):
            s = site_step(s, i, ch, lb[i])
        if diag_prod_zero[ch]:
            lb[0][ch] = ph * s
        else:
            def dcell(x, ch=ch):
                for i in range(n):
                    x = _t_mix_left(x, als[i], ars[i],
                                    ws[i][:, :, ch, ch])
                return x

            lb[0][ch] = _phase_solve(
                dcell, ph * s, ph, (bond, bond),
                pvec=c0 if eye_diag_cell[ch] else None, tol=tol)
        cur = lb[0][ch]
        for i in range(n - 1):
            cur = site_step(cur, i, ch, lb[i])
            lb[i + 1][ch] = cur
    return [jnp.stack(lb[i]) for i in range(n)]


def _rb_cell(als, ars, c0, frs, ws, bs, k, is_zeros, diag_prod_zero,
             eye_diag_cell, tol=1e-10):
    """Per-bond right excitation environments ``RB_i``: ket-``B``
    strictly right of bond ``i``, bra ``AR``, ket ``AL`` before its
    ``B``; phases measured relative to the cell whose left edge is the
    bond — callers add ``e^{+iK}`` when wrapping bond ``n`` to 0."""
    n = len(als)
    nw = ws[0].shape[2]
    bond = als[0].shape[1]
    ph = jnp.exp(+1j * k)
    zero = jnp.zeros((bond, bond), bs[0].dtype)
    rb = [[None] * nw for _ in range(n)]

    def site_step(x, i, ch):
        nxt = zero
        if not is_zeros[i][ch][ch]:
            nxt = _t_mix_right(x, ars[i], als[i], ws[i][:, :, ch, ch])
        for b in range(ch + 1, nw):
            if not is_zeros[i][ch][b]:
                rbn = (rb[i + 1][b] if i < n - 1
                       else ph * rb[0][b])
                nxt = nxt + _t_mix_right(rbn, ars[i], als[i],
                                         ws[i][:, :, ch, b])
        for b in range(ch, nw):
            if not is_zeros[i][ch][b]:
                nxt = nxt + _t_mix_right(frs[(i + 1) % n][b], ars[i],
                                         bs[i], ws[i][:, :, ch, b])
        return nxt

    for ch in range(nw - 1, -1, -1):
        s = zero
        for i in range(n - 1, -1, -1):
            s = site_step(s, i, ch)
        if diag_prod_zero[ch]:
            rb[0][ch] = s
        else:
            def dcell(x, ch=ch):
                for i in range(n - 1, -1, -1):
                    x = _t_mix_right(x, ars[i], als[i],
                                     ws[i][:, :, ch, ch])
                return x

            rb[0][ch] = _phase_solve(
                dcell, s, ph, (bond, bond),
                pvec=c0 if eye_diag_cell[ch] else None, tol=tol)
        for i in range(n - 1, 0, -1):
            rb[i][ch] = site_step(
                ph * rb[0][ch] if i == n - 1 else rb[i + 1][ch],
                i, ch)
    return [jnp.stack(rb[i]) for i in range(n)]


def _heff_x_cell(xs, vls, als, ars, c0, fls, frs, ws, k, is_zeros,
                 diag_prod_zero, eye_diag_cell, tol=1e-10):
    """Apply the momentum-``K`` cell effective Hamiltonian to the
    per-site tuple ``X = (X_0 .. X_{n-1})``."""
    n = len(als)
    bond = als[0].shape[1]
    bs = [jnp.matmul(vls[i], xs[i],
                     precision=jax.lax.Precision.HIGHEST
                     ).reshape(als[i].shape) for i in range(n)]
    lbs = _lb_cell(als, ars, c0, fls, ws, bs, k, is_zeros,
                   diag_prod_zero, eye_diag_cell, tol=tol)
    rbs = _rb_cell(als, ars, c0, frs, ws, bs, k, is_zeros,
                   diag_prod_zero, eye_diag_cell, tol=tol)
    ph_r = jnp.exp(+1j * k)
    outs = []
    for i in range(n):
        out = _h_ac(fls[i], ws[i], frs[(i + 1) % n], bs[i])
        out = out + _h_ac(lbs[i], ws[i], frs[(i + 1) % n], ars[i])
        rbu = rbs[(i + 1) % n] if i < n - 1 else ph_r * rbs[0]
        out = out + _h_ac(fls[i], ws[i], rbu, als[i])
        d_i = als[i].shape[0]
        outs.append(jnp.matmul(
            jnp.conj(vls[i]).T, out.reshape(d_i * bond, bond),
            precision=jax.lax.Precision.HIGHEST))
    return outs


@partial(jax.jit, static_argnames=("is_zeros", "diag_prod_zero",
                                   "eye_diag_cell", "tol"))
def _dense_heff_cell(vls, als, ars, c0, fls, frs, ws, lams, k,
                     is_zeros, diag_prod_zero, eye_diag_cell,
                     tol=1e-10):
    """Dense ``H_eff(K)`` over the concatenated tangent basis, each
    diagonal block shifted by its own regularization constant."""
    n = len(als)
    bond = als[0].shape[1]
    dims = [vls[i].shape[1] * bond for i in range(n)]
    m = sum(dims)
    offs = np.concatenate([[0], np.cumsum(dims)])

    def apply_flat(xv):
        xs = [xv[offs[i]:offs[i + 1]].reshape(vls[i].shape[1], bond)
              for i in range(n)]
        outs = _heff_x_cell(xs, vls, als, ars, c0, fls, frs, ws, k,
                            is_zeros, diag_prod_zero, eye_diag_cell,
                            tol=tol)
        return jnp.concatenate([o.reshape(-1) for o in outs])

    basis = jnp.eye(m, dtype=vls[0].dtype)
    h = jax.vmap(apply_flat)(basis).T
    shift = jnp.concatenate([
        jnp.full((dims[i],), lams[i], h.dtype) for i in range(n)])
    h = h - jnp.diag(shift)
    return 0.5 * (h + jnp.conj(h).T)


def prepare_excitations_cell(ground, mpo_cores, tol=1e-10):
    """Momentum-independent preparation: energy-subtracted complex MPO
    cores, ground cell environments, per-site tangent bases and
    regularization constants, static sparsity flags."""
    from .vumps_cell import mpo_environments_cell

    als, ars, cs = ground["als"], ground["ars"], ground["cs"]
    acs = ground["acs"]
    n = len(als)
    e_site = ground["energy"]
    cdt = jnp.result_type(als[0].dtype, jnp.complex64)
    ws = []
    for i in range(n):
        w = jnp.asarray(mpo_cores[i])
        d = w.shape[0]
        w = w.at[:, :, 0, -1].add(-e_site * jnp.eye(d, dtype=w.dtype))
        ws.append(w.astype(cdt))
    als = tuple(a.astype(cdt) for a in als)
    ars = tuple(a.astype(cdt) for a in ars)
    cs = tuple(c.astype(cdt) for c in cs)
    acs = tuple(a.astype(cdt) for a in acs)
    fls, frs, _ = mpo_environments_cell(als, ars, cs, ws, tol=tol)
    vls = tuple(_null_space_left(als[i]) for i in range(n))
    nw = ws[0].shape[2]
    is_zeros = tuple(
        tuple(tuple(bool(v) for v in row)
              for row in (np.abs(np.asarray(w)).sum(axis=(0, 1))
                          == 0.0))
        for w in ws)
    diag_prod_zero = tuple(
        any(is_zeros[i][ch][ch] for i in range(n))
        for ch in range(nw))
    eye_diag_cell = tuple(
        all(np.allclose(np.asarray(ws[i][:, :, ch, ch]),
                        np.eye(ws[i].shape[0]))
            for i in range(n))
        for ch in range(nw))
    lams = tuple(
        jnp.real(
            jnp.sum(jnp.conj(acs[i])
                    * _h_ac(fls[i], ws[i], frs[(i + 1) % n], acs[i]))
            / jnp.sum(jnp.conj(acs[i]) * acs[i]))
        for i in range(n))
    return {
        "als": als, "ars": ars, "cs": cs, "acs": acs,
        "ws": tuple(ws), "fls": fls, "frs": frs, "vls": vls,
        "is_zeros": is_zeros, "diag_prod_zero": diag_prod_zero,
        "eye_diag_cell": eye_diag_cell, "lams": lams, "cdt": cdt,
    }


def excitation_spectrum_cell(ground, mpo_cores, k, tol=1e-10,
                             prep=None):
    """All quasiparticle bands at CELL momentum ``k`` above a
    :func:`~contractn_tpu.models.vumps_cell.vumps_cell` ground state.

    Args:
        ground: the ``vumps_cell`` result dict.
        mpo_cores: the same per-site triangular bulk cores.
        k: cell momentum in ``[-pi, pi]`` (phase per CELL — a
            per-site momentum ``kappa`` maps to ``k = n * kappa``).
        prep: optional :func:`prepare_excitations_cell` result, reused
            across momenta.

    Returns:
        ascending ``(sum_i (d_i - 1) D^2,)`` array of excitation
        energies relative to the ground state.
    """
    p = prep if prep is not None else prepare_excitations_cell(
        ground, mpo_cores, tol=tol)
    h = _dense_heff_cell(
        p["vls"], p["als"], p["ars"], p["cs"][0], p["fls"], p["frs"],
        p["ws"], p["lams"], jnp.asarray(float(k), p["cdt"]),
        p["is_zeros"], p["diag_prod_zero"], p["eye_diag_cell"],
        tol=tol)
    return jnp.linalg.eigvalsh(h)


def _deflation_pair_cell(als, ars, dtype, iters=80):
    """Dominant (right, left) eigenvectors of the marginal CELL mixed
    transfer (bra ``AL``-cell, ket ``AR``-cell, stepping one cell
    left), by power iteration — computed once per momentum."""
    n = len(als)
    bond = als[0].shape[1]

    def e_left_cell(z):
        for j in range(n - 1, -1, -1):
            t = peinsum("sjk,bk->sbj", ars[j], z)
            z = peinsum("sib,sbj->ij", jnp.conj(als[j]), t)
        return z

    def e_left_cell_adj(y):
        for j in range(n):
            y = peinsum("sib,ij,sjk->bk", als[j], y,
                        jnp.conj(ars[j]))
        return y

    def power(f):
        v0 = jnp.ones((bond, bond), dtype)
        v0 = v0 + 0.3 * jnp.arange(bond, dtype=dtype)[None, :]

        def body(_, v):
            w = f(v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-300)

        return jax.lax.fori_loop(0, iters, body, v0)

    rv, lv = power(e_left_cell), power(e_left_cell_adj)
    return rv, lv, jnp.sum(jnp.conj(lv) * rv)


def _overlap_g_cell(bs, als, ars, acs, ops, kappa, defl, tol=1e-10,
                    parities=None, cell_sign=1.0):
    """``G({B}) = <Phi_K({B})| O(kappa) |GS> / sqrt(n)`` — the cell
    overlap with the per-site-momentum operator ``O(kappa) = sum_j
    e^{i kappa j} O_j`` (``ops[j]`` already connected-subtracted).

    Position classes per bra site ``i``: on-site (phase
    ``e^{i kappa i}``), strictly left within the cell (direct walks),
    and previous cells (geometric solve against the deflated marginal
    cell mixed transfer, ``e^{-i kappa n}`` per wrap).  The
    strictly-right branch vanishes by the left gauge fixing, per site.
    The ``1/sqrt(n)`` puts the weights on the same per-site footing as
    the single-site :func:`~contractn_tpu.models.excitations.
    spectral_weights` (pinned by the uniform-cell reduction and the
    ``S(kappa)`` sum rule)."""
    n = len(als)
    bond = als[0].shape[1]
    oacs = [peinsum("st,tij->sij", ops[j], acs[j]) for j in range(n)]
    if parities is not None:
        # semi-infinite JW string left of the insertion, telescoped
        # to the single bond diagonal P_j (string_parities_cell)
        oacs = [oacs[j] * parities[j][None, :, None].astype(
            oacs[j].dtype) for j in range(n)]
    ph_cell = jnp.exp(-1j * kappa * n) * cell_sign
    rv, lv, denom = defl

    def deflate(x):
        return x - rv * (jnp.sum(jnp.conj(lv) * x) / denom)

    def step_left(z, j):
        t = peinsum("sjk,bk->sbj", ars[j], z)
        return peinsum("sib,sbj->ij", jnp.conj(als[j]), t)

    def close(z, j):
        return peinsum("sab,sak,bk->", jnp.conj(als[j]), oacs[j], z)

    def t_cell(z):
        for j in range(n - 1, -1, -1):
            z = step_left(z, j)
        return z

    def walk_close_cell(z):
        """One cell to the LEFT: closes at each site j with absolute
        phase e^{i kappa (j - n)}."""
        g = jnp.zeros((), z.dtype)
        for j in range(n - 1, -1, -1):
            g = g + jnp.exp(1j * kappa * (j - n)) * close(z, j)
            if j > 0:
                z = step_left(z, j)
        return g

    g = jnp.zeros((), bs[0].dtype)
    for i in range(n):
        g = g + jnp.exp(1j * kappa * i) * peinsum(
            "sij,sij->", jnp.conj(bs[i]), oacs[i])
        z = peinsum("sbc,skc->bk", jnp.conj(bs[i]), ars[i])
        for j in range(i - 1, -1, -1):
            g = g + jnp.exp(1j * kappa * j) * close(z, j)
            if j > 0:
                z = step_left(z, j)
        if i > 0:
            z = step_left(z, 0)
        zsolve = _phase_solve(lambda x: t_cell(deflate(x)),
                              deflate(z), ph_cell, (bond, bond),
                              tol=tol)
        # cell -c carries cell_sign^c while the geometric expansion
        # in ph_cell supplies only cell_sign^(c-1): one explicit
        # factor on the whole previous-cells contribution
        g = g + cell_sign * walk_close_cell(deflate(zsolve))
    return g / np.sqrt(n)


def spectral_weights_cell(ground, mpo_cores, op, kappa, tol=1e-10,
                          prep=None, string_parities=None,
                          cell_sign=1.0):
    """Excitation energies and spectral weights of a one-site operator
    at PER-SITE momentum ``kappa`` on a cell ground state.

    The cell generalization of :func:`~contractn_tpu.models.
    excitations.spectral_weights`: the effective Hamiltonian is
    diagonalized at cell momentum ``K = n kappa`` and each
    eigenstate's pole weight is ``|<Phi_K(B_a)| O(kappa) |GS>|^2``
    per site.  On a period-n lattice ``kappa`` and
    ``kappa + 2 pi / n`` share the same cell sector — evaluating both
    resolves the extended zone natively (ARPES band unfolding without
    the ``mpo.block_mpo`` fold that
    :func:`~contractn_tpu.models.excitations.unfolded_bands` needs).
    The total weight saturates the static structure factor
    ``S(kappa)`` (:func:`~contractn_tpu.models.vumps_cell.
    static_structure_factor_cell`) when the operator creates a single
    quasiparticle — the tests pin the sum rule.

    ``string_parities`` / ``cell_sign`` (from
    :func:`~contractn_tpu.models.u1_vumps_cell.string_parities_cell`,
    masked grounds only) turn ``op`` into a FERMIONIC operator
    ``c(kappa) = sum_j e^{i kappa j} (prod_{m<j} Z_m) op_j``: the
    semi-infinite Jordan-Wigner string telescopes to the per-bond
    diagonal ``P_j`` on the insertion bond and a per-cell wrap sign —
    single-particle spectral functions (ARPES / inverse
    photoemission) of interacting chains, with the removal sum rule
    ``sum_a w_a == n(kappa)`` pinned against independent string
    correlators in the tests.

    Returns:
        ``(omegas, weights)`` — ascending energies over the full
        concatenated tangent space and matching per-site pole weights.
    """
    p = prep if prep is not None else prepare_excitations_cell(
        ground, mpo_cores, tol=tol)
    als, ars, acs, cdt = p["als"], p["ars"], p["acs"], p["cdt"]
    n = len(als)
    bond = als[0].shape[1]
    op = jnp.asarray(op, cdt)
    ops = []
    for i in range(n):
        d = als[i].shape[0]
        dis = (peinsum("st,tij,sij->", op, acs[i], jnp.conj(acs[i]))
               / peinsum("sij,sij->", acs[i], jnp.conj(acs[i])))
        if string_parities is not None:
            dis = jnp.zeros_like(dis)  # charge-offset op: <op> == 0
        ops.append(op - dis * jnp.eye(d, dtype=cdt))
    kap = jnp.asarray(float(kappa), cdt)
    # a negative cell wrap sign IS the Jordan-Wigner pi-shift: the
    # string advances the excitation's cell momentum by pi, so the
    # matching tangent sector sits at K = n kappa + pi (the internal
    # geometric wrap phase e^{-i n kappa} * cell_sign == e^{-iK}
    # stays consistent automatically)
    shift = 0.0 if cell_sign >= 0 else np.pi
    big_k = jnp.asarray(float(kappa) * n + shift, cdt)
    h = _dense_heff_cell(
        p["vls"], als, ars, p["cs"][0], p["fls"], p["frs"], p["ws"],
        p["lams"], big_k, p["is_zeros"], p["diag_prod_zero"],
        p["eye_diag_cell"], tol=tol)
    omegas, vecs = jnp.linalg.eigh(h)

    defl = p.get("defl")
    if defl is None:
        defl = _deflation_pair_cell(als, ars, cdt)
        p["defl"] = defl  # kappa-independent: cache for reuse

    dims = [p["vls"][i].shape[1] * bond for i in range(n)]
    m = sum(dims)
    offs = np.concatenate([[0], np.cumsum(dims)])

    @jax.jit
    def g_of(xv):
        bs = [jnp.matmul(
            p["vls"][i],
            xv[offs[i]:offs[i + 1]].reshape(p["vls"][i].shape[1],
                                            bond),
            precision=jax.lax.Precision.HIGHEST).reshape(als[i].shape)
            for i in range(n)]
        return _overlap_g_cell(bs, als, ars, acs, ops, kap, defl,
                               tol=tol, parities=string_parities,
                               cell_sign=cell_sign)

    basis = jnp.eye(m, dtype=cdt)
    src = jax.vmap(g_of)(basis)
    amps = jnp.matmul(jnp.conj(vecs).T, src,
                      precision=jax.lax.Precision.HIGHEST)
    return omegas, jnp.abs(amps) ** 2


def excitation_minimum_cell(ground, mpo_cores, k, iters=60, tol=1e-8,
                            prep=None, key=None):
    """Lowest excitation at cell momentum ``k`` by projected Lanczos —
    no dense ``H_eff`` build, so it scales to bond dimensions where
    the ``O((sum_i (d_i-1) D^2)^2)`` environment-solve count of
    :func:`excitation_spectrum_cell` is prohibitive.

    Works directly on full per-site ``B`` tensors with the dense
    left-tangent gauge projector ``B_i - AL_i (AL_i^H B_i)`` applied
    per iteration INSIDE Lanczos (``project=`` — ending the matvec
    with it is not enough; see ``ops/krylov.py``), and each site's
    regularization constant subtracted in the matvec.  The charged
    variant with masks is :func:`~contractn_tpu.models.u1_vumps_cell.
    sector_excitation_minimum_cell`.

    Returns ``(energy, b_tensors)``.
    """
    import jax as _jax

    from ..ops.krylov import lanczos_ground

    p = prep if prep is not None else prepare_excitations_cell(
        ground, mpo_cores, tol=tol)
    n = len(p["als"])
    als, ars, ws = p["als"], p["ars"], p["ws"]
    fls, frs, lams = p["fls"], p["frs"], p["lams"]
    cdt = p["cdt"]
    bond = als[0].shape[1]
    kc = jnp.asarray(float(k), cdt)
    ph_r = jnp.exp(+1j * kc)
    shapes = [a.shape for a in als]
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    al_mats = [als[i].reshape(shapes[i][0] * bond, bond)
               for i in range(n)]

    def split(v):
        return [v[offs[i]:offs[i + 1]].reshape(shapes[i])
                for i in range(n)]

    def project(v):
        outs = []
        for i, b in enumerate(split(v)):
            m = b.reshape(shapes[i][0] * bond, bond)
            ov = peinsum("ji,jk->ik", jnp.conj(al_mats[i]), m)
            m = m - peinsum("ij,jk->ik", al_mats[i], ov)
            outs.append(m.reshape(-1))
        return jnp.concatenate(outs)

    def matvec(v):
        bs = split(v)
        lbs = _lb_cell(als, ars, p["cs"][0], fls, ws, bs, kc,
                       p["is_zeros"], p["diag_prod_zero"],
                       p["eye_diag_cell"], tol=tol)
        rbs = _rb_cell(als, ars, p["cs"][0], frs, ws, bs, kc,
                       p["is_zeros"], p["diag_prod_zero"],
                       p["eye_diag_cell"], tol=tol)
        outs = []
        for i in range(n):
            out = _h_ac(fls[i], ws[i], frs[(i + 1) % n], bs[i])
            out = out + _h_ac(lbs[i], ws[i], frs[(i + 1) % n],
                              ars[i])
            rbu = rbs[(i + 1) % n] if i < n - 1 else ph_r * rbs[0]
            out = out + _h_ac(fls[i], ws[i], rbu, als[i])
            outs.append((out - lams[i] * bs[i]).ravel())
        return project(jnp.concatenate(outs))

    key = key if key is not None else _jax.random.PRNGKey(0)
    kr_, ki_ = _jax.random.split(key)
    total = int(offs[-1])
    v0 = (_jax.random.normal(kr_, (total,))
          + 1j * _jax.random.normal(ki_, (total,))).astype(cdt)
    v0 = project(v0)
    energy, vec = _jax.jit(
        lambda v: lanczos_ground(matvec, v, iters, project=project))(v0)
    return jnp.real(energy), tuple(split(vec))


def dynamic_structure_factor_cell(ground, mpo_cores, op, kappas,
                                  omegas, eta=0.05, tol=1e-10,
                                  string_parities=None,
                                  cell_sign=1.0):
    """Lorentzian-broadened ``S(kappa, w)`` map on a cell ground from
    the tangent-space poles — the cell version of
    :func:`~contractn_tpu.models.excitations.
    dynamic_structure_factor`, with per-site momenta ``kappas``
    spanning the FULL extended zone (each maps to its cell sector
    ``K = n kappa``).  With ``string_parities``/``cell_sign`` the map
    is a fermionic single-particle spectral function ``A(kappa, w)``
    (ARPES when ``op`` annihilates, inverse photoemission when it
    creates).  Returns ``(len(kappas), len(omegas))``.
    """
    kappas = np.atleast_1d(np.asarray(kappas, float))
    omegas = np.atleast_1d(np.asarray(omegas, float))
    out = np.zeros((kappas.size, omegas.size))
    prep = prepare_excitations_cell(ground, mpo_cores, tol=tol)
    for i, kap in enumerate(kappas):
        om, wt = spectral_weights_cell(
            ground, mpo_cores, op, float(kap), tol=tol, prep=prep,
            string_parities=string_parities, cell_sign=cell_sign)
        om, wt = np.asarray(om), np.asarray(wt)
        lor = (eta / np.pi) / (
            (omegas[None, :] - om[:, None]) ** 2 + eta * eta)
        out[i] = np.matmul(wt, lor)
    return out


def quasiparticle_dispersion_cell(mpo_cores, ks, bond_dim=12,
                                  ground=None, n_bands=1, tol=1e-10,
                                  **vumps_kwargs):
    """Lowest ``n_bands`` excitation energies of a period-n chain at
    each cell momentum, natively (no d^n folding).

    Runs :func:`~contractn_tpu.models.vumps_cell.vumps_cell` once
    (unless ``ground`` is supplied), then one jitted dense-``H_eff``
    diagonalization per momentum.

    Returns:
        ``(ground, omegas)`` with ``omegas`` ``(len(ks), n_bands)``.
    """
    from .vumps_cell import vumps_cell

    if ground is None:
        ground = vumps_cell(mpo_cores, bond_dim, **vumps_kwargs)
    prep = prepare_excitations_cell(ground, mpo_cores, tol=tol)
    omegas = np.stack([
        np.asarray(excitation_spectrum_cell(
            ground, mpo_cores, k, tol=tol, prep=prep))[:n_bands]
        for k in ks
    ])
    return ground, omegas
