"""Infinite boundary conditions: local quenches in the thermodynamic
limit.

A uniform ground state supplies EXACT semi-infinite surroundings for a
finite window of sites: the norm environments of the ``...AL AL [window]
AR AR...`` embedding are identities (AL/AR are isometries) and the
Hamiltonian environments are the quasi-fixed points ``FL/FR`` of
:func:`~contractn_tpu.models.vumps.mpo_environments` (corner-channel
geometric series with the extensive energy subtracted — the leftover
additive constant only dresses the global phase).  A local operator
applied inside the window then propagates through a genuinely INFINITE
chain: no finite-size boundary, no reflections, until the light cone
reaches the window edge (the static environments are the t=0 ground
halves, so pick ``n_sites > 2 v_max t`` — Phien/Vidal/McCulloch,
PRB 86, 245107).

The window evolves by the same two-site TDVP integrator as the finite
chains (:mod:`contractn_tpu.models.tdvp`): symmetric second order,
device-side Krylov exponentials, SVD bond growth up to ``max_bond`` —
only the boundary environments differ (``(D, W, D)`` tensors instead of
the finite chain's weight vectors).  Observables never assume a
canonical gauge: :func:`window_expectations` contracts explicit norm
environments from the identity edges.

This regime — real-time response of an infinite system to a LOCAL
perturbation — is unreachable by the uniform evolvers (iTEBD /
:func:`~contractn_tpu.models.mpo_evolution.umps_mpo_evolve` are
translation invariant by construction) and by finite chains (boundary
reflections).  The reference has no time evolution of any kind
(SURVEY.md section 2); additive capability.
"""

import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .dmrg import _split_theta, _update_left, _update_right
from .tdvp import _evolve_one_site, _evolve_two_site
from .vumps import mpo_environments


def ibc_window(ground, w_cell, n_sites):
    """Embed an ``n_sites`` window into a uniform ground state.

    Args:
        ground: a :func:`~contractn_tpu.models.vumps.vumps` result dict
            (needs ``al, ar, c``).
        w_cell: the triangular bulk MPO core ``(d, d, W, W)`` the ground
            state was solved with (identity corners — ``tfim_mpo(2).
            cores[0]``, :meth:`InfiniteOpSum.to_umpo` output, ...).
        n_sites: window width (``> 2 v_max t`` for the planned horizon).

    Returns:
        A window dict: ``sites`` (ragged ``(d, Dl, Dr)`` tensors, window
        gauge ``AC AR ... AR``), ``w`` (bulk core), ``env_left`` /
        ``env_right`` (Hamiltonian boundary environments in the sweep
        layout ``(bra D, W, ket D)``) and ``e_bulk`` (ground energy per
        site, for bookkeeping).
    """
    if n_sites < 2:
        raise ValueError("ibc_window needs n_sites >= 2")
    al, ar, c = ground["al"], ground["ar"], ground["c"]
    w = jnp.asarray(w_cell)
    fl, fr, e = mpo_environments(al, ar, c, w)
    ac = peinsum("dij,jk->dik", al, c)
    return {
        "sites": [ac] + [ar] * (int(n_sites) - 1),
        "w": w,
        # mpo_environments layout: FL (W, bra, ket), FR (W, ket, bra);
        # the sweep environments (_update_left/right) are (bra, W, ket).
        "env_left": jnp.transpose(fl, (1, 0, 2)),
        "env_right": jnp.transpose(fr, (2, 0, 1)),
        "e_bulk": float(e),
    }


def window_apply_local(window, op, site):
    """Apply a one-site operator inside the window (a NEW window dict;
    non-unitary operators are fine — the evolver renormalizes)."""
    sites = list(window["sites"])
    opj = jnp.asarray(op)
    sites[site] = peinsum("st,tij->sij",
                          opj.astype(sites[site].dtype), sites[site])
    return {**window, "sites": sites}


def window_apply_bond(window, gate, site, max_bond=None):
    """Apply a two-site operator ``gate (d^2, d^2)`` to window sites
    ``(site, site + 1)`` — exact by default (``max_bond=None`` keeps
    the full SVD rank).  The split's unit normalization is undone so
    the window keeps the operator's amplitude (``_split_theta``
    normalizes; the quench norm ``||B|psi>||`` must survive for the
    correlators' explicit restore)."""
    sites = list(window["sites"])
    k1, k2 = sites[site], sites[site + 1]
    d = k1.shape[0]
    g = jnp.asarray(gate).reshape(d, d, d, d)
    theta = peinsum("apj,bjq->abpq", k1, k2)
    theta = peinsum("ABab,abpq->ABpq", g.astype(theta.dtype), theta)
    nrm = jnp.linalg.norm(theta)
    cap = theta.shape[0] * min(theta.shape[2], theta.shape[3])
    t1, t2 = _split_theta(theta, cap if max_bond is None else max_bond,
                          to_left=True)
    sites[site], sites[site + 1] = t1, t2 * nrm
    return {**window, "sites": sites}


def window_overlaps_bond(bra_window, ket_window, gate):
    """``<bra| G_{i, i+1} |ket>`` for every window bond ``i`` in one
    pass (``n_sites - 1`` values) — the two-site analog of
    :func:`window_overlaps_local`, same shared-embedding contract."""
    bs = bra_window["sites"]
    ks = ket_window["sites"]
    n = len(bs)
    d = bs[0].shape[0]
    dt = jnp.result_type(bs[0].dtype, ks[0].dtype)
    g = jnp.asarray(gate, dt).reshape(d, d, d, d)
    ls = [jnp.eye(bs[0].shape[1], dtype=dt)]
    for i in range(n - 1):
        t = peinsum("xy,tyq->txq", ls[-1], ks[i].astype(dt))
        ls.append(peinsum("sxp,sxq->pq", jnp.conj(bs[i]).astype(dt), t))
    rs = [None] * (n + 1)
    rs[n] = jnp.eye(bs[-1].shape[2], dtype=dt)
    for i in range(n - 1, 0, -1):
        t = peinsum("syq,pq->syp", ks[i].astype(dt), rs[i + 1])
        rs[i] = peinsum("sxp,syp->xy", jnp.conj(bs[i]).astype(dt), t)
    vals = []
    for i in range(n - 1):
        kt = peinsum("xy,ayj->axj", ls[i], ks[i].astype(dt))
        kt = peinsum("axj,bjq->abxq", kt, ks[i + 1].astype(dt))
        kt = peinsum("ABab,abxq->ABxq", g, kt)
        bt = peinsum("Axm,Bmp->ABxp", jnp.conj(bs[i]).astype(dt),
                     jnp.conj(bs[i + 1]).astype(dt))
        num = peinsum("ABxp,ABxq->pq", bt, kt)
        vals.append(peinsum("pq,pq->", num, rs[i + 2]))
    return jnp.stack(vals)


def window_expectations(window, op):
    """One-site expectations on every window site (gauge-free: explicit
    norm environments from the identity edges)."""
    sites = window["sites"]
    n = len(sites)
    op = jnp.asarray(op, sites[0].dtype)
    rs = [None] * (n + 1)
    rs[n] = jnp.eye(sites[-1].shape[2], dtype=sites[0].dtype)
    for i in range(n - 1, -1, -1):
        t = peinsum("syq,pq->syp", sites[i], rs[i + 1])
        rs[i] = peinsum("sxp,syp->xy", jnp.conj(sites[i]), t)
    left = jnp.eye(sites[0].shape[1], dtype=sites[0].dtype)
    vals = []
    norm = None
    for i in range(n):
        t = peinsum("xy,tyq->txq", left, sites[i])
        top = peinsum("st,txq->sxq", op, t)
        num = peinsum("sxp,sxq->pq", jnp.conj(sites[i]), top)
        vals.append(peinsum("pq,pq->", num, rs[i + 1]))
        nxt = peinsum("sxp,sxq->pq", jnp.conj(sites[i]), t)
        if norm is None:
            norm = peinsum("pq,pq->", nxt, rs[1])
        left = nxt
    return jnp.stack(vals) / norm


def window_overlaps_local(bra_window, ket_window, op=None):
    """``<bra| op_j |ket>`` for every window site ``j`` in one pass.

    Both windows must share the embedding (same AL/AR outside, same
    edge bond dimensions): the cross transfer of the common isometries
    then closes to identities at both edges.  ``op=None`` returns the
    plain overlap ``<bra|ket>`` (scalar)."""
    bs = bra_window["sites"]
    ks = ket_window["sites"]
    n = len(bs)
    dt = jnp.result_type(bs[0].dtype, ks[0].dtype)
    ls = [jnp.eye(bs[0].shape[1], dtype=dt)]
    for i in range(n):
        t = peinsum("xy,tyq->txq", ls[-1], ks[i].astype(dt))
        ls.append(peinsum("sxp,sxq->pq", jnp.conj(bs[i]).astype(dt), t))
    if op is None:
        return jnp.trace(ls[-1])
    rs = [None] * (n + 1)
    rs[n] = jnp.eye(bs[-1].shape[2], dtype=dt)
    for i in range(n - 1, -1, -1):
        t = peinsum("syq,pq->syp", ks[i].astype(dt), rs[i + 1])
        rs[i] = peinsum("sxp,syp->xy", jnp.conj(bs[i]).astype(dt), t)
    opj = jnp.asarray(op, dt)
    vals = []
    for i in range(n):
        t = peinsum("xy,tyq->txq", ls[i], ks[i].astype(dt))
        t = peinsum("st,txq->sxq", opj, t)
        num = peinsum("sxp,sxq->pq", jnp.conj(bs[i]).astype(dt), t)
        vals.append(peinsum("pq,pq->", num, rs[i + 1]))
    return jnp.stack(vals)


def ibc_dynamic_correlator(ground, w_cell, op_b, op_a, n_sites, site_b,
                           dt, n_steps, max_bond=None, iters=16,
                           bond_b=False, bond_a=False):
    """Real-time correlator ``C[j, k] = <gs| A_j(t_k) B_{site_b} |gs>``
    (``t_k = k dt``) in the thermodynamic limit — the space-time signal
    whose Fourier transform is the dynamic structure factor.

    ``B`` is applied at window site ``site_b``; the quenched window
    evolves by :func:`window_evolve` while a REFERENCE ground window
    evolves alongside: its overlap with the t=0 window is the pure
    phase ``exp(-i c0 t)`` accumulated by the effective Hamiltonian's
    environment constant (the FL/FR corner channels fix the extensive
    part but leave a finite additive constant), and dividing it out
    converts effective-Hamiltonian overlaps into physical
    ``e^{i E0 t}``-corrected correlators.  The same division cancels
    the (symmetric) slow norm loss of the SVD truncations to first
    order.

    Returns a complex ``(n_sites, n_steps + 1)`` array.  Valid while
    the light cone stays inside the window (``n_sites > 2 v_max t``).
    ``bond_b`` / ``bond_a`` switch either operator to a TWO-site
    ``(d^2, d^2)`` bond operator (B applied at ``(site_b, site_b+1)``
    exactly via :func:`window_apply_bond`; a bond-operator A returns
    ``n_sites - 1`` rows, one per window bond) — the transport regime:
    current-current correlators and optical conductivities.
    Cross-check oracle: the tangent-space poles of
    :func:`~contractn_tpu.models.excitations.spectral_weights` (the
    frequency content of each row must live on the dispersion).
    """
    win = ibc_window(ground, w_cell, n_sites)
    if bond_b:
        ket = window_apply_bond(win, op_b, site_b)
    else:
        ket = window_apply_local(win, op_b, site_b)

    def measure(bra, kw):
        if bond_a:
            return window_overlaps_bond(bra, kw, op_a)
        return window_overlaps_local(bra, kw, op_a)

    # the evolver renormalizes per step (exact for the unitary flow up
    # to truncation); restore the quench amplitude ||B|gs>|| explicitly
    nb = float(jnp.sqrt(jnp.real(window_overlaps_local(ket, ket))))
    ref = win
    rows = [np.asarray(measure(win, ket))]
    for _ in range(int(n_steps)):
        ket = _window_step(ket, dt, max_bond=max_bond, iters=iters)
        ref = _window_step(ref, dt, max_bond=max_bond, iters=iters)
        phase = window_overlaps_local(win, ref)
        rows.append(np.asarray(measure(win, ket))
                    * (nb / complex(phase)))
    return np.stack(rows, axis=1)


def ibc_thermal_correlator(thermal_core, h_core, op_b, op_a, n_sites,
                           site_b, dt, n_steps, max_bond=None, iters=16,
                           gauge_iters=60, bond_b=False, bond_a=False):
    """Finite-temperature real-time correlator in the thermodynamic
    limit: ``C[j, k] = <A_j(t_k) B_{site_b}>_beta = Tr(rho A_j(t_k)
    B_{site_b})``.

    The thermal purification (a :func:`~contractn_tpu.models.thermal.
    thermal_wii` core, folded ``d^2`` sites) plays the role the ground
    state plays at T=0: it is an EXACT zero mode of the balanced
    generator ``L = H (x) I - I (x) H^T`` (:func:`~contractn_tpu.
    models.thermal.balanced_umpo` — ``[H, rho^{1/2}] = 0``), so it
    supplies stationary semi-infinite environments for an
    :func:`ibc_window` while ``B (x) I`` applied inside the window
    propagates through the infinite thermal background.  The ancilla's
    backward evolution also slows the entanglement growth (Karrasch/
    Bardarson/Moore).  Identities used: ``<rho^{1/2}| (A (x) I)
    e^{-iLt} (B (x) I) |rho^{1/2}> = Tr(rho A(t) B)`` since
    ``rho^{1/2}`` commutes with ``e^{iHt}``.

    ``C(j, -t) = C(j, t)^*`` still holds at finite T for Hermitian
    ``A = B`` on a translation- plus inversion-invariant state
    (``<X>^* = <X^+>`` under the thermal trace), so
    :func:`ibc_spectral_function` applies to the returned array
    unchanged; the resulting ``S(k, w)`` obeys detailed balance
    ``S(k, -w) = e^{-beta w} S(k, w)`` to the broadening level.

    Args:
        thermal_core: folded ``(d^2, D, D)`` uniform purification core.
        h_core: the PHYSICAL ``(d, d, W, W)`` triangular bulk core.
        op_b / op_a: physical one-site operators (lifted internally).
        n_sites, site_b, dt, n_steps, max_bond, iters: as in
            :func:`ibc_dynamic_correlator`.

    Returns a complex ``(n_sites, n_steps + 1)`` array; the t=0 row is
    the STATIC thermal correlator (``thermal_wii_correlate`` oracle).
    """
    from .thermal import _fold_gate, _fold_op, balanced_umpo
    from .vumps import mixed_gauge

    w = np.asarray(h_core)
    d = w.shape[0]
    al, ar, c = mixed_gauge(jnp.asarray(thermal_core), iters=gauge_iters)
    ground = {"al": al, "ar": ar, "c": c}

    def lift(op, bond):
        # physical bond operators lift through _fold_gate (identity on
        # both ancillas); one-site through _fold_op
        return np.asarray(_fold_gate(op, d) if bond else _fold_op(op, d))

    return ibc_dynamic_correlator(
        ground, jnp.asarray(balanced_umpo(w)),
        lift(op_b, bond_b), lift(op_a, bond_a),
        n_sites, site_b, dt, n_steps, max_bond=max_bond, iters=iters,
        bond_b=bond_b, bond_a=bond_a)


def ibc_spectral_function(corr, site_b, dt, ks, omegas, eta=None):
    """``S(k, w)`` from an :func:`ibc_dynamic_correlator` signal.

    Space-time Fourier transform with a Gaussian damping window
    ``exp(-eta t^2)`` (default: 8 / t_max^2, pushing the cutoff ringing
    below the resulting ``O(sqrt(eta))`` Lorentz-Gauss broadening) and
    the ``t < 0`` half restored by hermiticity
    (``C(j, -t) = conj(C(j, t))`` for Hermitian A = B in a real ground
    state — trapezoid over the symmetrized signal).  Pure
    post-processing: no tensors, one pass over the ``(n_sites,
    n_t)`` array.

    Returns ``(len(ks), len(omegas))`` real values.  The peak ridge
    sits on the quasiparticle dispersion — the cheap high-accuracy
    alternative when only the dispersion is wanted is a phase fit,
    ``eps(k) ~ -arg(C(k, t+dt) / C(k, t)) / dt`` (used by the tests;
    broadening-free).
    """
    corr = np.asarray(corr)
    n, nt = corr.shape
    t_max = dt * (nt - 1)
    if eta is None:
        eta = 8.0 / max(t_max, 1e-30) ** 2
    js = np.arange(n) - int(site_b)
    ck = np.einsum("kj,jt->kt",
                   np.exp(-1j * np.outer(np.asarray(ks), js)), corr)
    ts = dt * np.arange(nt)
    damp = np.exp(-eta * ts ** 2)
    damp[0] *= 0.5  # trapezoid endpoint; t=0 shared by both halves
    damp[-1] *= 0.5
    phase = np.exp(1j * np.outer(np.asarray(omegas), ts))  # (w, t)
    half = np.einsum("wt,kt->wk", phase, ck * damp[None, :])
    return 2.0 * np.real(half).T * dt


def window_evolve(window, dt, n_steps, max_bond=None, imaginary=False,
                  iters=16, callback=None):
    """Evolve the window ``n_steps`` symmetric two-site TDVP steps under
    the infinite-chain effective Hamiltonian.

    Same integrator contract as :func:`~contractn_tpu.models.tdvp.
    tdvp_evolve` (``exp(-1j dt H)`` per step, or ``exp(-dt H)`` with
    ``imaginary=True``); the interior bonds grow up to ``max_bond``
    (default: keep the largest current bond), the two EDGE bonds are
    pinned to the uniform ground bond dimension by construction.
    ``callback(k, window)`` runs after each step.

    Returns the evolved window dict.
    """
    out = window
    for k in range(int(n_steps)):
        out = _window_step(out, dt, max_bond=max_bond,
                           imaginary=imaginary, iters=iters)
        if callback is not None:
            callback(k, out)
    return out


def _window_step(window, dt, max_bond=None, imaginary=False, iters=16):
    sites = list(window["sites"])
    n = len(sites)
    w = window["w"]
    if max_bond is None:
        max_bond = max(max(s.shape[1], s.shape[2]) for s in sites)
    fwd = -0.5 * dt if imaginary else -0.5j * dt
    bwd = -fwd
    if not imaginary:
        sites = [s.astype(jnp.result_type(s.dtype, jnp.complex64))
                 for s in sites]
    dtype = sites[0].dtype
    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = window["env_left"].astype(dtype)
    R[n] = window["env_right"].astype(dtype)
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], w)

    def sweep(order, left_to_right):
        for idx, i in enumerate(order):
            theta = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            theta = _evolve_two_site(L[i], w, w, R[i + 2], theta,
                                     iters, fwd)
            last_pair = idx == len(order) - 1
            if left_to_right:
                t1, t2 = _split_theta(theta, max_bond, to_left=True)
                sites[i], sites[i + 1] = t1, t2
                L[i + 1] = _update_left(L[i], sites[i], w)
                if not last_pair:
                    sites[i + 1] = _evolve_one_site(
                        L[i + 1], w, R[i + 2], iters, sites[i + 1], bwd)
            else:
                t1, t2 = _split_theta(theta, max_bond, to_left=False)
                sites[i], sites[i + 1] = t1, t2
                R[i + 1] = _update_right(R[i + 2], sites[i + 1], w)
                if not last_pair:
                    sites[i] = _evolve_one_site(
                        L[i], w, R[i + 1], iters, sites[i], bwd)

    sweep(list(range(n - 1)), left_to_right=True)
    sweep(list(range(n - 2, -1, -1)), left_to_right=False)
    nrm = jnp.maximum(jnp.linalg.norm(sites[0]), 1e-300)
    sites[0] = sites[0] / nrm
    return {**window, "sites": sites}
