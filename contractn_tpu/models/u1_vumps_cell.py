"""Charge-masked multi-site-cell VUMPS: exact U(1) with PER-BOND
charge ladders.

The single-site masked solver (:mod:`~contractn_tpu.models.u1_vumps`)
requires a translation-invariant bond ladder, which rules out cells
whose physical charges shift the ladder's lattice every site — its own
docstring example is spin-1/2 XXZ with ``p = +-1`` (bond charges
alternate between even and odd), and round 4's Hubbard chain had the
same problem per spin at half filling (``n_s - 1/2`` shifts are
half-integer), forcing a TWO-SITE FOLD to d=16 packed charges both
times.  The native cell solver removes the restriction at its root:
each bond ``i`` carries its OWN static ladder ``q_i``, and site ``i``'s
mask ties them — ``mask_i[s, a, b] = [q_i[a] + p_{i,s} == q_{i+1}[b]]``.
Alternating even/odd (or integer/half-integer, scaled to ints) ladders
are then just different static vectors; the d=4 Hubbard site and the
d=2 XXZ site run natively.

Everything rides the two round-4 foundations unchanged:

* the UNMASKED cell environments (:func:`~contractn_tpu.models.
  vumps_cell.mpo_environments_cell`) — masks only enter the Lanczos
  matvecs and gauge updates, exactly as in the single-site design
  (the GMRES junk in dead slots is projected away by the masked
  matvec);
* the charge-ALIGNED polar/ortho algebra of :mod:`u1_vumps` /
  :mod:`u1` — here with per-site selector bundles, since the row
  classes of ``AC_i`` target bond ``i+1``'s ladder while its column
  classes live on bond ``i``'s.

Validated in ``tests/test_u1_vumps_cell.py``: the gapped XXZ chain
(Delta = 2) run NATIVELY at d=2 on alternating even/odd ladders
matches the exact Baxter energy and the folded d=4 ``vumps_u1``
result, with structural zero leak (``a * (1 - mask) == 0``
identically); and the native d=4 half-filled Hubbard chain matches
Lieb-Wu without any folding (per-site packed charges
``(2 n_up - 1) * A + (2 n_dn - 1)`` — odd-odd lattice alternating
against the even-even bond-0 ladder).

No counterpart in the reference (no symmetries, no infinite systems;
SURVEY.md §2).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.krylov import lanczos_ground
from ..ops.stabilize import peinsum
from .mpo import MPO
from .u1 import _DEAD_VALUE, _aligned_ortho, _per_site, \
    mpo_channel_charges
from .u1_vumps import _aligned_polar
from .vumps import _h_ac, _h_c
from .vumps_cell import mpo_environments_cell


def u1_cell_charges(phys_list, bond_dim, n_walk=8):
    """Per-bond charge ladders for an n-site cell.

    A charge random walk steps through ``n_walk`` full cells; the
    distribution snapshot at each bond position (squared counts, as in
    :func:`u1_vumps.u1_uniform_charges`) weights that bond's slot
    allocation.  Mirror-symmetric distributions get mirrored pair
    allocations with >= 2 slots per sign per kept class (singleton
    classes trap VUMPS in biased stationary points — measured in the
    single-site solver); ladders without a center class (odd-lattice
    bonds) leave any odd remainder slot DEAD rather than break the
    mirror.  Returns a list of ``(bond_dim,)`` int arrays.
    """
    n = len(phys_list)
    dist = {0: 1}
    snapshots = [None] * n
    for _ in range(n_walk):
        for i in range(n):
            snapshots[i] = dist
            nxt = {}
            for q, c in dist.items():
                for p in phys_list[i]:
                    nxt[q + p] = nxt.get(q + p, 0) + c
            dist = nxt
    return [_allocate_mirror({q: c * c for q, c in snap.items()},
                             bond_dim) for snap in snapshots]


def _allocate_mirror(weights, bond_dim):
    """Proportional-first mirrored allocation, then drop the thinnest
    pairs until every kept class holds >= 2 slots per sign — the
    single-site allocator's strategy (its measured trap: base-first
    schemes flatten the ladder and starve the dominant central
    classes; the first cell allocator froze the XXZ energy at 2e-3
    independent of D exactly so), generalized to centerless odd-
    lattice ladders (any unpairable remainder slot stays DEAD)."""
    cap = min(len(weights),
              max(3, int(2 * np.sqrt(bond_dim)) + 1), bond_dim)
    symmetric = all(weights.get(-q) == c for q, c in weights.items())
    slots = []
    if symmetric:
        has0 = 0 in weights
        pos = sorted((q for q in weights if q > 0),
                     key=lambda q: (-weights[q], q))
        n_pairs = min(len(pos), (cap - (1 if has0 else 0)) // 2,
                      (bond_dim - (1 if has0 else 0)) // 2)
        while True:
            groups = ([(0, weights[0], 1)] if has0 else []) + [
                (q, 2 * weights[q], 2) for q in pos[:n_pairs]]
            total_w = sum(g[1] for g in groups)
            alloc = {q: mult for q, _, mult in groups}
            rest = bond_dim - sum(alloc.values())
            fracs = []
            for q, wgt, mult in groups:
                share = rest * wgt / max(total_w, 1)
                units = int(share // mult)
                alloc[q] += units * mult  # pairs stay mirrored
                fracs.append((share - units * mult, q, mult))
            leftover = bond_dim - sum(alloc.values())
            for _, q, mult in sorted(fracs, reverse=True):
                if leftover >= mult:
                    alloc[q] += mult
                    leftover -= mult
            if has0:
                alloc[0] += leftover  # odd slot: center class
            # else: leftover slots stay DEAD (mirror preserved)
            min_pair = min((alloc[q] for q in pos[:n_pairs]),
                           default=bond_dim)
            if n_pairs > 1 and ((has0 and alloc[0] < 2)
                                or min_pair < 4):
                n_pairs -= 1
                continue
            break
        for q, cnt in alloc.items():
            if q == 0:
                slots.extend([0] * cnt)
            else:
                slots.extend([q] * (cnt // 2) + [-q] * (cnt // 2))
    else:
        qs = sorted(weights, key=lambda q: (-weights[q], abs(q), q))
        qs = qs[:cap]
        total_w = sum(weights[q] for q in qs)
        alloc = {q: 1 for q in qs}
        rest = bond_dim - len(qs)
        if rest > 0:
            fracs = []
            for q in qs:
                share = rest * weights[q] / total_w
                alloc[q] += int(share)
                fracs.append((share - int(share), q))
            leftover = bond_dim - sum(alloc.values())
            for _, q in sorted(fracs, reverse=True)[:leftover]:
                alloc[q] += 1
        for q in sorted(alloc):
            slots.extend([q] * alloc[q])
    slots = sorted(slots)[:bond_dim]
    arr = np.full((bond_dim,), _DEAD_VALUE, np.int64)
    arr[: len(slots)] = slots
    return arr


def u1_cell_sector(phys_list, bond_dim, charges=None,
                   dtype=jnp.float64, n_walk=8):
    """Per-site masks and per-bond selector bundles for a masked cell.

    Args:
        phys_list: one physical-charge list per cell site.
        charges: optional explicit per-bond ladders (list of n arrays,
            ladder ``i`` on the bond LEFT of site ``i``).

    Returns a dict of tuples indexed by site/bond: ``charges``,
    ``site_masks[i] (d_i, D, D)``, ``bond_masks[i] (D, D)``,
    ``row_sels[i]`` (classes of bond ``i+1`` over rows ``(s, a)`` of
    ``AC_i`` reshaped), ``row_t_sels[i]`` (classes of bond ``i``),
    ``slot_sels[i]`` (classes of bond ``i`` over its slots).
    """
    n = len(phys_list)
    qs = ([np.asarray(c, np.int64) for c in charges]
          if charges is not None
          else u1_cell_charges(phys_list, bond_dim, n_walk=n_walk))
    if len(qs) != n or any(q.shape != (bond_dim,) for q in qs):
        raise ValueError("need one (bond_dim,) ladder per bond")
    lives = [q != _DEAD_VALUE for q in qs]
    site_masks, bond_masks = [], []
    row_sels, row_t_sels, slot_sels = [], [], []
    for i in range(n):
        phys = [int(p) for p in phys_list[i]]
        d = len(phys)
        ql, qr = qs[i], qs[(i + 1) % n]
        ll, lr = lives[i], lives[(i + 1) % n]
        sm = np.zeros((d, bond_dim, bond_dim))
        for s, p in enumerate(phys):
            sm[s] = ((ql[:, None] + p == qr[None, :])
                     & ll[:, None] & lr[None, :])
        site_masks.append(jnp.asarray(sm, dtype))
        bond_masks.append(jnp.asarray(
            ((ql[:, None] == ql[None, :])
             & ll[:, None] & ll[None, :]).astype(np.float64), dtype))
        cls_r = sorted({int(c) for c in qr[lr]})
        cls_l = sorted({int(c) for c in ql[ll]})
        rs = np.zeros((max(len(cls_r), 1), d * bond_dim))
        for ci, c in enumerate(cls_r):
            for s, p in enumerate(phys):
                rs[ci, s * bond_dim:(s + 1) * bond_dim] = (
                    ll & (ql + p == c))
        rts = np.zeros((max(len(cls_l), 1), d * bond_dim))
        for ci, c in enumerate(cls_l):
            for s, p in enumerate(phys):
                rts[ci, s * bond_dim:(s + 1) * bond_dim] = (
                    lr & (qr - p == c))
        ss = np.zeros((max(len(cls_l), 1), bond_dim))
        for ci, c in enumerate(cls_l):
            ss[ci] = ll & (ql == c)
        row_sels.append(jnp.asarray(rs))
        row_t_sels.append(jnp.asarray(rts))
        slot_sels.append(jnp.asarray(ss))
    return {
        "charges": tuple(qs),
        "phys_list": tuple(tuple(int(p) for p in pl)
                           for pl in phys_list),
        "bond_dim": int(bond_dim),
        "site_masks": tuple(site_masks),
        "bond_masks": tuple(bond_masks),
        "row_sels": tuple(row_sels),
        "row_t_sels": tuple(row_t_sels),
        "slot_sels": tuple(slot_sels),
    }


@partial(jax.jit, static_argnums=(3,))
def _solve_ac_m(fl, w, fr, iters, mask, ac):
    return lanczos_ground(
        lambda t: mask * _h_ac(fl, w, fr, t), ac, iters)


@partial(jax.jit, static_argnums=(2,))
def _solve_c_m(fl, fr, iters, mask, c):
    return lanczos_ground(lambda t: mask * _h_c(fl, fr, t), c, iters)


@jax.jit
def _gauge_update_cell_u1(ac, c_left, c_right, site_mask, row_sel,
                          row_t_sel, slot_sel_l, slot_sel_r):
    """Per-site masked polar gauge update: ``AL_i`` pairs ``AC_i``
    with bond ``i+1`` (classes of the RIGHT ladder), ``AR_i`` with
    bond ``i`` — every factor charge-aligned, then mask-scrubbed."""
    d_, bond = ac.shape[0], ac.shape[1]
    pol_cr = _aligned_polar(c_right, slot_sel_r, slot_sel_r)
    al = peinsum(
        "ij,kj->ik",
        _aligned_polar(ac.reshape(d_ * bond, bond), row_sel,
                       slot_sel_r),
        jnp.conj(pol_cr),
    ).reshape(d_, bond, bond) * site_mask
    ar_mat = _aligned_polar(
        ac.transpose(0, 2, 1).reshape(d_ * bond, bond),
        row_t_sel, slot_sel_l)
    cl = _aligned_polar(c_left.T, slot_sel_l, slot_sel_l)
    ar = peinsum("ij,kj->ik", ar_mat, jnp.conj(cl)).reshape(
        d_, bond, bond).transpose(0, 2, 1) * site_mask
    grad = jnp.linalg.norm(ac - peinsum("dij,jk->dik", al, c_right))
    return al, ar, grad


def string_parities_cell(sector, z_diag):
    """Per-bond Jordan-Wigner boundary signs of a masked cell sector.

    For a charge-masked cell ground the string operator TELESCOPES:
    ``Z AL_i = P_i (.) AL_i (.) P_{i+1}`` holds EXACTLY (pinned at
    0.0 in the tests) with diagonal ``P_j[b] = sign(q_j[b])`` given by
    the charge recursion ``sign(q + p_s) = sign(q) z_s`` — consistent
    because fermion parity is a linear function of the conserved
    charge mod 2 (the recursion raises if the supplied ``z_diag``
    breaks that).  A semi-infinite string ``prod_{m<j} Z_m`` acting on
    the ket therefore reduces to the single diagonal ``P_j`` on bond
    ``j`` (up to one global boundary sign that cancels in every
    ``|.|^2``), which is what makes fermionic spectral functions ride
    the bosonic tangent machinery unchanged
    (:func:`~contractn_tpu.models.excitations_cell.
    spectral_weights_cell`'s ``string_parities=``).

    Args:
        sector: the ``vumps_u1_cell`` sector dict.
        z_diag: length-``d_i`` per-state string eigenvalues (``+-1``),
            one sequence per site or a single shared one (e.g.
            ``(1, -1)`` for spin-1/2 JW, ``(1, -1, -1, 1)`` for the
            folded d=4 Hubbard site parity ``Z x Z``).

    Returns:
        ``(parities, cell_sign)`` — a list of n ``(D,)`` float arrays
        (``0.0`` on dead slots) and the per-cell wrap sign
        ``P_{j+n} = cell_sign * P_j`` (``(-1)^{fermions per cell}``;
        it multiplies the cell momentum phase in the geometric
        string-dressed solves).
    """
    qs = [np.asarray(q) for q in sector["charges"]]
    n = len(qs)
    phys = sector["phys_list"]
    zs = _per_site(z_diag, n)
    # forward charge walk with signs, seeded from ONE bond-0 charge
    # (relative signs between charges EMERGE from the recursion —
    # seeding them from charge differences is wrong for packed
    # multi-component lattices, where parity is not (q - q0)/2)
    n_walk = 8
    levels = n_walk * n + 1
    sign = [dict() for _ in range(levels)]
    live0 = sorted(int(q) for q in qs[0][qs[0] != _DEAD_VALUE])
    sign[0][live0[0]] = 1.0
    for lvl in range(levels - 1):
        i = lvl % n
        for q, sg in sign[lvl].items():
            for s, p in enumerate(phys[i]):
                val = sg * float(zs[i][s])
                prev = sign[lvl + 1].get(q + int(p))
                if prev is not None and prev != val:
                    raise ValueError(
                        f"string eigenvalues {tuple(zs[i])} are not a "
                        "parity function of the conserved charge at "
                        f"site {i} — no telescoping string sign")
                sign[lvl + 1][q + int(p)] = val
    cell_sign = None
    for lvl in range(levels - n):
        common = set(sign[lvl]) & set(sign[lvl + n])
        ratios = {sign[lvl + n][q] * sign[lvl][q] for q in common}
        if len(ratios) > 1:
            raise ValueError("inconsistent cell wrap sign")
        if ratios:
            r = ratios.pop()
            if cell_sign is not None and r != cell_sign:
                raise ValueError("inconsistent cell wrap sign")
            cell_sign = r
    if cell_sign is None:
        raise ValueError("charge walk never revisits a charge — "
                         "cannot fix the cell wrap sign")
    # collapse levels onto bonds, rescaling by the wrap sign
    parities = []
    for jb in range(n):
        merged = dict()
        for lvl in range(jb, levels, n):
            scale = cell_sign ** ((lvl - jb) // n)
            for q, sg in sign[lvl].items():
                val = sg * scale
                prev = merged.get(q)
                if prev is not None and prev != val:
                    raise ValueError(
                        "string sign is not a function of the bond "
                        f"charge on bond {jb}")
                merged[q] = val
        missing = [int(q) for q in qs[jb]
                   if q != _DEAD_VALUE and int(q) not in merged]
        if missing:
            raise ValueError(
                f"live charges {missing} on bond {jb} unreachable "
                "from the walk — cannot assign string signs")
        parities.append(jnp.asarray(
            [merged.get(int(q), 0.0) for q in qs[jb]]))
    return parities, float(cell_sign)


def excitation_charge_masks_cell(sector, delta_q):
    """Per-site ``(d_i, D, D)`` 0/1 masks of tangent directions
    carrying EXACT excitation charge ``delta_q`` on a cell sector:
    ``B_i[s, a, b]`` lives when ``q_i[a] + p_{i,s} - q_{i+1}[b] ==
    delta_q`` (the chain right of the insertion keeps its ground
    labels, so the state's total charge shifts by ``delta_q``)."""
    qs = [np.asarray(q) for q in sector["charges"]]
    n = len(qs)
    bond = qs[0].shape[0]
    lives = [q != _DEAD_VALUE for q in qs]
    masks = []
    for i in range(n):
        phys = sector["phys_list"][i]
        ql, qr = qs[i], qs[(i + 1) % n]
        ll, lr = lives[i], lives[(i + 1) % n]
        m = np.zeros((len(phys), bond, bond))
        for s, p in enumerate(phys):
            m[s] = ((ql[:, None] + int(p) - qr[None, :]
                     == int(delta_q))
                    & ll[:, None] & lr[None, :])
        masks.append(jnp.asarray(m))
    return masks


def sector_excitation_minimum_cell(ground, mpo_cores, delta_q, k,
                                   iters=60, tol=1e-8, prep=None,
                                   key=None):
    """Lowest cell tangent-space excitation at CELL momentum ``k``
    carrying EXACT charge offset ``delta_q`` above a
    :func:`vumps_u1_cell` ground state.

    The cell generalization of :func:`~contractn_tpu.models.u1_vumps.
    sector_excitation_minimum`, with the same two hard-won rules: the
    charge mask is restricted to the LIVE ranges of the neighbouring
    partial isometries (``B_i``'s left bond must feed a live COLUMN of
    ``AL_{i-1}``, its right bond a live ROW of ``AR_{i+1}`` — a ``B``
    feeding a dropped null direction is a zero STATE at unit
    ``<B, B>`` and its Rayleigh quotient deflates to garbage), and the
    dense per-site gauge projector ``B_i - AL_i (AL_i^H B_i)`` runs
    INSIDE Lanczos via ``project=`` (Gram-Schmidt re-injects each
    row's eps-residual scaled by O(|H|); masks with exact zeros are
    immune, dense projectors are not).  The matvec is the native cell
    ``H_eff`` (:mod:`~contractn_tpu.models.excitations_cell`) with
    each site's regularization constant subtracted in place (the
    per-site ``lam_i`` are no scalar multiple of the identity on the
    concatenated space).

    Returns ``(energy, b_tensors)`` — energy relative to the ground
    state (negative when the charged sector undercuts the grand
    saddle, e.g. electron removal at ``mu = 0``), and the per-site
    ``B`` tuple.
    """
    from .excitations_cell import (
        _lb_cell,
        _rb_cell,
        prepare_excitations_cell,
    )
    from .vumps import _h_ac as _h_ac_v

    p = prep if prep is not None else prepare_excitations_cell(
        ground, mpo_cores, tol=tol)
    sector = ground["sector"]
    n = len(p["als"])
    als, ars, ws = p["als"], p["ars"], p["ws"]
    fls, frs, lams = p["fls"], p["frs"], p["lams"]
    cdt = p["cdt"]
    bond = als[0].shape[1]
    qmasks = excitation_charge_masks_cell(sector, delta_q)
    for i in range(n):
        al_prev = als[(i - 1) % n]
        ar_next = ars[(i + 1) % n]
        live_l = jnp.real(peinsum("sji,sjk->ik", jnp.conj(al_prev),
                                  al_prev)).diagonal() > 0.5
        live_r = jnp.real(peinsum("sij,skj->ik", ar_next,
                                  jnp.conj(ar_next))).diagonal() > 0.5
        qmasks[i] = (qmasks[i] * live_l[None, :, None]
                     * live_r[None, None, :])
    if float(sum(float(m.sum()) for m in qmasks)) == 0.0:
        raise ValueError(
            f"no live tangent directions carry charge {delta_q} on "
            "these ladders — widen them or pick a reachable offset")
    qmasks = [m.astype(cdt) for m in qmasks]
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
            outs.append((m.reshape(shapes[i]) * qmasks[i]).ravel())
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
            out = _h_ac_v(fls[i], ws[i], frs[(i + 1) % n], bs[i])
            out = out + _h_ac_v(lbs[i], ws[i], frs[(i + 1) % n],
                                ars[i])
            rbu = rbs[(i + 1) % n] if i < n - 1 else ph_r * rbs[0]
            out = out + _h_ac_v(fls[i], ws[i], rbu, als[i])
            outs.append((out - lams[i] * bs[i]).ravel())
        return project(jnp.concatenate(outs))

    key = key if key is not None else jax.random.PRNGKey(0)
    kr_, ki_ = jax.random.split(key)
    total = int(offs[-1])
    v0 = (jax.random.normal(kr_, (total,))
          + 1j * jax.random.normal(ki_, (total,))).astype(cdt)
    v0 = project(v0)
    energy, vec = jax.jit(
        lambda v: lanczos_ground(matvec, v, iters, project=project))(v0)
    return jnp.real(energy), tuple(split(vec))


def vumps_u1_cell(mpo_cores, bond_dim, phys_list, iters=60,
                  dtype=jnp.float64, lanczos_iters=40, key=None,
                  tol=1e-12, charges=None, left=None, right=None,
                  n_walk=8):
    """Infinite period-n ground state confined EXACTLY to a U(1)
    manifold with per-bond charge ladders.

    Args:
        mpo_cores: n triangular bulk cores (one per cell site).
        phys_list: per-site physical charge lists (a flat list means
            every site identical).
        charges: optional explicit per-bond ladders.

    Returns the :func:`~contractn_tpu.models.vumps_cell.vumps_cell`
    result dict plus ``sector``; every ``als/ars/acs[i]`` satisfies
    ``a * (1 - site_masks[i]) == 0`` identically.
    """
    ws = [jnp.asarray(w, dtype) for w in mpo_cores]
    n = len(ws)
    phys_list = _per_site(phys_list, n)
    for i in range(n):
        if len(phys_list[i]) != ws[i].shape[0]:
            raise ValueError(f"site {i}: {len(phys_list[i])} charges "
                             f"for phys dim {ws[i].shape[0]}")
    # channel definiteness on a 3-cell repetition with per-site charges
    rep_cores = jnp.stack([ws[i % n] for i in range(3 * n)])
    wdim = ws[0].shape[2]
    lvec = jnp.zeros(wdim, dtype).at[0].set(1.0) if left is None \
        else jnp.asarray(left, dtype)
    rvec = jnp.zeros(wdim, dtype).at[-1].set(1.0) if right is None \
        else jnp.asarray(right, dtype)
    mpo_channel_charges(MPO(rep_cores, lvec, rvec),
                        [phys_list[i % n] for i in range(3 * n)])

    sector = u1_cell_sector(phys_list, bond_dim, charges=charges,
                            dtype=dtype, n_walk=n_walk)
    sms = sector["site_masks"]
    bms = sector["bond_masks"]
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    als, ars, cs = [], [], []
    for i in range(n):
        d = ws[i].shape[0]
        a0 = jax.random.normal(keys[i], (d, bond_dim, bond_dim),
                               dtype) * sms[i]
        al_q, _ = _aligned_ortho(a0.reshape(d * bond_dim, bond_dim),
                                 sector["row_sels"][i],
                                 sector["slot_sels"][(i + 1) % n])
        als.append(al_q.reshape(d, bond_dim, bond_dim) * sms[i])
        ar_q, _ = _aligned_ortho(
            a0.transpose(0, 2, 1).reshape(d * bond_dim, bond_dim),
            sector["row_t_sels"][i], sector["slot_sels"][i])
        ars.append(ar_q.reshape(d, bond_dim, bond_dim)
                   .transpose(0, 2, 1) * sms[i])
        live = jnp.asarray(
            (np.asarray(sector["charges"][i]) != _DEAD_VALUE
             ).astype(np.float64), dtype)
        cs.append(jnp.diag(live) / jnp.sqrt(jnp.sum(live)))
    als, ars, cs = tuple(als), tuple(ars), tuple(cs)
    acs = tuple(peinsum("dij,jk->dik", als[i], cs[(i + 1) % n])
                * sms[i] for i in range(n))

    energies = []
    grad_norm = np.inf
    for _ in range(int(iters)):
        fls, frs, e_cell = mpo_environments_cell(als, ars, cs, ws,
                                                 tol=tol)
        new_acs = []
        for i in range(n):
            _, ac = _solve_ac_m(fls[i], ws[i], frs[(i + 1) % n],
                                lanczos_iters, sms[i], acs[i])
            new_acs.append(ac)
        new_c = []
        for i in range(n):
            _, c = _solve_c_m(fls[i], frs[i], lanczos_iters, bms[i],
                              cs[i])
            new_c.append(c)
        new_al, new_ar, grads = [], [], []
        for i in range(n):
            al, ar, grad = _gauge_update_cell_u1(
                new_acs[i], new_c[i], new_c[(i + 1) % n], sms[i],
                sector["row_sels"][i], sector["row_t_sels"][i],
                sector["slot_sels"][i],
                sector["slot_sels"][(i + 1) % n])
            new_al.append(al)
            new_ar.append(ar)
            grads.append(float(grad))
        als, ars = tuple(new_al), tuple(new_ar)
        cs, acs = tuple(new_c), tuple(new_acs)
        grad_norm = max(grads)
        energies.append(float(e_cell) / n)
        if grad_norm < 1e-11:
            break

    return {
        "als": als, "ars": ars, "acs": acs, "cs": cs,
        "energy": energies[-1], "energies": energies,
        "gradient_norm": grad_norm, "sector": sector,
    }
