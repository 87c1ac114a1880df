"""Charge-masked VUMPS: exact-U(1) uniform MPS in the thermodynamic
limit.

The finite-chain charge-mask design (:mod:`~contractn_tpu.models.u1`)
carries over to infinite chains with one structural change: a one-site
uniform MPS repeats the SAME bond on every link, so the bond charge
ladder must be translation invariant — ``mask[s, i, j] = [q[i] + p_s
== q[j]]`` with a single static ``q (D,)``.  That forces the unit
cell's physical charges to preserve the ladder's lattice (a cell of
charge-alternating sites like spin-1/2 XXZ with ``p = +-1`` shifts the
bond parity every site and has NO invariant ladder); fold such cells
first with :func:`~contractn_tpu.models.mpo.block_mpo` (the blocked
phys charges ``{+2, 0, 0, -2}`` live on ``2Z``, which IS invariant).

Three mechanisms keep the sector structurally exact through the VUMPS
loop (``cores * (1 - mask) == 0`` identically at every iterate):

1. **Mask-projected effective Hamiltonians.**  With a channel-charge-
   definite MPO the exact ``H_AC`` / ``H_C`` preserve the masked
   subspace (the DMRG invariance argument, :mod:`u1` module doc); the
   masked Lanczos matvecs additionally project out the numerical junk
   that the quasi-fixed-point environments accumulate in DEAD bond
   slots (the GMRES systems are solved in the full static space —
   harmless once the matvec masks it away).
2. **Charge-aligned polar decompositions** (:func:`_aligned_polar`)
   for the Zauner-Stauber gauge updates.  A plain polar factor
   ``U V^H`` of a block-structured matrix is block-pure only up to
   degenerate/null singular directions — the same arbitrary-completion
   failure as plain QR in the masked TDVP1 (``u1._aligned_ortho``
   docstring); per-class SVDs with null directions zeroed outright
   produce a class-pure partial isometry.
3. **Post-hoc mask scrubbing** of every updated tensor: LAPACK SVDs of
   exactly-zero-padded blocks can return ~1e-17 impurities in the
   zero rows; multiplying by the 0/1 masks restores EXACT zeros while
   perturbing isometry only at roundoff.

Validated against the unmasked :func:`~contractn_tpu.models.vumps.
vumps` on the folded gapped XXZ chain (equal energies at solver
tolerance) with structurally zero sector leak, and against the exact
Baxter ground energy of the Delta > 1 XXZ chain.

No counterpart in the reference (no symmetries, no infinite systems).
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
from .vumps import _h_ac, _h_c, mpo_environments


def u1_uniform_charges(phys_charges, bond_dim, n_walk=16):
    """Translation-invariant bond charge ladder for a uniform cell.

    Slots are allocated over the charge lattice reachable from 0 by
    ``n_walk`` cell steps, weighted by the squared walk count (the
    uniform-chain analog of the path-count heuristic in
    :func:`~contractn_tpu.models.u1.u1_bond_charges`): charges near the
    ladder center carry the entanglement of a zero-density sector.
    Returns a ``(bond_dim,)`` int array; unassigned slots hold the
    dead sentinel.
    """
    phys = [int(p) for p in phys_charges]  # full multiset: state
    walks = {0: 1}                         # degeneracies count
    for _ in range(n_walk):                # n_walk EVEN: keeps 0
        nxt = {}                           # reachable on +-ladders
        for q, c in walks.items():
            for p in phys:
                nxt[q + p] = nxt.get(q + p, 0) + c
        walks = nxt
    weights = {q: c * c for q, c in walks.items()}
    # cap the DISTINCT charges well below bond_dim: each kept class
    # needs several slots (a 1-slot class has Schmidt rank 1 — nothing
    # to variationally optimize; the first attempt froze exactly so)
    cap = min(len(weights), max(3, int(2 * np.sqrt(bond_dim)) + 1),
              bond_dim)
    symmetric = (0 in weights) and all(
        weights.get(-q) == c for q, c in weights.items())
    if symmetric:
        # a +- -symmetric ladder (odd class count, mirrored slot
        # counts) — an asymmetric one traps VUMPS in biased stationary
        # points 1e-2 above the ground state (measured on XXZ Delta=2)
        pos = sorted((q for q in weights if q > 0),
                     key=lambda q: (-weights[q], q))
        n_pairs = min(len(pos), (cap - 1) // 2, (bond_dim - 1) // 2)
        while True:
            groups = [(0, weights[0], 1)] + [
                (q, 2 * weights[q], 2) for q in pos[:n_pairs]]
            total_w = sum(g[1] for g in groups)
            alloc = {q: mult for q, _, mult in groups}
            rest = bond_dim - sum(alloc.values())
            fracs = []
            for q, wgt, mult in groups:
                share = rest * wgt / total_w
                units = int(share // mult)
                alloc[q] += units * mult   # pairs stay mirrored
                fracs.append((share - units * mult, q, mult))
            leftover = bond_dim - sum(alloc.values())
            for _, q, mult in sorted(fracs, reverse=True):
                if leftover >= mult:
                    alloc[q] += mult
                    leftover -= mult
            alloc[0] += leftover           # odd slot: center class
            # singleton-per-sign edge classes trap VUMPS in biased
            # stationary points (measured: 2e-2 high on XXZ Delta=2);
            # drop the thinnest pair and reallocate until every kept
            # class holds >= 2 slots per sign
            if n_pairs > 1 and (alloc[0] < 2 or min(
                    alloc[q] for q in pos[:n_pairs]) < 4):
                n_pairs -= 1
                continue
            break
        slots = []
        for q, n in alloc.items():
            if q == 0:
                slots.extend([0] * n)
            else:
                slots.extend([q] * (n // 2) + [-q] * (n // 2))
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
        slots = []
        for q in sorted(alloc):
            slots.extend([q] * alloc[q])
    slots = sorted(slots)[:bond_dim]
    arr = np.full((bond_dim,), _DEAD_VALUE, np.int64)
    arr[: len(slots)] = slots
    return arr


def u1_uniform_sector(phys_charges, bond_dim, charges=None,
                      dtype=jnp.float64):
    """Masks and class selectors for a charge-masked uniform MPS.

    Args:
        phys_charges: the CELL's per-physical-state charges (fold
            charge-alternating cells first — module docstring).
        charges: optional explicit ``(bond_dim,)`` ladder (dead slots =
            sentinel); default :func:`u1_uniform_charges`.

    Returns a dict: ``charges``, ``site_mask (d, D, D)``, ``bond_mask
    (D, D)``, and the per-class selectors ``row_sel / rowT_sel
    (C, d*D)`` and ``slot_sel (C, D)`` used by the aligned gauge
    algebra (row index ``s * D + i`` — the ``reshape(d * D, D)``
    layout of the gauge matrices).
    """
    phys = [int(p) for p in phys_charges]
    d = len(phys)
    q = (np.asarray(charges, np.int64) if charges is not None
         else u1_uniform_charges(phys, bond_dim))
    if q.shape != (bond_dim,):
        raise ValueError(f"charges must be ({bond_dim},), got {q.shape}")
    live = q != _DEAD_VALUE
    site_mask = np.zeros((d, bond_dim, bond_dim))
    for s, p in enumerate(phys):
        site_mask[s] = ((q[:, None] + p == q[None, :])
                        & live[:, None] & live[None, :])
    bond_mask = ((q[:, None] == q[None, :])
                 & live[:, None] & live[None, :])
    classes = sorted({int(c) for c in q[live]})
    n_cls = max(len(classes), 1)
    row_sel = np.zeros((n_cls, d * bond_dim))
    row_t_sel = np.zeros((n_cls, d * bond_dim))
    slot_sel = np.zeros((n_cls, bond_dim))
    for ci, c in enumerate(classes):
        for s, p in enumerate(phys):
            row_sel[ci, s * bond_dim:(s + 1) * bond_dim] = (
                live & (q + p == c))
            row_t_sel[ci, s * bond_dim:(s + 1) * bond_dim] = (
                live & (q - p == c))
        slot_sel[ci] = live & (q == c)
    return {
        "charges": q,
        "phys_charges": tuple(phys),
        "bond_dim": int(bond_dim),
        "site_mask": jnp.asarray(site_mask, dtype),
        "bond_mask": jnp.asarray(bond_mask, dtype),
        "row_sel": jnp.asarray(row_sel),
        "row_t_sel": jnp.asarray(row_t_sel),
        "slot_sel": jnp.asarray(slot_sel),
    }


def _aligned_polar(m, row_sel, col_sel):
    """Class-pure polar factor of a block-structured matrix.

    Per charge class: SVD of the class block (full static shape; rows
    and columns outside the class are zero), accumulate ``U_c V_c^H``
    with numerically-null singular directions zeroed outright.  The
    sum over classes is the polar isometry of the whole matrix
    restricted to its block structure — dead and rank-deficient
    directions carry exact zeros instead of LAPACK's arbitrary
    orthonormal completions (which would leak charge; see
    ``u1._aligned_ortho``).
    """
    dt = m.dtype
    rdt = jnp.zeros((), dt).real.dtype
    acc = jnp.zeros(m.shape, dt)
    for ci in range(row_sel.shape[0]):  # static, small
        sub = (m * row_sel[ci][:, None].astype(dt)
               * col_sel[ci][None, :].astype(dt))
        u, s, vh = jnp.linalg.svd(sub, full_matrices=False)
        keep = (s > 1e-13 * jnp.maximum(s[0], 1e-300)).astype(rdt)
        acc = acc + peinsum("ij,jk->ik",
                            u * keep[None, :].astype(dt), vh)
    return acc


def expand_sector_state(result, bond_dim, charges=None, noise=1e-6,
                        key=None):
    """Embed a converged :func:`vumps_u1` state into a larger ladder.

    Slots map by CHARGE CLASS (old slots of class ``c`` onto the first
    new slots of class ``c``; every old class must still exist with at
    least its old multiplicity), fresh slots receive masked noise of
    relative size ``noise`` so the enlarged directions join the
    optimization.  This is the warm start for bond growth — random
    inits on ladders with thin outer classes land in biased stationary
    points (measured 4e-3..2e-2 high on XXZ Delta=2 at D=32), while
    growing from a converged smaller-D state walks straight down.

    Returns an ``init`` dict for :func:`vumps_u1`.
    """
    old_sec = result["sector"]
    oq = np.asarray(old_sec["charges"])
    phys = old_sec["phys_charges"]
    new_sec = u1_uniform_sector(phys, bond_dim, charges=charges,
                                dtype=result["c"].dtype)
    nq = np.asarray(new_sec["charges"])
    d_old = int(old_sec["bond_dim"])
    idx = np.zeros((d_old,), np.int64)
    used = np.zeros((bond_dim,), bool)
    for i, c in enumerate(oq):
        if c == _DEAD_VALUE:
            continue
        free = [j for j in np.nonzero(nq == c)[0] if not used[j]]
        if not free:
            raise ValueError(
                f"new ladder lacks room for old charge {int(c)}")
        idx[i] = free[0]
        used[free[0]] = True
    live_old = oq != _DEAD_VALUE

    def embed2(m):
        out = jnp.zeros((bond_dim, bond_dim), m.dtype)
        return out.at[jnp.ix_(idx[live_old], idx[live_old])].set(
            m[jnp.ix_(*(np.nonzero(live_old)[0],) * 2)])

    def embed3(t):
        out = jnp.zeros((t.shape[0], bond_dim, bond_dim), t.dtype)
        sel = np.nonzero(live_old)[0]
        return out.at[:, idx[sel][:, None], idx[sel][None, :]].set(
            t[:, sel[:, None], sel[None, :]])

    key = key if key is not None else jax.random.PRNGKey(7)
    kc, ka = jax.random.split(key)
    c0 = embed2(result["c"]) + noise * new_sec["bond_mask"] * (
        jax.random.normal(kc, (bond_dim, bond_dim), result["c"].dtype))
    ac0 = embed3(result["ac"]) + noise * new_sec["site_mask"] * (
        jax.random.normal(
            ka, (result["ac"].shape[0], bond_dim, bond_dim),
            result["ac"].dtype))
    al0 = embed3(result["al"])
    ar0 = embed3(result["ar"])
    return {"al": al0, "ar": ar0, "ac": ac0, "c": c0,
            "sector": new_sec}


@partial(jax.jit, static_argnums=(3,))
def _solve_ac_u1(fl, w, fr, iters, mask, ac):
    return lanczos_ground(
        lambda t: mask * _h_ac(fl, w, fr, t), ac, iters)


@partial(jax.jit, static_argnums=(2,))
def _solve_c_u1(fl, fr, iters, mask, c):
    return lanczos_ground(lambda t: mask * _h_c(fl, fr, t), c, iters)


@jax.jit
def _gauge_update_u1(ac, c, site_mask, row_sel, row_t_sel, slot_sel):
    """Masked Zauner-Stauber gauge update: ``AL = polar(AC)
    polar(C)^H`` (AR mirrored) with every polar factor charge-aligned,
    then mask-scrubbed to exact zeros."""
    d_, bond = ac.shape[0], ac.shape[1]
    pol_c = _aligned_polar(c, slot_sel, slot_sel)
    al = peinsum(
        "ij,kj->ik",
        _aligned_polar(ac.reshape(d_ * bond, bond), row_sel, slot_sel),
        jnp.conj(pol_c),
    ).reshape(d_, bond, bond) * site_mask
    ar_mat = _aligned_polar(
        ac.transpose(0, 2, 1).reshape(d_ * bond, bond),
        row_t_sel, slot_sel)
    cr = _aligned_polar(c.T, slot_sel, slot_sel)
    ar = peinsum("ij,kj->ik", ar_mat, jnp.conj(cr)).reshape(
        d_, bond, bond).transpose(0, 2, 1) * site_mask
    grad = jnp.linalg.norm(ac - peinsum("dij,jk->dik", al, c))
    return al, ar, grad


def excitation_charge_masks(sector, delta_q):
    """``(d, D, D)`` 0/1 mask of tangent directions carrying EXACT
    excitation charge ``delta_q``: ``B[s, i, j]`` lives in the sector
    when ``q[i] + p_s - q[j] == delta_q`` (the right half of the chain
    keeps its ground labels, so the insertion adds ``delta_q`` to the
    state's total charge)."""
    q = np.asarray(sector["charges"])
    phys = sector["phys_charges"]
    live = q != _DEAD_VALUE
    d, bond = len(phys), q.shape[0]
    m = np.zeros((d, bond, bond))
    for s, p in enumerate(phys):
        m[s] = ((q[:, None] + int(p) - q[None, :] == int(delta_q))
                & live[:, None] & live[None, :])
    return jnp.asarray(m)


def sector_excitation_minimum(ground, mpo_cell, delta_q, k, iters=60,
                              tol=1e-8, prep=None, key=None):
    """Lowest tangent-space excitation energy at momentum ``k``
    carrying EXACT charge offset ``delta_q`` above a masked VUMPS
    ground state.

    Charged bands are where the masks earn their keep: the plain
    spectrum mixes every sector, while here the Lanczos matvec
    composes the momentum-``k`` effective Hamiltonian
    (:func:`~contractn_tpu.models.excitations._excitation_envs` — the
    machinery is unchanged) with the left-tangent-gauge projector
    ``B - AL (AL^H B)`` and the :func:`excitation_charge_masks`
    sector mask.  Both commute with the exact ``H_eff`` on a masked
    ground state (each entry of ``AL^H B`` receives exactly ONE charge
    component, so the gauge constraint splits per sector), so the
    iteration stays in the sector structurally and the restriction
    stays Hermitian.  Energies are relative to the ground state
    (``lam0``-referenced like the unmasked spectrum); they can be
    NEGATIVE for charged sectors when the sector ground sits above
    the grand minimum (e.g. electron removal from ``U n n`` at
    ``mu = 0``).

    Returns ``(energy, b_tensor)``.
    """
    from .excitations import _excitation_envs, prepare_excitations

    p = prep if prep is not None else prepare_excitations(
        ground, mpo_cell, tol=tol)
    sector = ground["sector"]
    qmask = excitation_charge_masks(sector, delta_q)
    al, ar, c, w = p["al"], p["ar"], p["c"], p["w"]
    fl, fr = p["fl"], p["fr"]
    d, bond = al.shape[0], al.shape[1]
    al_mat = al.reshape(d * bond, bond)
    # the tangent norm identity <Phi(B), Phi(B)> = <B, B> needs the
    # chain LEFT of B to close with sum AL^H AL = 1 and the chain
    # RIGHT of B with sum AR AR^H = 1.  The aligned polar keeps both
    # as PARTIAL isometries (dropped null directions are exact zeros),
    # so B must avoid their dead ranges: a B feeding a zero row of AR
    # yields a (near-)zero STATE at unit <B, B>, and its Rayleigh
    # quotient deflates to a spurious sub-band value (measured 0.04
    # vs the exact 0.5 band bottom on the dimerized free chain).
    live_l = jnp.real(peinsum("sji,sjk->ik", jnp.conj(al), al)
                      ).diagonal() > 0.5
    live_r = jnp.real(peinsum("sij,skj->ik", ar, jnp.conj(ar))
                      ).diagonal() > 0.5
    qmask = qmask * live_l[None, :, None] * live_r[None, None, :]
    if float(qmask.sum()) == 0.0:
        raise ValueError(
            f"no live tangent directions carry charge {delta_q} on "
            "this ladder — widen it or pick a reachable offset")
    qmask = qmask.astype(p["cdt"])
    kc = jnp.asarray(float(k), p["cdt"])

    def project(b):
        m = b.reshape(d * bond, bond)
        ov = peinsum("ji,jk->ik", jnp.conj(al_mat), m)
        m = m - peinsum("ij,jk->ik", al_mat, ov)
        return m.reshape(d, bond, bond) * qmask

    def matvec(b):
        lb, rb = _excitation_envs(al, ar, c, fl, fr, w, b, kc,
                                  p["is_zero"], p["eye_diag"], tol=tol)
        out = _h_ac(fl, w, fr, b)
        out = out + _h_ac(lb, w, fr, ar)
        out = out + _h_ac(fl, w, rb, al)
        return project(out)

    key = key if key is not None else jax.random.PRNGKey(0)
    kr_, ki_ = jax.random.split(key)
    b0 = (jax.random.normal(kr_, (d, bond, bond))
          + 1j * jax.random.normal(ki_, (d, bond, bond))).astype(
        p["cdt"])
    b0 = project(b0 * qmask)
    # project= is ESSENTIAL: the gauge projector is dense, so its
    # eps-relative residuals in the Krylov rows are re-injected by the
    # Gram-Schmidt subtraction and grow geometrically (measured x3 per
    # step) — without per-iteration re-projection the Rayleigh
    # quotients deflate BELOW the true band (0.08 vs the exact 0.5 on
    # the dimerized free chain).  See lanczos_basis's docstring.
    energy, vec = jax.jit(
        lambda v: lanczos_ground(matvec, v, iters, project=project))(b0)
    return jnp.real(energy - p["lam0"]), vec


def vumps_u1(mpo_cell, bond_dim, phys_charges, iters=60,
             dtype=jnp.float64, lanczos_iters=40, key=None, tol=1e-12,
             charges=None, init=None):
    """Infinite-chain ground state confined EXACTLY to a U(1)-invariant
    uniform-MPS manifold (zero-density sector by default).

    Args:
        mpo_cell: triangular MPO whose ``cores[0]`` is the repeated
            bulk cell — channel-charge-definiteness under
            ``phys_charges`` is verified on a 3-cell repetition.
        phys_charges: the cell's physical charges; must preserve a
            translation-invariant bond ladder (module docstring —
            fold ``+-1`` cells with ``block_mpo`` first).
        charges: optional explicit bond ladder.
        init: optional warm start — a :func:`expand_sector_state`
            bundle (or a previous result at the SAME ladder).  Bond
            growth should always warm-start: cold inits on ladders
            with thin outer classes hit biased stationary points.

    Returns the :func:`~contractn_tpu.models.vumps.vumps` result dict
    plus ``sector`` (the mask bundle); ``al/ar/ac`` satisfy ``a * (1 -
    site_mask) == 0`` identically.
    """
    w = jnp.asarray(mpo_cell.cores[0], dtype)
    d = w.shape[0]
    phys = _per_site(phys_charges, 1)[0]
    if len(phys) != d:
        raise ValueError(
            f"phys_charges has {len(phys)} entries for phys dim {d}")
    rep = MPO(jnp.broadcast_to(w, (3,) + w.shape), mpo_cell.left,
              mpo_cell.right)
    mpo_channel_charges(rep, phys)  # raises if not definite
    if init is not None:
        sector = init["sector"]
        if int(sector["bond_dim"]) != int(bond_dim):
            raise ValueError(
                f"init bundle is for bond {sector['bond_dim']}, "
                f"requested {bond_dim}")
        site_mask = sector["site_mask"]
        bond_mask = sector["bond_mask"]
        al, ar = init["al"], init["ar"]
        c, ac = init["c"], init["ac"]
        # re-isometrize the warm start (noise perturbs the gauge)
        al, ar, _ = _gauge_update_u1(
            ac, c, site_mask, sector["row_sel"], sector["row_t_sel"],
            sector["slot_sel"])
    else:
        sector = u1_uniform_sector(phys, bond_dim, charges=charges,
                                   dtype=dtype)
        site_mask = sector["site_mask"]
        bond_mask = sector["bond_mask"]
        key = key if key is not None else jax.random.PRNGKey(0)
        a0 = jax.random.normal(key, (d, bond_dim, bond_dim), dtype)
        a0 = a0 * site_mask
        # masked mixed-gauge init: aligned orthogonalizations give
        # class-pure partial isometries; C = the live-slot identity
        al_q, _ = _aligned_ortho(a0.reshape(d * bond_dim, bond_dim),
                                 sector["row_sel"], sector["slot_sel"])
        al = al_q.reshape(d, bond_dim, bond_dim) * site_mask
        ar_q, _ = _aligned_ortho(
            a0.transpose(0, 2, 1).reshape(d * bond_dim, bond_dim),
            sector["row_t_sel"], sector["slot_sel"])
        ar = ar_q.reshape(d, bond_dim, bond_dim).transpose(0, 2, 1)
        ar = ar * site_mask
        live = jnp.asarray(
            (sector["charges"] != _DEAD_VALUE).astype(np.float64),
            dtype)
        c = jnp.diag(live) / jnp.sqrt(jnp.sum(live))
        ac = peinsum("dij,jk->dik", al, c) * site_mask

    energies = []
    grad_norm = np.inf
    for _ in range(int(iters)):
        fl, fr, energy = mpo_environments(al, ar, c, w, tol=tol)
        _, ac = _solve_ac_u1(fl, w, fr, lanczos_iters, site_mask, ac)
        _, c = _solve_c_u1(fl, fr, lanczos_iters, bond_mask, c)
        al, ar, grad = _gauge_update_u1(
            ac, c, site_mask, sector["row_sel"], sector["row_t_sel"],
            sector["slot_sel"])
        grad_norm = float(grad)
        energies.append(float(energy))
        if grad_norm < 1e-11:
            break

    return {
        "al": al, "ar": ar, "ac": ac, "c": c,
        "energy": energies[-1], "energies": energies,
        "gradient_norm": grad_norm, "sector": sector,
    }
