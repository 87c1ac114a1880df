"""Charge-masked exact-U(1) cores: symmetry as static block masks.

Exact total-charge (e.g. total ``S^z``) conservation for DMRG on TPU,
designed the static-shape way: instead of ragged charge-sector blocks
(dynamic shapes XLA cannot tile), every bond index carries a STATIC
charge label and every site tensor is multiplied by a 0/1 mask

    ``mask[n][s, i, j] = [q_bond[n][i] + q_phys[s] == q_bond[n+1][j]]``

so the dense ``(N, d, D, D)`` stacked-core machinery — scans, vmap,
shard_map, the uniform DMRG sweep — runs unchanged while the state
lives EXACTLY in one U(1) sector (a nonzero masked MPS contracted with
the ``e_0`` boundary vectors has total charge ``q_bond[N][0] -
q_bond[0][0]`` by construction, independent of the tensor values).

Exactness argument (see ``_dmrg_uniform_core``'s ``masks`` hook): with
a channel-charge-definite MPO (:func:`mpo_channel_charges` verifies;
:func:`xxz_mpo_u1` provides the XXZ chain in the S+/S- channel basis),
the two-site effective Hamiltonian maps the masked subspace into
itself, so Lanczos never leaves the sector; the SVD of the block-
structured theta has singular vectors supported on single charge blocks
except at exact cross-block degeneracies, and re-applying the masks
after each split removes exactly that mixing.

Versus the penalty method (:func:`~contractn_tpu.models.dmrg.
dmrg_sector`): the penalty optimizes ``H + lam (S^z - q)^2`` through an
``mpo_sum`` of width ``W_H + 3`` and conserves the sector only
energetically (a ~1e-x residual); the masks conserve it structurally
(``cores * (1 - mask) == 0`` identically) at the plain Hamiltonian's
width ``W_H`` — strictly cheaper per Heff matvec (cost is linear in
``W``) and exact.

No counterpart in the reference (no symmetries, no optimizer).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dmrg import _SZ
from .ensemble import _dmrg_uniform_core
from .mps import MPS
from .mpo import MPO

# sentinel charge for unassigned bond slots (never matches a real charge)
_DEAD_VALUE = np.int64(2 ** 40)


def _per_site(phys_charges, n_sites):
    """Normalize ``phys_charges`` to one int list per site.

    A flat sequence of ints means every site carries the same charges
    (the original uniform API); a sequence of sequences gives each site
    its own — e.g. the spin-orbital Hubbard chain, where up and down
    orbitals alternate PACKED charges (``models.hubbard.
    hubbard_phys_charges``).  All sites must share the physical
    dimension (static shapes).
    """
    seq = list(phys_charges)
    if seq and hasattr(seq[0], "__len__"):
        if len(seq) != n_sites:
            raise ValueError(
                f"per-site phys_charges has {len(seq)} entries for "
                f"{n_sites} sites")
        out = [[int(p) for p in site] for site in seq]
        if len({len(s) for s in out}) != 1:
            raise ValueError("all sites must share the physical dim")
        return out
    return [[int(p) for p in seq]] * n_sites


def u1_bond_charges(n_sites, phys_charges, total_charge, bond_dim):
    """Assign a static charge label to every slot of every bond.

    ``phys_charges`` is either one int per physical state (uniform
    chains) or one int list PER SITE (see :func:`_per_site`) — the
    latter also encodes several independent U(1) charges at once by
    packing them into disjoint integer ranges (e.g. ``N_up * A +
    N_dn`` with ``A`` exceeding the maximal ``N_dn``; see
    :func:`~contractn_tpu.models.hubbard.hubbard_phys_charges`).

    Bond ``n``'s allowed charges are the intersection of forward
    reachability (partial sums of ``phys_charges`` over sites ``< n``)
    and backward consistency (``total_charge`` minus partial sums over
    sites ``>= n``); the ``bond_dim`` slots are split among them
    proportionally to the number of lattice paths through each charge
    (forward count x backward count — the same heuristic as dense-spin
    Hilbert-space dimensions), largest-remainder rounded, at least one
    slot per kept charge.  Bond 0 is ``[0]``, bond N ``[total_charge]``.

    Returns:
        ``charges``: list of ``n_sites + 1`` numpy int arrays of length
        ``bond_dim``; dead (unassigned) slots hold ``_DEAD_VALUE``
        (:func:`u1_masks` excludes them from every block).
    """
    phys = _per_site(phys_charges, n_sites)
    fwd = [{0: 1}]
    for n in range(n_sites):
        nxt = {}
        for q, c in fwd[-1].items():
            for p in phys[n]:
                nxt[q + p] = nxt.get(q + p, 0) + c
        fwd.append(nxt)
    bwd = [{int(total_charge): 1}]
    for n in range(n_sites - 1, -1, -1):
        nxt = {}
        for q, c in bwd[-1].items():
            for p in phys[n]:
                nxt[q - p] = nxt.get(q - p, 0) + c
        bwd.append(nxt)
    bwd = bwd[::-1]

    charges = []
    for n in range(n_sites + 1):
        weights = {
            q: fwd[n][q] * bwd[n][q]
            for q in fwd[n]
            if q in bwd[n]
        }
        if not weights:
            raise ValueError(
                f"total charge {total_charge} unreachable with "
                f"phys_charges {phys_charges} on {n_sites} sites"
            )
        qs = sorted(weights, key=lambda q: (-weights[q], q))[:bond_dim]
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
        slots = slots[:bond_dim]
        arr = np.full((bond_dim,), _DEAD_VALUE, np.int64)
        arr[: len(slots)] = slots
        # bond 0 / bond N: put the unique boundary charge in slot 0
        # (the e_0 boundary convention of the uniform sweep)
        charges.append(arr)
    charges[0] = np.full((bond_dim,), _DEAD_VALUE, np.int64)
    charges[0][0] = 0
    charges[-1] = np.full((bond_dim,), _DEAD_VALUE, np.int64)
    charges[-1][0] = int(total_charge)
    return charges


def u1_masks(bond_charges, phys_charges, dtype=jnp.float64):
    """``(N, d, D, D)`` 0/1 masks from per-bond charge labels."""
    n_sites = len(bond_charges) - 1
    phys = _per_site(phys_charges, n_sites)
    d = len(phys[0])
    bond = bond_charges[0].shape[0]
    masks = np.zeros((n_sites, d, bond, bond), np.float64)
    for n in range(n_sites):
        qi = bond_charges[n]
        qj = bond_charges[n + 1]
        vi = qi != _DEAD_VALUE
        vj = qj != _DEAD_VALUE
        for s, p in enumerate(phys[n]):
            ok = (qi[:, None] + int(p) == qj[None, :])
            masks[n, s] = ok & vi[:, None] & vj[None, :]
    return jnp.asarray(masks, dtype)


def mpo_channel_charges(mpo, phys_charges):
    """Per-bond, per-channel charge labels of an MPO, or raise.

    A channel assignment ``c (n_sites + 1, W)`` is consistent when
    every nonzero element ``W_n[a, b, w, v]`` satisfies ``c[n][w] -
    c[n + 1][v] = q_phys[n][a] - q_phys[n][b]`` (the operator element
    raises the state's charge by ``q[a] - q[b]``, which the channel
    bookkeeping must absorb).  Such an assignment makes the Heff
    matvec exactly sector-preserving on masked states.  Position-
    dependent cores (:func:`~contractn_tpu.models.fermions2d.
    string_mpo` outputs, the Hubbard MPO) and per-site physical
    charges are supported; MPOs written in mixed bases (e.g. the
    SX / iY channels of :func:`~contractn_tpu.models.dmrg.
    heisenberg_mpo`) have no assignment — rewrite in raising/lowering
    channels (:func:`xxz_mpo_u1`).
    """
    cores = np.asarray(mpo.cores)
    n_sites, d = cores.shape[0], cores.shape[1]
    phys = _per_site(phys_charges, n_sites)
    wdim = cores.shape[-1]
    # per-site charge-transfer table: delta[n][wch, vch] or raise —
    # position-dependent cores (string MPOs) get per-BOND labels
    deltas = np.full((n_sites, wdim, wdim), _DEAD_VALUE, np.int64)
    active = np.zeros((n_sites, wdim, wdim), bool)
    for n in range(n_sites):
        nz = np.nonzero(cores[n])
        seen = {}
        for a, b, wch, vch in zip(*nz):
            dq = phys[n][a] - phys[n][b]
            key = (wch, vch)
            if key in seen and seen[key] != dq:
                raise ValueError(
                    f"site {n} MPO channel pair {key} mixes charge "
                    f"transfers {sorted({seen[key], dq})} — not channel-"
                    "charge-definite; rewrite in raising/lowering "
                    "channels (see xxz_mpo_u1)"
                )
            seen[key] = dq
        for (wch, vch), dq in seen.items():
            deltas[n, wch, vch] = dq
            active[n, wch, vch] = True
    c = [dict() for _ in range(n_sites + 1)]
    for ch in np.nonzero(np.asarray(mpo.left))[0]:
        c[0][int(ch)] = 0
    changed = True
    while changed:  # fixpoint; flows mostly left-to-right, few passes
        changed = False
        for n in range(n_sites):
            for wch, vch in zip(*np.nonzero(active[n])):
                dq = int(deltas[n, wch, vch])
                kw, kv = int(wch) in c[n], int(vch) in c[n + 1]
                if kw and kv:
                    if c[n][wch] - c[n + 1][vch] != dq:
                        raise ValueError(
                            f"inconsistent channel charges at bond "
                            f"{n + 1} channel {vch}: not channel-"
                            "charge-definite"
                        )
                elif kw:
                    c[n + 1][int(vch)] = c[n][wch] - dq
                    changed = True
                elif kv:
                    c[n][int(wch)] = c[n + 1][vch] + dq
                    changed = True
    out = np.zeros((n_sites + 1, wdim), np.int64)
    for b in range(n_sites + 1):
        for i in range(wdim):
            out[b, i] = c[b].get(i, 0)  # disconnected: irrelevant
    return out


def compress_mpo_u1(mpo, phys_charges, cutoff=1e-12, max_bond=None):
    """Charge-blocked MPO compression: SVD WITHIN charge classes.

    A plain :func:`~contractn_tpu.models.canonical.compress_mpo` SVD
    mixes virtual channels of different U(1) charge transfer, silently
    destroying the channel-charge definiteness the masked solvers
    require (observed: every compressed AutoMPO chemistry operator
    failed :func:`mpo_channel_charges`).  Here the channel labels of
    the input (definite by construction for finite-state machines) make
    every bond matrix block-diagonal in charge — rows ``(w, a, b)``
    carry ``c[w] - (q[a] - q[b])``, columns ``v`` carry ``c[v]``, and
    only equal charges connect — so per-class SVDs compress exactly as
    far with NO mixing.  Two passes (left QR-like rank pass, right
    truncating pass, per-bond cutoff relative to the bond's global
    largest singular value), host-side numpy like all MPO setup.

    Returns ``(mpo, bond_charges)`` — the compressed operator (padded
    uniform width; dead padded channels are all-zero and ignored by
    :func:`mpo_channel_charges`) and the live per-bond charge labels
    (list of ``(w_b,)`` int arrays, boundaries included).
    """
    c = mpo_channel_charges(mpo, phys_charges)
    cores_in = np.asarray(mpo.cores)
    n, do, di = cores_in.shape[0], cores_in.shape[1], cores_in.shape[2]
    phys = _per_site(phys_charges, n)
    dq = [np.subtract.outer(np.asarray(p), np.asarray(p))
          for p in phys]  # dq[i][a, b] = q[a] - q[b]

    sites = [cores_in[i] for i in range(n)]
    sites[0] = np.einsum("w,abwv->abv", np.asarray(mpo.left),
                         sites[0])[:, :, None, :]
    sites[-1] = np.einsum("abwv,v->abw", sites[-1],
                          np.asarray(mpo.right))[:, :, :, None]
    charges = (
        [np.zeros(1, np.int64)]
        + [np.asarray(c[b], np.int64) for b in range(1, n)]
        + [np.zeros(1, np.int64)]
    )

    def blocked_split(a, cl, cr, dqi, trunc):
        """Factor ``a (do, di, L, R) = Q R`` per class; returns
        ``(q_core, r_blocks, new_charges)`` with ``q_core`` left-
        isometric per class.  ``trunc``: (cutoff, max_bond) or None."""
        row_q = cl[None, None, :] - dqi[:, :, None]  # (do, di, L)
        out_cols, out_charges, r_entries = [], [], []
        svals_all = []
        blocks = []
        for q in np.unique(np.concatenate([row_q.ravel(), cr])):
            rmask = row_q == q
            cidx = np.nonzero(cr == q)[0]
            if cidx.size == 0 or not rmask.any():
                continue
            mat = a[:, :, :, cidx][rmask, :]
            u, s, vh = np.linalg.svd(mat, full_matrices=False)
            blocks.append((q, rmask, cidx, u, s, vh))
            svals_all.append(s)
        if not blocks:
            return None
        smax = max((s[0] for _, _, _, _, s, _ in blocks if s.size),
                   default=0.0)
        keep = []
        for q, rmask, cidx, u, s, vh in blocks:
            k = s.size
            if trunc is not None:
                co, mb = trunc
                k = int(np.sum(s > co * max(smax, 1e-300)))
            k = max(k, 0)
            keep.append((q, rmask, cidx, u[:, :k], s[:k], vh[:k]))
        if trunc is not None and trunc[1] is not None:
            # global top-max_bond across classes
            allpairs = sorted(
                [(s_val, bi, j) for bi, (_, _, _, _, s, _)
                 in enumerate(keep) for j, s_val in enumerate(s)],
                reverse=True,
            )[:trunc[1]]
            counts = {}
            for _, bi, _ in allpairs:
                counts[bi] = counts.get(bi, 0) + 1
            keep = [
                (q, rmask, cidx, u[:, :counts.get(bi, 0)],
                 s[:counts.get(bi, 0)], vh[:counts.get(bi, 0)])
                for bi, (q, rmask, cidx, u, s, vh) in enumerate(keep)
            ]
        keep = [blk for blk in keep if blk[4].size > 0]
        width = sum(blk[4].size for blk in keep)
        if width == 0:
            return None
        q_core = np.zeros(a.shape[:3] + (width,), a.dtype)
        r_mat = np.zeros((width, a.shape[3]), a.dtype)
        new_c = np.zeros(width, np.int64)
        off = 0
        for q, rmask, cidx, u, s, vh in keep:
            k = s.size
            q_core[:, :, :, off:off + k][rmask, :] = u
            r_mat[off:off + k][:, cidx] = s[:, None] * vh
            new_c[off:off + k] = q
            off += k
        return q_core, r_mat, new_c

    # pass 1: left -> right, rank-revealing (no truncation)
    for i in range(n - 1):
        a = sites[i]
        got = blocked_split(a, charges[i], charges[i + 1], dq[i], None)
        if got is None:
            raise ValueError("operator is identically zero")
        q_core, r_mat, new_c = got
        sites[i] = q_core
        sites[i + 1] = np.einsum("kv,abvr->abkr", r_mat, sites[i + 1])
        charges[i + 1] = new_c

    # pass 2: right -> left, truncating (mirror via leg transposes)
    for i in range(n - 1, 0, -1):
        a = sites[i].transpose(0, 1, 3, 2)  # (do, di, R, L)
        got = blocked_split(a, charges[i + 1], charges[i],
                            -dq[i], (cutoff, max_bond))
        if got is None:
            raise ValueError("operator is identically zero")
        q_core, r_mat, new_c = got
        sites[i] = q_core.transpose(0, 1, 3, 2)
        sites[i - 1] = np.einsum("ablv,kv->ablk", sites[i - 1], r_mat)
        charges[i] = new_c

    widths = [s.shape[2] for s in sites] + [1]
    wmax = max(max(widths), 1)
    out = np.zeros((n, do, di, wmax, wmax), cores_in.dtype)
    for i in range(n):
        out[i, :, :, :sites[i].shape[2], :sites[i].shape[3]] = sites[i]
    left = np.zeros(wmax, cores_in.dtype)
    left[0] = 1.0
    right = np.zeros(wmax, cores_in.dtype)
    right[0] = 1.0
    return (
        MPO(jnp.asarray(out), jnp.asarray(left), jnp.asarray(right)),
        charges,
    )


def xxz_mpo_u1(n_sites, jx=1.0, jz=1.0, dtype=jnp.float64):
    """XXZ chain ``H = sum Jx (XX + YY) + Jz ZZ`` in S+/S- channels.

    Same Hamiltonian as :func:`~contractn_tpu.models.dmrg.
    heisenberg_mpo` (pinned by the tests), but each of the five
    channels carries a definite U(1) charge (``[0, -2, +2, 0, 0]`` in
    ``2 S^z`` units), which the masked DMRG requires.  All-real:
    ``XX + YY = 2 (S^+ S^- + S^- S^+)`` with real ``S^+ = [[0, 1],
    [0, 0]]``.
    """
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    w = np.zeros((2, 2, 5, 5))
    w[:, :, 0, 0] = np.eye(2)
    w[:, :, 4, 4] = np.eye(2)
    w[:, :, 0, 1] = sp
    w[:, :, 1, 4] = 2.0 * jx * sm
    w[:, :, 0, 2] = sm
    w[:, :, 2, 4] = 2.0 * jx * sp
    w[:, :, 0, 3] = _SZ
    w[:, :, 3, 4] = jz * _SZ
    cores = jnp.asarray(np.broadcast_to(w, (n_sites, 2, 2, 5, 5)), dtype)
    left = jnp.asarray(np.array([1.0, 0, 0, 0, 0]), dtype)
    right = jnp.asarray(np.array([0, 0, 0, 0, 1.0]), dtype)
    return MPO(cores, left, right)


def random_masked_mps(key, masks, dtype=jnp.float64):
    """Random MPS supported exactly on the masked (fixed-sector) blocks."""
    n, d, bond, _ = masks.shape
    cores = jax.random.normal(key, (n, d, bond, bond), dtype)
    cores = cores * masks.astype(dtype)
    e0 = jnp.zeros((bond,), dtype).at[0].set(1.0)
    return MPS(cores, e0, e0)


def determinant_mps_u1(occupations, bond_charges, phys_charges,
                       key=None, noise=1e-2, dtype=jnp.float64):
    """Masked MPS seeded on a product determinant's charge walk.

    Random masked inits can stick on in-sector excited states when the
    two-site masked updates lack a connecting path (observed: the H2
    chemistry sector ground reached from only 1 of 4 random seeds, the
    other 3 converging to the degenerate triplet).  Seeding the
    amplitude 1 walk of a physical determinant — each site's occupied
    state bridging the accumulated-charge slots — puts the optimizer
    in the right basin; ``noise`` (masked, so the sector stays exact)
    keeps the local Lanczos solves from starting rank-deficient.
    """
    occ = np.asarray(occupations, int)
    n = occ.shape[0]
    phys = _per_site(phys_charges, n)
    masks = u1_masks(bond_charges, phys_charges, dtype=dtype)
    bond = masks.shape[-1]
    cores = np.zeros((n, masks.shape[1], bond, bond))
    q = 0
    slot_prev = int(np.nonzero(np.asarray(bond_charges[0]) == 0)[0][0])
    for i in range(n):
        q_next = q + int(phys[i][occ[i]])
        nxt = np.nonzero(np.asarray(bond_charges[i + 1]) == q_next)[0]
        if nxt.size == 0:
            raise ValueError(
                f"determinant leaves the sector ladder at bond {i + 1} "
                f"(charge {q_next} unallocated — raise bond_dim)"
            )
        slot = int(nxt[0])
        cores[i, occ[i], slot_prev, slot] = 1.0
        q, slot_prev = q_next, slot
    key = key if key is not None else jax.random.PRNGKey(0)
    out = jnp.asarray(cores, dtype)
    if noise:
        out = out + noise * jax.random.normal(
            key, out.shape, dtype) * masks
    e0 = jnp.zeros((bond,), dtype).at[0].set(1.0)
    return MPS(out, e0, e0)


def _split_masks(bond_charges, phys_charges):
    """Static per-bond charge-class selectors for the aligned split.

    For every two-site update at left site ``i`` (middle bond
    ``i + 1``) and every GLOBAL charge class ``c`` (the union of all
    mid-bond charges, a small static set):

    * ``row (n-1, C, d*D)``: rows ``(s1, l)`` of the theta matrix whose
      left-plus-phys charge is class ``c``;
    * ``col (n-1, C, d*D)``: columns ``(s2, r)`` whose right-minus-phys
      charge is class ``c``;
    * ``slot (n-1, C, D)``: mid-bond slots labeled ``c``.
    """
    n_bonds = len(bond_charges) - 1
    phys = _per_site(phys_charges, n_bonds)
    d = len(phys[0])
    bond = bond_charges[0].shape[0]
    classes = sorted({
        int(q) for qc in bond_charges[1:-1] for q in qc
        if q != _DEAD_VALUE
    })
    n_cls = max(len(classes), 1)
    row = np.zeros((n_bonds - 1, n_cls, d * bond))
    col = np.zeros((n_bonds - 1, n_cls, d * bond))
    slot = np.zeros((n_bonds - 1, n_cls, bond))
    for i in range(n_bonds - 1):
        ql, qm, qr = (bond_charges[i], bond_charges[i + 1],
                      bond_charges[i + 2])
        for ci, c in enumerate(classes):
            for s_idx in range(d):
                pl, pr = phys[i][s_idx], phys[i + 1][s_idx]
                ok_l = (ql != _DEAD_VALUE) & (ql + pl == c)
                row[i, ci, s_idx * bond:(s_idx + 1) * bond] = ok_l
                ok_r = (qr != _DEAD_VALUE) & (qr - pr == c)
                col[i, ci, s_idx * bond:(s_idx + 1) * bond] = ok_r
            slot[i, ci] = (qm != _DEAD_VALUE) & (qm == c)
    return (jnp.asarray(row), jnp.asarray(col), jnp.asarray(slot))


def _u1_splitter(split_masks, phys_dim, bond):
    """Charge-aligned two-site split (see module docstring).

    One SVD per GLOBAL charge class on the class-masked theta matrix
    (full static shape; rows/cols outside the class are zero, so its
    nonzero singular triplets are exactly the class block's), with each
    class's top singular triplets scattered into that class's static
    mid-bond slots.  ~C times the plain split's SVD cost — the price of
    exact sector structure with fully static shapes.
    """
    row_m, col_m, slot_m = split_masks
    n_cls = row_m.shape[1]

    def splitter(theta, i, to_left):
        d, _, dl, dr = theta.shape
        mat = jnp.transpose(theta, (0, 2, 1, 3)).reshape(d * dl, d * dr)
        dt = mat.dtype
        u_acc = jnp.zeros((d * dl, bond), dt)
        s_acc = jnp.zeros((bond,), jnp.zeros((), dt).real.dtype)
        v_acc = jnp.zeros((bond, d * dr), dt)
        for ci in range(n_cls):  # static, small
            sub = (mat * row_m[i, ci][:, None].astype(dt)
                   * col_m[i, ci][None, :].astype(dt))
            u, sv, vh = jnp.linalg.svd(sub, full_matrices=False)
            sl = slot_m[i, ci]
            # rank of each slot within its class (0-based), gather the
            # class's top singular triplets into its slots
            idx = jnp.clip(jnp.cumsum(sl) - 1, 0, sv.shape[0] - 1
                           ).astype(jnp.int32)
            u_acc = u_acc + u[:, idx] * sl[None, :].astype(dt)
            s_acc = s_acc + sv[idx] * sl.astype(s_acc.dtype)
            v_acc = v_acc + vh[idx] * sl[:, None].astype(dt)
        s_acc = s_acc / jnp.maximum(jnp.linalg.norm(s_acc), 1e-300)
        if to_left:
            t1 = u_acc.reshape(d, dl, bond)
            t2 = (s_acc[:, None].astype(dt) * v_acc).reshape(
                bond, d, dr).transpose(1, 0, 2)
        else:
            t1 = (u_acc * s_acc[None, :].astype(dt)).reshape(
                d, dl, bond)
            t2 = v_acc.reshape(bond, d, dr).transpose(1, 0, 2)
        return t1, t2

    return splitter


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _dmrg_u1_jit(mpo, mps0, masks, split_masks, sweeps, iters,
                 phys_dim, bond):
    splitter = _u1_splitter(split_masks, phys_dim, bond)
    return _dmrg_uniform_core(mpo, mps0, sweeps, iters, masks=masks,
                              splitter=splitter)


def dmrg_u1(mpo, total_charge, bond_dim, phys_charges=(1, -1),
            sweeps=6, lanczos_iters=40, key=None, dtype=jnp.float64,
            mps0=None):
    """Exact-sector ground state by charge-masked uniform DMRG.

    Args:
        mpo: channel-charge-definite Hamiltonian (verified via
            :func:`mpo_channel_charges`; e.g. :func:`xxz_mpo_u1`).
        total_charge: target sector in ``phys_charges`` units (for
            spin-1/2 with the default charges, ``2 S^z_total``).
        bond_dim: optimization bond dimension (slots are split among
            the sector's charges — see :func:`u1_bond_charges`).
        phys_charges: per-physical-state charges.

    Returns:
        ``(mps, energy, energies, masks)`` — the masked ground state
        (``mps.cores * (1 - masks) == 0`` identically), its energy,
        the per-sweep trace, and the masks used.
    """
    n_sites = mpo.n_sites
    phys_dim = len(_per_site(phys_charges, n_sites)[0])
    mpo_channel_charges(mpo, phys_charges)  # raises if not definite
    bond_charges = u1_bond_charges(
        n_sites, phys_charges, total_charge, bond_dim)
    masks = u1_masks(bond_charges, phys_charges, dtype=dtype)
    key = key if key is not None else jax.random.PRNGKey(0)
    if mps0 is None:
        mps0 = random_masked_mps(key, masks, dtype=dtype)
    else:
        # user inits (e.g. determinant warm starts) must respect the
        # sector masks — silently masking would hide caller bugs
        cores = jnp.asarray(mps0.cores, dtype)
        if float(jnp.max(jnp.abs(cores * (1.0 - masks)))) > 0.0:
            raise ValueError(
                "mps0 has support outside the sector masks; build it "
                "on u1_bond_charges/u1_masks (see determinant_mps_u1)"
            )
        mps0 = MPS(cores, jnp.asarray(mps0.left, dtype),
                   jnp.asarray(mps0.right, dtype))
    split_masks = _split_masks(bond_charges, phys_charges)
    mps, energy, energies = _dmrg_u1_jit(
        mpo, mps0, masks, split_masks, int(sweeps), int(lanczos_iters),
        phys_dim, int(bond_dim))
    return mps, energy, energies, masks


# --------------------------------------------------------------------- #
# Charge-masked time evolution (exact-U(1) TDVP)
# --------------------------------------------------------------------- #


def theta_masks_u1(bond_charges, phys_charges):
    """``(N-1, d, d, D, D)`` two-site block masks: allowed when the
    left bond charge plus both physical charges reaches the right bond
    charge (the middle bond is summed out of the block)."""
    n_bonds = len(bond_charges) - 1
    phys = _per_site(phys_charges, n_bonds)
    d = len(phys[0])
    bond = bond_charges[0].shape[0]
    out = np.zeros((n_bonds - 1, d, d, bond, bond))
    for i in range(n_bonds - 1):
        ql, qr = bond_charges[i], bond_charges[i + 2]
        vl = ql != _DEAD_VALUE
        vr = qr != _DEAD_VALUE
        for s1, p1 in enumerate(phys[i]):
            for s2, p2 in enumerate(phys[i + 1]):
                ok = ql[:, None] + int(p1) + int(p2) == qr[None, :]
                out[i, s1, s2] = ok & vl[:, None] & vr[None, :]
    return jnp.asarray(out)


def bond_masks_u1(bond_charges):
    """``(N+1, D, D)`` zero-site (bond-center) masks: slots of equal
    LIVE charge (the block-diagonal structure of the R factors)."""
    bond = bond_charges[0].shape[0]
    out = np.zeros((len(bond_charges), bond, bond))
    for b, q in enumerate(bond_charges):
        v = q != _DEAD_VALUE
        out[b] = (q[:, None] == q[None, :]) & v[:, None] & v[None, :]
    return jnp.asarray(out)


def u1_sector(n_sites, total_charge, bond_dim, phys_charges=(1, -1),
              dtype=jnp.float64):
    """Everything a fixed-sector computation needs, bundled: bond
    charges, site masks, the charge-aligned splitter's static masks,
    and the evolution masks.  Returns a dict (a plain pytree)."""
    bond_charges = u1_bond_charges(
        n_sites, phys_charges, total_charge, bond_dim)
    phys = _per_site(phys_charges, n_sites)
    stored = (tuple(tuple(s) for s in phys)
              if hasattr(list(phys_charges)[0], "__len__")
              else tuple(int(p) for p in phys_charges))
    return {
        "bond_charges": bond_charges,
        "masks": u1_masks(bond_charges, phys_charges, dtype=dtype),
        "split_masks": _split_masks(bond_charges, phys_charges),
        "theta_masks": theta_masks_u1(bond_charges, phys_charges),
        "bond_masks": bond_masks_u1(bond_charges),
        "phys_charges": stored,
        "phys_dim": len(phys[0]),
        "bond_dim": int(bond_dim),
    }


def tdvp_u1(mpo, mps, sector, dt, n_steps, imaginary=False, iters=16):
    """Two-site TDVP evolution confined EXACTLY to one U(1) sector.

    The structural argument is the DMRG one (module docstring): with a
    channel-charge-definite MPO (verified here) the effective
    Hamiltonians preserve the masked subspace, so the masked Krylov
    exponentials equal the unmasked ones up to roundoff — and the masks
    plus the charge-ALIGNED two-site splitter make the conservation
    exact (``cores * (1 - masks) == 0`` identically along the whole
    trajectory, pinned by the tests) where a plain SVD split would
    scramble the mid-bond charge layout and annihilate the state.

    Args:
        mpo: channel-charge-definite Hamiltonian (e.g.
            :func:`xxz_mpo_u1`).
        mps: masked uniform-bond state (e.g. from :func:`dmrg_u1` — a
            quench evolves one Hamiltonian's ground state under
            another).
        sector: :func:`u1_sector` bundle matching ``mps``.
        dt / n_steps / imaginary / iters: as
            :func:`~contractn_tpu.models.tdvp.tdvp_evolve`.

    Returns ``(mps, [energies])``.
    """
    from .tdvp import tdvp_evolve

    mpo_channel_charges(mpo, sector["phys_charges"])
    splitter = _u1_splitter(sector["split_masks"],
                            sector.get("phys_dim",
                                       len(sector["phys_charges"])),
                            sector["bond_dim"])
    return tdvp_evolve(mpo, mps, dt, n_steps, imaginary=imaginary,
                       iters=iters, masks=sector["masks"],
                       theta_masks=sector["theta_masks"],
                       splitter=splitter)


def _aligned_ortho(mat, row_sel, slot_sel):
    """Charge-aligned orthogonalization ``mat = Q C`` with ``Q`` a
    CLASS-PURE partial isometry: per charge class, the SVD of the
    class's rows scattered into the class's static column slots, with
    numerically-zero singular directions zeroed OUTRIGHT.

    This replaces the plain QR in the masked TDVP1 gauge moves.  A
    plain QR fills zero/rank-deficient columns with arbitrary
    orthonormal completions (often unit vectors aliasing LIVE rows);
    masking those columns breaks Q's orthogonality, which corrupts the
    left environments and the zero-site transfer at O(1) — the failure
    mode found (and pinned by tests) when wiring the U(1) masks into
    TDVP1.  Zero junk columns keep the environments exact: a partial
    isometry is the correct tangent-space gauge for a rank-deficient
    state.
    """
    dt = mat.dtype
    rdt = jnp.zeros((), dt).real.dtype
    q_acc = jnp.zeros((mat.shape[0], slot_sel.shape[1]), dt)
    c_acc = jnp.zeros((slot_sel.shape[1], mat.shape[1]), dt)
    for ci in range(row_sel.shape[0]):  # static, small
        # block structure: class-ci rows only couple class-ci columns
        sub = mat * row_sel[ci][:, None].astype(dt)
        u, s, vh = jnp.linalg.svd(sub, full_matrices=False)
        sl = slot_sel[ci]
        idx = jnp.clip(jnp.cumsum(sl) - 1, 0, s.shape[0] - 1
                       ).astype(jnp.int32)
        keep = (s[idx] > 1e-13 * jnp.maximum(s[0], 1e-300)
                ).astype(rdt) * sl.astype(rdt)
        q_acc = q_acc + u[:, idx] * keep[None, :].astype(dt)
        c_acc = c_acc + (s[idx][:, None].astype(dt) * vh[idx]
                         ) * keep[:, None].astype(dt)
    return q_acc, c_acc


def _u1_orth(split_masks):
    """(fwd, bwd) gauge movers for the masked TDVP1 sweeps.

    ``fwd(mat, i)``: site ``i``'s ``(d Dl, Dr)`` matrix -> ``(Q, C)``
    over bond ``i+1``'s slots.  ``bwd(matT, i)``: the transposed
    ``(d Dr, Dl)`` matrix of site ``i`` -> ``(Q, C)`` over bond ``i``'s
    slots (the caller transposes back).
    """
    row_m, col_m, slot_m = split_masks

    def fwd(mat, i):
        return _aligned_ortho(mat, row_m[i], slot_m[i])

    def bwd(mat_t, i):
        return _aligned_ortho(mat_t, col_m[i - 1], slot_m[i - 1])

    return fwd, bwd


def tdvp1_u1(mpo, mps, sector, dt, n_steps, imaginary=False, iters=16):
    """Single-site TDVP in a fixed U(1) sector (exact manifold, fixed
    bond): the masked variant of
    :func:`~contractn_tpu.models.tdvp.tdvp1_evolve` — see
    :func:`tdvp_u1` for the conservation argument.  The gauge moves use
    the charge-aligned partial-isometry orthogonalizer
    (:func:`_aligned_ortho`) instead of plain QR — see its docstring
    for why plain QR plus masking corrupts the evolution.  Returns
    ``(mps, [energies])``."""
    from .tdvp import tdvp1_evolve

    mpo_channel_charges(mpo, sector["phys_charges"])
    return tdvp1_evolve(mpo, mps, dt, n_steps, imaginary=imaginary,
                        iters=iters, masks=sector["masks"],
                        bond_masks=sector["bond_masks"],
                        orth=_u1_orth(sector["split_masks"]))


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _dmrg_u1_ensemble_jit(mpos, mps0s, masks, split_masks, sweeps,
                          iters, phys_dim, bond):
    splitter = _u1_splitter(split_masks, phys_dim, bond)
    return jax.vmap(
        lambda m, s: _dmrg_uniform_core(m, s, sweeps, iters,
                                        masks=masks, splitter=splitter)
    )(mpos, mps0s)


def dmrg_u1_ensemble(mpos, total_charge, bond_dim, phys_charges=(1, -1),
                     sweeps=6, lanczos_iters=40, key=None,
                     dtype=jnp.float64):
    """Exact-sector ground states for a BATCH of Hamiltonians at once.

    The charge masks and the aligned splitter depend only on the sector
    and lattice (not the Hamiltonian), so a coupling scan — e.g.
    ``stack_pytrees([xxz_mpo_u1(n, jz=jz) for jz in jzs])`` — shares
    ONE mask set and runs as one vmapped XLA program, exactly like
    :func:`~contractn_tpu.models.ensemble.dmrg_ensemble` but conserving
    the sector structurally.  All MPOs must be channel-charge-definite
    with the same lattice size.

    Returns ``(mpss, energies, traces, masks)`` with leading axis K.
    """
    n_sites = int(mpos.cores.shape[1])
    k_batch = int(mpos.cores.shape[0])
    if k_batch < 1:
        raise ValueError("empty ensemble")
    # verify charge-definiteness on the first MPO (shared structure)
    first = jax.tree_util.tree_map(lambda x: x[0], mpos)
    phys_dim = len(_per_site(phys_charges, n_sites)[0])
    mpo_channel_charges(first, phys_charges)
    bond_charges = u1_bond_charges(
        n_sites, phys_charges, total_charge, bond_dim)
    masks = u1_masks(bond_charges, phys_charges, dtype=dtype)
    split_masks = _split_masks(bond_charges, phys_charges)
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, k_batch)
    mps0s = jax.vmap(
        lambda kk: random_masked_mps(kk, masks, dtype=dtype)
    )(keys)
    mpss, energies, traces = _dmrg_u1_ensemble_jit(
        mpos, mps0s, masks, split_masks, int(sweeps),
        int(lanczos_iters), phys_dim, int(bond_dim))
    return mpss, energies, traces, masks
