"""BP gauging: the Vidal gauge on arbitrary graph states.

:mod:`contractn_tpu.compiler.bp` passes vector messages on a *closed*
network.  A quantum state is an *open* network (dangling physical
legs); its norm network is the doubled layer ``T (x) conj(T)`` with the
physical legs traced, and BP on that network carries one ``chi x chi``
PSD matrix message per bond direction — the Gram matrix of the subtree
state vectors on that side.  From the two opposing Gram matrices the
bond's Schmidt data follows without ever contracting the network:
with roots ``M_a = Y_a^H Y_a`` (so ``X_a = conj(Y_a)`` satisfies
``L_a = U_a X_a`` for an isometry ``U_a``) and the SVD
``X_a X_b^T = U S V^H``, the Schmidt values across the bond are ``S``
and the gauge transforms ``G_a = X_a^{-1} U``, ``G_b = X_b^{-1}
conj(V)`` rotate the two bond modes into the Schmidt basis:
``G_a diag(S) G_b^T = X_a^{-1} (X_a X_b^T) X_b^{-T} = I`` — an exact
telescope for ANY invertible roots, so gauging never changes the state,
on trees *or* loopy graphs.  What the loops change is only the
*meaning* of ``S``: exact Schmidt values on trees (messages are the
true environments), the BP/simple-update approximation otherwise —
precisely the quasi-canonical form used to truncate PEPS and
random-graph states (Tindall & Fishman, SciPost Phys. 15, 222).

TPU-first shape: the doubled network is never built as a TN object —
each node's doubled tensor is one einsum with the physical modes
traced and the virtual pairs fused (a ``chi^2`` bond), and the whole
fixed point reuses :func:`bp._bp_fixed_point`, ONE jitted while_loop.
The per-bond eigh/SVD closures are ``chi x chi`` — negligible next to
the message sweeps.

The reference has no gauging/truncation layer at all (SURVEY.md
section 2: exact einsum only); this extends the same TN container the
TPU way.
"""

import string

import numpy as np

import jax
import jax.numpy as jnp

from ..network import TN
from ..ops.stabilize import dot_precision, peinsum
from ..utils.errors import TNError
from .bp import _bethe_assembly, _bp_fixed_point

_LETTERS = string.ascii_letters


def _doubled_spec(tn):
    """BP spec of the norm (doubled) network of an open TN.

    Returns ``(nodes, dims, tensors, bonds)`` in :mod:`bp`'s spec
    format, where each bond entry is ``(dim, [(node_pos, mode, side),
    (node_pos, mode, side)])`` mapping the doubled edge back to the two
    incident (node, mode) slots of the original network.
    """
    bond_edges = []
    for edge in tn.edges():
        if edge.dangler:
            continue
        if edge.var_dim:
            raise TNError(f"edge {edge.name} has undetermined dimension")
        if edge.name[0] == edge.name[1]:
            raise TNError(
                f"self-loop edge {edge.name}: BP cannot split a trace — "
                "contract it into the node first")
        bond_edges.append(edge)
    edge_index = {e.name: i for i, e in enumerate(bond_edges)}

    nodes = []
    tensors = []
    bonds = [[e.dim, []] for e in bond_edges]
    for pos, node in enumerate(tn.nodes()):
        if node.is_copy:
            raise TNError(
                "bp_gauge/bp_norm need dense tensors on every core; copy "
                f"node '{node.name}' cannot absorb a gauge transform")
        if node.node_type == "input":
            raise TNError(
                "bp_gauge/bp_norm need concrete tensors; input node "
                f"'{node.name}' has none")
        t = jnp.asarray(node.tensor if node.node_type == "dense"
                        else node.base_node.tensor)
        k = t.ndim
        if 2 * k > len(_LETTERS):
            raise TNError(f"node order {k} exceeds the BP symbol budget")
        ket = _LETTERS[:k]
        bra = _LETTERS[k:2 * k]
        out = []
        wiring = []
        spec_bra = list(bra)
        for mode, edge in enumerate(node.edges):
            if edge.dangler:
                spec_bra[mode] = ket[mode]  # trace the physical pair
                continue
            e = edge_index[edge.name]
            side = 0 if edge.name[0] == node.name else 1
            wiring.append((e, 2 * e + (1 - side), 2 * e + side))
            bonds[e][1].append((pos, mode, side))
            out.append(ket[mode] + spec_bra[mode])
        eq = ket + "," + "".join(spec_bra) + "->" + "".join(out)
        dbl = peinsum(eq, t, t.conj())
        fused = tuple(dbl.shape[2 * i] ** 2 for i in range(len(out)))
        nodes.append(("dense", len(tensors), None, None, wiring))
        tensors.append(dbl.reshape(fused))
    dims = [e.dim ** 2 for e in bond_edges]
    return nodes, dims, tensors, bonds


def _run_doubled(tn, tol, max_iter, damping):
    nodes, dims, tensors, bonds = _doubled_spec(tn)

    @jax.jit
    def solve(ts):
        i, delta, msgs = _bp_fixed_point(
            nodes, dims, ts, tol, max_iter, damping)
        phase, log = _bethe_assembly(nodes, msgs, ts)
        return i, delta, msgs, phase, log

    return solve(tuple(tensors)), bonds


def bp_norm(tn, tol=1e-12, max_iter=200, damping=0.0, split_format=True):
    """BP approximation of ``<psi|psi>`` for an open network.

    Exact on trees; the Bethe approximation of the norm otherwise.
    Returns split format ``(mantissa, log)`` by default.
    """
    (_, _, _, phase, log), _ = _run_doubled(tn, tol, max_iter, damping)
    if split_format:
        return phase, log
    return phase * jnp.exp(log)


def _bond_transforms(ma, mb, floor=1e-14):
    """Gauge transforms and Schmidt values of one bond.

    ``ma``/``mb`` are the two opposing Gram-matrix messages, index
    order ``(ket, bra)``.  Eigendirections below ``floor`` (relative)
    are null directions of the subtree Gram matrix — the state carries
    no weight there, so the PSEUDO-inverse telescope ``G_a S G_b^T``
    acts as the identity on the state exactly (``L X^+ X = L`` for
    ``L = U X``), dead directions report Schmidt weight exactly 0, and
    rank-deficient bonds never leak ``sqrt(floor)`` junk into the
    spectrum (a hard eigenvalue floor did — measured).
    """
    ma = 0.5 * (ma + ma.conj().T)
    mb = 0.5 * (mb + mb.conj().T)
    wa, va = jnp.linalg.eigh(ma)
    wb, vb = jnp.linalg.eigh(mb)
    live_a = wa > jnp.max(jnp.abs(wa)) * floor
    live_b = wb > jnp.max(jnp.abs(wb)) * floor
    ra = jnp.where(live_a, jnp.sqrt(jnp.maximum(wa, 0.0)), 0.0)
    rb = jnp.where(live_b, jnp.sqrt(jnp.maximum(wb, 0.0)), 0.0)
    ra_inv = jnp.where(live_a, 1.0 / jnp.maximum(ra, floor), 0.0)
    rb_inv = jnp.where(live_b, 1.0 / jnp.maximum(rb, floor), 0.0)
    # m = Y^H Y with Y = diag(sqrt w) V^H; the ket-side root is its
    # conjugate X = diag(sqrt w) V^T, X^+ = conj(V) diag(w^{-1/2}).
    xa = ra[:, None] * va.T
    xb = rb[:, None] * vb.T
    xa_inv = va.conj() * ra_inv[None, :]
    xb_inv = vb.conj() * rb_inv[None, :]
    u, s, vh = jnp.linalg.svd(peinsum("ij,kj->ik", xa, xb))
    ga = peinsum("ij,jk->ik", xa_inv, u)
    gb = peinsum("ij,kj->ik", xb_inv, vh)
    return ga, gb, s


def _apply_mode(tensor, mat, mode):
    """Contract ``tensor``'s ``mode`` with ``mat[old, new]`` in place."""
    moved = jnp.tensordot(tensor, mat, axes=[[mode], [0]],
                          precision=dot_precision(tensor.dtype,
                                                  mat.dtype))
    return jnp.moveaxis(moved, -1, mode)


def _rebuild(tn, new_tensors, bonds):
    """Same-topology TN over the transformed tensors.

    Nodes are re-added in ``tn.nodes()`` order, so the dangling-leg
    output order of :meth:`TN.contract` is by (node, mode) — identical
    to the original whenever it was built nodes-first.
    """
    out = TN()
    order = [n.name for n in tn.nodes()]
    for name, t in zip(order, new_tensors):
        out.add_dense_node(np.asarray(t), name=name)
    for _, ends in bonds:
        (pa, ia, _), (pb, ib, _) = ends
        out.connect_nodes(order[pa], order[pb], ia, ib)
    return out


def _gauge_internal(tn, tol, max_iter, damping, floor):
    """Gauged tensors + raw (unnormalized) bond weights, no TN rebuild.

    The absorbed root is ``sqrt(S)`` of the raw SVD values — the exact
    telescope scale; callers normalize for reporting.
    """
    (_, _, msgs, _, _), bonds = _run_doubled(tn, tol, max_iter, damping)
    tensors = [jnp.asarray(n.tensor if n.node_type == "dense"
                           else n.base_node.tensor) for n in tn.nodes()]
    weights = []
    for e, (dim, ends) in enumerate(bonds):
        ma = msgs[2 * e].reshape(dim, dim)
        mb = msgs[2 * e + 1].reshape(dim, dim)
        ga, gb, s = _bond_transforms(ma, mb, floor)
        root = jnp.sqrt(s)
        for pos, mode, side in ends:
            g = ga if side == 0 else gb
            tensors[pos] = _apply_mode(tensors[pos], g * root[None, :], mode)
        weights.append(s)
    return tensors, bonds, weights


def bp_gauge(tn, tol=1e-12, max_iter=200, damping=0.0, floor=1e-14):
    """Gauge an open network into the (symmetric) Vidal form via BP.

    Every bond is rotated into its Schmidt basis with ``sqrt(S)``
    absorbed on both sides, so the returned network contracts to the
    SAME state (exact telescope — trees and loopy graphs alike).  On
    trees the returned per-bond ``spectra`` are the exact Schmidt
    values of the state across that bond (normalized to unit 2-norm);
    on loopy graphs they are the BP quasi-canonical weights used by
    simple-update-style truncation.

    Returns:
        ``(gauged_tn, spectra)`` — ``spectra[i]`` belongs to the i-th
        non-dangling edge in ``tn.edges()`` order.
    """
    tensors, bonds, weights = _gauge_internal(
        tn, tol, max_iter, damping, floor)
    spectra = [s / jnp.linalg.norm(s) for s in weights]
    return _rebuild(tn, tensors, bonds), spectra


def bp_truncate(tn, max_bond, cutoff=0.0, tol=1e-12, max_iter=200,
                damping=0.0, floor=1e-14):
    """Truncate every bond of an open network via BP gauging.

    Each bond is rotated into its (BP) Schmidt basis and the smallest
    weights dropped — down to ``max_bond``, plus any below ``cutoff``
    relative to the bond's largest weight.  On trees a single oversize
    bond is truncated optimally: the squared error equals the discarded
    ``sum(S^2)`` exactly.

    Returns:
        ``(truncated_tn, spectra)`` with the *kept* (renormalized to
        the full spectrum's 2-norm = 1) weights per bond.
    """
    (_, _, msgs, _, _), bonds = _run_doubled(tn, tol, max_iter, damping)
    tensors = [jnp.asarray(n.tensor if n.node_type == "dense"
                           else n.base_node.tensor) for n in tn.nodes()]
    spectra = []
    for e, (dim, ends) in enumerate(bonds):
        ma = msgs[2 * e].reshape(dim, dim)
        mb = msgs[2 * e + 1].reshape(dim, dim)
        ga, gb, s = _bond_transforms(ma, mb, floor)
        k = min(dim, max_bond)
        if cutoff > 0.0:
            live = int(jnp.sum(s >= cutoff * s[0]))
            k = min(k, max(live, 1))
        root = jnp.sqrt(s[:k])
        for pos, mode, side in ends:
            g = ga if side == 0 else gb
            tensors[pos] = _apply_mode(
                tensors[pos], g[:, :k] * root[None, :], mode)
        spectra.append(s[:k] / jnp.linalg.norm(s))
    return _rebuild(tn, tensors, bonds), spectra
