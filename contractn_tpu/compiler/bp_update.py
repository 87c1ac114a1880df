"""BP simple update: gate dynamics on arbitrary graph states.

With :mod:`bp_gauge` the network sits in the (quasi-)Vidal gauge —
every bond in its Schmidt basis with ``sqrt(S)`` absorbed on both
sides.  Applying a two-site gate is then the classic simple update,
generalized from chains to ANY graph: weight the two tensors' other
bonds up to full ``S`` (so the local SVD sees the correct tree
environment), contract the pair with the gate, SVD across the bond,
truncate, divide the outer weights back.  On trees this IS canonical
TEBD — the truncation is Eckart-Young optimal per bond; on loopy
graphs it is the simple-update approximation whose quality the BP
fixed point controls (the standard workhorse for PEPS and random-
regular-graph dynamics).

TPU shape: the BP fixed point is one jitted while_loop
(:func:`bp._bp_fixed_point`); each gate is three einsums + one SVD on
a ``(chi d) x (chi d)``-scale matrix.  The graph bookkeeping is pure
Python on static structure, exactly like the exact engine's trace
step.

The reference has no update/evolution layer (SURVEY.md section 2);
this extends the TN container surface.
"""

import numpy as np

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.stabilize import dot_precision
from ..utils.errors import TNError
from .bp_gauge import _gauge_internal, _rebuild

_FLOOR = 1e-14


def gate_from_term(h2, dt, d=2, imaginary=False):
    """Two-site Trotter gate ``exp(-i h2 dt)`` (or ``exp(-h2 dt)``).

    ``h2`` is the ``(d*d, d*d)`` bond term with row/column index order
    ``(site_a, site_b)``; the returned gate is ``(d, d, d, d)`` with
    axes ``(out_a, out_b, in_a, in_b)``.
    """
    h2 = jnp.asarray(h2)
    if h2.shape != (d * d, d * d):
        raise TNError(f"bond term must be ({d*d},{d*d}), got {h2.shape}")
    factor = -dt if imaginary else -1j * dt
    return jsl.expm(factor * h2).reshape(d, d, d, d)


def _mode_maps(tn, bonds):
    """Per-node mode->edge wiring and the single physical mode."""
    order = [n.name for n in tn.nodes()]
    pos_of = {name: i for i, name in enumerate(order)}
    mode_edge = [dict() for _ in order]
    for e, (_, ends) in enumerate(bonds):
        for pos, mode, side in ends:
            mode_edge[pos][mode] = e
    return order, pos_of, mode_edge


def _phys_mode(tensor, wiring):
    phys = [m for m in range(tensor.ndim) if m not in wiring]
    if len(phys) != 1:
        raise TNError(
            "gate application needs exactly one dangling (physical) mode "
            f"per node; found {len(phys)}")
    return phys[0]


def _weight_outer(t, wiring, skip_mode, weights, invert):
    """Multiply (or pseudo-divide) each non-center bond by sqrt(S)."""
    for mode, e in wiring.items():
        if mode == skip_mode:
            continue
        w = weights[e]
        root = jnp.sqrt(w)
        if invert:
            live = w > jnp.max(w) * _FLOOR
            root = jnp.where(live, 1.0 / jnp.maximum(root, _FLOOR), 0.0)
        shape = [1] * t.ndim
        shape[mode] = t.shape[mode]
        t = t * root.reshape(shape)
    return t


def _apply_one_gate(tensors, bonds, weights, mode_edge, gate,
                    pa, pb, max_bond, cutoff):
    """One simple-update gate on the pair ``(pa, pb)``, in place."""
    shared = [e for m, e in mode_edge[pa].items()
              if any(p == pb for p, _, _ in bonds[e][1])]
    if len(shared) != 1:
        raise TNError(
            f"gate needs exactly one bond between the two nodes; found "
            f"{len(shared)}")
    e = shared[0]
    mode_a = next(m for m, ee in mode_edge[pa].items() if ee == e)
    mode_b = next(m for m, ee in mode_edge[pb].items() if ee == e)

    a = tensors[pa]
    b = tensors[pb]
    phys_a = _phys_mode(a, mode_edge[pa])
    phys_b = _phys_mode(b, mode_edge[pb])
    gate = jnp.asarray(gate)
    if gate.shape != (a.shape[phys_a], b.shape[phys_b]) * 2:
        raise TNError(
            f"gate shape {gate.shape} does not match physical dims "
            f"({a.shape[phys_a]}, {b.shape[phys_b]})")

    a = _weight_outer(a, mode_edge[pa], mode_a, weights, invert=False)
    b = _weight_outer(b, mode_edge[pb], mode_b, weights, invert=False)

    # permute to (others..., phys, bond) / (bond, others..., phys)
    others_a = [m for m in range(a.ndim) if m not in (phys_a, mode_a)]
    others_b = [m for m in range(b.ndim) if m not in (phys_b, mode_b)]
    a_perm = jnp.transpose(a, others_a + [phys_a, mode_a])
    b_perm = jnp.transpose(b, [mode_b] + others_b + [phys_b])
    prec = dot_precision(a.dtype, b.dtype)
    theta = jnp.tensordot(a_perm, b_perm, axes=[[a.ndim - 1], [0]],
                          precision=prec)
    # theta: (A_others, d_a, B_others, d_b); contract the gate's input
    # pair, then put the outputs back in the same slots.
    na = len(others_a)
    nb = len(others_b)
    theta = jnp.tensordot(theta, gate, axes=[[na, na + nb + 1], [2, 3]],
                          precision=prec)
    theta = jnp.moveaxis(theta, (-2, -1), (na, na + nb + 1))

    left = int(np.prod(theta.shape[:na + 1]))
    u, s, vh = jnp.linalg.svd(theta.reshape(left, -1),
                              full_matrices=False)
    smax = jnp.maximum(jnp.max(s), jnp.finfo(s.dtype).tiny)
    live = int(jnp.sum(s > smax * max(cutoff, _FLOOR)))
    k = max(min(live, max_bond or live), 1)
    root = jnp.sqrt(s[:k])
    a_new = (u[:, :k] * root[None, :]).reshape(theta.shape[:na + 1] + (k,))
    b_new = (root[:, None] * vh[:k]).reshape((k,) + theta.shape[na + 1:])

    # back to original mode orders (bond mode now dimension k)
    inv_a = np.argsort(others_a + [phys_a, mode_a])
    inv_b = np.argsort([mode_b] + others_b + [phys_b])
    a_new = jnp.transpose(a_new, inv_a)
    b_new = jnp.transpose(b_new, inv_b)
    a_new = _weight_outer(a_new, mode_edge[pa], mode_a, weights, invert=True)
    b_new = _weight_outer(b_new, mode_edge[pb], mode_b, weights, invert=True)

    tensors[pa] = a_new
    tensors[pb] = b_new
    weights[e] = s[:k]
    bonds[e][0] = k


def bp_apply_gates(tn, gates, max_bond=None, cutoff=0.0, tol=1e-12,
                   max_iter=200, damping=0.0, floor=1e-14,
                   renormalize=False):
    """Apply two-site gates to an open network, truncating via BP.

    The network is BP-gauged once, then each ``(gate, node_a, node_b)``
    in ``gates`` is applied in order by the simple update: exact (up to
    the ``max_bond``/``cutoff`` truncation) on trees, the simple-update
    approximation on loopy graphs.  ``gate`` has axes
    ``(out_a, out_b, in_a, in_b)`` — see :func:`gate_from_term`.

    ``renormalize=True`` rescales every tensor to mean ``|t| = 1``
    before returning — non-unitary (imaginary-time) gate layers grow
    tensor scales by ``~exp(tau |E|)`` PER LAYER, so long evolutions
    overflow float64 within a few dozen layers without it.  The state
    ray is unchanged; only the physically-irrelevant global scale is
    dropped (use split-format contraction if the scale matters).

    Returns:
        ``(new_tn, spectra)`` — the updated network (same topology,
        possibly different bond dimensions) and the kept bond weights
        (each normalized to the unit 2-norm of its full spectrum).
    """
    tensors, bonds, weights = _gauge_internal(
        tn, tol, max_iter, damping, floor)
    bonds = [[dim, ends] for dim, ends in bonds]
    order, pos_of, mode_edge = _mode_maps(tn, bonds)
    for gate, na, nb in gates:
        na = na if isinstance(na, str) else na.name
        nb = nb if isinstance(nb, str) else nb.name
        if na not in pos_of or nb not in pos_of:
            raise TNError(f"unknown node in gate target ({na}, {nb})")
        _apply_one_gate(tensors, bonds, weights, mode_edge, gate,
                        pos_of[na], pos_of[nb], max_bond, cutoff)
    if renormalize:
        tensors = [t / jnp.maximum(jnp.mean(jnp.abs(t)), _FLOOR)
                   for t in tensors]
    spectra = [w / jnp.linalg.norm(w) for w in weights]
    return _rebuild(tn, tensors, bonds), spectra
