"""BP expectation values on arbitrary open graph states.

Closes the BP loop opened by :mod:`bp_gauge` (norms, gauging) and
:mod:`bp_update` (gate dynamics): measuring the evolved state.  At the
doubled-layer fixed point the incoming Gram-matrix messages ARE the
(Bethe) environment of every node, so any local observable is a single
closed einsum,

    ``<O_a>  = Z_a(O) / Z_a(I)``,
    ``<O_ab> = Z_ab(O) / Z_ab(I)``  (adjacent pair, shared bonds
                                     contracted exactly),

with ``Z`` = the node (pair) sandwiched between its own conjugate and
the incoming messages on every external virtual mode.  Exact on trees
(the messages are the true environments); the standard BP/mean-field
estimate on loopy graphs — the measurement side of simple-update PEPS
and expander-circuit workflows (Tindall & Fishman, SciPost Phys. 15,
222).

TPU shape: the fixed point is :func:`bp._bp_fixed_point` (ONE jitted
while_loop on fused ``chi^2`` messages); each observable closure is one
tiny einsum over static wiring.  Operators address a node's fused
physical space (its dangling modes in order), so multi-leg nodes and
two-site gates ride the same path as :func:`bp_update.bp_apply_gates`.

The reference has no measurement layer (SURVEY.md section 2).
"""

import string

import jax.numpy as jnp

from ..ops.stabilize import peinsum
from ..utils.errors import TNError
from .bp_gauge import _run_doubled

_LETTERS = string.ascii_letters


def _node_layout(tn, bonds):
    """Per node position: ``(tensor, modes)`` with ``modes[i]`` either
    ``("msg", incoming_slot)`` for bond modes or ``("phys", dim)`` for
    dangling (physical) modes."""
    pos_of = {n.name: p for p, n in enumerate(tn.nodes())}
    incoming = {}
    for e, (_, ends) in enumerate(bonds):
        for pos, mode, side in ends:
            incoming[(pos, mode)] = 2 * e + (1 - side)
    layouts = []
    for pos, node in enumerate(tn.nodes()):
        t = jnp.asarray(node.tensor if node.node_type == "dense"
                        else node.base_node.tensor)
        modes = []
        for mode, edge in enumerate(node.edges):
            if edge.dangler:
                modes.append(("phys", t.shape[mode]))
            else:
                modes.append(("msg", incoming[(pos, mode)]))
        layouts.append((t, modes))
    return pos_of, layouts


def _sandwich(group, mats, op):
    """``Z`` of a connected node ``group`` closed by incoming messages.

    ``group`` entries are ``(tensor, modes)`` with modes ``("msg",
    slot)`` (external: close with the incoming Gram matrix), ``("bond",
    bid)`` (internal to the group: contract ket-ket and bra-bra), or
    ``("phys", dim)``.  ``op`` is ``(prod_d, prod_d)`` over the group's
    physical modes in (node, mode) order, or None for the traced
    (identity) closure.
    """
    it = iter(_LETTERS)
    operands, subs = [], []
    ket_phys, bra_phys, phys_dims = [], [], []
    bond_sym = {}
    for t, modes in group:
        ket, bra = [], []
        for kind, val in modes:
            if kind == "bond":
                if val not in bond_sym:
                    bond_sym[val] = (next(it), next(it))
                k, b = bond_sym[val]
            elif kind == "msg":
                k, b = next(it), next(it)
                operands.append(mats[val])
                subs.append(k + b)
            else:  # phys
                k = next(it)
                b = k if op is None else next(it)
                ket_phys.append(k)
                bra_phys.append(b)
                phys_dims.append(val)
            ket.append(k)
            bra.append(b)
        operands.append(t)
        subs.append("".join(ket))
        operands.append(t.conj())
        subs.append("".join(bra))
    if op is not None:
        dim = 1
        for d in phys_dims:
            dim *= d
        op = jnp.asarray(op)
        if op.shape != (dim, dim):
            raise TNError(
                f"operator shape {op.shape} does not match the group's "
                f"fused physical dimension {dim}")
        operands.append(op.reshape(tuple(phys_dims) * 2))
        subs.append("".join(bra_phys) + "".join(ket_phys))
    eq = ",".join(subs) + "->"
    return peinsum(eq, *operands)


def bp_measure(tn, local=(), bonds=(), tol=1e-12, max_iter=200,
               damping=0.0):
    """Local and adjacent-pair expectation values via one BP solve.

    Args:
        local: iterable of ``(node_name, op)`` — ``op`` acts on that
            node's fused physical (dangling) space, modes in order.
        bonds: iterable of ``(name_a, name_b, op2)`` — ``op2`` acts on
            the fused physical space of the ADJACENT pair (``name_a``'s
            physical modes first); every edge shared by the pair is
            contracted exactly inside the closure.

    Returns:
        ``(local_values, bond_values)`` lists, in input order.  Exact
        on trees; the Bethe estimate on loopy graphs.
    """
    (_, _, msgs, _, _), dbonds = _run_doubled(tn, tol, max_iter, damping)
    pos_of, layouts = _node_layout(tn, dbonds)
    mats = {}
    for e, (dim, _) in enumerate(dbonds):
        mats[2 * e] = msgs[2 * e].reshape(dim, dim)
        mats[2 * e + 1] = msgs[2 * e + 1].reshape(dim, dim)

    def resolve(name):
        if name not in pos_of:
            raise TNError(f"unknown node '{name}'")
        return pos_of[name]

    def resolved(modes, shared):
        out = []
        for kind, val in modes:
            if kind == "msg" and val in shared:
                out.append(("bond", shared[val]))
            else:
                out.append((kind, val))
        return out

    local_vals = []
    for name, op in local:
        t, modes = layouts[resolve(name)]
        group = [(t, resolved(modes, {}))]
        num = _sandwich(group, mats, op)
        den = _sandwich(group, mats, None)
        local_vals.append(complex(num / den))

    bond_vals = []
    for name_a, name_b, op2 in bonds:
        ta, modes_a = layouts[resolve(name_a)]
        tb, modes_b = layouts[resolve(name_b)]
        slots_a = {v for k, v in modes_a if k == "msg"}
        shared = {}
        for k, v in modes_b:
            # incoming slot v at b pairs with incoming (v ^ 1) at a
            if k == "msg" and (v ^ 1) in slots_a:
                bid = len(shared)
                shared[v] = bid
                shared[v ^ 1] = bid
        if not shared:
            raise TNError(
                f"nodes '{name_a}' and '{name_b}' share no bond; "
                "bp_measure bond terms need adjacent nodes")
        group = [(ta, resolved(modes_a, shared)),
                 (tb, resolved(modes_b, shared))]
        num = _sandwich(group, mats, op2)
        den = _sandwich(group, mats, None)
        bond_vals.append(complex(num / den))
    return local_vals, bond_vals
