"""Belief-propagation (Bethe) contraction of closed tensor networks.

The exact engine (:mod:`contractn_tpu.compiler.engine`) pays the full
treewidth cost of the graph.  BP replaces the global contraction by
local message passing: every bond edge carries two directed messages
``m_{a->b}`` (a vector over the bond dimension), each node refreshes its
outgoing message on a mode by contracting its tensor with the incoming
messages on all *other* modes, and at the fixed point the partition
function is the Bethe assembly

    ``Z_BP = prod_a Z_a / prod_e Z_e``,

``Z_a`` = node tensor closed with all incoming messages, ``Z_e`` =
overlap of the two opposing messages on edge ``e``.  ``Z_BP`` is EXACT
on trees (messages are the true environments after <= diameter sweeps)
and is the Bethe/mean-field approximation on loopy graphs — the
standard trick for networks whose treewidth puts exact contraction out
of reach (random graphs, expander circuits, 3D lattices), and the basis
of BP gauging for PEPS.

TPU-first shape: the whole solve — synchronous sweeps inside a
``lax.while_loop`` plus the final Bethe assembly — is ONE jitted
program, closed over the static graph structure, taking the node
tensors as traced inputs.  Messages are normalized to mean ``|m| = 1``
every sweep and ``Z`` is returned in the framework's split format
``(mantissa, log)``, so arbitrarily long chains/large graphs neither
overflow nor underflow (the same invariant as the exact engine).
Copy (hyperedge) nodes never materialize their ``dim**degree`` delta
tensor: leave-one-out elementwise products via exclusive forward /
backward ``cumprod`` keep an order-101 copy node at ``O(degree * dim)``
per sweep.

The reference has no approximate-contraction layer (SURVEY.md section
2: ``contractn/`` is exact einsum only); this module extends the graph
surface the TPU way.
"""

import string

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.stabilize import peinsum
from ..utils.errors import TNError

_LETTERS = string.ascii_letters


def _graph_spec(tn):
    """Static BP structure: per-node mode->message wiring.

    Returns ``(nodes, edge_ids)`` where each node entry is
    ``(kind, tensor_index_or_none, degree, dim, [(edge_idx, inbound_slot,
    outbound_slot), ...])`` and message slots are ``2*e + side``.
    """
    for edge in tn.edges():
        if edge.dangler:
            raise TNError(
                "bp_contract needs a closed network (no dangling edges); "
                f"edge {edge.name} is dangling")
        if edge.var_dim:
            raise TNError(f"edge {edge.name} has undetermined dimension")
        if edge.name[0] == edge.name[1]:
            raise TNError(
                f"self-loop edge {edge.name}: BP cannot split a trace — "
                "contract it into the node first")

    edge_index = {e.name: i for i, e in enumerate(tn.edges())}
    nodes = []
    tensors = []
    for node in tn.nodes():
        if node.node_type == "input":
            raise TNError(
                "bp_contract needs concrete tensors; input node "
                f"'{node.name}' has none")
        wiring = []
        for mode, edge in enumerate(node.edges):
            e = edge_index[edge.name]
            side = 0 if edge.name[0] == node.name else 1
            # outbound message leaves on our side; inbound arrives from
            # the opposite side.
            wiring.append((e, 2 * e + (1 - side), 2 * e + side))
        if node.is_copy:
            nodes.append(("copy", None, node.degree, node.dim, wiring))
        else:
            t = node.tensor if node.node_type == "dense" \
                else node.base_node.tensor
            nodes.append(("dense", len(tensors), None, None, wiring))
            tensors.append(jnp.asarray(t))
    dims = [e.dim for e in tn.edges()]
    return nodes, dims, tensors


def _normalize(m):
    s = jnp.mean(jnp.abs(m))
    return m / jnp.maximum(s, jnp.finfo(s.dtype).tiny)


def _node_out_messages(kind, tensor, wiring, msgs):
    """All outgoing messages of one node from the inbound ones."""
    inbound = [msgs[i] for (_, i, _) in wiring]
    if kind == "copy":
        stack = jnp.stack(inbound)  # (degree, dim)
        ones = jnp.ones_like(stack[:1])
        fwd = jnp.cumprod(jnp.concatenate([ones, stack[:-1]]), axis=0)
        bwd = jnp.cumprod(
            jnp.concatenate([ones, stack[:0:-1]]), axis=0)[::-1]
        return [fwd[i] * bwd[i] for i in range(len(wiring))]
    k = tensor.ndim
    if k > len(_LETTERS) - 1:
        raise TNError(f"dense node of order {k} exceeds BP symbol budget")
    out = []
    for i in range(k):
        operands = [tensor]
        spec = [_LETTERS[:k]]
        for j in range(k):
            if j == i:
                continue
            operands.append(inbound[j])
            spec.append(_LETTERS[j])
        eq = ",".join(spec) + "->" + _LETTERS[i]
        out.append(peinsum(eq, *operands))
    return out


def _bethe_assembly(nodes, msgs, tensors):
    """Split-format ``Z_BP`` from fixed-point messages."""
    factors = []
    for kind, ti, _, _, wiring in nodes:
        inbound = [msgs[i] for (_, i, _) in wiring]
        if kind == "copy":
            z = jnp.sum(jnp.prod(jnp.stack(inbound), axis=0))
        else:
            t = tensors[ti]
            k = t.ndim
            eq = (",".join([_LETTERS[:k]] + [_LETTERS[j]
                                             for j in range(k)]) + "->")
            z = peinsum(eq, t, *inbound)
        factors.append(z)
    n_edges = len(msgs) // 2
    for e in range(n_edges):
        factors.append(1.0 / jnp.sum(msgs[2 * e] * msgs[2 * e + 1]))
    zs = jnp.stack(factors)
    mag = jnp.abs(zs)
    log = jnp.sum(jnp.log(mag))
    phase = jnp.prod(zs / jnp.maximum(mag, jnp.finfo(mag.dtype).tiny))
    return phase, log


def _bp_fixed_point(nodes, dims, tensors, tol, max_iter, damping):
    dtype = jnp.result_type(*[t.dtype for t in tensors]) if tensors \
        else jnp.float64
    msgs0 = tuple(jnp.ones(dims[i // 2], dtype) for i in range(2 * len(dims)))

    def sweep(msgs):
        new = list(msgs)
        for kind, ti, _, _, wiring in nodes:
            t = tensors[ti] if kind == "dense" else None
            outs = _node_out_messages(kind, t, wiring, msgs)
            for (_, _, o), m in zip(wiring, outs):
                new[o] = m
        return [
            _normalize((1.0 - damping) * n + damping * o)
            for n, o in zip(new, msgs)
        ]

    def cond(carry):
        i, delta, _ = carry
        return jnp.logical_and(i < max_iter, delta > tol)

    def body(carry):
        i, _, msgs = carry
        new = sweep(msgs)
        delta = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(n - o)) for n, o in zip(new, msgs)]))
        return i + 1, delta, tuple(new)

    i, delta, msgs = lax.while_loop(
        cond, body, (jnp.array(0), jnp.array(jnp.inf, jnp.float64), msgs0))
    return i, delta, msgs


def _run(tn, tol, max_iter, damping):
    nodes, dims, tensors = _graph_spec(tn)

    @jax.jit
    def solve(ts):
        i, delta, msgs = _bp_fixed_point(
            nodes, dims, ts, tol, max_iter, damping)
        phase, log = _bethe_assembly(nodes, msgs, ts)
        return i, delta, msgs, phase, log

    return solve(tuple(tensors)), nodes


def bp_contract(tn, tol=1e-12, max_iter=200, damping=0.0,
                split_format=True):
    """Bethe/BP approximation of the closed network's contraction.

    Exact on trees (including copy nodes); the Bethe approximation on
    loopy graphs — e.g. on a single ring of matrices it returns
    ``lambda_max^N``, dropping the subleading eigenvalue orbits.

    Args:
        tn: a closed :class:`~contractn_tpu.network.TN` (no danglers).
        tol: message convergence threshold (max-abs change of the
            normalized messages between synchronous sweeps).
        max_iter: sweep cap for the device-side ``while_loop``.
        damping: mix ``damping`` of the old message into each update —
            use ~0.5 on frustrated/oscillating loopy graphs.
        split_format: return ``(phase_mantissa, log)`` (default) or the
            dense scalar.

    Returns:
        ``(mantissa, log)`` with ``value = mantissa * exp(log)``, or the
        dense scalar if ``split_format=False``.
    """
    (_, _, _, phase, log), _ = _run(tn, tol, max_iter, damping)
    if split_format:
        return phase, log
    return phase * jnp.exp(log)


def bp_environment(tn, node, tol=1e-12, max_iter=200, damping=0.0):
    """Fixed-point incoming messages of ``node`` — its BP environment,
    one vector per tensor mode (exact single-mode environments on
    trees; the Bethe environment otherwise).  ``node`` may be a name or
    a Node.  Also returns the sweep count actually used."""
    name = node if isinstance(node, str) else node.name
    (iters, _, msgs, _, _), nodes = _run(tn, tol, max_iter, damping)
    order = [n.name for n in tn.nodes()]
    try:
        pos = order.index(name)
    except ValueError:
        raise TNError(f"No core node named '{name}' in this TN")
    wiring = nodes[pos][4]
    return [msgs[i] for (_, i, _) in wiring], int(iters)
