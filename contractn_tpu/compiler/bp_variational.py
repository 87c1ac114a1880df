"""Differentiable BP: variational energies on arbitrary graph states.

:mod:`bp_measure` evaluates observables at the Bethe fixed point found
by a ``while_loop`` — fast, but opaque to reverse-mode autodiff.  This
module provides the differentiable counterpart: a FIXED number of
synchronous message sweeps as one ``lax.scan`` (reverse-differentiable,
remat-friendly), energy terms assembled from the resulting messages,
and a gradient-descent ground-state driver whose whole optimization is
one jitted scan.  As the sweep count grows the unrolled gradient
converges to the exact implicit-function gradient of the Bethe energy
— the standard route for gradient-based PEPS/graph-state optimization
with BP environments (Tindall & Fishman, SciPost Phys. 15, 222).

Exact on trees: messages converge in <= diameter sweeps and the energy
is the true Rayleigh quotient, so ``bp_ground_state`` on a chain is
gradient-based DMRG.  On loopy graphs the energy is the Bethe estimate
(NOT variational — it can undershoot), the same object simple update
optimizes implicitly; the gradient flow optimizes it directly.

TPU shape: doubling einsums, message sweeps, and term closures are all
static-shape jitted code; the graph walk happens once at trace time.
The reference has no optimization layer (SURVEY.md section 2).
"""

import string
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import optax

from ..ops.stabilize import peinsum
from ..utils.errors import TNError
from .bp import _node_out_messages, _normalize
from .bp_gauge import _doubled_spec, _rebuild
from .bp_measure import _sandwich


def _doubling_plans(tn):
    """Static per-node doubling plans ``(eq, fused_shape)`` matching
    :func:`bp_gauge._doubled_spec`'s conventions, plus the raw node
    tensors in node order."""
    letters = string.ascii_letters
    plans = []
    tensors = []
    for node in tn.nodes():
        t = jnp.asarray(node.tensor if node.node_type == "dense"
                        else node.base_node.tensor)
        k = t.ndim
        ket = letters[:k]
        bra = list(letters[k:2 * k])
        out = []
        fused = []
        for mode, edge in enumerate(node.edges):
            if edge.dangler:
                bra[mode] = ket[mode]
                continue
            out.append(ket[mode] + bra[mode])
            fused.append(t.shape[mode] ** 2)
        eq = ket + "," + "".join(bra) + "->" + "".join(out)
        plans.append((eq, tuple(fused)))
        tensors.append(t)
    return plans, tensors


def _bp_sweeps(nodes, dims, tensors, n_sweeps, damping):
    """``n_sweeps`` synchronous sweeps as ONE ``lax.scan`` — the
    reverse-differentiable replacement for the ``while_loop`` fixed
    point."""
    dtype = jnp.result_type(*[t.dtype for t in tensors]) if tensors \
        else jnp.float64
    msgs0 = tuple(jnp.ones(dims[i // 2], dtype)
                  for i in range(2 * len(dims)))

    def body(msgs, _):
        new = list(msgs)
        for kind, ti, _, _, wiring in nodes:
            t = tensors[ti] if kind == "dense" else None
            outs = _node_out_messages(kind, t, wiring, msgs)
            for (_, _, o), m in zip(wiring, outs):
                new[o] = m
        new = tuple(
            _normalize((1.0 - damping) * n + damping * o)
            for n, o in zip(new, msgs))
        return new, None

    msgs, _ = lax.scan(body, msgs0, None, length=n_sweeps)
    return msgs


def _layouts(tn, bonds):
    """(name -> pos, per-node static mode lists) — bp_measure's node
    layout without the tensors (those stay traced)."""
    pos_of = {n.name: p for p, n in enumerate(tn.nodes())}
    incoming = {}
    for e, (_, ends) in enumerate(bonds):
        for pos, mode, side in ends:
            incoming[(pos, mode)] = 2 * e + (1 - side)
    modes_of = []
    for pos, node in enumerate(tn.nodes()):
        t = node.tensor if node.node_type == "dense" \
            else node.base_node.tensor
        modes = []
        for mode, edge in enumerate(node.edges):
            if edge.dangler:
                modes.append(("phys", t.shape[mode]))
            else:
                modes.append(("msg", incoming[(pos, mode)]))
        modes_of.append(modes)
    return pos_of, modes_of


def _term_groups(tn, local, bonds_terms, pos_of, modes_of):
    """Static (positions, resolved modes, op) per energy term."""
    def resolve(name):
        if name not in pos_of:
            raise TNError(f"unknown node '{name}'")
        return pos_of[name]

    terms = []
    for name, op in local:
        pos = resolve(name)
        terms.append(([pos], [modes_of[pos]], jnp.asarray(op)))
    for name_a, name_b, op2 in bonds_terms:
        pa, pb = resolve(name_a), resolve(name_b)
        modes_a, modes_b = modes_of[pa], modes_of[pb]
        slots_a = {v for k, v in modes_a if k == "msg"}
        shared = {}
        for k, v in modes_b:
            if k == "msg" and (v ^ 1) in slots_a:
                bid = len(shared)
                shared[v] = bid
                shared[v ^ 1] = bid
        if not shared:
            raise TNError(
                f"nodes '{name_a}' and '{name_b}' share no bond; "
                "bond terms need adjacent nodes")

        def res(modes):
            return [("bond", shared[v]) if k == "msg" and v in shared
                    else (k, v) for k, v in modes]

        terms.append(([pa, pb], [res(modes_a), res(modes_b)],
                      jnp.asarray(op2)))
    return terms


def make_bp_energy(tn, bond_terms=(), local_terms=(), n_sweeps=30,
                   damping=0.0):
    """Build a differentiable ``energy(tensors) -> real scalar``.

    ``tensors`` is the tuple of node tensors in ``tn.nodes()`` order
    (the template's values are only used for shapes/static structure).
    The energy is the sum of all term expectations at the ``n_sweeps``
    BP point — exact Rayleigh-quotient terms on trees.
    """
    nodes, dims, _, dbonds = _doubled_spec(tn)
    plans, tensors0 = _doubling_plans(tn)
    pos_of, modes_of = _layouts(tn, dbonds)
    terms = _term_groups(tn, local_terms, bond_terms, pos_of, modes_of)

    def energy(ts):
        doubled = tuple(
            peinsum(eq, t, t.conj()).reshape(fused)
            for (eq, fused), t in zip(plans, ts))
        msgs = _bp_sweeps(nodes, dims, doubled, n_sweeps, damping)
        mats = {}
        for e, d in enumerate(dims):
            chi = int(np.sqrt(d))
            mats[2 * e] = msgs[2 * e].reshape(chi, chi)
            mats[2 * e + 1] = msgs[2 * e + 1].reshape(chi, chi)
        total = 0.0
        for poss, groups_modes, op in terms:
            group = [(ts[p], m) for p, m in zip(poss, groups_modes)]
            num = _sandwich(group, mats, op)
            den = _sandwich(group, mats, None)
            total = total + jnp.real(num / den)
        return total

    return energy, tuple(tensors0)


def bp_energy(tn, bond_terms=(), local_terms=(), n_sweeps=30,
              damping=0.0):
    """One-shot BP energy of the network's current tensors."""
    fn, ts = make_bp_energy(tn, bond_terms, local_terms, n_sweeps,
                            damping)
    return float(jax.jit(fn)(ts))


@partial(jax.jit, static_argnames=("energy_fn", "steps"))
def _descend(energy_fn, ts, steps, lr):
    opt = optax.adam(lr)
    state = opt.init(ts)

    def body(carry, _):
        t, s = carry
        e, g = jax.value_and_grad(energy_fn)(t)
        # adam on the conjugate gradient (grad of a real loss of
        # complex params is dE/dRe - i dE/dIm)
        g = jax.tree_util.tree_map(jnp.conj, g)
        updates, s = opt.update(g, s, t)
        return (optax.apply_updates(t, updates), s), e

    (ts, _), energies = lax.scan(body, (ts, state), None, length=steps)
    return ts, energies


def bp_ground_state(tn, bond_terms=(), local_terms=(), steps=400,
                    lr=0.02, n_sweeps=30, damping=0.0):
    """Gradient-descent ground state of a graph Hamiltonian with BP
    environments.

    The Hamiltonian is given as ``bond_terms`` ``(name_a, name_b, h2)``
    on adjacent node pairs plus optional ``local_terms`` ``(name, h1)``
    (each ``h`` on the fused physical space, Hermitian).  The WHOLE
    optimization — BP sweeps, term assembly, adam — is one jitted
    ``lax.scan``.  Returns ``(optimized_tn, energies)``.

    On trees this is exact variational optimization (gradient DMRG);
    on loopy graphs it descends the Bethe energy estimate.
    """
    energy_fn, ts = make_bp_energy(tn, bond_terms, local_terms,
                                   n_sweeps, damping)
    ts, energies = _descend(energy_fn, ts, int(steps), float(lr))
    _, _, _, dbonds = _doubled_spec(tn)
    return _rebuild(tn, list(ts), dbonds), energies
