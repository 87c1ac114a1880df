"""Binary tree tensor networks (TTN): ground states and observables.

The missing family between MPS and MERA: a balanced binary tree of
isometries over ``n = 2^L`` sites.  TTNs contract EXACTLY (no loops),
support log-depth causal cones, and their natural TPU layout is one
stacked array per level — every block on a level is the same shape, so
the per-level renormalization is a single ``vmap`` of one einsum and
the whole energy evaluation is ``L`` such maps (log-depth, all MXU
GEMMs, no data-dependent control flow).

Any MPO flows UP the tree as a block operator: a subtree covering a
contiguous site block renormalizes the MPO to ``E[w_l, w_r, a, a']``
(open operator-bond indices at the block edges, renormalized bra/ket
indices).  Leaves absorb two MPO cores; internal levels contract the
shared middle operator bond of their two children; the root closes
with the MPO boundary vectors.  Norm blocks flow the same way without
the operator bond, so the energy is a Rayleigh quotient that never
assumes isometric gauge — which makes the WHOLE optimization a plain
unconstrained ``optax`` descent on one jitted ``lax.scan`` (the
host-dispatch lesson from :mod:`~contractn_tpu.models.mera`: scans
beat per-step dispatch by ~10x at these sizes).

Validated (tests/test_ttn.py) against dense ED: the block-flow energy
equals the dense reconstruction's Rayleigh quotient at machine
precision on random (non-isometric) trees, the chi-saturated tree
reaches the exact TFIM/Heisenberg ground energy, truncated chi is
variational and monotone, and observables match the dense
reconstruction entrywise.  The reference has no tree algorithms (its
`contractn/` graph layer can only *represent* a tree; SURVEY.md
section 2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.stabilize import dot_precision, peinsum
from .mpo import MPO


def _level_dims(n_sites, d, chi):
    """Per-level output bond dims: saturate at ``chi``."""
    n_levels = int(np.log2(n_sites))
    if 2 ** n_levels != n_sites or n_levels < 2:
        raise ValueError("TTN needs n_sites a power of two, >= 4")
    dims = []
    cur = d
    for _ in range(n_levels - 1):
        out = min(cur * cur, chi)
        dims.append(out)
        cur = out
    return dims  # len L-1; top joins two `dims[-1]` bonds


def random_ttn(key, n_sites, d, chi, dtype=jnp.float64):
    """Random isometric TTN: ``{"levels": [w_l], "top": t}`` with
    ``w_l`` stacked ``(blocks, in, in, out)`` isometries and ``t`` the
    ``(c, c)`` root matrix (normalized)."""
    dims = _level_dims(n_sites, d, chi)
    levels = []
    cur = d
    blocks = n_sites // 2
    for out in dims:
        key, sub = jax.random.split(key)
        m = jax.random.normal(sub, (blocks, cur * cur, out), dtype)
        q, _ = jnp.linalg.qr(m)
        levels.append(q.reshape(blocks, cur, cur, out))
        cur = out
        blocks //= 2
    key, sub = jax.random.split(key)
    top = jax.random.normal(sub, (cur, cur), dtype)
    top = top / jnp.linalg.norm(top)
    return {"levels": levels, "top": top}


def _mpo_blocks(params, mpo):
    """Flow the MPO up the tree; returns the root's two children
    ``(e_left, e_right)`` of shape ``(W, W, c, c)`` each."""
    cores = jnp.asarray(mpo.cores)
    n = cores.shape[0]
    prec = dot_precision(cores.dtype, params["top"].dtype)
    pair = cores.reshape(n // 2, 2, *cores.shape[1:])

    def leaf(w, c1, c2):
        return jnp.einsum("sta,sSpq,tTqr,STb->prab", w.conj(), c1, c2,
                          w, precision=prec)

    e = jax.vmap(leaf)(params["levels"][0], pair[:, 0], pair[:, 1])

    def internal(w, el, er):
        return jnp.einsum("xya,pqxX,qryY,XYb->prab", w.conj(), el, er,
                          w, precision=prec)

    for w in params["levels"][1:]:
        e2 = e.reshape(e.shape[0] // 2, 2, *e.shape[1:])
        e = jax.vmap(internal)(w, e2[:, 0], e2[:, 1])
    return e[0], e[1]


def _norm_blocks(params):
    def leaf(w):
        return peinsum("sta,stb->ab", w.conj(), w)

    n = jax.vmap(leaf)(params["levels"][0])

    def internal(w, nl, nr):
        return peinsum("xya,xX,yY,XYb->ab", w.conj(), nl, nr, w)

    for w in params["levels"][1:]:
        n2 = n.reshape(n.shape[0] // 2, 2, *n.shape[1:])
        n = jax.vmap(internal)(w, n2[:, 0], n2[:, 1])
    return n[0], n[1]


def ttn_expectation(params, mpo):
    """``<psi| MPO |psi> / <psi|psi>`` by the log-depth block flow (no
    isometric-gauge assumption)."""
    el, er = _mpo_blocks(params, mpo)
    top = params["top"]
    num = peinsum("p,r,xy,pqxX,qryY,XY->", jnp.asarray(mpo.left),
                  jnp.asarray(mpo.right), top.conj(), el, er, top)
    nl, nr = _norm_blocks(params)
    den = peinsum("xy,xX,yY,XY->", top.conj(), nl, nr, top)
    return num / den


def ttn_energy(params, h_mpo):
    """Rayleigh-quotient energy (real part; Hermitian MPOs only)."""
    return jnp.real(ttn_expectation(params, h_mpo))


def product_mpo(n, site_ops, d=2, dtype=jnp.complex128):
    """Product of one-site operators (identity elsewhere) as a bond-1
    MPO — the observable container for :func:`ttn_expectation`."""
    eye = np.eye(d)
    cores = np.broadcast_to(eye[None, :, :, None, None],
                            (n, d, d, 1, 1)).copy()
    for site, op in site_ops:
        cores[site, :, :, 0, 0] = np.asarray(op)
    one = jnp.ones((1,), dtype)
    return MPO(jnp.asarray(cores, dtype), one, one)


@partial(jax.jit, static_argnames=("steps",))
def _optimize(params, h_mpo, steps, lr):
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.01)
    opt = optax.adam(sched)
    state = opt.init(params)

    def body(carry, _):
        p, s = carry
        e, g = jax.value_and_grad(ttn_energy)(p, h_mpo)
        # adam on the conjugate gradient (JAX grad of a real loss of
        # complex params is dE/dRe - i dE/dIm)
        g = jax.tree_util.tree_map(jnp.conj, g)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), e

    (params, _), energies = jax.lax.scan(body, (params, state), None,
                                         length=steps)
    return params, energies


def ttn_ground_state(h_mpo, chi, key=None, steps=3000, lr=0.02, d=None):
    """Variational TTN ground state of an MPO Hamiltonian.

    One jitted scan of adam steps on the Rayleigh quotient (cosine lr
    decay); the tree is NOT gauge-constrained during descent — the
    quotient is scale-free, so isometry is only a parametrization
    convenience, not a requirement.

    Returns ``(params, energies)`` with ``energies`` the per-step
    values (non-increasing up to adam noise; the last value is the
    converged variational energy).
    """
    cores = jnp.asarray(h_mpo.cores)
    n = cores.shape[0]
    if d is None:
        d = cores.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    params = random_ttn(key, n, d, chi, dtype=cores.dtype)
    return _optimize(params, h_mpo, int(steps), float(lr))


def ttn_to_dense(params, d=None):
    """Dense state vector (little lattices only) — the oracle for the
    block-flow machinery in tests."""
    levels = params["levels"]
    if d is None:
        d = levels[0].shape[1]
    # expand downward: start from the root matrix, replace each bond
    # by the two child bonds of the isometry below it.
    state = params["top"]  # (c, c) over the two level-(L-2) bonds
    for w in reversed(levels):
        nb = w.shape[0]
        # state: (b_0, ..., b_{nb-1}) over the level's output bonds
        axes = list(range(nb))
        for b in reversed(range(nb)):
            state = jnp.tensordot(
                state, w[b], axes=([b], [2]),
                precision=dot_precision(state.dtype, w.dtype))
            # contracted axis appends (in, in) at the end; move home
            state = jnp.moveaxis(state, (-2, -1), (b, b + 1))
        del axes
    return state.reshape(-1)
