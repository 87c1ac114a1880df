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


# -- sweeped eigensolves (TTN-DMRG) ------------------------------------ #
#
# The adam route above is gauge-free and robust; the sweeps below are
# the classical alternative: keep every tensor isometric TOWARD the
# orthogonality center, walk the center along the tree in a depth-first
# Euler tour, and replace each tensor by the ground state of its
# effective Hamiltonian (children blocks + up-environment, N_eff = I by
# the gauge).  Converges to the variational optimum at machine
# precision in a handful of sweeps — the same few-sweep behavior as
# chain DMRG, at log depth.

def _leaf_block(w, c1, c2, prec):
    return jnp.einsum("sta,sSpq,tTqr,STb->prab", w.conj(), c1, c2, w,
                      precision=prec)


def _node_block(w, el, er, prec):
    return jnp.einsum("xya,pqxX,qryY,XYb->prab", w.conj(), el, er, w,
                      precision=prec)


def _node_matvec(el, er, up, theta, prec):
    """``H_eff theta`` for an internal/leaf tensor ``(x, y, o)``:
    children blocks on the first two legs, up-environment on the third.
    For leaves, ``el``/``er`` are the two MPO cores reshaped to the
    same ``(p, m, x, X)`` layout."""
    t = jnp.einsum("pmxX,XYO->pmxYO", el, theta, precision=prec)
    t = jnp.einsum("mqyY,pmxYO->pqxyO", er, t, precision=prec)
    return jnp.einsum("pqoO,pqxyO->xyo", up, t, precision=prec)


def _core_as_block(c):
    """MPO core ``(d_out, d_in, p, q)`` -> block layout ``(p, q, x, X)``
    (bra index = output leg)."""
    return jnp.transpose(c, (2, 3, 0, 1))


def _lq_rows(mat):
    """``mat = L Q`` with orthonormal ROWS of ``Q``."""
    q, r = jnp.linalg.qr(mat.conj().T)
    return r.conj().T, q.conj().T


def _child_upenv(up, sib_block, w, side, prec):
    """Up-environment of a child given the parent's up-env, the
    sibling's block, and the (already isometrized) parent tensor."""
    if side == "left":
        t = jnp.einsum("pqoO,XYO->pqXYo", up, w, precision=prec)
        t = jnp.einsum("mqyY,pqXYo->pmXyo", sib_block, t, precision=prec)
        return jnp.einsum("xyo,pmXyo->pmxX", w.conj(), t, precision=prec)
    t = jnp.einsum("pqoO,XYO->pqXYo", up, w, precision=prec)
    t = jnp.einsum("pmxX,pqXYo->mqxYo", sib_block, t, precision=prec)
    return jnp.einsum("xyo,mqxYo->mqyY", w.conj(), t, precision=prec)


def ttn_dmrg(h_mpo, chi, key=None, sweeps=4, lanczos_iters=24, d=None):
    """Ground state by sweeped local eigensolves (TTN-DMRG).

    Returns ``(params, energies)`` with one energy per sweep (the root
    solve's eigenvalue — variational, non-increasing).  Reaches the
    manifold optimum at machine precision where the adam route
    (:func:`ttn_ground_state`) stalls at its step-noise floor.
    """
    from ..ops.krylov import lanczos_ground

    cores = jnp.asarray(h_mpo.cores)
    n = cores.shape[0]
    if d is None:
        d = cores.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    params = random_ttn(key, n, d, chi, dtype=cores.dtype)
    levels = [[lv[b] for b in range(lv.shape[0])]
              for lv in params["levels"]]
    top = params["top"]
    n_lv = len(levels)
    prec = dot_precision(cores.dtype)
    lvec = jnp.asarray(h_mpo.left, cores.dtype)
    rvec = jnp.asarray(h_mpo.right, cores.dtype)
    pair = cores.reshape(n // 2, 2, *cores.shape[1:])

    def block_at(lv, b):
        if lv == 0:
            return _leaf_block(levels[0][b], pair[b, 0], pair[b, 1], prec)
        return _node_block(levels[lv][b], blocks[lv - 1][2 * b],
                           blocks[lv - 1][2 * b + 1], prec)

    blocks = [[None] * len(levels[lv]) for lv in range(n_lv)]
    for lv in range(n_lv):
        for b in range(len(levels[lv])):
            blocks[lv][b] = block_at(lv, b)

    def children_blocks(lv, b):
        if lv == 0:
            return (_core_as_block(pair[b, 0]), _core_as_block(pair[b, 1]))
        return blocks[lv - 1][2 * b], blocks[lv - 1][2 * b + 1]

    def descend(lv, b, up):
        """Center is at node (lv, b); optimize, recurse, exit with the
        node isometric toward its parent, returning the R factor."""
        el, er = children_blocks(lv, b)
        w0 = levels[lv][b]
        _, theta = lanczos_ground(
            lambda t: _node_matvec(el, er, up, t, prec), w0,
            lanczos_iters)
        levels[lv][b] = theta
        if lv > 0:
            # left child: isometrize this node w.r.t. (y, o)
            x_dim, y_dim, o_dim = theta.shape
            lmat, q = _lq_rows(theta.reshape(x_dim, y_dim * o_dim))
            levels[lv][b] = q.reshape(x_dim, y_dim, o_dim)
            levels[lv - 1][2 * b] = peinsum(
                "xyo,ok->xyk", levels[lv - 1][2 * b], lmat)
            up_l = _child_upenv(up, blocks[lv - 1][2 * b + 1],
                                levels[lv][b], "left", prec)
            r = descend(lv - 1, 2 * b, up_l)
            blocks[lv - 1][2 * b] = block_at(lv - 1, 2 * b)
            levels[lv][b] = peinsum("kx,xyo->kyo", r, levels[lv][b])
            # right child: isometrize w.r.t. (x, o)
            theta = levels[lv][b]
            m = jnp.transpose(theta, (1, 0, 2)).reshape(
                theta.shape[1], -1)
            lmat, q = _lq_rows(m)
            levels[lv][b] = jnp.transpose(
                q.reshape(theta.shape[1], theta.shape[0],
                          theta.shape[2]), (1, 0, 2))
            levels[lv - 1][2 * b + 1] = peinsum(
                "xyo,ok->xyk", levels[lv - 1][2 * b + 1], lmat)
            up_r = _child_upenv(up, blocks[lv - 1][2 * b],
                                levels[lv][b], "right", prec)
            r = descend(lv - 1, 2 * b + 1, up_r)
            blocks[lv - 1][2 * b + 1] = block_at(lv - 1, 2 * b + 1)
            levels[lv][b] = peinsum("ky,xyo->xko", r, levels[lv][b])
        # exit: QR toward the parent
        theta = levels[lv][b]
        q, r = jnp.linalg.qr(theta.reshape(-1, theta.shape[2]))
        levels[lv][b] = q.reshape(theta.shape[0], theta.shape[1], -1)
        blocks[lv][b] = block_at(lv, b)
        return r  # (k, o_old): the caller contracts Sum_o R[k, o]

    energies = []
    for _ in range(sweeps):
        el, er = blocks[-1][0], blocks[-1][1]
        elc = peinsum("p,pqxX->qxX", lvec, el)
        erc = peinsum("qryY,r->qyY", er, rvec)

        def top_matvec(t):
            s = jnp.einsum("qxX,XY->qxY", elc, t, precision=prec)
            return jnp.einsum("qyY,qxY->xy", erc, s, precision=prec)

        energy, top = lanczos_ground(top_matvec, top, lanczos_iters)
        energies.append(float(jnp.real(energy)))
        # left subtree
        lmat, q = _lq_rows(top)
        top = q
        levels[-1][0] = peinsum("xyo,ok->xyk", levels[-1][0], lmat)
        m = peinsum("qryY,r,xy,XY->qxX", blocks[-1][1], rvec,
                    top.conj(), top)
        up_l = peinsum("p,qxX->pqxX", lvec, m)
        r = descend(n_lv - 1, 0, up_l)
        blocks[-1][0] = block_at(n_lv - 1, 0)
        top = peinsum("kx,xy->ky", r, top)
        # right subtree
        q2, r2 = jnp.linalg.qr(top)
        top = q2
        levels[-1][1] = peinsum("xyo,ok->xyk", levels[-1][1], r2.T)
        m2 = peinsum("p,pqxX,xy,XY->qyY", lvec, blocks[-1][0],
                     top.conj(), top)
        up_r = peinsum("qyY,r->qryY", m2, rvec)
        r = descend(n_lv - 1, 1, up_r)
        blocks[-1][1] = block_at(n_lv - 1, 1)
        top = peinsum("ky,xy->xk", r, top)
        top = top / jnp.linalg.norm(top)
    out = {"levels": [jnp.stack(lv) for lv in levels], "top": top}
    return out, energies


def ttn_inner(pa, pb):
    """Overlap ``<psi_a|psi_b>`` of two same-shape TTNs by the
    log-depth mixed block flow (no gauge assumption on either tree)."""
    def leaf(wa, wb):
        return peinsum("sta,stb->ab", wa.conj(), wb)

    m = jax.vmap(leaf)(pa["levels"][0], pb["levels"][0])

    def internal(wa, wb, ml, mr):
        return peinsum("xya,xX,yY,XYb->ab", wa.conj(), ml, mr, wb)

    for wa, wb in zip(pa["levels"][1:], pb["levels"][1:]):
        m2 = m.reshape(m.shape[0] // 2, 2, *m.shape[1:])
        m = jax.vmap(internal)(wa, wb, m2[:, 0], m2[:, 1])
    return peinsum("xy,xX,yY,XY->", pa["top"].conj(), m[0], m[1],
                   pb["top"])


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
