"""TRG: Levin-Nave tensor renormalization + GILT loop filtering.

The original tensor renormalization group (Levin & Nave, PRL 99,
120601): on a checkerboard, every site tensor is SVD-split across one
of its two diagonals, and the four inner triangle pieces around
alternate plaquettes contract into the coarse tensor on the 45-degree
rotated lattice (N -> N/2 sites per step).  O(chi^6) per step — the
cheapest member of this repo's real-space RG family (HOTRG is chi^7
with better per-chi accuracy, CTMRG converges environments instead).

Geometry (axes ``a[u, l, d, r]``, matching :mod:`.hotrg` / the CTMRG
Ising builders): "even" sites split ``(u, r) | (d, l)``, "odd" sites
``(u, l) | (d, r)``.  Around the plaquette whose corners are
SW(even)/SE(odd)/NE(even)/NW(odd), the four inner pieces share the
plaquette's edges; the four SVD bond legs become the coarse tensor's
modes with the rotated-frame assignment ``u' = NE, l' = NW, d' = SW,
r' = SE`` — two steps restore the orientation (pinned by the Onsager
test at every temperature, which any leg misassignment destroys).

TRG's known failure mode is short-range loop entanglement: a corner-
double-line (CDL) structure survives every step, so at criticality the
flow drifts from the true fixed point and accuracy stalls with chi.
``gilt_eps > 0`` enables GILT (graph-independent local truncation,
Hauru-Delcamp-Mizera PRB 97, 045111): before each split, every lattice
leg gets a near-identity matrix ``R = sum_a t'_a U_a`` built from the
eigenpairs of the plaquette loop's leg environment Gram matrix, with
``t' = t s^2 / (s^2 + eps^2)`` softly zeroing the directions the loop
cannot see — exactly the CDL directions.  ``R`` is SVD-split and its
halves absorbed into the adjacent tensors.  On the single-tensor
lattice the same (symmetry-shared) R applies uniformly to all
horizontal legs and all vertical legs.

MEASURED behavior of this uniform variant (Ising, chi = 8, eps =
1e-4): off-critical truncation error drops ~10x (5.3e-6 -> 5.8e-7 at
beta = 0.3); AT criticality it matches plain TRG (6.4e-5 either way —
swept eps 1e-6..1e-2 and reps 1..4).  Full Gilt-TNR critical gains
require the checkerboard-ASYMMETRIC application (R's derived per
contracted plaquette on a two-sublattice lattice, recursed to
convergence), which breaks the single-tensor uniformity this flow is
built on — a documented limitation, not a bug; use HOTRG/CTMRG at
higher chi for critical-point precision (their measured ladders are in
the tests and ROOFLINE.md).

TPU shape decisions: zero-padded static ``chi`` bonds and a whole flow
in ONE jitted ``lax.scan`` (SVD included — XLA lowers it on every
backend), split-format ``g -> 2 g + log c`` carry.  No counterpart
exists in the reference.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import dot_precision

__all__ = ["trg_log_z"]


def _pad4(a, chi):
    return jnp.pad(a, [(0, chi - s) for s in a.shape])


def _split(mat, chi, prec):
    """Rank-``chi`` SVD split ``mat ~ p1 @ p2.T`` (``p*: (n, chi)``)."""
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    rs = jnp.sqrt(s[:chi])
    p1 = u[:, :chi] * rs[None, :]
    p2 = vh[:chi, :].T * rs[None, :]
    del prec
    return p1, p2


def _trg_step(a, chi, prec):
    """One Levin-Nave step: split both sublattices, contract plaquettes.

    ``a1[u, r, k] a2[d, l, k]`` (even) and ``b1[u, l, k] b2[d, r, k]``
    (odd); the coarse tensor collects (NE, NW, SW, SE) = (k of the NE
    corner's lower piece, ...) as its ``(u, l, d, r)``.
    """
    # even split: rows (u, r), cols (d, l)
    m_e = jnp.transpose(a, (0, 3, 2, 1)).reshape(chi * chi, chi * chi)
    p1, p2 = _split(m_e, chi, prec)
    a1 = p1.reshape(chi, chi, chi)  # [u, r, k]
    a2 = p2.reshape(chi, chi, chi)  # [d, l, k]
    # odd split: rows (u, l), cols (d, r)
    m_o = a.reshape(chi * chi, chi * chi)
    q1, q2 = _split(m_o, chi, prec)
    b1 = q1.reshape(chi, chi, chi)  # [u, l, k]
    b2 = q2.reshape(chi, chi, chi)  # [d, r, k]

    # plaquette edges: L (left), B (bottom), R (right), T (top)
    # SW corner (even): a1[L, B, ka]   NW corner (odd): b2[L, T, kd]
    # SE corner (odd):  b1[R, B, kb]   NE corner (even): a2[R, T, kc]
    x = jnp.einsum("LBa,LTd->BaTd", a1, b2, precision=prec)
    y = jnp.einsum("RBb,RTc->BbTc", b1, a2, precision=prec)
    new = jnp.einsum("BaTd,BbTc->cdab", x, y, precision=prec)
    # (u', l', d', r') = (NE, NW, SW, SE) = (kc, kd, ka, kb)
    return new


def _closure(a):
    return jnp.einsum("ulul->", a, precision=dot_precision(a.dtype))


@partial(jax.jit, static_argnames=("chi", "steps", "gilt_eps",
                                   "gilt_reps"))
def _trg_flow(a0, chi, steps, gilt_eps=0.0, gilt_reps=2):
    prec = dot_precision(a0.dtype)
    c0 = jnp.maximum(jnp.mean(jnp.abs(a0)), 1e-300)
    carry0 = (a0 / c0, jnp.log(c0))

    def body(carry, _):
        a, g = carry
        if gilt_eps:
            a = _gilt_all_legs(a, chi, prec, gilt_eps, gilt_reps)
        a = _trg_step(a, chi, prec)
        c = jnp.maximum(jnp.mean(jnp.abs(a)), 1e-300)
        return (a / c, 2.0 * g + jnp.log(c)), c

    (a, g), _ = jax.lax.scan(body, carry0, None, length=steps)
    return (g + jnp.log(jnp.abs(_closure(a)))) / (2.0 ** steps)


def trg_log_z(a, chi, steps=30, gilt_eps=0.0, gilt_reps=2):
    """``log Z`` per site of the infinite square lattice by TRG.

    Args:
        a: site tensor ``(q, q, q, q)``, axes ``(u, l, d, r)``.
        chi: static bond dimension of the flow.
        steps: coarse-graining steps (each halves the site count).
        gilt_eps: GILT threshold; ``0`` disables loop filtering.
            ``~1e-7 .. 1e-5`` multiplies accuracy at criticality.
        gilt_reps: GILT recursion count per step (the R matrices are
            re-derived on the already-filtered tensor).
    """
    a = jnp.asarray(a)
    a0 = _pad4(a, chi)
    return float(_trg_flow(a0, chi, int(steps), float(gilt_eps),
                           int(gilt_reps)))


# ------------------------------------------------------------------ #
# GILT: graph-independent local truncation of plaquette loops
# ------------------------------------------------------------------ #

def _doubled_corners(a, prec):
    """Double-layer corner transfers of the plaquette loop, external
    legs traced with the conjugate layer.  Internal-leg pairs are kept
    as ``(ket, bra)``; returns (sw, se, ne, nw) with index layouts
    documented inline."""
    ac = jnp.conj(a)
    # SW: internal (u -> left edge, r -> bottom edge); trace (l, d)
    sw = jnp.einsum("uldr,ULdR->uUrR", a, ac, precision=prec)
    # SE: internal (u -> right edge, l -> bottom edge); trace (d, r)
    se = jnp.einsum("uldr,ULdr->uUlL", a, ac, precision=prec)
    # NE: internal (d -> right edge, l -> top edge); trace (u, r)
    ne = jnp.einsum("uldr,uLDr->dDlL", a, ac, precision=prec)
    # NW: internal (d -> left edge, r -> top edge); trace (u, l)
    nw = jnp.einsum("uldr,ulDR->dDrR", a, ac, precision=prec)
    return sw, se, ne, nw


def _gilt_r(a, prec, eps):
    """GILT R matrix for the BOTTOM leg of the plaquette loop.

    ``M[(i i'), (j j')]`` is the Gram matrix of the leg environment
    (the loop with the bottom leg cut; ``i`` = SW ket end, ``j`` = SE
    ket end).  ``R = sum_a t'_a U_a`` with ``t = <I, U_a>`` and the
    soft threshold ``t' = t s^2/(s^2 + eps^2)``.  Returned as
    ``R[i, j]`` to insert on the cut leg (SW's r index times SE's l).
    """
    chi = a.shape[0]
    sw, se, ne, nw = _doubled_corners(a, prec)
    # go around the top half: left edge (SW u <-> NW d), top edge
    # (NW r <-> NE l), right edge (NE d <-> SE u)
    half = jnp.einsum("uUrR,uUtT->rRtT", sw, nw, precision=prec)
    half = jnp.einsum(
        "rRtT,tTqQ->rRqQ", half,
        jnp.einsum("dDlL->lLdD", ne, precision=prec), precision=prec,
    )
    m = jnp.einsum("rRqQ,qQlL->rRlL", half, se, precision=prec)
    # regroup the Gram: rows = (ket i, ket j), cols = (bra i', bra j')
    m = jnp.transpose(m, (0, 2, 1, 3)).reshape(chi * chi, chi * chi)
    m = 0.5 * (m + m.conj().T)
    s2, u = jnp.linalg.eigh(m)  # ascending, s2 = singular values^2
    s2 = jnp.maximum(s2, 0.0)
    eye = jnp.eye(chi, dtype=a.dtype).reshape(chi * chi)
    t = jnp.einsum("i,ia->a", eye, jnp.conj(u), precision=prec)
    s2n = s2 / jnp.maximum(s2[-1], 1e-300)
    tp = t * (s2n / (s2n + eps * eps))
    return jnp.einsum("ia,a->i", u, tp, precision=prec).reshape(chi, chi)


def _gilt_all_legs(a, chi, prec, eps, reps):
    """Uniform single-tensor GILT: derive R for a horizontal leg and
    (by the 90-degree rotation) a vertical leg, split each, absorb the
    halves into every matching leg; repeat ``reps`` times."""
    for _ in range(reps):
        # horizontal legs (r of one site -- l of its right neighbor)
        r_h = _gilt_r(a, prec, eps)
        u, s, vh = jnp.linalg.svd(r_h)
        rs = jnp.sqrt(s)
        h1 = u * rs[None, :]          # absorbs into r legs
        h2 = (rs[:, None] * vh)       # absorbs into l legs (from left)
        a = jnp.einsum("uldr,rx->uldx", a, h1, precision=prec)
        a = jnp.einsum("yl,uldr->uydr", h2, a, precision=prec)
        # vertical legs: rotate so they sit horizontally, reuse
        ar = jnp.transpose(a, (1, 2, 3, 0))  # (u,l,d,r) <- (l,d,r,u)
        r_v = _gilt_r(ar, prec, eps)
        u2, s2, vh2 = jnp.linalg.svd(r_v)
        rs2 = jnp.sqrt(s2)
        v1 = u2 * rs2[None, :]
        v2 = (rs2[:, None] * vh2)
        ar = jnp.einsum("uldr,rx->uldx", ar, v1, precision=prec)
        ar = jnp.einsum("yl,uldr->uydr", v2, ar, precision=prec)
        a = jnp.transpose(ar, (3, 0, 1, 2))
    return a
