"""Matrix product operators and stabilized expectation values.

``<psi| O |psi>`` contracts the three-layer sandwich site by site, carrying
the ``(D, W, D)`` boundary environment in a stabilized scan — transfer
matrices of size ``(D^2 W)^2`` are never materialized.  Covers the BASELINE
"bond-64 MPS/MPO expectation values" config.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan import _stab_step
from ..ops.stabilize import destabilize
from ..ops.stabilize import dot_precision, peinsum


@jax.tree_util.register_pytree_node_class
@dataclass
class MPO:
    """Open-boundary MPO: cores ``(N, d_out, d_in, W, W)`` + boundary vectors.

    ``W`` is the operator bond dimension.
    """

    cores: jnp.ndarray
    left: jnp.ndarray  # (W,)
    right: jnp.ndarray  # (W,)

    def tree_flatten(self):
        return (self.cores, self.left, self.right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def random(cls, key, n_sites, phys_dim, bond_dim, dtype=jnp.float32,
               scale=None):
        if scale is None:
            scale = 1.0 / (bond_dim * phys_dim) ** 0.5
        kc, kl, kr = jax.random.split(key, 3)
        cores = scale * jax.random.normal(
            kc, (n_sites, phys_dim, phys_dim, bond_dim, bond_dim), dtype
        )
        left = jax.random.normal(kl, (bond_dim,), dtype)
        right = jax.random.normal(kr, (bond_dim,), dtype)
        return cls(cores, left, right)

    @classmethod
    def identity(cls, n_sites, phys_dim, dtype=jnp.float64):
        """The identity operator as a bond-1 MPO."""
        eye = jnp.eye(phys_dim, dtype=dtype)[None, :, :, None, None]
        cores = jnp.broadcast_to(eye, (n_sites, phys_dim, phys_dim, 1, 1))
        one = jnp.ones((1,), dtype)
        return cls(cores, one, one)

    @property
    def n_sites(self):
        return self.cores.shape[0]

    def expectation(self, mps, split_format=True):
        """Stabilized ``<psi| O |psi>`` for an MPS with matching ``N, d``.

        Environment ``env[i, w, k] = <bra-bond i | op-bond w | ket-bond k>``
        updates per site with three contractions (all GEMM-shaped):

        1. ket:   ``env . B[d']``       over the ket bond
        2. op:    ``W[d,d',w,w'] . *``  over ``(d', w)``
        3. bra:   ``conj(A[d]) . *``    over ``(d, i)``
        """
        env_dt = jnp.result_type(mps.cores.dtype, self.cores.dtype)
        env = peinsum(
            "i,w,k->iwk", jnp.conj(mps.left), self.left, mps.left
        ).astype(env_dt)
        log = jnp.zeros((), env.real.dtype)

        from ..ops.stabilize import dot_precision

        prec = dot_precision(mps.cores.dtype, self.cores.dtype)

        def step(carry, cores):
            env, log = carry
            a, w = cores  # (d, D, D), (d_out, d_in, W, W)
            t = jnp.einsum("iwk,ekl->iwel", env, a, precision=prec)
            t = jnp.einsum("dewv,iwel->idvl", w, t, precision=prec)
            env = jnp.einsum("dij,idvl->jvl", jnp.conj(a), t, precision=prec)
            env, log = _stab_step(env, log, 0)
            return (env, log), None

        (env, log), _ = jax.lax.scan(step, (env, log), (mps.cores, self.cores))
        val = peinsum(
            "iwk,i,w,k->", env, jnp.conj(mps.right), self.right, mps.right
        )
        val, log = _stab_step(val, log, 0)
        return (val, log) if split_format else destabilize(val, log)


def mpo_from_bond_term(h2, n_sites, d=2, tol=1e-12, dtype=None):
    """MPO for ``H = sum_i h2_{i, i+1}`` from the dense bond term.

    Generic construction for ANY nearest-neighbor Hamiltonian: SVD the
    term as ``h2 = sum_k U_k (x) V_k`` (operator Schmidt decomposition
    across the bond, rank ``r``), then assemble the standard triangular
    finite-state MPO with ``W = r + 2``.  Exactly reproduces the
    bond-sum Hamiltonian INCLUDING edges — unlike hand-built MPOs with
    per-site field terms, this matches the gate-based algorithms'
    (TEBD / iTEBD) bond-split convention term for term, so TDVP/DMRG
    and the gate evolvers can be cross-validated on the same operator.

    Args:
        h2: Hermitian two-site term, dense ``(d^2, d^2)``.
        n_sites: chain length.
        tol: singular values below ``tol * s[0]`` are dropped.

    Returns:
        An :class:`MPO` with ``cores (N, d, d, W, W)``.
    """
    h2 = np.asarray(h2)
    dtype = dtype or h2.dtype
    # reshuffle (s1 s2, s1' s2') -> ((s1 s1'), (s2 s2')) and SVD
    h4 = h2.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d * d, d * d)
    u, sv, vh = np.linalg.svd(h4, full_matrices=False)
    keep = sv > tol * (sv[0] if sv[0] > 0 else 1.0)
    u, sv, vh = u[:, keep], sv[keep], vh[keep]
    r = sv.shape[0]
    us = (u * np.sqrt(sv)[None, :]).T.reshape(r, d, d)    # U_k[s1, s1\']
    vs = (vh.T * np.sqrt(sv)[None, :]).T.reshape(r, d, d)  # V_k[s2, s2\']

    w = np.zeros((d, d, r + 2, r + 2), dtype)
    w[:, :, 0, 0] = np.eye(d)
    w[:, :, r + 1, r + 1] = np.eye(d)
    for k in range(r):
        w[:, :, 0, k + 1] = us[k]
        w[:, :, k + 1, r + 1] = vs[k]
    cores = jnp.asarray(np.broadcast_to(
        w, (n_sites, d, d, r + 2, r + 2)
    ), dtype)
    left = jnp.zeros((r + 2,), dtype).at[0].set(1.0)
    right = jnp.zeros((r + 2,), dtype).at[r + 1].set(1.0)
    return MPO(cores, left, right)


def rayleigh(mpo, mps):
    """``Re <psi|H|psi> / <psi|psi>`` as a host float, overflow-safe.

    Both expectation and norm come back in split format; combining the
    log registers BEFORE exponentiating keeps thousand-site chains
    finite.  The single home of an idiom that previously lived at six
    call sites.
    """
    num_v, num_l = mpo.expectation(mps)
    den_v, den_l = mps.norm_squared()
    return float(jnp.real(num_v / den_v)) * float(jnp.exp(num_l - den_l))


def mpo_sum(m1, m2):
    """``H1 + H2`` as one MPO by direct sum of the virtual channels.

    Block-diagonal cores with concatenated boundary vectors represent
    the sum EXACTLY for arbitrary MPOs (no triangularity assumptions),
    at bond ``W1 + W2`` — compressible afterwards with
    :func:`~contractn_tpu.models.canonical.compress_mpo` if needed.
    Parity note: the reference has no operator algebra at all
    (SURVEY.md §2); this mirrors standard MPO arithmetic.
    """
    c1, c2 = jnp.asarray(m1.cores), jnp.asarray(m2.cores)
    if c1.shape[0] != c2.shape[0] or c1.shape[1] != c2.shape[1]:
        raise ValueError(
            f"mpo_sum needs matching sites/phys dims; got "
            f"{c1.shape} vs {c2.shape}"
        )
    dt = jnp.result_type(c1.dtype, c2.dtype)
    n, d, _, w1, _ = c1.shape
    w2 = c2.shape[3]
    cores = jnp.zeros((n, d, d, w1 + w2, w1 + w2), dt)
    cores = cores.at[:, :, :, :w1, :w1].set(c1.astype(dt))
    cores = cores.at[:, :, :, w1:, w1:].set(c2.astype(dt))
    left = jnp.concatenate([jnp.asarray(m1.left, dt),
                            jnp.asarray(m2.left, dt)])
    right = jnp.concatenate([jnp.asarray(m1.right, dt),
                             jnp.asarray(m2.right, dt)])
    return MPO(cores, left, right)


def deparallelize_mpo(mpo, tol=1e-12, max_passes=8):
    """EXACT bond reduction that preserves the triangular automaton.

    SVD compression reaches smaller bonds but destroys the
    ``[I C D; 0 A B; 0 0 I]`` channel structure the W^II propagator
    builder requires; deparallelisation (Hubig-McCulloch-Schollwoeck)
    merges PARALLEL virtual channels instead — drop zero columns,
    fold ``col_j = c * col_k`` into ``col_k`` by adding ``c x row_j``
    into the next core's ``row_k`` — which is exact and keeps the
    form.  The first/last identity channels are always kept, and
    nothing merges INTO the last column (forward) or the first row
    (backward): that would write term content into the closed
    identity channels.

    Alternating forward/backward passes until stable.  The naive
    one-channel-per-term finite-state machines of ``op_sum_mpo(...,
    compress=False)`` reduce to their minimal automata (the
    Heisenberg chain's 23-channel FSM lands on the textbook W = 5).
    """
    cores_in = np.asarray(mpo.cores)
    n, do, di, wmax, _ = cores_in.shape
    left = np.asarray(mpo.left)
    right = np.asarray(mpo.right)
    if abs(left[0] - 1.0) > 1e-12 or np.any(left[1:] != 0):
        raise ValueError("deparallelize_mpo expects left boundary e_0")
    if abs(right[-1] - 1.0) > 1e-12 or np.any(right[:-1] != 0):
        raise ValueError(
            "deparallelize_mpo expects right boundary e_last")
    sites = [cores_in[i] for i in range(n)]
    # fold the boundary vectors into width-1 edges: bond 0 carries only
    # the start channel, bond n only the done channel — dead edge
    # rows/columns would otherwise keep interior channels alive
    sites[0] = sites[0][:, :, :1, :]
    sites[-1] = sites[-1][:, :, :, -1:]

    def fwd_bond(a, b):
        """Dedup columns of ``a``; returns (a', b') or None."""
        wr = a.shape[3]
        cols = a.reshape(-1, wr)
        kept = [0]
        trans = {0: (0, 1.0)}  # old index -> (kept position, coeff)
        for v in range(1, wr - 1):
            c = cols[:, v]
            nc = np.linalg.norm(c)
            if nc <= tol:
                trans[v] = None
                continue
            hit = None
            for pos, k in enumerate(kept):
                if k == wr - 1:
                    continue  # never merge into the done channel
                kc = cols[:, k]
                coef = np.vdot(kc, c) / np.vdot(kc, kc)
                if np.linalg.norm(c - coef * kc) <= tol * nc:
                    hit = (pos, coef)
                    break
            if hit is None:
                trans[v] = (len(kept), 1.0)
                kept.append(v)
            else:
                trans[v] = hit
        trans[wr - 1] = (len(kept), 1.0)
        kept.append(wr - 1)
        if len(kept) == wr:
            return None
        a2 = a[:, :, :, kept]
        b2 = np.zeros((b.shape[0], b.shape[1], len(kept), b.shape[3]),
                      b.dtype)
        for v, hit in trans.items():
            if hit is None:
                continue
            pos, coef = hit
            b2[:, :, pos, :] += coef * b[:, :, v, :]
        return a2, b2

    def transpose_site(a):
        return a.transpose(0, 1, 3, 2)

    for _ in range(max_passes):
        changed = False
        for i in range(n - 1):
            got = fwd_bond(sites[i], sites[i + 1])
            if got is not None:
                sites[i], sites[i + 1] = got
                changed = True
        for i in range(n - 1, 0, -1):
            # backward = forward on the leg-transposed pair, which
            # swaps the roles: rows of site i dedup into the columns
            # of site i-1; the "done" guard then protects row 0, so
            # reverse the channel order first (0 <-> last)
            a = transpose_site(sites[i])[:, :, :, ::-1]
            b = transpose_site(sites[i - 1])[:, :, ::-1, :]
            got = fwd_bond(a, b)
            if got is not None:
                a2, b2 = got
                sites[i] = transpose_site(a2[:, :, :, ::-1])
                sites[i - 1] = transpose_site(b2[:, :, ::-1, :])
                changed = True
        if not changed:
            break

    widths = [sites[0].shape[2]] + [s.shape[3] for s in sites]
    w2 = max(max(widths), 2)

    def pos_map(bond, k):
        # bond 0 = [start]; bond n = [done]; internal = [start,
        # interiors.., done] with done pinned at the LAST padded slot
        if bond == 0:
            return np.array([0])
        if bond == n:
            return np.array([w2 - 1])
        return np.concatenate([np.arange(k - 1), [w2 - 1]])

    out = np.zeros((n, do, di, w2, w2), cores_in.dtype)
    for i, s in enumerate(sites):
        pl = pos_map(i, s.shape[2])
        pr = pos_map(i + 1, s.shape[3])
        out[i][:, :, pl[:, None], pr[None, :]] = s
    el = np.zeros(w2, cores_in.dtype)
    el[0] = 1.0
    er = np.zeros(w2, cores_in.dtype)
    er[-1] = 1.0
    return MPO(jnp.asarray(out), jnp.asarray(el), jnp.asarray(er))


def mpo_dagger(mpo):
    """Hermitian adjoint ``O^+``: conjugate cores, swap the physical
    legs.  Virtual bonds keep their orientation, so the adjoint of a
    triangular finite-state MPO is again a valid (lower-triangular)
    automaton with the same boundary channels."""
    return MPO(
        jnp.conj(jnp.swapaxes(jnp.asarray(mpo.cores), 1, 2)),
        jnp.conj(jnp.asarray(mpo.left)),
        jnp.conj(jnp.asarray(mpo.right)),
    )


def mpo_multiply(m1, m2):
    """Exact operator product ``O1 O2`` at bond ``W1 * W2``.

    Per-site core ``(W1 W2)``-fused Kronecker contraction over the
    shared physical leg; boundary vectors Kronecker.  The product of
    two triangular finite-state machines is generally NOT minimal —
    compress with :func:`~contractn_tpu.models.canonical.compress_mpo`
    (exact-rank cutoff) before feeding solvers.  Enables operator
    algebra the reference lacks entirely: ``H^2`` variance
    certificates, Liouvillian normal products ``L^+ L`` for
    steady-state DMRG (:func:`~contractn_tpu.models.lindblad.
    ness_dmrg`), and MPO-MPO time-step composition.
    """
    c1, c2 = jnp.asarray(m1.cores), jnp.asarray(m2.cores)
    if c1.shape[0] != c2.shape[0] or c1.shape[2] != c2.shape[1]:
        raise ValueError(
            f"mpo_multiply needs matching sites and inner phys dims; "
            f"got {c1.shape} vs {c2.shape}"
        )
    n, do = c1.shape[0], c1.shape[1]
    di = c2.shape[2]
    w1, v1 = c1.shape[3], c1.shape[4]
    w2, v2 = c2.shape[3], c2.shape[4]
    cores = peinsum("nakwv,nkbWV->nabwWvV", c1, c2).reshape(
        n, do, di, w1 * w2, v1 * v2
    )
    left = jnp.kron(jnp.asarray(m1.left), jnp.asarray(m2.left))
    right = jnp.kron(jnp.asarray(m1.right), jnp.asarray(m2.right))
    return MPO(cores, left, right)


def block_mpo(mpo, block=2):
    """Coarse-grain an MPO by contracting ``block`` consecutive cores.

    The blocked core ``W_blk[(s1..sb), (t1..tb), a, c] = (W_1 W_2 ...
    W_b)[a, c]`` (matrix product over the shared channel bond) acts on
    the ``d^block``-dimensional blocked site.  Products of triangular
    finite-state MPOs stay triangular with identity corners, so a
    blocked cell feeds straight into :func:`~contractn_tpu.models.
    vumps.vumps` / the excitation machinery — the route to MULTI-SITE
    unit cells (staggered or dimerized chains) through the one-site
    algorithms, at the cost of ``d -> d^block``.

    ``mpo.n_sites`` must divide by ``block``; boundary vectors are
    unchanged (they contract the outer channel bonds).
    """
    cores = jnp.asarray(mpo.cores)
    n, d, _, wdim, _ = cores.shape
    if n % block:
        raise ValueError(
            f"n_sites={n} must divide by block={block}"
        )
    prec = dot_precision(cores.dtype)
    blocked = cores.reshape(n // block, block, d, d, wdim, wdim)

    def contract_block(ws):
        out = ws[0]  # (d, d, W, W), phys legs accumulate left
        for i in range(1, block):
            out = jnp.einsum("ABxm,abmc->AaBbxc", out, ws[i],
                             precision=prec)
            dd = out.shape[0] * out.shape[1]
            out = out.reshape(dd, dd, wdim, wdim)
        return out

    new_cores = jax.vmap(contract_block)(blocked)
    return MPO(new_cores, mpo.left, mpo.right)


# --------------------------------------------------------------------- #
# Infinite-chain bulk-core algebra (triangular, identity corners)
# --------------------------------------------------------------------- #


def _check_umpo(w, name):
    w = jnp.asarray(w)
    if w.ndim != 4 or w.shape[2] != w.shape[3] or w.shape[2] < 2:
        raise ValueError(
            f"{name} needs a (d, d, W, W) bulk core with W >= 2; "
            f"got shape {w.shape}"
        )
    eye = jnp.eye(w.shape[0], dtype=w.dtype)
    for idx in (0, w.shape[2] - 1):
        if float(jnp.max(jnp.abs(w[:, :, idx, idx] - eye))) > 1e-12:
            raise ValueError(
                f"{name} needs identity corners at [0, 0] and "
                f"[W-1, W-1] (the tfim_mpo / InfiniteOpSum.to_umpo "
                f"convention); corner [{idx}, {idx}] is not identity"
            )
    return w


def umpo_scale(core, c):
    """``c * H`` for an infinite triangular bulk core.

    Every automaton path of an upper-triangular core with identity
    corners leaves the initial state 0 exactly once (state 0 is only
    reachable from itself), so scaling row 0's outgoing entries
    ``w[0, a > 0]`` scales every Hamiltonian term by ``c`` while the
    identity corners — which the environment solvers of
    :func:`~contractn_tpu.models.vumps.mpo_environments` key on —
    stay untouched.  Interior diagonal channels (exponentially
    decaying couplings) are covered by the same argument.
    """
    w = _check_umpo(core, "umpo_scale")
    c = jnp.asarray(c)
    w = w.astype(jnp.result_type(w.dtype, c.dtype))
    return w.at[:, :, 0, 1:].multiply(c)


def umpo_sum(core1, core2):
    """``H1 + H2`` as ONE infinite triangular bulk core.

    Direct sum of the interior automaton states with the identity
    corners SHARED (``W' = W1 + W2 - 2``) and the one-site corner
    blocks ``w[0, W-1]`` added — the uniform-chain analog of
    :func:`mpo_sum`, preserving the upper-triangular identity-corner
    structure that :func:`~contractn_tpu.models.vumps.
    mpo_environments` / the W^II evolver require (a plain
    block-diagonal sum would duplicate the corners and break both).
    No reference counterpart (the reference has no operator layer,
    SURVEY.md section 2).
    """
    w1 = _check_umpo(core1, "umpo_sum")
    w2 = _check_umpo(core2, "umpo_sum")
    if w1.shape[0] != w2.shape[0]:
        raise ValueError(
            f"umpo_sum needs matching physical dims; got "
            f"{w1.shape[0]} vs {w2.shape[0]}"
        )
    d = w1.shape[0]
    n1, n2 = w1.shape[2], w2.shape[2]
    nw = n1 + n2 - 2
    dt = jnp.result_type(w1.dtype, w2.dtype)
    out = jnp.zeros((d, d, nw, nw), dt)
    eye = jnp.eye(d, dtype=dt)
    out = out.at[:, :, 0, 0].set(eye)
    out = out.at[:, :, nw - 1, nw - 1].set(eye)
    out = out.at[:, :, 0, nw - 1].set(
        w1[:, :, 0, n1 - 1] + w2[:, :, 0, n2 - 1])
    # interior state maps: w1 a in 1..n1-2 -> a; w2 b in 1..n2-2 ->
    # n1 - 2 + b
    out = out.at[:, :, 0, 1:n1 - 1].set(w1[:, :, 0, 1:n1 - 1])
    out = out.at[:, :, 1:n1 - 1, nw - 1].set(w1[:, :, 1:n1 - 1, n1 - 1])
    out = out.at[:, :, 1:n1 - 1, 1:n1 - 1].set(
        w1[:, :, 1:n1 - 1, 1:n1 - 1])
    out = out.at[:, :, 0, n1 - 1:nw - 1].set(w2[:, :, 0, 1:n2 - 1])
    out = out.at[:, :, n1 - 1:nw - 1, nw - 1].set(
        w2[:, :, 1:n2 - 1, n2 - 1])
    out = out.at[:, :, n1 - 1:nw - 1, n1 - 1:nw - 1].set(
        w2[:, :, 1:n2 - 1, 1:n2 - 1])
    return out


def umpo_onsite(op):
    """``sum_j op_j`` (one term per site) as a ``W = 2`` triangular
    bulk core — the uniform-chain field/dissipator building block for
    :func:`umpo_sum` compositions."""
    op = jnp.asarray(op)
    if op.ndim != 2 or op.shape[0] != op.shape[1]:
        raise ValueError(f"umpo_onsite needs a square (d, d) operator; "
                         f"got {op.shape}")
    d = op.shape[0]
    dt = jnp.result_type(op.dtype, jnp.float64)
    eye = jnp.eye(d, dtype=dt)
    out = jnp.zeros((d, d, 2, 2), dt)
    out = out.at[:, :, 0, 0].set(eye).at[:, :, 1, 1].set(eye)
    return out.at[:, :, 0, 1].set(op.astype(dt))
