"""MPS canonicalization and SVD compression.

Standard tensor-network operations the reference does not provide: bring an
MPS into left-canonical form (QR sweep) and truncate bond dimensions by SVD
with a reported truncation error.  TPU-minded design decision: compressed
MPS keep a UNIFORM (static) bond dimension — per-site effective ranks are
zero-padded up to the common bond — so the result is again a stacked
``(N, d, D', D')`` pytree that scans, shards, and jits like any other MPS.

Decompositions run through ``jnp.linalg`` (QR/SVD), which XLA executes on
CPU/TPU; the per-site sweep is a host loop over N sites (each step jitted
by shape), appropriate for a preprocessing pass.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision, peinsum
from .mps import MPS


def _site_tensors(mps):
    """Absorb boundary vectors: [(d, D), (d, D, D) x (N-2), (d, D)]."""
    cores = mps.cores
    n = cores.shape[0]
    first = peinsum("i,dij->dj", mps.left, cores[0])
    tensors = [first]
    for i in range(1, n - 1):
        tensors.append(cores[i])
    if n > 1:
        tensors.append(peinsum("dij,j->di", cores[-1], mps.right))
    return tensors


def _single_site_normalized(mps):
    """The n_sites == 1 degenerate case of every sweep: absorb BOTH
    boundaries into the one site and normalize.  Returns
    ``(MPS with core (1, d, 1, 1), log_norm)``."""
    v = peinsum("i,dij,j->d", mps.left, mps.cores[0], mps.right)
    nrm = jnp.linalg.norm(v)
    log_norm = float(jnp.log(jnp.maximum(nrm, 1e-300)))
    core = (v / jnp.maximum(nrm, 1e-300)).reshape(1, -1, 1, 1)
    e = jnp.ones((1,), core.dtype)
    return MPS(core, e, e), log_norm


def _rebuild(tensors, dtype):
    """Uniform stacked MPS from ragged site tensors (zero-padded bonds).

    ``tensors[0]``: (d, r1); middle: (d, r_{i}, r_{i+1}); last: (d, r_{N-1}).
    """
    n = len(tensors)
    d = tensors[0].shape[0]
    ranks = [t.shape[-1] for t in tensors[:-1]]
    bond = max(ranks) if ranks else 1
    cores = np.zeros((n, d, bond, bond), dtype)
    # First site: row 0 carries the tensor (left boundary = e0)
    r1 = tensors[0].shape[1]
    cores[0, :, 0, :r1] = np.asarray(tensors[0])
    for i in range(1, n - 1):
        ri, ro = tensors[i].shape[1], tensors[i].shape[2]
        cores[i, :, :ri, :ro] = np.asarray(tensors[i])
    rn = tensors[-1].shape[1]
    cores[-1, :, :rn, 0] = np.asarray(tensors[-1])
    e0 = np.zeros((bond,), dtype)
    e0[0] = 1.0
    return MPS(jnp.asarray(cores), jnp.asarray(e0), jnp.asarray(e0))


def compress_mpo(mpo, max_bond=None, cutoff=0.0):
    """SVD-compress an MPO's operator bonds.

    An MPO is an MPS whose physical index is the ``(d_out, d_in)`` pair, so
    the state-compression machinery applies verbatim after a reshape.
    Returns ``(compressed_mpo, log_norm, truncation_error)`` — the operator
    is Frobenius-normalized with its scale in ``log_norm``.
    """
    from .mpo import MPO

    n, do, di, w, _ = mpo.cores.shape
    as_mps = MPS(mpo.cores.reshape(n, do * di, w, w), mpo.left, mpo.right)
    comp, log_norm, err = compress(as_mps, max_bond=max_bond, cutoff=cutoff)
    w2 = comp.bond_dim
    out = MPO(comp.cores.reshape(n, do, di, w2, w2), comp.left, comp.right)
    return out, log_norm, err


def imaginary_time_step(mps, mpo, tau, max_bond):
    """One power-method step toward the MPO's ground state:
    ``|psi'> = normalize[(1 - tau H) |psi>]``, compressed to ``max_bond``.

    Composes three framework primitives — exact MPO application, MPS
    addition, SVD compression — into the simplest imaginary-time/power
    iteration.  Returns ``(new_mps, energy_estimate)`` where the energy is
    the Rayleigh quotient of the *input* state.
    """
    from .boundary import apply_mpo_to_mps

    h_psi = apply_mpo_to_mps(mpo, mps)
    # Rayleigh quotient <psi|H|psi>/<psi|psi> from split-format pieces
    num_v, num_l = mpo.expectation(mps)
    den_v, den_l = mps.norm_squared()
    energy = float(num_v) / float(den_v) * float(jnp.exp(num_l - den_l))
    scaled = MPS(h_psi.cores, -tau * h_psi.left, h_psi.right)
    new_mps, _, _ = mps_add(mps, scaled, max_bond=max_bond)
    return new_mps, energy


def mps_add(a, b, max_bond=None):
    """Sum of two MPS: ``|a> + |b>`` via bond-wise direct sum.

    Cores block-diagonalize (new bond = ``Da + Db``), boundary vectors
    concatenate — an exact representation.  With ``max_bond`` set the sum
    is immediately re-compressed (returning the normalized state with its
    log-norm and truncation error, as :func:`compress` does); otherwise the
    exact direct-sum MPS is returned.

    Scalar multiples compose: scale a state by folding the factor into its
    boundary (``MPS(cores, alpha * left, right)``), so ``a - b`` is
    ``mps_add(a, MPS(b.cores, -b.left, b.right))``.
    """
    if a.n_sites != b.n_sites or a.phys_dim != b.phys_dim:
        raise ValueError("mps_add needs matching n_sites and phys_dim")
    n, d = a.n_sites, a.phys_dim
    da, db = a.bond_dim, b.bond_dim
    bond = da + db
    dtype = np.result_type(np.asarray(a.cores).dtype,
                           np.asarray(b.cores).dtype)
    cores = np.zeros((n, d, bond, bond), dtype)
    cores[:, :, :da, :da] = np.asarray(a.cores)
    cores[:, :, da:, da:] = np.asarray(b.cores)
    left = np.concatenate([np.asarray(a.left), np.asarray(b.left)])
    right = np.concatenate([np.asarray(a.right), np.asarray(b.right)])
    out = MPS(jnp.asarray(cores), jnp.asarray(left), jnp.asarray(right))
    if max_bond is not None:
        return compress(out, max_bond=max_bond)
    return out


def _qr_dtype(dtype):
    """QR needs a real f32/f64 (or complex) dtype; bf16 cores upcast."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.bfloat16) or d == jnp.dtype(jnp.float16):
        return jnp.float32
    return d


@jax.jit
def _left_qr_sweep(cores, left, right):
    """Whole left-canonicalization sweep as ONE scanned program.

    Carry: the ``(D, D)`` remainder matrix C (everything to the left,
    QR-factored away) plus the log-scale register.  Per step:
    ``T = C . A_site`` then ``T = Q R`` with Q emitted as the new site.
    The round-1 implementation dispatched one QR per site from a host
    loop with a ``float(scale)`` sync each — O(N) device round-trips
    (~28 ms each on the axon tunnel); this is one dispatch and zero
    intermediate syncs.
    """
    n, d, bond, _ = cores.shape
    dt = _qr_dtype(cores.dtype)
    cores = cores.astype(dt)
    prec = dot_precision(dt)
    e0 = jnp.zeros((bond,), dt).at[0].set(1.0)
    c0 = jnp.outer(e0, left.astype(dt))

    def step(carry, a):
        c, log = carry
        t = jnp.einsum("ab,dbc->dac", c, a, precision=prec)
        q, r = jnp.linalg.qr(t.reshape(d * bond, bond))
        scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
        return (r / scale, log + jnp.log(scale)), q.reshape(d, bond, bond)

    (c, log), qs = jax.lax.scan(
        step, (c0, jnp.zeros((), jnp.zeros((), dt).real.dtype)), cores
    )
    w = jnp.einsum("ab,b->a", c, right.astype(dt), precision=prec)
    nrm = jnp.maximum(jnp.linalg.norm(w), 1e-300)
    return qs, e0, w / nrm, log + jnp.log(nrm)


def left_canonicalize(mps):
    """QR sweep: returns ``(canonical_mps, log_norm)``.

    Every site becomes a left isometry (``sum_d A_d^H A_d = I``); the
    chain's norm is factored out into ``log_norm`` with the remainder
    absorbed into a normalized RIGHT boundary vector, so
    ``<psi|psi> = exp(2 * log_norm)``.  One jitted scan program
    (bf16 cores upcast to f32 for the QR).
    """
    if mps.n_sites == 1:
        return _single_site_normalized(mps)
    qs, e0, w, log = _left_qr_sweep(mps.cores, mps.left, mps.right)
    return MPS(qs, e0, w), float(log)


@jax.jit
def _right_qr_sweep(cores, left, right):
    """Mirror sweep: RQ from the right, one scanned program."""
    n, d, bond, _ = cores.shape
    dt = _qr_dtype(cores.dtype)
    cores = cores.astype(dt)
    prec = dot_precision(dt)
    e0 = jnp.zeros((bond,), dt).at[0].set(1.0)
    c0 = jnp.outer(right.astype(dt), e0)

    def step(carry, a):
        c, log = carry
        t = jnp.einsum("dab,bc->dac", a, c, precision=prec)
        m = t.swapaxes(0, 1).reshape(bond, d * bond)
        # RQ via QR of the transpose: m = (q r)^T = r^T q^T
        q, r = jnp.linalg.qr(m.T)
        scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
        site = q.T.reshape(bond, d, bond).swapaxes(0, 1)
        return (r.T / scale, log + jnp.log(scale)), site

    (c, log), qs = jax.lax.scan(
        step, (c0, jnp.zeros((), jnp.zeros((), dt).real.dtype)),
        jnp.flip(cores, 0),
    )
    qs = jnp.flip(qs, 0)
    w = jnp.einsum("a,ab->b", left.astype(dt), c, precision=prec)
    nrm = jnp.maximum(jnp.linalg.norm(w), 1e-300)
    return qs, w / nrm, e0, log + jnp.log(nrm)


def right_canonicalize(mps):
    """Mirror of :func:`left_canonicalize`: RQ sweep from the right.

    Every site becomes a right isometry (``sum_d A_d A_d^H = I``) — the
    form needed for exact autoregressive sampling
    (:func:`contractn_tpu.models.sampling`) — with the remainder in a
    normalized LEFT boundary vector.  Returns ``(canonical_mps,
    log_norm)``; one jitted scan program.
    """
    if mps.n_sites == 1:
        return _single_site_normalized(mps)
    qs, w, e0, log = _right_qr_sweep(mps.cores, mps.left, mps.right)
    return MPS(qs, w, e0), float(log)


@partial(jax.jit, static_argnums=(3,))
def _fixed_svd_sweep(cores, left, right, chi):
    """Right-to-left SVD truncation to a STATIC bond ``chi``, scanned.

    Input cores must be left-isometric (run :func:`_left_qr_sweep`
    first) so per-bond truncation is globally optimal.  All shapes are
    static — ``(N, d, Db, Db)`` in, ``(N, d, chi, chi)`` out — so the
    whole sweep jits as one program and can run INSIDE another scan
    (the device-side boundary-MPS sweep batches row absorptions this
    way).  Effective ranks below ``chi`` appear as zero-padded bonds,
    the framework's uniform-bond convention.

    Returns ``(cores', new_left, new_right, log_norm, err_sq)`` where
    the output state is normalized and ``err_sq`` is the total discarded
    squared weight (relative, since the input is isometric+normalized).
    """
    n, d, db, _ = cores.shape
    dt = _qr_dtype(cores.dtype)
    cores = cores.astype(dt)
    prec = dot_precision(dt)
    rdt = jnp.zeros((), dt).real.dtype
    k = min(db, d * chi)  # singular values per step (static)

    # Carry: M (Db, chi) maps old right bond -> new right bond
    m0 = jnp.zeros((db, chi), dt)
    m0 = m0.at[:, 0].set(right.astype(dt))

    def step(carry, a):
        m, log, err = carry
        t = jnp.einsum("dab,bc->dac", a, m, precision=prec)  # (d, Db, chi)
        mat = t.swapaxes(0, 1).reshape(db, d * chi)
        u, s, vh = jnp.linalg.svd(mat, full_matrices=False)  # k singulars
        if k > chi:
            # s is in the rescaled frame; exp(2*log) restores true units
            # (bounded: the input is isometric + normalized, so log ~ 0)
            err = err + jnp.sum(s[chi:] ** 2) * jnp.exp(2.0 * log)
            u, s, vh = u[:, :chi], s[:chi], vh[:chi]
        elif k < chi:
            u = jnp.pad(u, ((0, 0), (0, chi - k)))
            s = jnp.pad(s, (0, chi - k))
            vh = jnp.pad(vh, ((0, chi - k), (0, 0)))
        site = vh.reshape(chi, d, chi).swapaxes(0, 1)  # (d, chi, chi)
        m = u * s[None, :]
        scale = jnp.maximum(jnp.max(jnp.abs(m)), 1e-300)
        return (m / scale, log + jnp.log(scale), err), site

    init = (m0, jnp.zeros((), rdt), jnp.zeros((), rdt))
    (m, log, err), sites = jax.lax.scan(
        step, init, jnp.flip(cores, 0)
    )
    sites = jnp.flip(sites, 0)
    new_left = jnp.einsum("a,ac->c", left.astype(dt), m, precision=prec)
    nrm = jnp.maximum(jnp.linalg.norm(new_left), 1e-300)
    e0 = jnp.zeros((chi,), dt).at[0].set(1.0)
    return sites, new_left / nrm, e0, log + jnp.log(nrm), err


def compress_fixed(mps, chi):
    """Fully-jitted SVD compression to a STATIC uniform bond ``chi``.

    The device-side counterpart of :func:`compress`: a scanned QR sweep
    (left-canonicalize) followed by a scanned fixed-``chi`` SVD sweep —
    two device dispatches total, no per-site host loops, shapes all
    static (effective ranks below ``chi`` are zero-padded).  This is the
    building block the boundary-MPS PEPS contraction scans over rows.

    Returns ``(compressed_mps, log_norm, truncation_error)`` with the
    state normalized, exactly like :func:`compress`.
    """
    if chi < 1:
        raise ValueError(f"chi must be >= 1, got {chi}")
    if mps.n_sites == 1:
        out, log_norm = _single_site_normalized(mps)
        return out, log_norm, 0.0
    qs, e0, w, log_qr = _left_qr_sweep(mps.cores, mps.left, mps.right)
    sites, new_left, new_right, log_svd, err_sq = _fixed_svd_sweep(
        qs, e0, w, int(chi)
    )
    # traced values (no host sync): compress_fixed must be usable
    # inside jit/grad — the differentiable fermionic-PEPS energy
    # differentiates straight through it
    return (MPS(sites, new_left, new_right), log_qr + log_svd,
            jnp.sqrt(err_sq))


def compress(mps, max_bond=None, cutoff=0.0):
    """Truncate an MPS's bonds by SVD.

    A left-canonical QR sweep followed by a right-to-left SVD sweep keeping
    at most ``max_bond`` singular values per bond (and none below
    ``cutoff`` relative to the largest).

    Returns:
        ``(compressed_mps, log_norm, truncation_error)`` where the state is
        normalized (``<psi|psi> = 1``), its original norm is
        ``exp(log_norm)``, and ``truncation_error`` is the relative 2-norm
        of everything discarded (0 when ``max_bond`` exceeds the ranks).
    """
    if max_bond is not None and max_bond < 1:
        raise ValueError(f"max_bond must be >= 1, got {max_bond}")
    if mps.n_sites == 1:
        out, log_norm = _single_site_normalized(mps)
        return out, log_norm, 0.0
    canonical, log_norm = left_canonicalize(mps)
    tensors = _site_tensors(canonical)
    n = len(tensors)
    err_sq = 0.0
    # Right-to-left: SVD each site (rows = left bond, cols = phys x right),
    # truncate, absorb U @ diag(s) into the site to the left
    for i in range(n - 1, 0, -1):
        t = tensors[i]
        if t.ndim == 2:  # last site (d, Din)
            mat = t.T  # (Din, d)
        else:  # middle site (d, Din, Dout) -> (Din, d*Dout)
            mat = jnp.swapaxes(t, 0, 1).reshape(t.shape[1], -1)
        u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
        k = s.shape[0]
        if max_bond is not None:
            k = min(k, max_bond)
        if cutoff > 0:
            above = int(jnp.sum(s > cutoff * s[0]))
            k = min(k, max(above, 1))
        err_sq += float(jnp.sum(s[k:] ** 2))
        u, s, vh = u[:, :k], s[:k], vh[:k]
        if t.ndim == 2:
            tensors[i] = vh.T  # (d, k)
        else:
            tensors[i] = jnp.swapaxes(
                vh.reshape(k, t.shape[0], t.shape[2]), 0, 1
            )  # (d, k, Dout)
        carry = u * s[None, :]  # (Din, k)
        tensors[i - 1] = peinsum("...i,ik->...k", tensors[i - 1], carry)
    # Renormalize (truncation removes weight from the state)
    first = tensors[0]
    nrm = jnp.linalg.norm(first)
    log_norm += float(jnp.log(jnp.maximum(nrm, 1e-300)))
    tensors[0] = first / nrm
    err = float(np.sqrt(err_sq))
    return _rebuild(tensors, np.asarray(mps.cores).dtype), log_norm, err


@jax.jit
def _bond_spectra_scan(cores, right):
    """Right-density carry ``rho -> sum_d A_d rho A_d^+`` over the
    left-canonical chain, emitting the bond eigenvalues."""
    prec = dot_precision(cores.dtype)
    rho0 = jnp.outer(right, jnp.conj(right))

    def step(rho, a):
        rho = jnp.einsum("dij,jk,dlk->il", a, rho, jnp.conj(a),
                         precision=prec)
        tr = jnp.real(jnp.trace(rho))
        probs = jnp.linalg.eigvalsh(rho) / jnp.maximum(tr, 1e-300)
        return rho, probs

    # cores[n-1] gives the bond left of the last site, ... cores[1]
    # gives bond 0; scan reversed and flip the emitted stack.
    _, probs = jax.lax.scan(step, rho0, cores[1:], reverse=True)
    return jnp.clip(probs[:, ::-1], 0.0, 1.0)


def schmidt_spectra(mps):
    """Squared Schmidt coefficients on every internal bond.

    Left-canonicalize (one jitted QR sweep), then ONE jitted scan of
    the right reduced density ``rho_i = sum_d A_d rho_{i+1} A_d^+``
    whose eigenvalues at bond ``i`` ARE the Schmidt weights (the left
    block is orthonormal by canonical form).  Returns ``(N-1, D)``
    descending-padded probabilities, each row summing to 1.
    """
    lc, _ = left_canonicalize(mps)
    probs = _bond_spectra_scan(lc.cores, lc.right)
    return probs


def entanglement_entropy(mps, alpha=1):
    """Bipartite entanglement entropy across every internal bond.

    ``alpha=1`` gives von Neumann ``-sum p ln p``; other ``alpha`` the
    Renyi entropy ``ln(sum p^alpha) / (1 - alpha)``.  Returns an
    ``(N-1,)`` array (natural log).  The standard entanglement
    diagnostic the reference lacks entirely; validated against dense
    Schmidt decompositions and the GHZ/product closed forms
    (tests/test_entropy.py).
    """
    probs = schmidt_spectra(mps)
    if alpha == 1:
        plogp = jnp.where(probs > 1e-300, probs * jnp.log(probs), 0.0)
        return -jnp.sum(plogp, axis=1)
    if alpha <= 0:
        raise ValueError("Renyi index must be positive")
    return jnp.log(jnp.sum(probs ** alpha, axis=1)) / (1.0 - alpha)


def truncate_safe(cores, left, right, chi):
    """Differentiable canonicalize-and-truncate of a RAGGED boundary.

    Input is a LIST of ``(d, Dl, Dr)`` cores (per-site bond dims may
    differ — the form boundary-MPS contractions grow), compressed to
    bond ``chi`` by a left canonicalization sweep + right-to-left
    truncation sweep.  Both sweeps use
    :func:`~contractn_tpu.ops.linalg_ad.svd_safe` (degeneracy-broadened
    VJPs), because the padded/rank-deficient bonds these contractions
    produce NaN stock QR/SVD gradients — ``jax.grad`` flows through the
    whole compression.  Host-unrolled over the few columns (this is the
    inner step of 2D energy/amplitude sweeps, not a long-chain pass).

    Returns ``(cores, log_norm)`` with the boundary weights absorbed
    and the state normalized; promoted from the fermionic-PEPS module
    where it was born (it is layer-agnostic).
    """
    from ..ops.linalg_ad import svd_safe

    n = len(cores)
    carry = left[None, :]
    log = jnp.zeros(())
    lcan = []
    for i in range(n):
        t = peinsum("ai,dij->daj", carry, cores[i])
        d_dim, a_dim, j_dim = t.shape
        m = t.transpose(1, 0, 2).reshape(a_dim * d_dim, j_dim)
        u, sv, vh = svd_safe(m)
        k = min(m.shape)
        lcan.append(u.reshape(a_dim, d_dim, k).transpose(1, 0, 2))
        nrm = jnp.maximum(jnp.linalg.norm(sv), 1e-300)
        log = log + jnp.log(nrm)
        carry = (sv / nrm)[:, None] * vh
    closing = peinsum("kj,j->k", carry, right)
    # right-to-left truncation
    out = [None] * n
    rcarry = closing[:, None]  # (k, 1)
    for i in reversed(range(n)):
        t = peinsum("dik,ka->dia", lcan[i], rcarry)
        d_dim, i_dim, a_dim = t.shape
        m = t.transpose(1, 0, 2).reshape(i_dim, d_dim * a_dim)
        u, sv, vh = svd_safe(m)
        k = min(min(m.shape), int(chi))
        u, sv, vh = u[:, :k], sv[:k], vh[:k]
        out[i] = vh.reshape(k, d_dim, a_dim).transpose(1, 0, 2)
        nrm = jnp.maximum(jnp.linalg.norm(sv), 1e-300)
        log = log + jnp.log(nrm)
        rcarry = u * (sv / nrm)[None, :]
    # rcarry collapses to the (1, 1) leftmost residue (left vector was
    # absorbed in the first sweep): fold its sign/scale into core 0
    out[0] = out[0] * rcarry[0, 0]
    return out, log
