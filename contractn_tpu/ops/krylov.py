"""Shared device-side Lanczos machinery.

One implementation of the subtle parts — double Gram-Schmidt
reorthogonalization, branchless Krylov-exhaustion masking, and the
well-conditioned tridiagonal assembly — consumed by the DMRG ground /
penalized solvers and the TDVP Krylov exponentials.  History shows why
this must not be duplicated: round 2 fixed two corruption modes here
(single-pass reorthogonalization losing orthogonality near exhaustion;
1e30 diagonal markers destroying eigh's precision on the valid block).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .stabilize import dot_precision


def _maybe_psum(x, axis_name):
    """Sum a locally-reduced value across ``axis_name`` (no-op if None).

    All Krylov inner products go through this so the SAME implementation
    serves single-device solves and mesh-sharded vectors (each device
    holding a slice of the Krylov vector inside ``shard_map``): local
    partial dots + one tiny psum per reduction over the ICI.
    """
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def lanczos_basis(matvec, v0, iters, axis_name=None, project=None):
    """Device-side Lanczos: returns ``(basis, alphas, betas, nrm0)``.

    ``basis (iters + 1, dim)`` rows are the Krylov vectors (zero rows
    after exhaustion), ``alphas`` carry 1e30 markers on exhausted steps
    (feed them to :func:`masked_tridiagonal`, never to eigh directly),
    and ``nrm0`` is ``|v0|`` (the basis starts from ``v0 / nrm0``).
    Runs as one ``lax.fori_loop`` with zero host syncs; jit it from the
    caller (shapes are static per call site).

    With ``axis_name`` set (inside ``shard_map``), ``v0`` is this
    device's SLICE of the global vector and ``matvec`` maps local slice
    to local slice; every norm/overlap is then a psum over the mesh
    axis, so the returned tridiagonal is the global one on every device
    while the basis rows stay sharded.

    ``project`` restricts the iteration to an invariant subspace: it is
    applied to every new Krylov vector AFTER reorthogonalization (and
    to ``v0``).  Ending the MATVEC with the projector is NOT enough
    when the projector is dense (e.g. a tangent-gauge projector
    ``1 - AL AL^H``): each application leaves an ``eps``-relative
    out-of-subspace residual in the basis row, and the Gram-Schmidt
    subtraction re-injects every previous row's residual scaled by
    O(``|H|``) overlap coefficients — the out-of-subspace junk then
    GROWS geometrically (measured x3 per iteration on the charged
    uMPS excitation solve, reaching O(1) by step ~38 and deflating
    Rayleigh quotients below the true spectrum).  Diagonal 0/1 masks
    do not need this (their zeros are exact, so nothing is ever
    re-injected); dense projectors always do.
    """
    dim = v0.size
    dt = v0.dtype
    rdt = jnp.zeros((), dt).real.dtype
    prec = dot_precision(dt)
    shape = v0.shape

    def norm(x):
        sq = jnp.real(jnp.einsum("d,d->", jnp.conj(x), x, precision=prec))
        return jnp.sqrt(_maybe_psum(sq, axis_name))

    if project is not None:
        v0 = project(v0)
    nrm0 = jnp.maximum(norm(v0.reshape(-1)), 1e-300)
    basis0 = jnp.zeros((iters + 1, dim), dt).at[0].set(
        v0.reshape(-1) / nrm0
    )
    alphas0 = jnp.full((iters,), jnp.inf, rdt)
    betas0 = jnp.zeros((iters,), rdt)

    def body(j, carry):
        basis, alphas, betas, exhausted = carry
        v = basis[j]
        hv = matvec(v.reshape(shape)).reshape(-1)
        alpha = _maybe_psum(
            jnp.real(jnp.einsum("d,d->", jnp.conj(v), hv, precision=prec)),
            axis_name,
        )
        # Full reorthogonalization against rows 0..j (later rows are
        # zero, so masking is implicit).  TWICE ("twice is enough",
        # Parlett): a single pass leaves an eps * ||hv|| / beta rogue
        # component near exhaustion that compounds into a non-orthogonal
        # basis and betas far above ||H||.
        for _ in range(2):
            proj = _maybe_psum(
                jnp.einsum("kd,d->k", jnp.conj(basis), hv, precision=prec),
                axis_name,
            )
            hv = hv - jnp.einsum("k,kd->d", proj, basis, precision=prec)
        if project is not None:
            hv = project(hv.reshape(shape)).reshape(-1)
        beta = norm(hv)
        alive = jnp.logical_and(~exhausted, beta > 1e-12)
        nxt = jnp.where(alive, hv / jnp.maximum(beta, 1e-300),
                        jnp.zeros_like(hv))
        basis = basis.at[j + 1].set(nxt)
        alphas = alphas.at[j].set(
            jnp.where(exhausted, jnp.asarray(1e30, rdt), alpha)
        )
        betas = betas.at[j].set(jnp.where(alive, beta, 0.0))
        return basis, alphas, betas, ~alive

    basis, alphas, betas, _ = jax.lax.fori_loop(
        0, iters, body, (basis0, alphas0, betas0, jnp.asarray(False))
    )
    return basis, alphas, betas, nrm0


def masked_tridiagonal(alphas, betas):
    """Lanczos tridiagonal with exhausted steps pushed out of the way.

    Exhausted steps carry a 1e30 diagonal marker.  Feeding that to eigh
    directly destroys the VALID eigenvalues (absolute eigh error scales
    with ``||T|| * eps`` = 1e30 * 1e-16 = 1e14).  Remap the marker to a
    value that dominates the valid spectrum by ~1e4 but keeps the
    matrix well-conditioned; the masked block's eigenvectors have
    exactly zero overlap with ``e1`` (its couplings are zero).
    """
    valid = alphas < 1e29
    scale = jnp.max(jnp.where(valid, jnp.abs(alphas), 0.0))
    scale = jnp.maximum(scale, jnp.max(jnp.abs(betas)))
    big = 1e4 * (1.0 + scale)
    diag = jnp.where(valid, alphas, big)
    return (jnp.diag(diag)
            + jnp.diag(betas[:-1], 1)
            + jnp.diag(betas[:-1], -1))


def lanczos_ground(matvec, v0, iters, axis_name=None, project=None):
    """Lowest eigenpair of a Hermitian operator via :func:`lanczos_basis`.

    Returns ``(energy, vector)`` with the vector normalized.  With
    ``axis_name`` set, ``v0``/``matvec``/result are this device's slice
    of the sharded vector (see :func:`lanczos_basis`); the tiny
    tridiagonal eigh runs replicated on every device.  ``project``
    confines the iteration to an invariant subspace (see
    :func:`lanczos_basis` for why the matvec alone cannot).
    """
    prec = dot_precision(v0.dtype)
    basis, alphas, betas, _ = lanczos_basis(matvec, v0, iters, axis_name,
                                            project=project)
    tri = masked_tridiagonal(alphas, betas)
    vals, vecs = jnp.linalg.eigh(tri)
    coeff = vecs[:, 0].astype(v0.dtype)
    vec = jnp.einsum("k,kd->d", coeff, basis[:-1], precision=prec)
    sq = jnp.real(jnp.einsum("d,d->", jnp.conj(vec), vec, precision=prec))
    nrm = jnp.sqrt(_maybe_psum(sq, axis_name))
    vec = vec / jnp.maximum(nrm, 1e-300)
    return vals[0], vec.reshape(v0.shape)


def arnoldi_basis(matvec, v0, iters, axis_name=None):
    """Device-side Arnoldi factorization of a NONSYMMETRIC operator.

    Returns ``(basis, h, nrm0)`` with ``basis ((iters + 1), dim)``
    orthonormal Krylov rows and ``h ((iters + 1), iters)`` the upper-
    Hessenberg projection, ``A V_m = V_{m+1} H``.  Breakdown (an exact
    invariant subspace) zeroes the subdiagonal entry and all later
    rows/columns — detect it host-side via ``h[j + 1, j] == 0``.

    The whole factorization is one ``lax.fori_loop`` (jit from the
    caller); like :func:`lanczos_basis` it re-orthogonalizes twice, and
    ``axis_name`` makes every inner product a psum so sharded vectors
    work unchanged.  This is the device-side answer to leading spectra
    of transfer operators, where XLA's dense nonsymmetric ``eig`` is
    CPU-only and power iteration cannot resolve complex pairs.
    """
    dim = v0.size
    dt = v0.dtype
    prec = dot_precision(dt)
    shape = v0.shape

    def norm(x):
        sq = jnp.real(jnp.einsum("d,d->", jnp.conj(x), x, precision=prec))
        return jnp.sqrt(_maybe_psum(sq, axis_name))

    nrm0 = jnp.maximum(norm(v0.reshape(-1)), 1e-300)
    basis0 = jnp.zeros((iters + 1, dim), dt).at[0].set(
        v0.reshape(-1) / nrm0
    )
    h0 = jnp.zeros((iters + 1, iters), dt)

    def body(j, carry):
        basis, h, exhausted = carry
        v = basis[j]
        w = matvec(v.reshape(shape)).reshape(-1)
        # Orthogonalize against every existing row (later rows are zero
        # so masking is implicit), twice — same rationale as Lanczos.
        coeffs = jnp.zeros((iters + 1,), dt)
        for _ in range(2):
            proj = _maybe_psum(
                jnp.einsum("kd,d->k", jnp.conj(basis), w, precision=prec),
                axis_name,
            )
            w = w - jnp.einsum("k,kd->d", proj, basis, precision=prec)
            coeffs = coeffs + proj
        beta = norm(w)
        alive = jnp.logical_and(~exhausted, beta > 1e-12)
        h = h.at[:, j].set(jnp.where(exhausted, jnp.zeros_like(coeffs),
                                     coeffs))
        h = h.at[j + 1, j].set(jnp.where(alive, beta.astype(dt), 0.0))
        nxt = jnp.where(alive, w / jnp.maximum(beta, 1e-300),
                        jnp.zeros_like(w))
        basis = basis.at[j + 1].set(nxt)
        return basis, h, ~alive

    basis, h, _ = jax.lax.fori_loop(
        0, iters, body, (basis0, h0, jnp.asarray(False))
    )
    return basis, h, nrm0


def arnoldi_eigs(matvec, v0, iters, k=2):
    """Leading ``k`` eigenvalues (by magnitude) of a nonsymmetric
    operator, plus the Ritz vector of the dominant one.

    The O(dim) work — ``iters`` matvecs and the Gram-Schmidt sweeps —
    runs on device as ONE jitted Arnoldi program; only the tiny
    ``(iters, iters)`` Hessenberg eigenproblem runs on the host (XLA has
    no device-side nonsymmetric ``eig`` on TPU — this split keeps the
    hot path on-device and the host work O(iters^3), independent of the
    operator dimension).

    Returns ``(vals, lead_vec)``: ``vals (k,)`` complex, sorted by
    descending magnitude (padded with zeros past a breakdown);
    ``lead_vec`` has ``v0``'s shape and dtype-compatible complex entries.
    """
    basis, h, _ = jax.jit(
        lambda v: arnoldi_basis(matvec, v, iters)
    )(v0)
    h_np = np.asarray(h)
    basis_np = np.asarray(basis)

    m = iters
    sub = np.abs(np.diagonal(h_np[1:, :]))
    dead = np.nonzero(sub == 0.0)[0]
    if dead.size:
        m = int(dead[0]) + 1  # exact invariant subspace of size m
    vals, vecs = np.linalg.eig(h_np[:m, :m])
    # magnitude-descending; conjugate pairs tie-broken +Im first so the
    # ordering is deterministic
    order = np.lexsort((-vals.imag, -np.abs(vals)))
    vals = vals[order]
    lead = np.matmul(basis_np[:m].T, vecs[:, order[0]]).reshape(
        v0.shape)
    out = np.zeros((k,), complex)
    out[: min(k, m)] = vals[:k]
    return out, lead
