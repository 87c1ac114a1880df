"""Tensor decomposition ALGORITHMS: CP-ALS and Tucker HOSVD/HOOI.

The reference ships CP and Tucker as *layouts* (README.md:37-58 builds
them from einsum strings; our :mod:`~contractn_tpu.models.decompositions`
reproduces those graphs) but provides no way to COMPUTE a decomposition
of a given dense tensor.  This module adds the classic algorithms:

* :func:`cp_als` — alternating least squares for the canonical
  polyadic (PARAFAC) format.  Each mode update is one MTTKRP (a chain
  of batched GEMMs over the rank axis — exactly the MXU-friendly shape)
  plus an ``(R, R)`` Cholesky solve; the WHOLE iteration loop is one
  jitted ``lax.scan``, so a 300-sweep fit is a single XLA program with
  no host round-trips.  The fit sequence is computed from the factor
  Grams (never from a dense reconstruction), keeping the per-sweep cost
  linear in the tensor size.
* :func:`tucker_hosvd` — higher-order SVD: per-mode top singular
  subspaces of the unfoldings.  Quasi-optimal: the squared error is
  bounded by the sum of the discarded squared singular values.
* :func:`tucker_hooi` — higher-order orthogonal iteration, refining
  HOSVD by alternating SVDs of the PROJECTED tensor (the projection
  shrinks every unfolding before its SVD, so each sweep is cheaper
  than HOSVD for small ranks); monotonically non-increasing error.

Output conventions match the graph builders so results drop straight
into the engine: CP factors are ``(rank, dim_i)`` rows as
:func:`~contractn_tpu.models.decompositions.cp_tn` expects, Tucker
factors are ``(r_i, dim_i)`` as
:func:`~contractn_tpu.models.decompositions.tucker_tn` expects
(validated end-to-end in tests/test_factorize.py: the contracted TN
graph reproduces the algorithm's own reconstruction at machine
precision, and exact-rank inputs are recovered to 1e-8).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stabilize import dot_precision, peinsum

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _mttkrp(x, factors, mode):
    """``G[r, i_mode] = sum_{other modes} X * prod_{j != mode}
    A_j[r, i_j]`` — contracted one factor at a time (each step a
    batched GEMV over the shared rank axis, never a materialized
    Khatri-Rao product)."""
    k = x.ndim
    orig = _LETTERS[:k]
    axes = orig
    out = None
    for j in range(k):
        if j == mode:
            continue
        lj = orig[j]  # mode letters are fixed; positions shift as
        if out is None:  # contracted letters drop out of `axes`
            out = peinsum(f"{axes},r{lj}->r" + axes.replace(lj, ""),
                          x, factors[j])
            axes = "r" + axes.replace(lj, "")
        else:
            out = peinsum(f"{axes},r{lj}->" + axes.replace(lj, ""),
                          out, factors[j])
            axes = axes.replace(lj, "")
    return out  # (rank, dim_mode)


@partial(jax.jit, static_argnames=("rank", "steps"))
def _cp_als_jit(x, init_factors, rank, steps, ridge):
    k = x.ndim
    x_norm2 = jnp.real(jnp.vdot(x, x))
    eye_r = jnp.eye(rank, dtype=x.dtype)

    def sweep(factors, _):
        inner = jnp.zeros((), x.dtype)
        for m in range(k):
            # Complex normal equations: M[r,s] = prod_{j != m}
            # <row_r(A_j), row_s(A_j)>,  b = conj-MTTKRP; then
            # M A_m = b row-solves the LS problem exactly.
            gram = jnp.ones((rank, rank), x.dtype)
            for j in range(k):
                if j != m:
                    a = factors[j]
                    gram = gram * peinsum("ri,si->rs", a.conj(), a)
            g = _mttkrp(x, [f.conj() for f in factors], m)
            sol = jnp.linalg.solve(gram + ridge * eye_r, g)
            norms = jnp.sqrt(jnp.sum(jnp.abs(sol) ** 2, axis=1))
            scale = jnp.where(norms > 0, norms, 1.0)
            factors = list(factors)
            # Keep the full scale on the LAST-updated mode so the
            # factor list alone reconstructs the tensor; every earlier
            # mode is renormalized to unit rows (the next exact LS
            # solve re-absorbs the scale, so the model is unchanged).
            factors[m] = sol if m == k - 1 else sol / scale[:, None]
            if m == k - 1:
                inner = jnp.sum(sol.conj() * g)
        # ||X_hat||^2 from the Grams alone (no reconstruction)
        gram = jnp.ones((rank, rank), x.dtype)
        for a in factors:
            gram = gram * peinsum("ri,si->rs", a.conj(), a)
        model_norm2 = jnp.real(jnp.sum(gram))
        err2 = jnp.maximum(
            x_norm2 - 2.0 * jnp.real(inner) + model_norm2, 0.0)
        return factors, jnp.sqrt(err2 / x_norm2)

    factors, rel_errs = jax.lax.scan(
        sweep, list(init_factors), None, length=steps)
    return factors, rel_errs


def cp_als(tensor, rank, steps=100, key=None, ridge=1e-12):
    """Canonical polyadic decomposition by alternating least squares.

    Args:
        tensor: dense array (any order >= 2, real or complex).
        rank: CP rank of the fit.
        steps: number of full ALS sweeps (the loop is one jitted scan).
        key: PRNG key for the random init (default ``PRNGKey(0)``).
        ridge: Tikhonov floor on the ``(R, R)`` normal equations.

    Returns ``(factors, rel_errs)``: ``factors[i]`` is ``(rank,
    dim_i)`` (the :func:`~contractn_tpu.models.decompositions.cp_tn`
    convention; the scale lives on the last mode), ``rel_errs`` the
    per-sweep relative Frobenius error ``||X - X_hat|| / ||X||``,
    non-increasing by the ALS property.
    """
    x = jnp.asarray(tensor)
    if not 2 <= x.ndim <= 16:
        raise ValueError("cp_als supports tensor orders 2..16")
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, x.ndim)
    scale = float(jnp.mean(jnp.abs(x) ** 2)) ** (0.5 / x.ndim)
    init = [scale * jax.random.normal(keys[i], (rank, d), dtype=x.dtype)
            for i, d in enumerate(x.shape)]
    factors, rel_errs = _cp_als_jit(x, init, int(rank), int(steps),
                                    jnp.asarray(ridge, x.dtype))
    return list(factors), rel_errs


def cp_reconstruct(factors):
    """Dense tensor from CP factors ``(rank, dim_i)``."""
    k = len(factors)
    spec = ",".join(f"r{_LETTERS[i]}" for i in range(k))
    return peinsum(f"{spec}->{_LETTERS[:k]}", *factors)


def _top_left_vectors(unf, r):
    """Top-``r`` left singular vectors of ``unf`` via the Gram matrix
    (the unfolding is short-and-fat for every mode, so the ``(d, d)``
    Hermitian eig is far cheaper than the full SVD)."""
    gram = peinsum("ij,kj->ik", unf, unf.conj())
    vals, vecs = jnp.linalg.eigh(gram)  # ascending
    return vecs[:, ::-1][:, :r], vals[::-1]


def tucker_hosvd(tensor, ranks):
    """Higher-order SVD (quasi-optimal Tucker decomposition).

    Returns ``(core, factors, discarded)``: ``core`` is
    ``(r_1, ..., r_k)``, ``factors[i]`` is ``(r_i, dim_i)`` with
    orthonormal rows (the :func:`~contractn_tpu.models.decompositions.
    tucker_tn` convention), and ``discarded`` the total discarded
    squared singular value mass — an upper bound on the squared
    reconstruction error.
    """
    x = jnp.asarray(tensor)
    ranks = tuple(int(r) for r in ranks)
    if len(ranks) != x.ndim:
        raise ValueError("one rank per mode required")
    if x.ndim > 16:
        raise ValueError("tucker_hosvd supports tensor orders <= 16")
    factors = []
    discarded = jnp.zeros((), jnp.float64)
    for m, r in enumerate(ranks):
        unf = jnp.reshape(jnp.moveaxis(x, m, 0), (x.shape[m], -1))
        u, vals = _top_left_vectors(unf, r)
        factors.append(u.T)  # (r, dim)
        discarded = discarded + jnp.sum(
            jnp.maximum(jnp.real(vals[r:]), 0.0))
    core = x
    k = x.ndim
    for m, f in enumerate(factors):
        axes = _LETTERS[:k]
        out_axes = axes.replace(axes[m], "z")
        core = peinsum(f"{axes},z{axes[m]}->{out_axes}", core, f.conj())
    return core, factors, float(discarded)


@partial(jax.jit, static_argnames=("ranks", "steps"))
def _hooi_jit(x, init_factors, ranks, steps):
    k = x.ndim
    x_norm2 = jnp.real(jnp.vdot(x, x))

    def sweep(factors, _):
        for m in range(k):
            proj = x
            for j in range(k):
                if j == m:
                    continue
                axes = _LETTERS[:k]
                out_axes = axes.replace(axes[j], "r")
                proj = peinsum(f"{axes},r{axes[j]}->{out_axes}",
                               proj, factors[j].conj())
            unf = jnp.reshape(jnp.moveaxis(proj, m, 0),
                              (x.shape[m], -1))
            u, _ = _top_left_vectors(unf, ranks[m])
            factors = list(factors)
            factors[m] = u.T
        core = x
        for j in range(k):
            axes = _LETTERS[:k]
            out_axes = axes.replace(axes[j], "r")
            core = peinsum(f"{axes},r{axes[j]}->{out_axes}",
                           core, factors[j].conj())
        # orthonormal factors => ||X - X_hat||^2 = ||X||^2 - ||core||^2
        err2 = jnp.maximum(x_norm2 - jnp.real(jnp.vdot(core, core)), 0.0)
        return factors, (core, jnp.sqrt(err2 / x_norm2))

    factors, (cores, rel_errs) = jax.lax.scan(
        sweep, list(init_factors), None, length=steps)
    return factors, cores[-1], rel_errs


def tucker_hooi(tensor, ranks, steps=10):
    """Higher-order orthogonal iteration: HOSVD-initialized alternating
    refinement of the Tucker subspaces (monotonically non-increasing
    error; the sweep loop is one jitted scan).

    Returns ``(core, factors, rel_errs)`` in the same conventions as
    :func:`tucker_hosvd`.
    """
    x = jnp.asarray(tensor)
    ranks = tuple(int(r) for r in ranks)
    _, init, _ = tucker_hosvd(x, ranks)
    factors, core, rel_errs = _hooi_jit(x, init, ranks, int(steps))
    return core, list(factors), rel_errs


def tucker_reconstruct(core, factors):
    """Dense tensor from a Tucker ``(core, factors)`` pair."""
    k = core.ndim
    out = core
    for m, f in enumerate(factors):
        axes = _LETTERS[:k]
        out_axes = axes.replace(axes[m], "z")
        out = peinsum(f"{axes},{axes[m]}z->{out_axes}", out, f)
    return out
