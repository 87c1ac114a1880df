"""Two-site DMRG: variational ground-state search over MPS.

The standard tensor-network optimization algorithm, built on this
framework's MPS/MPO machinery: sandwich environments update with the same
two-GEMM-per-site contractions as :meth:`MPO.expectation`, local two-site
problems are solved by dense Hermitian eigendecomposition (appropriate for
the moderate bond dimensions where ``(d^2 D^2)^3`` is cheap; a Lanczos
local solver is the scaling path), and SVD truncation keeps the bond at
``max_bond``.  The result returns to the framework's uniform stacked
``(N, d, D, D)`` form (zero-padded), so it evaluates / samples / shards
like any other MPS.

The reference has no optimization capability at all — this is an additive
model-family feature.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.krylov import (
    lanczos_basis as _lanczos_basis_impl,
    lanczos_ground as _lanczos_ground_impl,
    masked_tridiagonal as _masked_tridiagonal,
)
from ..ops.stabilize import dot_precision, peinsum
from .mps import MPS
from .mpo import MPO
from .mpo import rayleigh as _rayleigh


def _ragged_sites(mps):
    """Site tensors with explicit boundary bonds: each ``(d, Din, Dout)``,
    ``Din[0] = Dout[-1] = 1``."""
    cores = mps.cores
    n, d, D, _ = cores.shape
    first = peinsum("i,dij->dj", mps.left, cores[0])[:, None, :]
    last = peinsum("dij,j->di", cores[-1], mps.right)[:, :, None]
    return [first] + [cores[i] for i in range(1, n - 1)] + (
        [last] if n > 1 else []
    )


def _rebuild_uniform(tensors, dtype):
    """Uniform stacked MPS from ragged ``(d, Din, Dout)`` site tensors."""
    n = len(tensors)
    d = tensors[0].shape[0]
    bond = max(max(t.shape[1], t.shape[2]) for t in tensors)
    bond = max(bond, 1)
    cores = np.zeros((n, d, bond, bond), dtype)
    for i, t in enumerate(tensors):
        cores[i, :, :t.shape[1], :t.shape[2]] = np.asarray(t)
    e0 = np.zeros((bond,), dtype)
    e0[0] = 1.0
    return MPS(jnp.asarray(cores), jnp.asarray(e0), jnp.asarray(e0))


def _update_left(L, site, w):
    """L' after absorbing one site: ``L (i, w, p)`` bra x op x ket."""
    t = peinsum("iwp,bpq->iwbq", L, site)
    t = peinsum("abwv,iwbq->iavq", w, t)
    return peinsum("aij,iavq->jvq", jnp.conj(site), t)


def _update_right(R, site, w):
    """R' after absorbing one site from the right: ``R (j, u, q)``."""
    t = peinsum("juq,bpq->jubp", R, site)
    t = peinsum("abwv,jvbp->jwap", w, t)
    return peinsum("aij,jwap->iwp", jnp.conj(site), t)


# Above this two-site problem size the dense eigh is replaced by Lanczos
_DENSE_EIGH_LIMIT = 1024


def _heff_matvec(L, w1, w2, R, theta):
    """Apply the two-site effective Hamiltonian without materializing it.

    Four small contractions, cost O(d^2 D^3 W) — the standard DMRG matvec.
    ``theta``: (d, d, Dl, Dr) -> same shape.
    """
    t = peinsum("iwp,ABpq->iwABq", L, theta)
    t = peinsum("XAwv,iwABq->iXvBq", w1, t)
    t = peinsum("YBvu,iXvBq->iXYuq", w2, t)
    return peinsum("kuq,iXYuq->XYik", R, t)


from functools import partial


@partial(jax.jit, static_argnums=(5,))
def _lanczos_ground_device(L, w1, w2, R, theta0, iters):
    """Device-side Lanczos ground state of H_eff: ONE jitted program.

    All the subtle numerics (double Gram-Schmidt, exhaustion masking,
    conditioned tridiagonal) live in :mod:`contractn_tpu.ops.krylov`.
    """
    return _lanczos_ground_impl(
        lambda t: _heff_matvec(L, w1, w2, R, t), theta0, iters
    )


def _lanczos_ground(L, w1, w2, R, theta0, iters=24):
    """Lowest eigenpair of H_eff by Lanczos (device-side; see above).

    Returns ``(energy, theta)`` with one host sync total (the energy).
    """
    energy, theta = _lanczos_ground_device(L, w1, w2, R, theta0, iters)
    return float(energy), theta


def _local_ground_state(L, w1, w2, R, theta0=None):
    """Ground state of the two-site effective Hamiltonian.

    Dense eigh below ``_DENSE_EIGH_LIMIT``; environment-matvec Lanczos
    above it (scales to production bond dimensions).  Returns
    ``(energy, theta)`` with theta of shape ``(d, d, Dl, Dr)``.
    """
    d = w1.shape[0]
    dl, dr = L.shape[0], R.shape[0]
    dim = d * d * dl * dr
    if dim > _DENSE_EIGH_LIMIT and theta0 is not None:
        return _lanczos_ground(L, w1, w2, R, theta0)
    # H[(X,Y,i,k), (A,B,p,q)] = L[i,w,p] W1[X,A,w,v] W2[Y,B,v,u] R[k,u,q]
    h = peinsum("iwp,XAwv,YBvu,kuq->XYikABpq", L, w1, w2, R)
    hmat = h.reshape(dim, dim)
    hmat = 0.5 * (hmat + jnp.conj(hmat.T))  # enforce hermiticity
    vals, vecs = jnp.linalg.eigh(hmat)
    energy = vals[0]
    theta = vecs[:, 0].reshape(d, d, dl, dr)
    return float(energy), theta


def _ovl_left_update(lg, gsite, psisite):
    """Overlap environment after absorbing one site from the left.

    ``lg (Dg, D)``: ``<g|psi>`` partial contraction (bra ``g``
    conjugated); ``gsite (d, Dg, Dg')``, ``psisite (d, D, D')``.
    """
    return peinsum("ab,dax,dby->xy", lg, jnp.conj(gsite), psisite)


def _ovl_right_update(rg, gsite, psisite):
    return peinsum("xy,dax,dby->ab", rg, jnp.conj(gsite), psisite)


def _penalty_vector(lg, g1, g2, rg):
    """The local two-site representation ``pg`` of ``|g>``:
    ``<g|psi> = vdot(pg, theta)`` for the current environments.
    Shape ``(d, d, Dl, Dr)`` matching theta."""
    t = peinsum("ab,dax->dxb", jnp.conj(lg), g1)  # (d, Dg', D)
    t = peinsum("dxb,exy->deby", t, g2)           # (d, d, Dg'', D)
    return peinsum("deby,yq->debq", t, jnp.conj(rg))


@partial(jax.jit, static_argnums=(5,))
def _lanczos_ground_penalized(L, w1, w2, R, theta0, iters, pgs, weights):
    """Device-side Lanczos for ``H_eff + sum_k w_k |pg_k><pg_k|``.

    Same machinery as :func:`_lanczos_ground_device` with a rank-k
    penalty folded into the matvec (the standard orthogonality trick for
    excited-state DMRG).  ``pgs (k, *theta.shape)``, ``weights (k,)``.
    """
    shape = theta0.shape
    prec = dot_precision(theta0.dtype)

    def matvec(t):
        out = _heff_matvec(L, w1, w2, R, t)
        ov = jnp.einsum("kx,x->k", jnp.conj(pgs.reshape(pgs.shape[0], -1)),
                        t.reshape(-1), precision=prec)
        out = out + jnp.einsum(
            "k,kx->x", weights * ov, pgs.reshape(pgs.shape[0], -1),
            precision=prec,
        ).reshape(shape)
        return out

    basis, alphas, betas, _ = _lanczos_basis_impl(matvec, theta0, iters)
    tri = _masked_tridiagonal(alphas, betas)
    vals, vecs = jnp.linalg.eigh(tri)
    coeff = vecs[:, 0].astype(theta0.dtype)
    theta = jnp.einsum("k,kd->d", coeff, basis[:-1], precision=prec)
    theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-300)
    return vals[0], theta.reshape(shape)


def _local_ground_penalized(L, w1, w2, R, theta0, penalties):
    """Lowest eigenpair of the penalized two-site problem.

    ``penalties``: list of ``(weight, pg)``.  Dense below the eigh
    limit, rank-k-augmented Lanczos above it.
    """
    if not penalties:
        return _local_ground_state(L, w1, w2, R, theta0)
    d = w1.shape[0]
    dl, dr = L.shape[0], R.shape[0]
    dim = d * d * dl * dr
    if dim > _DENSE_EIGH_LIMIT and theta0 is not None:
        pgs = jnp.stack([p for _, p in penalties])
        weights = jnp.asarray([w for w, _ in penalties],
                              pgs.real.dtype)
        energy, theta = _lanczos_ground_penalized(
            L, w1, w2, R, theta0, 24, pgs, weights
        )
        return float(energy), theta
    h = peinsum("iwp,XAwv,YBvu,kuq->XYikABpq", L, w1, w2, R)
    hmat = h.reshape(dim, dim)
    hmat = 0.5 * (hmat + jnp.conj(hmat.T))
    for w, pg in penalties:
        v = pg.reshape(-1)
        hmat = hmat + w * jnp.outer(v, jnp.conj(v))
    vals, vecs = jnp.linalg.eigh(hmat)
    return float(vals[0]), vecs[:, 0].reshape(d, d, dl, dr)


def _split_theta(theta, max_bond, to_left):
    """SVD-split a two-site block into site tensors.

    ``theta``: ``(d, d, Dl, Dr)``.  Returns ``(T1 (d, Dl, k),
    T2 (d, k, Dr))`` with the isometry on the sweep side.
    """
    d, _, dl, dr = theta.shape
    mat = jnp.transpose(theta, (0, 2, 1, 3)).reshape(d * dl, d * dr)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    k = min(s.shape[0], max_bond)
    u, s, vh = u[:, :k], s[:k], vh[:k]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    if to_left:  # left-to-right sweep: left site is the isometry
        t1 = u.reshape(d, dl, k)
        t2 = peinsum("k,kx->kx", s, vh).reshape(k, d, dr).transpose(1, 0, 2)
    else:  # right-to-left: right site is the isometry
        t1 = peinsum("xk,k->xk", u, s).reshape(d, dl, k)
        t2 = vh.reshape(k, d, dr).transpose(1, 0, 2)
    return t1, t2


def dmrg(mpo, mps0, max_bond=None, sweeps=4, orthogonal_to=(),
         penalty=None):
    """Minimize ``<psi|H|psi> / <psi|psi>`` over MPS of bounded bond.

    Args:
        mpo: Hermitian Hamiltonian as an :class:`MPO`.
        mps0: initial state (e.g. ``MPS.random``); sets ``d`` and default
            bond.
        max_bond: bond-dimension cap (default: ``mps0.bond_dim``).
        sweeps: full left-right + right-left sweeps.
        orthogonal_to: previously found MPS to stay orthogonal to —
            minimizing over ``H + penalty * sum_g |g><g|`` finds excited
            states (see :func:`dmrg_excited`).  States should be
            normalized (e.g. earlier ``dmrg`` outputs).
        penalty: orthogonality weight; must exceed the targeted energy
            gap.  Default: ``10 * (1 + |E[mps0]|)``.

    Returns:
        ``(ground_mps, energy, energies)``: the optimized state (uniform
        stacked form, normalized), the final energy, and the per-sweep
        energy trace.
    """
    n = mps0.n_sites
    if n < 2:
        raise ValueError("DMRG needs at least 2 sites")
    max_bond = max_bond or mps0.bond_dim
    sites = _ragged_sites(mps0)
    ws = [mpo.cores[i] for i in range(n)]

    L = [None] * (n + 1)
    R = [None] * (n + 1)
    L[0] = mpo.left[None, :, None].astype(sites[0].dtype)
    R[n] = mpo.right[None, :, None].astype(sites[0].dtype)
    # Right environments for the first sweep
    for i in range(n - 1, 0, -1):
        R[i] = _update_right(R[i + 1], sites[i], ws[i])

    # Overlap environments against each orthogonality constraint
    gs = [_ragged_sites(g) for g in orthogonal_to]
    if gs and penalty is None:
        penalty = 10.0 * (1.0 + abs(_rayleigh(mpo, mps0)))
    lg = [[None] * (n + 1) for _ in gs]
    rg = [[None] * (n + 1) for _ in gs]
    one = jnp.ones((1, 1), sites[0].dtype)
    for k, g in enumerate(gs):
        lg[k][0] = one
        rg[k][n] = one
        for i in range(n - 1, 0, -1):
            rg[k][i] = _ovl_right_update(rg[k][i + 1], g[i], sites[i])

    def penalties_at(i):
        return [
            (penalty, _penalty_vector(lg[k][i], gs[k][i], gs[k][i + 1],
                                      rg[k][i + 2]))
            for k in range(len(gs))
        ]

    energies = []
    energy = np.inf
    for _ in range(sweeps):
        # left -> right
        for i in range(n - 1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            energy, theta = _local_ground_penalized(
                L[i], ws[i], ws[i + 1], R[i + 2], theta0, penalties_at(i)
            )
            t1, t2 = _split_theta(theta, max_bond, to_left=True)
            sites[i], sites[i + 1] = t1, t2
            L[i + 1] = _update_left(L[i], sites[i], ws[i])
            for k, g in enumerate(gs):
                lg[k][i + 1] = _ovl_left_update(lg[k][i], g[i], sites[i])
        # right -> left
        for i in range(n - 2, -1, -1):
            theta0 = peinsum("apj,bjq->abpq", sites[i], sites[i + 1])
            energy, theta = _local_ground_penalized(
                L[i], ws[i], ws[i + 1], R[i + 2], theta0, penalties_at(i)
            )
            t1, t2 = _split_theta(theta, max_bond, to_left=False)
            sites[i], sites[i + 1] = t1, t2
            R[i + 1] = _update_right(R[i + 2], sites[i + 1], ws[i + 1])
            for k, g in enumerate(gs):
                rg[k][i + 1] = _ovl_right_update(rg[k][i + 2], g[i + 1],
                                                 sites[i + 1])
        energies.append(energy)

    return _rebuild_uniform(sites, np.asarray(mps0.cores).dtype), energy, energies


def dmrg_excited(mpo, mps0, n_states, max_bond=None, sweeps=4,
                 penalty=None, key=None):
    """Lowest ``n_states`` eigenstates by sequential orthogonal DMRG.

    Each state is found by :func:`dmrg` with orthogonality penalties
    against all previously found states (the energies reported per state
    exclude the penalty — they are true Rayleigh quotients of the final
    states).  Returns ``(states, energies)``.
    """
    import jax as _jax

    states, energies = [], []
    key = key if key is not None else _jax.random.PRNGKey(0)
    for k in range(n_states):
        if k == 0:
            init = mps0
        else:
            key, sub = _jax.random.split(key)
            init = MPS.random(
                sub, mps0.n_sites, mps0.phys_dim,
                max_bond or mps0.bond_dim,
                dtype=np.asarray(mps0.cores).dtype,
            )
        state, _, _ = dmrg(mpo, init, max_bond=max_bond, sweeps=sweeps,
                           orthogonal_to=states, penalty=penalty)
        energy = _rayleigh(mpo, state)
        states.append(state)
        energies.append(energy)
    return states, energies


def idmrg(mpo_cell, max_bond, steps=60, d=None, dtype=jnp.float64,
          lanczos_iters=80):
    """Infinite-system DMRG: variational bulk energy per site.

    McCulloch-style growth: two fresh sites are inserted in the middle
    every step, the two-site block is solved against the accumulated
    left/right environments (the same ``_update_left/_update_right`` /
    ``_local_ground_state`` machinery as finite :func:`dmrg`), and the
    halves are absorbed.  Total energies ``E_k`` include the boundary,
    but their DIFFERENCES converge geometrically (for gapped systems)
    to twice the bulk energy per site — no Trotter error, unlike iTEBD.

    Args:
        mpo_cell: the repeated bulk MPO tensor ``(d, d, W, W)`` with the
            standard triangular convention plus its boundary vectors, as
            an :class:`~contractn_tpu.models.mpo.MPO` of ANY length >= 1
            (only ``cores[0]``, ``left``, ``right`` are used).
        max_bond: bond cap for the half-chain SVD splits.
        steps: growth iterations.

    Returns:
        ``(energy_per_site, trace)``: the converged estimate and the
        per-step estimates.
    """
    if steps < 2:
        raise ValueError("idmrg needs steps >= 2 (energy differences)")
    w = jnp.asarray(mpo_cell.cores[0], dtype)
    d = d or w.shape[0]
    L = mpo_cell.left[None, :, None].astype(dtype)
    R = mpo_cell.right[None, :, None].astype(dtype)

    theta0 = None
    prev_e = None
    trace = []
    for k in range(int(steps)):
        dl, dr = L.shape[0], R.shape[0]
        if theta0 is None or theta0.shape != (d, d, dl, dr):
            key = jax.random.PRNGKey(k)
            theta0 = jax.random.normal(key, (d, d, dl, dr), dtype)
        if d * d * dl * dr > _DENSE_EIGH_LIMIT:
            # Growth starts are worse than finite-DMRG sweeps; give the
            # Krylov solver more room than the finite default.
            energy, theta = _lanczos_ground(L, w, w, R, theta0,
                                            iters=lanczos_iters)
        else:
            energy, theta = _local_ground_state(L, w, w, R, theta0)
        t1, t2 = _split_theta(theta, max_bond, to_left=True)
        # Re-split right-canonically for the right half
        _, t2r = _split_theta(theta, max_bond, to_left=False)
        L = _update_left(L, t1, w)
        R = _update_right(R, t2r, w)
        if prev_e is not None:
            trace.append(0.5 * (energy - prev_e))
        prev_e = energy
        # Wavefunction prediction (cheap variant): reuse the optimized
        # block as the next initial guess when shapes repeat.  A dash of
        # noise keeps the Lanczos Krylov space from being confined to a
        # symmetry sector of the guess (Sz-conserving Hamiltonians would
        # otherwise trap the growth in the initial sector).
        new_shape = (d, d, min(dl * d, max_bond), min(dr * d, max_bond))
        if theta.shape == new_shape:
            noise = jax.random.normal(jax.random.PRNGKey(1000 + k),
                                      theta.shape, dtype)
            theta0 = theta + 1e-2 * noise / jnp.linalg.norm(noise)
        else:
            theta0 = None
    return trace[-1], trace


# ---------------------------------------------------------------------- #
# Standard Hamiltonians
# ---------------------------------------------------------------------- #

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])
_SY_IM = np.array([[0.0, -1.0], [1.0, 0.0]])  # -i * sigma_y (real);
# only ever used quadratically, where the overall sign cancels
_ID = np.eye(2)


def tfim_mpo(n_sites, j=1.0, h=1.0, dtype=jnp.float64):
    """Transverse-field Ising chain ``H = -J sum Z Z - h sum X`` (W=3)."""
    w = np.zeros((2, 2, 3, 3))
    w[:, :, 0, 0] = _ID
    w[:, :, 2, 2] = _ID
    w[:, :, 0, 1] = _SZ
    w[:, :, 1, 2] = -j * _SZ
    w[:, :, 0, 2] = -h * _SX
    cores = jnp.asarray(
        np.broadcast_to(w, (n_sites, 2, 2, 3, 3)), dtype
    )
    left = jnp.asarray(np.array([1.0, 0.0, 0.0]), dtype)
    right = jnp.asarray(np.array([0.0, 0.0, 1.0]), dtype)
    return MPO(cores, left, right)


def heisenberg_mpo(n_sites, jx=1.0, jz=1.0, dtype=jnp.float64):
    """XXZ Heisenberg chain
    ``H = sum Jx (X X + Y Y) + Jz Z Z`` (W=5, real representation:
    ``Y Y = -(iY)(iY)``)."""
    w = np.zeros((2, 2, 5, 5))
    w[:, :, 0, 0] = _ID
    w[:, :, 4, 4] = _ID
    w[:, :, 0, 1] = _SX
    w[:, :, 1, 4] = jx * _SX
    w[:, :, 0, 2] = _SY_IM
    w[:, :, 2, 4] = -jx * _SY_IM
    w[:, :, 0, 3] = _SZ
    w[:, :, 3, 4] = jz * _SZ
    cores = jnp.asarray(np.broadcast_to(w, (n_sites, 2, 2, 5, 5)), dtype)
    left = jnp.asarray(np.array([1.0, 0, 0, 0, 0]), dtype)
    right = jnp.asarray(np.array([0, 0, 0, 0, 1.0]), dtype)
    return MPO(cores, left, right)


def total_sz_penalty_mpo(n_sites, q, lam=1.0, dtype=jnp.float64):
    """MPO of ``lam * (S^z_total - q)^2`` on ``n_sites`` spin-1/2 sites.

    ``(sum_i z_i - q)^2 = sum_i (z_i^2 - 2 q z_i + q^2/n)
    + 2 sum_{i<j} z_i z_j`` with ``z = S^z = diag(1/2, -1/2)`` — a
    width-3 triangular MPO whose INTERIOR diagonal is the identity
    (uniform infinite-range pair coupling; finite chains only).  Adding
    it to a U(1)-conserving Hamiltonian with :func:`~contractn_tpu.
    models.mpo.mpo_sum` energetically pins the total-magnetization
    sector — see :func:`dmrg_sector`.
    """
    z = _SZ / 2.0
    # z^2 = I/4 exactly for spin-1/2
    onsite = (0.25 + q * q / n_sites) * _ID - 2.0 * q * z
    w = np.zeros((2, 2, 3, 3))
    w[:, :, 0, 0] = _ID
    w[:, :, 2, 2] = _ID
    w[:, :, 1, 1] = _ID  # uniform (non-decaying) pair channel
    w[:, :, 0, 1] = z
    w[:, :, 1, 2] = 2.0 * z
    w[:, :, 0, 2] = onsite
    # lam scales through the boundary vector (exact, keeps cores uniform)
    cores = jnp.asarray(np.broadcast_to(w, (n_sites, 2, 2, 3, 3)), dtype)
    left = jnp.asarray(np.array([lam, 0.0, 0.0]), dtype)
    right = jnp.asarray(np.array([0.0, 0.0, 1.0]), dtype)
    return MPO(cores, left, right)


def dmrg_sector(mpo, mps0, q, lam=None, max_bond=None, sweeps=4,
                **kwargs):
    """Ground state of a U(1)-conserving ``mpo`` in the total-``S^z = q``
    sector, by minimizing ``H + lam (S^z_tot - q)^2``.

    The reported energy is the TRUE Rayleigh quotient of ``H`` on the
    optimized state (penalty excluded); the returned ``sz_residual`` is
    ``<(S^z_tot - q)^2>``, which should be ~0 when the sector is
    resolved (raise ``lam`` above the neighboring-sector gap if not).
    Spin gaps come from two calls: ``E0(q=1) - E0(q=0)``.

    Returns ``(mps, energy, sz_residual)``.
    """
    from .mpo import mpo_sum

    if lam is None:
        # safely above typical sector gaps for O(1) couplings
        lam = 10.0 * (1.0 + float(mps0.n_sites))
    pen = total_sz_penalty_mpo(mps0.n_sites, q, lam=lam,
                               dtype=jnp.asarray(mpo.cores).dtype)
    h_tot = mpo_sum(mpo, pen)
    mps, _, _ = dmrg(h_tot, mps0, max_bond=max_bond, sweeps=sweeps,
                     **kwargs)
    energy = _rayleigh(mpo, mps)
    residual = _rayleigh(pen, mps) / lam
    return mps, energy, residual


def xx_dimerized_mpo(n_sites, j=1.0, delta=0.5, dtype=jnp.float64):
    """Dimerized XX chain ``H = sum_i J_i (S^x S^x + S^y S^y)`` with
    alternating bonds ``J_i = J (1 + delta)`` / ``J (1 - delta)``.

    The canonical exactly-solvable TWO-SITE-CELL model: Jordan-Wigner
    maps it to free fermions with alternating hoppings ``t_i = J_i / 2``
    and exact two-band dispersion ``|t_1 + t_2 e^{i kappa}|`` in the
    cell momentum — the validation anchor for the blocked-cell
    excitation machinery (:func:`~contractn_tpu.models.mpo.block_mpo`).
    Bond ``(i, i + 1)``'s coupling sits in site ``i``'s emitting
    channel entries, so a 2-core slice is a valid alternating cell.
    """
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    cores = []
    for i in range(n_sites):
        ji = j * (1 + delta if i % 2 == 0 else 1 - delta)
        w = np.zeros((2, 2, 4, 4))
        w[:, :, 0, 0] = np.eye(2)
        w[:, :, 3, 3] = np.eye(2)
        w[:, :, 0, 1] = (ji / 2) * sp
        w[:, :, 0, 2] = (ji / 2) * sm
        w[:, :, 1, 3] = sm
        w[:, :, 2, 3] = sp
        cores.append(w)
    cores = jnp.asarray(np.stack(cores), dtype)
    left = jnp.asarray(np.array([1.0, 0, 0, 0]), dtype)
    right = jnp.asarray(np.array([0, 0, 0, 1.0]), dtype)
    return MPO(cores, left, right)
