"""Uniform-shape DMRG: one jitted program, vmappable over ensembles.

The ragged :func:`~contractn_tpu.models.dmrg.dmrg` sweep is a host loop
over sites with site-dependent bond shapes — the right structure for a
single ground-state search, but invisible to ``vmap``.  This module
rebuilds the two-site sweep with **static uniform shapes**: every bond is
padded to the same ``D`` (zero rows/columns at the chain edges, the same
convention as the stacked ``(N, d, D, D)`` MPS form), environments live in
two ``(N + 1, D, W, D)`` stacks, and the whole multi-sweep optimization is
a single ``lax.fori_loop`` program with zero host syncs.

That buys two TPU-native capabilities the reference (a contraction
library with no optimizer at all — SURVEY.md §2) has no analog of:

* ``jax.jit(dmrg_uniform)`` — the entire ground-state search compiles to
  one XLA program (no per-site dispatch, no per-sweep host round-trips —
  on the ~28 ms-RTT remote TPU the ragged sweep pays hundreds of syncs).
* ``dmrg_ensemble`` — ``vmap`` over a *batch of Hamiltonians* (e.g. a
  phase-diagram scan over coupling constants): K independent DMRG runs
  execute as one batched program whose local eigensolves are batched
  GEMMs on the MXU.

Correctness of the padding: environments are built from the padded site
tensors, so padded directions carry exact zeros through every
``_update_left``/``_update_right``; the effective Hamiltonian annihilates
the padded subspace, SVD splits of a block supported on the physical
subspace keep zero support on the padding (zero rows stay zero under
SVD), and the Lanczos iterate never leaves the physical subspace.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.krylov import lanczos_ground
from ..ops.stabilize import peinsum
from .dmrg import _heff_matvec, _split_theta, _update_left, _update_right
from .mps import MPS


def _pad_boundary_sites(mps):
    """Absorb the boundary vectors; keep the uniform ``(N, d, D, D)`` shape.

    Site 0 becomes ``l . A_0`` placed in bond row 0 (rows 1..D-1 zero);
    site N-1 becomes ``A_{N-1} . r`` in bond column 0.  The returned stack
    contracts against unit boundary vectors ``e_0``.
    """
    cores = mps.cores
    first = peinsum("i,dij->dj", mps.left.astype(cores.dtype), cores[0])
    last = peinsum("dij,j->di", cores[-1], mps.right.astype(cores.dtype))
    first_p = jnp.zeros_like(cores[0]).at[:, 0, :].set(first)
    last_p = jnp.zeros_like(cores[-1]).at[:, :, 0].set(last)
    return cores.at[0].set(first_p).at[-1].set(last_p)


def _boundary_env(vec, bond_dim, dtype):
    """``(D, W, D)`` environment holding ``vec`` at bond index (0, :, 0)."""
    w = vec.shape[0]
    return jnp.zeros((bond_dim, w, bond_dim), dtype).at[0, :, 0].set(
        vec.astype(dtype)
    )


def _dmrg_uniform_core(mpo, mps0, sweeps, iters, solver=None,
                       masks=None, splitter=None, env_ops=None):
    """The whole optimization as one traceable program (jit/vmap it).

    ``solver(L, w1, w2, R, theta0) -> (energy, theta)`` overrides the
    local two-site ground-state solve — the seam the tensor-parallel
    sweep (:mod:`contractn_tpu.parallel.tp_dmrg`) plugs its bond-sharded
    Lanczos into while reusing this exact sweep structure.

    ``masks (N, d, D, D)`` (0/1) constrains every site tensor to a
    charge-allowed block structure, and ``splitter(theta, i, to_left)``
    overrides the two-site SVD split — the exact-U(1) hooks
    (:mod:`contractn_tpu.models.u1`).  The two go together: a plain SVD
    orders the middle bond by singular value, not by the static charge
    layout the masks encode, so masking without a charge-aligned
    splitter annihilates the state.

    ``env_ops = (boundary, update_left, update_right)`` overrides the
    environment construction/absorption — the seam the tensor-parallel
    sweep uses to store BOTH environment stacks sharded over their ket
    bond (the replicated ``(n+1, D, W, D)`` stacks dominate per-device
    memory at large bond; see :mod:`contractn_tpu.parallel.tp_dmrg`).
    The stored env shapes follow whatever ``boundary`` returns; the
    solver seam receives the stored (possibly local) tensors.
    """
    sites = _pad_boundary_sites(mps0)
    if masks is not None:
        sites = sites * masks.astype(sites.dtype)
    n, d, bond, _ = sites.shape
    dt = jnp.result_type(sites.dtype, mpo.cores.dtype)
    sites = sites.astype(dt)
    ws = mpo.cores.astype(dt)

    if env_ops is None:
        env_boundary, env_up_l, env_up_r = (
            _boundary_env, _update_left, _update_right)
    else:
        env_boundary, env_up_l, env_up_r = env_ops

    l0 = env_boundary(mpo.left, bond, dt)
    rn = env_boundary(mpo.right, bond, dt)

    # Right environments for the first sweep: R[i] absorbs sites i..n-1.
    def build_right(r, sw):
        s, w = sw
        r = env_up_r(r, s, w)
        return r, r

    _, right_tail = jax.lax.scan(
        build_right, rn, (sites[1:][::-1], ws[1:][::-1])
    )
    envs_r = (
        jnp.zeros((n + 1,) + rn.shape, dt)
        .at[n].set(rn)
        .at[1:n].set(right_tail[::-1])
    )
    envs_l = jnp.zeros((n + 1,) + l0.shape, dt).at[0].set(l0)

    if solver is None:
        def solver(L, w1, w2, R, theta0):
            return lanczos_ground(
                lambda t: _heff_matvec(L, w1, w2, R, t), theta0, iters
            )

    def solve_site(envs_l_i, w1, w2, envs_r_i2, s1, s2):
        theta0 = peinsum("apj,bjq->abpq", s1, s2)
        return solver(envs_l_i, w1, w2, envs_r_i2, theta0)

    if splitter is None:
        def splitter(theta, i, to_left):
            return _split_theta(theta, bond, to_left)

    def apply_masks(t1, t2, i):
        if masks is None:
            return t1, t2
        return (t1 * masks[i].astype(t1.dtype),
                t2 * masks[i + 1].astype(t2.dtype))

    def sweep(k, carry):
        sites, envs_l, envs_r, energies = carry

        def lr_body(i, c):
            sites, envs_l, _ = c
            s1 = sites[i]
            s2 = sites[i + 1]
            w1 = ws[i]
            w2 = ws[i + 1]
            energy, theta = solve_site(
                envs_l[i], w1, w2, envs_r[i + 2], s1, s2
            )
            t1, t2 = splitter(theta, i, True)
            t1, t2 = apply_masks(t1, t2, i)
            sites = sites.at[i].set(t1).at[i + 1].set(t2)
            envs_l = envs_l.at[i + 1].set(
                env_up_l(envs_l[i], t1, w1)
            )
            return sites, envs_l, energy

        sites, envs_l, energy = jax.lax.fori_loop(
            0, n - 1, lr_body, (sites, envs_l, jnp.zeros((), envs_l.real.dtype))
        )

        def rl_body(j, c):
            sites, envs_r, _ = c
            i = n - 2 - j
            s1 = sites[i]
            s2 = sites[i + 1]
            w1 = ws[i]
            w2 = ws[i + 1]
            energy, theta = solve_site(
                envs_l[i], w1, w2, envs_r[i + 2], s1, s2
            )
            t1, t2 = splitter(theta, i, False)
            t1, t2 = apply_masks(t1, t2, i)
            sites = sites.at[i].set(t1).at[i + 1].set(t2)
            envs_r = envs_r.at[i + 1].set(
                env_up_r(envs_r[i + 2], t2, w2)
            )
            return sites, envs_r, energy

        sites, envs_r, energy = jax.lax.fori_loop(
            0, n - 1, rl_body, (sites, envs_r, energy)
        )
        energies = energies.at[k].set(jnp.real(energy))
        return sites, envs_l, envs_r, energies

    energies0 = jnp.zeros((sweeps,), jnp.zeros((), dt).real.dtype)
    sites, _, _, energies = jax.lax.fori_loop(
        0, sweeps, sweep, (sites, envs_l, envs_r, energies0)
    )

    e0 = jnp.zeros((bond,), dt).at[0].set(1.0)
    return MPS(sites, e0, e0), energies[-1], energies


@partial(jax.jit, static_argnums=(2, 3))
def _dmrg_uniform_jit(mpo, mps0, sweeps, iters):
    return _dmrg_uniform_core(mpo, mps0, sweeps, iters)


@partial(jax.jit, static_argnums=(2, 3))
def _dmrg_ensemble_jit(mpos, mps0s, sweeps, iters):
    return jax.vmap(
        lambda m, s: _dmrg_uniform_core(m, s, sweeps, iters)
    )(mpos, mps0s)


def dmrg_uniform(mpo, mps0, sweeps=4, lanczos_iters=40):
    """Two-site DMRG with static uniform shapes: ONE jitted program.

    Same variational optimization as :func:`~contractn_tpu.models.dmrg.dmrg`
    with ``max_bond = mps0.bond_dim``, but every local solve uses the
    device-side Lanczos (no dense-eigh small-problem path) and the entire
    multi-sweep loop runs on device with zero host syncs.

    Args:
        mpo: Hermitian Hamiltonian as an :class:`MPO` (uniform ``W``).
        mps0: initial state; its bond dimension is the optimization bond.
        sweeps: full left-right + right-left sweeps (static).
        lanczos_iters: Krylov depth per local solve (static).  The default
            is deliberately above the ragged path's 24: uniform sweeps
            solve every local problem by Lanczos, including the small
            edge blocks where the ragged path would use dense eigh.

    Returns:
        ``(ground_mps, energy, energies)`` — all device values (no host
        sync); ``energies`` is the per-sweep trace, shape ``(sweeps,)``.
    """
    if mps0.n_sites < 2:
        raise ValueError("dmrg_uniform needs at least 2 sites")
    return _dmrg_uniform_jit(mpo, mps0, int(sweeps), int(lanczos_iters))


def dmrg_ensemble(mpos, mps0s, sweeps=4, lanczos_iters=40):
    """Batched ground-state search over a Hamiltonian ensemble (vmap).

    ``mpos`` / ``mps0s`` are :class:`MPO` / :class:`MPS` pytrees whose
    leaves carry a leading ensemble axis ``K`` (build them with
    :func:`stack_pytrees`).  K independent DMRG optimizations — e.g. a
    transverse-field scan ``[tfim_mpo(n, h=h) for h in hs]`` — run as one
    batched XLA program: the Lanczos matvecs and the local SVD splits
    batch over ``K`` on the MXU, which is how a phase-diagram sweep
    should run on a TPU (not K sequential host-looped solves).

    Returns ``(ground_mpss, energies, traces)`` with leading axis ``K``.
    """
    n_sites = mps0s.cores.shape[1]
    if n_sites < 2:
        raise ValueError("dmrg_ensemble needs at least 2 sites")
    return _dmrg_ensemble_jit(mpos, mps0s, int(sweeps), int(lanczos_iters))


def stack_pytrees(items):
    """Stack a list of identically-shaped pytrees along a new leading axis.

    ``stack_pytrees([tfim_mpo(8, h=h) for h in hs])`` builds the ensemble
    :class:`MPO` for :func:`dmrg_ensemble`; works for :class:`MPS` lists
    (and any other pytree) the same way.
    """
    if not items:
        raise ValueError("stack_pytrees needs a non-empty list")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
