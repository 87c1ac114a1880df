"""Real-space parallel DMRG: one chain, segments swept in parallel.

The third parallel axis for a SINGLE ground-state search, after bond
sharding (:mod:`tp_dmrg`) and Hamiltonian batching (:mod:`ensembles`):
the Stoudenmire–White real-space decomposition [PRB 87, 155137 (2013)]
recast for a device mesh.  Each outer iteration is ONE jitted program:

1. **Mixed-canonical precompute** (replicated, two QR scans): the
   left-canonical stack ``A``, right-canonical stack ``B``, and
   per-bond center matrices ``C_i = R_i c_i`` (left-sweep times
   right-sweep remainders), so the state at EVERY bond ``i`` reads
   ``A_0..A_i C_i B_{i+1}..`` — every window's local problem has
   exact ``N = I`` simultaneously, the property a serial sweep only
   ever has at its single orthogonality center.
2. **Parallel window sweeps** (``shard_map`` over ``sp``): device ``p``
   seeds its window with ``A C`` at its start bond and runs a standard
   left-to-right two-site Lanczos sweep over its ``k - 1`` interior
   bonds against frozen exterior environments (left envs from ``A``,
   right envs from ``B``).  Windows touch DISJOINT site ranges; the
   merged update is one ``psum`` of masked deltas.
3. **Boundary reconciliation**: interior devices QR off the residual
   center at their window end so the glue with the right neighbor's
   center-absorbed seed does not double-count cut weights; the
   chain-end device keeps its center.

Cut bonds between windows are covered by ALTERNATING the window offset
by half a segment each iteration (the offset is a traced scalar: both
parities share one compiled program).  Each iteration therefore acts
like a full serial half-sweep executed in ``P`` parallel chunks — the
Lanczos solves (the dominant cost, ``iters`` matvecs per bond)
parallelize ``P``-fold while the precompute scans are the cheap
Amdahl term (one matvec-equivalent per site).  State and environments
are replicated (this axis parallelizes WORK; compose with ``tp`` to
shard memory).

Accuracy contract (all MEASURED, TFIM n=16 D=8): the QR stitch leaves
the center's orthogonal factor in the glue, so the parallel iterations
alone plateau ~1e-3..1e-6 of the serial optimum (segment-length
dependent; seg=6/n=24 reached 2e-11 outright).  ``final_sweeps=1``
(default) runs the serial :func:`~contractn_tpu.models.ensemble.
dmrg_uniform` polish and lands at 1e-10 — the same serial/parallel
split the S-W paper uses.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.dmrg import (
    _heff_matvec,
    _split_theta,
    _update_left,
    _update_right,
)
from ..models.ensemble import (
    _boundary_env,
    _pad_boundary_sites,
    dmrg_uniform,
)
from ..models.mps import MPS
from ..ops.krylov import lanczos_ground
from ..ops.stabilize import dot_precision, peinsum


def _left_qr(sites):
    """One scan: left-canonical stack ``A`` + per-bond remainders
    ``R_i`` (carry AFTER absorbing site i, normalized)."""
    n, d, bond, _ = sites.shape
    eye = jnp.eye(bond, dtype=sites.dtype)

    def step(c, s):
        t = peinsum("ab,dbc->dac", c, s)
        q, r = jnp.linalg.qr(t.transpose(1, 0, 2).reshape(
            bond * d, bond))
        r = r / jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
        a = q.reshape(bond, d, bond).transpose(1, 0, 2)
        return r, (a, r)

    _, (a_stack, r_stack) = jax.lax.scan(step, eye, sites)
    return a_stack, r_stack


def _right_qr(sites):
    """Reverse scan: right-canonical stack ``B`` + per-bond carries
    ``c_i`` (AFTER absorbing site i+1 going leftward; ``c_i`` sits at
    bond i, normalized)."""
    n, d, bond, _ = sites.shape
    eye = jnp.eye(bond, dtype=sites.dtype)

    def step(c, s):
        t = peinsum("dab,bc->dac", s, c)
        # RQ via QR of the transpose: t (d, D, D) -> rows = right modes
        m = t.transpose(1, 0, 2).reshape(bond, d * bond).T  # (dD, D)
        q, r = jnp.linalg.qr(m)
        b = q.T.reshape(bond, d, bond).transpose(1, 0, 2)
        c_new = r.T
        c_new = c_new / jnp.maximum(jnp.max(jnp.abs(c_new)), 1e-300)
        return c_new, (b, c_new)

    _, (b_stack, c_stack) = jax.lax.scan(step, eye, sites,
                                         reverse=True)
    return b_stack, c_stack


def _env_stacks(a_stack, b_stack, ws, l0, rn):
    """(n+1) environment stacks: ``envs_l[i]`` absorbs A sites
    ``0..i-1``; ``envs_r[i]`` absorbs B sites ``i..n-1``."""
    n = a_stack.shape[0]

    def up_l(e, sw):
        s, w = sw
        e = _update_left(e, s, w)
        return e, e

    _, l_tail = jax.lax.scan(up_l, l0, (a_stack, ws))
    envs_l = jnp.concatenate([l0[None], l_tail], axis=0)

    def up_r(e, sw):
        s, w = sw
        e = _update_right(e, s, w)
        return e, e

    _, r_tail = jax.lax.scan(up_r, rn, (b_stack, ws), reverse=True)
    envs_r = jnp.concatenate([r_tail, rn[None]], axis=0)
    return envs_l, envs_r


def _window_sweep(a_stack, b_stack, c_stack, envs_l, envs_r, ws,
                  offset, n, seg, iters, bond, sp_axis):
    """One device's window: seed ``A C`` at the start bond, sweep its
    ``seg - 1`` interior bonds left-to-right, stitch.  Returns the
    masked merged site stack (replicated via psum)."""
    p = jax.lax.axis_index(sp_axis)
    start = offset + p * seg  # first bond of the window (traced)
    start_c = jnp.clip(start, 0, n - 2)
    n_valid = jnp.clip(n - 1 - start, 0, seg - 1)  # bonds in range

    seed = peinsum("dij,jk->dik", a_stack[start_c], c_stack[start_c])
    sites = b_stack.at[start_c].set(seed)
    envl = envs_l[start_c]

    def body(j, carry):
        sites, envl, energy = carry
        i = jnp.clip(start_c + j, 0, n - 2)
        valid = j < n_valid
        s1, s2 = sites[i], sites[i + 1]
        w1, w2 = ws[i], ws[i + 1]
        theta0 = peinsum("apj,bjq->abpq", s1, s2)
        e, theta = lanczos_ground(
            lambda t: _heff_matvec(envl, w1, w2, envs_r[i + 2], t),
            theta0, iters,
        )
        t1, t2 = _split_theta(theta, bond, True)
        sites_new = sites.at[i].set(t1).at[i + 1].set(t2)
        envl_new = _update_left(envl, t1, w1)
        sites = jnp.where(valid, sites_new, sites)
        envl = jnp.where(valid, envl_new, envl)
        energy = jnp.where(valid, jnp.real(e), energy)
        return sites, envl, energy

    e0 = jnp.zeros((), jnp.zeros((), sites.dtype).real.dtype)
    sites, envl, energy = jax.lax.fori_loop(
        0, seg - 1, body, (sites, envl, e0))

    # Stitch: the window's last touched site holds the residual center
    # (right bond = input B-basis); QR it off so the glue with the
    # right neighbor's center-absorbed seed does not double-count cut
    # weights.  The Q-factor keeps the center's orthogonal factor in
    # the glue, so cut bonds carry an O(iteration-gap) inconsistency —
    # the standard S-W tradeoff, cleaned by `final_sweeps`.  Two
    # "exact" alternatives were MEASURED WORSE on TFIM n=16/seg=4 and
    # must not be re-attempted blindly: M pinv(C) amplifies weak-
    # Schmidt junk (O(0.1-1) energy error at every rcond), and the
    # inversion-free Q_M Q_C' rotation scrambles the transient (0.56
    # vs 5e-4 after 24 iterations).
    last = jnp.clip(start_c + n_valid, 0, n - 1)
    t = sites[last]
    qm, _ = jnp.linalg.qr(t.transpose(1, 0, 2).reshape(-1, bond))
    t_fix = qm.reshape(bond, t.shape[0], bond).transpose(1, 0, 2)
    do_fix = (n_valid > 0) & (last < n - 1)
    sites = sites.at[last].set(jnp.where(do_fix, t_fix, t))

    idx = jnp.arange(n)
    touched = ((idx >= start) & (idx <= start_c + n_valid)
               & (n_valid > 0))
    delta = jnp.where(touched[:, None, None, None],
                      sites - b_stack, 0.0)
    # untouched sites: left of the first window (offset parity) the
    # state's mixed form puts LEFT-canonical tensors (window 0 seeds
    # A C at bond `offset`, so A's must sit below it); everywhere
    # right of a window the exterior is the B stack
    base = jnp.where((idx < offset)[:, None, None, None],
                     a_stack, b_stack)
    merged = base + jax.lax.psum(delta, sp_axis)
    return merged, jax.lax.pmax(energy, sp_axis)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _rs_iteration(mesh, sites, mpo_cores, offset, iters, seg,
                  sp_axis, l_vec, r_vec):
    n, d, bond, _ = sites.shape
    a_stack, r_stack = _left_qr(sites)
    b_stack, c_full = _right_qr(sites)
    # C_i = R_i c_i, normalized (bond i between sites i and i+1):
    # c_stack emitted by _right_qr has c_i at index i+1 (carry after
    # absorbing site i+1 sits at bond i)
    c_bond = jnp.einsum("nab,nbc->nac", r_stack[:-1], c_full[1:],
                        precision=dot_precision(sites.dtype))
    scale = jnp.max(jnp.abs(c_bond), axis=(1, 2), keepdims=True)
    c_bond = c_bond / jnp.maximum(scale, 1e-300)

    l0 = _boundary_env(l_vec, bond, sites.dtype)
    rn = _boundary_env(r_vec, bond, sites.dtype)
    envs_l, envs_r = _env_stacks(a_stack, b_stack, mpo_cores, l0, rn)

    body = partial(_window_sweep, n=n, seg=seg, iters=iters,
                   bond=bond, sp_axis=sp_axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(a_stack, b_stack, c_bond, envs_l, envs_r, mpo_cores,
              offset)


def dmrg_realspace(mesh, mpo, mps0, outer_iters=8, lanczos_iters=40,
                   sp_axis="sp", final_sweeps=1):
    """Ground-state DMRG with real-space parallel window sweeps.

    Args:
        mesh: a :class:`jax.sharding.Mesh` with an ``sp_axis``; the
            chain splits into ``P = mesh.shape[sp_axis]`` windows
            (``n_sites`` must divide by ``P`` with ``>= 2`` sites per
            window).
        mpo: Hermitian Hamiltonian (uniform ``W``).
        mps0: initial state; its bond dimension is the optimization
            bond.
        outer_iters: canonicalize + parallel-sweep iterations; window
            offsets alternate 0 / half-segment so cut bonds are
            optimized on alternating iterations.
        lanczos_iters: Krylov depth per local solve.
        final_sweeps: serial polish sweeps after the parallel phase
            (see the module docstring's accuracy contract); 0 returns
            the raw stitched state.

    Returns:
        ``(ground_mps, energy, energies)`` — ``energies`` is the
        per-PARALLEL-iteration trace of the last local solve (pmax
        over windows); ``energy`` is the final (post-polish) value.
    """
    if mps0.n_sites < 2:
        raise ValueError("dmrg_realspace needs at least 2 sites")
    n_sp = mesh.shape[sp_axis]
    n = mps0.n_sites
    if n % n_sp:
        raise ValueError(
            f"n_sites={n} must divide by the '{sp_axis}' mesh axis "
            f"(size {n_sp})")
    seg = n // n_sp
    if seg < 2:
        raise ValueError("need >= 2 sites per window")

    sites = _pad_boundary_sites(mps0)
    dt = jnp.result_type(sites.dtype, mpo.cores.dtype)
    sites = sites.astype(dt)
    ws = mpo.cores.astype(dt)
    energies = []
    for it in range(int(outer_iters)):
        offset = jnp.asarray((it % 2) * (seg // 2), jnp.int32)
        sites, e = _rs_iteration(
            mesh, sites, ws, offset, int(lanczos_iters), seg,
            sp_axis, mpo.left.astype(dt), mpo.right.astype(dt))
        energies.append(e)
    bond = sites.shape[-1]
    e0 = jnp.zeros((bond,), dt).at[0].set(1.0)
    out = MPS(sites, e0, e0)
    energies = jnp.stack(energies)
    energy = energies[-1]
    if final_sweeps:
        # serial polish, S-W convention: the parallel iterations do the
        # heavy lifting (to ~1e-3..1e-6 of the optimum, stitch-limited);
        # one or two serial sweeps deliver the last variational digits
        out, energy, _ = dmrg_uniform(mpo, out,
                                      sweeps=int(final_sweeps),
                                      lanczos_iters=int(lanczos_iters))
    return out, energy, energies
