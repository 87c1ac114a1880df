"""Tensor-parallel DMRG: Lanczos solves AND environments sharded over
the bond.

Intra-problem model parallelism — ONE ground-state search spread over a
mesh axis, for bond dimensions whose working set outgrows a single
chip.  Layout, per two-site solve at bond ``D`` on ``n_tp`` devices:

* the two-site block ``theta (d, d, Dl, Dr)`` shards over its RIGHT
  bond ``Dr`` (each device holds ``(d, d, D, D/n_tp)``), and with it
  the WHOLE Krylov basis (``iters + 1`` copies — the per-solve memory
  driver);
* BOTH environment stacks ``(n+1, D, W, D)`` are STORED sharded over
  their ket bond (``env_ops`` seam of ``_dmrg_uniform_core``) — at
  large bond the replicated stacks dominate per-device memory (n=16,
  D=256, W=5, f64: 356 MB replicated vs 45 MB/device at tp=8; measured
  table in docs/ROOFLINE.md).  Each environment absorption contracts
  the local ket slice, completes the partial sum with one ``psum``,
  and re-slices — 2(n-1) extra collectives per sweep, negligible next
  to the ``iters`` matvecs per site;
* the effective-Hamiltonian matvec contracts this device's ``q`` slice
  locally, then one ``psum_scatter`` over the output bond ``k``
  re-shards the result — the classic partial-sum + reduce-scatter
  pattern, riding the ICI once per matvec; the left environment is
  ``all_gather``-ed once per SOLVE (not per matvec);
* every Lanczos inner product is a local partial dot + scalar ``psum``
  (:func:`contractn_tpu.ops.krylov.lanczos_basis` with ``axis_name``).

The sweep structure itself (`_dmrg_uniform_core`) is reused verbatim
through its ``solver`` and ``env_ops`` seams: SVD splits replicate
(cheap, O(D^3) once per site) while the dominant cost — the ``iters``
Heff matvecs per site — runs 1/n_tp per device.  Results match the
single-device :func:`~contractn_tpu.models.ensemble.dmrg_uniform` to
collective-reduction-order rounding (pinned at 1e-10 by
``tests/test_parallel_models.py``).

The reference is single-device by construction
(``/root/reference/contractn/einsum.py:24-28``); this is the SURVEY.md
§5 "distributed communication backend" analog applied to the physics
layer, not just the MPS data path.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.ensemble import _dmrg_uniform_core
from ..ops.krylov import lanczos_ground
from ..ops.stabilize import peinsum


def heff_matvec_tp(L, w1, w2, r_local, theta_local, tp_axis):
    """Bond-sharded two-site Heff matvec: local slice -> local slice.

    ``theta_local (d, d, Dl, Dr_local)``, ``r_local (k, u, q_local)``;
    the contraction over the sharded ``q`` produces a partial sum with
    a FULL output bond ``k``, which one tiled ``psum_scatter`` both
    completes and re-shards.
    """
    t = peinsum("iwp,ABpq->iwABq", L, theta_local)
    t = peinsum("XAwv,iwABq->iXvBq", w1, t)
    t = peinsum("YBvu,iXvBq->iXYuq", w2, t)
    part = peinsum("kuq,iXYuq->XYik", r_local, t)
    return jax.lax.psum_scatter(part, tp_axis, scatter_dimension=3,
                                tiled=True)


def _local_ket_slice(arr, tp_axis, axis):
    n_tp = jax.lax.axis_size(tp_axis)
    chunk = arr.shape[axis] // n_tp
    q0 = jax.lax.axis_index(tp_axis) * chunk
    return jax.lax.dynamic_slice_in_dim(arr, q0, chunk, axis=axis)


def _tp_env_ops(tp_axis):
    """Environment seam: stacks stored SHARDED over their ket bond.

    One absorption = contract the local ket slice (a partial sum over
    the sharded index), complete it with one ``psum``, slice the new
    ket bond locally.  The transient full ``(D, W, D)`` tensor exists
    only inside the update; persistent storage is ``1/n_tp``.
    """

    def boundary(vec, bond_dim, dtype):
        w = vec.shape[0]
        full = jnp.zeros((bond_dim, w, bond_dim), dtype
                         ).at[0, :, 0].set(vec.astype(dtype))
        return _local_ket_slice(full, tp_axis, axis=2)

    def update_left(l_local, site, w):
        # L (i, w_ch, p_local) x site (b, p_local, q) -> partial over p
        site_l = _local_ket_slice(site, tp_axis, axis=1)
        t = peinsum("iwp,bpq->iwbq", l_local, site_l)
        t = peinsum("abwv,iwbq->iavq", w, t)
        part = peinsum("aij,iavq->jvq", jnp.conj(site), t)
        full = jax.lax.psum(part, tp_axis)
        return _local_ket_slice(full, tp_axis, axis=2)

    def update_right(r_local, site, w):
        site_l = _local_ket_slice(site, tp_axis, axis=2)
        t = peinsum("juq,bpq->jubp", r_local, site_l)
        t = peinsum("abwv,jvbp->jwap", w, t)
        part = peinsum("aij,jwap->iwp", jnp.conj(site), t)
        full = jax.lax.psum(part, tp_axis)
        return _local_ket_slice(full, tp_axis, axis=2)

    return boundary, update_left, update_right


def _tp_solver(tp_axis, iters):
    """The ``solver`` plugged into ``_dmrg_uniform_core``'s seam.

    Receives the STORED (ket-sharded) environments: ``R`` is already
    this device's slice (used directly by the matvec); ``L`` is
    gathered once per solve (every matvec needs its full ket bond)."""

    def solver(l_local, w1, w2, r_local, theta0):
        L = jax.lax.all_gather(l_local, tp_axis, axis=2, tiled=True)
        theta_l = _local_ket_slice(theta0, tp_axis, axis=3)
        energy, vec_l = lanczos_ground(
            lambda t: heff_matvec_tp(L, w1, w2, r_local, t, tp_axis),
            theta_l,
            iters,
            axis_name=tp_axis,
        )
        theta = jax.lax.all_gather(vec_l, tp_axis, axis=3, tiled=True)
        return energy, theta

    return solver


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _dmrg_uniform_tp_jit(mesh, mpo, mps0, sweeps, iters, tp_axis):
    body = partial(
        _dmrg_uniform_core,
        sweeps=sweeps,
        iters=iters,
        solver=_tp_solver(tp_axis, iters),
        env_ops=_tp_env_ops(tp_axis),
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(mpo, mps0)


def dmrg_uniform_tp(mesh, mpo, mps0, sweeps=4, lanczos_iters=40,
                    tp_axis="tp"):
    """Uniform-shape two-site DMRG with tensor-parallel local solves.

    Same optimization as :func:`~contractn_tpu.models.ensemble.
    dmrg_uniform`; the bond dimension must divide by the ``tp_axis``
    size.  Returns ``(ground_mps, energy, energies)``, replicated.
    """
    if mps0.n_sites < 2:
        raise ValueError("dmrg_uniform_tp needs at least 2 sites")
    n_tp = mesh.shape[tp_axis]
    bond = mps0.cores.shape[-1]
    if bond % n_tp:
        raise ValueError(
            f"bond_dim={bond} must divide by the '{tp_axis}' mesh axis "
            f"(size {n_tp})"
        )
    return _dmrg_uniform_tp_jit(
        mesh, mpo, mps0, int(sweeps), int(lanczos_iters), tp_axis
    )
