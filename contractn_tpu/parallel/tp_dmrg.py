"""Tensor-parallel DMRG: the local Lanczos solve sharded over the bond.

Intra-problem model parallelism — ONE ground-state search spread over a
mesh axis, for bond dimensions whose two-site blocks outgrow a single
chip.  Layout, per two-site solve at bond ``D`` on ``n_tp`` devices:

* the two-site block ``theta (d, d, Dl, Dr)`` shards over its RIGHT
  bond ``Dr`` (each device holds ``(d, d, D, D/n_tp)``);
* the right environment ``R (k, u, q)`` shards over its ket bond ``q``
  (matching theta's ``Dr``); ``L``, ``w1``, ``w2`` replicate;
* the effective-Hamiltonian matvec contracts this device's ``q`` slice
  locally, then one ``psum_scatter`` over the output bond ``k``
  re-shards the result — the classic partial-sum + reduce-scatter
  pattern, riding the ICI once per matvec;
* every Lanczos inner product is a local partial dot + scalar ``psum``
  (:func:`contractn_tpu.ops.krylov.lanczos_basis` with ``axis_name``).

The sweep structure itself (`_dmrg_uniform_core`) is reused verbatim
through its ``solver`` seam: environments and SVD splits replicate
(cheap, O(D^3) with small constants) while the dominant cost — the
``iters`` Heff matvecs per site — runs 1/n_tp per device.  Results
match the single-device :func:`~contractn_tpu.models.ensemble.
dmrg_uniform` to collective-reduction-order rounding (pinned at 1e-10
by ``tests/test_parallel_models.py``).

The reference is single-device by construction
(``/root/reference/contractn/einsum.py:24-28``); this is the SURVEY.md
§5 "distributed communication backend" analog applied to the physics
layer, not just the MPS data path.
"""

from functools import partial

import jax
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


def _tp_solver(tp_axis, iters):
    """The ``solver`` plugged into ``_dmrg_uniform_core``'s seam."""

    def solver(L, w1, w2, R, theta0):
        n_tp = jax.lax.axis_size(tp_axis)
        bond = theta0.shape[3]
        chunk = bond // n_tp
        q0 = jax.lax.axis_index(tp_axis) * chunk
        theta_l = jax.lax.dynamic_slice_in_dim(theta0, q0, chunk, axis=3)
        r_l = jax.lax.dynamic_slice_in_dim(R, q0, chunk, axis=2)
        energy, vec_l = lanczos_ground(
            lambda t: heff_matvec_tp(L, w1, w2, r_l, t, tp_axis),
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
