"""Mesh-sharded model-layer ensembles: the physics reaches the chips.

Round 2 left every sharded code path in ``parallel/`` serving one
workload (the batched MPS chain) while the flagship model families ran
single-device.  This module closes that gap for the two embarrassingly
parallel ensemble workloads:

* :func:`dmrg_ensemble_sharded` — the batched uniform-shape DMRG of
  :func:`contractn_tpu.models.ensemble.dmrg_ensemble`, with the ensemble
  axis laid over a mesh axis.  A K-Hamiltonian phase scan on an
  n-device mesh runs K/n ground-state searches per chip with ZERO
  collectives (each sample is an independent optimization; the only
  cross-device traffic is the result gather the caller asks for).
* :func:`ipeps_cell_scan_sharded` — the 2D checkerboard phase scan of
  :func:`contractn_tpu.models.ipeps_cell.ipeps_cell_scan`, same layout.

Both call the SAME per-sample core the single-device paths vmap
(`_dmrg_uniform_core` / `_scan_core`).  Per-sample results match the
unsharded ensemble at machine precision — not bitwise, because XLA
schedules batched kernels differently at local batch K/n vs K (measured
4.4e-15 energy drift from the batch size alone, before any sharding) —
pinned by ``tests/test_parallel_models.py``.

The reference has no optimizer and no collectives at all
(``/root/reference/contractn/einsum.py:24-28`` dispatches a
single-device interpreted loop; SURVEY.md §2 "Parallelism: none");
this is the additive distributed-analog capability of SURVEY.md §5.
"""

from functools import partial

import jax
from jax.sharding import PartitionSpec as P

from ..models.ensemble import _dmrg_uniform_core


def _check_batch(batch, mesh, axis, what):
    n_dev = mesh.shape[axis]
    if batch % n_dev:
        raise ValueError(
            f"{what}={batch} must divide by the '{axis}' mesh axis "
            f"(size {n_dev})"
        )


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _dmrg_ensemble_sharded_jit(mesh, mpos, mps0s, sweeps, iters, axis):
    body = jax.vmap(
        lambda m, s: _dmrg_uniform_core(m, s, sweeps, iters)
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(mpos, mps0s)


def dmrg_ensemble_sharded(mesh, mpos, mps0s, sweeps=4, lanczos_iters=40,
                          axis="dp"):
    """:func:`~contractn_tpu.models.ensemble.dmrg_ensemble` over a mesh.

    ``mpos`` / ``mps0s`` carry a leading ensemble axis ``K`` (build with
    :func:`~contractn_tpu.models.ensemble.stack_pytrees`); ``K`` shards
    over mesh axis ``axis``.  Per-sample results are machine-precision
    equal to the single-device vmap (not bitwise; XLA reschedules
    batched kernels at the local batch size — see module docstring).

    Returns ``(ground_mpss, energies, traces)`` with leading axis ``K``,
    sharded over ``axis``.
    """
    n_sites = mps0s.cores.shape[1]
    if n_sites < 2:
        raise ValueError("dmrg_ensemble_sharded needs at least 2 sites")
    _check_batch(mps0s.cores.shape[0], mesh, axis, "ensemble size K")
    return _dmrg_ensemble_sharded_jit(
        mesh, mpos, mps0s, int(sweeps), int(lanczos_iters), axis
    )


def ipeps_cell_scan_sharded(mesh, h2_batch, bond_dim, chi, d=2,
                            schedule=((0.1, 150), (0.02, 150),
                                      (0.005, 80)),
                            iters=120, ops=(), dtype=None, init=None,
                            axis="dp"):
    """:func:`~contractn_tpu.models.ipeps_cell.ipeps_cell_scan` over a
    mesh: the ``(B,)`` family of bond terms shards over ``axis``; gates,
    simple update, CTMRG environments and energies all run per-shard
    with the per-sample program identical to the unbatched path.

    Returns the same dict (``a, b, energy, moments``), leading axis
    ``B`` sharded over ``axis``.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    h2_batch = jnp.asarray(h2_batch, dtype)
    _check_batch(h2_batch.shape[0], mesh, axis, "family size B")
    ops_arr = (jnp.stack([jnp.asarray(o, dtype) for o in ops])
               if ops else jnp.zeros((0, d, d), dtype))
    if init is not None:
        init = tuple(jnp.asarray(t, dtype) for t in init)
    sched = tuple((float(t), int(n)) for t, n in schedule)

    a, b, energy, moments = _ipeps_scan_sharded_jit(
        mesh, h2_batch, ops_arr, init, int(bond_dim), int(chi), int(d),
        sched, int(iters), axis
    )
    return {"a": a, "b": b, "energy": energy, "moments": moments}


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9))
def _ipeps_scan_sharded_jit(mesh, h2_batch, ops_arr, init, bond_dim,
                            chi, d, schedule, iters, axis):
    """Module-level jit (stable identity → compile-cache hits across
    repeated scans, same rationale as ``_scan_impl``)."""
    from ..models.ipeps_cell import _scan_core

    fn = jax.shard_map(
        lambda h, o, i: _scan_core(h, o, i, bond_dim, chi, d,
                                   schedule, iters),
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(h2_batch, ops_arr, init)
