"""Mesh-sharded dynamical spectra: frequency grids over the chips.

The correction-vector frequency grid is embarrassingly parallel AND
tiny in its batch data — the operator's cores are frequency-independent
and only a ``(n_w, W)`` boundary-vector array varies (see
``models/dynamical.py``) — so the natural multi-chip layout shards the
frequency axis over a ``dp`` mesh axis: each chip solves ``n_w / n_dev``
resolvent systems with ZERO collectives, and the only cross-device
traffic is the final gather of the (two scalars per frequency) Green's
function values.  Same per-frequency body as the single-device
``cv_greens_function_batched`` vmap, so results match it at machine
precision.

The reference has no solver, no spectra, and no collectives
(SURVEY.md section 2 / section 5 distributed-analog).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.dmrg import _ragged_sites
from ..models.dynamical import (
    _freq_family,
    _inner,
    _overlap_pure,
    _sandwich_pure,
    _solve_pure,
    apply_site_operator,
)

__all__ = ["cv_greens_function_sharded", "cv_spectral_function_sharded"]


@partial(jax.jit, static_argnums=(0, 1, 7, 8, 9))
def _cv_sharded_jit(mesh, axis, a_lefts, k_lefts, a_right, k_right,
                    packed, sweeps, max_bond, cg_iters):
    a_cores, k_cores, bs = packed

    def one(a_left, k_left):
        ys = _solve_pure(list(a_cores), a_left, a_right, list(bs),
                         sweeps, max_bond, cg_iters)
        by = _overlap_pure(list(bs), ys)
        bky = _sandwich_pure(list(bs), list(k_cores), k_left, k_right,
                             ys)
        return bky, by

    body = jax.vmap(one)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(a_lefts, k_lefts)


def cv_greens_function_sharded(mesh, h_mpo, ground, e0, op, site,
                               omegas, eta, axis="dp", max_bond=None,
                               sweeps=6, cg_iters=64):
    """``cv_greens_function_batched`` with the frequency axis sharded
    over ``mesh[axis]``.  ``len(omegas)`` must divide the axis size."""
    omegas = np.atleast_1d(np.asarray(omegas, float))
    n_dev = mesh.shape[axis]
    if omegas.shape[0] % n_dev:
        raise ValueError(
            f"n_omegas={omegas.shape[0]} must divide by the "
            f"'{axis}' mesh axis (size {n_dev})"
        )
    b_mps = apply_site_operator(ground, op, site)
    bs = tuple(_ragged_sites(b_mps))
    norm = _inner(ground, ground).real
    k_t, a_t, k_left_fn, a_left_fn = _freq_family(h_mpo, eta)
    n = len(bs)
    max_bond = max_bond or b_mps.bond_dim
    shifts = omegas + e0
    k_lefts = jnp.asarray(np.stack([k_left_fn(s) for s in shifts]))
    a_lefts = jnp.asarray(np.stack([a_left_fn(s) for s in shifts]))
    packed = (
        tuple(a_t.cores[i] for i in range(n)),
        tuple(k_t.cores[i] for i in range(n)),
        bs,
    )
    bky, by = _cv_sharded_jit(
        mesh, axis, a_lefts, k_lefts, jnp.asarray(a_t.right),
        jnp.asarray(k_t.right), packed, int(sweeps), int(max_bond),
        int(cg_iters),
    )
    return (np.asarray(bky) - 1j * eta * np.asarray(by)) / norm


def cv_spectral_function_sharded(mesh, h_mpo, ground, e0, op, site,
                                 omegas, eta, **kwargs):
    """``-(1/pi) Im G`` with the grid sharded over the mesh."""
    g = cv_greens_function_sharded(mesh, h_mpo, ground, e0, op, site,
                                   omegas, eta, **kwargs)
    return -g.imag / np.pi
