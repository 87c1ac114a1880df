"""Mesh-sharded model layer: ensembles over dp, tensor-parallel DMRG.

Round-3 requirement: the physics algorithms reach the mesh, with
per-sample results pinned against the single-device paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models import (
    MPS,
    dmrg_ensemble,
    dmrg_uniform,
    stack_pytrees,
    tfim_mpo,
)
from contractn_tpu.parallel import (
    dmrg_ensemble_sharded,
    dmrg_uniform_tp,
    ipeps_cell_scan_sharded,
    make_mesh,
)


def _ensemble(n=6, bond=8, hs=(0.4, 0.8, 1.2, 1.6)):
    mpos = stack_pytrees([tfim_mpo(n, h=h) for h in hs])
    mps0s = stack_pytrees([
        MPS.random(jax.random.PRNGKey(i), n, 2, bond, dtype=jnp.float64)
        for i in range(len(hs))
    ])
    return mpos, mps0s


def _sample(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def test_dmrg_ensemble_sharded_matches_vmap():
    """4 TFIM couplings over a 4-device dp axis == the single-device
    vmap.  The per-sample PROGRAM is identical (same `_dmrg_uniform_core`
    trace), but XLA schedules batched kernels differently at local batch
    1 vs 4, so equality is machine-precision, not bitwise (measured
    4.4e-15 energy drift from batch size alone, with downstream SVD
    sign-gauge flips in the cores); we pin energies at 1e-12 and states
    by per-sample fidelity."""
    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    mpos, mps0s = _ensemble()
    ref_mps, ref_e, ref_tr = dmrg_ensemble(mpos, mps0s, sweeps=2)
    got_mps, got_e, got_tr = dmrg_ensemble_sharded(
        mesh, mpos, mps0s, sweeps=2)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_tr), np.asarray(ref_tr),
                               rtol=1e-12)
    for i in range(4):
        a, b = _sample(got_mps, i), _sample(ref_mps, i)
        ov, ol = a.inner(b)
        nv, nl = b.norm_squared()
        fid = abs(float(ov) * np.exp(float(ol))) / (
            float(nv) * np.exp(float(nl)))
        assert np.isclose(fid, 1.0, atol=1e-9), i


def test_dmrg_ensemble_sharded_validates_divisibility():
    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    mpos, mps0s = _ensemble(hs=(0.5, 1.0, 1.5))
    with pytest.raises(ValueError, match="divide"):
        dmrg_ensemble_sharded(mesh, mpos, mps0s, sweeps=1)


def test_dmrg_uniform_tp_matches_single_device():
    """ONE ground-state search with the local Lanczos sharded over the
    bond on a 2-device tp axis: same energy and state as dmrg_uniform
    (collective reduction order differs -> 1e-10, not bitwise)."""
    from tests.test_dmrg import dense_tfim

    n, bond = 6, 8
    mesh = make_mesh({"tp": 2}, devices=jax.devices()[:2])
    mpo = tfim_mpo(n)
    mps0 = MPS.random(jax.random.PRNGKey(5), n, 2, bond,
                      dtype=jnp.float64)
    ref_mps, ref_e, ref_tr = dmrg_uniform(mpo, mps0, sweeps=3)
    got_mps, got_e, got_tr = dmrg_uniform_tp(mesh, mpo, mps0, sweeps=3)
    e_exact = float(np.linalg.eigvalsh(dense_tfim(n))[0])
    assert np.isclose(float(got_e), e_exact, rtol=1e-8)
    assert np.isclose(float(got_e), float(ref_e), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_tr), np.asarray(ref_tr),
                               rtol=1e-9)
    # States match up to the usual SVD sign gauge; compare overlaps.
    ov, ol = got_mps.inner(ref_mps)
    nv, nl = ref_mps.norm_squared()
    fidelity = abs(float(ov) * np.exp(float(ol))) / (
        float(nv) * np.exp(float(nl)))
    assert np.isclose(fidelity, 1.0, atol=1e-8)


def test_dmrg_uniform_tp_bond64_tp4_sharded_memory():
    """The target regime (round-3 VERDICT #6): bond 64 on a 4-device tp
    axis.  Correctness: energy matches the single-device sweep at
    1e-10.  Memory: XLA's per-device compiled stats show the sharded
    program's working set shrinking with tp — both environment stacks
    and the Krylov basis are ket-sharded (tp_dmrg module doc; the
    replicated (n+1, D, W, D) stacks dominate at large bond)."""
    from contractn_tpu.parallel.tp_dmrg import _dmrg_uniform_tp_jit

    n, bond = 6, 64
    mpo = tfim_mpo(n)
    mps0 = MPS.random(jax.random.PRNGKey(11), n, 2, bond,
                      dtype=jnp.float64)
    mesh4 = make_mesh({"tp": 4}, devices=jax.devices()[:4])
    _, e4, _ = dmrg_uniform_tp(mesh4, mpo, mps0, sweeps=2,
                               lanczos_iters=16)
    _, e1, _ = dmrg_uniform(mpo, mps0, sweeps=2, lanczos_iters=16)
    assert np.isclose(float(e4), float(e1), rtol=1e-10)

    # per-device working set: compiled temp bytes at tp=4 well under
    # the tp=1 program's (floor = replicated sites/theta/SVD buffers)
    temps = {}
    for tp in (1, 4):
        mesh = make_mesh({"tp": tp}, devices=jax.devices()[:tp])
        lowered = _dmrg_uniform_tp_jit.lower(
            mesh, mpo, mps0, 2, 16, "tp")
        temps[tp] = lowered.compile().memory_analysis().temp_size_in_bytes
    assert temps[4] < 0.6 * temps[1], temps


def test_dmrg_uniform_tp_validates_bond():
    mesh = make_mesh({"tp": 2}, devices=jax.devices()[:2])
    mpo = tfim_mpo(4)
    mps0 = MPS.random(jax.random.PRNGKey(0), 4, 2, 5, dtype=jnp.float64)
    with pytest.raises(ValueError, match="divide"):
        dmrg_uniform_tp(mesh, mpo, mps0)


def test_ipeps_cell_scan_sharded_matches_vmap():
    """A 4-sample 2D TFIM field scan over a 4-device dp axis == the
    single-device jit(vmap) program (machine-precision: XLA batched
    kernels reschedule with local batch size, see the DMRG test)."""
    from contractn_tpu.models import ipeps_cell_scan, tfim_bond_term_2d

    hs = [1.0, 2.0, 3.0, 3.5]
    h2 = jnp.stack([tfim_bond_term_2d(h) for h in hs])
    sched = ((0.1, 20), (0.02, 10))
    sx = jnp.array([[0.0, 1.0], [1.0, 0.0]], jnp.float64)
    ref = ipeps_cell_scan(h2, bond_dim=2, chi=8, schedule=sched,
                          iters=10, ops=(sx,))
    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    got = ipeps_cell_scan_sharded(mesh, h2, bond_dim=2, chi=8,
                                  schedule=sched, iters=10, ops=(sx,))
    # Gauge-invariant observables match tightly; the site tensors are
    # gauge-fixed by the simple update so they match too.
    np.testing.assert_allclose(np.asarray(got["energy"]),
                               np.asarray(ref["energy"]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got["moments"]),
                               np.asarray(ref["moments"]),
                               rtol=1e-8, atol=1e-10)
    for k in ("a", "b"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]),
                                   rtol=1e-8, atol=1e-10)


def test_cv_spectra_sharded_matches_vmap():
    import numpy as np
    import jax
    from contractn_tpu.models import dynamical as dyn
    from contractn_tpu.models.dmrg import dmrg, tfim_mpo
    from contractn_tpu.models.mps import MPS
    from contractn_tpu.parallel import cv_greens_function_sharded
    from contractn_tpu.parallel.mesh import make_mesh

    n = 6
    mpo = tfim_mpo(n, h=1.2)
    gs, e0, _ = dmrg(
        mpo, MPS.random(jax.random.PRNGKey(0), n, 2, 8,
                        dtype=np.float64),
        max_bond=8, sweeps=3,
    )
    z = np.diag([1.0, -1.0])
    omegas = np.linspace(0.0, 4.0, 8)
    kw = dict(max_bond=10, sweeps=4, cg_iters=32)
    g_bat = dyn.cv_greens_function_batched(mpo, gs, e0, z, 2, omegas,
                                           0.4, **kw)
    mesh = make_mesh({"dp": 8})
    g_sh = cv_greens_function_sharded(mesh, mpo, gs, e0, z, 2, omegas,
                                      0.4, **kw)
    assert np.max(np.abs(g_sh - g_bat)) < 1e-10

    with __import__("pytest").raises(ValueError):
        cv_greens_function_sharded(mesh, mpo, gs, e0, z, 2,
                                   omegas[:5], 0.4, **kw)
