"""Mesh-sharded contraction and training on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models import MPS
from contractn_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    make_train_step,
    sharded_mps_forward,
)


def _setup(n_sites=8, phys_dim=2, bond_dim=4, batch=8):
    key = jax.random.PRNGKey(0)
    mps = MPS.random(key, n_sites, phys_dim, bond_dim, dtype=jnp.float64)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, n_sites, phys_dim), jnp.float64
    )
    return mps, x


def test_sharded_forward_matches_single_device():
    mps, x = _setup()
    mesh = make_mesh({"dp": 4, "sp": 2})
    amp_s, log_s = jax.jit(
        lambda c, l, r, xx: sharded_mps_forward(mesh, c, l, r, xx)
    )(mps.cores, mps.left, mps.right, x)
    amp, log = jax.jit(mps.evaluate)(x)
    # Split pairs are canonical (mean |mantissa| = 1), so they match directly
    val_s = np.asarray(amp_s) * np.exp(np.asarray(log_s))
    val = np.asarray(amp) * np.exp(np.asarray(log))
    assert np.allclose(val_s, val, rtol=1e-9)


def test_sharded_train_step_runs_and_matches_unsharded():
    mps, x = _setup()
    y = jnp.zeros((x.shape[0],), jnp.float64)
    mesh = make_mesh({"dp": 4, "sp": 2})
    sharded_step = make_sharded_train_step(mesh, lr=1e-2)
    plain_step = make_train_step(lr=1e-2)

    new_sharded, loss_sharded = sharded_step(mps, x, y)
    new_plain, loss_plain = plain_step(mps, x, y)

    assert np.isfinite(float(loss_sharded))
    assert np.isclose(float(loss_sharded), float(loss_plain), rtol=1e-9)
    assert np.allclose(
        np.asarray(new_sharded.cores), np.asarray(new_plain.cores), rtol=1e-8
    )
    # And the loss actually decreases over a few steps
    m, prev = mps, float(loss_sharded)
    for _ in range(3):
        m, loss = sharded_step(m, x, y)
    assert float(loss) < prev


def test_tp_train_step_matches_unsharded():
    """3-axis dp x sp x tp step: same loss and updates as single-device."""
    from contractn_tpu.parallel import make_tp_train_step

    mps, x = _setup(n_sites=8, phys_dim=2, bond_dim=8, batch=8)
    y = jnp.zeros((x.shape[0],), jnp.float64)
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    tp_step = make_tp_train_step(mesh, lr=1e-2)
    plain_step = make_train_step(lr=1e-2)

    new_tp, loss_tp = tp_step(mps, x, y)
    new_plain, loss_plain = plain_step(mps, x, y)
    assert np.isclose(float(loss_tp), float(loss_plain), rtol=1e-9)
    assert np.allclose(
        np.asarray(new_tp.cores), np.asarray(new_plain.cores), rtol=1e-8
    )


def test_sharded_shape_validation_messages():
    mps, x = _setup(n_sites=7, phys_dim=2, bond_dim=4, batch=8)  # 7 % 2 != 0
    mesh = make_mesh({"dp": 4, "sp": 2})
    step = make_sharded_train_step(mesh)
    y = jnp.zeros((8,), jnp.float64)
    import pytest

    with pytest.raises(ValueError, match="n_sites"):
        step(mps, x, y)


def test_remat_gradients_match():
    """Checkpointed-segment gradients equal the plain-scan gradients."""
    mps, x = _setup(n_sites=12, phys_dim=2, bond_dim=4, batch=4)

    def loss(m, remat):
        amp, log = m.evaluate(x, remat_segments=remat)
        return jnp.sum(jnp.log(jnp.abs(amp) + 1e-30) + log)

    g_plain = jax.jit(jax.grad(lambda m: loss(m, None)))(mps)
    g_remat = jax.jit(jax.grad(lambda m: loss(m, 4)))(mps)
    assert np.allclose(
        np.asarray(g_plain.cores), np.asarray(g_remat.cores), rtol=1e-9
    )


def test_mesh_validation():
    import pytest

    with pytest.raises(ValueError):
        make_mesh({"dp": 3})  # 8 devices, wrong product


def test_optax_train_step_single_and_sharded():
    """optax optimizers drive both the single-device and shard-mapped
    training paths; sharded loss matches single-device loss exactly."""
    import jax
    import jax.numpy as jnp
    import optax

    from contractn_tpu.models import MPS
    from contractn_tpu.parallel import make_mesh, make_optax_train_step

    n_sites, batch = 8, 8
    mps = MPS.random(jax.random.PRNGKey(0), n_sites, 2, 4,
                     dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_sites, 2),
                          jnp.float64)
    y = jnp.zeros((batch,), jnp.float64)
    opt = optax.adam(1e-2)

    step, init = make_optax_train_step(opt)
    st = init(mps)
    m1, st, l1 = step(mps, st, x, y)
    m1b, st, l1b = step(m1, st, x, y)
    assert float(l1b) < float(l1)  # adam makes progress

    mesh = make_mesh({"dp": 4, "sp": 2})
    sstep, sinit = make_optax_train_step(opt, mesh=mesh)
    sst = sinit(mps)
    sm1, sst, sl1 = sstep(mps, sst, x, y)
    assert np.isclose(float(sl1), float(l1), rtol=1e-10)
    assert np.allclose(np.asarray(sm1.cores), np.asarray(m1.cores),
                       rtol=1e-10)
