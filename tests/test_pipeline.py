"""Pipeline-parallel MPS evaluation on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contractn_tpu.models import MPS
from contractn_tpu.parallel import make_mesh, pipeline_mps_forward


def _setup(n_sites=16, phys_dim=2, bond_dim=4, batch=8):
    mps = MPS.random(jax.random.PRNGKey(0), n_sites, phys_dim, bond_dim,
                     dtype=jnp.float64)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, n_sites, phys_dim), jnp.float64
    )
    return mps, x


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (4, 8), (8, 8)])
def test_pipeline_forward_matches_single_device(stages, n_micro):
    mps, x = _setup()
    axes = {"pp": stages} if stages == 8 else {"dp": 8 // stages,
                                               "pp": stages}
    mesh = make_mesh(axes)
    amp_p, log_p = jax.jit(
        lambda c, l, r, xx: pipeline_mps_forward(
            mesh, c, l, r, xx, n_micro=n_micro
        )
    )(mps.cores, mps.left, mps.right, x)
    amp, log = jax.jit(
        lambda xx: mps.evaluate(xx, kernel="scan")
    )(x)
    # The pipeline applies the identical per-site rescale schedule, so the
    # split components themselves match, not just the product.
    assert np.allclose(np.asarray(amp_p), np.asarray(amp), rtol=1e-10)
    assert np.allclose(np.asarray(log_p), np.asarray(log), rtol=1e-10)


def test_pipeline_gradients_match_single_device():
    """Gradients stream back through the ppermute handoffs correctly."""
    mps, x = _setup(n_sites=8, bond_dim=3, batch=4)
    mesh = make_mesh({"dp": 2, "pp": 4})

    def loss_pipe(cores):
        amp, log = pipeline_mps_forward(mesh, cores, mps.left, mps.right,
                                        x, n_micro=4)
        return jnp.sum(jnp.log(jnp.abs(amp) + 1e-30) + log)

    def loss_plain(cores):
        m = MPS(cores, mps.left, mps.right)
        amp, log = m.evaluate(x, kernel="scan")
        return jnp.sum(jnp.log(jnp.abs(amp) + 1e-30) + log)

    g_pipe = jax.jit(jax.grad(loss_pipe))(mps.cores)
    g_plain = jax.jit(jax.grad(loss_plain))(mps.cores)
    assert np.allclose(np.asarray(g_pipe), np.asarray(g_plain), rtol=1e-8)


def test_pipeline_split_format_survives_overflowing_chains():
    """A chain whose product overflows float64 streams through the pipe
    exactly (the log register rides next to the carry)."""
    n_sites, bond = 16, 3
    cores = jnp.full((n_sites, 2, bond, bond), 1e40, jnp.float64)
    left = jnp.ones((bond,), jnp.float64)
    right = jnp.ones((bond,), jnp.float64)
    x = jnp.ones((4, n_sites, 2), jnp.float64)
    mesh = make_mesh({"dp": 2, "pp": 4})
    amp, log = pipeline_mps_forward(mesh, cores, left, right, x, n_micro=4)
    assert np.all(np.isfinite(np.asarray(amp)))
    assert np.all(np.isfinite(np.asarray(log)))
    # closed form: each site multiplies by (2 * 1e40 * 3) after the x-sum
    # and bond contraction; log total = (n-1) log(6e40 * ...) — just check
    # against the single-device evaluation
    m = MPS(cores, left, right)
    amp_ref, log_ref = m.evaluate(x, kernel="scan")
    assert np.allclose(np.asarray(amp), np.asarray(amp_ref), rtol=1e-12)
    assert np.allclose(np.asarray(log), np.asarray(log_ref), rtol=1e-12)


def test_pipeline_shape_validation():
    mps, x = _setup(n_sites=15)  # 15 % 4 != 0
    mesh = make_mesh({"dp": 2, "pp": 4})
    with pytest.raises(ValueError, match="n_sites"):
        pipeline_mps_forward(mesh, mps.cores, mps.left, mps.right, x)
    mps, x = _setup(batch=6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_mps_forward(mesh, mps.cores, mps.left, mps.right, x,
                             n_micro=4)


def test_pipeline_train_step_matches_unsharded():
    """Pipelined training step: same loss and updates as single-device."""
    from contractn_tpu.parallel import (
        make_pipeline_train_step,
        make_train_step,
    )

    mps, x = _setup(n_sites=8, bond_dim=4, batch=8)
    y = jnp.zeros((x.shape[0],), jnp.float64)
    mesh = make_mesh({"dp": 2, "pp": 4})
    pipe_step = make_pipeline_train_step(mesh, lr=1e-2, n_micro=4)
    plain_step = make_train_step(lr=1e-2)

    new_pipe, loss_pipe = pipe_step(mps, x, y)
    new_plain, loss_plain = plain_step(mps, x, y)
    assert np.isclose(float(loss_pipe), float(loss_plain), rtol=1e-9)
    assert np.allclose(
        np.asarray(new_pipe.cores), np.asarray(new_plain.cores), rtol=1e-8
    )
    # loss decreases over a few pipelined steps
    m, prev = mps, float(loss_pipe)
    for _ in range(3):
        m, loss = pipe_step(m, x, y)
    assert float(loss) < prev
