"""Gradient training of arbitrary TN graphs (fit_tn)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from contractn_tpu import TN
from contractn_tpu.parallel import fit_tn


def test_fit_cp_decomposition():
    """Learn a CP decomposition of a known rank-2 tensor by gradient
    descent on the TN graph (copy-tensor hub + three factors)."""
    rng = np.random.default_rng(0)
    f1, f2, f3 = (rng.standard_normal((2, 4)) for _ in range(3))
    target = jnp.asarray(np.einsum("ra,rb,rc->abc", f1, f2, f3))

    tn = TN()
    hub = tn.add_copy_node(3, dim=3)  # rank-3 ansatz (overcomplete)
    for i in range(3):
        tn.connect_nodes(
            hub, tn.add_dense_node(0.3 * rng.standard_normal((3, 4))),
            i, 0,
        )

    def loss(out, target):
        mant, log = out
        pred = mant * jnp.exp(log)
        return jnp.mean((pred - target) ** 2)

    trace = fit_tn(tn, optax.adam(0.05), loss, steps=400,
                   batch=(target,))
    assert trace[-1] < 1e-4 * trace[0], (trace[0], trace[-1])
    # the trained graph reproduces the target through plain contract()
    got = np.asarray(tn.contract())
    assert np.allclose(got, np.asarray(target), atol=5e-3)


def test_fit_weight_shared_clone():
    """Clones train correctly: one parameter feeding two slots gets the
    summed cotangent, so a symmetric target is learnable with HALF the
    parameters."""
    rng = np.random.default_rng(1)
    base_w = rng.standard_normal((3, 3))
    target = jnp.asarray(base_w @ base_w.T)  # symmetric rank-3

    tn = TN()
    a = tn.add_dense_node(0.3 * rng.standard_normal((3, 3)))
    c = tn.add_duplicate_node(a)
    tn.connect_nodes(a, c, 1, 1)  # contract the shared inner index

    def loss(out, target):
        mant, log = out
        pred = mant * jnp.exp(log)
        return jnp.sum((pred - target) ** 2)

    trace = fit_tn(tn, optax.adam(0.1), loss, steps=1500,
                   batch=(target,))
    assert trace[-1] < 1e-10, trace[-1]
    assert len(tn.params) == 1  # still one trainable tensor


def test_fit_with_input_nodes():
    """Input nodes carry data batches; dense nodes learn a regression."""
    rng = np.random.default_rng(2)
    w_true = rng.standard_normal((5, 3))

    tn = TN()
    w = tn.add_dense_node(0.1 * rng.standard_normal((5, 3)))
    x_node = tn.add_input_node((5,))
    tn.connect_nodes(w, x_node, 0, 0)

    xs = rng.standard_normal((64, 5))
    ys = jnp.asarray(xs @ w_true)

    # vmap the single-sample contraction over the input batch
    import optax as _optax

    cfun = tn.make_contract_fun(split_format=True)

    def objective(params, xs_b, ys_b):
        def one(x):
            m, log = cfun(params, (x,))
            return m * jnp.exp(log)
        preds = jax.vmap(one)(xs_b)
        return jnp.mean((preds - ys_b) ** 2)

    opt = _optax.adam(0.05)
    params = tuple(jnp.asarray(p) for p in tn.params)
    state = opt.init(params)

    @jax.jit
    def step(params, state, xs_b, ys_b):
        val, g = jax.value_and_grad(objective)(params, xs_b, ys_b)
        upd, state = opt.update(g, state, params)
        return _optax.apply_updates(params, upd), state, val

    first = None
    for _ in range(300):
        params, state, val = step(params, state, jnp.asarray(xs), ys)
        first = first if first is not None else float(val)
    assert float(val) < 1e-8 * first
    assert np.allclose(np.asarray(params[0]), w_true, atol=1e-3)
