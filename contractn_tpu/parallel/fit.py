"""Gradient training of ARBITRARY tensor networks.

The reference's "template tensors" (paper §1) were aimed at trainable
weight-shared TNs but shipped without working contraction, let alone
gradients.  Here any TN — any topology, with copy tensors, clones, and
input nodes — compiles to a pure JAX program (``TN.make_contract_fun``),
so its dense-node parameters train under ``jax.grad`` with any optax
optimizer: clones receive the SUM of their slots' cotangents (correct
weight-sharing gradients), input nodes carry the data batch, and the
split-format log register keeps losses finite for arbitrarily deep
networks.

``fit_tn`` runs the loop and writes the trained parameters back into the
TN's nodes at the end, so the graph object stays the source of truth.
"""

import jax
import jax.numpy as jnp


def make_tn_train_step(tn, optimizer, loss_fn, optimize="auto", **kwargs):
    """Jitted optax training step over a TN's parameter tuple.

    Args:
        tn: the network; its dense-node tensors are the trainables.
        optimizer: an ``optax.GradientTransformation``.
        loss_fn: ``loss_fn(output, *batch) -> scalar`` applied to the
            SPLIT-FORMAT contraction output ``(mantissa, log_scale)``
            plus whatever batch arrays the caller passes to the step.
        optimize / kwargs: forwarded to ``make_contract_fun``.

    Returns:
        ``(step, init)``: ``step(params, opt_state, inputs, *batch)``
        -> ``(params, opt_state, loss)``; ``init(params)`` builds the
        optimizer state.  ``inputs`` is the tuple for the TN's input
        nodes (``()`` if none).
    """
    import optax

    cfun = tn.make_contract_fun(split_format=True, optimize=optimize,
                                **kwargs)

    def objective(params, inputs, *batch):
        out = cfun(params, inputs)
        return loss_fn(out, *batch)

    @jax.jit
    def step(params, opt_state, inputs, *batch):
        value, grads = jax.value_and_grad(objective)(params, inputs,
                                                     *batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    return step, optimizer.init


def fit_tn(tn, optimizer, loss_fn, steps, inputs=(), batch=(),
           optimize="auto", **kwargs):
    """Train a TN's parameters in place; returns the loss trace.

    The trained tensors are written back into the TN's dense nodes when
    the loop finishes (node identity and topology are untouched).
    """
    step, init = make_tn_train_step(tn, optimizer, loss_fn,
                                    optimize=optimize, **kwargs)
    params = tuple(jnp.asarray(p) for p in tn.params)
    opt_state = init(params)
    trace = []
    for _ in range(int(steps)):
        params, opt_state, loss = step(params, opt_state, tuple(inputs),
                                       *batch)
        trace.append(float(loss))
    dense_nodes = [n for n in tn.nodes(as_iter=True)
                   if n.node_type == "dense"]
    for node, p in zip(dense_nodes, params):
        node.tensor = p
    return trace
