"""Native-autograd interop: torch / TF gradients through ``contract()``.

Closes the one documented parity departure (reference
``contractn/einsum.py:24-87`` runs natively in each library, so gradients
flow in that library): torch operands with ``requires_grad`` and TF
operands under a ``GradientTape`` now backprop through the XLA engine via
``compiler/interop.py``.  Gradients are pinned against closed forms and
against the JAX-side ``jax.grad`` of the identical program.
"""

import numpy as np
import pytest

from contractn_tpu import TN, contract

torch = pytest.importorskip("torch")


def _np(t):
    return t.detach().cpu().numpy()


def test_torch_grad_trace_closed_form():
    """d tr(AB) / dA = B^T, d/dB = A^T — flows into the torch graph."""
    rng = np.random.default_rng(0)
    a = torch.tensor(rng.normal(size=(4, 5)), requires_grad=True)
    b = torch.tensor(rng.normal(size=(5, 4)), requires_grad=True)
    y = contract("ab,ba->", a, b, backend="torch")
    assert isinstance(y, torch.Tensor) and y.requires_grad
    y.backward()
    np.testing.assert_allclose(_np(a.grad), _np(b).T, atol=1e-12)
    np.testing.assert_allclose(_np(b.grad), _np(a).T, atol=1e-12)


def test_torch_grad_split_format_reconstructs_dense_grad():
    """Backprop through (mantissa, log_scale) == backprop through the
    dense value: the split pair is a redundant representation, and the
    product rule through ``m * exp(c)`` must reassemble exactly."""
    rng = np.random.default_rng(1)
    mats = [
        torch.tensor(rng.normal(size=(3, 3)) * 3.0, requires_grad=True)
        for _ in range(6)
    ]
    w = torch.tensor(rng.normal(size=(3, 3)))

    einstr = "ab,bc,cd,de,ef,fa->"
    m, c = contract(einstr, *mats, backend="torch", split_format=True)
    loss = (m * torch.exp(c)).sum()
    loss.backward()
    grads_split = [_np(t.grad) for t in mats]

    mats2 = [
        torch.tensor(_np(t), requires_grad=True) for t in mats
    ]
    y = contract(einstr, *mats2, backend="torch")
    y.sum().backward()
    for gs, t2 in zip(grads_split, mats2):
        np.testing.assert_allclose(gs, _np(t2.grad), rtol=1e-10, atol=1e-12)
    del w


def test_torch_grad_mixed_operands_and_chain_fast_path():
    """Long homogeneous chains reroute to the log-depth tree program —
    gradients must flow through that fast path too; numpy operands in the
    same call simply get no grad."""
    rng = np.random.default_rng(2)
    n = 24  # above _CHAIN_THRESHOLD: exercises the chain program
    mats = [rng.normal(size=(3, 3)) / 1.5 for _ in range(n)]
    t0 = torch.tensor(mats[0], requires_grad=True)
    rest = [torch.tensor(m) for m in mats[1:]]
    einstr = ",".join(
        "{}{}".format(chr(97 + i), chr(97 + i + 1)) for i in range(n)
    ) + "->a" + chr(97 + n)
    y = contract(einstr, t0, *rest, backend="torch")
    y.sum().backward()
    # closed form: d sum(A1 R) / dA1 = ones @ R^T with R = prod(rest)
    r = np.linalg.multi_dot(mats[1:])
    expect = np.ones((3, 3)) @ r.T
    np.testing.assert_allclose(_np(t0.grad), expect, rtol=1e-10)
    assert rest[0].grad is None


def test_torch_no_grad_mode_keeps_plain_path():
    a = torch.tensor(np.eye(3), requires_grad=True)
    with torch.no_grad():
        y = contract("ab,ba->", a, a, backend="torch")
    assert not y.requires_grad
    np.testing.assert_allclose(_np(y), 3.0)


def test_torch_grad_through_tn_weight_sharing():
    """TN-level: clone (weight-shared) nodes accumulate both slots'
    gradients into the one torch parameter — the semantics the reference
    intended but never shipped (defect D1)."""
    rng = np.random.default_rng(3)
    a = torch.tensor(rng.normal(size=(3, 3)), requires_grad=True)
    tn = TN()
    n1 = tn.add_dense_node(a)
    n2 = tn.add_duplicate_node(n1)
    tn.connect_nodes(n1, n2, 1, 0)
    y = tn.contract(backend="torch")  # A @ A, open (a, c)
    y.sum().backward()
    an = _np(a)
    ones = np.ones((3, 3))
    expect = ones @ an.T + an.T @ ones  # both appearances accumulate
    np.testing.assert_allclose(_np(a.grad), expect, rtol=1e-10, atol=1e-12)


def test_tf_gradient_tape():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(4)
    a_np = rng.normal(size=(4, 5))
    b_np = rng.normal(size=(5, 4))
    a = tf.Variable(a_np)
    b = tf.Variable(b_np)
    with tf.GradientTape() as tape:
        y = contract("ab,ba->", a, b, backend="tensorflow")
    ga, gb = tape.gradient(y, [a, b])
    np.testing.assert_allclose(np.asarray(ga), b_np.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), a_np.T, atol=1e-12)


def test_tf_split_format_tape():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(5)
    mats_np = [rng.normal(size=(3, 3)) * 2.0 for _ in range(4)]
    einstr = "ab,bc,cd,da->"
    xs = [tf.Variable(m) for m in mats_np]
    with tf.GradientTape() as tape:
        m, c = contract(einstr, *xs, backend="tensorflow", split_format=True)
        loss = m * tf.exp(c)
    grads = tape.gradient(loss, xs)

    xs2 = [tf.Variable(m) for m in mats_np]
    with tf.GradientTape() as tape2:
        y = contract(einstr, *xs2, backend="tensorflow")
    grads2 = tape2.gradient(y, xs2)
    for g1, g2 in zip(grads, grads2):
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-10, atol=1e-12
        )
