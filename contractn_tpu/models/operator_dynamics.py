"""Heisenberg-picture operator dynamics: operator spreading, OTOCs,
operator entanglement.

A local operator evolved in the Heisenberg picture, ``O(t) = U+ O U``
(or its open-system generalization under the adjoint master equation
``dO/dt = +i[H, O] + sum_k L_k+ O L_k - (1/2){L_k+ L_k, O}``), is a
vectorized matrix-product operator — exactly the same object as the
vectorized density matrix in :mod:`~contractn_tpu.models.lindblad`, so
the whole open-system stack is reused verbatim: the generator is
:func:`~contractn_tpu.models.lindblad.liouvillian_automaton` with
``adjoint=True`` (the Hilbert-Schmidt adjoint — conjugate transpose of
the dense superoperator), and propagation is the W^II compilation of
that automaton (two MPO applications per step, globally second order).

Out-of-time-order correlators at infinite temperature reduce to
one-site superoperator sandwiches on the vectorized operator:

    ``Tr(A+ X A Y) = <vec(A) | X (x) Y^T | vec(A)>``

in the site-fused ``(s, a)`` vectorization used throughout (row-major
``vec(A)[s, a] = A[s, a]``), so the squared commutator
``C(t) = (1/2) Tr([W(t), V]+ [W(t), V]) / Tr(I)`` needs one ratio of
two such sandwiches — no doubled network, no 4-layer contraction.
Operator entanglement (the entanglement of ``vec(O(t))``) falls out of
:func:`~contractn_tpu.models.canonical.entanglement_entropy` unchanged.

Validated against dense oracles (tests/test_operator_dynamics.py):
Heisenberg trajectories match ``expm`` conjugation entrywise, the
forward/adjoint duality ``Tr(O(t) rho) == Tr(O rho(t))`` holds with
dissipation, OTOC curves match dense values along the whole time grid
and show the light cone (distant commutators stay near zero until the
front arrives), and operator entropy matches the dense operator
Schmidt spectrum.  The reference has no operator dynamics of any kind
(SURVEY.md section 2: contractn/ is a contraction engine only).
"""

import jax.numpy as jnp
import numpy as np

from .boundary import apply_mpo_to_mps
from .canonical import entanglement_entropy
from .lindblad import _trim, _wii_props, liouvillian_automaton
from .mps import MPS


def vectorized_operator(n, site_ops, d=2):
    """A product of one-site operators (identity elsewhere) as a
    bond-1 vectorized MPS: ``site_ops`` is ``[(site, matrix), ...]``.
    """
    eye = np.eye(d).reshape(-1)
    cores = np.tile(eye[None, :, None, None], (n, 1, 1, 1)).astype(complex)
    for site, op in site_ops:
        cores[site, :, 0, 0] = np.asarray(op, complex).reshape(-1)
    one = jnp.ones((1,), jnp.complex128)
    return MPS(jnp.asarray(cores), one, one)


def heisenberg_evolve_wii(op0, h_mpo, t, n_steps, jumps=(),
                          bond_jumps=(), max_bond=32, order=2):
    """Evolve a vectorized operator by the adjoint propagator
    ``exp(L+ t)`` — closed-system Heisenberg evolution ``U+ O U`` when
    ``jumps`` is empty, the adjoint master equation otherwise.

    Args:
        op0: vectorized operator MPS (:func:`vectorized_operator` or
            any ``d^2``-site MPS in the fused convention).
        h_mpo: Hamiltonian MPO in triangular automaton form.
        t, n_steps: total time and step count (W^II error is globally
            ``O(dt^2)`` at ``order=2``).
        jumps, bond_jumps: jump operators as in
            :func:`~contractn_tpu.models.lindblad.liouvillian_mpo`.
        max_bond: SVD compression bond for the operator MPS.

    Returns the evolved vectorized operator MPS (physical scale kept;
    unitary conjugation preserves the Frobenius norm, so any norm loss
    measures the truncation error).
    """
    la = liouvillian_automaton(h_mpo, jumps=jumps, bond_jumps=bond_jumps,
                               adjoint=True)
    op = op0
    for u2 in _wii_props(la, t / n_steps, order) * n_steps:
        op = _trim(apply_mpo_to_mps(u2, op), max_bond)
    return op


def superop_sandwich(vec_a, site_ops, d=2):
    """``Tr(A+ (prod_i X_i) A (prod_i Y_i)) / Tr(A+ A)`` for one-site
    factors: ``site_ops`` is ``[(site, X, Y), ...]`` on distinct sites,
    inserted as the superoperator ``X (x) Y^T`` on the fused index.

    The ratio is self-normalizing under truncation (both numerator and
    denominator use the same compressed ``vec(A)``).
    """
    cores = np.asarray(vec_a.cores).copy()
    for site, x_op, y_op in site_ops:
        m = np.kron(np.asarray(x_op, complex),
                    np.asarray(y_op, complex).T)
        cores[site] = np.einsum("mq,qDE->mDE", m, cores[site])
    ket = MPS(jnp.asarray(cores), vec_a.left, vec_a.right)
    num, log_n = vec_a.inner(ket)
    den, log_d = vec_a.norm_squared()
    return complex(num / den * jnp.exp(log_n - log_d))


def otoc(w_vec, v_op, site, d=2):
    """Infinite-temperature OTOC ``F(t) = Tr(W(t)+ V+ W(t) V) /
    Tr(W(t)+ W(t))`` and the squared commutator
    ``C(t) = Re(1 - F)`` (for unitary Hermitian ``V``, where
    ``C = Tr([W,V]+[W,V]) / (2 Tr(W+W))``).

    Args:
        w_vec: the evolved vectorized operator ``vec(W(t))``.
        v_op: the probe one-site operator ``V``.
        site: the probe site.

    Returns ``(F, C)``.
    """
    v_mat = np.asarray(v_op, complex)
    f_val = superop_sandwich(
        w_vec, [(site, v_mat.conj().T, v_mat)], d=d)
    return f_val, float(np.real(1.0 - f_val))


def operator_entropy(vec_a, alpha=1):
    """Operator entanglement entropy across every internal bond — the
    bipartite entanglement of the vectorized operator, the standard
    diagnostic of operator spreading and simulability."""
    return entanglement_entropy(vec_a, alpha=alpha)
