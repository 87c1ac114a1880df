"""Quantum-trajectory (MCWF) unraveling of Lindblad dynamics on MPS.

The Monte-Carlo wave-function method evolves PURE states under the
non-Hermitian effective Hamiltonian

    ``H_eff = H - (i/2) sum_k L_k^dag L_k``

and interrupts the decay with stochastic jumps ``|psi> -> L_k|psi>``;
the trajectory average of ``|psi><psi|`` solves the Lindblad equation.
Where the vectorized-density route (:mod:`~contractn_tpu.models.
lindblad`) squares the local dimension (``d^2`` sites) and the bond
dimension needed for OPERATOR entanglement, a trajectory keeps the
state a plain ``d``-site MPS at state-entanglement bond dimension —
the standard trade of memory for sampling.

Discrete-step scheme (second order in ``dt`` per step):

1. one Trotter step of ``exp(-i dt H_eff)``: Strang-split one-site
   decay half-layers ``exp(-dt K_j / 4)`` (``K_j = sum_k L^dag L`` on
   site ``j``) around the second-order TEBD bond layers — all through
   :class:`~contractn_tpu.models.circuits.CircuitState`, whose gates
   need not be unitary;
2. the squared norm of the evolved state IS the survival probability
   ``q``; with probability ``1 - q`` a jump fires, the channel drawn
   proportionally to ``<psi| L_k^dag L_k |psi>``;
3. renormalize, record observables, repeat.

Validation (tests/test_trajectories.py): with no jump channels the
trajectory IS deterministic TEBD (parity to machine precision); a
single trajectory against a dense-state oracle applying the SAME
Trotter gates and consuming the SAME uniform draws (machine-precision
path parity, jumps included); and the trajectory average against a
dense Lindblad RK4 integration at ``O(1/sqrt(n_traj))``.

No open-system capability of any kind exists in the reference
(SURVEY.md §2); this mirrors the trajectory samplers of
QuTiP/ITensor-style stacks on the framework's own MPS machinery.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stabilize import peinsum
from .circuits import CircuitState
from .itebd import two_site_gate

__all__ = [
    "mcwf_trajectory",
    "mcwf_ensemble",
]


def _site_decay_gates(jumps, n_sites, d, dt):
    """Half-layer one-site gates ``exp(-dt K_j / 4)`` (None = identity
    site) plus the per-site decay generators ``K_j``."""
    ks = [np.zeros((d, d), complex) for _ in range(n_sites)]
    for op, site in jumps:
        op = np.asarray(op)
        ks[site] = ks[site] + np.matmul(op.conj().T, op)
    gates = []
    for k in ks:
        if np.abs(k).max() == 0.0:
            gates.append(None)
            continue
        w, u = np.linalg.eigh(k)
        gates.append(np.matmul(u * np.exp(-0.25 * dt * w), u.conj().T))
    return gates, ks


def _ragged_norm_sq(sites):
    """``<psi|psi>`` of a ragged site list (left-to-right transfer)."""
    rho = jnp.eye(sites[0].shape[1], dtype=sites[0].dtype)
    for a in sites:
        x = peinsum("ij,bjk->bik", rho, a)
        rho = peinsum("bji,bjk->ik", jnp.conj(a), x)
    return float(jnp.real(jnp.trace(rho)))


def _renormalize(state):
    """Scale the state to unit norm, folding in the accumulated
    ``log_norm``; returns the pre-scaling squared norm."""
    raw = _ragged_norm_sq(state.sites)
    q = raw * float(np.exp(2.0 * state.log_norm))
    state.sites[0] = state.sites[0] * (
        float(np.exp(state.log_norm)) / np.sqrt(max(q, 1e-300))
    )
    state.log_norm = 0.0
    return q


def mcwf_trajectory(mps0, h2, jumps, t, n_steps, max_bond=16, key=None,
                    uniforms=None, op=None, measure_every=1):
    """One MCWF trajectory.  Returns ``(mps, record, jump_log)``.

    Args:
        mps0: initial (normalized) :class:`MPS`.
        h2: dense bond term ``(d^2, d^2)`` of the chain Hamiltonian.
        jumps: jump channels ``[(op (d, d), site), ...]`` with any rate
            folded into the operator (``sqrt(gamma) sigma``).
        t, n_steps: total time and Trotter steps.
        key: PRNG key (ignored if ``uniforms`` given).
        uniforms: optional ``(n_steps, 2)`` uniform draws — an explicit
            randomness seam so oracles can replay the exact decision
            sequence (first: jump?, second: which channel).
        op: optional one-site observable recorded per site after every
            ``measure_every``-th step (plus ``t = 0``); ``record`` is
            ``(n_records, n_sites)`` (or None).  Measurement costs a
            canonical rebuild — thin it out for long ensembles.

    The jump decision uses the DISCRETE-step rule: survival probability
    = the squared norm after one non-Hermitian Trotter step, exact to
    the same order as the splitting itself.

    TRUNCATION HAZARD: with a binding ``max_bond`` the SVD truncation
    loss also lands in the norm, where it is indistinguishable from
    physical decay — it inflates the jump probability ``1 - q``.  Keep
    ``max_bond`` generous enough that truncation error is far below
    ``dt * <L^+ L>`` (check convergence in ``max_bond``), exactly as
    :meth:`CircuitState.apply_gate2` warns for fidelity.
    """
    n_sites = mps0.n_sites
    d = mps0.phys_dim
    dt = t / n_steps
    if uniforms is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        uniforms = np.asarray(jax.random.uniform(key, (n_steps, 2)))
    uniforms = np.asarray(uniforms, float)

    g_half = two_site_gate(h2, 1j * dt / 2.0)
    g_full = two_site_gate(h2, 1j * dt)
    decay, ks = _site_decay_gates(jumps, n_sites, d, dt)
    state = CircuitState(mps0, max_bond=max_bond)
    state.sites = [
        s.astype(jnp.result_type(s.dtype, jnp.complex64))
        for s in state.sites
    ]

    def measure(record):
        if op is None:
            return
        mps = state.finalize()
        record.append(np.asarray(mps.site_expectations(op)))

    def channel_weights():
        mps = state.finalize()
        w = np.zeros(len(jumps))
        for i, (jop, site) in enumerate(jumps):
            jop = np.asarray(jop)
            w[i] = float(np.real(
                np.asarray(
                    mps.site_expectations(np.matmul(jop.conj().T, jop))
                )[site]
            ))
        return w

    record = []
    jump_log = []
    measure(record)
    for step in range(int(n_steps)):
        for j, gate in enumerate(decay):
            if gate is not None:
                state.apply_gate(gate, j)
        state.apply_layer(g_half, start=0)
        state.apply_layer(g_full, start=1)
        state.apply_layer(g_half, start=0)
        for j, gate in enumerate(decay):
            if gate is not None:
                state.apply_gate(gate, j)
        q = _renormalize(state)
        if jumps and uniforms[step, 0] > q:
            w = channel_weights()
            total = w.sum()
            if total > 0.0:
                pick = int(np.searchsorted(
                    np.cumsum(w / total), uniforms[step, 1]
                ))
                pick = min(pick, len(jumps) - 1)
                jop, site = jumps[pick]
                state.apply_gate(np.asarray(jop), site)
                _renormalize(state)
                jump_log.append((step, pick))
        if (step + 1) % measure_every == 0:
            measure(record)
    out = state.finalize()
    return out, (np.asarray(record) if op is not None else None), jump_log


def mcwf_ensemble(mps0, h2, jumps, t, n_steps, op, n_traj, max_bond=16,
                  key=None, measure_every=1):
    """Trajectory-averaged observable record.

    Returns ``(mean, n_jumps_total)`` with ``mean (n_records,
    n_sites)`` — the MCWF estimate of ``tr(rho(t_i) op_j)``, converging
    to the Lindblad solution at ``O(1/sqrt(n_traj))``.  Trajectories
    are independent (each gets a fresh fold of ``key``); this host loop
    is embarrassingly parallel — shard trajectory blocks over devices
    for production runs.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_traj)
    acc = None
    n_jumps = 0
    for k in keys:
        _, rec, jl = mcwf_trajectory(
            mps0, h2, jumps, t, n_steps, max_bond=max_bond, key=k, op=op,
            measure_every=measure_every,
        )
        acc = rec if acc is None else acc + rec
        n_jumps += len(jl)
    return acc / n_traj, n_jumps
