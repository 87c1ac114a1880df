"""Infinite-chain thermal states: purification iTEBD at finite T.

Finite-temperature equilibrium in the thermodynamic limit: the Gibbs
state ``rho = exp(-beta H) / Z`` of an infinite chain is represented by
its purification ``|psi_beta> = exp(-beta H / 2) (x) 1 |I>`` where
``|I>`` is the site-wise maximally entangled physical-ancilla pair
(infinite temperature, bond dimension 1).  Imaginary-time iTEBD evolves
``|I>`` by ``beta / 2`` with second-order Trotter gates acting on the
PHYSICAL legs only; thermal expectation values are then pure-state
expectations on the purification, and the per-gate norm growth
accumulates ``ln Z`` per site exactly — the framework's split-format
log register applied to a thermal trace (the mechanism the reference's
1000-link chain demo uses for products, ``contractn/einsum.py:89-114``,
here run over an infinite imaginary-time network).

The folded site has local dimension ``d^2`` (physical (x) ancilla) and
rides the :mod:`contractn_tpu.models.itebd` Vidal machinery: each
stage is ONE jitted ``lax.fori_loop`` with static ``(d^2, D)`` shapes.
The complement of :func:`contractn_tpu.models.circuits.thermal_state`
(finite open chains, dense-oracle-validated): this module is the
thermodynamic limit, validated against the exact transverse-field
Ising thermal integrals (free energy AND internal energy from the
fermionic spectrum ``eps_k``).

Accounting for ``ln Z``: each bond update with pre-gate two-site norm
``n0`` and post-gate norm ``n1`` multiplies ``<psi|psi>`` by
``(n1/n0)^2`` per gate, and a sweep applies one gate per two sites per
sublattice, so ``ln Z / N = ln d + sum ln(n1/n0)`` over the unit-cell
updates (the ``ln d`` is the normalization of ``|I>``; checked at
``beta = 0``: ``ln Z = ln d``, free spins).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision
from .itebd import two_site_gate, unit_cell_core
from .umps import expect_local

_LAM_TOL = 1e-9


def _fold_gate(g2, d):
    """Lift a two-site physical gate ``(d^2, d^2)`` to the purified
    site pair ``(d^4, d^4)``: identity on both ancillas."""
    g = np.asarray(g2).reshape(d, d, d, d)  # (s1 s2, s1' s2')
    eye = np.eye(d)
    # out[(s1 a1)(s2 a2), (s1' a1')(s2' a2')] — each ancilla's in/out
    # legs carry the identity.
    out = np.einsum("stuv,ac,bd->satbucvd", g, eye, eye)
    return jnp.asarray(out.reshape(d * d * d * d, d * d * d * d))


def _fold_op(op, d):
    """Lift a one-site physical operator to the purified site."""
    op = np.asarray(op)
    out = np.einsum("su,ab->saub", op, np.eye(d))
    return jnp.asarray(out.reshape(d * d, d * d))


def _bond_update_norm(ga, gb, la, lb, gate, prec):
    """Vidal bond update that also returns ``log(n1 / n0)`` — the gate's
    contribution to ``ln <psi|psi>`` per gate (squared amplitudes give
    the factor 2; the per-site accounting is in the module docstring).
    """
    d, bond, _ = ga.shape
    cut = _LAM_TOL * jnp.max(lb)
    linv = jnp.where(lb > cut, 1.0 / jnp.maximum(lb, 1e-300), 0.0)
    left = ga * lb[None, :, None] * la[None, None, :]
    theta0 = jnp.einsum("sij,tjk->stik", left, gb * lb[None, None, :],
                        precision=prec)
    n0 = jnp.sqrt(jnp.sum(theta0 * theta0))
    theta = jnp.einsum(
        "uvst,stik->uvik", gate.reshape(d, d, d, d), theta0, precision=prec
    )
    mat = theta.transpose(0, 2, 1, 3).reshape(d * bond, d * bond)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    n1 = jnp.linalg.norm(s)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    ga_new = u.reshape(d, bond, bond) * linv[None, :, None]
    gb_new = vh.reshape(bond, d, bond).swapaxes(0, 1) * linv[None, None, :]
    log_n = jnp.log(jnp.maximum(n1, 1e-300)) - jnp.log(
        jnp.maximum(n0, 1e-300))
    return ga_new, gb_new, s, log_n


@partial(jax.jit, static_argnums=(6,))
def _stage_symmetric(ga, gb, la, lb, gate_half, gate_full, n_iter):
    """``n_iter`` second-order Trotter steps: AB(dt/2) BA(dt) AB(dt/2).

    Carries the accumulated per-site ``ln Z`` contribution.
    """
    prec = dot_precision(ga.dtype)

    def body(_, carry):
        ga, gb, la, lb, acc = carry
        ga, gb, la, n1 = _bond_update_norm(ga, gb, la, lb, gate_half, prec)
        gb, ga, lb, n2 = _bond_update_norm(gb, ga, lb, la, gate_full, prec)
        ga, gb, la, n3 = _bond_update_norm(ga, gb, la, lb, gate_half, prec)
        return ga, gb, la, lb, acc + n1 + n2 + n3

    return jax.lax.fori_loop(
        0, n_iter, body, (ga, gb, la, lb, jnp.zeros((), ga.dtype)))


def thermal_cell_core(state, order="ab"):
    """Blocked folded unit-cell core (phys dim ``d^4``) of the
    purification, for the :mod:`~contractn_tpu.models.umps` tooling
    (thermal correlators, correlation lengths, structure factors).

    MEASURE THROUGH THIS, not through the raw Vidal tensors: non-unitary
    gates leave an ``O(dbeta)`` residual non-canonicality in the Vidal
    form (Orus-Vidal), so ``lambda^2``-environment expectations carry a
    FIRST-order Trotter bias, while the blocked core's true transfer
    fixed points restore the state's second-order accuracy (measured:
    energy error 6e-5 -> 1e-5 at dbeta 0.04 -> 0.01 under the canonical
    assumption, quartering instead under the fixed-point measurement).
    ``order="ba"`` blocks the cell starting at sublattice B (for the
    B-A bond observables)."""
    if order == "ab":
        sub = {k: state[k] for k in
               ("gamma_a", "gamma_b", "lambda_a", "lambda_b")}
    else:
        sub = {"gamma_a": state["gamma_b"], "gamma_b": state["gamma_a"],
               "lambda_a": state["lambda_b"], "lambda_b": state["lambda_a"]}
    return unit_cell_core(sub)


def _identity_start(d, bond_dim, dtype):
    """Folded |I> product start: one maximally entangled pair per site."""
    d2 = d * d
    v = np.zeros(d2)
    v[np.arange(d) * d + np.arange(d)] = 1.0 / np.sqrt(d)
    ga = jnp.zeros((d2, bond_dim, bond_dim), dtype).at[:, 0, 0].set(
        jnp.asarray(v, dtype))
    la = jnp.zeros((bond_dim,), dtype).at[0].set(1.0)
    return ga, ga, la, la


def thermal_itebd(h2, beta, bond_dim, d=2, dbeta=0.005,
                  dtype=jnp.float64):
    """Thermal state of the INFINITE chain ``H = sum_i h2_{i,i+1}``.

    Args:
        h2: Hermitian two-site term, dense ``(d^2, d^2)``
            (e.g. :func:`~contractn_tpu.models.itebd.tfim_h2`).
        beta: target inverse temperature.
        bond_dim: purification bond dimension (thermal states are
            short-ranged; modest ``D`` suffices away from T=0).
        dbeta: imaginary-time Trotter step in units of beta (the
            purification evolves to ``beta / 2``; second-order error
            is ``O(dbeta^2 beta)``).

    Returns:
        A state dict with the folded Vidal tensors (local dim ``d^2``),
        ``log_z`` (``ln Z`` per site — free energy ``f = -log_z/beta``)
        and ``beta``.  ``log_z`` from the norm accumulation carries an
        ``O(dbeta)`` bias with a small coefficient (the Vidal form's
        residual non-canonicality under non-unitary gates; measured
        ~0.12 * dbeta at beta = 2 on the critical TFIM) — use
        :func:`thermal_log_z_ti` when second-order ``ln Z`` is needed.
    """
    h2 = np.asarray(h2)
    n_steps = max(1, int(round(beta / 2.0 / dbeta)))
    dt = beta / 2.0 / n_steps
    gate_half = _fold_gate(two_site_gate(jnp.asarray(h2, dtype), dt / 2.0),
                           d).astype(dtype)
    gate_full = _fold_gate(two_site_gate(jnp.asarray(h2, dtype), dt),
                           d).astype(dtype)
    ga, gb, la, lb = _identity_start(d, bond_dim, dtype)
    ga, gb, la, lb, acc = _stage_symmetric(
        ga, gb, la, lb, gate_half, gate_full, n_steps)
    return {
        "gamma_a": ga, "gamma_b": gb, "lambda_a": la, "lambda_b": lb,
        "log_z": float(acc) + float(np.log(d)),
        "beta": float(beta), "d": d,
    }


def thermal_log_z_ti(h2, beta, bond_dim, d=2, dbeta=0.005,
                     intervals=16, iters=400, dtype=jnp.float64):
    """Second-order ``ln Z`` per site by thermodynamic integration.

    ``ln z(beta) = ln d - int_0^beta e(b) db`` with the energy measured
    at uniform checkpoints through the fixed-point environments (each
    ``O(dbeta^2)`` accurate, unlike the norm-accumulated ``log_z``) and
    Simpson-integrated (``intervals`` must be even; the infinite-T
    endpoint is exact: ``e(0) = tr h2 / d^2``).

    Returns ``(log_z, state)`` with ``state`` the ``beta`` state dict.
    """
    if intervals % 2:
        raise ValueError("Simpson integration needs an even interval "
                         f"count, got {intervals}")
    h2 = np.asarray(h2)
    chunk = beta / intervals
    n_steps = max(1, int(round(chunk / 2.0 / dbeta)))
    dt = chunk / 2.0 / n_steps
    gate_half = _fold_gate(two_site_gate(jnp.asarray(h2, dtype), dt / 2.0),
                           d).astype(dtype)
    gate_full = _fold_gate(two_site_gate(jnp.asarray(h2, dtype), dt),
                           d).astype(dtype)
    ga, gb, la, lb = _identity_start(d, bond_dim, dtype)
    acc = 0.0
    energies = [float(np.trace(h2)) / (d * d)]
    for _ in range(intervals):
        ga, gb, la, lb, da = _stage_symmetric(
            ga, gb, la, lb, gate_half, gate_full, n_steps)
        acc += float(da)
        state = {"gamma_a": ga, "gamma_b": gb,
                 "lambda_a": la, "lambda_b": lb, "d": d}
        energies.append(thermal_energy_density(state, h2, iters=iters))
    e = np.asarray(energies)
    simpson = chunk / 3.0 * (
        e[0] + e[-1] + 4.0 * e[1:-1:2].sum() + 2.0 * e[2:-1:2].sum())
    state["log_z"] = acc + float(np.log(d))
    state["beta"] = float(beta)
    return float(np.log(d)) - float(simpson), state


def thermal_energy_density(state, h2, iters=400):
    """Energy per site ``<h2>`` at temperature ``1/beta`` (bond terms,
    one bond per site; averaged over the two unit-cell bonds, each
    measured with true transfer-fixed-point environments — see
    :func:`thermal_cell_core` for why)."""
    d = state["d"]
    op4 = np.asarray(_fold_gate(np.asarray(h2), d))
    e_ab = expect_local(thermal_cell_core(state, "ab"), op4, iters=iters)
    e_ba = expect_local(thermal_cell_core(state, "ba"), op4, iters=iters)
    return 0.5 * (float(e_ab) + float(e_ba))


def thermal_site_expectation(state, op, iters=400):
    """One-site thermal expectation ``Tr(rho op)`` (averaged over the
    unit cell, fixed-point environments)."""
    d = state["d"]
    opf = np.asarray(_fold_op(op, d))
    eye2 = np.eye(d * d)
    core = thermal_cell_core(state, "ab")
    vals = [float(expect_local(core, np.kron(opf, eye2), iters=iters)),
            float(expect_local(core, np.kron(eye2, opf), iters=iters))]
    return 0.5 * sum(vals)


def thermal_free_energy(state):
    """Free energy per site ``f = -T ln Z`` from the accumulated
    per-site log partition function."""
    return -state["log_z"] / state["beta"]


# ---------------------------------------------------------------------- #
# Long-range Hamiltonians: purification by imaginary-time W^II
# ---------------------------------------------------------------------- #


def fold_umpo(core):
    """Lift a triangular bulk MPO core to the purified ``d^2`` site.

    Every automaton entry acts on the physical leg only; the ancilla
    carries the identity (``out[(s a), (t b)] = w[s, t] delta_ab`` in
    the same ``(s a)`` fusing as :func:`_fold_op`).  Triangularity and
    the identity corners survive the lift, so the result is again a
    valid W^II input."""
    w = np.asarray(core)
    d, wdim = w.shape[0], w.shape[2]
    out = np.einsum("stij,ab->satbij", w, np.eye(d))
    return out.reshape(d * d, d * d, wdim, w.shape[3])


def fold_umpo_anc(core):
    """Lift a triangular bulk MPO core to act on the ANCILLA leg as
    ``H^T``.

    In the vectorization convention of :func:`_fold_op` (physical
    index first, ``|X> = vec(X)`` row-major) right multiplication is
    ``X B <-> (I (x) B^T) |X>``, so every automaton entry transposes
    its physical legs and moves to the ancilla factor:
    ``out[(s a), (t b)] = delta_st w[b, a]``.  Site-local — the
    transpose of a chain MPO is the chain of per-site transposes with
    UNCHANGED automaton indices.  Triangularity and identity corners
    survive (``delta_st delta_ab`` at both corners)."""
    w = np.asarray(core)
    d = w.shape[0]
    out = np.einsum("baij,st->satbij", w, np.eye(d))
    return out.reshape(d * d, d * d, w.shape[2], w.shape[3])


def balanced_umpo(core):
    """The balanced purification generator ``L = H (x) I - I (x) H^T``
    as ONE triangular bulk core on the folded ``d^2`` site.

    ``e^{-i L t} |X> = |e^{-iHt} X e^{+iHt}>``: the ancilla is dragged
    backwards in time (Karrasch/Bardarson/Moore, PRL 108, 227206), so
    any purification of a thermal state is an EXACT zero mode
    (``[H, rho^{1/2}] = 0`` gives ``L |rho^{1/2}> = 0``) — the folded
    thermal background is stationary under the balanced evolution,
    which is exactly the property the finite-temperature infinite-
    boundary-condition windows (:func:`~contractn_tpu.models.ibc.
    ibc_thermal_correlator`) rely on.  Bond ``W' = 2 W - 2``
    (:func:`~contractn_tpu.models.mpo.umpo_sum` shares the identity
    corners)."""
    from .mpo import umpo_scale, umpo_sum

    return umpo_sum(fold_umpo(core),
                    umpo_scale(fold_umpo_anc(core), -1.0))


def thermal_wii(h_core, beta, bond_dim, dbeta=0.02, order=2,
                callback=None):
    """Thermal state of an infinite chain with an ARBITRARY bulk-MPO
    Hamiltonian — exponential/power-law couplings included.

    The gate route (:func:`thermal_itebd`) stops at nearest-neighbor
    terms; here the purification ``exp(-beta H / 2) |I>`` is built by
    imaginary-time uniform W^II application
    (:func:`~contractn_tpu.models.mpo_evolution.umps_mpo_evolve` on the
    :func:`fold_umpo`-lifted core), which handles any triangular bulk
    core — :meth:`~contractn_tpu.models.autompo.InfiniteOpSum.to_umpo`
    output, ``tfim_mpo(2).cores[0]``, Prony-fitted ``1/r^alpha``
    channels...  ``order=2`` keeps the global ``O(dbeta^2)`` accuracy
    for long-range terms (see :mod:`.mpo_evolution`).

    Returns the folded ``(d^2, D, D)`` uniform purification core.
    Measure with :func:`thermal_wii_expectation` /
    :func:`thermal_wii_correlate` — fixed-point environments, never a
    canonical-gauge assumption (the same Orus-Vidal reasoning as
    :func:`thermal_cell_core`).  ``callback(k, core)`` runs after each
    of the ``ceil(beta / 2 / dbeta)`` steps (e.g. to record the
    energy trajectory for thermodynamic integration of ``ln Z``).
    """
    from .mpo_evolution import umps_mpo_evolve

    w = np.asarray(h_core)
    d = w.shape[0]
    lifted = fold_umpo(w)
    v = np.zeros(d * d)
    v[np.arange(d) * d + np.arange(d)] = 1.0 / np.sqrt(d)
    core0 = jnp.asarray(v[:, None, None])
    n_steps = max(1, int(round(beta / 2.0 / dbeta)))
    return umps_mpo_evolve(core0, lifted, beta / 2.0, n_steps,
                           bond_dim, imag=True, order=order,
                           callback=callback)


def thermal_wii_expectation(core, op, iters=300):
    """One-site ``Tr(rho op)`` on a :func:`thermal_wii` core (the
    transfer fixed point divides out ``Tr rho``)."""
    d = int(round(np.sqrt(core.shape[0])))
    return expect_local(core, np.asarray(_fold_op(op, d)), iters=iters)


def thermal_wii_correlate(core, op1, op2, distances, iters=300):
    """Two-site thermal correlators ``Tr(rho op1_0 op2_r)`` on a
    :func:`thermal_wii` core."""
    from .umps import correlate

    d = int(round(np.sqrt(core.shape[0])))
    return correlate(core, np.asarray(_fold_op(op1, d)),
                     np.asarray(_fold_op(op2, d)), distances,
                     iters=iters)


# ---------------------------------------------------------------------- #
# Exact TFIM thermal oracle (fermionic spectrum integrals)
# ---------------------------------------------------------------------- #


def tfim_exact_thermal(beta, j=1.0, h=1.0, n=4001):
    """Exact infinite-chain TFIM thermal values ``(ln z, e)`` per site.

    From the free-fermion spectrum ``eps_k = 2 sqrt(j^2 + h^2 -
    2 j h cos k)``: ``ln z = (1/2pi) int ln(2 cosh(beta eps_k / 2))``
    and ``e = -(1/4pi) int eps_k tanh(beta eps_k / 2)`` (checked at
    ``beta -> inf``: ``e -> -4/pi`` at ``j = h = 1``, Pfeuty)."""
    k = np.linspace(-np.pi, np.pi, n)
    eps = 2.0 * np.sqrt(j * j + h * h - 2.0 * j * h * np.cos(k))
    log_z = np.trapezoid(
        np.log(2.0 * np.cosh(0.5 * beta * eps)), k) / (2.0 * np.pi)
    energy = -np.trapezoid(
        eps * np.tanh(0.5 * beta * eps), k) / (4.0 * np.pi)
    return float(log_z), float(energy)
