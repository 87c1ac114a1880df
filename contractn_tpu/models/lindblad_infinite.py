"""Open quantum systems in the thermodynamic limit.

The finite-chain Lindblad stack (:mod:`contractn_tpu.models.lindblad`)
vectorizes ``rho`` into an MPS and evolves it with a lifted MPO sum;
here the same idea goes uniform: a translation-invariant density
operator is ONE ``(d^2, D, D)`` core, the Liouvillian

``L = -i (H (x) I - I (x) H^T) + sum_a g_a [L_a (x) conj(L_a)
- 1/2 (L_a^+ L_a) (x) I - 1/2 I (x) (L_a^+ L_a)^T]``

is ONE triangular bulk core (the balanced Hamiltonian lift of
:func:`~contractn_tpu.models.thermal.balanced_umpo` scaled by ``-i``,
summed corner-sharing with a ``W = 2`` one-site dissipator channel via
:func:`~contractn_tpu.models.mpo.umpo_sum`), and ``exp(t L)`` rides the
uniform W^II evolver (:func:`~contractn_tpu.models.mpo_evolution.
umps_mpo_evolve`) UNCHANGED — ``wii_core`` is expm-based and never
assumes Hermiticity, so the non-normal Liouvillian is just another
bulk core.  Long-range Hamiltonians (exponential / power-law channels
from :class:`~contractn_tpu.models.autompo.InfiniteOpSum`) therefore
dissipate at no extra cost.

Observables live in the TRACE gauge, not the 2-norm gauge: for a
vectorized core ``A[(s a), i, j]`` the trace functional telescopes
through the ``(D, D)`` trace-transfer matrix ``T[i, j] = sum_s
A[(s s), i, j]`` whose dominant eigenpair plays the role the transfer
fixed point plays for pure states — ``Tr(rho O_0) / Tr(rho)`` and all
two-point functions are small host eigenproblems.  On a vectorized
PURE state ``A (x) conj(A)`` the trace transfer IS the usual transfer
matrix, so the trace gauge reproduces the uMPS observables exactly
(pinned by the tests).

The reference has no open-system, mixed-state, or infinite-chain
notion at all (SURVEY.md section 2); additive capability.
"""

import numpy as np

import jax.numpy as jnp

from .mpo import umpo_onsite, umpo_scale, umpo_sum
from .thermal import balanced_umpo


def dissipator_local(jumps, rates=None, d=None):
    """The one-site dissipator superoperator ``(d^2, d^2)`` in the
    row-major ``(ket, bra)`` vectorization of :func:`~contractn_tpu.
    models.thermal._fold_op`."""
    jumps = [np.asarray(lj, complex) for lj in jumps]
    if d is None:
        d = jumps[0].shape[0]
    if rates is None:
        rates = [1.0] * len(jumps)
    out = np.zeros((d * d, d * d), complex)
    eye = np.eye(d)
    for lj, g in zip(jumps, rates):
        ldl = np.einsum("ji,jk->ik", np.conj(lj), lj)
        out += g * (np.kron(lj, np.conj(lj))
                    - 0.5 * np.kron(ldl, eye)
                    - 0.5 * np.kron(eye, ldl.T))
    return out


def bond_dissipator_super(jump, d=None):
    """The TWO-site dissipator superoperator of a bond jump operator
    ``(d^2, d^2)``, as a dense ``(d^4, d^4)`` matrix on the fused
    folded pair ``((s1 a1), (s2 a2))`` — ready for
    :func:`~contractn_tpu.models.mpo.mpo_from_bond_term`'s generic
    (non-Hermitian-safe) operator-Schmidt channel construction."""
    from .lindblad import _superop_pair

    el = np.asarray(jump, complex)
    if d is None:
        d = int(round(np.sqrt(el.shape[0])))
    ldl = np.einsum("ji,jk->ik", np.conj(el), el)
    eye = np.eye(d * d)
    t = (_superop_pair(el, el.conj(), d)
         - 0.5 * _superop_pair(ldl, eye, d)
         - 0.5 * _superop_pair(eye, ldl.T, d))
    dd = d * d
    return t.reshape(dd * dd, dd * dd)


def liouvillian_umpo(h_core, jumps=(), rates=None, bond_jumps=(),
                     bond_rates=None):
    """The Lindblad generator as ONE triangular bulk core on the
    folded ``d^2`` site.

    Args:
        h_core: physical ``(d, d, W, W)`` triangular bulk core, or
            ``None`` for purely dissipative dynamics.
        jumps: one-site jump operators ``(d, d)`` (each acts on every
            site of the uniform chain).
        rates: per-jump rates (default all 1).
        bond_jumps: two-site jump operators ``(d^2, d^2)`` (one per
            bond, uniform) — correlated loss, dissipative hopping...
            Each enters as an operator-Schmidt channel block
            (:func:`bond_dissipator_super` through the generic
            ``mpo_from_bond_term`` construction, which never assumes
            Hermiticity).
        bond_rates: per-bond-jump rates (default all 1).

    Returns a complex ``(d^2, d^2, W', W')`` core; feed
    ``umpo_scale(core, -1)`` to the W^II evolver with ``imag=True``
    (i.e. ``exp(-t (-L)) = exp(t L)``) — :func:`lindblad_evolve_infinite`
    wraps exactly that.
    """
    from .mpo import mpo_from_bond_term

    if h_core is None and not jumps and not bond_jumps:
        raise ValueError("liouvillian_umpo needs a Hamiltonian core "
                         "or at least one jump operator")
    if h_core is not None:
        d = np.asarray(h_core).shape[0]
    elif jumps:
        d = np.asarray(jumps[0]).shape[0]
    else:
        d = int(round(np.sqrt(np.asarray(bond_jumps[0]).shape[0])))
    pieces = []
    if h_core is not None:
        pieces.append(umpo_scale(balanced_umpo(np.asarray(h_core)),
                                 -1j))
    if jumps:
        pieces.append(umpo_onsite(dissipator_local(jumps, rates, d)))
    if bond_rates is None:
        bond_rates = [1.0] * len(bond_jumps)
    for bj, g in zip(bond_jumps, bond_rates):
        m = g * bond_dissipator_super(bj, d)
        pieces.append(jnp.asarray(
            np.asarray(mpo_from_bond_term(m, 2, d=d * d).cores)[0]))
    out = pieces[0]
    for p in pieces[1:]:
        out = umpo_sum(out, p)
    return out


def vectorize_umps(core):
    """``|psi><psi|`` as a vectorized uniform core: ``A (x) conj(A)``,
    physical ``(ket s, bra a)`` fused row-major, bond ``D^2``."""
    a = np.asarray(core)
    d, dl, dr = a.shape
    out = np.einsum("sij,akl->saikjl", a, np.conj(a))
    return jnp.asarray(out.reshape(d * d, dl * dl, dr * dr))


def maximally_mixed(d=2):
    """The infinite-temperature state ``vec(I)`` as a bond-1 core."""
    v = np.zeros(d * d)
    v[np.arange(d) * d + np.arange(d)] = 1.0
    return jnp.asarray(v[:, None, None])


def product_density(rho1):
    """A product density operator ``... rho1 (x) rho1 ...`` as a
    bond-1 vectorized core."""
    r = np.asarray(rho1, complex)
    return jnp.asarray(r.reshape(-1)[:, None, None])


def lindblad_evolve_infinite(rho_core, h_core, jumps=(), rates=None,
                             t=1.0, n_steps=10, bond_dim=16, order=2,
                             callback=None, bond_jumps=(),
                             bond_rates=None):
    """Evolve a uniform vectorized density operator: ``exp(t L) rho``.

    Same contract as :func:`~contractn_tpu.models.mpo_evolution.
    umps_mpo_evolve` (per-step W^II application, dominant-Schmidt
    truncation to ``bond_dim``, ``order=2`` keeps ``O(dt^2)`` globally;
    the per-step 2-norm renormalization is harmless — every trace-gauge
    observable is a ratio).  ``callback(k, core)`` after each step.

    Returns the evolved ``(d^2, D, D)`` core; measure with
    :func:`trace_expect` / :func:`trace_correlate`.
    """
    from .mpo_evolution import umps_mpo_evolve

    lv = liouvillian_umpo(h_core, jumps, rates, bond_jumps, bond_rates)
    return umps_mpo_evolve(rho_core, umpo_scale(lv, -1.0), t, n_steps,
                           bond_dim, imag=True, order=order,
                           callback=callback)


def _trace_transfer(core, op=None):
    a = np.asarray(core)
    dd = a.shape[0]
    d = int(round(np.sqrt(dd)))
    a4 = a.reshape(d, d, a.shape[1], a.shape[2])
    if op is None:
        return np.einsum("ssij->ij", a4)
    # Tr(O rho_site): rho carries (ket s, bra a); Tr = sum O[a, s]
    return np.einsum("as,saij->ij", np.asarray(op, complex), a4)


def _dominant_triplet(t_mat):
    """Dominant ``(lam, l, r)`` of the (non-Hermitian) trace transfer,
    normalized to ``l^+ r = 1``.  Host ``eig`` — the matrix is only
    ``(D, D)`` (measurement-time, never inside jit)."""
    vals, vecs = np.linalg.eig(t_mat)
    k = int(np.argmax(np.abs(vals)))
    r = vecs[:, k]
    wals, wecs = np.linalg.eig(t_mat.T)
    kl = int(np.argmin(np.abs(wals - vals[k])))
    lvec = wecs[:, kl]
    lr = np.einsum("i,i->", lvec, r)
    return vals[k], lvec / lr, r


def trace_expect(rho_core, op):
    """``Tr(rho op_0) / Tr(rho)`` in the thermodynamic limit."""
    t_mat = _trace_transfer(rho_core)
    lam, lvec, r = _dominant_triplet(t_mat)
    t_op = _trace_transfer(rho_core, op)
    return complex(np.einsum("i,ij,j->", lvec, t_op, r) / lam)


def trace_correlate(rho_core, op1, op2, distances):
    """``Tr(rho op1_0 op2_r) / Tr(rho)`` for each ``r`` in
    ``distances`` (all ``r >= 1``)."""
    t_mat = _trace_transfer(rho_core)
    lam, lvec, r = _dominant_triplet(t_mat)
    t1 = _trace_transfer(rho_core, op1)
    t2 = _trace_transfer(rho_core, op2)
    out = []
    for dist in distances:
        if dist < 1:
            raise ValueError("trace_correlate needs distances >= 1")
        cur = np.einsum("i,ij->j", lvec, t1)
        for _ in range(int(dist) - 1):
            cur = np.einsum("i,ij->j", cur, t_mat) / lam
        val = np.einsum("i,ij,j->", cur, t2, r)
        out.append(val / lam ** 2)
    return np.asarray(out)


def one_site_density(rho_core):
    """The one-site reduced density matrix ``rho_1 (d, d)`` in the
    thermodynamic limit (trace-normalized)."""
    a = np.asarray(rho_core)
    d = int(round(np.sqrt(a.shape[0])))
    lam, lvec, rv = _dominant_triplet(_trace_transfer(rho_core))
    a4 = a.reshape(d, d, a.shape[1], a.shape[2])
    rho1 = np.einsum("i,saij,j->sa", lvec, a4, rv) / lam
    return rho1 / np.trace(rho1)


def ness_infinite(h_core, jumps=(), rates=None, bond_jumps=(),
                  bond_rates=None, rho0=None, bond_dim=16,
                  t_chunk=1.0, max_chunks=40, tol=1e-6,
                  steps_per_unit=20):
    """Nonequilibrium steady state of a uniform Lindbladian by
    long-time evolution: evolve in ``t_chunk`` chunks until the
    one-site reduced density matrix drifts less than ``tol`` per unit
    time.

    (A direct uniform eigensolver for ``L`` would need quadratic
    corner-channel environments — the ``L^+ L`` product duplicates the
    identity corners into diverging interior diagonal channels that
    the linear geometric solves of ``mpo_environments`` cannot host;
    evolution sidesteps that entirely, and the drift certificate is
    the convergence statement.)

    Returns a dict: ``core``, ``rho1``, ``drift`` (per unit time),
    ``t_total``, ``converged``.
    """
    rho = maximally_mixed(
        np.asarray(h_core).shape[0] if h_core is not None else
        (np.asarray(jumps[0]).shape[0] if jumps else
         int(round(np.sqrt(np.asarray(bond_jumps[0]).shape[0])))),
    ) if rho0 is None else rho0
    prev = one_site_density(rho)
    t_total, drift, converged = 0.0, np.inf, False
    for _ in range(int(max_chunks)):
        rho = lindblad_evolve_infinite(
            rho, h_core, jumps, rates, t=t_chunk,
            n_steps=max(2, int(round(steps_per_unit * t_chunk))),
            bond_dim=bond_dim, bond_jumps=bond_jumps,
            bond_rates=bond_rates)
        t_total += t_chunk
        cur = one_site_density(rho)
        drift = float(np.max(np.abs(cur - prev))) / t_chunk
        prev = cur
        if drift < tol:
            converged = True
            break
    return {"core": rho, "rho1": prev, "drift": drift,
            "t_total": t_total, "converged": converged}


def steady_state_check(rho_core, h_core, jumps=(), rates=None,
                       ops=(), t_probe=0.2, n_steps=4, bond_dim=None):
    """Cheap stationarity certificate: evolve ``t_probe`` and return
    the max drift of the given one-site observables."""
    if bond_dim is None:
        bond_dim = int(np.asarray(rho_core).shape[1])
    before = [trace_expect(rho_core, o) for o in ops]
    out = lindblad_evolve_infinite(rho_core, h_core, jumps, rates,
                                   t_probe, n_steps, bond_dim)
    after = [trace_expect(out, o) for o in ops]
    return max(abs(a - b) for a, b in zip(after, before))
