"""Open quantum systems: Lindblad dynamics on matrix-product density
operators.

The density matrix of an open chain is vectorized site-by-site —
``vec(rho)[s, a] = rho[s, a]`` with the ``(s, a)`` pair as one ``d^2``
local index — so ``rho`` IS an MPS and the Lindbladian

``L(rho) = -i [H, rho] + sum_k (L_k rho L_k^+
- (1/2) {L_k^+ L_k, rho})``

IS an MPO on the doubled space: left multiplication lifts an operator
MPO as ``W (x) I``, right multiplication as ``I (x) W^T`` (the
vectorization convention fixes the transpose), and one-site jump
operators enter as on-site superoperator terms.  Everything downstream
reuses the framework's MPS primitives unchanged: exact MPO application
(bond ``W D``), direct-sum addition, SVD compression, inner products —
time evolution is classical RK4 over those three primitives with a
compression after every stage.  Traces and observables are inner
products against product "bras": ``Tr(O rho) = <vec(O^T)_i (x)
vec(I)_rest, vec(rho)>``.

The Liouvillian MPO is assembled by :func:`~contractn_tpu.models.mpo.
mpo_sum` and compressed to its minimal exact rank — e.g. the dephased
XX chain's Liouvillian lands at ``W = 6`` (the two lifted copies of
the ``W = 4`` XX MPO share their identity boundary channels; the
on-site dephasing rides those channels for free).

Validated against dense Lindblad evolution (``expm`` of the full
``4^n x 4^n`` Liouvillian): the assembled superoperator MPO matches
the dense Liouvillian entrywise to 1e-14, site magnetization
trajectories to 1e-6, trace preservation to machine precision, and
the long-time state reaches the dense null-space steady state.  No
open-system or density-operator capability of any kind exists in the
reference (contractn/ contains no evolution machinery at all).
"""

import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .boundary import apply_mpo_to_mps
from .canonical import compress, compress_mpo, mps_add
from .fermions2d import string_mpo
from .mpo import MPO, mpo_sum
from .mps import MPS


def _lift_left(mpo, dtype):
    """``A rho``: superoperator MPO ``W (x) I`` on the doubled space."""
    w = np.asarray(mpo.cores).astype(dtype)
    n, d, _, wb, _ = w.shape
    eye = np.eye(d)
    out = np.einsum("nsSwv,aA->nsaSAwv", w, eye).reshape(
        n, d * d, d * d, wb, wb)
    return MPO(jnp.asarray(out),
               jnp.asarray(np.asarray(mpo.left), dtype),
               jnp.asarray(np.asarray(mpo.right), dtype))


def _lift_right(mpo, dtype):
    """``rho A``: superoperator MPO ``I (x) W^T`` (vectorization puts
    the ancilla index on the right factor of ``rho``)."""
    w = np.asarray(mpo.cores).astype(dtype)
    n, d, _, wb, _ = w.shape
    eye = np.eye(d)
    out = np.einsum("naAwv,sS->nsaSAwv", np.swapaxes(w, 1, 2), eye
                    ).reshape(n, d * d, d * d, wb, wb)
    return MPO(jnp.asarray(out),
               jnp.asarray(np.asarray(mpo.left), dtype),
               jnp.asarray(np.asarray(mpo.right), dtype))


def _dissipator_site(jump, adjoint=False):
    """One-site superoperator ``L (x) conj(L) - (1/2)(L+L (x) I)
    - (1/2)(I (x) (L+L)^T)``; with ``adjoint=True`` the Hilbert-Schmidt
    adjoint ``O -> L+ O L - (1/2){L+L, O}`` (Heisenberg picture)."""
    el = np.asarray(jump, complex)
    d = el.shape[0]
    ldl = np.matmul(el.conj().T, el)
    eye = np.eye(d)
    if adjoint:
        term = np.einsum("sS,aA->saSA", el.conj().T, el.T)
    else:
        term = np.einsum("sS,aA->saSA", el, el.conj())
    term -= 0.5 * np.einsum("sS,aA->saSA", ldl, eye)
    term -= 0.5 * np.einsum("sS,aA->saSA", eye, ldl.T)
    return term.reshape(d * d, d * d)


def _superop_pair(a_mat, b_mat, d):
    """Two-site superoperator in the site-fused basis: ``a_mat``
    (``d^2 x d^2``) on the ket pair ``(s1 s2)``, ``b_mat`` on the bra
    pair ``(a1 a2)``; rows/cols ordered ``((s1 a1), (s2 a2))``."""
    a4 = np.asarray(a_mat, complex).reshape(d, d, d, d)
    b4 = np.asarray(b_mat, complex).reshape(d, d, d, d)
    t = np.einsum("ijkl,mnop->imjnkolp", a4, b4)
    return t.reshape(d * d, d * d, d * d, d * d)


def _dissipator_bond(jump, d, adjoint=False):
    """Two-site dissipator superoperator of a bond jump operator
    (``d^2 x d^2``), Schmidt-split across the bond.

    Returns ``[(U_k, V_k), ...]`` one-site factor pairs such that the
    dissipator is ``sum_k U_k (x) V_k`` on adjacent fused sites.
    ``adjoint=True`` gives the Hilbert-Schmidt adjoint (Heisenberg).
    """
    el = np.asarray(jump, complex)
    ldl = np.matmul(el.conj().T, el)
    eye = np.eye(d * d)
    if adjoint:
        t = _superop_pair(el.conj().T, el.T, d)
    else:
        t = _superop_pair(el, el.conj(), d)
    t -= 0.5 * _superop_pair(ldl, eye, d)
    t -= 0.5 * _superop_pair(eye, ldl.T, d)
    # (r1, r2, c1, c2) -> ((r1 c1), (r2 c2)) and operator-Schmidt SVD
    dd = d * d
    mat = t.transpose(0, 2, 1, 3).reshape(dd * dd, dd * dd)
    u, sv, vh = np.linalg.svd(mat, full_matrices=False)
    keep = sv > 1e-12 * max(sv[0], 1e-300)
    u, sv, vh = u[:, keep], sv[keep], vh[keep]
    root = np.sqrt(sv)
    us = (u * root[None, :]).T.reshape(-1, dd, dd)
    vs = (vh.T * root[None, :]).T.reshape(-1, dd, dd)
    return list(zip(us, vs))


def liouvillian_mpo(h_mpo, jumps=(), bond_jumps=(), cutoff=1e-12):
    """Lindbladian as an MPO on the vectorized (doubled) chain.

    Args:
        h_mpo: Hamiltonian :class:`~contractn_tpu.models.mpo.MPO`
            (any builder: ``mpo_from_bond_term``, ``spin2d_mpo``, ...).
        jumps: one-site jump operators, either ``[(site, matrix), ...]``
            or ``[matrix, ...]`` applied at every site.
        bond_jumps: two-site jump operators on adjacent sites
            (``d^2 x d^2``, e.g. incoherent hopping, pair loss), as
            ``[(left_site, matrix), ...]`` or bare matrices applied on
            every bond.  Each bond dissipator enters through its
            operator-Schmidt factors, one finite-state channel per
            factor, then the whole Liouvillian is re-compressed.
        cutoff: exact-rank compression cutoff for the assembled MPO.

    Returns the compressed complex superoperator MPO.
    """
    dt = complex
    n = h_mpo.cores.shape[0]
    d = h_mpo.cores.shape[1]
    hl = _lift_left(h_mpo, dt)
    hr = _lift_right(h_mpo, dt)
    lv = mpo_sum(MPO(hl.cores, -1j * hl.left, hl.right),
                 MPO(hr.cores, 1j * hr.left, hr.right))

    onsite = []
    for item in jumps:
        if isinstance(item, tuple):
            site, mat = item
            onsite.append((site, _dissipator_site(mat)))
        else:
            for i in range(n):
                onsite.append((i, _dissipator_site(item)))
    terms = []
    for item in bond_jumps:
        if isinstance(item, tuple):
            bonds = [item]
        else:
            bonds = [(i, item) for i in range(n - 1)]
        for i, mat in bonds:
            for uk, vk in _dissipator_bond(mat, d):
                terms.append((1.0, [(i, uk), (i + 1, vk)], None))
    if onsite or terms:
        diss = string_mpo(n, terms, onsite=onsite, d=d * d,
                          dtype=jnp.complex128)
        lv = mpo_sum(lv, diss)
    comp, log_norm, err = compress_mpo(lv, cutoff=cutoff)
    if float(err) > 1e-9:
        raise ValueError(f"Liouvillian compression lost weight ({err})")
    return MPO(comp.cores, comp.left * jnp.exp(log_norm), comp.right)


def liouvillian_automaton(h_mpo, jumps=(), bond_jumps=(), adjoint=False):
    """The Lindbladian in TRIANGULAR AUTOMATON form (uncompressed).

    Same superoperator as :func:`liouvillian_mpo`, but the finite-state
    structure is preserved instead of SVD-compressed: lifting an
    operator entry ``o -> o (x) I`` (left) or ``o -> I (x) o^T``
    (right) maps the Hamiltonian automaton's ``(D, C, A, B)`` blocks to
    valid automaton blocks, so the Liouvillian assembles channel by
    channel — which is exactly what :func:`~contractn_tpu.models.
    mpo_evolution.wii_mpo` needs to compile ``exp(t L)``.

    ``adjoint=True`` builds the Hilbert-Schmidt adjoint ``L+`` (the
    generator of the Heisenberg picture / adjoint master equation,
    ``dO/dt = +i[H, O] + sum_k L_k+ O L_k - (1/2){L_k+ L_k, O}``) —
    equal to the conjugate transpose of the dense superoperator, since
    the vec basis is orthonormal under the Hilbert-Schmidt pairing.

    ``h_mpo`` must itself be in triangular automaton form (boundary
    vectors ``e_0`` / ``e_last``, as every builder here produces).
    """
    cores = np.asarray(h_mpo.cores)
    n, d, _, wdim, _ = cores.shape
    left = np.asarray(h_mpo.left)
    right = np.asarray(h_mpo.right)
    if abs(left[0] - 1.0) > 1e-12 or np.any(left[1:] != 0):
        raise ValueError("liouvillian_automaton needs automaton form "
                         "(left boundary = e_0)")
    if abs(right[-1] - 1.0) > 1e-12 or np.any(right[:-1] != 0):
        raise ValueError("liouvillian_automaton needs automaton form "
                         "(right boundary = e_last)")
    r = wdim - 2
    eye = np.eye(d)
    ih = 1j if adjoint else -1j

    def _ll(o):
        return np.einsum("sS,aA->saSA", o, eye).reshape(d * d, d * d)

    def _lr(o):
        return np.einsum("aA,sS->saSA", o.T, eye).reshape(d * d, d * d)

    onsite = [[] for _ in range(n)]
    for item in jumps:
        if isinstance(item, tuple):
            site, mat = item
            onsite[site].append(_dissipator_site(mat, adjoint=adjoint))
        else:
            dis = _dissipator_site(item, adjoint=adjoint)
            for i in range(n):
                onsite[i].append(dis)
    bond_channels = []  # (site, U_k, V_k)
    for item in bond_jumps:
        if isinstance(item, tuple):
            bonds = [item]
        else:
            bonds = [(i, item) for i in range(n - 1)]
        for i, mat in bonds:
            for uk, vk in _dissipator_bond(mat, d, adjoint=adjoint):
                bond_channels.append((i, uk, vk))

    nb = len(bond_channels)
    w2 = 2 * r + nb + 2
    last = w2 - 1
    dd = d * d
    out = np.zeros((n, dd, dd, w2, w2), complex)
    for i in range(n):
        w = cores[i]
        out[i, :, :, 0, 0] = np.eye(dd)
        out[i, :, :, last, last] = np.eye(dd)
        out[i, :, :, 0, last] = (ih * _ll(w[:, :, 0, wdim - 1])
                                 - ih * _lr(w[:, :, 0, wdim - 1]))
        for dis in onsite[i]:
            out[i, :, :, 0, last] += dis
        for a in range(1, r + 1):
            out[i, :, :, 0, a] = ih * _ll(w[:, :, 0, a])
            out[i, :, :, 0, r + a] = -ih * _lr(w[:, :, 0, a])
            out[i, :, :, a, last] = _ll(w[:, :, a, wdim - 1])
            out[i, :, :, r + a, last] = _lr(w[:, :, a, wdim - 1])
            for b in range(1, r + 1):
                out[i, :, :, a, b] = _ll(w[:, :, a, b])
                out[i, :, :, r + a, r + b] = _lr(w[:, :, a, b])
    for c, (site, uk, vk) in enumerate(bond_channels):
        ch = 2 * r + 1 + c
        out[site, :, :, 0, ch] = uk
        out[site + 1, :, :, ch, last] = vk
    lvec = np.zeros(w2)
    lvec[0] = 1.0
    rvec = np.zeros(w2)
    rvec[last] = 1.0
    return MPO(jnp.asarray(out), jnp.asarray(lvec, jnp.complex128),
               jnp.asarray(rvec, jnp.complex128))


def lindblad_evolve_wii(rho0, h_mpo, t, n_steps, jumps=(),
                        bond_jumps=(), max_bond=32, order=2):
    """Open-system evolution ``rho(t) = exp(L t) rho(0)`` by the W^II
    propagator of the Liouvillian automaton — one (``order=1``) or two
    (``order=2`` conjugate-pair, globally second-order) MPO
    applications per step vs RK4's four, with no stability ceiling.

    Returns the final vectorized density MPS (same conventions as
    :func:`lindblad_evolve`).
    """
    la = liouvillian_automaton(h_mpo, jumps=jumps, bond_jumps=bond_jumps)
    rho = rho0
    for u2 in _wii_props(la, t / n_steps, order) * n_steps:
        rho = _trim(apply_mpo_to_mps(u2, rho), max_bond)
    return rho


def _wii_props(superop_automaton, dt, order):
    """The per-step W^II propagator list: the conjugate pair
    ``dt (1 +- i)/2`` for globally second order, or the single plain
    step for ``order=1``."""
    from .mpo_evolution import wii_mpo

    if order == 2:
        return [wii_mpo(superop_automaton, dt * (1 + 1j) / 2),
                wii_mpo(superop_automaton, dt * (1 - 1j) / 2)]
    if order == 1:
        return [wii_mpo(superop_automaton, dt)]
    raise ValueError("order must be 1 or 2")


def superop_apply_left(rho, op, site, d=2):
    """``rho -> O_site rho`` (left multiplication) on a vectorized
    density MPS: the one-site superoperator ``O (x) I`` on the fused
    index.  The quantum-regression building block."""
    cores = jnp.asarray(rho.cores)
    m = jnp.asarray(np.kron(np.asarray(op, complex), np.eye(d)),
                    cores.dtype if jnp.iscomplexobj(cores)
                    else jnp.complex128)
    cores = cores.astype(m.dtype)
    cores = cores.at[site].set(
        peinsum("mq,qDE->mDE", m, cores[site]))
    return MPS(cores, jnp.asarray(rho.left, m.dtype),
               jnp.asarray(rho.right, m.dtype))


def two_time_correlation(rho0, h_mpo, op_a, site_a, op_b, site_b,
                         t1, taus, n_steps_per_unit=40, jumps=(),
                         bond_jumps=(), max_bond=32, order=2):
    """Two-time correlation ``C(t1, t1 + tau) = Tr(B e^{L tau}[A
    rho(t1)])`` by the quantum regression theorem: evolve to ``t1``,
    left-multiply by ``A`` (a superoperator insertion, not a
    measurement), keep evolving the RESULT under the same Lindbladian,
    and trace against ``B`` at each requested ``tau``.

    Args:
        rho0: initial vectorized density MPS.
        h_mpo: Hamiltonian MPO in triangular automaton form.
        op_a, site_a: the earlier operator ``A`` (applied at ``t1``).
        op_b, site_b: the later operator ``B``.
        t1: first time.
        taus: increasing lag grid (the trajectory is evolved once,
            values emitted at each grid point).
        n_steps_per_unit: W^II steps per unit time.
        jumps, bond_jumps, max_bond, order: as in
            :func:`lindblad_evolve_wii`.

    Returns the complex array ``C(t1, t1 + tau)`` over ``taus``,
    normalized by ``Tr rho(t1)``.  Note the evolved object ``A rho``
    is NOT a density matrix (not Hermitian, zero trace possible) —
    2-norm compression handles it fine; normalization uses the
    PHYSICAL trace of ``rho(t1)``.
    """
    la = liouvillian_automaton(h_mpo, jumps=jumps, bond_jumps=bond_jumps)
    rho1 = rho0
    if t1 > 0:
        n1 = max(int(round(t1 * n_steps_per_unit)), 1)
        for u2 in _wii_props(la, t1 / n1, order) * n1:
            rho1 = _trim(apply_mpo_to_mps(u2, rho1), max_bond)
    norm = density_trace(rho1)
    sigma = superop_apply_left(rho1, op_a, site_a)
    taus = np.asarray(taus, float)
    if np.any(np.diff(taus) < 0):
        raise ValueError("taus must be non-decreasing")
    out = []
    cur_t = 0.0
    n_sites = int(sigma.cores.shape[0])
    eye = np.eye(h_mpo.cores.shape[1])
    for tau in taus:
        span = float(tau) - cur_t
        if span > 1e-12:
            n_tau = max(int(round(span * n_steps_per_unit)), 1)
            for u2 in _wii_props(la, span / n_tau, order) * n_tau:
                sigma = _trim(apply_mpo_to_mps(u2, sigma), max_bond)
            cur_t = float(tau)
        # Tr(B sigma): the same contraction as density_expectation's
        # numerator, without the trace normalization of sigma
        cores = np.tile(eye.reshape(-1)[None, :, None, None],
                        (n_sites, 1, 1, 1)).astype(complex)
        cores[site_b, :, 0, 0] = np.asarray(op_b, complex).T.reshape(-1)
        one = jnp.ones((1,), jnp.complex128)
        bra = MPS(jnp.asarray(cores), one, one)
        v, log = sigma.inner(bra, conjugate=False)
        out.append(complex(v * jnp.exp(log)) / norm)
    return np.asarray(out)


def vectorized_product_state(states):
    """``rho = (x)_i |psi_i><psi_i|`` as a bond-1 vectorized MPS."""
    cores = []
    for v in states:
        v = np.asarray(v, complex)
        v = v / np.linalg.norm(v)
        rho = np.outer(v, v.conj()).reshape(-1)
        cores.append(rho[:, None, None])
    cores = jnp.asarray(np.stack(cores))
    one = jnp.ones((1,), jnp.complex128)
    return MPS(cores, one, one)


def _trace_bra(n, d, op=None, site=None):
    """Product bra: ``vec(I)`` everywhere, ``vec(O^T)`` at ``site``."""
    eye = np.eye(d).reshape(-1)
    cores = np.tile(eye[None, :, None, None], (n, 1, 1, 1)).astype(complex)
    if op is not None:
        cores[site, :, 0, 0] = np.asarray(op, complex).T.reshape(-1)
    one = jnp.ones((1,), jnp.complex128)
    return MPS(jnp.asarray(cores), one, one)


def density_trace(rho, d=2):
    """``Tr(rho)`` of a vectorized density MPS."""
    bra = _trace_bra(rho.n_sites, d)
    v, log = rho.inner(bra, conjugate=False)
    return complex(v * jnp.exp(log))


def density_expectation(rho, op, site, d=2):
    """``Tr(O_site rho) / Tr(rho)``."""
    return density_expectation_multi(rho, [(site, op)], d=d)


def density_expectation_multi(rho, site_ops, d=2):
    """``Tr(O_{i1} O_{i2} ... rho) / Tr(rho)`` for one-site factors on
    distinct sites (currents, correlators): ``site_ops`` is a list of
    ``(site, matrix)`` pairs."""
    n = rho.n_sites
    eye = np.eye(d).reshape(-1)
    cores = np.tile(eye[None, :, None, None], (n, 1, 1, 1)).astype(complex)
    for site, op in site_ops:
        cores[site, :, 0, 0] = np.asarray(op, complex).T.reshape(-1)
    one = jnp.ones((1,), jnp.complex128)
    bra = MPS(jnp.asarray(cores), one, one)
    v, log = rho.inner(bra, conjugate=False)
    num = complex(v * jnp.exp(log))
    return num / density_trace(rho, d)


def _trim(rho, max_bond):
    out, log_norm, _ = compress(rho, max_bond=max_bond)
    return MPS(out.cores, out.left * jnp.exp(log_norm), out.right)


def _scaled(rho, alpha):
    return MPS(rho.cores, alpha * rho.left, rho.right)


def lindblad_evolve(rho0, l_mpo, t, n_steps, max_bond=32):
    """Evolve ``rho(t) = exp(L t) rho(0)`` by RK4 with SVD compression
    after every stage (error ``O(dt^4)`` + truncation).

    Returns the final vectorized density MPS (un-normalized; divide by
    :func:`density_trace` in observables — trace is preserved by ``L``
    up to truncation).
    """
    dt = t / n_steps
    rho = rho0
    for _ in range(n_steps):
        k1 = _trim(apply_mpo_to_mps(l_mpo, rho), max_bond)
        r2 = _combine([rho, k1], [1.0, 0.5 * dt], max_bond)
        k2 = _trim(apply_mpo_to_mps(l_mpo, r2), max_bond)
        r3 = _combine([rho, k2], [1.0, 0.5 * dt], max_bond)
        k3 = _trim(apply_mpo_to_mps(l_mpo, r3), max_bond)
        r4 = _combine([rho, k3], [1.0, dt], max_bond)
        k4 = _trim(apply_mpo_to_mps(l_mpo, r4), max_bond)
        rho = _combine(
            [rho, k1, k2, k3, k4],
            [1.0, dt / 6, dt / 3, dt / 3, dt / 6], max_bond)
    return rho


def ness_dmrg(l_mpo, max_bond=16, sweeps=8, d=2, key=None,
              cutoff=1e-12, noise=1e-2):
    """Nonequilibrium steady state WITHOUT time evolution: the unique
    null vector of ``L`` is the ground state of the Hermitian PSD
    normal product ``L^+ L``, found by standard two-site DMRG.

    ``L^+ L`` is assembled exactly by :func:`~contractn_tpu.models.mpo.
    mpo_multiply` + :func:`~contractn_tpu.models.mpo.mpo_dagger` and
    compressed to its exact rank; the DMRG energy IS the squared
    2-norm residual ``|L rho|^2 / |rho|^2`` — a built-in certificate
    of steady-state quality.  The initial state is the maximally
    mixed ``rho = I/d^n`` (the exact NESS at zero driving) plus a
    small random perturbation so two-site DMRG can grow the bond.

    Returns ``(rho, residual)``: the trace-normalized vectorized
    density MPS and ``sqrt(<L rho|L rho>)`` for the normalized state.
    """
    import jax

    from .dmrg import dmrg
    from .mpo import mpo_dagger, mpo_multiply

    n = l_mpo.n_sites
    ldl_raw = mpo_multiply(mpo_dagger(l_mpo), l_mpo)
    comp, log_norm, err = compress_mpo(ldl_raw, cutoff=cutoff)
    ldl = MPO(comp.cores, comp.left * jnp.exp(log_norm), comp.right)

    eye = np.eye(d).reshape(-1) / d
    cores = np.tile(eye[None, :, None, None], (n, 1, 1, 1)).astype(complex)
    one = jnp.ones((1,), jnp.complex128)
    mixed = MPS(jnp.asarray(cores), one, one)
    if key is None:
        key = jax.random.PRNGKey(7)
    pert = MPS.random(key, n, d * d, max(2, max_bond // 2),
                      dtype=jnp.complex128, scale=noise)
    mps0 = mps_add(mixed, pert)

    ground, energy, _ = dmrg(ldl, mps0, max_bond=max_bond, sweeps=sweeps)
    tr = density_trace(ground, d)
    rho = MPS(ground.cores, ground.left / tr, ground.right)
    return rho, float(np.sqrt(max(float(np.real(energy)), 0.0)))


def _combine(states, coeffs, max_bond):
    """``sum_i c_i |s_i>`` compressed to ``max_bond`` with the physical
    scale restored (compress/mps_add normalize and return log-norms)."""
    acc = _scaled(states[0], coeffs[0])
    for s, c in zip(states[1:], coeffs[1:]):
        acc, log_norm, _ = mps_add(acc, _scaled(s, c), max_bond=max_bond)
        acc = MPS(acc.cores, acc.left * jnp.exp(log_norm), acc.right)
    return acc
