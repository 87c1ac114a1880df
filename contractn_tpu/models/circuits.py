"""MPS quantum-circuit simulation: gate application with bond truncation.

A quantum circuit on n qubits is a sequence of 1- and 2-site unitaries
applied to an MPS; entanglement (and hence cost) grows only where the
circuit creates it, so shallow/local circuits simulate in polynomial
time — the standard MPS simulator design.  Gates apply to a ragged site
list (kept internal so repeated applications avoid round-trips through
the uniform zero-padded form); ``finalize()`` returns a framework
:class:`~contractn_tpu.models.mps.MPS`, so the full toolkit — batched
evaluation, sampling, expectation values, compression — composes with
circuit outputs.

Also the engine for finite-temperature physics: purification doubles the
physical index (system (x) ancilla) and imaginary-time gates
``exp(-d_beta h / 2)`` act on the system half
(:func:`thermal_state`), giving thermal expectation values
``tr(e^{-beta H} O) / Z`` at controlled bond dimension.

No circuit or finite-T capability of any kind exists in the reference.
"""

import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .mps import MPS


class CircuitState:
    """Mutable MPS state under gate application.

    Sites are ragged ``(d, Dl, Dr)`` tensors with an accumulated
    ``log_norm`` (gates need not be unitary — imaginary-time/Kraus
    layers work too; each two-site application renormalizes and logs
    the factor).
    """

    def __init__(self, mps_or_sites, max_bond=None, cutoff=0.0):
        if isinstance(mps_or_sites, MPS):
            from .dmrg import _ragged_sites

            self.sites = list(_ragged_sites(mps_or_sites))
        else:
            self.sites = list(mps_or_sites)
        self.max_bond = max_bond
        self.cutoff = cutoff
        self.log_norm = 0.0

    @classmethod
    def product(cls, n_sites, local, max_bond=None, cutoff=0.0):
        """Product state ``|local>^n`` (``local``: length-``d`` vector)."""
        v = jnp.asarray(local)
        site = v[:, None, None]
        return cls([site] * n_sites, max_bond=max_bond, cutoff=cutoff)

    @property
    def n_sites(self):
        return len(self.sites)

    def apply_gate(self, u, site):
        """One-site gate ``u (d, d)`` on ``site`` (no bond growth)."""
        if not 0 <= site < self.n_sites:
            raise ValueError(
                f"one-site gate needs 0 <= site < {self.n_sites}, "
                f"got {site}"
            )
        u = jnp.asarray(u)
        dt = jnp.result_type(u.dtype, self.sites[site].dtype)
        self.sites[site] = peinsum(
            "ab,b...->a...", u.astype(dt), self.sites[site].astype(dt)
        )
        return self

    def apply_gate2(self, u, site):
        """Two-site gate ``u (d*d, d*d)`` on ``(site, site + 1)``.

        Contract the pair, apply, split by SVD truncated to
        ``max_bond``/``cutoff``; the split is renormalized with the
        factor accumulated in ``log_norm`` (exactly 0 for unitaries on
        normalized states).

        Simple-update truncation: the SVD is taken in the local gauge,
        not at a canonical orthogonality center, so with a BINDING
        ``max_bond`` the discarded weight understates the global error
        (exact when nothing is truncated).  For strongly-truncating
        deep circuits, periodically re-canonicalize through
        :func:`~contractn_tpu.models.canonical.compress` on
        ``finalize()``'s output.
        """
        if not 0 <= site < self.n_sites - 1:
            raise ValueError(
                f"two-site gate needs 0 <= site < {self.n_sites - 1}, "
                f"got {site}"
            )
        t1, t2 = self.sites[site], self.sites[site + 1]
        d1, dl, _ = t1.shape
        d2, _, dr = t2.shape
        u = jnp.asarray(u)
        dt = jnp.result_type(u.dtype, t1.dtype, t2.dtype)
        theta = peinsum("aij,bjk->abik", t1.astype(dt), t2.astype(dt))
        u = u.astype(dt).reshape(d1, d2, d1, d2)
        theta = peinsum("abcd,cdik->abik", u, theta)
        mat = theta.transpose(0, 2, 1, 3).reshape(d1 * dl, d2 * dr)
        uu, s, vh = jnp.linalg.svd(mat, full_matrices=False)
        k = s.shape[0]
        if self.max_bond is not None:
            k = min(k, self.max_bond)
        if self.cutoff > 0:
            above = int(jnp.sum(s > self.cutoff * s[0]))
            k = min(k, max(above, 1))
        uu, s, vh = uu[:, :k], s[:k], vh[:k]
        nrm = jnp.maximum(jnp.linalg.norm(s), 1e-300)
        self.log_norm += float(jnp.log(nrm))
        s = s / nrm
        self.sites[site] = uu.reshape(d1, dl, k)
        self.sites[site + 1] = (
            (s[:, None] * vh).reshape(k, d2, dr).transpose(1, 0, 2)
        )
        return self

    def apply_layer(self, u, start=0):
        """Apply the same two-site gate on bonds ``start, start+2, ...``
        (one even or odd Trotter layer)."""
        for i in range(start, self.n_sites - 1, 2):
            self.apply_gate2(u, i)
        return self

    def finalize(self):
        """Uniform stacked :class:`MPS` (normalized; norm in
        ``log_norm``)."""
        from .dmrg import _rebuild_uniform

        dtype = np.result_type(*(np.asarray(t).dtype for t in self.sites))
        return _rebuild_uniform(self.sites, dtype)


# ---------------------------------------------------------------------- #
# Standard gates
# ---------------------------------------------------------------------- #

H_GATE = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)
X_GATE = np.array([[0.0, 1.0], [1.0, 0.0]])
CNOT = np.eye(4)[[0, 1, 3, 2]]
CZ = np.diag([1.0, 1.0, 1.0, -1.0])


def tebd_evolve(mps, h2, t, n_steps, max_bond, imaginary=False):
    """Finite-chain TEBD: evolve ``|psi>`` by ``exp(-i t H)`` (or
    ``exp(-t H)``) with second-order Trotter gate layers.

    ``H = sum_i h2_{i,i+1}`` from the dense bond term ``h2 (d^2, d^2)``.
    An independent algorithm from :func:`~contractn_tpu.models.tdvp.
    tdvp_step` for the same task — the two cross-validate (TDVP projects
    exactly onto the manifold, TEBD Trotterizes exactly in the full
    space; both converge to ``exp(-i t H)`` as ``dt -> 0``).

    Returns ``(mps_out, log_norm)``: the evolved state in uniform
    stacked form, with truncated/decayed weight in ``log_norm``.
    """
    from .itebd import two_site_gate

    dt = t / n_steps
    coef = dt if imaginary else 1j * dt
    g_half = two_site_gate(h2, coef / 2.0)
    g_full = two_site_gate(h2, coef)
    state = CircuitState(mps, max_bond=max_bond)
    if not imaginary:
        state.sites = [
            s.astype(jnp.result_type(s.dtype, jnp.complex64))
            for s in state.sites
        ]
    for _ in range(int(n_steps)):
        state.apply_layer(g_half, start=0)
        state.apply_layer(g_full, start=1)
        state.apply_layer(g_half, start=0)
    return state.finalize(), state.log_norm


# ---------------------------------------------------------------------- #
# Finite temperature via purification
# ---------------------------------------------------------------------- #


def _double_system_gate(g, d, dtype=None):
    """Two-site gate on the SYSTEM half of the doubled (purification)
    index: ``u[(s1 a1)(s2 a2), (s1' a1')(s2' a2')] = g[(s1 s2),
    (s1' s2')] delta(a1, a1') delta(a2, a2')`` — the single home of the
    doubling convention for thermal_state AND thermal_correlation."""
    g4 = np.asarray(g).reshape(d, d, d, d)  # (s1, s2, s1', s2')
    out = np.einsum("stuv,ab,cf->satcubvf", g4, np.eye(d), np.eye(d))
    gd = out.dtype if dtype is None else np.result_type(dtype, out.dtype)
    return jnp.asarray(out.reshape(d ** 4, d ** 4), gd)


def thermal_state(h2, n_sites, beta, max_bond, d=2, n_steps=None,
                  dtype=jnp.float64):
    """Purified thermal state ``|psi_beta>`` with
    ``<psi_beta| O_sys |psi_beta> / <psi_beta|psi_beta>
    = tr(e^{-beta H} O) / Z``.

    Start from the infinite-temperature purification (maximally
    entangled system-ancilla pairs per site, ``d_eff = d^2``) and evolve
    the SYSTEM half of the doubled index by ``exp(-beta H / 2)`` in
    second-order Trotter layers (half of ``beta`` — the thermal trace
    splits the Boltzmann factor across bra and ket).  ``h2`` is the
    two-site bond term (``(d^2, d^2)``, e.g.
    :func:`~contractn_tpu.models.itebd.tfim_h2`).

    Returns a :class:`CircuitState` over the doubled physical index.
    """
    from .itebd import two_site_gate

    n_steps = n_steps or max(int(np.ceil(beta / 0.05)), 1)
    d_beta = 0.5 * beta / n_steps  # the state carries e^{-beta H / 2}
    # |I> per site: system (x) ancilla maximally entangled
    iden = jnp.asarray(np.eye(d).reshape(d * d) / np.sqrt(d), dtype)
    state = CircuitState.product(n_sites, iden, max_bond=max_bond)

    g_half = _double_system_gate(two_site_gate(h2, d_beta / 2.0), d,
                                 dtype)
    g_full = _double_system_gate(two_site_gate(h2, d_beta), d, dtype)
    for _ in range(n_steps):
        state.apply_layer(g_half, start=0)   # even bonds, half step
        state.apply_layer(g_full, start=1)   # odd bonds, full step
        state.apply_layer(g_half, start=0)   # even bonds, half step
    return state


def thermal_expectation(state, op, site, d=2):
    """``<O_site>`` on a purified state (``op (d, d)`` on the system
    half of the doubled index)."""
    mps = state.finalize()
    op_doubled = jnp.asarray(
        np.kron(np.asarray(op), np.eye(d)), mps.cores.dtype
    )
    from .mpo import MPO
    from .mpo import rayleigh as _rayleigh

    n = mps.n_sites
    ws = []
    for i in range(n):
        wi = np.eye(d * d) if i != site else np.asarray(op_doubled)
        ws.append(wi.reshape(d * d, d * d, 1, 1))
    mpo = MPO(jnp.asarray(np.stack(ws), mps.cores.dtype),
              jnp.ones((1,), mps.cores.dtype),
              jnp.ones((1,), mps.cores.dtype))
    return _rayleigh(mpo, mps)


def thermal_correlation(h2, n_sites, beta, op, site, t_max, n_steps,
                        max_bond, d=2, site2=None, dtype=jnp.float64):
    """Finite-temperature dynamic correlation function via purification:

        ``C(t) = tr(e^{-beta H} O_site2(t) O_site) / Z``

    (``site2`` defaults to ``site``; distinct sites give the
    spatially-resolved response ``C_{ij}(t)``).

    Workflow (all existing machinery composed): build the purified
    thermal state, create ``|phi> = (O x 1_ancilla)_site |psi_beta>``,
    evolve BOTH states in real time with second-order Trotter layers on
    the system half of the doubled index, and read out
    ``<psi(t)| (O x 1)_site |phi(t)>`` at every step (truncation
    renormalizations tracked through the states' log registers).

    Returns ``(times, values)`` — ``values[0]`` is the static thermal
    fluctuation ``<O^2> - ...`` (no subtraction applied; it is the full
    correlation, complex for ``t > 0``).  Validated against dense
    ``tr(e^{-beta H} e^{iHt} O e^{-iHt} O)/Z`` in
    ``tests/test_circuits.py``.
    """
    from .itebd import two_site_gate

    site2 = site if site2 is None else site2
    for name, val in (("site", site), ("site2", site2)):
        if not 0 <= val < n_sites:
            raise ValueError(
                f"{name} must satisfy 0 <= {name} < {n_sites}, got {val}"
            )
    psi = thermal_state(h2, n_sites, beta, max_bond, d=d, dtype=dtype)
    psi.log_norm = 0.0  # the base purification norm cancels in the ratio
    op_doubled = jnp.asarray(
        np.kron(np.asarray(op), np.eye(d)),
    )
    phi = CircuitState(list(psi.sites), max_bond=max_bond)
    phi.apply_gate(op_doubled, site)

    dt = t_max / n_steps
    coef = 1j * dt

    g_half = _double_system_gate(two_site_gate(h2, coef / 2.0), d)
    g_full = _double_system_gate(two_site_gate(h2, coef), d)

    def measure():
        bra = psi.finalize()
        ket_state = CircuitState(list(phi.sites))
        ket_state.apply_gate(op_doubled, site2)
        ket = ket_state.finalize()
        num_v, num_l = bra.inner(ket)
        den_v, den_l = bra.norm_squared()
        ratio = complex(np.asarray(num_v / den_v)) * float(
            jnp.exp(jnp.real(num_l - den_l)))
        return ratio * float(np.exp(phi.log_norm - psi.log_norm))

    times, values = [0.0], [measure()]
    for step in range(1, n_steps + 1):
        for state in (psi, phi):
            state.apply_layer(g_half, start=0)
            state.apply_layer(g_full, start=1)
            state.apply_layer(g_half, start=0)
        times.append(step * dt)
        values.append(measure())
    return np.asarray(times), np.asarray(values)
