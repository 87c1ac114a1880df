"""Uniform (infinite) MPS: thermodynamic-limit quantities.

A translation-invariant state is one core ``A (d, D, D)`` repeated
forever.  Everything observable flows from the transfer operator
``T(rho) = sum_s A_s rho A_s^H`` (a completely positive map on ``D x D``
matrices, never materialized as a ``D^2 x D^2`` matrix — each
application costs two ``(D, dD)``-shaped GEMMs, the same trick as
:func:`contractn_tpu.ops.scan.mps_norm`):

* ``log lambda_1`` — the free energy / log-norm per site of the infinite
  chain (the split-format register's thermodynamic limit);
* ``lambda_2 / lambda_1`` — the correlation length
  ``xi = -1 / log |lambda_2/lambda_1|``;
* fixed points ``l, r`` — environments for local expectation values
  ``<O> = tr(l T_O(r)) / (lambda_1 tr(l r))``.

Eigenpairs come from device-side power iteration (``lax.fori_loop``,
per-step rescale with the log in the carry, zero host syncs; the
subleading eigenvalue by deflation against the leading left/right fixed
points).  The reference has no infinite-system capability at all —
its only scaling axis is finite chain length (SURVEY.md §5).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision


def _apply_T(core, rho, prec):
    """``sum_s A_s rho A_s^H`` via two GEMM-shaped einsums."""
    x = jnp.einsum("sij,jk->sik", core, rho, precision=prec)
    return jnp.einsum("sik,slk->il", x, jnp.conj(core), precision=prec)


def _apply_Tt(core, rho, prec):
    """Adjoint map ``sum_s A_s^H rho A_s`` (left fixed point)."""
    x = jnp.einsum("sji,jk->sik", jnp.conj(core), rho, precision=prec)
    return jnp.einsum("sik,skl->il", x, core, precision=prec)


@partial(jax.jit, static_argnums=(3,))
def _power_leading(core, rho0, deflate, iters):
    """Leading eigenpair of T (or of T deflated against ``deflate``).

    ``deflate``: ``None`` or ``(l, r, lam)`` — the leading left/right
    fixed points; each iterate is first projected off the leading right
    eigendirection (``rho -= r tr(l rho) / tr(l r)``), so the iteration
    converges to ``lambda_2``.  Returns ``(lam, rho)`` with ``rho`` the
    Frobenius-normalized eigenmatrix and ``lam`` its Rayleigh estimate.
    """
    prec = dot_precision(core.dtype)
    rho0 = rho0 / jnp.maximum(jnp.linalg.norm(rho0), 1e-300)

    if deflate is not None:
        l0, r0, _ = deflate
        denom = jnp.trace(jnp.matmul(l0, r0, precision=prec))

        def project(rho):
            coef = jnp.trace(jnp.matmul(l0, rho, precision=prec)) / denom
            return rho - coef * r0
    else:
        def project(rho):
            return rho

    def body(_, carry):
        rho, lam = carry
        new = _apply_T(core, project(rho), prec)
        nrm = jnp.maximum(jnp.linalg.norm(new), 1e-300)
        # Rayleigh-style estimate with phase: <rho, T rho> for unit rho
        lam = jnp.einsum("ij,ij->", jnp.conj(rho), new, precision=prec)
        return new / nrm, lam

    rho, lam = jax.lax.fori_loop(0, iters, body, (rho0, jnp.zeros(
        (), core.dtype)))
    return lam, rho


def transfer_spectrum(core, iters=300, key=None):
    """Leading two transfer-operator eigenvalues and fixed points.

    Returns a dict with ``lam1`` (leading eigenvalue, positive for any
    nonzero state since T is completely positive), ``lam2`` (subleading,
    may be negative/complex), ``xi`` (correlation length in sites,
    ``inf`` when degenerate), and the fixed points ``l, r``
    (Frobenius-normalized).
    """
    bond = core.shape[1]
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rho0 = jnp.eye(bond, dtype=core.dtype) + 0.01 * jax.random.normal(
        k1, (bond, bond), core.real.dtype if hasattr(core, "real")
        else core.dtype
    ).astype(core.dtype)

    lam1, r = _power_leading(core, rho0, None, iters)

    # Left fixed point of the same eigenvalue (adjoint map iteration)
    prec = dot_precision(core.dtype)

    @jax.jit
    def left_fix(core, rho0):
        def body(_, rho):
            new = _apply_Tt(core, rho, prec)
            return new / jnp.maximum(jnp.linalg.norm(new), 1e-300)

        return jax.lax.fori_loop(0, iters, body, rho0)

    left = left_fix(core, rho0)

    rho2 = jax.random.normal(k2, (bond, bond), jnp.zeros(
        (), core.dtype).real.dtype).astype(core.dtype)
    lam2, _ = _power_leading(core, rho2, (left, r, lam1), iters)

    lam1_f = complex(np.asarray(lam1))
    lam2_f = complex(np.asarray(lam2))
    ratio = abs(lam2_f) / abs(lam1_f) if lam1_f else 0.0
    xi = float("inf") if ratio >= 1.0 - 1e-12 else (
        float("inf") if ratio == 0 else -1.0 / np.log(ratio)
    )
    return {
        "lam1": lam1_f if np.iscomplexobj(np.asarray(core)) else
        float(np.real(lam1_f)),
        "lam2": lam2_f if np.iscomplexobj(np.asarray(core)) else
        float(np.real(lam2_f)),
        "xi": xi,
        "l": left,
        "r": r,
    }


def log_norm_per_site(core, iters=300):
    """``lim_N (1/N) log <psi_N|psi_N>`` of the infinite chain:
    ``log lambda_1`` of the transfer operator (always finite — the
    split-format register's per-site growth rate)."""
    spec = transfer_spectrum(core, iters=iters)
    return float(np.log(abs(spec["lam1"])))


def correlation_length(core, iters=300):
    """``xi = -1 / log |lam2 / lam1|`` in units of sites."""
    return transfer_spectrum(core, iters=iters)["xi"]


def correlate(core, op1, op2, distances, iters=300):
    """Connected two-point correlators ``<O1_0 O2_x> - <O1><O2>`` in the
    thermodynamic limit, for each separation in ``distances``.

    ``l O1 T^(x-1) O2 r`` evaluated by repeatedly applying the transfer
    map to the ``O2``-dressed right environment (one scan, all requested
    distances read out along the way).  Decay rate matches
    ``exp(-x / xi)`` with :func:`correlation_length`'s ``xi``.
    """
    distances = [int(x) for x in distances]
    if any(x < 1 for x in distances):
        raise ValueError("distances must be >= 1")
    spec = transfer_spectrum(core, iters=iters)
    left, r, lam1 = spec["l"], spec["r"], spec["lam1"]
    prec = dot_precision(core.dtype)
    op1 = jnp.asarray(op1, core.dtype)
    op2 = jnp.asarray(op2, core.dtype)

    def dressed(op, rho):
        x = jnp.einsum("st,tij->sij", op, core, precision=prec)
        x = jnp.einsum("sij,jk->sik", x, rho, precision=prec)
        return jnp.einsum("sik,slk->il", x, jnp.conj(core), precision=prec)

    norm = jnp.trace(jnp.matmul(left, r, precision=prec))
    e1 = jnp.trace(jnp.matmul(left, dressed(op1, r), precision=prec)) / (
        lam1 * norm
    )
    e2 = jnp.trace(jnp.matmul(left, dressed(op2, r), precision=prec)) / (
        lam1 * norm
    )

    max_x = max(distances)
    # env_k = T^k T_O2 r / lam1^k -- rescaled every application so long
    # distances never overflow (split-format thinking, applied here)
    env = dressed(op2, r)
    out = {}
    for x in range(1, max_x + 1):
        if x in distances and x not in out:
            num = jnp.trace(
                jnp.matmul(left, dressed(op1, env), precision=prec)
            )
            raw = num / (lam1 ** 2 * norm)
            out[x] = raw - e1 * e2
        env = _apply_T(core, env, prec) / lam1
    is_cpx = np.iscomplexobj(np.asarray(core))
    return [
        complex(np.asarray(out[x])) if is_cpx
        else float(np.real(np.asarray(out[x])))
        for x in distances
    ]


def expect_local(core, op, iters=300):
    """``<psi| O_i |psi> / <psi|psi>`` for a one-site operator ``O`` in
    the thermodynamic limit: ``tr(l T_O(r)) / (lam1 tr(l r))``."""
    spec = transfer_spectrum(core, iters=iters)
    left, r, lam1 = spec["l"], spec["r"], spec["lam1"]
    prec = dot_precision(core.dtype)
    op = jnp.asarray(op, core.dtype)
    x = jnp.einsum("st,tij->sij", op, core, precision=prec)
    x = jnp.einsum("sij,jk->sik", x, r, precision=prec)
    t_o_r = jnp.einsum("sik,slk->il", x, jnp.conj(core), precision=prec)
    num = jnp.trace(jnp.matmul(left, t_o_r, precision=prec))
    den = lam1 * jnp.trace(jnp.matmul(left, r, precision=prec))
    val = complex(np.asarray(num)) / complex(np.asarray(den))
    return val if np.iscomplexobj(np.asarray(core)) else float(val.real)


def static_structure_factor(core, op, ks, max_distance=60, iters=300):
    """``S(k) = sum_x e^{ikx} <O_0 O_x>_c`` of a uniform MPS.

    Connected real-space correlators out to ``max_distance`` (plus the
    on-site ``<O^2> - <O>^2`` term) cosine-transformed at each momentum
    — adequate whenever ``max_distance >> xi``.  For gapped states this
    equals the total tangent-space spectral weight
    (:func:`~contractn_tpu.models.excitations.spectral_weights`)
    identically; the tests pin that sum rule.
    """
    op = jnp.asarray(op, core.dtype)
    xs = list(range(1, int(max_distance) + 1))
    cx = np.real(np.asarray(correlate(core, op, op, xs, iters=iters)))
    # one transfer-spectrum solve serves both on-site moments (the
    # correlate() call above needs its own distance-resolved scan)
    spec = transfer_spectrum(core, iters=iters)
    left, r, lam1 = spec["l"], spec["r"], spec["lam1"]
    prec = dot_precision(core.dtype)

    def local(o):
        x = jnp.einsum("st,tij->sij", o, core, precision=prec)
        x = jnp.einsum("sij,jk->sik", x, r, precision=prec)
        t_o_r = jnp.einsum("sik,slk->il", x, jnp.conj(core),
                           precision=prec)
        num = jnp.trace(jnp.matmul(left, t_o_r, precision=prec))
        den = lam1 * jnp.trace(jnp.matmul(left, r, precision=prec))
        return float(np.real(np.asarray(num / den)))

    m1 = local(op)
    m2 = local(jnp.einsum("st,tu->su", op, op, precision=prec))
    c0 = m2 - m1 * m1
    scalar_in = np.ndim(ks) == 0
    ks = np.atleast_1d(np.asarray(ks, float))
    out = c0 + 2.0 * np.matmul(np.cos(np.outer(ks, xs)), cx)
    return float(out[0]) if scalar_in else out


# --------------------------------------------------------------------- #
# Perfect (Born-rule) sampling of a window of the infinite state
# --------------------------------------------------------------------- #


def _sample_env(core, gauge_iters):
    from .vumps import mixed_gauge

    _, ar, c = mixed_gauge(jnp.asarray(core), iters=gauge_iters)
    prec = dot_precision(ar.dtype)
    rho0 = jnp.einsum("ji,jk->ik", jnp.conj(c), c, precision=prec)
    return ar, rho0 / jnp.trace(rho0)


def umps_sample(core, n_sites, n_samples, key, gauge_iters=60):
    """Perfect Born-rule samples of an ``n_sites`` window of the
    INFINITE state (Ferris/Vidal, PRB 85, 165146).

    Mixed gauge puts the window right of the center bond: everything
    left of it contracts to the center density ``rho_0 = C^H C`` and
    everything right to the identity (AR is a right isometry), so the
    chain rule is exact — ``p(s | prefix) = tr(AR^s{}^H rho AR^s)``
    with ``rho <- AR^s{}^H rho AR^s / p`` — no Metropolis, no
    autocorrelation, every draw independent.  The whole sampler is ONE
    jitted program: ``vmap`` over samples of a ``lax.scan`` over sites
    with ``jax.random.categorical`` draws (TPU shape: static
    ``(n_samples, n_sites)``, zero host syncs).

    Returns an ``(n_samples, n_sites)`` int array of local outcomes.
    Deterministic oracle: :func:`umps_window_distribution`.
    """
    ar, rho0 = _sample_env(core, gauge_iters)
    return np.asarray(_sample_jit(ar, rho0, int(n_sites),
                                  int(n_samples), key))


@partial(jax.jit, static_argnums=(2, 3))
def _sample_jit(ar, rho0, n_sites, n_samples, key):
    prec = dot_precision(ar.dtype)
    keys = jax.random.split(key, n_samples)

    def one(k):
        def step(rho, kk):
            t = jnp.einsum("sji,jk,skl->sil", jnp.conj(ar), rho, ar,
                           precision=prec)
            p = jnp.real(jnp.trace(t, axis1=1, axis2=2))
            p = jnp.maximum(p, 0.0)
            s = jax.random.categorical(kk, jnp.log(p + 1e-300))
            rho_new = t[s] / jnp.maximum(p[s], 1e-300)
            return rho_new, s

        ks = jax.random.split(k, n_sites)
        _, ss = jax.lax.scan(step, rho0, ks)
        return ss

    return jax.vmap(one)(keys)


def umps_window_distribution(core, n_sites, gauge_iters=60):
    """The EXACT joint distribution ``p(s_1 .. s_n)`` of an
    ``n_sites`` window (small ``n`` — ``d^n`` outcomes enumerated
    through the same chain rule :func:`umps_sample` draws from).
    Returns a ``(d,) * n_sites`` array summing to 1."""
    ar, rho0 = _sample_env(core, gauge_iters)
    ar = np.asarray(ar)
    d = ar.shape[0]
    mats = [np.conj(ar[s]).T for s in range(d)]
    out = np.zeros((d,) * int(n_sites))

    def rec(rho, prefix):
        if len(prefix) == n_sites:
            out[prefix] = np.real(np.trace(rho))
            return
        for s in range(d):
            rec(np.einsum("ij,jk,lk->il", mats[s], rho,
                          np.conj(mats[s])), prefix + (s,))

    rec(np.asarray(rho0), ())
    return out
