"""iTEBD: infinite-chain ground states by imaginary-time evolution.

The classic Vidal algorithm on a two-site unit cell ``(Gamma_A,
lambda_A, Gamma_B, lambda_B)``: Trotter gates ``exp(-dt h)`` act on
alternating bonds, each followed by an SVD truncation back to the fixed
bond dimension.  In canonical (Vidal) form the environments are the
squared Schmidt coefficients, so bond energies read off the two-site
wavefunction directly.

TPU shape: one *stage* (fixed gate, ``n_iter`` sweeps over both bonds)
is ONE jitted ``lax.fori_loop`` program — static ``(d, D)`` shapes, SVD
per bond update inside the loop, zero host syncs; the host only walks
the ``dt`` schedule.  Combined with :mod:`contractn_tpu.models.umps`
(transfer spectra, correlators) this gives the full thermodynamic-limit
workflow the reference cannot express at all (its networks are finite
graphs).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision

_LAM_TOL = 1e-9  # relative to max(lambda)


def two_site_gate(h2, dt):
    """``exp(-dt * h2)`` for a Hermitian two-site term ``h2 (d^2, d^2)``."""
    h2 = jnp.asarray(h2)
    vals, vecs = jnp.linalg.eigh(h2)
    prec = dot_precision(h2.dtype)
    return jnp.einsum(
        "ik,k,jk->ij", vecs, jnp.exp(-dt * vals), jnp.conj(vecs),
        precision=prec,
    )


def _bond_update(ga, gb, la, lb, gate, prec):
    """Apply ``gate`` to the A-B bond; returns ``(ga', gb', la')``."""
    d, bond, _ = ga.shape
    cut = _LAM_TOL * jnp.max(lb)
    linv = jnp.where(lb > cut, 1.0 / jnp.maximum(lb, 1e-300), 0.0)
    # theta[s, t, i, k] with lambda_B on BOTH outer bonds (canonical form)
    left = ga * lb[None, :, None] * la[None, None, :]
    theta = jnp.einsum("sij,tjk->stik", left, gb * lb[None, None, :],
                       precision=prec)
    theta = jnp.einsum(
        "uvst,stik->uvik", gate.reshape(d, d, d, d), theta, precision=prec
    )
    mat = theta.transpose(0, 2, 1, 3).reshape(d * bond, d * bond)
    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    u, s, vh = u[:, :bond], s[:bond], vh[:bond]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-300)
    ga_new = u.reshape(d, bond, bond) * linv[None, :, None]
    gb_new = vh.reshape(bond, d, bond).swapaxes(0, 1) * linv[None, None, :]
    return ga_new, gb_new, s


@partial(jax.jit, static_argnums=(5,))
def _stage(ga, gb, la, lb, gate, n_iter):
    prec = dot_precision(ga.dtype)

    def body(_, carry):
        ga, gb, la, lb = carry
        ga, gb, la = _bond_update(ga, gb, la, lb, gate, prec)
        gb, ga, lb = _bond_update(gb, ga, lb, la, gate, prec)
        return ga, gb, la, lb

    return jax.lax.fori_loop(0, n_iter, body, (ga, gb, la, lb))


@jax.jit
def _bond_energy(ga, gb, la, lb, h2):
    """``<theta| h |theta> / <theta|theta>`` on the A-B bond."""
    d, bond, _ = ga.shape
    prec = dot_precision(ga.dtype)
    left = ga * lb[None, :, None] * la[None, None, :]
    theta = jnp.einsum("sij,tjk->stik", left, gb * lb[None, None, :],
                       precision=prec)
    vec = theta.reshape(d * d, -1)
    hvec = jnp.einsum("uv,vx->ux", jnp.asarray(h2, vec.dtype), vec,
                      precision=prec)
    num = jnp.sum(jnp.conj(vec) * hvec)
    den = jnp.sum(jnp.conj(vec) * vec)
    return jnp.real(num / den)


def itebd_ground_state(h2, bond_dim, d=2,
                       schedule=((0.1, 400), (0.01, 400), (0.001, 400)),
                       dtype=jnp.float64, key=None):
    """Variational infinite-chain ground state of ``H = sum_i h2_{i,i+1}``.

    Args:
        h2: Hermitian two-site term as a dense ``(d^2, d^2)`` matrix
            (e.g. :func:`tfim_h2`, :func:`heisenberg_h2`).
        bond_dim: fixed bond dimension of the unit cell.
        schedule: ``(dt, n_iter)`` stages, large steps first.

    Returns:
        ``(state, energy)`` where ``state`` is a dict with the Vidal
        tensors ``gamma_a/gamma_b/lambda_a/lambda_b`` plus ``cores`` —
        the ``(2, d, D, D)`` unit-cell cores ``Gamma lambda`` for the
        :mod:`~contractn_tpu.models.umps` tooling — and ``energy`` is
        the converged energy per site.
    """
    # Product-state start (rank 1, generic local vector): entanglement
    # grows through the gates, so the fixed point stays INJECTIVE.  A
    # full-rank random start converges to the same energy but often as a
    # direct sum of ground-state copies — a known iTEBD artifact that
    # degenerates the transfer spectrum and breaks fixed-point
    # expectation values.
    va = np.cos(0.3 + 0.4 * np.arange(d))
    va = va / np.linalg.norm(va)
    vb = va[::-1].copy()  # Neel-like sublattice asymmetry: without it,
    # staggered-order Hamiltonians can get stuck in a translation-
    # invariant exact eigenstate (e.g. the Heisenberg ferromagnet)
    ga = jnp.zeros((d, bond_dim, bond_dim), dtype).at[:, 0, 0].set(
        jnp.asarray(va, dtype)
    )
    gb = jnp.zeros((d, bond_dim, bond_dim), dtype).at[:, 0, 0].set(
        jnp.asarray(vb, dtype)
    )
    la = jnp.zeros((bond_dim,), dtype).at[0].set(1.0)
    lb = la
    if key is not None:
        # honor the caller's key: perturb the product start so distinct
        # keys explore distinct basins (metastability diagnostics)
        k1, k2 = jax.random.split(key)
        ga = ga + 1e-3 * jax.random.normal(k1, ga.shape, dtype)
        gb = gb + 1e-3 * jax.random.normal(k2, gb.shape, dtype)

    h2 = jnp.asarray(h2, dtype)
    for dt, n_iter in schedule:
        gate = two_site_gate(h2, dt)
        ga, gb, la, lb = _stage(ga, gb, la, lb, gate, int(n_iter))

    e_ab = float(_bond_energy(ga, gb, la, lb, h2))
    e_ba = float(_bond_energy(gb, ga, lb, la, h2))
    energy = 0.5 * (e_ab + e_ba)
    # LEFT-canonical unit-cell cores: lambda on the left cancels the
    # 1 / lambda in Gamma exactly (A_L = lb * Gamma_A == the SVD's U),
    # so no null-space junk ever reaches the transfer operator — the
    # Gamma * lambda_right convention amplifies noise in near-zero
    # Schmidt directions and poisons the uMPS spectrum.
    cores = jnp.stack([
        lb[None, :, None] * ga,
        la[None, :, None] * gb,
    ])
    state = {
        "gamma_a": ga, "gamma_b": gb,
        "lambda_a": la, "lambda_b": lb,
        "cores": cores,
    }
    return state, energy


def unit_cell_core(state, tol=1e-8):
    """Blocked injective unit-cell core for the uMPS tooling.

    ``C = lambda_B Gamma_A lambda_A Gamma_B`` restricted to the
    effective Schmidt rank on both bonds (directions with
    ``lambda < tol * max`` dropped).  Vidal tensors carry ``1/lambda``
    factors, so unconverged near-zero Schmidt directions hold noise
    that would otherwise pollute the transfer spectrum with spurious
    (even leading) eigenvalues; truncation removes them exactly.
    Returns a ``(d^2, r, r)`` core (``r`` = kept rank of the B bond)
    suitable for :func:`~contractn_tpu.models.umps.transfer_spectrum`,
    ``expect_local``, ``correlate`` etc.
    """
    ga = np.asarray(state["gamma_a"])
    gb = np.asarray(state["gamma_b"])
    la = np.asarray(state["lambda_a"])
    lb = np.asarray(state["lambda_b"])
    keep_a = la > tol * la.max()
    keep_b = lb > tol * lb.max()
    ga_t = ga[:, keep_b][:, :, keep_a]
    gb_t = gb[:, keep_a][:, :, keep_b]
    c = np.einsum(
        "i,sij,j,tjk->stik", lb[keep_b], ga_t, la[keep_a], gb_t
    )
    d = ga.shape[0]
    r = int(keep_b.sum())
    return jnp.asarray(c.reshape(d * d, r, r))


# ---------------------------------------------------------------------- #
# Standard two-site Hamiltonian terms (dense (d^2, d^2) matrices)
# ---------------------------------------------------------------------- #

_SX = np.array([[0.0, 1.0], [1.0, 0.0]])
_SZ = np.array([[1.0, 0.0], [0.0, -1.0]])
_SY_IM = np.array([[0.0, -1.0], [1.0, 0.0]])  # i * sigma_y (real)
_ID = np.eye(2)


def tfim_h2(j=1.0, h=1.0):
    """TFIM bond term with the field split between bonds:
    ``-J Z(x)Z - (h/2)(X(x)1 + 1(x)X)``.  Exact infinite-chain ground
    energy per site at ``J = h = 1``: ``-4/pi``."""
    return (-j * np.kron(_SZ, _SZ)
            - 0.5 * h * (np.kron(_SX, _ID) + np.kron(_ID, _SX)))


def heisenberg_h2(jx=1.0, jz=1.0):
    """XXZ bond term ``(Jx/4)(XX + YY) + (Jz/4) ZZ`` (spin-1/2 S.S for
    ``Jx = Jz = 1``; exact ground energy per site ``1/4 - ln 2``)."""
    return 0.25 * (
        jx * (np.kron(_SX, _SX) - np.kron(_SY_IM, _SY_IM))
        + jz * np.kron(_SZ, _SZ)
    )
