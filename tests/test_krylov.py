"""Arnoldi machinery: nonsymmetric leading spectra, device-side.

The Lanczos half of :mod:`contractn_tpu.ops.krylov` is exercised through
DMRG/TDVP; these tests pin the round-3 Arnoldi additions directly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.ops.krylov import arnoldi_basis, arnoldi_eigs


def test_arnoldi_full_dimension_recovers_exact_spectrum():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((40, 40))
    vals, lead = arnoldi_eigs(
        lambda v: jnp.asarray(a) @ v,
        jnp.asarray(rng.standard_normal(40)),
        40,
        k=6,
    )
    ref = np.linalg.eigvals(a)
    ref = ref[np.lexsort((-ref.imag, -np.abs(ref)))]
    np.testing.assert_allclose(vals, ref[:6], atol=1e-10)
    # dominant Ritz pair is an actual eigenpair
    resid = np.linalg.norm(a @ lead - vals[0] * lead)
    assert resid < 1e-10 * np.linalg.norm(lead)


def test_arnoldi_resolves_complex_leading_pair():
    """A rotation-dominated operator whose leading eigenvalues are a
    complex-conjugate pair — the case plain power iteration cannot
    converge on (the iterate rotates forever)."""
    th = 0.7
    rot = 1.5 * np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    )
    a = np.zeros((10, 10))
    a[:2, :2] = rot
    a[2:, 2:] = np.diag(np.linspace(0.1, 0.9, 8))
    vals, _ = arnoldi_eigs(
        lambda v: jnp.asarray(a) @ v, jnp.ones(10), 10, k=2
    )
    want = 1.5 * np.exp(1j * th)
    np.testing.assert_allclose(vals[0], want, atol=1e-10)
    np.testing.assert_allclose(vals[1], np.conj(want), atol=1e-10)


def test_arnoldi_breakdown_truncates_exactly():
    """v0 confined to a 3-dim invariant subspace: the factorization
    breaks down at step 3 and the spectrum is the subspace's, exactly,
    padded with zeros."""
    a = np.zeros((30, 30))
    a[:3, :3] = [[2.0, 1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.5]]
    v0 = np.zeros(30)
    v0[:3] = 1.0
    vals, _ = arnoldi_eigs(
        lambda v: jnp.asarray(a) @ v, jnp.asarray(v0), 20, k=5
    )
    np.testing.assert_allclose(vals, [2.0, 1.0, 0.5, 0.0, 0.0],
                               atol=1e-12)


def test_arnoldi_basis_orthonormal_and_factorization_holds():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((25, 25)) + 1j * rng.standard_normal((25, 25))
    m = 12
    basis, h, nrm0 = jax.jit(
        lambda v: arnoldi_basis(
            lambda x: jnp.asarray(a) @ x, v, m
        )
    )(jnp.asarray(rng.standard_normal(25) + 0j))
    v = np.asarray(basis)
    hh = np.asarray(h)
    gram = v[: m + 1].conj() @ v[: m + 1].T
    np.testing.assert_allclose(gram, np.eye(m + 1), atol=1e-12)
    # A V_m^T = V_{m+1}^T H
    lhs = a @ v[:m].T
    rhs = v[: m + 1].T @ hh
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_projected_lanczos_stays_in_subspace_exactly():
    """``project=`` confines the iteration to an invariant subspace.

    Ending the MATVEC with a dense projector is NOT enough: each
    Krylov row keeps an eps-relative out-of-subspace residual which
    the Gram-Schmidt subtraction re-injects scaled by O(|H|) overlap
    coefficients — the junk grows geometrically (measured x3/step on
    the charged uMPS excitation solve) and deflates Rayleigh quotients
    BELOW the restricted spectrum.  With per-iteration re-projection
    the ground value equals the dense eigensolve of ``P H P``
    restricted to ``range(P)``."""
    from contractn_tpu.ops.krylov import lanczos_ground

    rng = np.random.default_rng(5)
    n, r = 60, 23
    h = rng.standard_normal((n, n))
    h = (h + h.T) / 2
    # a dense orthogonal projector NOT aligned with h's eigenbasis
    q, _ = np.linalg.qr(rng.standard_normal((n, r)))
    p = q @ q.T

    def project(v):
        return jnp.asarray(p) @ v

    def matvec(v):
        return project(jnp.asarray(h) @ v)

    v0 = project(jnp.asarray(rng.standard_normal(n)))
    energy, vec = jax.jit(
        lambda v: lanczos_ground(matvec, v, 50, project=project)
    )(v0)
    # dense reference: eigmin of the restriction q^T h q
    want = np.linalg.eigvalsh(q.T @ h @ q)[0]
    np.testing.assert_allclose(float(energy), want, atol=1e-9)
    vec = np.asarray(vec)
    assert np.linalg.norm(p @ vec - vec) < 1e-12
