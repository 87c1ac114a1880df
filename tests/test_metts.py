"""METTS vs exact thermal averages (dense eigendecomposition)."""

import jax
import jax.numpy as jnp
import numpy as np

from contractn_tpu.models.itebd import tfim_h2
from contractn_tpu.models.metts import metts
from contractn_tpu.models.mpo import mpo_from_bond_term, rayleigh

N, BETA = 5, 0.7
X = np.array([[0.0, 1.0], [1.0, 0.0]])


def _dense_bond_sum(h2, n):
    hd = np.zeros((2**n, 2**n))
    for i in range(n - 1):
        hd += np.kron(
            np.kron(np.eye(2**i), h2), np.eye(2 ** (n - i - 2))
        )
    return hd


def test_metts_matches_exact_thermal():
    h2 = np.asarray(tfim_h2(j=1.0, h=1.0))
    hd = _dense_bond_sum(h2, N)
    w, v = np.linalg.eigh(hd)
    boltz = np.exp(-BETA * (w - w[0]))
    e_exact = float((w * boltz).sum() / boltz.sum())
    xop = sum(
        np.kron(np.kron(np.eye(2**i), X), np.eye(2 ** (N - i - 1)))
        for i in range(N)
    )
    xd = v.conj().T @ xop @ v
    x_exact = float(np.einsum("ii,i->", xd, boltz) / boltz.sum()) / N

    hmpo = mpo_from_bond_term(h2, N)

    def measure(phi):
        e = float(np.real(complex(rayleigh(hmpo, phi))))
        xs = np.asarray(phi.site_expectations(jnp.asarray(X)))
        return [e, float(np.real(xs.mean()))]

    vals = metts(h2, N, BETA, n_samples=24, max_bond=16,
                 key=jax.random.PRNGKey(0), measure=measure)
    assert vals.shape == (24, 2)
    e_mean, x_mean = vals.mean(axis=0)
    e_sem = vals[:, 0].std(ddof=1) / np.sqrt(len(vals))
    x_sem = vals[:, 1].std(ddof=1) / np.sqrt(len(vals))
    # 4-sigma statistical window + a small Trotter/truncation margin
    assert abs(e_mean - e_exact) < 4.0 * e_sem + 0.02
    assert abs(x_mean - x_exact) < 4.0 * x_sem + 0.01
    # the chain genuinely moves (not stuck on one configuration)
    assert vals[:, 0].std(ddof=1) > 1e-3


def test_metts_large_beta_collapses_to_ground_state():
    """At beta >> gap every METTS IS the ground state — a
    deterministic anchor with no statistics involved."""
    h2 = np.asarray(tfim_h2(j=1.0, h=1.5))  # gapped, no
    # quasi-degenerate doublet (the h<1 phase splits only
    # exponentially and beta cannot purge the partner state)
    hd = _dense_bond_sum(h2, 4)
    e0 = float(np.linalg.eigvalsh(hd)[0])
    hmpo = mpo_from_bond_term(h2, 4)

    def measure(phi):
        return float(np.real(complex(rayleigh(hmpo, phi))))

    vals = metts(h2, 4, 8.0, n_samples=3, max_bond=16, warmup=1,
                 key=jax.random.PRNGKey(1), measure=measure,
                 n_steps=100)
    # residual = collapse leakage e^{-beta gap/2} (~3e-2
    # amplitude -> ~1e-3 energy) + O(dt^2) Trotter bias
    assert np.all(np.abs(vals - e0) < 5e-3)
