"""METTS: minimally entangled typical thermal states.

Finite-temperature averages by sampling instead of purification
(:func:`~contractn_tpu.models.circuits.thermal_state`): the thermal
trace ``Tr(e^{-beta H} O)/Z = sum_s p_s <phi_s| O |phi_s>`` over the
METTS ``|phi_s> = e^{-beta H / 2} |s> / ||...||`` is estimated by the
Markov chain  collapse -> imaginary-time evolve -> measure  (White,
PRL 102, 190601).  Each step reuses two existing framework pieces
unchanged — :func:`~contractn_tpu.models.circuits.tebd_evolve` for
``e^{-beta H/2}`` and the exact autoregressive sampler
(:mod:`~contractn_tpu.models.sampling`) for the projective collapse —
so the chain's detailed balance is inherited from the exactness of
both.  Collapse bases ALTERNATE (X then Z by default): collapsing in
a single basis is a valid but slowly-mixing chain; the alternation is
the standard decorrelation trick and cuts the autocorrelation time to
O(1) for the TFIM.

Each METTS carries far less entanglement than the purified thermal
state at the same temperature (bond grows from a product state for
only ``beta/2`` of imaginary time), so low temperatures trade
variance for bond dimension — the classic METTS regime.

Validated against dense thermal averages (``Tr(H e^{-bH})/Z`` by
eigendecomposition): TFIM energy and transverse magnetization within
statistical error bars of the exact values, with the empirical SEM
matching the scatter (tests/test_metts.py).  The reference has no
finite-temperature capability (SURVEY.md section 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import peinsum
from .canonical import right_canonicalize
from .circuits import tebd_evolve
from .mps import MPS
from .sampling import sample_canonical

_HAD = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)


def _collapse(mps, key, u_basis, d):
    """Projectively collapse ``|phi>`` in the basis whose BRAS are the
    rows of ``u_basis``; returns the outcome product state (bond 1)."""
    n = mps.n_sites
    if u_basis is not None:
        u = jnp.asarray(u_basis, mps.cores.dtype)
        cores = peinsum("st,ntij->nsij", u, mps.cores)
        mps = MPS(cores, mps.left, mps.right)
    rc, _ = right_canonicalize(mps)
    config, _ = sample_canonical(rc, key, 1)
    config = np.asarray(config[0])
    if u_basis is None:
        vecs = np.eye(d)[config]  # (n, d) rows e_{x_i}
    else:
        ub = np.asarray(u_basis)
        vecs = ub.conj()[config]  # rows conj(U[s, :]) = U^+ e_s kets
    cores = jnp.asarray(vecs[:, :, None, None], mps.cores.dtype)
    one = jnp.ones((1,), mps.cores.dtype)
    return MPS(cores, one, one)


def metts(h2, n_sites, beta, n_samples, max_bond, key, measure,
          n_steps=None, warmup=3, d=2, bases=("x", "z"), init=None):
    """Run the METTS chain and collect measurements.

    Args:
        h2: dense Hermitian bond term ``(d^2, d^2)``;
            ``H = sum_i h2_{i,i+1}`` (the same convention as
            :func:`~contractn_tpu.models.circuits.tebd_evolve` and
            :func:`~contractn_tpu.models.mpo.mpo_from_bond_term`, so
            one operator serves evolution and measurement).
        beta: inverse temperature (each METTS evolves ``beta/2``).
        n_samples: retained measurements (after ``warmup`` discarded
            chain steps).
        max_bond: TEBD truncation bond.
        key: PRNG key driving every collapse.
        measure: callable ``measure(mps) -> value`` evaluated on each
            normalized METTS; values are collected into the returned
            array (scalars or numpy-stackable).
        n_steps: Trotter steps for the ``beta/2`` evolution (default
            ``max(20, ceil(20 * beta))``).
        bases: cycle of collapse bases, ``"z"`` (computational) /
            ``"x"`` (Hadamard) / any ``(d, d)`` unitary matrix.
        init: starting product configuration (default all-0).

    Returns ``np.ndarray`` of the ``n_samples`` measured values.
    """
    if n_steps is None:
        n_steps = max(20, int(np.ceil(20 * beta)))
    if init is None:
        vec = np.zeros(d)
        vec[0] = 1.0
        init = [vec] * n_sites
    cores = jnp.asarray(
        np.stack([np.asarray(v, float)[:, None, None] for v in init])
    )
    one = jnp.ones((1,))
    state = MPS(cores, one, one)

    out = []
    total = warmup + n_samples
    keys = jax.random.split(key, total)
    for step in range(total):
        phi, _ = tebd_evolve(state, h2, beta / 2.0, n_steps, max_bond,
                             imaginary=True)
        if step >= warmup:
            out.append(measure(phi))
        b = bases[step % len(bases)]
        if isinstance(b, str):
            if b == "z":
                u = None
            elif b == "x":
                if d != 2:
                    raise ValueError('basis "x" needs d = 2')
                u = _HAD
            else:
                raise ValueError(f"unknown basis {b!r}")
        else:
            u = np.asarray(b)
        state = _collapse(phi, keys[step], u, d)
    return np.array(out)
