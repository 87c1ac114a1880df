"""Quantics tensor trains: functions on 2^n grids as MPS, calculus as
MPOs, and the quantics Fourier transform.

A function sampled on a dyadic grid ``x_j = a + j (b-a)/2^n`` is an
``n``-site, phys-dim-2 MPS over the BINARY DIGITS of ``j`` (site 0 =
most significant bit — exactly :meth:`MPS.from_dense`'s row-major
reshape order).  Smooth/oscillatory functions have tiny quantics rank
(``sin`` is exactly rank 2), so a 2^30-point grid costs thirty small
cores — the "quantics" representation of Khoromskij and of Oseledets.

Everything downstream is the framework's existing machinery:

* grid calculus = MPO algebra.  The cyclic/open ADDER ``|y> -> |y+k>``
  is a bond-2 carry automaton (one core per bit, carries flowing from
  the LSB end); central differences and Laplacians are
  :func:`~contractn_tpu.models.mpo.mpo_sum` combinations of shifts;
  multiply-by-x is a bond-2 diagonal automaton.  All exact.
* the quantics Fourier transform = the textbook QFT circuit driven
  through :class:`~contractn_tpu.models.circuits.CircuitState`
  (long-range controlled phases routed by adjacent swap chains), plus
  an exact zero-cost site reversal.  Matches ``sqrt(N) ifft`` / FFT
  entrywise.

The reference has no function-approximation layer (SURVEY.md section
2: contractn/ is a contraction engine only); this module is the
standard QTT numerics stack built on our containers.
"""

import numpy as np

import jax.numpy as jnp

from .circuits import CircuitState
from .mpo import MPO, mpo_sum
from .mps import MPS


def grid(n_bits, domain=(0.0, 1.0)):
    """The dyadic sample points ``x_j = a + j (b-a)/2^n`` (endpoint
    excluded — the periodic convention)."""
    a, b = float(domain[0]), float(domain[1])
    n = 2 ** n_bits
    return a + (b - a) * np.arange(n) / n


def function_mps(f, n_bits, domain=(0.0, 1.0), max_bond=None,
                 cutoff=1e-14):
    """Quantics MPS of ``f`` sampled on the ``2**n_bits`` grid.

    ``f`` is a vectorized callable (or an explicit length-``2**n``
    array of samples).  Exact unless ``max_bond``/``cutoff`` truncate.
    """
    vals = np.asarray(f(grid(n_bits, domain)) if callable(f) else f)
    if vals.size != 2 ** n_bits:
        raise ValueError(
            f"need 2**{n_bits} samples, got {vals.size}")
    return MPS.from_dense(jnp.asarray(vals), 2, max_bond=max_bond,
                          cutoff=cutoff)


def quantics_to_dense(mps):
    """Dense sample vector of a quantics MPS (small grids only)."""
    n = mps.cores.shape[0]
    idx = ((np.arange(2 ** n)[:, None]
            >> (n - 1 - np.arange(n))[None, :]) & 1)
    weights = np.eye(2)[idx]  # (2^n, n, 2) one-hot site weights
    vals, logs = mps.evaluate(jnp.asarray(weights))
    return np.asarray(vals) * np.exp(np.asarray(logs))


def adder_mpo(n_bits, k, boundary="periodic", dtype=jnp.float64):
    """The basis map ``A_k |y> = |y + k>`` as a bond-2 carry automaton.

    ``boundary="periodic"`` wraps mod ``2**n_bits`` (any final carry
    accepted); ``"open"`` annihilates out-of-range results (``y + k``
    outside ``[0, 2^n)`` maps to the zero vector) — the overflow bit of
    the two's-complement addition is exactly the in-range indicator,
    so open subtraction REQUIRES the carry and open addition forbids
    it.
    """
    n = int(n_bits)
    k_int = int(k)
    k_eff = k_int % (2 ** n)
    cores = np.zeros((n, 2, 2, 2, 2))
    for i in range(n):
        b = (k_eff >> (n - 1 - i)) & 1
        for s in (0, 1):
            for cr in (0, 1):
                out = s ^ b ^ cr
                cl = 1 if (s + b + cr) >= 2 else 0
                cores[i, out, s, cl, cr] = 1.0
    right = np.array([1.0, 0.0])  # no carry into the LSB
    if boundary == "periodic":
        left = np.array([1.0, 1.0])
    elif boundary == "open":
        # in-range iff the overflow bit matches the sign of k
        left = np.array([0.0, 1.0]) if k_int < 0 else np.array([1.0, 0.0])
        if k_eff == 0:
            left = np.array([1.0, 0.0])
    else:
        raise ValueError(f"unknown boundary {boundary!r}")
    return MPO(jnp.asarray(cores, dtype), jnp.asarray(left, dtype),
               jnp.asarray(right, dtype))


def shift_mpo(n_bits, k, boundary="periodic", dtype=jnp.float64):
    """The SAMPLE shift ``(T_k f)(x_j) = f(x_{j+k})`` — the transpose
    of :func:`adder_mpo`: ``T_k = A_{-k}``."""
    return adder_mpo(n_bits, -k, boundary=boundary, dtype=dtype)


def _scaled(mpo, c):
    return MPO(mpo.cores, c * jnp.asarray(mpo.left), mpo.right)


def derivative_mpo(n_bits, domain=(0.0, 1.0), boundary="periodic",
                   dtype=jnp.float64):
    """Second-order central difference ``(f(x+h) - f(x-h)) / 2h`` as a
    bond-4 MPO (sum of two shifts)."""
    h = (float(domain[1]) - float(domain[0])) / 2 ** n_bits
    tp = shift_mpo(n_bits, +1, boundary=boundary, dtype=dtype)
    tm = shift_mpo(n_bits, -1, boundary=boundary, dtype=dtype)
    return mpo_sum(_scaled(tp, 1.0 / (2 * h)), _scaled(tm, -1.0 / (2 * h)))


def laplacian_mpo(n_bits, domain=(0.0, 1.0), boundary="periodic",
                  dtype=jnp.float64):
    """``(f(x+h) - 2 f(x) + f(x-h)) / h^2`` as a bond-5 MPO."""
    h = (float(domain[1]) - float(domain[0])) / 2 ** n_bits
    tp = shift_mpo(n_bits, +1, boundary=boundary, dtype=dtype)
    tm = shift_mpo(n_bits, -1, boundary=boundary, dtype=dtype)
    ident = MPO.identity(int(n_bits), 2, dtype=dtype)
    s = mpo_sum(tp, tm)
    return mpo_sum(_scaled(s, 1.0 / h ** 2), _scaled(ident, -2.0 / h ** 2))


def position_mpo(n_bits, domain=(0.0, 1.0), dtype=jnp.float64):
    """The diagonal multiply-by-``x`` operator (bond 2): the binary
    expansion ``x = a + (b-a) sum_i bit_i 2^{-(i+1)}`` as a triangular
    accumulator automaton."""
    n = int(n_bits)
    a, b = float(domain[0]), float(domain[1])
    cores = np.zeros((n, 2, 2, 2, 2))
    eye = np.eye(2)
    p1 = np.diag([0.0, 1.0])
    for i in range(n):
        c = (b - a) * 2.0 ** (-(i + 1))
        cores[i, :, :, 0, 0] = eye
        cores[i, :, :, 1, 1] = eye
        cores[i, :, :, 0, 1] = c * p1 + (a / n) * eye
    left = np.array([1.0, 0.0])
    right = np.array([0.0, 1.0])
    return MPO(jnp.asarray(cores, dtype), jnp.asarray(left, dtype),
               jnp.asarray(right, dtype))


def quantics_integral(mps, domain=(0.0, 1.0)):
    """Riemann sum ``sum_j f(x_j) dx`` — one contraction with the
    all-ones product bra."""
    n = mps.cores.shape[0]
    dx = (float(domain[1]) - float(domain[0])) / 2 ** n
    ones = MPS.constant(n, 2, 1, fill=1.0, dtype=mps.cores.dtype)
    v, log = ones.inner(mps, conjugate=True)
    return complex(v * jnp.exp(log)) * dx


def register_mpo(mpo, n_total, offset, dtype=None):
    """Embed an ``n``-site MPO on the site window ``[offset, offset+n)``
    of an ``n_total``-site lattice (identities elsewhere).

    The window MPO's boundary vectors are folded into its edge cores
    (channel 0 at the uniform bond), so multi-register quantics
    operators compose by plain :func:`~contractn_tpu.models.mpo.
    mpo_sum` / :func:`~contractn_tpu.models.mpo.mpo_multiply` — e.g.
    the 2D Laplacian is ``register_mpo(lap, 2n, 0) + register_mpo(lap,
    2n, n)`` on the stacked ``(x-bits, y-bits)`` ordering.
    """
    cores = np.asarray(mpo.cores)
    n, d, _, w, _ = cores.shape
    if offset < 0 or offset + n > n_total:
        raise ValueError("window does not fit the lattice")
    dt = np.asarray(cores).dtype if dtype is None else np.dtype(dtype)
    first = np.einsum("l,sSlr->sSr", np.asarray(mpo.left), cores[0])
    last = np.einsum("sSlr,r->sSl", cores[-1], np.asarray(mpo.right))
    out = np.zeros((n_total, d, d, w, w), dt)
    eye = np.eye(d)
    for i in range(n_total):
        if i < offset or i >= offset + n:
            out[i, :, :, 0, 0] = eye
        elif i == offset:
            if n == 1:  # both boundary vectors fold into the one core
                out[i, :, :, 0, 0] = np.einsum(
                    "sSr,r->sS", first, np.asarray(mpo.right))
            else:
                out[i, :, :, 0, :] = first
        elif i == offset + n - 1:
            out[i, :, :, :, 0] = last
        else:
            out[i] = cores[i - offset]
    e0 = np.zeros(w)
    e0[0] = 1.0
    return MPO(jnp.asarray(out), jnp.asarray(e0, out.dtype),
               jnp.asarray(e0, out.dtype))


def function_mps_2d(f, n_bits, domains=((0.0, 1.0), (0.0, 1.0)),
                    max_bond=None, cutoff=1e-14):
    """Quantics MPS of a 2D function on the ``2^n x 2^n`` grid, stacked
    register ordering (x bits = sites ``0..n-1``, y bits = the rest).
    ``f`` is vectorized over meshgrid arrays (or an explicit
    ``(2^n, 2^n)`` sample array)."""
    if callable(f):
        gx = grid(n_bits, domains[0])
        gy = grid(n_bits, domains[1])
        vals = np.asarray(f(gx[:, None], gy[None, :]))
    else:
        vals = np.asarray(f)
    if vals.shape != (2 ** n_bits, 2 ** n_bits):
        raise ValueError(f"need a (2**{n_bits}, 2**{n_bits}) sample grid")
    return MPS.from_dense(jnp.asarray(vals.reshape(-1)), 2,
                          max_bond=max_bond, cutoff=cutoff)


def quantics_integral_2d(mps, domains=((0.0, 1.0), (0.0, 1.0))):
    """Riemann sum ``sum_jk f(x_j, y_k) dx dy`` of a stacked 2D
    quantics MPS — one contraction with the all-ones product bra."""
    n2 = mps.cores.shape[0]
    n = n2 // 2
    dx = (float(domains[0][1]) - float(domains[0][0])) / 2 ** n
    dy = (float(domains[1][1]) - float(domains[1][0])) / 2 ** n
    ones = MPS.constant(n2, 2, 1, fill=1.0, dtype=mps.cores.dtype)
    v, log = ones.inner(mps, conjugate=True)
    return complex(v * jnp.exp(log)) * dx * dy


def quantics_to_dense_2d(mps):
    """Dense ``(2^n, 2^n)`` sample grid of a stacked 2D quantics MPS."""
    flat = quantics_to_dense(mps)
    side = int(np.sqrt(flat.size))
    return flat.reshape(side, side)


def reverse_mps(mps):
    """Exact site reversal (used by the QFT's final bit reversal):
    cores reversed with their virtual legs swapped."""
    cores = jnp.flip(jnp.swapaxes(jnp.asarray(mps.cores), 2, 3), axis=0)
    return MPS(cores, jnp.asarray(mps.right), jnp.asarray(mps.left))


_SWAP = np.eye(4)[[0, 2, 1, 3]]


def _cphase(theta):
    return np.diag([1.0, 1.0, 1.0, np.exp(1j * theta)])


def _apply_longrange(state, u, i, j):
    """Two-site gate between non-adjacent ``i < j`` via adjacent swap
    chains (exact; each swap is one bond-local SVD)."""
    for k in range(j - 1, i, -1):
        state.apply_gate2(_SWAP, k)
    state.apply_gate2(u, i)
    for k in range(i + 1, j):
        state.apply_gate2(_SWAP, k)


def qft_mps(mps, inverse=False, max_bond=None):
    """Quantics Fourier transform of an MPS:
    ``(QFT f)[k] = 2^{-n/2} sum_x e^{+2 pi i x k / 2^n} f[x]``
    (``= sqrt(N) ifft``; ``inverse=True`` gives the fft convention).

    The textbook H + controlled-phase circuit driven through the MPS
    gate machinery, long-range phases routed by swap chains, and the
    output bit reversal done as an exact zero-cost core reversal.
    Low-rank inputs stay low-rank (the QFT's quantics rank is small) —
    pass ``max_bond`` to cap the intermediate bond.
    """
    cores = jnp.asarray(mps.cores)
    state = CircuitState(
        MPS(cores.astype(jnp.complex128), jnp.asarray(mps.left),
            jnp.asarray(mps.right)), max_bond=max_bond)
    n = state.n_sites
    sign = -1.0 if inverse else 1.0
    hada = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)
    for i in range(n):
        state.apply_gate(hada, i)
        for j in range(i + 1, n):
            theta = sign * np.pi / 2 ** (j - i)
            if j == i + 1:
                state.apply_gate2(_cphase(theta), i)
            else:
                _apply_longrange(state, _cphase(theta), i, j)
    out = state.finalize()
    scale = jnp.exp(jnp.asarray(state.log_norm))
    out = MPS(out.cores, scale * out.left, out.right)
    return reverse_mps(out)
