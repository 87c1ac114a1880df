"""MERA: multiscale entanglement renormalization (ternary, scale-invariant).

The ternary MERA (Evenbly-Vidal) coarse-grains an infinite critical
chain by alternating layers of disentanglers ``u`` (unitaries on the
block-boundary pairs) and isometries ``w`` (three fine sites -> one
coarse).  Ternary geometry keeps every nearest-neighbor operator's
causal cone two sites wide, so a per-site two-site Hamiltonian term
ascends through a layer as a sum of three two-site diagrams

``A(h) = A_L(h) + A_C(h) + A_R(h)``

(positions ``(3j, 3j+1)``, ``(3j+1, 3j+2)``, ``(3j+2, 3j+3)`` within a
block), and ``A(I) = 3 I`` exactly — one term per fine site becomes
three per coarse site.  A finite stack of transitional layers lifts the
physical dimension to ``chi``; above them one scale-invariant ``(u, w)``
pair repeats forever, and its fixed-point density matrix ``rho*``
closes the energy:

``e = Tr(rho* A_{L-1}(...A_0(h))) / 3^L``.

TPU-native design decisions:

* **The descending superoperator is never written.**  It is the
  Hilbert-Schmidt adjoint of the ascending one, so this module obtains
  it as ``jax.linear_transpose`` of ``_ascend`` — one set of diagrams
  to derive, zero chance of ascend/descend mismatch (their pairing
  identity ``Tr(D(rho) h) == Tr(rho A(h))`` is a tested invariant).
* **Environments are never derived by hand.**  The Evenbly-Vidal
  linearized update needs the environment of each tensor with the rest
  frozen; that is exactly ``jax.grad`` of the layer energy with
  ``stop_gradient`` on the density matrix and the ascended Hamiltonian
  (both tensor appearances contribute equal environments for real
  symmetric ``rho``/``h``, which only rescales the SVD update).
* One optimization sweep (ascend tower, warm fixed-point power
  iteration, descend tower, polar updates for every tensor) is ONE
  jitted program with static shapes; the host only counts sweeps.

Validated on the critical transverse-field Ising chain: variational
energy against the exact ``-4/pi`` and scaling dimensions against the
Ising CFT tower (0, 1/8, 1, ...), extracted from the one-site scaling
superoperator of the scale-invariant isometry (the center slot of
``w`` is the one untouched by disentanglers).  The reference has no
renormalization-group capability of any kind.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import dot_precision


# --------------------------------------------------------------------- #
# Superoperators
# --------------------------------------------------------------------- #


def _ascend(h4, u, w, prec):
    """One-layer ascent of a per-site two-site term.

    ``h4 (m,m,m,m)`` as ``[out1, out2, in1, in2]``; ``u (m,m,m,m)`` as
    ``[pre1, pre2, post1, post2]`` (the ket reads ``u[p,q,r,s]`` with
    ``(p,q)`` feeding the isometry slots and ``(r,s)`` the physical
    pair); ``w (M, m, m, m)`` maps the coarse index to the block's
    three fine slots.  Returns the coarse ``(M,M,M,M)`` term.
    """
    a_l = jnp.einsum(
        "cxyp,dqmn,pqrs,tesm,PQrt,CxyP,DQen->CDcd",
        w, w, u, h4, u, w, w, precision=prec)
    a_c = jnp.einsum(
        "cqyk,dlzw,klrs,RSrs,KLRS,CqyK,DLzw->CDcd",
        w, w, u, h4, u, w, w, precision=prec)
    a_r = jnp.einsum(
        "cqmk,dlzw,klrs,MRmr,KLRs,CqMK,DLzw->CDcd",
        w, w, u, h4, u, w, w, precision=prec)
    return a_l + a_c + a_r


def _descend(rho4, u, w, prec):
    """Average two-site density one layer down: ``(1/3) A^T(rho)``.

    Obtained as the linear transpose of :func:`_ascend` — for real
    symmetric ``rho`` the element pairing equals the trace pairing, so
    ``Tr(_descend(rho) h) = (1/3) Tr(rho _ascend(h))`` by construction.
    """
    m = u.shape[0]
    example = jax.ShapeDtypeStruct((m, m, m, m), rho4.dtype)
    (out,) = jax.linear_transpose(
        lambda h: _ascend(h, u, w, prec), example)(rho4)
    return out / 3.0


def _fixed_density(u, w, prec, iters):
    """Fixed point of the scale-invariant descent (power iteration,
    symmetrized and trace-normalized each step)."""
    chi = w.shape[0]
    # [o1,o2,i1,i2]: reshaped identity is already delta_oi delta_oi.
    rho = jnp.eye(chi * chi, dtype=w.dtype).reshape(
        chi, chi, chi, chi) / (chi * chi)

    def body(_, rho):
        rho = _descend(rho, u, w, prec)
        mat = rho.reshape(chi * chi, chi * chi)
        mat = 0.5 * (mat + mat.T)
        rho = mat.reshape(chi, chi, chi, chi)
        tr = jnp.einsum("abab->", rho, precision=prec)
        return rho / tr

    return jax.lax.fori_loop(0, iters, body, rho)


def _trace_pair(rho4, h4, prec):
    """``Tr(rho h)`` for two-site operators in ``[o1,o2,i1,i2]``."""
    return jnp.einsum("abcd,cdab->", rho4, h4, precision=prec)


# --------------------------------------------------------------------- #
# Energy
# --------------------------------------------------------------------- #


def _split4(mat, m):
    return jnp.asarray(mat).reshape(m, m, m, m)


def mera_energy(params, h2, rho_iters=80):
    """Variational energy per site of ``H = sum_i h2_{i,i+1}``."""
    h2 = jnp.asarray(h2, params["w_s"].dtype)
    prec = dot_precision(h2.dtype)
    m = int(np.sqrt(h2.shape[0]))
    h = _split4(h2, m)
    for u, w in zip(params["u"], params["w"]):
        h = _ascend(h, u, w, prec)
    rho = _fixed_density(params["u_s"], params["w_s"], prec, rho_iters)
    n_layers = len(params["u"])
    return float(_trace_pair(rho, h, prec)) / 3 ** n_layers


# --------------------------------------------------------------------- #
# Evenbly-Vidal optimization
# --------------------------------------------------------------------- #


def _polar_update(env, out_rows):
    """Minimizer of ``Tr(X Env)`` over isometries with orthonormal rows
    in the ``(out_rows, -1)`` matricization: ``X = -U V^T``."""
    shape = env.shape
    mat = env.reshape(out_rows, -1)
    uu, _, vv = jnp.linalg.svd(mat, full_matrices=False)
    prec = dot_precision(env.dtype)
    return -jnp.matmul(uu, vv, precision=prec).reshape(shape)


def _layer_energy(u, w, rho_up, h_dn, prec):
    return _trace_pair(jax.lax.stop_gradient(rho_up),
                       _ascend(jax.lax.stop_gradient(h_dn), u, w, prec),
                       prec)


def _update_layer(u, w, rho_up, h_dn, prec):
    """One Evenbly-Vidal update of ``(u, w)`` against fixed
    ``rho`` above and ``h`` below (environments by autodiff)."""
    m = u.shape[0]
    env_u = jax.grad(lambda x: _layer_energy(x, w, rho_up, h_dn, prec))(u)
    u = _polar_update(env_u, m * m)
    env_w = jax.grad(lambda x: _layer_energy(u, x, rho_up, h_dn, prec))(w)
    w = _polar_update(env_w, w.shape[0])
    return u, w


def _si_hamiltonian(h, u_s, w_s, prec, k_acc):
    """Scale-invariant accumulated Hamiltonian
    ``sum_k A_s^k(h) / 3^k`` (geometric tower of the deeper layers)."""
    out = h
    term = h
    for _ in range(k_acc):
        term = _ascend(term, u_s, w_s, prec) / 3.0
        out = out + term
    return out


def _make_sweep(n_layers, k_acc, rho_warm):
    def sweep(params, h0, rho):
        prec = dot_precision(h0.dtype)
        # Up: ascended Hamiltonians under each transitional layer.
        hs = [h0]
        for u, w in zip(params["u"], params["w"]):
            hs.append(_ascend(hs[-1], u, w, prec))
        # Warm fixed point at the top.
        def body(_, r):
            r = _descend(r, params["u_s"], params["w_s"], prec)
            chi = r.shape[0]
            mat = r.reshape(chi * chi, chi * chi)
            mat = 0.5 * (mat + mat.T)
            r = mat.reshape(r.shape)
            return r / jnp.einsum("abab->", r, precision=prec)
        rho = jax.lax.fori_loop(0, rho_warm, body, rho)
        # Scale-invariant update against the accumulated Hamiltonian.
        h_acc = _si_hamiltonian(hs[-1], params["u_s"], params["w_s"],
                                prec, k_acc)
        u_s, w_s = _update_layer(params["u_s"], params["w_s"],
                                 rho, h_acc, prec)
        # Down: densities for each transitional layer, updating as we go.
        new_u, new_w = list(params["u"]), list(params["w"])
        rho_l = rho
        for l in range(n_layers - 1, -1, -1):
            new_u[l], new_w[l] = _update_layer(
                new_u[l], new_w[l], rho_l, hs[l], prec)
            rho_l = _descend(rho_l, new_u[l], new_w[l], prec)
        out = {"u": new_u, "w": new_w, "u_s": u_s, "w_s": w_s}
        energy = _trace_pair(rho, hs[-1], prec) / 3 ** n_layers
        return out, rho, energy

    return sweep


def _random_isometry(key, out_dim, in_dim, dtype):
    mat = jax.random.normal(key, (in_dim, out_dim), dtype)
    q, _ = jnp.linalg.qr(mat)
    return q.T  # (out, in) with orthonormal rows


def mera_ground_state(h2, chi, d=2, sweeps=800, rho_iters=20,
                      k_acc=8, dtype=jnp.float64, key=None, init=None):
    """Optimize a scale-invariant ternary MERA for the infinite chain.

    Args:
        h2: Hermitian (real symmetric) two-site term ``(d^2, d^2)``
            (e.g. :func:`~contractn_tpu.models.itebd.tfim_h2`).
        chi: bond dimension of the scale-invariant layer.  Two
            transitional layers lift ``d -> min(d^3, chi) -> chi``.
        sweeps: Evenbly-Vidal sweeps (each updates every tensor once).
        rho_iters: warm power-iteration steps per sweep for ``rho*``.
        k_acc: terms kept in the scale-invariant Hamiltonian tower.
        init: warm-start params (e.g. from :func:`expand_mera` for a
            chi ramp); must already have this ``chi``.

    Returns:
        ``(params, energy)``; ``params`` holds transitional ``u``/``w``
        lists plus the scale-invariant ``u_s``/``w_s``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    h2 = np.asarray(h2)
    # Negative-definite shift: polar updates minimize only when the
    # ascended Hamiltonian is <= 0; the shift is added back at the end
    # (A(I) = 3 I keeps the bookkeeping a plain per-site constant).
    lam = float(np.linalg.eigvalsh(h2)[-1])
    h0 = _split4(jnp.asarray(h2 - lam * np.eye(h2.shape[0]), dtype), d)

    chi1 = min(d ** 3, chi)
    if chi > chi1 ** 3:
        raise ValueError(f"chi {chi} unreachable from d {d} in two layers")
    keys = jax.random.split(key, 3)
    eye_u = jnp.eye(d * d, dtype=dtype).reshape(d, d, d, d)
    params = {
        "u": [eye_u,
              jnp.eye(chi1 * chi1, dtype=dtype).reshape(chi1, chi1, chi1, chi1)],
        "w": [_random_isometry(keys[0], chi1, d ** 3, dtype
                               ).reshape(chi1, d, d, d),
              _random_isometry(keys[1], chi, chi1 ** 3, dtype
                               ).reshape(chi, chi1, chi1, chi1)],
        "u_s": jnp.eye(chi * chi, dtype=dtype).reshape(chi, chi, chi, chi),
        "w_s": _random_isometry(keys[2], chi, chi ** 3, dtype
                                ).reshape(chi, chi, chi, chi),
    }
    if init is not None:
        if init["w_s"].shape[0] != chi:
            raise ValueError("init params have chi "
                             f"{init['w_s'].shape[0]}, expected {chi}")
        params = init
    prec = dot_precision(h0.dtype)
    rho = _fixed_density(params["u_s"], params["w_s"], prec, 100)
    sweep = _make_sweep(len(params["u"]), k_acc, rho_iters)

    # The whole optimization is ONE jitted scan over sweeps: each sweep
    # is ~10^2 small contractions, so at small chi the host dispatch
    # would dominate by an order of magnitude (measured 11 ms/sweep
    # dispatched vs ~1 ms inside scan at chi=4 on CPU).
    @jax.jit
    def run(params, rho, h0):
        def body(carry, _):
            params, rho = carry
            params, rho, energy = sweep(params, h0, rho)
            return (params, rho), energy

        (params, rho), energies = jax.lax.scan(
            body, (params, rho), None, length=sweeps)
        return params, rho, energies

    params, rho, energies = run(params, rho, h0)
    return params, float(energies[-1]) + lam


def _ascend_site_central(o, w, prec):
    """One-site ascent through the CENTER slot of ``w`` (the slot no
    disentangler touches): ``S(o)[a,b] = sum w[a,x,i,y] o[i,j]
    w[b,x,j,y]`` — the one-site scaling superoperator."""
    return jnp.einsum("axiy,ij,bxjy->ab", w, o, w, precision=prec)


def _rho_one_site(rho4, prec):
    """Average one-site density from the two-site one."""
    return 0.5 * (jnp.einsum("abcb->ac", rho4, precision=prec)
                  + jnp.einsum("abad->bd", rho4, precision=prec))


def mera_site_expectation(params, op, rho_iters=80):
    """One-site expectation ``<op>`` in the MERA state (the operator
    sits on a block-central site; by translation averaging of the
    fixed-point density this is the uniform one-site expectation)."""
    prec = dot_precision(params["w_s"].dtype)
    op = jnp.asarray(op, params["w_s"].dtype)
    for _, w in zip(params["u"], params["w"]):
        op = _ascend_site_central(op, w, prec)
    rho = _fixed_density(params["u_s"], params["w_s"], prec, rho_iters)
    rho1 = _rho_one_site(rho, prec)
    return float(jnp.einsum("ab,ba->", rho1, op, precision=prec))


def mera_correlator(params, op, kmax=6, rho_iters=80):
    """Two-point correlators ``<op(x) op(x + 3^k)>`` for ``k >= L``.

    Sites central in their block at every level ascend through the
    one-site scaling superoperator alone; two such sites ``3^k`` apart
    land on ADJACENT coarse sites after ``k`` layers, where the
    scale-invariant two-site density evaluates them.  At a critical
    point the decay follows ``r^(-2 Delta)`` with ``Delta`` the
    operator's leading scaling dimension — the ratio
    ``C(3^(k+1))/C(3^k) -> 3^(-2 Delta)``.

    Returns ``(distances, values)`` for ``k = L .. kmax`` (``L`` =
    number of transitional layers).
    """
    prec = dot_precision(params["w_s"].dtype)
    op = jnp.asarray(op, params["w_s"].dtype)
    for _, w in zip(params["u"], params["w"]):
        op = _ascend_site_central(op, w, prec)
    rho = _fixed_density(params["u_s"], params["w_s"], prec, rho_iters)
    rho1 = _rho_one_site(rho, prec)
    n_layers = len(params["u"])

    def connected(o):
        # Project out the identity channel (lambda = 1): finite-chi
        # optimization breaks symmetries slightly, and any identity
        # component acquired below rides up unchanged (S(I) = I) and
        # would eventually dominate every power-law channel.
        return o - jnp.einsum("ab,ba->", rho1, o, precision=prec) \
            * jnp.eye(o.shape[0], dtype=o.dtype)

    op = connected(op)
    dists, vals = [], []
    for k in range(n_layers, kmax + 1):
        if k > n_layers:
            op = connected(
                _ascend_site_central(op, params["w_s"], prec))
        val = jnp.einsum("abcd,ca,db->", rho, op, op, precision=prec)
        dists.append(3 ** k)
        vals.append(float(val))
    return np.asarray(dists), np.asarray(vals)


def _embed_unitary(u, m_new):
    """Embed a unitary ``(m,m,m,m)`` into ``(m',m',m',m')``: the old
    block acts on the old product subspace, identity on its complement
    (a direct-sum decomposition of the product basis, so unitarity is
    exact)."""
    m = u.shape[0]
    if m == m_new:
        return u
    big = jnp.eye(m_new * m_new, dtype=u.dtype).reshape(
        m_new, m_new, m_new, m_new)
    return big.at[:m, :m, :m, :m].set(u)


def _embed_isometry(w, out_new, in_new_dims, key):
    """Embed an isometry ``(out, i1, i2, i3)`` into larger fine/coarse
    dimensions: old rows zero-pad (still orthonormal); new coarse rows
    are random vectors orthonormalized against them."""
    out_old = w.shape[0]
    in_new = int(np.prod(in_new_dims))
    old = jnp.zeros((out_old, *in_new_dims), w.dtype)
    old = old.at[:, :w.shape[1], :w.shape[2], :w.shape[3]].set(w)
    old = old.reshape(out_old, in_new)
    if out_new == out_old:
        return old.reshape(out_old, *in_new_dims)
    extra = jax.random.normal(key, (out_new - out_old, in_new), w.dtype)
    # Project out the old rows, then orthonormalize the remainder.
    extra = extra - jnp.matmul(
        jnp.matmul(extra, old.T, precision=jax.lax.Precision.HIGHEST),
        old, precision=jax.lax.Precision.HIGHEST)
    q, _ = jnp.linalg.qr(extra.T)
    return jnp.concatenate([old, q.T], axis=0).reshape(
        out_new, *in_new_dims)


def expand_mera(params, chi, d=2, key=None):
    """Warm-start a larger-``chi`` MERA from a converged smaller one.

    Evenbly-Vidal from a cold random start at larger ``chi`` routinely
    lands in basins missing part of the CFT spectrum (measured: chi=6
    cold loses the sigma tower entirely while chi=4 finds it); ramping
    chi through embedded warm starts is the standard cure.  The
    embedding is exact: the enlarged MERA represents the same state.
    """
    if key is None:
        key = jax.random.PRNGKey(17)
    chi1_old = params["w"][0].shape[0]
    chi1 = min(d ** 3, chi)
    k1, k2, k3 = jax.random.split(key, 3)
    u0 = params["u"][0]
    w0 = _embed_isometry(params["w"][0], chi1, (d, d, d), k1)
    u1 = _embed_unitary(params["u"][1], chi1)
    w1 = _embed_isometry(params["w"][1], chi, (chi1, chi1, chi1), k2)
    u_s = _embed_unitary(params["u_s"], chi)
    w_s = _embed_isometry(params["w_s"], chi, (chi, chi, chi), k3)
    del chi1_old
    return {"u": [u0, u1], "w": [w0, w1], "u_s": u_s, "w_s": w_s}


def scaling_dimensions(params, n=8):
    """Scaling dimensions from the scale-invariant isometry.

    The one-site scaling superoperator places the operator on the
    center slot of ``w_s`` (the slot no disentangler touches):
    ``S[(a,b),(c,d)] = sum_{x,y} w[a,x,c,y] w[b,x,d,y]``; dimensions
    are ``-log_3`` of its leading eigenvalues (identity -> exactly 0).
    """
    w = np.asarray(params["w_s"])
    s = np.einsum("axcy,bxdy->abcd", w, w)
    chi = w.shape[0]
    vals = np.linalg.eigvals(s.reshape(chi * chi, chi * chi))
    vals = np.sort(np.abs(vals))[::-1][:n]
    return -np.log(np.maximum(vals, 1e-300)) / np.log(3.0)
