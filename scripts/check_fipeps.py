"""Pre-test validation of models/fipeps.py.

(a) bdg_energy_2d vs dense Fock ED of the PERIODIC Hamiltonian on 4x3
    (k-sum on the discrete grid == ED per site, pinning every factor-2
    convention);
(b) stacked-chain anchors: fipeps on chains with trivial vertical
    (resp. horizontal) bonds == independent dense 1D transfer-matrix
    Kitaev-chain values.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python ...
"""

import numpy as np

SP = np.array([[0.0, 0.0], [1.0, 0.0]])
SM = SP.T
Z = np.diag([1.0, -1.0])
NOP = np.diag([0.0, 1.0])


def fock_periodic(ly, lx, t, mu, delta):
    n = ly * lx

    def op_at(mats):
        m = np.eye(1)
        for k in range(n):
            m = np.kron(m, mats.get(k, np.eye(2)))
        return m

    sm_full = np.array([[0.0, 1.0], [0.0, 0.0]])
    cs = [op_at({**{j: Z for j in range(i)}, i: sm_full})
          for i in range(n)]
    h = np.zeros((2 ** n, 2 ** n))
    for r in range(ly):
        for c in range(lx):
            i = r * lx + c
            h += -mu * (cs[i].T @ cs[i])
            for (r2, c2) in ((r, (c + 1) % lx), ((r + 1) % ly, c)):
                j = r2 * lx + c2
                h += -t * (cs[i].T @ cs[j] + cs[j].T @ cs[i])
                h += delta * (cs[i].T @ cs[j].T + cs[j] @ cs[i])
    return np.linalg.eigvalsh(h)[0] / n


def ksum_periodic(ly, lx, t, mu, delta):
    es = []
    for iy in range(ly):
        for ix in range(lx):
            kx = 2 * np.pi * ix / lx
            ky = 2 * np.pi * iy / ly
            eps = -2 * t * (np.cos(kx) + np.cos(ky)) - mu
            dk = 2 * delta * (np.sin(kx) + np.sin(ky))
            es.append((eps - np.sqrt(eps ** 2 + dk ** 2)) / 2)
    return float(np.mean(es))


def stage_a():
    print("(a) BdG k-sum vs periodic Fock ED (3x3)")
    for (t, mu, delta) in [(1.0, 0.5, 0.0), (1.0, -1.0, 0.7),
                           (0.7, 2.0, 1.2)]:
        want = fock_periodic(3, 3, t, mu, delta)
        got = ksum_periodic(3, 3, t, mu, delta)
        ok = abs(got - want) < 1e-9
        print(f"  t={t} mu={mu} d={delta}: ksum={got:.10f} "
              f"ED={want:.10f} {'OK' if ok else 'FAIL'}")


# ------------------------------------------------------------------ #
# (b) stacked-chain anchors
# ------------------------------------------------------------------ #


def chain_reference(m, bp, t, mu, delta):
    """Kitaev-chain per-site energy of the sign-dressed uMPS
    Mabs[n,l,r] = M (-1)^{p_l p_r}, by dense transfer fixed points."""
    bp = np.asarray(bp)
    mabs = m * ((-1.0) ** (bp[None, :, None] * bp[None, None, :]))
    dd = m.shape[1]

    def tmat(op):
        return np.einsum("nlr,nm,mLR->lLrR", mabs, op,
                         mabs).reshape(dd * dd, dd * dd)

    tt = tmat(np.eye(2))
    w, vr = np.linalg.eig(tt)
    i = np.argmax(np.abs(w))
    lam = w[i].real
    r = vr[:, i].real
    wl, vl = np.linalg.eig(tt.T)
    il = np.argmax(np.abs(wl))
    l_ = vl[:, il].real
    nrm = l_ @ r

    def one(op):
        return (l_ @ tmat(op) @ r) / (lam * nrm)

    def two(o1, o2):
        return (l_ @ tmat(o1) @ tmat(o2) @ r) / (lam ** 2 * nrm)

    dens = one(NOP)
    hop = two(SP, SM) + two(SM, SP)
    pair = two(SP, SP) + two(SM, SM)
    return -t * hop + delta * pair - mu * dens, dens


def stage_b():
    import jax.numpy as jnp

    from contractn_tpu.models.fipeps import fipeps_energy

    print("(b) stacked-chain anchors")
    rng = np.random.default_rng(3)
    bp = np.array([0, 1])
    d = 2
    # parity-even chain tensor, product-dominant (short xi)
    m = 0.35 * rng.standard_normal((d, 2, 2))
    for n in range(d):
        for l_ in range(2):
            for r in range(2):
                if (n + bp[l_] + bp[r]) % 2:
                    m[n, l_, r] = 0.0
    m[0, 0, 0] += 1.0
    t, mu, delta = 1.0, 0.4, 0.6
    want_e, want_n = chain_reference(m, bp, t, mu, delta)

    triv = np.zeros(1, np.int64)
    # horizontal chains: (d, u=1, l, d=1, r)
    a_h = m[:, None, :, None, :]
    pars_h = (triv, bp, triv, bp)
    got_e, got_n = fipeps_energy(jnp.asarray(a_h), pars_h, chi=8,
                                 t=t, mu=mu, delta=delta, iters=40)
    print(f"  horizontal: E={got_e:.10f} want={want_e:.10f} "
          f"n={got_n:.8f} want={want_n:.8f}")

    # vertical chains: (d, u=l?, ...) -> (d, u, l=1, d, r=1)
    a_v = m[:, :, None, :, None]
    pars_v = (bp, triv, bp, triv)
    got_e, got_n = fipeps_energy(jnp.asarray(a_v), pars_v, chi=8,
                                 t=t, mu=mu, delta=delta, iters=40)
    print(f"  vertical:   E={got_e:.10f} want={want_e:.10f} "
          f"n={got_n:.8f} want={want_n:.8f}")


if __name__ == "__main__":
    import sys
    stage_a()
    sys.stdout.flush()
    stage_b()
