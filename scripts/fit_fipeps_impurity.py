"""Value-level validation of the fermionized double-layer rule, and
GF(2) fit of the NN two-site impurity sign rules (horizontal and
vertical bond terms) for fermionic iPEPS.

Stage 1: the norm of random parity-even fPEPS computed by DENSE
contraction of the fermionized double-tensor network (the rule found
by fit_fipeps_signs.py) must equal models.fswap.fpeps_norm_sweep.

Stage 2: for a two-fermion NN term ``O_a (JW string) O_b`` the
fermionized network is the same E-network with the two site tensors
op-modified PLUS extra local sign factors h_a/h_b in the leg parities
at the two sites; fit those over GF(2) against the exact finite
bookkeeping (string signs + JW Z-factors on the row-major interval),
shared over positions/shapes, then validate against the dense Fock
oracle on random states.

Run: PYTHONPATH=/root/repo python scripts/fit_fipeps_impurity.py
"""

import numpy as np

from contractn_tpu.models.fswap import (
    absorb_site_signs,
    fpeps_expectation_dense,
    fpeps_norm_sweep,
    random_fpeps,
)
from fit_fipeps_signs import (
    FEATS,
    feature_row,
    gf2_solve,
    random_loop,
    site_legs,
    string_S,
)

# the fitted norm rule: exponent per site over (u,l,d,r,U,L,D,R)
NORM_RULE = ["u", "uU", "ld", "lU", "dU", "dL", "UL", "UD"]


def rule_vec(names):
    x = np.zeros(len(FEATS), np.int64)
    for n in names:
        x[FEATS.index(n)] = 1
    return x


NORM_X = rule_vec(NORM_RULE)


def legpar(ly, lx, r, c, ph_vec, pv_vec):
    triv = np.zeros((1,), np.int64)
    pu = pv_vec[(r - 1, c)] if r > 0 else triv
    pl = ph_vec[(r, c - 1)] if c > 0 else triv
    pd = pv_vec[(r, c)] if r < ly - 1 else triv
    pr = ph_vec[(r, c)] if c < lx - 1 else triv
    return (pu, pl, pd, pr)


def sign_site(pars, x=NORM_X):
    """(-1)^{rule} array over (u,l,d,r,U,L,D,R) parity vectors."""
    pu, pl, pd, pr = [np.asarray(p, np.int64) for p in pars]
    legs = [pu, pl, pd, pr, pu, pl, pd, pr]
    grids = np.meshgrid(*legs, indexing="ij")
    e = np.zeros_like(grids[0])
    k = 8
    for i in range(8):
        if x[i]:
            e = e + grids[i]
    for i in range(8):
        for j in range(i + 1, 8):
            if x[k]:
                e = e + grids[i] * grids[j]
            k += 1
    return (-1.0) ** (e % 2)


def double_tensor(a, pars, op=None, extra_x=None):
    """Fermionized double tensor E[(uU),(lL),(dD),(rR)]."""
    aa = absorb_site_signs(a, pars)
    if op is None:
        e = np.einsum("nuldr,nULDR->uULLdDrR".replace("LL", "lL"),
                      aa, np.conj(aa))
    else:
        e = np.einsum("nuldr,nm,mULDR->uULLdDrR".replace("LL", "lL"),
                      aa, np.asarray(op), np.conj(aa))
    x = NORM_X if extra_x is None else (NORM_X ^ extra_x)
    sgn = sign_site(pars, x)  # (u,l,d,r,U,L,D,R)
    sgn = np.transpose(sgn, (0, 4, 1, 5, 2, 6, 3, 7))
    e = np.transpose(e, (0, 1, 2, 3, 4, 5, 6, 7)) * sgn
    s = a.shape
    return e.reshape(s[1] ** 2, s[2] ** 2, s[3] ** 2, s[4] ** 2)


def dense_net(es):
    """Contract a small grid of (u2,l2,d2,r2) tensors exactly (row by
    row, merging all columns dense — validation scale only)."""
    ly, lx = len(es), len(es[0])
    bnd = None  # (d_0, ..., d_{lx-1})
    for r in range(ly):
        row = None
        for c in range(lx):
            t = es[r][c]  # u,l,d,r
            if row is None:
                row = True
                acc = t[:, 0]  # (u, d, r); left boundary leg trivial
                ups = [t.shape[0]]
                dns = [t.shape[2]]
                continue
            acc = np.tensordot(acc, t, axes=([-1], [1]))
            # acc: (u_0..c-1, d_0..c-1, u_c, d_c, r)
            nl = len(ups)
            perm = (list(range(nl)) + [2 * nl]
                    + list(range(nl, 2 * nl)) + [2 * nl + 1, 2 * nl + 2])
            acc = np.transpose(acc, perm)
            ups.append(t.shape[0])
            dns.append(t.shape[2])
        acc = acc[..., 0]  # right boundary trivial
        # acc: (u_0..lx-1, d_0..lx-1)
        if bnd is None:
            bnd = acc[(0,) * lx]  # top boundary legs trivial
        else:
            bnd = np.tensordot(bnd, acc, axes=(list(range(lx)),
                                               list(range(lx))))
    return bnd.reshape(())


def stage1():
    print("stage 1: norm rule value-level validation")
    for (ly, lx, bp, seed) in [
        (2, 2, (0, 1), 0), (2, 3, (0, 1), 1), (3, 2, (0, 1), 2),
        (3, 3, (0, 1), 3), (2, 3, (0, 1, 1), 4), (3, 2, (0, 1, 0), 5),
        (2, 2, (0, 0, 1, 1), 6),
    ]:
        tn, ph, pv = random_fpeps(ly, lx, bond_parities=bp, seed=seed)
        es = [[double_tensor(tn[r][c],
                             legpar(ly, lx, r, c, ph, pv))
               for c in range(lx)] for r in range(ly)]
        got = float(dense_net(es))
        want = float(fpeps_norm_sweep(tn, ph, pv))
        ok = abs(got - want) < 1e-10 * max(1.0, abs(want))
        print(f"  {ly}x{lx} bp={bp}: got={got:.10g} want={want:.10g} "
              f"{'OK' if ok else 'FAIL'}")


# ------------------------------------------------------------------ #
# Stage 2: impurity-pair sign fits
# ------------------------------------------------------------------ #


def random_defect_config(ly, lx, a, b, rng):
    """(qh,qv,bh,bv) with Q = q ^ q' a random chain from a to b (plus
    random cycles): flip a fixed path a->b then XOR random loops."""
    qh = rng.integers(0, 2, (ly, lx - 1))
    qv = rng.integers(0, 2, (ly - 1, lx))
    dh = np.zeros((ly, lx - 1), np.int64)
    dv = np.zeros((ly - 1, lx), np.int64)
    (ra, ca), (rb, cb) = a, b
    # walk column then row
    r, c = ra, ca
    while r != rb:
        step = 1 if rb > r else -1
        dv[min(r, r + step), c] ^= 1
        r += step
    while c != cb:
        step = 1 if cb > c else -1
        dh[r, min(c, c + step)] ^= 1
        c += step
    lh, lv = random_loop(ly, lx, rng)
    bh, bv = qh ^ dh ^ lh, qv ^ dv ^ lv
    return qh, qv, bh, bv


def ket_site_parity(ly, lx, r, c, qh, qv):
    s = site_legs(ly, lx, r, c, qh, qv, qh, qv)
    return int(s[:4].sum() % 2)


def jw_interval(ly, lx, a, b):
    (ra, ca), (rb, cb) = a, b
    m, n = ra * lx + ca, rb * lx + cb
    assert m < n
    return [(k // lx, k % lx) for k in range(m + 1, n)]


def impurity_target(ly, lx, a, b, qh, qv, bh, bv):
    """Exact exponent: string signs of both layers + JW Z factors on
    the row-major interval (ket side), MINUS the norm-rule site sum."""
    t = (string_S(ly, lx, qv) + string_S(ly, lx, bv)) % 2
    for (r, c) in jw_interval(ly, lx, a, b):
        t ^= ket_site_parity(ly, lx, r, c, qh, qv)
    t ^= int(feature_row(ly, lx, qh, qv, bh, bv) @ NORM_X % 2)
    return t


def site_feature_vec(ly, lx, r, c, qh, qv, bh, bv):
    s = site_legs(ly, lx, r, c, qh, qv, bh, bv)
    row = np.zeros(len(FEATS), np.int64)
    row[:8] = s
    k = 8
    for i in range(8):
        for j in range(i + 1, 8):
            row[k] = s[i] & s[j]
            k += 1
    return row


def fit_pair(kind):
    """kind: 'h' (b = right neighbor) or 'v' (b = below)."""
    rng = np.random.default_rng(7)
    rows, ts = [], []
    shapes = [(2, 2), (2, 3), (3, 2), (3, 3), (3, 4), (4, 3), (4, 4)]
    for (ly, lx) in shapes:
        sites = [(r, c) for r in range(ly) for c in range(lx)]
        for (r, c) in sites:
            if kind == "h":
                if c + 1 >= lx:
                    continue
                b = (r, c + 1)
            else:
                if r + 1 >= ly:
                    continue
                b = (r + 1, c)
            a = (r, c)
            for _ in range(60):
                qh, qv, bh, bv = random_defect_config(ly, lx, a, b, rng)
                fa = site_feature_vec(ly, lx, *a, qh, qv, bh, bv)
                fb = site_feature_vec(ly, lx, *b, qh, qv, bh, bv)
                rows.append(np.concatenate([fa, fb]))
                ts.append(impurity_target(ly, lx, a, b, qh, qv, bh, bv))
    A = np.array(rows)
    t = np.array(ts)
    x, piv = gf2_solve(A, t)
    if x is None:
        print(f"pair kind={kind}: INCONSISTENT in 2-site basis")
        return None
    names_a = [FEATS[i] for i in range(36) if x[i]]
    names_b = [FEATS[i - 36] for i in range(36, 72) if x[i]]
    print(f"pair kind={kind}: site-a feats {names_a}; "
          f"site-b feats {names_b}")
    # holdout
    bad = 0
    for (ly, lx) in [(4, 5), (5, 4), (5, 5)]:
        for _ in range(300):
            r = rng.integers(0, ly - (kind == "v") - 0)
            c = rng.integers(0, lx - (kind == "h") - 0)
            if kind == "h":
                if c + 1 >= lx:
                    continue
                a, b = (r, c), (r, c + 1)
            else:
                if r + 1 >= ly:
                    continue
                a, b = (r, c), (r + 1, c)
            qh, qv, bh, bv = random_defect_config(ly, lx, a, b, rng)
            fa = site_feature_vec(ly, lx, *a, qh, qv, bh, bv)
            fb = site_feature_vec(ly, lx, *b, qh, qv, bh, bv)
            pred = int((fa @ x[:36] + fb @ x[36:]) % 2)
            if pred != impurity_target(ly, lx, a, b, qh, qv, bh, bv):
                bad += 1
    print(f"  holdout mismatches: {bad}")
    return x


def stage2():
    print("stage 2: impurity-pair fits")
    xh = fit_pair("h")
    xv = fit_pair("v")
    if xh is None or xv is None:
        return
    # value-level check vs Fock oracle: <c^d_a c_b + h.c.> on random
    # states (this module's basis: S- = [[0,0],[1,0]] creates? see
    # fswap._jw_string_ops: sp creates |0>->|1>)
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])
    sm = sp.T
    for kind, x in (("h", xh), ("v", xv)):
        for (ly, lx, seed) in [(2, 2, 0), (2, 3, 1), (3, 3, 2)]:
            if kind == "h":
                a, b = (0, 0), (0, 1)
            elif lx > 1:
                a, b = (0, 1), (1, 1)  # off-column: exercises the JW
            else:
                a, b = (0, 0), (1, 0)
            tn, ph, pv = random_fpeps(ly, lx, seed=seed)
            es = [[double_tensor(tn[r][c],
                                 legpar(ly, lx, r, c, ph, pv))
                   for c in range(lx)] for r in range(ly)]
            # numerator with op pair sp_a sm_b (c^d_a c_b)
            za = double_tensor(tn[a[0]][a[1]],
                               legpar(ly, lx, *a, ph, pv), op=sp,
                               extra_x=x[:36])
            zb = double_tensor(tn[b[0]][b[1]],
                               legpar(ly, lx, *b, ph, pv), op=sm,
                               extra_x=x[36:])
            es_mod = [[za if (r, c) == a else
                       zb if (r, c) == b else es[r][c]
                       for c in range(lx)] for r in range(ly)]
            # JW interval Z insertions (ket side parity) are NOT needed
            # in the fermionized net: the fitted rule absorbed them.
            num = float(dense_net(es_mod))
            den = float(dense_net(es))
            got = num / den

            # Fock oracle
            nsite = ly * lx
            z = np.diag([1.0, -1.0])

            def op_at(mats):
                m = np.eye(1)
                for k in range(nsite):
                    m = np.kron(m, mats.get(k, np.eye(2)))
                return m

            m_, n_ = a[0] * lx + a[1], b[0] * lx + b[1]
            ops = {m_: sp, n_: sm}
            for k in range(m_ + 1, n_):
                ops[k] = z
            want = float(np.real(fpeps_expectation_dense(
                tn, ph, pv, op_at(ops))))
            ok = abs(got - want) < 1e-10 * max(1.0, abs(want))
            print(f"  kind={kind} {ly}x{lx} <c^d_a c_b>: got={got:.8g}"
                  f" want={want:.8g} {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    stage1()
    stage2()
