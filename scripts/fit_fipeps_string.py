"""GF(2) fit of the LONG-RANGE string sign rules for fermionic iPEPS
correlators.

Extends ``fit_fipeps_impurity.py`` (nearest-neighbor pairs) to
distance-r two-point functions ``<c^d_a  string  c_b>``:

* same-row pairs: the row-major JW interval IS the lattice row path,
  so the operator needs no extra string choice.  Fit three shared
  site classes — endpoint a, interior path site, endpoint b.
* same-column pairs: the physical operator is defined with the COLUMN
  path string ``c^d_a (prod_path P) c_b`` (the row-major JW matrices
  of the endpoints contribute parities over whole intervening rows;
  the explicit path parities cancel them ON the path, leaving
  off-path factors).  Fit FOUR classes — endpoints, path-interior,
  interval-off-path.  The thermodynamic-limit correlator exists as a
  column-local network object iff the off-path class fits to ZERO on
  the Gauss surface.

Run: PYTHONPATH=/root/repo python scripts/fit_fipeps_string.py
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from fit_fipeps_impurity import (  # noqa: E402
    FEATS,
    NORM_X,
    dense_net,
    double_tensor,
    impurity_target,
    jw_interval,
    ket_site_parity,
    legpar,
    random_defect_config,
    site_feature_vec,
)
from fit_fipeps_signs import gf2_solve, string_S  # noqa: E402
from contractn_tpu.models.fswap import (  # noqa: E402
    fpeps_expectation_dense,
    random_fpeps,
)
from fit_fipeps_signs import feature_row  # noqa: E402

NF = len(FEATS)


def string_target(ly, lx, a, b, path_sites, qh, qv, bh, bv):
    """Exact exponent for ``c^d_a (prod over path P) c_b``: both
    layers' string signs + ket parities over the row-major JW interval
    + ket parities over the explicit path insertions − norm rule."""
    t = (string_S(ly, lx, qv) + string_S(ly, lx, bv)) % 2
    for (r, c) in jw_interval(ly, lx, a, b):
        t ^= ket_site_parity(ly, lx, r, c, qh, qv)
    for (r, c) in path_sites:
        t ^= ket_site_parity(ly, lx, r, c, qh, qv)
    t ^= int(feature_row(ly, lx, qh, qv, bh, bv) @ NORM_X % 2)
    return t


def _solve_and_report(rows, ts, nclass, names):
    A = np.array(rows)
    t = np.array(ts)
    x, _ = gf2_solve(A, t)
    if x is None:
        print("  INCONSISTENT in the site-local basis")
        return None
    for k in range(nclass):
        feats = [FEATS[i] for i in range(NF) if x[k * NF + i]]
        print(f"  class {names[k]}: {feats}")
    return x


def fit_row_string():
    """Same-row pairs at distance >= 2 (row path == JW interval)."""
    print("fit: same-row string (classes: a, mid, b)")
    rng = np.random.default_rng(11)
    rows, ts = [], []
    for (ly, lx) in [(2, 4), (3, 4), (2, 5), (4, 4), (3, 5)]:
        for r in range(ly):
            for c in range(lx):
                for dist in range(2, lx - c):
                    a, b = (r, c), (r, c + dist)
                    mids = [(r, c + j) for j in range(1, dist)]
                    for _ in range(25):
                        qh, qv, bh, bv = random_defect_config(
                            ly, lx, a, b, rng)
                        fa = site_feature_vec(ly, lx, *a, qh, qv,
                                              bh, bv)
                        fb = site_feature_vec(ly, lx, *b, qh, qv,
                                              bh, bv)
                        fm = np.zeros(NF, np.int64)
                        for m in mids:
                            fm ^= site_feature_vec(ly, lx, *m, qh, qv,
                                                   bh, bv)
                        rows.append(np.concatenate([fa, fm, fb]))
                        ts.append(impurity_target(ly, lx, a, b, qh,
                                                  qv, bh, bv))
    x = _solve_and_report(rows, ts, 3, ["a", "mid", "b"])
    if x is None:
        return None
    # holdout
    rng2 = np.random.default_rng(5)
    bad = tot = 0
    for (ly, lx) in [(4, 6), (5, 5), (2, 7)]:
        for _ in range(200):
            r = int(rng2.integers(0, ly))
            c = int(rng2.integers(0, lx - 2))
            dist = int(rng2.integers(2, lx - c))
            a, b = (r, c), (r, c + dist)
            mids = [(r, c + j) for j in range(1, dist)]
            qh, qv, bh, bv = random_defect_config(ly, lx, a, b, rng2)
            fa = site_feature_vec(ly, lx, *a, qh, qv, bh, bv)
            fb = site_feature_vec(ly, lx, *b, qh, qv, bh, bv)
            fm = np.zeros(NF, np.int64)
            for m in mids:
                fm ^= site_feature_vec(ly, lx, *m, qh, qv, bh, bv)
            pred = int((fa @ x[:NF] + fm @ x[NF:2 * NF]
                        + fb @ x[2 * NF:]) % 2)
            tot += 1
            if pred != impurity_target(ly, lx, a, b, qh, qv, bh, bv):
                bad += 1
    print(f"  holdout mismatches: {bad}/{tot}")
    return x


def fit_col_string():
    """Same-column pairs at distance >= 2, COLUMN path string."""
    print("fit: same-column string (classes: a, path, offpath, b)")
    rng = np.random.default_rng(13)
    rows, ts = [], []
    for (ly, lx) in [(4, 2), (4, 3), (5, 2), (4, 4), (5, 3)]:
        for r in range(ly - 2):
            for c in range(lx):
                for dist in range(2, ly - r):
                    a, b = (r, c), (r + dist, c)
                    path = [(r + j, c) for j in range(1, dist)]
                    off = [s for s in jw_interval(ly, lx, a, b)
                           if s not in path]
                    for _ in range(25):
                        qh, qv, bh, bv = random_defect_config(
                            ly, lx, a, b, rng)
                        fa = site_feature_vec(ly, lx, *a, qh, qv,
                                              bh, bv)
                        fb = site_feature_vec(ly, lx, *b, qh, qv,
                                              bh, bv)
                        fp = np.zeros(NF, np.int64)
                        for m in path:
                            fp ^= site_feature_vec(ly, lx, *m, qh, qv,
                                                   bh, bv)
                        fo = np.zeros(NF, np.int64)
                        for m in off:
                            fo ^= site_feature_vec(ly, lx, *m, qh, qv,
                                                   bh, bv)
                        rows.append(np.concatenate([fa, fp, fo, fb]))
                        ts.append(string_target(ly, lx, a, b, path,
                                                qh, qv, bh, bv))
    x = _solve_and_report(rows, ts, 4, ["a", "path", "offpath", "b"])
    return x


def value_check_row(x):
    """Fermionized net with the fitted row-string rule == Fock oracle
    for <c^d_a (JW) c_b> at range 2 and 3 on random states."""
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])
    sm = sp.T
    z = np.diag([1.0, -1.0])
    for (ly, lx, dist, seed) in [(2, 3, 2, 0), (2, 4, 3, 1),
                                 (3, 4, 2, 2), (2, 4, 2, 3)]:
        a, b = (1 % ly, 0), (1 % ly, dist)
        tn, ph, pv = random_fpeps(ly, lx, seed=seed)
        es = [[double_tensor(tn[r][c], legpar(ly, lx, r, c, ph, pv))
               for c in range(lx)] for r in range(ly)]
        za = double_tensor(tn[a[0]][a[1]],
                           legpar(ly, lx, *a, ph, pv), op=sp,
                           extra_x=x[:NF])
        zb = double_tensor(tn[b[0]][b[1]],
                           legpar(ly, lx, *b, ph, pv), op=sm,
                           extra_x=x[2 * NF:])
        mids = {(a[0], a[1] + j): double_tensor(
            tn[a[0]][a[1] + j],
            legpar(ly, lx, a[0], a[1] + j, ph, pv),
            extra_x=x[NF:2 * NF]) for j in range(1, dist)}
        es_mod = [[za if (r, c) == a else zb if (r, c) == b
                   else mids.get((r, c), es[r][c])
                   for c in range(lx)] for r in range(ly)]
        got = float(dense_net(es_mod)) / float(dense_net(es))

        nsite = ly * lx

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
        print(f"  row {ly}x{lx} r={dist}: got={got:.8g} "
              f"want={want:.8g} {'OK' if ok else 'FAIL'}")


def value_check_col_collapsed():
    """The COLLAPSED column rule (off-path ['l','r'] telescoped onto
    the path: consecutive ``(-1)^{l+r}`` share a bond and cancel
    pairwise, leaving one 'r' at a, 'l'+'r' per path site, one 'l' at
    b, with only trivial boundary legs left over) == the Fock
    column-path oracle — NO off-path modification at all, so the rule
    is thermodynamic-limit ready."""
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])
    sm = sp.T
    z = np.diag([1.0, -1.0])

    def rule_x(names):
        v = np.zeros(NF, np.int64)
        for n in names:
            v[FEATS.index(n)] = 1
        return v

    xa = rule_x(["d", "R"])            # == V_TOP_EXTRA
    xp = rule_x(["u", "d", "r", "U", "L", "D"])
    xb = rule_x(["l", "d"])            # == V_BOT_EXTRA
    for (ly, lx, dist, c0, seed) in [(3, 2, 2, 1, 0), (4, 2, 3, 0, 1),
                                     (4, 3, 2, 1, 2), (3, 3, 2, 2, 3)]:
        a, b = (0, c0), (dist, c0)
        tn, ph, pv = random_fpeps(ly, lx, seed=seed)
        es = [[double_tensor(tn[r][c], legpar(ly, lx, r, c, ph, pv))
               for c in range(lx)] for r in range(ly)]
        za = double_tensor(tn[a[0]][a[1]],
                           legpar(ly, lx, *a, ph, pv), op=sp,
                           extra_x=xa)
        zb = double_tensor(tn[b[0]][b[1]],
                           legpar(ly, lx, *b, ph, pv), op=sm,
                           extra_x=xb)
        mids = {(j, c0): double_tensor(
            tn[j][c0], legpar(ly, lx, j, c0, ph, pv), extra_x=xp)
            for j in range(1, dist)}
        es_mod = [[za if (r, c) == a else zb if (r, c) == b
                   else mids.get((r, c), es[r][c])
                   for c in range(lx)] for r in range(ly)]
        got = float(dense_net(es_mod)) / float(dense_net(es))

        nsite = ly * lx

        def op_at(mats):
            m = np.eye(1)
            for k in range(nsite):
                m = np.kron(m, mats.get(k, np.eye(2)))
            return m

        m_, n_ = a[0] * lx + a[1], b[0] * lx + b[1]
        ops = {m_: sp, n_: sm}
        for k in range(m_ + 1, n_):
            ops[k] = z  # row-major JW interval of the endpoints
        mat = op_at(ops)
        # multiply by the explicit column-path parity insertions
        pth = {j * lx + c0: z for j in range(1, dist)}
        mat = mat @ op_at(pth)
        want = float(np.real(fpeps_expectation_dense(
            tn, ph, pv, mat)))
        ok = abs(got - want) < 1e-10 * max(1.0, abs(want))
        print(f"  col {ly}x{lx} r={dist} c0={c0}: got={got:.8g} "
              f"want={want:.8g} {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    xr = fit_row_string()
    if xr is not None:
        value_check_row(xr)
    fit_col_string()
    print("collapsed column rule value check")
    value_check_col_collapsed()
