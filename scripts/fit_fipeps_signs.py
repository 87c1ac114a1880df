"""Fit the LOCAL double-layer sign rule that fermionizes the fPEPS
norm network (the infinite-PEPS enabler).

The round-3 sign rule (``models.fswap.fpeps_sign``) factorizes into
site-local gates (absorbed into each layer by ``absorb_site_signs``)
plus ROW STRINGS over vertical-bond parities.  For the NORM network
``sum_n psi*(n) psi(n)`` the two layers carry independent virtual
configs ``q`` (ket) and ``q'`` (bra), but parity-even site tensors tie
them by a Gauss law: the combined parity ``Q = q + q'`` has even
divergence at every site (closed loops).  On that constraint surface
the non-local string total ``S(q) + S(q')`` must collapse to a sum of
site-local terms in the 8 leg parities ``(u,l,d,r,u',l',d',r')`` —
this script finds the collapse by exact GF(2) linear solve over many
sampled configurations on several lattice shapes, then validates the
resulting LOCAL rule per-configuration on held-out shapes.

Run: PYTHONPATH=/root/repo python scripts/fit_fipeps_signs.py
"""

import itertools

import numpy as np


def string_S(ly, lx, pv):
    """The non-site-local exponent of the round-3 sign rule (vertical
    bonds only) — matches models.fswap.fpeps_sign lines 65-71."""
    e = 0
    for r in range(ly - 1):
        for c in range(lx):
            for c2 in range(c + 1, lx):
                e += pv[r, c] * pv[r, c2]
            if r + 1 < ly - 1:
                for c2 in range(c + 1):
                    e += pv[r, c] * pv[r + 1, c2]
    return e % 2


def plaquette_basis(ly, lx):
    """Cycle-space basis of the open grid: one generator per plaquette,
    as (set of h-bonds, set of v-bonds)."""
    gens = []
    for r in range(ly - 1):
        for c in range(lx - 1):
            hb = {(r, c), (r + 1, c)}
            vb = {(r, c), (r, c + 1)}
            gens.append((hb, vb))
    return gens


def random_loop(ly, lx, rng):
    """Random element of the cycle space: XOR of a random plaquette
    subset.  Returns (Qh (ly,lx-1), Qv (ly-1,lx)) 0/1 arrays."""
    qh = np.zeros((ly, lx - 1), np.int64)
    qv = np.zeros((ly - 1, lx), np.int64)
    for hb, vb in plaquette_basis(ly, lx):
        if rng.integers(2):
            for (r, c) in hb:
                qh[r, c] ^= 1
            for (r, c) in vb:
                qv[r, c] ^= 1
    return qh, qv


LEGS = ["u", "l", "d", "r", "U", "L", "D", "R"]  # capitals = bra
FEATS = LEGS + [f"{a}{b}" for i, a in enumerate(LEGS)
                for b in LEGS[i + 1:]]


def site_legs(ly, lx, r, c, qh, qv, bh, bv):
    u = qv[r - 1, c] if r > 0 else 0
    l_ = qh[r, c - 1] if c > 0 else 0
    d = qv[r, c] if r < ly - 1 else 0
    rr = qh[r, c] if c < lx - 1 else 0
    bu = bv[r - 1, c] if r > 0 else 0
    bl = bh[r, c - 1] if c > 0 else 0
    bd = bv[r, c] if r < ly - 1 else 0
    br = bh[r, c] if c < lx - 1 else 0
    return np.array([u, l_, d, rr, bu, bl, bd, br], np.int64)


def feature_row(ly, lx, qh, qv, bh, bv):
    """36-dim GF(2) feature vector: per-site singles and pairs, summed
    (mod 2) over all sites."""
    row = np.zeros(len(FEATS), np.int64)
    for r in range(ly):
        for c in range(lx):
            s = site_legs(ly, lx, r, c, qh, qv, bh, bv)
            k = 8
            row[:8] ^= np.zeros(8, np.int64) ^ s  # singles
            for i in range(8):
                for j in range(i + 1, 8):
                    row[k] ^= s[i] & s[j]
                    k += 1
    return row


def sample(ly, lx, rng):
    qh = rng.integers(0, 2, (ly, lx - 1))
    qv = rng.integers(0, 2, (ly - 1, lx))
    dh, dv = random_loop(ly, lx, rng)
    bh, bv = qh ^ dh, qv ^ dv
    t = (string_S(ly, lx, qv) + string_S(ly, lx, bv)) % 2
    return feature_row(ly, lx, qh, qv, bh, bv), t


def gf2_solve(a, t):
    """Solve a x = t over GF(2); returns (solution or None, pivots)."""
    a = a.copy() % 2
    t = t.copy() % 2
    nrow, ncol = a.shape
    piv = []
    r = 0
    for c in range(ncol):
        rows = np.nonzero(a[r:, c])[0]
        if len(rows) == 0:
            continue
        p = r + rows[0]
        a[[r, p]] = a[[p, r]]
        t[[r, p]] = t[[p, r]]
        mask = a[:, c].astype(bool)
        mask[r] = False
        a[mask] ^= a[r]
        t[mask] ^= t[r]
        piv.append(c)
        r += 1
        if r == nrow:
            break
    # consistency: rows of zeros with t=1?
    bad = np.any((a[r:].sum(axis=1) == 0) & (t[r:] == 1))
    if bad:
        return None, piv
    x = np.zeros(ncol, np.int64)
    for i, c in enumerate(piv):
        x[c] = t[i]
    return x, piv


def main():
    rng = np.random.default_rng(0)
    shapes = [(2, 2), (2, 3), (3, 2), (3, 3), (2, 4), (4, 2), (3, 4),
              (4, 3), (4, 4)]
    rows, ts = [], []
    for (ly, lx) in shapes:
        for _ in range(400):
            f, t = sample(ly, lx, rng)
            rows.append(f)
            ts.append(t)
    a = np.array(rows)
    t = np.array(ts)
    x, piv = gf2_solve(a, t)
    if x is None:
        print("INCONSISTENT: no site-local rule in this basis")
        return
    print("solution found; support:")
    for name, v in zip(FEATS, x):
        if v:
            print("  ", name)
    # holdout validation on bigger shapes
    bad = 0
    for (ly, lx) in [(5, 4), (4, 5), (5, 5), (2, 6), (6, 2)]:
        for _ in range(400):
            f, tt = sample(ly, lx, rng)
            if int(f @ x % 2) != tt:
                bad += 1
    print("holdout mismatches:", bad, "/ 2000")


if __name__ == "__main__":
    main()
