"""AutoMPO compiler vs independent dense oracles.

The oracle builds every term as a product of FULL-lattice operators
(explicit Kronecker products, explicit JW string factors) multiplied as
``2^n x 2^n`` matrices — a completely independent code path from the
compiler's per-site factor bookkeeping.
"""

import numpy as np
import pytest

from contractn_tpu.models.autompo import OP_TABLE, OpSum, op_sum_mpo
from contractn_tpu.models.dmrg import heisenberg_mpo

_I = np.eye(2)
_Z = np.diag([1.0, -1.0])


def _mpo_dense(mpo, n):
    w = np.asarray(mpo.cores)
    cur = np.einsum("w,abwv->abv", np.asarray(mpo.left), w[0])
    for i in range(1, n):
        dd = cur.shape[0]
        cur = np.einsum("ABw,abwv->AaBbv", cur, w[i]).reshape(
            2 * dd, 2 * dd, -1)
    return np.einsum("ABv,v->AB", cur, np.asarray(mpo.right))


def _full_op(mat, site, n, fermi=False):
    out = np.eye(1)
    for j in range(n):
        if j == site:
            f = mat
        elif fermi and j < site:
            f = _Z
        else:
            f = _I
        out = np.kron(out, f)
    return out


def _dense_opsum(opsum, n):
    """Independent oracle: full-matrix products in term order."""
    tot = np.zeros((2 ** n, 2 ** n), complex)
    for coef, ops, sites in opsum.terms:
        term = coef * np.eye(2 ** n)
        for op, s in zip(ops, sites):
            if isinstance(op, str):
                mat, fermi = OP_TABLE[op]
            else:
                mat, fermi = np.asarray(op), False
            term = term @ _full_op(mat, s, n, fermi)
        tot += term
    return tot


def _check(opsum, n, atol=1e-10, **kw):
    mpo = op_sum_mpo(opsum, n, **kw)
    got = _mpo_dense(mpo, n)
    want = _dense_opsum(opsum, n)
    assert np.max(np.abs(got - want)) < atol * max(
        1.0, np.max(np.abs(want))
    ), np.max(np.abs(got - want))
    return mpo


def test_tfim_bond_dim_3():
    n = 8
    h = OpSum()
    for i in range(n - 1):
        h += (-1.0, "Z", i, "Z", i + 1)
    for i in range(n):
        h += (-0.7, "X", i)
    mpo = _check(h, n)
    assert mpo.cores.shape[3] == 3


def test_heisenberg_matches_builder_and_w5():
    """X X + Y Y + Z Z written as 2(S+S- + S-S+) + Z Z == the hand
    triangular W=5 builder, and the compiler also lands at W=5."""
    n = 7
    h = OpSum()
    for i in range(n - 1):
        h += (2.0, "S+", i, "S-", i + 1)
        h += (2.0, "S-", i, "S+", i + 1)
        h += (1.0, "Z", i, "Z", i + 1)
    mpo = _check(h, n)
    assert mpo.cores.shape[3] == 5
    want = _mpo_dense(heisenberg_mpo(n), n)
    got = _mpo_dense(mpo, n)
    assert np.max(np.abs(got - want)) < 1e-10


def test_exp_decay_all_pairs_compresses_to_w3():
    """sum_{i<j} lam^{j-i} Z_i Z_j: the SVD stage must find the W=3
    exponential loop the naive FSM (W = O(n^2)) does not expose."""
    n = 9
    lam = 0.55
    h = OpSum()
    for i in range(n):
        for j in range(i + 1, n):
            h += (lam ** (j - i), "Z", i, "Z", j)
    mpo = _check(h, n)
    assert mpo.cores.shape[3] == 3


def test_fermion_hopping_auto_jw():
    """NN + NNN hopping and pairing with automatic JW strings."""
    n = 6
    h = OpSum()
    for i in range(n - 1):
        h += (-1.0, "Cdag", i, "C", i + 1)
        h += (-1.0, "Cdag", i + 1, "C", i)
    for i in range(n - 2):
        h += (-0.3, "Cdag", i, "C", i + 2)
        h += (-0.3, "Cdag", i + 2, "C", i)
    for i in range(n):
        h += (0.4, "N", i)
    mpo = _check(h, n)
    # anticommutation: the dense oracle carries explicit string factors,
    # so agreement pins the sign structure; also check hermiticity
    dense = _dense_opsum(h, n)
    assert np.max(np.abs(dense - dense.conj().T)) < 1e-12
    assert mpo.cores.shape[3] <= 8


def test_fermion_order_sign():
    """Cdag_0 C_2 written in the opposite order flips sign (true
    anticommutation, not just dense parity)."""
    n = 3
    a = OpSum()
    a += (1.0, "Cdag", 0, "C", 2)
    b = OpSum()
    b += (1.0, "C", 2, "Cdag", 0)
    da = _mpo_dense(op_sum_mpo(a, n), n)
    db = _mpo_dense(op_sum_mpo(b, n), n)
    assert np.max(np.abs(da + db)) < 1e-12
    assert np.max(np.abs(da)) > 0.5


def test_same_site_products_and_complex():
    n = 4
    h = OpSum()
    h += (0.5 + 0.25j, "S+", 1, "S-", 1)   # same-site product
    h += (-0.5 - 0.25j, "Sz", 2, "Sz", 2, "X", 0)
    h += (1.0j, "Y", 3)
    _check(h, n)


def test_raw_matrices_and_custom_ops():
    n = 4
    rng = np.random.default_rng(0)
    m1 = rng.standard_normal((2, 2))
    m2 = rng.standard_normal((2, 2))
    h = OpSum()
    h += (1.3, m1, 0, m2, 3)
    h += (-0.2, "Q", 1)
    mpo = op_sum_mpo(h, n, ops={"Q": m2})
    got = _mpo_dense(mpo, n)
    want = 1.3 * _full_op(m1, 0, n) @ _full_op(m2, 3, n) \
        - 0.2 * _full_op(m2, 1, n)
    assert np.max(np.abs(got - want)) < 1e-10


def test_random_stress_long_range():
    """20 random multi-op terms (1-4 ops, repeated sites allowed,
    mixed fermionic/bosonic) vs the full-matrix oracle."""
    n = 6
    rng = np.random.default_rng(7)
    names = list(OP_TABLE)
    h = OpSum()
    for _ in range(20):
        k = int(rng.integers(1, 5))
        args = []
        for _ in range(k):
            args += [names[rng.integers(len(names))],
                     int(rng.integers(n))]
        coef = complex(rng.standard_normal(), rng.standard_normal())
        h.add(coef, *args)
    _check(h, n, atol=1e-9)


def test_constant_term_and_single_site():
    n = 3
    h = OpSum()
    h += (2.5, "I", 1)           # constant shift
    h += (-1.0, "Z", 0)
    got = _mpo_dense(op_sum_mpo(h, n), n)
    want = 2.5 * np.eye(8) - _full_op(_Z, 0, n)
    assert np.max(np.abs(got - want)) < 1e-12


def test_validation():
    h = OpSum()
    with pytest.raises(ValueError):
        h.add(1.0, "Z")          # missing site
    with pytest.raises(ValueError):
        op_sum_mpo(h, 4)         # empty
    h += (1.0, "Z", 5)
    with pytest.raises(ValueError):
        op_sum_mpo(h, 4)         # site out of range
    g = OpSum()
    g += (1.0, "Nope", 0)
    with pytest.raises(ValueError):
        op_sum_mpo(g, 2)


def test_dmrg_end_to_end():
    """AutoMPO-built TFIM feeds the DMRG solver: ground energy ==
    dense ED."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.models.dmrg import dmrg
    from contractn_tpu.models.mps import MPS

    n = 8
    h = OpSum()
    for i in range(n - 1):
        h += (-1.0, "Z", i, "Z", i + 1)
    for i in range(n):
        h += (-1.0, "X", i)
    mpo = op_sum_mpo(h, n)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, 16,
                      dtype=jnp.float64)
    _, e, _ = dmrg(mpo, mps0, max_bond=16, sweeps=6)
    want = np.linalg.eigvalsh(_dense_opsum(h, n).real)[0]
    assert abs(float(e) - want) < 1e-8


# ---------------- infinite (uniform) compiler ---------------------- #

def _finite_wrap_dense(core, n):
    from contractn_tpu.models.autompo import umpo_finite

    return _mpo_dense(umpo_finite(core, n), n)


def test_infinite_tfim_matches_finite_compiler():
    from contractn_tpu.models.autompo import InfiniteOpSum

    inf = InfiniteOpSum()
    inf += (-1.0, "Z", 0, "Z", 1)
    inf += (-0.7, "X", 0)
    core = inf.to_umpo()

    n = 6
    fin = OpSum()
    for i in range(n - 1):
        fin += (-1.0, "Z", i, "Z", i + 1)
    for i in range(n):
        fin += (-0.7, "X", i)
    want = _mpo_dense(op_sum_mpo(fin, n), n)
    got = _finite_wrap_dense(core, n)
    assert np.max(np.abs(got - want)) < 1e-10
    # triangular with identity corners
    w = np.asarray(core)
    assert np.allclose(w[:, :, 0, 0], np.eye(2))
    assert np.allclose(w[:, :, -1, -1], np.eye(2))
    for a in range(w.shape[2]):
        for b in range(a):
            assert np.allclose(w[:, :, a, b], 0.0)


def test_infinite_fermion_hopping_and_nnn():
    from contractn_tpu.models.autompo import InfiniteOpSum

    inf = InfiniteOpSum()
    inf.add(-1.0, "Cdag", 0, "C", 1)
    inf.add(-1.0, "Cdag", 1, "C", 0)
    inf.add(-0.3, "Cdag", 0, "C", 2)
    inf.add(-0.3, "Cdag", 2, "C", 0)
    inf.add(0.5, "N", 0)
    core = inf.to_umpo()

    n = 6
    fin = OpSum()
    for i in range(n - 1):
        fin += (-1.0, "Cdag", i, "C", i + 1)
        fin += (-1.0, "Cdag", i + 1, "C", i)
    for i in range(n - 2):
        fin += (-0.3, "Cdag", i, "C", i + 2)
        fin += (-0.3, "Cdag", i + 2, "C", i)
    for i in range(n):
        fin += (0.5, "N", i)
    want = _mpo_dense(op_sum_mpo(fin, n), n)
    got = _finite_wrap_dense(core, n)
    assert np.max(np.abs(got - want)) < 1e-10


def test_infinite_odd_fermion_count_rejected():
    from contractn_tpu.models.autompo import InfiniteOpSum

    inf = InfiniteOpSum()
    inf.add(1.0, "Cdag", 0)
    with pytest.raises(ValueError):
        inf.to_umpo()


def test_exp_channel_matches_explicit_sum():
    """One geometric channel == the explicit lam^(r-1) pair sum on a
    finite wrap, for bosonic AND JW-string variants."""
    from contractn_tpu.models.autompo import InfiniteOpSum

    n, lam = 7, 0.6
    inf = InfiniteOpSum()
    inf.add_exp(0.8, "Z", lam, "Z")
    got = _finite_wrap_dense(inf.to_umpo(), n)
    fin = OpSum()
    for i in range(n):
        for j in range(i + 1, n):
            fin += (0.8 * lam ** (j - i - 1), "Z", i, "Z", j)
    want = _mpo_dense(op_sum_mpo(fin, n), n)
    assert np.max(np.abs(got - want)) < 1e-10

    # fermionic long-range bilinear: string="Z" == auto-JW finite terms
    inf2 = InfiniteOpSum()
    inf2.add_exp(-0.5, "Cdag", lam, "C", string="Z")
    got2 = _finite_wrap_dense(inf2.to_umpo(), n)
    fin2 = OpSum()
    for i in range(n):
        for j in range(i + 1, n):
            fin2 += (-0.5 * lam ** (j - i - 1), "Cdag", i, "C", j)
    want2 = _mpo_dense(op_sum_mpo(fin2, n), n)
    assert np.max(np.abs(got2 - want2)) < 1e-10


def test_infinite_exp_channel_environment_energy():
    """The polarized product state evaluated through the INFINITE
    environment solver: the geometric channel must telescope to
    E/site = -c/(1 - lam) - h exactly.  (A full VUMPS run is the wrong
    anchor here: a purely diagonal Hamiltonian makes EVERY product
    state a fixed point and random inits can land field-opposed —
    measured -2h off before this was understood.)"""
    import jax.numpy as jnp

    from contractn_tpu.models.autompo import InfiniteOpSum
    from contractn_tpu.models.vumps_cell import mpo_environments_cell

    c, lam, h = 1.0, 0.5, 0.05
    inf = InfiniteOpSum()
    inf.add_exp(-c, "Z", lam, "Z")
    inf.add(-h, "Z", 0)
    core = inf.to_umpo()
    up = jnp.zeros((2, 1, 1), jnp.float64).at[0].set(1.0)
    cs = [jnp.eye(1, dtype=jnp.float64)]
    _, _, e = mpo_environments_cell([up], [up], cs, [core])
    want = -c / (1.0 - lam) - h
    assert abs(float(jnp.real(e)) - want) < 1e-10, (float(e), want)


def test_infinite_vumps_longrange_tfim_consistency():
    """Quantum long-range case: D=8 and D=16 agree to 1e-6 (variational
    convergence in D) and sit below the product-state bound."""
    from contractn_tpu.models.autompo import InfiniteOpSum, umpo_finite
    from contractn_tpu.models.vumps import vumps

    import jax

    inf = InfiniteOpSum()
    inf.add_exp(-1.0, "Z", 0.4, "Z")
    inf.add(-0.6, "X", 0)
    core = inf.to_umpo()
    e8 = float(vumps(umpo_finite(core, 2), bond_dim=8, iters=60,
                     key=jax.random.PRNGKey(0))["energy"])
    e16 = float(vumps(umpo_finite(core, 2), bond_dim=16, iters=60,
                      key=jax.random.PRNGKey(0))["energy"])
    assert abs(e8 - e16) < 1e-6, (e8, e16)
    assert e16 < -1.0 / 0.6 + 1e-9 or e16 < -1.66  # below trivial FM


# ---------------- power-law fits -> geometric channels -------------- #

def test_fit_exp_sum_quality():
    from contractn_tpu.models.autompo import fit_exp_sum

    for alpha, want in ((1.0, 1e-4), (2.0, 1e-3), (3.0, 5e-3)):
        c, lam = fit_exp_sum(lambda r: r ** -alpha, 8, 60)
        assert len(lam) == 8
        assert np.all(np.abs(lam) < 1.0)
        r = np.arange(1.0, 61)
        fit = (c[None, :] * lam[None, :] ** (r[:, None] - 1)).sum(1)
        assert np.max(np.abs(fit * r ** alpha - 1.0)) < want


def test_power_law_matches_explicit_couplings():
    """Finite wrap of the fitted channels == explicit 1/r^alpha OpSum
    couplings, to the fit error the call itself reports."""
    from contractn_tpu.models.autompo import InfiniteOpSum

    n, alpha = 8, 2.0
    inf = InfiniteOpSum()
    err = inf.add_power_law(0.7, "Z", alpha, "Z", n_exp=8)
    got = _finite_wrap_dense(inf.to_umpo(), n)
    fin = OpSum()
    for i in range(n):
        for j in range(i + 1, n):
            fin += (0.7 * float(j - i) ** -alpha, "Z", i, "Z", j)
    want = _mpo_dense(op_sum_mpo(fin, n), n)
    # <= n^2/2 pairs, |coef err| <= 0.7 * err * coupling, ||ZZ|| = 1
    assert np.max(np.abs(got - want)) < 0.7 * err * n * n
    assert err < 1e-3


def test_haldane_shastry_vumps():
    """1/r^2 Heisenberg chain: VUMPS on the fitted power-law uMPO vs
    the EXACT Haldane-Shastry energy -pi^2/24 per site."""
    import jax

    from contractn_tpu.models.autompo import InfiniteOpSum, umpo_finite
    from contractn_tpu.models.vumps import vumps

    inf = InfiniteOpSum()
    inf.add_power_law(1.0, "Sz", 2.0, "Sz", n_exp=8)
    inf.add_power_law(0.5, "Sp", 2.0, "Sm", n_exp=8)
    inf.add_power_law(0.5, "Sm", 2.0, "Sp", n_exp=8)
    e = float(vumps(umpo_finite(inf.to_umpo(), 2), bond_dim=16,
                    iters=40, key=jax.random.PRNGKey(0))["energy"])
    assert abs(e + np.pi ** 2 / 24) < 1e-3, e


# ---------------- arbitrary spin + long-range dynamics -------------- #

def test_spin_ops_algebra():
    from contractn_tpu.models.autompo import spin_ops

    for s in (0.5, 1.0, 1.5, 2.0):
        t = spin_ops(s)
        sx, sy, sz = t["Sx"], t["Sy"], t["Sz"]
        assert np.max(np.abs(sx @ sy - sy @ sx - 1j * sz)) < 1e-12
        assert np.max(np.abs(sz @ sx - sx @ sz - 1j * sy)) < 1e-12
        s2 = sx @ sx + sy @ sy + sz @ sz
        want = s * (s + 1) * np.eye(int(round(2 * s)) + 1)
        assert np.max(np.abs(s2 - want)) < 1e-12
    with pytest.raises(ValueError):
        spin_ops(0.7)


def _heis_terms(inf, ops, c=1.0):
    inf.add(c, "Sz", 0, "Sz", 1)
    inf.add(0.5 * c, "Sp", 0, "Sm", 1)
    inf.add(0.5 * c, "Sm", 0, "Sp", 1)


def test_aklt_vumps_exact():
    """AKLT: S.S + (S.S)^2/3 has an EXACT D=2 ground state at
    E/site = -2/3 — VUMPS must hit it to machine precision.  The
    biquadratic enters as raw two-site products (SxSy etc. are
    complex); the complex bulk core must auto-promote vumps's dtype
    (a silent real cast is a WRONG Hamiltonian — it measured -0.818,
    below the true minimum, before the promotion guard)."""
    import jax

    from contractn_tpu.models.autompo import (InfiniteOpSum, spin_ops,
                                              umpo_finite)
    from contractn_tpu.models.vumps import vumps

    ops = spin_ops(1.0)
    inf = InfiniteOpSum()
    _heis_terms(inf, ops)
    for a in ("Sx", "Sy", "Sz"):
        for b in ("Sx", "Sy", "Sz"):
            mab = ops[a] @ ops[b]
            inf.add(1.0 / 3.0, mab, 0, mab, 1)
    core = inf.to_umpo(d=3, ops=ops)
    assert np.iscomplexobj(np.asarray(core))
    r = vumps(umpo_finite(core, 2), bond_dim=2, iters=40,
              key=jax.random.PRNGKey(0))
    assert abs(float(np.real(r["energy"])) + 2.0 / 3.0) < 1e-12


def test_haldane_chain_vumps():
    """Spin-1 Heisenberg (Haldane) chain vs White's reference energy
    -1.401484038971 — pins spin_ops through the full infinite stack."""
    import jax

    from contractn_tpu.models.autompo import (InfiniteOpSum, spin_ops,
                                              umpo_finite)
    from contractn_tpu.models.vumps import vumps

    ops = spin_ops(1.0)
    inf = InfiniteOpSum()
    _heis_terms(inf, ops)
    e = float(np.real(vumps(umpo_finite(inf.to_umpo(d=3, ops=ops), 2),
                            bond_dim=24, iters=60,
                            key=jax.random.PRNGKey(1))["energy"]))
    assert abs(e + 1.401484038971) < 1e-5, e


def test_power_law_wii_quench():
    """W^II evolution under a power-law TFIM: the umpo_finite wrap of
    the fitted channels IS a triangular automaton, so mpo_evolve
    accepts it unchanged; compare against dense expm of the SAME
    wrapped operator (fit error drops out)."""
    import jax
    import scipy.linalg as sla

    from contractn_tpu.models.autompo import InfiniteOpSum, umpo_finite
    from contractn_tpu.models.mpo_evolution import mpo_evolve
    from contractn_tpu.models.mps import MPS

    n, t = 6, 0.4
    inf = InfiniteOpSum()
    inf.add_power_law(-0.8, "Z", 2.0, "Z", n_exp=6, r_max=20)
    inf.add(-1.1, "X", 0)
    hm = umpo_finite(inf.to_umpo(), n)
    hd = _mpo_dense(hm, n)
    assert np.max(np.abs(hd - hd.conj().T)) < 1e-12

    theta = 0.3
    one = np.array([np.cos(theta), np.sin(theta)])
    psi0 = MPS(
        np.broadcast_to(one[None, :, None, None],
                        (n, 2, 1, 1)).astype(np.complex128),
        np.ones((1,), np.complex128), np.ones((1,), np.complex128))
    dense0 = np.einsum("i,j,k,l,m,n->ijklmn", *([one] * n)).reshape(-1)
    target = sla.expm(-1j * np.asarray(hd) * t) @ dense0

    out = mpo_evolve(psi0, hm, t, 16, max_bond=32, order=2)
    c = np.asarray(out.cores)
    cur = np.einsum("j,djk->dk", np.asarray(out.left), c[0])
    for i in range(1, n):
        cur = np.einsum("Dk,dkl->Ddl", cur, c[i]).reshape(-1, c.shape[3])
    got = cur @ np.asarray(out.right)
    fid = abs(np.vdot(target, got)) / (
        np.linalg.norm(target) * np.linalg.norm(got))
    assert 1.0 - fid < 1e-6, fid


def test_add_gate_finite_dense_parity():
    """Operator-Schmidt gate terms == explicit factor terms; a real
    two-site matrix compiles to REAL cores even when the natural
    factorization (Sy Sy) is complex."""
    from contractn_tpu.models.autompo import spin_ops

    so = spin_ops(0.5)
    heis = (np.kron(so["Sx"], so["Sx"]).real
            + np.kron(so["Sy"], so["Sy"]).real
            + np.kron(so["Sz"], so["Sz"]))
    h1 = OpSum().add_gate(0.7, heis, 1, 3).add(0.3, "X", 0)
    h2 = OpSum()
    h2.add(0.7, so["Sx"], 1, so["Sx"], 3)
    # Sy Sy = -(i Sy)(i Sy) with i Sy = (Sp - Sm)/2 real
    h2.add(-0.7, (so["Sp"] - so["Sm"]) / 2, 1,
           (so["Sp"] - so["Sm"]) / 2, 3)
    h2.add(0.7, so["Sz"], 1, so["Sz"], 3)
    h2.add(0.3, "X", 0)
    m1, m2 = op_sum_mpo(h1, 4), op_sum_mpo(h2, 4)
    assert np.asarray(m1.cores).dtype == np.float64
    assert np.max(np.abs(_mpo_dense(m1, 4) - _mpo_dense(m2, 4))) < 1e-12


def test_add_gate_infinite_dense_parity():
    """InfiniteOpSum.add_gate at r=1 and r=2 == explicit terms through
    the triangular bulk compiler (finite wrap oracle)."""
    from contractn_tpu.models.autompo import (
        InfiniteOpSum, spin_ops, umpo_finite)

    so = spin_ops(0.5)
    heis = (np.kron(so["Sx"], so["Sx"]).real
            + np.kron(so["Sy"], so["Sy"]).real
            + np.kron(so["Sz"], so["Sz"]))
    g1 = InfiniteOpSum().add_gate(1.0, heis).add_gate(0.25, heis, r=2)
    g2 = InfiniteOpSum()
    for r, c in ((1, 1.0), (2, 0.25)):
        g2.add(c, so["Sx"], 0, so["Sx"], r)
        g2.add(-c, (so["Sp"] - so["Sm"]) / 2, 0,
               (so["Sp"] - so["Sm"]) / 2, r)
        g2.add(c, so["Sz"], 0, so["Sz"], r)
    u1, u2 = g1.to_umpo(), g2.to_umpo()
    assert np.asarray(u1).dtype == np.float64
    n = 5
    d1 = _mpo_dense(umpo_finite(u1, n), n)
    d2 = _mpo_dense(umpo_finite(u2, n), n)
    assert np.max(np.abs(d1 - d2)) < 1e-12


def test_add_gate_validation():
    from contractn_tpu.models.autompo import InfiniteOpSum

    with pytest.raises(ValueError):
        OpSum().add_gate(1.0, np.eye(3), 0, 1)  # not d^2 x d^2
    with pytest.raises(ValueError):
        OpSum().add_gate(1.0, np.eye(4), 2, 2)  # same site
    with pytest.raises(ValueError):
        InfiniteOpSum().add_gate(1.0, np.eye(4), r=0)


def test_ring_pbc_ground_state():
    """Periodic boundary conditions out of the box: the wrap bond is
    just another long-range OpSum term (one extra FSM channel held
    open across the chain), so ring Hamiltonians ride the standard
    open-chain DMRG.  TFIM and Heisenberg rings == periodic ED."""
    import jax
    import jax.numpy as jnp

    from contractn_tpu.models.dmrg import dmrg
    from contractn_tpu.models.mps import MPS

    n = 10
    ham = OpSum()
    for i in range(n):
        ham += (-1.0, "Z", i, "Z", (i + 1) % n)
        ham += (-1.3, "X", i)
    mpo = op_sum_mpo(ham, n)
    mps0 = MPS.random(jax.random.PRNGKey(1), n, 2, 24,
                      dtype=jnp.float64)
    _, e, _ = dmrg(mpo, mps0, max_bond=24, sweeps=8)
    want = np.linalg.eigvalsh(_dense_opsum(ham, n).real)[0]
    assert abs(float(e) - want) < 1e-8, (float(e), want)

    heis = OpSum()
    for i in range(n):
        j = (i + 1) % n
        heis += (0.5, "S+", i, "S-", j)
        heis += (0.5, "S-", i, "S+", j)
        heis += (1.0, "Sz", i, "Sz", j)
    mpo_h = op_sum_mpo(heis, n)
    mps_h = MPS.random(jax.random.PRNGKey(2), n, 2, 32,
                       dtype=jnp.float64)
    _, e_h, _ = dmrg(mpo_h, mps_h, max_bond=32, sweeps=10)
    want_h = np.linalg.eigvalsh(_dense_opsum(heis, n).real)[0]
    assert abs(float(e_h) - want_h) < 1e-7, (float(e_h), want_h)
