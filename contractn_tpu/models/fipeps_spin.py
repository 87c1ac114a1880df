"""Spinful fermionic infinite PEPS: the 2D Hubbard model in the
thermodynamic limit.

The fermionized double-layer rule of :mod:`~contractn_tpu.models.fipeps`
is purely parity-graded: the GF(2)-fitted norm rule involves only the
eight virtual leg parities (the physical leg is contracted ket-bra and
enters solely through the Gauss law ``q_phys = u+l+d+r mod 2`` of
parity-even tensors), and the two-fermion impurity extras absorb
inter-site Jordan-Wigner strings that act on intervening sites as the
full-site PARITY operator — never resolving the physical dimension.
So spinful d=4 sites ride the d=2 machinery completely unchanged; what
changes is only

1. the physical parity vector: basis ``|0>, |dn>, |up>, |updn>`` at
   index ``n = 2 n_up + n_dn`` (``kron(up, down)``, occupied = index 1
   per orbital as everywhere in :mod:`~contractn_tpu.models.fswap`),
   parities ``(0, 1, 1, 0)``; and
2. the per-site operator matrices: the INTRA-site part of the JW
   string (orbital order: up before down, row-major over sites,
   matching fswap's row-major JW basis) is baked into the endpoint
   matrices.  With ``string(a<k<b) = Z_k`` and the fswap identity
   ``S+ Z = +S+``, the endpoint factors of ``c^d_{i,s} c_{j,s}``
   (site ``i`` first in row-major order) are::

       s = up:  site i  kron(S+, Z)   site j  kron(S-, I)
       s = dn:  site i  kron(I,  S+)  site j  kron(Z,  S-)

   (the up string crosses the down orbital of its OWN site; the down
   string crosses the up orbital of the OTHER site), and same-spin
   pairing ``c^d c^d`` replaces the second factor's ``S-`` by ``S+``.

The Hamiltonian measured here is the 2D Hubbard model with an optional
same-spin p-wave pairing used by the validation ladder::

    H = sum_<ij> sum_s [-t (c^d_is c_js + h.c.)
                        + delta (c^d_is c^d_js + h.c.)]
        + U sum_i n_iu n_idn - mu sum_i (n_iu + n_idn)

At ``U = 0`` this is exactly two decoupled copies of the spinless
p-wave model, so the gradient ground state must reproduce
``2 * bdg_energy_2d(t, mu, delta)`` — a GAPPED, exactly solvable
anchor for the full spinful machinery.  The measurement path itself is
pinned at machine precision twice: dense fermionized-double-layer
contractions against the spinful row-major Fock oracle on enumerable
lattices, and stacked-chain anchors (trivial vertical bonds ==
independent infinite Hubbard chains whose energy is computed from the
dense spin-orbital transfer matrix, fully independent code).

The reference has no fermionic, spinful, or 2D capability
(SURVEY.md §2); this completes the 2D-fermion story begun by
``fswap.py`` (finite) and ``fipeps.py`` (infinite spinless).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .ctmrg_cell import ctmrg_cell, pair_weight_h, rotate, site_expectation
from .fipeps import (
    H_RIGHT_EXTRA,
    V_BOT_EXTRA,
    V_TOP_EXTRA,
    bdg_energy_2d,
    fdouble,
    fdouble_open,
    parity_mask_site,
)

_SP = np.array([[0.0, 0.0], [1.0, 0.0]])  # creation |0> -> |1>
_SM = _SP.T
_I2 = np.eye(2)
_Z2 = np.diag([1.0, -1.0])
_N2 = np.diag([0.0, 1.0])

PHYS_PAR = np.array([0, 1, 1, 0])  # |0>, |dn>, |up>, |updn>

N_UP = np.kron(_N2, _I2)
N_DN = np.kron(_I2, _N2)
N_TOT = N_UP + N_DN
DOCC = np.kron(_N2, _N2)

# (coefficient name, op at the FIRST site, op at the SECOND site) in
# row-major JW order; intra-site string factors baked in (module doc).
BOND_KINDS = (
    ("t", np.kron(_SP, _Z2), np.kron(_SM, _I2)),
    ("t", np.kron(_SM, _Z2), np.kron(_SP, _I2)),
    ("t", np.kron(_I2, _SP), np.kron(_Z2, _SM)),
    ("t", np.kron(_I2, _SM), np.kron(_Z2, _SP)),
    ("delta", np.kron(_SP, _Z2), np.kron(_SP, _I2)),
    ("delta", np.kron(_SM, _Z2), np.kron(_SM, _I2)),
    ("delta", np.kron(_I2, _SP), np.kron(_Z2, _SP)),
    ("delta", np.kron(_I2, _SM), np.kron(_Z2, _SM)),
)


def random_spinful_fpeps(ly, lx, bond_parities=(0, 1), seed=0):
    """Random parity-even SPINFUL fermionic PEPS on an open grid, in
    the :func:`fswap.fpeps_amplitudes_dense` format (``d=4``,
    physical parities :data:`PHYS_PAR`)."""
    from .fswap import parity_even_tensor

    rng = np.random.default_rng(seed)
    bp = np.asarray(bond_parities)
    ph_vec = {(r, c): bp for r in range(ly) for c in range(lx - 1)}
    pv_vec = {(r, c): bp for r in range(ly - 1) for c in range(lx)}
    triv = np.zeros(1, np.int64)
    tensors = []
    for r in range(ly):
        row = []
        for c in range(lx):
            pu = pv_vec[(r - 1, c)] if r > 0 else triv
            pl = ph_vec[(r, c - 1)] if c > 0 else triv
            pd = pv_vec[(r, c)] if r < ly - 1 else triv
            pr = ph_vec[(r, c)] if c < lx - 1 else triv
            shape = (4, len(pu), len(pl), len(pd), len(pr))
            row.append(parity_even_tensor(
                rng, shape, [PHYS_PAR, pu, pl, pd, pr]))
        tensors.append(row)
    return tensors, ph_vec, pv_vec


def hubbard_fock_rowmajor(ly, lx, t=1.0, u=0.0, mu=0.0, delta=0.0):
    """Dense Fock matrix of the spinful Hamiltonian (module docstring)
    over ``2 * ly * lx`` spin-orbitals in fswap's ROW-MAJOR basis
    (orbital ``2 * (r * lx + c) + s``, up = 0; occupied = index 1).

    The validation oracle for the spinful double layer — enumerable
    lattices only."""
    n = ly * lx
    no = 2 * n

    def op_at(mats):
        m = np.eye(1)
        for k in range(no):
            m = np.kron(m, mats.get(k, _I2))
        return m

    cs = [op_at({**{j: _Z2 for j in range(k)}, k: _SM})
          for k in range(no)]
    h = np.zeros((2 ** no, 2 ** no))
    for r in range(ly):
        for c in range(lx):
            i = r * lx + c
            h += u * np.matmul(
                np.matmul(cs[2 * i].T, cs[2 * i]),
                np.matmul(cs[2 * i + 1].T, cs[2 * i + 1]))
            for s in (0, 1):
                h += -mu * np.matmul(cs[2 * i + s].T, cs[2 * i + s])
            for (r2, c2) in ((r, c + 1), (r + 1, c)):
                if r2 >= ly or c2 >= lx:
                    continue
                j = r2 * lx + c2
                for s in (0, 1):
                    a, b = 2 * i + s, 2 * j + s
                    h += -t * (np.matmul(cs[a].T, cs[b])
                               + np.matmul(cs[b].T, cs[a]))
                    h += delta * (np.matmul(cs[a].T, cs[b].T)
                                  + np.matmul(cs[b], cs[a]))
    return h


# --------------------------------------------------------------------- #
# Thermodynamic limit (uniform 1x1 cell)
# --------------------------------------------------------------------- #


def _cellify(e):
    return ((e,),)


def hubbard_ipeps_measure(a, pars, env, t=1.0, u=4.0, mu=0.0,
                          delta=0.0):
    """Energy per site of the spinful Hamiltonian in the given CTMRG
    environment.  Pure jnp — differentiable in ``a`` (gradient loss).

    Returns ``(energy, (n_up, n_dn, docc))``.
    """
    e = fdouble(a, pars)
    cell = _cellify(e)
    nup = site_expectation(cell, env, fdouble(a, pars, op=N_UP))
    ndn = site_expectation(cell, env, fdouble(a, pars, op=N_DN))
    docc = site_expectation(cell, env, fdouble(a, pars, op=DOCC))

    coeff = {"t": -t, "delta": delta}
    e_h = jnp.zeros((), e.dtype)
    den_h = pair_weight_h(cell, env, e, e)
    for name, o1, o2 in BOND_KINDS:
        if coeff[name] == 0.0:
            continue
        ia = fdouble(a, pars, op=o1)
        ib = fdouble(a, pars, op=o2, extra=H_RIGHT_EXTRA)
        e_h = e_h + coeff[name] * pair_weight_h(cell, env, ia, ib) / den_h

    def rot(tsr):
        return jnp.transpose(tsr, (3, 0, 1, 2))

    cell_r, env_r = rotate(cell, env)
    e_v = jnp.zeros((), e.dtype)
    den_v = pair_weight_h(cell_r, env_r, rot(e), rot(e))
    for name, o1, o2 in BOND_KINDS:
        if coeff[name] == 0.0:
            continue
        ia = fdouble(a, pars, op=o1, extra=V_TOP_EXTRA)
        ib = fdouble(a, pars, op=o2, extra=V_BOT_EXTRA)
        e_v = e_v + coeff[name] * pair_weight_h(
            cell_r, env_r, rot(ia), rot(ib)) / den_v

    energy = u * docc - mu * (nup + ndn) + e_h + e_v
    return jnp.real(energy), (jnp.real(nup), jnp.real(ndn),
                              jnp.real(docc))


def hubbard_ipeps_energy(a, pars, chi, t=1.0, u=4.0, mu=0.0,
                         delta=0.0, iters=60):
    """Converge the environment, then measure (plain user entry).

    Returns ``(energy_per_site, {"n_up", "n_dn", "docc"})``.
    """
    a = jnp.asarray(a)
    env = ctmrg_cell(_cellify(fdouble(a, pars)), chi, iters=iters)
    e, (nup, ndn, docc) = hubbard_ipeps_measure(
        a, pars, env, t=t, u=u, mu=mu, delta=delta)
    return float(e), {"n_up": float(nup), "n_dn": float(ndn),
                      "docc": float(docc)}


# --------------------------------------------------------------------- #
# Gradient ground states (differentiable CTMRG, as in fipeps.py)
# --------------------------------------------------------------------- #


def make_hubbard_loss(pars, chi, t=1.0, u=4.0, mu=0.0, delta=0.0,
                      refresh_iters=8, grad_iters=4):
    """Differentiable energy ``(a, env) -> (E, env')``: untaped CTMRG
    refresh + ``svd_safe``-differentiated absorptions (degenerate
    corner spectra NaN the stock SVD adjoint)."""
    from ..ops.linalg_ad import svd_safe
    from ..ops.stabilize import dot_precision
    from .ctmrg_cell import _converge as _cc_converge
    from .ctmrg_cell import _iteration as _cc_iteration

    def loss(a, env):
        cell = _cellify(fdouble(a, pars))
        prec = dot_precision(a.dtype)
        env0 = jax.lax.stop_gradient(
            _cc_converge(cell, env, chi, refresh_iters))
        cur = env0
        for _ in range(grad_iters):
            cur = _cc_iteration(cell, cur, chi, prec,
                                svd_fn=lambda m: svd_safe(m))
        e, _ = hubbard_ipeps_measure(a, pars, cur, t=t, u=u, mu=mu,
                                     delta=delta)
        return e, cur

    return loss


def hubbard_ipeps_ground_state(bond_parities=(0, 1), chi=12, t=1.0,
                               u=0.0, mu=0.0, delta=0.0, steps=300,
                               lr=2e-2, refresh_iters=8, grad_iters=4,
                               seed=0, init=None, env_iters=60,
                               dtype=jnp.float64):
    """Gradient ground state of the spinful model in the thermodynamic
    limit: Adam on the CTMRG-contracted energy with parity-PROJECTED
    gradients, exactly the :func:`fipeps.fipeps_ground_state` program
    shape with the d=4 graded physical leg.

    Returns ``(a, energy, obs, energies)`` with ``obs`` the observable
    dict of :func:`hubbard_ipeps_energy`.
    """
    import optax

    bp = np.asarray(bond_parities)
    pars = (bp, bp, bp, bp)
    mask = parity_mask_site(pars, d=4, phys_par=PHYS_PAR).astype(dtype)
    if init is None:
        rng = np.random.default_rng(seed)
        a0 = 0.08 * rng.standard_normal((4,) + (len(bp),) * 4)
        a0[0, 0, 0, 0, 0] = 1.0  # vacuum amplitude
        init = a0
    a = jnp.asarray(init, dtype) * mask

    env = ctmrg_cell(_cellify(fdouble(a, pars)), chi, iters=env_iters)
    opt = optax.adam(lr)
    opt_state = opt.init(a)
    loss = make_hubbard_loss(pars, chi, t=t, u=u, mu=mu, delta=delta,
                             refresh_iters=refresh_iters,
                             grad_iters=grad_iters)

    @jax.jit
    def run(a, env, opt_state):
        def body(carry, _):
            a, env, s = carry
            (e, env_new), g = jax.value_and_grad(
                loss, has_aux=True)(a, env)
            g = jnp.conj(g) * mask  # see variational.py (real loss)
            updates, s = opt.update(g, s, a)
            a = optax.apply_updates(a, updates) * mask
            a = a / jnp.max(jnp.abs(a))
            return (a, jax.lax.stop_gradient(env_new), s), e

        (a, env, s), es = jax.lax.scan(
            body, (a, env, opt_state), None, length=steps)
        return a, env, es

    a, env, es = run(a, env, opt_state)
    e_final, obs = hubbard_ipeps_energy(
        np.asarray(a), pars, chi, t=t, u=u, mu=mu, delta=delta,
        iters=env_iters)
    return a, e_final, obs, [float(x) for x in np.asarray(es)]


def hubbard_u0_energy(t=1.0, mu=0.0, delta=0.0, nk=400):
    """Exact U=0 ground energy per site: two decoupled spinless p-wave
    copies (:func:`fipeps.bdg_energy_2d`)."""
    return 2.0 * bdg_energy_2d(t=t, mu=mu, delta=delta, nk=nk)


def hubbard_correlator(a, pars, env, distances, spin=0, kind="hop"):
    """Spin-resolved long-range ROW correlators in the thermodynamic
    limit: ``kind="hop"`` gives ``<c^d_{0,s} (string) c_{r,s}>``,
    ``"pair"`` the same-spin pairing correlator ``<c^d c^d>``.

    The endpoint matrices are the BOND_KINDS intra-site-JW-dressed
    operators (the within-site string of a d=4 site is range
    independent); the path string rides the fitted
    :data:`fipeps.H_MID_EXTRA` rule unchanged — interior-site physical
    parities collapse onto the legs by the same Gauss law regardless
    of the physical grading.
    """
    from .fipeps import fipeps_correlator

    if spin == 0:
        o1 = np.kron(_SP, _Z2)
        o2 = np.kron(_SP if kind == "pair" else _SM, _I2)
    else:
        o1 = np.kron(_I2, _SP)
        o2 = np.kron(_Z2, _SP if kind == "pair" else _SM)
    return fipeps_correlator(a, pars, env, o1, o2, distances)


# --------------------------------------------------------------------- #
# Unit cells: checkerboard Hubbard (AFM order at half filling)
# --------------------------------------------------------------------- #


def hubbard_op4(t=1.0, delta=0.0):
    """Summed TWO-SITE operator ``op4[bra_l, bra_r, ket_l, ket_r]`` of
    one bond: all eight BOND_KINDS in one tensor.

    One open-leg patch per bond replaces eight closed insertions — the
    extras are kind-independent, so the whole two-site part contracts
    in a single ``op4`` (see :func:`fipeps.fdouble_open`).

    FERMIONIC PITFALL (measured, 5.6e-3 on the chain anchors): the
    on-site terms must NOT be folded into ``op4`` the way bosonic cell
    code does — the patch's second tensor is dressed with the
    impurity ``extra`` signs, which are the absorbed JW string of
    parity-ODD endpoints; a parity-EVEN component (density, double
    occupancy) riding the same dressed patch picks up those signs
    wrongly.  On-site terms go through plain ``site_expectation``
    patches instead (:func:`hubbard_cell_measure`).
    """
    coeff = {"t": -t, "delta": delta}
    op4 = np.zeros((4, 4, 4, 4))
    for name, o1, o2 in BOND_KINDS:
        op4 += coeff[name] * np.einsum("pP,qQ->PQpq", o1, o2)
    return op4


def _open_grid(sites, pars, extra):
    return tuple(tuple(fdouble_open(s, pars, extra=extra) for s in col)
                 for col in sites)


def hubbard_cell_measure(sites, pars, env, t=1.0, u=4.0, mu=0.0,
                         delta=0.0):
    """Energy per site of the spinful Hamiltonian on an arbitrary 2x2
    unit cell ``sites[x][y]`` (checkerboard, stripes, uniform) in the
    given cell-CTMRG environment.  Pure jnp, differentiable in the
    site tensors.

    All eight cell bonds are measured; each is ONE open-leg pair patch
    against :func:`hubbard_op4` (vertical bonds through one lattice
    rotation, the extras applied before rotating — exactly the
    :func:`fipeps.fipeps_measure` convention cell-ified).
    """
    from .ipeps_cell import _pair_weight_cell_op

    sites = tuple(tuple(jnp.asarray(s) for s in col) for col in sites)
    lx, ly = len(sites), len(sites[0])
    if (lx, ly) != (2, 2):
        raise ValueError("hubbard_cell_measure supports 2x2 cells")
    dt = sites[0][0].dtype
    op4 = jnp.asarray(hubbard_op4(t=t, delta=delta), dt)
    cell = tuple(tuple(fdouble(s, pars) for s in col) for col in sites)
    o_hl = _open_grid(sites, pars, ())
    o_hr = _open_grid(sites, pars, H_RIGHT_EXTRA)
    o_vt = _open_grid(sites, pars, V_TOP_EXTRA)
    o_vb = _open_grid(sites, pars, V_BOT_EXTRA)

    def h_bonds(cell_, env_, opens_l, opens_r):
        tot = jnp.zeros((), dt)
        for x in range(2):
            for y in range(2):
                x2 = (x + 1) % 2
                num = _pair_weight_cell_op(
                    env_, cell_, x, y, opens_l[x][y], opens_r[x2][y],
                    op4)
                den = pair_weight_h(cell_, env_, cell_[x][y],
                                    cell_[x2][y], x, y)
                tot = tot + num / den
        return tot

    total = h_bonds(cell, env, o_hl, o_hr)
    cell_r, env_r = rotate(cell, env)

    def rot_opens(opens):
        return tuple(
            tuple(jnp.transpose(opens[(-yp) % 2][xp],
                                (0, 1, 5, 2, 3, 4))
                  for yp in range(2))
            for xp in range(2)
        )

    total = total + h_bonds(cell_r, env_r, rot_opens(o_vt),
                            rot_opens(o_vb))

    # on-site terms via PLAIN site patches (never through the
    # extras-dressed bond patches — see hubbard_op4's pitfall note)
    os_mat = u * DOCC - mu * N_TOT
    for x in range(2):
        for y in range(2):
            total = total + site_expectation(
                cell, env, fdouble(sites[x][y], pars, op=os_mat), x, y)
    return jnp.real(total) / 4.0


def hubbard_cell_env(sites, pars, chi, iters=60):
    """Converged cell-CTMRG environment of the fermionized cell."""
    cell = tuple(tuple(fdouble(jnp.asarray(s), pars) for s in col)
                 for col in sites)
    return ctmrg_cell(cell, chi, iters=iters)


def hubbard_cell_energy(sites, pars, chi, t=1.0, u=4.0, mu=0.0,
                        delta=0.0, iters=60):
    """Converge the environment, measure the energy and per-position
    observables.  Returns ``(energy, obs)`` with ``obs[name][x][y]``
    for ``n_up / n_dn / docc``."""
    sites = tuple(tuple(jnp.asarray(s) for s in col) for col in sites)
    env = hubbard_cell_env(sites, pars, chi, iters=iters)
    e = hubbard_cell_measure(sites, pars, env, t=t, u=u, mu=mu,
                             delta=delta)
    cell = tuple(tuple(fdouble(s, pars) for s in col) for col in sites)
    obs = {}
    for name, mat in (("n_up", N_UP), ("n_dn", N_DN), ("docc", DOCC)):
        obs[name] = tuple(
            tuple(float(jnp.real(site_expectation(
                cell, env, fdouble(sites[x][y], pars, op=mat), x, y)))
                for y in range(2))
            for x in range(2)
        )
    return float(e), obs


SZ = 0.5 * (N_UP - N_DN)


def hubbard_cell_correlator(sites, pars, env, mat1, mat2, distances,
                            x=0, y=0, connected=True):
    """Row correlators of parity-EVEN one-site operators (``SZ``,
    ``N_TOT``, ``DOCC``, ...) on a unit cell — e.g. the staggered
    spin-spin correlations of the checkerboard AFM state.  No string:
    parity-even insertions ride the plain bosonic channel; ``mat2`` is
    applied to whichever cell site each distance lands on.
    """
    from .ctmrg_cell import row_correlator

    sites = tuple(tuple(jnp.asarray(s) for s in col) for col in sites)
    cell = tuple(tuple(fdouble(s, pars) for s in col) for col in sites)
    i1 = fdouble(sites[x][y], pars, op=mat1)
    i2 = tuple(tuple(fdouble(s, pars, op=mat2) for s in col)
               for col in sites)
    vals = row_correlator(cell, env, i1, i2, list(distances), x=x,
                          y=y, connected=connected)
    return [float(jnp.real(v)) for v in vals]


def make_hubbard_cell_loss(pars, chi, t=1.0, u=4.0, mu=0.0, delta=0.0,
                           refresh_iters=8, grad_iters=4):
    """Differentiable checkerboard energy ``((a, b), env) -> (E, env')``
    through the cell CTMRG (same structure as
    :func:`make_hubbard_loss`)."""
    from ..ops.linalg_ad import svd_safe
    from ..ops.stabilize import dot_precision
    from .ctmrg_cell import _converge as _cc_converge
    from .ctmrg_cell import _iteration as _cc_iteration

    def loss(ab, env):
        a, b = ab
        sites = ((a, b), (b, a))
        cell = tuple(tuple(fdouble(s, pars) for s in col)
                     for col in sites)
        prec = dot_precision(a.dtype)
        env0 = jax.lax.stop_gradient(
            _cc_converge(cell, env, chi, refresh_iters))
        cur = env0
        for _ in range(grad_iters):
            cur = _cc_iteration(cell, cur, chi, prec,
                                svd_fn=lambda m: svd_safe(m))
        e = hubbard_cell_measure(sites, pars, cur, t=t, u=u, mu=mu,
                                 delta=delta)
        return e, cur

    return loss


def neel_dimer_init(bond_parities=(0, 1), seed=0, noise=0.08):
    """Checkerboard init: up at A, down at B, horizontally dimerized
    (A's right leg odd against B's left leg — a singly-occupied site
    is parity-ODD, so the Neel pattern must thread its parity through
    a bond; the bare product state is not even representable), plus
    parity-even noise.  Returns ``(a0, b0)`` numpy arrays."""
    bp = np.asarray(bond_parities)
    dd = len(bp)
    odd = int(np.argmax(bp == 1))
    rng = np.random.default_rng(seed)
    pars = (bp, bp, bp, bp)
    mask = np.asarray(parity_mask_site(pars, d=4, phys_par=PHYS_PAR))
    a0 = noise * rng.standard_normal((4,) + (dd,) * 4) * mask
    b0 = noise * rng.standard_normal((4,) + (dd,) * 4) * mask
    a0[2, 0, 0, 0, odd] += 1.0  # |up>, right leg odd
    b0[1, 0, odd, 0, 0] += 1.0  # |dn>, left leg odd
    return a0, b0


def hubbard_cell_ground_state(bond_parities=(0, 1), chi=12, t=1.0,
                              u=8.0, mu=None, delta=0.0, steps=200,
                              lr=1e-2, refresh_iters=8, grad_iters=4,
                              seed=0, init=None, env_iters=60,
                              dtype=jnp.float64):
    """Checkerboard gradient ground state of the 2D Hubbard model —
    AFM order at half filling rides the two-sublattice cell exactly as
    :func:`~contractn_tpu.models.variational.variational_ipeps_cell`
    does for Heisenberg.  ``mu`` defaults to the particle-hole
    symmetric point ``u / 2`` (half filling).

    Returns ``(a, b, energy, obs, energies)``.
    """
    import optax

    if mu is None:
        mu = u / 2.0
    bp = np.asarray(bond_parities)
    pars = (bp, bp, bp, bp)
    mask = parity_mask_site(pars, d=4, phys_par=PHYS_PAR).astype(dtype)
    if init is None:
        init = neel_dimer_init(bond_parities, seed=seed)
    a = jnp.asarray(init[0], dtype) * mask
    b = jnp.asarray(init[1], dtype) * mask

    env = hubbard_cell_env(((a, b), (b, a)), pars, chi,
                           iters=env_iters)
    opt = optax.adam(lr)
    opt_state = opt.init((a, b))
    loss = make_hubbard_cell_loss(pars, chi, t=t, u=u, mu=mu,
                                  delta=delta,
                                  refresh_iters=refresh_iters,
                                  grad_iters=grad_iters)

    @jax.jit
    def run(ab, env, opt_state):
        def body(carry, _):
            ab, env, s = carry
            (e, env_new), g = jax.value_and_grad(
                loss, has_aux=True)(ab, env)
            g = tuple(jnp.conj(x) * mask for x in g)
            updates, s = opt.update(g, s, ab)
            ab = optax.apply_updates(ab, updates)
            ab = tuple(x * mask / jnp.max(jnp.abs(x)) for x in ab)
            return (ab, jax.lax.stop_gradient(env_new), s), e

        (ab, env, s), es = jax.lax.scan(
            body, (ab, env, opt_state), None, length=steps)
        return ab, env, es

    (a, b), env, es = run((a, b), env, opt_state)
    e_final, obs = hubbard_cell_energy(
        ((np.asarray(a), np.asarray(b)),
         (np.asarray(b), np.asarray(a))), pars, chi, t=t, u=u, mu=mu,
        delta=delta, iters=env_iters)
    return a, b, e_final, obs, [float(x) for x in np.asarray(es)]
