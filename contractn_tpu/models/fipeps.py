"""Fermionic infinite PEPS: the fswap sign rule fermionized into the
double layer, contracted by the directional cell CTMRG.

The round-3 finite-lattice machinery (:mod:`~contractn_tpu.models.fswap`)
proved the fermionic PEPS sign structure factorizes into site-local
swap gates plus row strings over vertical-bond parities.  For the NORM
network ``sum_n psi*(n) psi(n)`` the ket and bra carry independent
virtual configurations, but parity-even site tensors tie them by a
Gauss law (the combined parity ``Q = q xor q'`` is divergence-free), and
on that constraint surface the non-local string total collapses to a
SITE-LOCAL rule in the eight leg parities ``(u, l, d, r, U, L, D, R)``
(capitals = bra).  The rule was found by exact GF(2) linear solve over
nine lattice shapes (``scripts/fit_fipeps_signs.py``), validated on
2000 held-out configurations and at value level against
``fpeps_norm_sweep`` on seven shape/parity combinations:

    norm exponent per site:  ``u + uU + ld + lU + dU + dL + UL + UD``

With that factor baked into the double tensor ``E``, the fermionic norm
network IS a plain bosonic tensor network — so the thermodynamic limit
rides the existing directional CTMRG
(:mod:`~contractn_tpu.models.ctmrg_cell`) completely unchanged, and
gradients ride the existing degeneracy-broadened SVD adjoint
(:mod:`~contractn_tpu.ops.linalg_ad`).  Nearest-neighbor two-fermion
terms (parity-ODD single-site operators at the bond's endpoints, JW
string absorbed) need one extra LOCAL factor each, fitted and
Fock-validated the same way (``scripts/fit_fipeps_impurity.py``):

    horizontal pair (a, a+x):  extra ``d + U``  at the RIGHT site;
    vertical   pair (a, a+y):  extra ``d + R``  at the TOP site and
                               ``l + d``        at the BOTTOM site.

Vertical bonds are measured by rotating the (bosonic) E-network one
quarter turn (:func:`~contractn_tpu.models.ctmrg_cell.rotate`) so the
single horizontal pair patch is the only observable code path.

TPU shape: the fermionic signs enter as CONSTANT ``(+-1)`` arrays baked
into the jitted programs; everything downstream (CTMRG fixed point,
energy patches, gradient optimization scan) is the same XLA program
structure as the bosonic variational layer.

Validated in ``tests/test_fipeps.py``: stacked-1D anchors (trivial
vertical or horizontal bonds reduce the 2D network to uniform fermionic
chains whose Kitaev-chain energies are computed independently from the
MPS transfer matrix — machine precision, both orientations, all four
term kinds), and D=2 gradient ground states of the 2D spinless
p-wave/BdG model against the exact k-space integral.

The reference has no fermionic or 2D capability (SURVEY.md §2).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stabilize import dot_precision, peinsum
from .fswap import absorb_site_signs
from .ctmrg_cell import (
    ctmrg_cell,
    pair_weight_h,
    rotate,
    site_expectation,
)

_LEGS = ("u", "l", "d", "r", "U", "L", "D", "R")

# the fitted sign rules (see module docstring); each entry is a single
# leg name or a two-leg product
NORM_RULE = ("u", "uU", "ld", "lU", "dU", "dL", "UL", "UD")
H_RIGHT_EXTRA = ("d", "U")
V_TOP_EXTRA = ("d", "R")
V_BOT_EXTRA = ("l", "d")


def _sign_array(pars, terms):
    """Constant ``(-1)**exponent`` over merged double legs
    ``(u2, l2, d2, r2)`` for the given rule terms.

    ``pars = (pu, pl, pd, pr)`` parity vectors; ket and bra share them.
    """
    vecs = [np.asarray(p, np.int64) for p in pars]
    legs = {n: v for n, v in zip(_LEGS[:4], vecs)}
    legs.update({n: v for n, v in zip(_LEGS[4:], vecs)})
    order = ("u", "U", "l", "L", "d", "D", "r", "R")
    grids = np.meshgrid(*[legs[n] for n in order], indexing="ij")
    at = {n: g for n, g in zip(order, grids)}
    e = np.zeros_like(grids[0])
    for t in terms:
        if len(t) == 1:
            e = e + at[t]
        else:
            e = e + at[t[0]] * at[t[1]]
    sgn = (-1.0) ** (e % 2)
    du, dl, dd, dr = (len(v) for v in vecs)
    return sgn.reshape(du * du, dl * dl, dd * dd, dr * dr)


def fdouble(a, pars, op=None, extra=()):
    """Fermionized double tensor ``E[(uU), (lL), (dD), (rR)]``.

    Args:
        a: site tensor ``(d, Du, Dl, Dd, Dr)`` (parity-even w.r.t.
            ``pars`` and the physical parity ``n % 2``).
        pars: ``(pu, pl, pd, pr)`` leg parity vectors.
        op: optional one-site operator inserted between the layers
            (parity-even for plain expectations; parity-odd endpoints of
            two-fermion terms must pass the matching ``extra`` rule).
        extra: additional sign-rule terms (``H_RIGHT_EXTRA`` etc.).

    Differentiable in ``a`` (the signs are constants).
    """
    aa = absorb_site_signs(a, pars)
    if op is None:
        e = peinsum("nuldr,nULDR->uUlLdDrR", aa, jnp.conj(aa))
    else:
        e = peinsum("nuldr,nm,mULDR->uUlLdDrR", aa,
                    jnp.asarray(op, aa.dtype), jnp.conj(aa))
    s = a.shape
    e = e.reshape(s[1] ** 2, s[2] ** 2, s[3] ** 2, s[4] ** 2)
    return e * jnp.asarray(_sign_array(pars, tuple(NORM_RULE) + tuple(extra)),
                           e.dtype)


def fdouble_open(a, pars, extra=()):
    """Fermionized double tensor with OPEN physical legs,
    ``E[p_ket, p_bra, (uU), (lL), (dD), (rR)]``.

    Contracting the physical pair against an operator reproduces
    :func:`fdouble` exactly (the sign factors act on the virtual legs
    only), so a two-site patch can take a SUMMED two-site operator
    ``op4`` in one contraction instead of one insertion per term —
    the cell measurement path (:mod:`fipeps_spin`) rides this.
    ``extra`` dresses the tensor for its bond role exactly as in
    :func:`fdouble` (the extras are kind-independent constants).
    """
    aa = absorb_site_signs(a, pars)
    e = peinsum("nuldr,mULDR->nmuUlLdDrR", aa, jnp.conj(aa))
    s = a.shape
    e = e.reshape(s[0], s[0], s[1] ** 2, s[2] ** 2, s[3] ** 2,
                  s[4] ** 2)
    sgn = jnp.asarray(_sign_array(pars, tuple(NORM_RULE) + tuple(extra)),
                      e.dtype)
    return e * sgn[None, None]


def parity_mask_site(pars, d=2, phys_par=None):
    """0/1 mask of the parity-even block of a ``(d, Du, Dl, Dd, Dr)``
    site tensor (the fermionic manifold projector for gradient flows).

    ``phys_par`` overrides the physical-leg parity vector (default
    ``arange(d) % 2`` — single spinless orbital).  Multi-orbital sites
    (e.g. spinful d=4, parities ``(0, 1, 1, 0)``) pass it explicitly;
    see :mod:`~contractn_tpu.models.fipeps_spin`.
    """
    pu, pl, pd, pr = [np.asarray(p, np.int64) for p in pars]
    pphys = (np.arange(d) % 2 if phys_par is None
             else np.asarray(phys_par, np.int64))
    tot = (pphys[:, None, None, None, None]
           + pu[None, :, None, None, None]
           + pl[None, None, :, None, None]
           + pd[None, None, None, :, None]
           + pr[None, None, None, None, :]) % 2
    return jnp.asarray((tot == 0).astype(np.float64))


# --------------------------------------------------------------------- #
# Expectation values in the thermodynamic limit (uniform 1x1 cell)
# --------------------------------------------------------------------- #


def fipeps_env(a, pars, chi, iters=60):
    """Converged CTMRG environment of the fermionized double layer."""
    e = fdouble(a, pars)
    return ctmrg_cell(((e,),), chi, iters=iters)


_SP = np.array([[0.0, 0.0], [1.0, 0.0]])  # creation: |0> -> |1>
_SM = _SP.T
_NOP = np.diag([0.0, 1.0])

# (coefficient-name, op at first site, op at second site); mirrors the
# Fock-pinned kinds of fswap.fpeps_energy (pdm / mdp / pdp / mdm)
_KINDS = (("t", _SP, _SM), ("t", _SM, _SP),
          ("delta", _SP, _SP), ("delta", _SM, _SM))


def _cellify(e):
    return ((e,),)


def fipeps_measure(a, pars, env, t=1.0, mu=0.0, delta=0.0):
    """Energy per site of the 2D spinless-fermion Hamiltonian

        ``H = sum_<ij> [-t (c^d_i c_j + h.c.) + delta (c^d_i c^d_j
        + h.c.)] - mu sum_i n_i``

    measured in the given environment.  Pure jnp — differentiable in
    ``a`` (used by :func:`fipeps_ground_state`'s loss).  Returns
    ``(energy, density)``.
    """
    e = fdouble(a, pars)
    cell = _cellify(e)
    en = fdouble(a, pars, op=_NOP)
    dens = site_expectation(cell, env, en)

    coeff = {"t": -t, "delta": delta}
    # horizontal bond, directly
    e_h = jnp.zeros((), e.dtype)
    den_h = pair_weight_h(cell, env, e, e)
    for name, o1, o2 in _KINDS:
        if coeff[name] == 0.0:
            continue
        ia = fdouble(a, pars, op=o1)
        ib = fdouble(a, pars, op=o2, extra=H_RIGHT_EXTRA)
        e_h = e_h + coeff[name] * pair_weight_h(cell, env, ia, ib) / den_h

    # vertical bond: rotate the bosonic E-network a quarter turn so the
    # (top, bottom) pair becomes (left, right)
    def rot(tsr):
        return jnp.transpose(tsr, (3, 0, 1, 2))

    cell_r, env_r = rotate(cell, env)
    e_v = jnp.zeros((), e.dtype)
    den_v = pair_weight_h(cell_r, env_r, rot(e), rot(e))
    for name, o1, o2 in _KINDS:
        if coeff[name] == 0.0:
            continue
        ia = fdouble(a, pars, op=o1, extra=V_TOP_EXTRA)
        ib = fdouble(a, pars, op=o2, extra=V_BOT_EXTRA)
        e_v = e_v + coeff[name] * pair_weight_h(
            cell_r, env_r, rot(ia), rot(ib)) / den_v

    energy = -mu * dens + e_h + e_v
    return jnp.real(energy), jnp.real(dens)


def fipeps_energy(a, pars, chi, t=1.0, mu=0.0, delta=0.0, iters=60):
    """Converge the environment, then measure (the plain user entry).

    Returns ``(energy_per_site, density)`` as floats.
    """
    a = jnp.asarray(a)
    env = fipeps_env(a, pars, chi, iters=iters)
    e, n = fipeps_measure(a, pars, env, t=t, mu=mu, delta=delta)
    return float(e), float(n)


# --------------------------------------------------------------------- #
# Gradient ground states (differentiable CTMRG, as in variational.py)
# --------------------------------------------------------------------- #


def make_fipeps_loss(pars, chi, t=1.0, mu=0.0, delta=0.0,
                     refresh_iters=8, grad_iters=4):
    """Differentiable energy ``(a, env) -> (E, env')`` through the cell
    CTMRG: untaped refresh + ``svd_safe``-differentiated absorptions
    (degenerate corner spectra NaN the stock SVD adjoint)."""
    from ..ops.linalg_ad import svd_safe
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
        e, _ = fipeps_measure(a, pars, cur, t=t, mu=mu, delta=delta)
        return e, cur

    return loss


def fipeps_ground_state(bond_parities=(0, 1), chi=12, t=1.0, mu=0.0,
                        delta=0.0, d=2, steps=300, lr=2e-2,
                        refresh_iters=8, grad_iters=4, seed=0,
                        init=None, env_iters=60, dtype=jnp.float64):
    """Gradient ground state of the 2D spinless-fermion model in the
    thermodynamic limit: Adam on the CTMRG-contracted energy with
    parity-PROJECTED gradients (the tensor stays on the fermionic
    manifold; :func:`parity_mask_site`).

    Init is the vacuum product state plus small parity-even noise —
    gapped BdG phases connect to it adiabatically.  The optimization
    loop is one jitted ``lax.scan`` (zero host syncs), exactly the
    :mod:`~contractn_tpu.models.variational` program shape.

    Returns ``(a, energy, density, energies)`` — the optimized tensor,
    its fresh fully-converged energy and density, and the per-step
    energy trace.
    """
    import optax

    bp = np.asarray(bond_parities)
    pars = (bp, bp, bp, bp)
    mask = parity_mask_site(pars, d=d).astype(dtype)
    if init is None:
        rng = np.random.default_rng(seed)
        a0 = 0.08 * rng.standard_normal((d,) + (len(bp),) * 4)
        a0[0, 0, 0, 0, 0] = 1.0  # vacuum amplitude
        init = a0
    a = jnp.asarray(init, dtype) * mask

    env = fipeps_env(a, pars, chi, iters=env_iters)
    opt = optax.adam(lr)
    opt_state = opt.init(a)
    loss = make_fipeps_loss(pars, chi, t=t, mu=mu, delta=delta,
                            refresh_iters=refresh_iters,
                            grad_iters=grad_iters)

    @jax.jit
    def run(a, env, opt_state):
        def body(carry, _):
            a, env, s = carry
            (e, env_new), g = jax.value_and_grad(
                loss, has_aux=True)(a, env)
            g = jnp.conj(g) * mask  # parity projection; conj: see
            # variational.py (grad of real loss, complex-safe)
            updates, s = opt.update(g, s, a)
            a = optax.apply_updates(a, updates) * mask
            a = a / jnp.max(jnp.abs(a))
            return (a, jax.lax.stop_gradient(env_new), s), e

        (a, env, s), es = jax.lax.scan(
            body, (a, env, opt_state), None, length=steps)
        return a, env, es

    a, env, es = run(a, env, opt_state)
    e_final, dens = fipeps_energy(np.asarray(a), pars, chi, t=t, mu=mu,
                                  delta=delta, iters=env_iters)
    return a, e_final, dens, [float(x) for x in np.asarray(es)]


# Long-range ROW string rule (GF(2)-fitted and Fock-validated in
# scripts/fit_fipeps_string.py): every site strictly BETWEEN the two
# parity-odd endpoints of a same-row two-point function carries a
# sign-dressed plain tensor (no operator insertion — the Jordan-Wigner
# interval parities collapse onto the legs by the Gauss law; the
# endpoint classes stay exactly the NN rules, distance-1 consistency).
#
# The COLUMN direction is deliberately absent: in this row-major JW
# gauge the column-path string's off-path ``(-1)^{l+r}`` factors
# telescope away only against FINITE row boundaries (the fit script's
# dense checks pass); in the thermodynamic limit they become
# half-infinite row parity strings, i.e. the vertical correlator needs
# string-DRESSED environment fixed points, not a per-site rule — on
# chain-geometry states every candidate leg rule provably degenerates
# to ket-Z * bra-Z = identity while the true insertion is ket-only
# (measured; see fit_fipeps_string.py).  Row-direction correlators
# cover the physics (decay exponents, pairing range); on C4-symmetric
# states they equal the column ones by symmetry.
H_MID_EXTRA = ("u", "l", "r", "U")


def fipeps_correlator(a, pars, env, o1, o2, distances):
    """Two-point functions ``<o1_0 (string) o2_r>`` of parity-ODD
    one-site operators at arbitrary range ALONG A ROW in the
    thermodynamic limit — ``<c^d_0 c_r>``, pairing correlators, etc.

    The string is the row path between the endpoints (== the
    row-major JW interval); its factors are fully absorbed into the
    fitted per-site leg rules (:data:`H_MID_EXTRA`), so the channel
    sweep is the plain bosonic
    :func:`~contractn_tpu.models.ctmrg_cell.row_correlator` with
    sign-dressed intervening tensors.  (Column-direction strings need
    dressed environments in this gauge — see the note above
    :data:`H_MID_EXTRA`.)

    Args:
        a: ``(d, D, D, D, D)`` uniform site tensor (parity-even).
        pars: leg parity vectors.
        env: converged environment from :func:`fipeps_env`.
        o1, o2: endpoint operators (parity-odd ``d x d``).
        distances: iterable of ``r >= 1``.

    Returns a list of floats matching ``distances``.
    """
    from .ctmrg_cell import row_correlator

    a = jnp.asarray(a)
    e = fdouble(a, pars)
    i1 = fdouble(a, pars, op=o1)
    i2 = fdouble(a, pars, op=o2, extra=H_RIGHT_EXTRA)
    em = fdouble(a, pars, extra=H_MID_EXTRA)
    vals = row_correlator(_cellify(e), env, i1, i2, list(distances),
                          connected=False, mid=_cellify(em))
    return [float(jnp.real(v)) for v in vals]


def bdg_energy_2d(t=1.0, mu=0.0, delta=0.0, nk=400):
    """Exact ground energy per site of the 2D spinless p-wave BdG model
    on the infinite square lattice (k-space integral):

        ``E/N = (1 / N_k) sum_k (eps_k - E_k) / 2``,
        ``eps_k = -2 t (cos kx + cos ky) - mu``,
        ``Delta_k = 2 delta (sin kx + sin ky)``,
        ``E_k = sqrt(eps_k^2 + |Delta_k|^2)``.

    The validation oracle for :func:`fipeps_ground_state` (same
    Hamiltonian convention as :func:`fswap.hopping_fock_matrix`, whose
    finite-lattice BdG diagonalization pins the sign conventions)."""
    k = (np.arange(nk) + 0.5) * (2 * np.pi / nk) - np.pi
    kx, ky = np.meshgrid(k, k, indexing="ij")
    eps = -2.0 * t * (np.cos(kx) + np.cos(ky)) - mu
    dk = 2.0 * delta * (np.sin(kx) + np.sin(ky))
    ek = np.sqrt(eps ** 2 + dk ** 2)
    return float(np.mean(eps - ek) / 2.0)
