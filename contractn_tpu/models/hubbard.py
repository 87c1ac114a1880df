"""The 2D Hubbard model on the framework's MPS machinery (spinful
fermions via spin-orbital snake Jordan-Wigner).

Each lattice site carries two spin-orbitals interleaved along the
snake path (site-major, spin-minor: orbital ``2*snake(r,c) + s``), so
the Hubbard Hamiltonian

    ``H = -t sum_<ij>s (c^d_is c_js + h.c.) + U sum_i n_iu n_id
          - mu sum_is n_is``

compiles EXACTLY through :func:`models.fermions2d.string_mpo` on a
``2*lx*ly``-site d=2 chain: per-spin hopping is a JW string term over
the intervening spin-orbitals (including the partner spin channel of
the endpoints' own sites), the on-site repulsion is an ADJACENT
bosonic ``n (x) n`` pair (no string — number operators commute with
everything), and the chemical potential is on-site.  The existing
finite DMRG, TDVP, and measurement machinery then run UNCHANGED —
this is how production 2D Hubbard DMRG actually works
(cylinder/strip mapping with interleaved spins).

Sign conventions inherit from ``fermions2d`` (``n = (I+Z)/2``,
occupied-first; pinned there at the operator level).  The tests pin
this module's MPO against a spinful Fock oracle with exact zeros and
its DMRG energies against interacting ED (2x2, 3x2) — no quadratic
shortcut exists at ``U != 0``.

The reference has no fermionic, spinful, or 2D capability
(SURVEY.md §2); this extends the round-3 spinless stack.
"""

import numpy as np
import jax.numpy as jnp

from .fermions2d import _I2, _SM, _SP, _Z, snake_index, string_mpo

_N = 0.5 * (_I2 + _Z)  # number operator, occupied-first convention


def so_index(r, c, s, lx):
    """Spin-orbital JW index: snake over lattice sites, spin inside."""
    return 2 * snake_index(r, c, lx) + s


def hubbard2d_mpo(lx, ly, t=1.0, u=4.0, mu=0.0, dtype=jnp.float64):
    """Exact snake-JW MPO of the open ``lx x ly`` Hubbard model.

    Returns an MPO over ``2*lx*ly`` d=2 sites (spin-orbitals).  At
    half filling the particle-hole symmetric point is ``mu = u/2``
    (density 1 per lattice site; pinned in the tests).
    """
    terms = []
    onsite = []
    for r in range(ly):
        for c in range(lx):
            i2 = so_index(r, c, 0, lx)
            onsite.append((i2, -mu * _N))
            onsite.append((i2 + 1, -mu * _N))
            terms.append((float(u), [(i2, _N), (i2 + 1, _N)], _I2))
            for (r2, c2) in ((r, c + 1), (r + 1, c)):
                if r2 >= ly or c2 >= lx:
                    continue
                for s in (0, 1):
                    a = so_index(r, c, s, lx)
                    b = so_index(r2, c2, s, lx)
                    m, n = (a, b) if a < b else (b, a)
                    # -t (c^d_m c_n + h.c.) = t (S+ Z.. S- + S- Z.. S+)
                    terms.append((float(t), [(m, _SP), (n, _SM)], _Z))
                    terms.append((float(t), [(m, _SM), (n, _SP)], _Z))
    return string_mpo(2 * lx * ly, terms, onsite=onsite, dtype=dtype)


def hubbard_fock_hamiltonian(lx, ly, t=1.0, u=4.0, mu=0.0):
    """Dense Fock-space Hubbard Hamiltonian (the ED oracle).

    Built from explicit spin-orbital ``c = (prod Z) S^-`` matrices in
    the SAME JW ordering as :func:`hubbard2d_mpo` — usable both for
    operator-level MPO pinning (exact zeros) and ground energies.
    Dimension ``4^(lx*ly)``; keep lattices <= 6 sites.
    """
    n_orb = 2 * lx * ly
    sm = _SM

    def op_at(mats):
        m = np.eye(1)
        for k in range(n_orb):
            m = np.kron(m, mats.get(k, np.eye(2)))
        return m

    cs = [op_at({**{j: _Z for j in range(k)}, k: sm})
          for k in range(n_orb)]
    dim = 2 ** n_orb
    h = np.zeros((dim, dim))
    for r in range(ly):
        for c in range(lx):
            iu = so_index(r, c, 0, lx)
            nu = np.matmul(cs[iu].T, cs[iu])
            nd = np.matmul(cs[iu + 1].T, cs[iu + 1])
            h += u * np.matmul(nu, nd) - mu * (nu + nd)
            for (r2, c2) in ((r, c + 1), (r + 1, c)):
                if r2 >= ly or c2 >= lx:
                    continue
                for s in (0, 1):
                    a = so_index(r, c, s, lx)
                    b = so_index(r2, c2, s, lx)
                    h += -t * (np.matmul(cs[a].T, cs[b])
                               + np.matmul(cs[b].T, cs[a]))
    return h


def hubbard_ed_energy(lx, ly, t=1.0, u=4.0, mu=0.0):
    """Exact (grand-canonical) ground energy by dense Fock ED."""
    h = hubbard_fock_hamiltonian(lx, ly, t, u, mu)
    return float(np.linalg.eigvalsh(h)[0])


def hubbard_phys_charges(lx, ly):
    """Per-spin-orbital PACKED ``(N_up, N_dn)`` charges.

    Both particle numbers are conserved separately; one integer U(1)
    label encodes the pair as ``n_up * A + n_dn`` with ``A = lx*ly + 1``
    strictly exceeding every possible down-count, so packed charges add
    component-wise without aliasing (all counts are nonnegative).  Up
    orbitals (even JW index — ``so_index``'s spin bit) carry ``(A, 0)``
    over (occupied, empty), down orbitals ``(1, 0)``; the occupied
    state is FIRST (``fermions2d`` convention).

    Returns ``(per_site_charges, A)``.
    """
    a = lx * ly + 1
    return ([(a, 0) if k % 2 == 0 else (1, 0)
             for k in range(2 * lx * ly)], a)


def hubbard_sector_ed(lx, ly, n_up, n_dn, t=1.0, u=4.0):
    """Exact ``(N_up, N_dn)``-sector ground energy by dense Fock ED.

    Restricts :func:`hubbard_fock_hamiltonian` (at ``mu = 0``; a fixed
    sector shifts only by a constant) to the basis states with the
    requested per-spin particle counts — the oracle for
    :func:`hubbard_dmrg_sector`.
    """
    h = hubbard_fock_hamiltonian(lx, ly, t, u, 0.0)
    n_orb = 2 * lx * ly
    idx = []
    for b in range(2 ** n_orb):
        # orbital k is kron factor k (most-significant first); its
        # FIRST basis state (bit 0) is the occupied one
        occ = [((b >> (n_orb - 1 - k)) & 1) == 0 for k in range(n_orb)]
        if sum(occ[0::2]) == n_up and sum(occ[1::2]) == n_dn:
            idx.append(b)
    if not idx:
        raise ValueError(f"empty sector ({n_up}, {n_dn})")
    return float(np.linalg.eigvalsh(h[np.ix_(idx, idx)])[0])


def hubbard_dmrg_sector(lx, ly, n_up, n_dn, bond_dim, t=1.0, u=4.0,
                        sweeps=8, lanczos_iters=40, key=None):
    """Exact-sector Hubbard ground state: charge-masked DMRG at fixed
    ``(N_up, N_dn)`` — doped sectors without penalty terms.

    Runs :func:`~contractn_tpu.models.u1.dmrg_u1` on the ``mu = 0``
    snake-JW MPO with the packed per-site charges of
    :func:`hubbard_phys_charges`: both spin populations are conserved
    STRUCTURALLY (static charge masks; ``cores * (1 - masks) == 0``
    identically), so doping is a sector label, not a chemical-potential
    search.  Returns ``(mps, energy, energies, masks)``.
    """
    from .u1 import dmrg_u1

    phys, a = hubbard_phys_charges(lx, ly)
    mpo = hubbard2d_mpo(lx, ly, t, u, 0.0)
    return dmrg_u1(mpo, n_up * a + n_dn, bond_dim, phys_charges=phys,
                   sweeps=sweeps, lanczos_iters=lanczos_iters, key=key)


def hubbard_chain_cell(t=1.0, u=4.0, mu=0.0, dtype=jnp.float64):
    """Uniform triangular MPO cell of the infinite 1D Hubbard chain.

    One LATTICE site per cell: the two spin-orbitals fold into a d=4
    local space (up-major kron, occupied-first), with the JW string
    absorbed site-locally:

        ``c_up,i = (prod_{j<i} P_j) (S^- x I)_i``
        ``c_dn,i = (prod_{j<i} P_j) (Z  x S^-)_i``,  ``P = Z x Z``

    so nearest-neighbor hopping compiles to 4 string-free carriers
    (``S^+ Z = -S^+`` absorbs the parity into the local operator):

        ``-t c^d_up,i c_up,i+1 -> t (S^+ x Z)_i (S^- x I)_{i+1}``
        ``-t c^d_dn,i c_dn,i+1 -> t (I x S^+)_i (Z x S^-)_{i+1}``

    Width 6 (identity, 4 carriers, done); on-site ``U n_up n_dn - mu
    (n_up + n_dn)``.  Finite repetitions equal the snake-JW
    :func:`hubbard2d_mpo` on ``(n, 1)`` lattices EXACTLY (pinned at
    the operator level), which roots the cell in the same Fock
    conventions.
    """
    from .mpo import MPO

    def kr(a, b):
        return np.kron(a, b)

    eye4 = np.eye(4)
    w = np.zeros((4, 4, 6, 6))
    w[:, :, 0, 0] = eye4
    w[:, :, 5, 5] = eye4
    w[:, :, 0, 5] = (u * kr(_N, _N)
                     - mu * (kr(_N, _I2) + kr(_I2, _N)))
    w[:, :, 0, 1] = t * kr(_SP, _Z)
    w[:, :, 1, 5] = kr(_SM, _I2)
    w[:, :, 0, 2] = t * kr(_SM, _Z)
    w[:, :, 2, 5] = kr(_SP, _I2)
    w[:, :, 0, 3] = t * kr(_I2, _SP)
    w[:, :, 3, 5] = kr(_Z, _SM)
    w[:, :, 0, 4] = t * kr(_I2, _SM)
    w[:, :, 4, 5] = kr(_Z, _SP)
    left = np.zeros((6,))
    left[0] = 1.0
    right = np.zeros((6,))
    right[5] = 1.0
    return MPO(jnp.asarray(w[None], dtype), jnp.asarray(left, dtype),
               jnp.asarray(right, dtype))


def lieb_wu_energy(u, t=1.0):
    """Exact Bethe-ansatz ground energy per site of the half-filled
    Hubbard chain ``H = -t sum c^d c + U sum n_up n_dn`` (``mu = 0``).

    Lieb-Wu: ``e = -4t int_0^inf J0 J1 / (w (1 + e^{w U / 2t}))`` —
    already in the ``n n`` convention (checks: ``-4/pi`` at ``U = 0``;
    the classic ``-0.573729`` DMRG benchmark at ``U = 4``).  The
    integrand is smooth and exponentially cut at ``w ~ 2t/U``;
    trapezoid on a fine grid converges past 1e-10 for ``u >= 1``.
    """
    from scipy.special import j0, j1

    w = np.linspace(1e-9, 60.0 * t / max(float(u), 1.0), 400_001)
    f = j0(w) * j1(w) / (w * (1.0 + np.exp(w * u / (2.0 * t))))
    return float(-4.0 * t * np.trapezoid(f, w))


def hubbard_charge_gap(u, t=1.0):
    """Exact Mott charge gap of the half-filled Hubbard chain.

    Lieb-Wu: ``Delta_c = U - 4t + 8t int_0^inf J1(w) / (w (1 +
    e^{w U / 2t})) dw`` (checks: ``-> 0`` as ``U -> 0`` since
    ``int J1/w = 1``; ``-> U - 4t`` as ``U -> inf``).  With our
    ``mu = 0`` ``n n`` Hamiltonian the chemical potentials split as
    ``mu+- = (U +- Delta_c) / 2`` (particle-hole symmetry about
    ``U/2``), so the electron-REMOVAL band bottoms at ``(Delta_c -
    U) / 2`` and the addition band at ``(Delta_c + U) / 2`` relative
    to the half-filled ground state.
    """
    from scipy.special import j1

    w = np.linspace(1e-9, 60.0 * t / max(float(u), 1.0), 400_001)
    f = j1(w) / (w * (1.0 + np.exp(w * u / (2.0 * t))))
    return float(u - 4.0 * t + 8.0 * t * np.trapezoid(f, w))


def hubbard_relative_charges(a=32):
    """Packed ``(N_up, N_dn)`` charges of the TWO-lattice-site folded
    cell, measured RELATIVE to half filling.

    Raw occupation charges drift linearly along an infinite chain (no
    translation-invariant ladder); per-orbital relative charges
    ``2 n - 1`` step by ``+-1`` per lattice site (parity alternates —
    still no invariant ladder); folding TWO lattice sites makes every
    step even.  Components pack as ``a * su + sd`` with ``a`` beyond
    the down-walk window.  Returns the 16 folded charges (s1-major
    over two d=4 sites, each up-major).
    """
    q4 = [a + 1, a - 1, -a + 1, -a - 1]  # (2 n_up - 1) * a + (2 n_dn - 1)
    return tuple(q1 + q2 for q1 in q4 for q2 in q4)


def hubbard_vumps(u, t=1.0, bond_dims=(16, 32), iters=100,
                  lanczos_iters=40, key=None):
    """Infinite half-filled Hubbard chain by charge-masked VUMPS.

    Folds two lattice sites (d=16 cell, :func:`hubbard_chain_cell`
    blocked) and confines the uniform MPS STRUCTURALLY to the
    half-filled zero-magnetization sector via the packed relative
    charges — both ``N_up`` and ``N_dn`` densities are fixed by the
    ladder, not by a chemical potential.  ``bond_dims`` is the
    warm-started growth schedule (cold inits on thin outer classes
    stall; see :func:`~contractn_tpu.models.u1_vumps.vumps_u1`).

    Returns the :func:`~contractn_tpu.models.u1_vumps.vumps_u1` result
    with ``energy_per_site`` added (cell energy / 2) — compare
    :func:`lieb_wu_energy`.
    """
    from .mpo import MPO, block_mpo
    from .u1_vumps import expand_sector_state, vumps_u1

    cell4 = hubbard_chain_cell(t=t, u=u, mu=0.0)
    rep = jnp.broadcast_to(cell4.cores[0],
                           (2,) + tuple(cell4.cores.shape[1:]))
    cell16 = block_mpo(MPO(rep, cell4.left, cell4.right), 2)
    phys = hubbard_relative_charges()
    res = None
    for bond in bond_dims:
        init = (None if res is None
                else expand_sector_state(res, bond))
        res = vumps_u1(cell16, bond, phys, iters=iters,
                       lanczos_iters=lanczos_iters, key=key, init=init)
    res["energy_per_site"] = res["energy"] / 2.0
    return res


def spin_densities(mps, lx, ly):
    """Per-lattice-site ``(<n_up>, <n_dn>)`` profiles from a converged
    spin-orbital MPS — one scanned program via
    :meth:`MPS.site_expectations`."""
    dens = np.asarray(mps.site_expectations(jnp.asarray(_N)))
    up = np.zeros((ly, lx))
    dn = np.zeros((ly, lx))
    for r in range(ly):
        for c in range(lx):
            up[r, c] = dens[so_index(r, c, 0, lx)]
            dn[r, c] = dens[so_index(r, c, 1, lx)]
    return up, dn
