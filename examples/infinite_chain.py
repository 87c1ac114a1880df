"""Infinite-chain workflow: iTEBD ground state -> uMPS observables.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
         python examples/infinite_chain.py
"""

import numpy as np

from contractn_tpu.models.itebd import (
    heisenberg_h2,
    itebd_ground_state,
    tfim_h2,
    unit_cell_core,
)
from contractn_tpu.models.umps import (
    correlate,
    correlation_length,
    expect_local,
)


def main():
    # Critical transverse-field Ising chain: exact e0 = -4/pi
    _, e = itebd_ground_state(tfim_h2(j=1.0, h=1.0), bond_dim=12)
    print(f"TFIM (J=h=1)  e0 = {e:.6f}   exact {-4/np.pi:.6f}")

    # Heisenberg chain: exact e0 = 1/4 - ln 2 (Bethe ansatz)
    _, e = itebd_ground_state(
        heisenberg_h2(), bond_dim=16,
        schedule=((0.1, 400), (0.01, 600), (0.001, 600)),
    )
    print(f"Heisenberg    e0 = {e:.6f}   exact {0.25 - np.log(2):.6f}")

    # Paramagnetic TFIM: magnetization + correlations from fixed points
    st, _ = itebd_ground_state(tfim_h2(j=1.0, h=2.0), bond_dim=8)
    core = unit_cell_core(st)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    ident = np.eye(2)
    x_avg = 0.5 * (np.kron(sx, ident) + np.kron(ident, sx))
    print(f"TFIM h=2      <X> = {expect_local(core, x_avg):.6f}")
    print(f"              xi  = {correlation_length(core):.4f} unit cells")
    zz = correlate(core, x_avg, x_avg, [1, 2, 4])
    print(f"              connected <XX> at 1,2,4 cells: "
          f"{[round(float(c), 8) for c in zz]}")


if __name__ == "__main__":
    main()


def ising_2d():
    """CTMRG on the 2D classical Ising model (run after main())."""
    from contractn_tpu.models.ctmrg import ising_magnetization

    beta_c = 0.5 * np.log(1.0 + np.sqrt(2.0))
    for beta in (0.38, 0.42, 0.45, 0.5):
        m = ising_magnetization(beta, chi=24)
        exact = ((1 - np.sinh(2 * beta) ** -4) ** 0.125
                 if beta > beta_c else 0.0)
        print(f"2D Ising beta={beta}: M = {m:.6f} (exact {exact:.6f})")
