"""Fermionic iPEPS in the thermodynamic limit: the 2D spinless p-wave
superconductor, ground state by gradient descent through the
fermionized-double-layer CTMRG.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
     python examples/fermionic_ipeps.py

The fermionic sign structure enters as CONSTANT arrays baked into the
double tensors (models/fipeps.py), so the infinite-lattice contraction,
energy patches, and the whole optimization scan are ordinary jitted
XLA programs — the same machinery as the bosonic variational iPEPS.
"""

import numpy as np

from contractn_tpu.models import (
    bdg_energy_2d,
    fipeps_ground_state,
)

# gapped regime: real NN pairing is fully gapped for |mu| > 4
t, mu, delta = 1.0, -4.4, 1.0

exact = bdg_energy_2d(t, mu, delta)
print(f"exact BdG ground energy per site: {exact:.8f}")

a, e, dens, trace = fipeps_ground_state(
    bond_parities=(0, 1),  # D = 2: one even + one odd virtual state
    chi=12, t=t, mu=mu, delta=delta, steps=250, lr=2e-2, seed=0,
)
print(f"D=2 fermionic iPEPS: E = {e:.8f}  (+{(e-exact):.2e} above "
      f"exact, {(e-exact)/abs(exact):.3%})")
print(f"density <n> = {dens:.6f}")
print("last optimization energies:",
      [f"{x:.6f}" for x in trace[-3:]])
assert e > exact - 1e-9  # variational from above
