"""Momentum-resolved excitation spectra of the infinite TFIM chain.

Workflow: VUMPS ground state -> tangent-space quasiparticle bands
across the Brillouin zone -> dynamical structure factor pole weights,
compared against the exact Pfeuty dispersion and the static S(k) sum
rule.  Run on CPU with::

    PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        python examples/excitation_spectra.py
"""

import numpy as np

from contractn_tpu.models import (
    quasiparticle_dispersion,
    spectral_weights,
    tfim_mpo,
    vumps,
)
from contractn_tpu.models.umps import correlate, expect_local

H_FIELD = 1.5
BOND = 12

mpo = tfim_mpo(2, j=1.0, h=H_FIELD)
ground = vumps(mpo, bond_dim=BOND, iters=60)
print(f"VUMPS ground state: E/site = {ground['energy']:.12f} "
      f"(grad {ground['gradient_norm']:.1e})")

ks = np.linspace(0.0, np.pi, 9)
_, omegas = quasiparticle_dispersion(mpo, ks, ground=ground)
print("\n  k/pi    omega(k)        exact          error")
for k, om in zip(ks, omegas[:, 0]):
    exact = 2.0 * np.sqrt(H_FIELD ** 2 - 2 * H_FIELD * np.cos(k) + 1.0)
    print(f"  {k / np.pi:4.2f}  {om:.10f}  {exact:.10f}  {om - exact:+.1e}")

print("\nDynamical structure factor of Z (lowest pole + sum rule):")
z = np.diag([1.0, -1.0])
js = np.arange(1, 60)
cj = np.asarray(correlate(ground["al"], z, z, js))
mz = float(expect_local(ground["al"], z))
print("  k/pi   omega_pole   weight      S(k) static   saturation")
for k in (0.0, np.pi / 2, np.pi):
    om, wt = spectral_weights(ground, mpo, z, k)
    om, wt = np.asarray(om), np.asarray(wt)
    sk = (1 - mz * mz) + 2.0 * np.sum(np.cos(k * js) * np.real(cj))
    print(f"  {k / np.pi:4.2f}  {om[0]:.6f}   {wt[0]:.8f}  "
          f"{sk:.8f}  {wt.sum() / sk:.6f}")
