"""Ground state of the transverse-field Ising chain via DMRG, then sample
from the resulting Born distribution.

Run with: ``python examples/dmrg_ground_state.py``
"""

import jax
import numpy as np

from contractn_tpu.models import MPS, dmrg, sample, tfim_mpo


def main():
    n, bond = 12, 8
    mpo = tfim_mpo(n, j=1.0, h=1.0)
    mps0 = MPS.random(jax.random.PRNGKey(0), n, 2, bond,
                      dtype=jax.numpy.float64)
    ground, energy, trace = dmrg(mpo, mps0, max_bond=bond, sweeps=3)
    print(f"DMRG energy per site: {energy / n:.8f}  (sweep trace: "
          + ", ".join(f"{e:.6f}" for e in trace) + ")")

    samples, logp = sample(ground, jax.random.PRNGKey(1), 5)
    for s, lp in zip(np.asarray(samples), np.asarray(logp)):
        print("sample", "".join(map(str, s)), f"log p = {lp:.3f}")


if __name__ == "__main__":
    main()
