"""Per-device memory scaling of the tensor-parallel DMRG (VERDICT r3 #6).

Compiles the FULL multi-sweep TP-DMRG program for a fixed problem
(bond 256, 12 sites, TFIM W=3, f64) at tp = 1, 2, 4, 8 on the virtual
CPU mesh and reports XLA's per-device compiled memory statistics
(``compiled.memory_analysis()`` — the SPMD program is per-device, so
``temp_size_in_bytes`` IS the per-device working set).  The dominant
buffers — both environment stacks (n+1, D, W, D) and the Krylov basis
(iters+1, d, d, D, D_local) — are ket-sharded, so temp should fall
~1/n_tp toward a replicated floor (sites, theta, SVD workspace).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  JAX_ENABLE_X64=1 PYTHONPATH=/root/repo python scripts/tp_dmrg_memory.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from contractn_tpu.models import MPS, tfim_mpo
from contractn_tpu.parallel import make_mesh
from contractn_tpu.parallel.tp_dmrg import _dmrg_uniform_tp_jit


def main():
    n_sites, bond, sweeps, iters = 12, 256, 2, 40
    mpo = tfim_mpo(n_sites, dtype=jnp.float64)
    mps0 = MPS.random(jax.random.PRNGKey(0), n_sites, 2, bond,
                      dtype=jnp.float64)
    env_bytes = 2 * (n_sites + 1) * bond * 3 * bond * 8
    krylov_bytes = (iters + 1) * 4 * bond * bond * 8
    print(f"analytic (replicated): env stacks {env_bytes/2**20:.0f} MiB"
          f", Krylov basis {krylov_bytes/2**20:.0f} MiB")
    for tp in (1, 2, 4, 8):
        mesh = make_mesh({"tp": tp}, devices=jax.devices()[:tp])
        lowered = _dmrg_uniform_tp_jit.lower(
            mesh, mpo, mps0, sweeps, iters, "tp")
        ma = lowered.compile().memory_analysis()
        print(f"tp={tp}: temp={ma.temp_size_in_bytes/2**20:8.1f} MiB  "
              f"args={ma.argument_size_in_bytes/2**20:6.1f} MiB  "
              f"out={ma.output_size_in_bytes/2**20:6.1f} MiB")


if __name__ == "__main__":
    main()
