"""Train an MPS regression model, single-chip and mesh-sharded.

Demonstrates the capability the reference's "template tensors" aimed at
(weight-shared differentiable TNs) with full autodiff and device-mesh
scaling.  Run with: ``python examples/mps_training.py``
"""

import jax
import jax.numpy as jnp

from contractn_tpu.models import MPS
from contractn_tpu.parallel import make_mesh, make_sharded_train_step, make_train_step


def main():
    n_sites, phys_dim, bond_dim, batch = 16, 2, 8, 32
    mps = MPS.random(jax.random.PRNGKey(0), n_sites, phys_dim, bond_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_sites, phys_dim))
    y = jnp.sin(jnp.arange(batch) / batch)

    step = make_train_step(lr=2e-3)
    for i in range(20):
        mps, loss = step(mps, x, y)
        if i % 5 == 0:
            print(f"step {i:3d}  loss {float(loss):.5f}")

    n_dev = len(jax.devices())
    if n_dev >= 2 and n_dev % 2 == 0:
        mesh = make_mesh({"dp": n_dev // 2, "sp": 2})
        sharded = make_sharded_train_step(mesh, lr=2e-3)
        mps, loss = sharded(mps, x, y)
        print(f"sharded step on {mesh.shape}: loss {float(loss):.5f}")


if __name__ == "__main__":
    main()
