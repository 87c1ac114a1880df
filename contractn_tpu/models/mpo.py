"""Matrix product operators and stabilized expectation values.

``<psi| O |psi>`` contracts the three-layer sandwich site by site, carrying
the ``(D, W, D)`` boundary environment in a stabilized scan — transfer
matrices of size ``(D^2 W)^2`` are never materialized.  Covers the BASELINE
"bond-64 MPS/MPO expectation values" config.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.scan import _stab_step
from ..ops.stabilize import destabilize
from ..ops.stabilize import peinsum


@jax.tree_util.register_pytree_node_class
@dataclass
class MPO:
    """Open-boundary MPO: cores ``(N, d_out, d_in, W, W)`` + boundary vectors.

    ``W`` is the operator bond dimension.
    """

    cores: jnp.ndarray
    left: jnp.ndarray  # (W,)
    right: jnp.ndarray  # (W,)

    def tree_flatten(self):
        return (self.cores, self.left, self.right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def random(cls, key, n_sites, phys_dim, bond_dim, dtype=jnp.float32,
               scale=None):
        if scale is None:
            scale = 1.0 / (bond_dim * phys_dim) ** 0.5
        kc, kl, kr = jax.random.split(key, 3)
        cores = scale * jax.random.normal(
            kc, (n_sites, phys_dim, phys_dim, bond_dim, bond_dim), dtype
        )
        left = jax.random.normal(kl, (bond_dim,), dtype)
        right = jax.random.normal(kr, (bond_dim,), dtype)
        return cls(cores, left, right)

    @classmethod
    def identity(cls, n_sites, phys_dim, dtype=jnp.float64):
        """The identity operator as a bond-1 MPO."""
        eye = jnp.eye(phys_dim, dtype=dtype)[None, :, :, None, None]
        cores = jnp.broadcast_to(eye, (n_sites, phys_dim, phys_dim, 1, 1))
        one = jnp.ones((1,), dtype)
        return cls(cores, one, one)

    @property
    def n_sites(self):
        return self.cores.shape[0]

    def expectation(self, mps, split_format=True):
        """Stabilized ``<psi| O |psi>`` for an MPS with matching ``N, d``.

        Environment ``env[i, w, k] = <bra-bond i | op-bond w | ket-bond k>``
        updates per site with three contractions (all GEMM-shaped):

        1. ket:   ``env . B[d']``       over the ket bond
        2. op:    ``W[d,d',w,w'] . *``  over ``(d', w)``
        3. bra:   ``conj(A[d]) . *``    over ``(d, i)``
        """
        env = peinsum(
            "i,w,k->iwk", jnp.conj(mps.left), self.left, mps.left
        ).astype(mps.cores.dtype)
        log = jnp.zeros((), env.real.dtype)

        from ..ops.stabilize import dot_precision

        prec = dot_precision(mps.cores.dtype, self.cores.dtype)

        def step(carry, cores):
            env, log = carry
            a, w = cores  # (d, D, D), (d_out, d_in, W, W)
            t = jnp.einsum("iwk,ekl->iwel", env, a, precision=prec)
            t = jnp.einsum("dewv,iwel->idvl", w, t, precision=prec)
            env = jnp.einsum("dij,idvl->jvl", jnp.conj(a), t, precision=prec)
            env, log = _stab_step(env, log, 0)
            return (env, log), None

        (env, log), _ = jax.lax.scan(step, (env, log), (mps.cores, self.cores))
        val = peinsum(
            "iwk,i,w,k->", env, jnp.conj(mps.right), self.right, mps.right
        )
        val, log = _stab_step(val, log, 0)
        return (val, log) if split_format else destabilize(val, log)
