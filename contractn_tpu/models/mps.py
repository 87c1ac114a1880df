"""Matrix product states (MPS), the framework's flagship model family.

The reference treats an MPS as just another node chain contracted through the
generic engine (its only numerical test builds exactly this,
``/root/reference/contractn/tests/test_einsum.py:28-64``).  Here MPS is a
first-class model: cores live as ONE stacked ``(N, d, D, D)`` array (a single
pytree leaf — checkpointable, donatable, shardable along any axis), and the
hot paths are stabilized ``lax.scan`` programs shaped for the MXU
(:mod:`contractn_tpu.ops.scan`).  Everything is jit/vmap/grad-compatible.

Batched evaluation over thousands of inputs — the BASELINE "bond-64 MPS
vmapped over 1k parameter batches" config — is one compiled program.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan import mps_evaluate, mps_norm
from ..ops.stabilize import destabilize


@jax.tree_util.register_pytree_node_class
@dataclass
class MPS:
    """Open-boundary MPS with uniform bond dimension.

    Attributes:
        cores: ``(N, d, D, D)`` site tensors (one stacked leaf).
        left: ``(D,)`` left boundary vector.
        right: ``(D,)`` right boundary vector.
    """

    cores: jnp.ndarray
    left: jnp.ndarray
    right: jnp.ndarray

    # -- pytree protocol ------------------------------------------------ #

    def tree_flatten(self):
        return (self.cores, self.left, self.right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors --------------------------------------------------- #

    @classmethod
    def random(cls, key, n_sites, phys_dim, bond_dim, dtype=jnp.float32,
               scale=None):
        """Random MPS with cores scaled for O(1) per-site transfer norm."""
        if scale is None:
            # E[|A x|^2] ~ D * scale^2 per contraction; keep products tame
            scale = 1.0 / np.sqrt(bond_dim * phys_dim)
        kc, kl, kr = jax.random.split(key, 3)
        cores = scale * jax.random.normal(
            kc, (n_sites, phys_dim, bond_dim, bond_dim), dtype
        )
        left = jax.random.normal(kl, (bond_dim,), dtype)
        right = jax.random.normal(kr, (bond_dim,), dtype)
        return cls(cores, left, right)

    @classmethod
    def from_dense(cls, vector, phys_dim, max_bond=None, cutoff=0.0):
        """Encode a dense ``(phys_dim**n,)`` state as an MPS (exact unless
        truncated by ``max_bond``/``cutoff``).

        Sequential left-to-right SVD (the standard tensor-train
        decomposition); returns the MPS in the framework's uniform stacked
        form.  Bond dimensions grow at most as ``min(d^k, d^(n-k))``.
        """
        vector = jnp.asarray(vector)
        n = 0
        size = vector.size
        while phys_dim ** n < size:
            n += 1
        if phys_dim ** n != size:
            raise ValueError(
                f"Vector of size {size} is not phys_dim**n for "
                f"phys_dim={phys_dim}"
            )
        from .dmrg import _rebuild_uniform

        tensors = []
        rest = vector.reshape(1, -1)
        r_prev = 1
        for _ in range(n - 1):
            mat = rest.reshape(r_prev * phys_dim, -1)
            u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
            k = s.shape[0]
            if max_bond is not None:
                k = min(k, max_bond)
            if cutoff > 0:
                above = int(jnp.sum(s > cutoff * s[0]))
                k = min(k, max(above, 1))
            u, s, vh = u[:, :k], s[:k], vh[:k]
            tensors.append(
                u.reshape(r_prev, phys_dim, k).transpose(1, 0, 2)
            )
            rest = s[:, None] * vh
            r_prev = k
        tensors.append(
            rest.reshape(r_prev, phys_dim, 1).transpose(1, 0, 2)
        )
        import numpy as np

        return _rebuild_uniform(tensors, np.asarray(vector).dtype)

    @classmethod
    def constant(cls, n_sites, phys_dim, bond_dim, fill=1.0,
                 dtype=jnp.float64):
        cores = jnp.full((n_sites, phys_dim, bond_dim, bond_dim), fill, dtype)
        boundary = jnp.ones((bond_dim,), dtype)
        return cls(cores, boundary, boundary)

    # -- properties ----------------------------------------------------- #

    @property
    def n_sites(self):
        return self.cores.shape[0]

    @property
    def phys_dim(self):
        return self.cores.shape[1]

    @property
    def bond_dim(self):
        return self.cores.shape[2]

    # -- contraction API ------------------------------------------------ #

    def evaluate(self, x, split_format=True, stabilize_every=1,
                 kernel="auto", remat_segments=None, sites_per_step=1):
        """Amplitudes ``psi(x_b)`` for a batch of inputs ``x: (B, N, d)``.

        Args:
            x: ``(B, N, d)`` input weights per site.
            split_format: return ``(mantissa, log_scale)`` (default) or the
                dense amplitudes.
            stabilize_every: rescale cadence.
            kernel: ``"auto"`` (shape-tuned: premix GEMM for small
                ``d * D``, per-physical-index square GEMMs for large —
                the measured v5e winners, see
                :func:`~contractn_tpu.ops.scan.mps_evaluate_auto`),
                ``"scan"`` (the plain per-site layout, needed for
                ``remat_segments``), or ``"pallas"`` (fused TPU kernel,
                carry resident in VMEM; interpreter mode off-TPU).
            remat_segments: checkpointed-segment count for sqrt(N)
                backward-pass memory on long chains (forces the
                ``"scan"`` kernel).
            sites_per_step: fuse this many sites per scan step
                (:func:`~contractn_tpu.ops.scan.mps_evaluate_fused`);
                requires ``N % sites_per_step == 0``.
        """
        if kernel == "pallas":
            from ..ops.pallas_mps import pallas_mps_evaluate

            on_tpu = any(d.platform == "tpu" for d in jax.devices())
            amp, log = pallas_mps_evaluate(
                self.cores, self.left, self.right, x,
                interpret=not on_tpu,
            )
        elif sites_per_step > 1:
            from ..ops.scan import mps_evaluate_fused

            amp, log = mps_evaluate_fused(
                self.cores, self.left, self.right, x,
                sites_per_step=sites_per_step,
                stabilize_every=stabilize_every,
            )
        elif kernel == "auto" and not remat_segments:
            from ..ops.scan import mps_evaluate_auto

            amp, log = mps_evaluate_auto(
                self.cores, self.left, self.right, x,
                stabilize_every=stabilize_every,
            )
        else:
            amp, log = mps_evaluate(
                self.cores, self.left, self.right, x,
                stabilize_every=stabilize_every,
                remat_segments=remat_segments,
            )
        return (amp, log) if split_format else destabilize(amp, log)

    def log_abs_amplitude(self, x):
        """``log |psi(x_b)|`` — the overflow-safe quantity for training."""
        amp, log = self.evaluate(x, split_format=True)
        return jnp.log(jnp.abs(amp)) + log

    def norm_squared(self, split_format=True):
        """``<psi|psi>`` via the density-matrix transfer scan."""
        val, log = mps_norm(self.cores, self.left, self.right)
        return (val, log) if split_format else destabilize(val, log)

    def log_norm(self):
        """``log <psi|psi>`` (always finite in split arithmetic)."""
        val, log = self.norm_squared()
        return jnp.log(jnp.abs(val)) + log

    def inner(self, other, split_format=True, conjugate=True):
        """Stabilized overlap ``<self|other>`` of two MPS with equal ``N, d``.

        The mixed transfer operator ``rho' = sum_d conj(A[d])^T rho B[d]``
        is applied as two GEMMs per site — the ``(D1*D2)^2`` transfer matrix
        is never formed.

        Args:
            conjugate: take ``self`` as a bra (default).  With ``False``
                the plain bilinear pairing ``(self, other)`` is computed —
                no complex conjugation anywhere — which is what closed-
                network contractions (e.g. the boundary-MPS sweep) need.
        """
        from ..ops.scan import _stab_step
        from ..ops.stabilize import dot_precision

        cj = jnp.conj if conjugate else (lambda t: t)
        prec = dot_precision(self.cores.dtype, other.cores.dtype)
        rho0 = jnp.outer(cj(self.left), other.left)
        log0 = jnp.zeros((), rho0.real.dtype)

        def step(carry, ab):
            rho, log = carry
            a, b = ab  # (d, D1, D1), (d, D2, D2)
            x = jnp.einsum("ij,djk->dik", rho, b, precision=prec)
            rho = jnp.einsum("dji,djk->ik", cj(a), x, precision=prec)
            rho, log = _stab_step(rho, log, 0)
            return (rho, log), None

        (rho, log), _ = jax.lax.scan(
            step, (rho0, log0), (self.cores, other.cores)
        )
        val = jnp.einsum("i,ij,j->", cj(self.right), rho, other.right,
                         precision=prec)
        val, log = _stab_step(val, log, 0)
        return (val, log) if split_format else destabilize(val, log)

    def site_expectations(self, op):
        """``<psi| O_i |psi> / <psi|psi>`` at EVERY site, one program.

        Left and right density environments come from two
        ``lax.scan``s (each environment renormalized per step; the
        factors cancel in the per-site ratio, so thousand-site chains
        never overflow), then all ``n`` one-site sandwiches evaluate as
        one ``vmap``.  ``op (d, d)``; returns ``(n,)``.
        """
        from ..ops.stabilize import dot_precision

        op = jnp.asarray(op)
        prec = dot_precision(self.cores.dtype, op.dtype)
        cores = self.cores

        def lstep(rho, a):
            new = jnp.einsum("ab,dax,dby->xy", rho, jnp.conj(a), a,
                             precision=prec)
            new = new / jnp.maximum(
                jnp.max(jnp.abs(new)), 1e-300)
            return new, rho  # emit the env BEFORE absorbing site i

        l0 = jnp.outer(jnp.conj(self.left), self.left)
        _, ls = jax.lax.scan(lstep, l0, cores)

        def rstep(rho, a):
            new = jnp.einsum("xy,dax,dby->ab", rho, jnp.conj(a), a,
                             precision=prec)
            new = new / jnp.maximum(
                jnp.max(jnp.abs(new)), 1e-300)
            return new, rho

        r0 = jnp.outer(jnp.conj(self.right), self.right)
        _, rs = jax.lax.scan(rstep, r0, cores, reverse=True)

        def one(l_env, a, r_env):
            # mixed dtypes promote inside einsum (never narrowed)
            num = jnp.einsum("ab,sax,st,tby,xy->", l_env, jnp.conj(a),
                             op, a, r_env, precision=prec)
            den = jnp.einsum("ab,sax,sby,xy->", l_env, jnp.conj(a), a,
                             r_env, precision=prec)
            return num / den

        return jax.vmap(one)(ls, cores, rs)

    # -- interop with the graph layer ----------------------------------- #

    def to_tn(self):
        """Materialize this MPS as a TN graph (norm layout ``<psi|psi>``
        is left to the caller; this returns the bare state with open
        physical modes)."""
        from ..network import TN

        tn = TN()
        n = self.n_sites
        if n == 1:
            only = np.einsum("i,dij,j->d", np.asarray(self.left),
                             np.asarray(self.cores[0]),
                             np.asarray(self.right))
            tn.add_dense_node(only)
            return tn
        first = np.einsum("i,dij->dj", np.asarray(self.left),
                          np.asarray(self.cores[0]))
        last = np.einsum("dij,j->di", np.asarray(self.cores[-1]),
                         np.asarray(self.right))
        nodes = [tn.add_dense_node(first)]
        for i in range(1, n - 1):
            nodes.append(tn.add_dense_node(np.asarray(self.cores[i])))
        if n > 1:
            nodes.append(tn.add_dense_node(last))
        for i in range(n - 1):
            tn.connect_nodes(nodes[i], nodes[i + 1], -1, -2 if i != n - 2 else -1)
        return tn
