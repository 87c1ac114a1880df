"""Round-4 tour: generative MPS, BP graph states, tree dynamics.

Three workflows the reference cannot express (SURVEY.md section 2 —
its surface is exact einsum contraction only):

1. An MPS Born machine trained by EXACT maximum likelihood on the
   bars-and-stripes dataset, then sampled — every generated image is a
   valid bar/stripe pattern.
2. A transverse-field Ising ground state on a LOOPY graph (the cube,
   3-regular) found by gradient descent through differentiable BP,
   then measured with BP observables.
3. A TDVP quench on a binary tree tensor network: energy conserved to
   machine precision while local observables evolve.

Run with: ``python examples/generative_and_graphs.py``
"""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

SX = np.array([[0.0, 1.0], [1.0, 0.0]])
SZ = np.diag([1.0, -1.0])


def bars_and_stripes(rows, cols):
    """All bar/stripe patterns of an (rows x cols) binary image."""
    pats = set()
    for bits in itertools.product([0, 1], repeat=rows):
        pats.add(tuple(np.repeat(bits, cols)))  # horizontal bars
    for bits in itertools.product([0, 1], repeat=cols):
        pats.add(tuple(np.tile(bits, rows)))    # vertical stripes
    return np.array(sorted(pats), dtype=np.int32)


def born_machine_demo():
    from contractn_tpu.models import born_machine, fit_born_machine, sample

    rows = cols = 3
    pats = bars_and_stripes(rows, cols)
    print(f"bars-and-stripes {rows}x{cols}: {len(pats)} patterns")
    rng = np.random.default_rng(0)
    data = pats[rng.integers(0, len(pats), size=4000)]

    model = born_machine(jax.random.PRNGKey(1), rows * cols, 2, 10)
    model, losses = fit_born_machine(model, data, steps=1500, lr=0.02)
    print(f"NLL {float(losses[0]):.3f} -> {float(losses[-1]):.4f} "
          f"(dataset entropy = {np.log(len(pats)):.4f})")

    samples, _ = sample(model, jax.random.PRNGKey(2), 500)
    valid = {tuple(p) for p in pats.tolist()}
    frac = np.mean([tuple(s) in valid for s in np.asarray(samples).tolist()])
    print(f"valid generated patterns: {100 * frac:.1f}%\n")


def bp_graph_demo():
    from contractn_tpu import TN, bp_ground_state, bp_measure

    # the cube: 8 vertices, 3-regular, girth 4 — beyond any chain/tree
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
             (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
    h, chi = 2.5, 3
    rng = np.random.default_rng(3)
    tn = TN()
    for i in range(8):
        tn.add_dense_node(0.3 * rng.standard_normal((2, chi, chi, chi)),
                          name=f"v{i}")
    mode_next = {i: 1 for i in range(8)}
    for a, b in edges:
        tn.connect_nodes(f"v{a}", f"v{b}", mode_next[a], mode_next[b])
        mode_next[a] += 1
        mode_next[b] += 1

    bonds = [(f"v{a}", f"v{b}", -np.kron(SZ, SZ)) for a, b in edges]
    local = [(f"v{i}", -h * SX) for i in range(8)]
    tn2, es = bp_ground_state(tn, bonds, local, steps=500, lr=0.03,
                              n_sweeps=25)
    print(f"cube TFIM (h={h}) BP energy: {float(es[0]):.3f} -> "
          f"{float(es[-1]):.6f}")
    loc, bnd = bp_measure(tn2, local=[("v0", SX)],
                          bonds=[("v0", "v1", np.kron(SZ, SZ))])
    print(f"<X> = {loc[0].real:.4f}   <ZZ> = {bnd[0].real:.4f}\n")


def ttn_tdvp_demo():
    from contractn_tpu.models import (product_mpo, random_ttn, tfim_mpo,
                                      ttn_energy, ttn_expectation,
                                      ttn_tdvp_evolve)

    n, h = 16, 1.5
    h_mpo = tfim_mpo(n, h=h)
    params = random_ttn(jax.random.PRNGKey(5), n, 2, 8)
    cparams = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.complex128), params)
    e0 = float(ttn_energy(cparams, h_mpo))
    zmpo = product_mpo(n, [(n // 2, SZ)], dtype=jnp.float64)

    def observe(p):
        return (float(ttn_energy(p, h_mpo)),
                float(jnp.real(ttn_expectation(p, zmpo))))

    params, vals = ttn_tdvp_evolve(h_mpo, params, 0.05, 10,
                                   observe=observe)
    drift = max(abs(e - e0) for e, _ in vals)
    print(f"TTN-TDVP on {n} sites: energy drift {drift:.2e} over "
          f"t = 0.5")
    print("  <Z_mid>(t):",
          " ".join(f"{z:+.4f}" for _, z in vals[::2]))


def infinite_sampling_demo():
    """Perfect Born-rule draws from an INFINITE state: no Metropolis,
    no autocorrelation — the generative counterpart of the
    thermodynamic-limit solvers."""
    import numpy as np

    from contractn_tpu.models import umps_sample, vumps
    from contractn_tpu.models.dmrg import tfim_mpo
    from contractn_tpu.models.umps import correlate

    g = vumps(tfim_mpo(2, h=1.3), 10, iters=100)
    al = np.asarray(g["al"])
    s = umps_sample(al, 8, 4096, jax.random.PRNGKey(3))
    z = 1.0 - 2.0 * s.astype(float)
    zz_est = float(np.mean(z[:, 0] * z[:, 2]))
    zz = float(np.real(correlate(al, SZ, SZ, [2])[0]))
    print(f"infinite-TFIM perfect sampling: <Z0 Z2> estimate "
          f"{zz_est:+.4f} vs exact {zz:+.4f} "
          f"(4096 draws, sigma ~ {1 / np.sqrt(4096):.4f})")


if __name__ == "__main__":
    born_machine_demo()
    bp_graph_demo()
    ttn_tdvp_demo()
    infinite_sampling_demo()
