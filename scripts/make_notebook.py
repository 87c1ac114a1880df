"""Generate examples/ctn_tpu_examples.ipynb with RECORDED outputs.

Runs the three canonical reference workflows (README parity) plus the
framework's additive capabilities, capturing real stdout into notebook
cells — the reference ships the same artifact as
``contractn/notebooks/ctn_examples.ipynb``.

    PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        python scripts/make_notebook.py
"""

import contextlib
import io
import json
import os
import sys

CELLS_SRC = [
    ("markdown", """\
# contractn_tpu — worked examples

The three workflows from the reference README (copy tensors, einsum-string
specification, stabilized long products), executed on this framework, plus
the TPU-native extras.  Outputs below are recorded from a real run."""),
    ("code", """\
import numpy as np
from contractn_tpu import TN

# 1. Copy tensors: an order-101 hyperedge never materializes its 2**101
# elements — it lowers to a repeated einsum index.
tn = TN()
hub = tn.add_copy_node(101, dim=2)
for i in range(100):
    vec = tn.add_dense_node(np.array([1.0, 0.99]))
    tn.connect_nodes(hub, vec, i, 0)
print(tn.contract())  # [1, 0.99**100]"""),
    ("code", """\
# 2. Einsum strings as the network spec: CP and Tucker factorizations
cp = TN()
core = cp.add_copy_node(3, dim=4)
for i in range(3):
    cp.connect_nodes(core, cp.add_dense_node(np.random.randn(4, 5)), i, 0)
print("CP    :", cp.einsum_str)

tk = TN()
g = tk.add_dense_node(np.random.randn(4, 4, 4))
for i in range(3):
    tk.connect_nodes(g, tk.add_dense_node(np.random.randn(4, 6)), i, 0)
print("Tucker:", tk.einsum_str)"""),
    ("code", """\
# 3. Stabilized contraction: 1000 all-ones 3x3 matrices overflow any
# float format dense -- the split format returns the value exactly.
chain = TN()
prev = chain.add_dense_node(np.ones((3, 3)))
for _ in range(999):
    nxt = chain.add_dense_node(np.ones((3, 3)))
    chain.connect_nodes(prev, nxt, 1, 0)
    prev = nxt
chain.connect_nodes(prev, chain.add_dense_node(np.ones(3)), 1, 0)
print("plain :", chain.contract())
mantissa, log_scale = chain.contract(split_format=True)
print("split :", np.asarray(mantissa), float(log_scale))
print("1000 ln 3 =", 1000 * np.log(3.0))"""),
    ("code", """\
# Thermodynamic limit: three infinite-chain algorithms cross-validating
import numpy as np
from contractn_tpu.models import idmrg, tfim_mpo, vumps
from contractn_tpu.models.itebd import itebd_ground_state, tfim_h2

exact = -4 / np.pi  # critical TFIM bulk energy (Pfeuty)
_, e_itebd = itebd_ground_state(tfim_h2(), bond_dim=12)
e_idmrg, _ = idmrg(tfim_mpo(2), max_bond=16, steps=40)
e_vumps = vumps(tfim_mpo(2), bond_dim=12, iters=20)["energy"]
print(f"exact  {exact:.10f}")
print(f"iTEBD  {e_itebd:.10f}   (Trotterized gates)")
print(f"iDMRG  {e_idmrg:.10f}   (infinite-system growth)")
print(f"VUMPS  {e_vumps:.10f}   (variational, no Trotter error)")"""),
    ("code", """\
# TPU-native extras: first-class MPS with batched evaluation, DMRG, TDVP
import jax, jax.numpy as jnp
from contractn_tpu.models import MPS, dmrg, tfim_mpo, tdvp_evolve

mpo = tfim_mpo(12)
mps0 = MPS.random(jax.random.PRNGKey(0), 12, 2, 8, dtype=jnp.float64)
ground, energy, _ = dmrg(mpo, mps0, max_bond=8, sweeps=3)
print("TFIM(12) DMRG ground energy:", round(energy, 8))

evolved, energies = tdvp_evolve(mpo, mps0, dt=0.1, n_steps=5,
                                max_bond=8, imaginary=True)
print("imaginary-time TDVP energies:", [round(e, 4) for e in energies])"""),
    ("code", '''\
# Generative models: an MPS Born machine trained by EXACT max-likelihood
import itertools
from contractn_tpu.models import born_machine, fit_born_machine, sample

pats = sorted({tuple(np.repeat(b, 3)) for b in
               itertools.product([0, 1], repeat=3)} |
              {tuple(np.tile(b, 3)) for b in
               itertools.product([0, 1], repeat=3)})
data = np.array(pats)[np.random.default_rng(0).integers(0, len(pats), 3000)]
model = born_machine(jax.random.PRNGKey(1), 9, 2, 10)
model, nll = fit_born_machine(model, data, steps=900, lr=0.02)
print(f"NLL {float(nll[0]):.2f} -> {float(nll[-1]):.4f}"
      f"  (bars-and-stripes entropy = {np.log(len(pats)):.4f})")
draws, _ = sample(model, jax.random.PRNGKey(2), 300)
ok = np.mean([tuple(s) in set(map(tuple, pats))
              for s in np.asarray(draws).tolist()])
print(f"valid generated patterns: {100 * ok:.1f}%")'''),
    ("code", '''\
# Arbitrary graphs via belief propagation: TFIM ground state on the cube
from contractn_tpu import bp_ground_state, bp_measure

SX = np.array([[0.0, 1.0], [1.0, 0.0]]); SZ = np.diag([1.0, -1.0])
edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
         (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
rng = np.random.default_rng(3)
g = TN()
for i in range(8):
    g.add_dense_node(0.3 * rng.standard_normal((2, 3, 3, 3)), name=f"v{i}")
nxt = {i: 1 for i in range(8)}
for a, b in edges:
    g.connect_nodes(f"v{a}", f"v{b}", nxt[a], nxt[b])
    nxt[a] += 1; nxt[b] += 1
bonds = [(f"v{a}", f"v{b}", -np.kron(SZ, SZ)) for a, b in edges]
local = [(f"v{i}", -2.5 * SX) for i in range(8)]
g2, es = bp_ground_state(g, bonds, local, steps=300, lr=0.03)
loc, _ = bp_measure(g2, local=[("v0", SX)])
print(f"Bethe energy {float(es[0]):.2f} -> {float(es[-1]):.5f};"
      f"  <X> = {loc[0].real:.4f}")'''),
]


def main():
    nb_cells = []
    glb = {"__name__": "__main__"}  # shared across cells, like a kernel
    __import__("numpy").random.seed(0)
    for kind, src in CELLS_SRC:
        if kind == "markdown":
            nb_cells.append({
                "cell_type": "markdown",
                "metadata": {},
                "source": src.splitlines(keepends=True),
            })
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, "<cell>", "exec"), glb)  # noqa: S102
        nb_cells.append({
            "cell_type": "code",
            "execution_count": None,
            "metadata": {},
            "source": src.splitlines(keepends=True),
            "outputs": [{
                "name": "stdout",
                "output_type": "stream",
                "text": buf.getvalue().splitlines(keepends=True),
            }] if buf.getvalue() else [],
        })

    nb = {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    out = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "ctn_tpu_examples.ipynb")
    with open(out, "w") as f:
        json.dump(nb, f, indent=1)
    print("wrote", out, file=sys.stderr)


if __name__ == "__main__":
    main()
