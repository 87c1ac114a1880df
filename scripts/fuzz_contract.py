"""End-to-end contraction fuzzer: random TNs, jax engine vs numpy oracle.

Builds random networks mixing all node types with random wiring, contracts
through both the jitted JAX engine and the eager numpy oracle, and checks
agreement.  Run standalone (not part of the test suite — it is a soak
tool):

    PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        python scripts/fuzz_contract.py [n_iterations] [base_seed]
"""

import sys

import numpy as np

from contractn_tpu import TN, TNError


def random_tn(rng):
    tn = TN()
    nodes = []
    n_nodes = int(rng.integers(2, 8))
    for _ in range(n_nodes):
        kind = rng.choice(["dense", "dense", "copy", "clone", "input"])
        if kind == "dense" or (kind == "clone" and not any(
            n.node_type == "dense" for n in nodes
        )):
            order = int(rng.integers(1, 4))
            dims = tuple(int(rng.integers(2, 4)) for _ in range(order))
            nodes.append(tn.add_dense_node(rng.standard_normal(dims)))
        elif kind == "copy":
            nodes.append(
                tn.add_copy_node(int(rng.integers(1, 4)),
                                 dim=int(rng.integers(2, 4)))
            )
        elif kind == "clone":
            dense = [n for n in nodes if n.node_type == "dense"]
            nodes.append(tn.add_duplicate_node(dense[rng.integers(len(dense))]))
        else:
            order = int(rng.integers(1, 3))
            dims = tuple(int(rng.integers(2, 4)) for _ in range(order))
            nodes.append(tn.add_input_node(dims))

    # random wiring among open, dimension-compatible modes
    n_connects = int(rng.integers(0, 2 * n_nodes))
    for _ in range(n_connects):
        open_modes = []
        for n in nodes:
            for i in range(n.ndim):
                if n[i].dangler:
                    open_modes.append((n, i))
        if len(open_modes) < 2:
            break
        k1 = int(rng.integers(len(open_modes)))
        n1, i1 = open_modes[k1]
        d1 = n1.shape[i1]
        compat = [
            (n2, i2) for n2, i2 in open_modes
            if (n2, i2) != (n1, i1)
            and (d1 < 0 or n2.shape[i2] < 0 or n2.shape[i2] == d1)
            and n1[i1] is not n2[i2]
        ]
        if not compat:
            continue
        n2, i2 = compat[int(rng.integers(len(compat)))]
        try:
            tn.connect_nodes(n1, n2, i1, i2)
        except TNError:
            pass
    return tn


def check_one(seed):
    rng = np.random.default_rng(seed)
    tn = random_tn(rng)
    # concrete inputs for input nodes
    inputs = []
    for node in tn.nodes(as_iter=True):
        if node.node_type == "input":
            shape = tuple(2 if d < 0 else d for d in node.shape)
            inputs.append(rng.standard_normal(shape))
    # a copy cluster may be fully dangling -> undetermined output dim
    try:
        ref = tn.contract(inputs=tuple(inputs), backend="numpy",
                          split_format=True)
    except (TNError, ValueError) as e:
        return "skip", str(e)[:60]
    got = tn.contract(inputs=tuple(inputs), split_format=True)
    m1, l1 = np.asarray(ref[0]), float(ref[1])
    m2, l2 = np.asarray(got[0]), float(got[1])
    v1 = m1 * np.exp(l1)
    v2 = m2 * np.exp(l2)
    scale = max(np.max(np.abs(v1)), 1e-30)
    if not np.allclose(v1, v2, rtol=1e-7, atol=1e-9 * scale):
        return "FAIL", (tn.einsum_str, v1, v2)
    return "ok", None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    stats = {"ok": 0, "skip": 0, "FAIL": 0}
    failures = []
    for k in range(n):
        status, info = check_one(base + k)
        stats[status] += 1
        if status == "FAIL":
            failures.append((base + k, info))
            print(f"FAIL seed={base + k}: {info[0]}")
    print(f"fuzz: {stats}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
