"""The three canonical workflows (parity with the reference's
``notebooks/ctn_examples.ipynb`` / README), runnable as a script.

Run with: ``python examples/readme_examples.py``
"""

import time

import numpy as np

from contractn_tpu import TN


def copy_tensor_example():
    """Order-101 copy tensor joined to 100 vectors."""
    tn = TN()
    copy_node = tn.add_copy_node(101)
    for i in range(100):
        vec_node = tn.add_dense_node(np.array([1, 0.99]))
        tn.connect_nodes(copy_node, vec_node, i, 0)
    print("copy example:", np.asarray(tn.contract()))  # [1., 0.36603234]
    t0 = time.perf_counter()
    tn.contract()
    print(f"  warm contract: {(time.perf_counter() - t0) * 1e3:.2f} ms")


def einsum_string_example():
    """CP vs Tucker hubs compile to the documented einsum strings."""
    cp, tucker = TN(), TN()
    cp_hub = cp.add_copy_node(3)
    tucker_hub = tucker.add_dense_node(np.ones((4, 4, 4)))
    for i in range(3):
        mat = np.eye(4, 10)
        cp.connect_nodes(cp_hub, cp.add_dense_node(mat), i, 0)
        tucker.connect_nodes(tucker_hub, tucker.add_dense_node(mat), i, 0)
    print("cp einsum_str:    ", cp.einsum_str)      # ac,ad,ae->cde
    print("tucker einsum_str:", tucker.einsum_str)  # abc,ae,bf,cg->efg


def stable_contraction_example():
    """1000-link all-ones chain: plain overflows, split format is exact."""
    tn = TN()
    prev = tn.add_dense_node(np.ones((3,)))
    for _ in range(1000):
        mat = tn.add_dense_node(np.ones((3, 3)))
        tn.connect_nodes(prev, mat, -1, 0)
        prev = mat
    print("plain contract:", np.asarray(tn.contract()))  # [inf inf inf]
    mant, log = tn.contract(split_format=True)
    print("split format:  ", np.asarray(mant), float(log))  # [1,1,1], 1098.61...


if __name__ == "__main__":
    copy_tensor_example()
    einsum_string_example()
    stable_contraction_example()
