"""Value and einsum-string parity with the reference's documented examples.

Pins the three README examples (``/root/reference/README.md:16-77``) to their
published outputs, byte-for-byte for einsum strings and to 1e-10 relative
tolerance for values (BASELINE.md targets).
"""

import numpy as np

from contractn_tpu import TN


def test_copy_tensor_example():
    """Order-101 copy tensor with 100 vectors -> [1., 0.99**100]."""
    tn = TN()
    copy_node = tn.add_copy_node(101)
    for i in range(100):
        vec_node = tn.add_dense_node(np.array([1, 0.99]))
        tn.connect_nodes(copy_node, vec_node, i, 0)
    out = np.asarray(tn.contract())
    assert np.allclose(out, [1.0, 0.99 ** 100], rtol=1e-10)


def test_cp_tucker_einsum_strings():
    """CP and Tucker einstrings match the reference byte-for-byte."""
    cp, tucker = TN(), TN()
    cp_hub = cp.add_copy_node(3)
    tucker_hub = tucker.add_dense_node(np.ones((4, 4, 4)))
    for i in range(3):
        mat = np.eye(4, 10)
        cp_mat = cp.add_dense_node(mat)
        tucker_mat = tucker.add_dense_node(mat)
        cp.connect_nodes(cp_hub, cp_mat, i, 0)
        tucker.connect_nodes(tucker_hub, tucker_mat, i, 0)
    assert cp.einsum_str == "ac,ad,ae->cde"
    assert tucker.einsum_str == "abc,ae,bf,cg->efg"


def test_stable_contraction_1000_chain():
    """1000-link all-ones 3x3 chain: plain overflows, split format is exact."""
    tn = TN()
    prev = tn.add_dense_node(np.ones((3,)))
    for _ in range(1000):
        mat = tn.add_dense_node(np.ones((3, 3)))
        tn.connect_nodes(prev, mat, -1, 0)
        prev = mat

    plain = np.asarray(tn.contract())
    assert np.all(np.isinf(plain))  # overflow by design (README.md:74)

    mant, log = tn.contract(split_format=True)
    assert np.allclose(np.asarray(mant), [1.0, 1.0, 1.0], rtol=1e-10)
    assert np.isclose(float(log), 1000 * np.log(3.0), rtol=1e-12)
    # Published value: 1098.61228867 (README.md:76)
    assert abs(float(log) - 1098.61228867) < 1e-6
