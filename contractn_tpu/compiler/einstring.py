"""TN layout -> einsum specification.

The graph layer and the contraction engine are fully decoupled: a TN compiles
to ``(einsum_str, operand packing spec)`` and nothing else.  Copy (hyper)
nodes never appear as operands — their shared symbol occurring in several
terms (or in the output) *is* the hyperedge, which the engine lowers via
batch/diagonal index fusion rather than by materializing a diagonal tensor.

Ordering contract (parity with reference ``einsum.py:117-187``): einsum terms
appear in node-insertion order, output symbols in dangler-creation order, and
the operand list walks non-copy core nodes in insertion order.  Clone nodes
alias their base node's parameter slot — working weight sharing, which the
reference intended but shipped broken (defect D1, reference ``einsum.py:152``
tests the wrong type string).
"""

from ..utils.errors import TNError


def make_einstring(tn):
    """Einsum-style string for the TN, e.g. ``"ab,bc->ac"``.

    Copy nodes are skipped entirely: their single shared symbol showing up in
    two or more terms (or the output) encodes the hyperedge.
    """
    terms = []
    out_syms = []
    for node in tn.nodes(as_iter=True, copy_nodes=False, danglers=True):
        if node.dangler:
            out_syms.append(node.symbol)
        else:
            terms.append("".join(node.edge_symbols))
    return ",".join(terms) + "->" + "".join(out_syms)


def make_operand_spec(tn):
    """Describe how to assemble einsum operands from ``(params, inputs)``.

    Returns ``(slots, num_params, num_inputs)`` where ``slots`` is a tuple
    with one entry per einsum operand: ``("param", i)`` meaning the i-th
    parameter tensor, or ``("input", j)`` meaning the j-th input tensor.
    Clones map to their base node's parameter index.
    """
    slots = []
    param_index = {}  # dense node name -> parameter position
    num_inputs = 0
    for node in tn.nodes(as_iter=True, copy_nodes=False, danglers=False):
        nt = node.node_type
        if nt == "dense":
            param_index[node.name] = len(param_index)
            slots.append(("param", param_index[node.name]))
        elif nt == "clone":
            base_name = node.base_node.name
            if base_name not in param_index:
                raise TNError(
                    f"Clone '{node.name}' references base node '{base_name}' "
                    "which is not a dense node of this TN"
                )
            slots.append(("param", param_index[base_name]))
        elif nt == "input":
            slots.append(("input", num_inputs))
            num_inputs += 1
        else:  # pragma: no cover - copy nodes are filtered out above
            raise TNError(f"Unexpected operand node type '{nt}'")
    return tuple(slots), len(param_index), num_inputs


def make_arg_packer(tn):
    """Build ``arg_packer(params, inputs) -> operands`` for this layout."""
    slots, num_params, num_inputs = make_operand_spec(tn)

    def arg_packer(params, inputs=()):
        if len(params) != num_params:
            raise TNError(f"Expected {num_params} params, got {len(params)}")
        if len(inputs) != num_inputs:
            raise TNError(f"Expected {num_inputs} inputs, got {len(inputs)}")
        return tuple(
            params[i] if kind == "param" else inputs[i] for kind, i in slots
        )

    return arg_packer
