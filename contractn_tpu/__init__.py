"""contractn_tpu — a TPU-native tensor-network framework.

Tensor networks are defined as graphs of typed nodes (dense cores,
weight-sharing clones, copy-tensor hyperedges, runtime inputs) and compiled
into stabilized einsum contractions executed as jitted JAX/XLA programs.

Public API parity target: jemisjoky/ContracTN
(``/root/reference/contractn/__init__.py``) — ``TN``, ``Node``, ``Edge``,
``contract`` — re-designed TPU-first: opt_einsum paths baked into XLA
programs, copy tensors lowered by index fusion, split-format stabilization
fused into the contraction, log-depth tree reduction for long chains, and
free ``jit`` / ``grad`` / ``vmap`` over the whole pipeline.
"""

from .network import TN
from .nodes import Node
from .edges import Edge
from .compiler.engine import contract
from .compiler.expression import contract_expression
from .compiler.bp import bp_contract, bp_environment
from .compiler.bp_gauge import bp_gauge, bp_norm, bp_truncate
from .compiler.bp_measure import bp_measure
from .compiler.bp_update import bp_apply_gates, gate_from_term
from .compiler.bp_variational import (
    bp_energy,
    bp_ground_state,
    make_bp_energy,
)
from .ops.stabilize import stabilize, destabilize
from .utils.errors import TNError

__version__ = "0.1.0"

__all__ = [
    "TN",
    "Node",
    "Edge",
    "contract",
    "contract_expression",
    "bp_contract",
    "bp_environment",
    "bp_apply_gates",
    "bp_gauge",
    "bp_energy",
    "bp_ground_state",
    "bp_measure",
    "make_bp_energy",
    "bp_norm",
    "bp_truncate",
    "gate_from_term",
    "stabilize",
    "destabilize",
    "TNError",
    "__version__",
]
