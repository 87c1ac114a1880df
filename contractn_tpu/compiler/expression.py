"""First-class compiled contraction expressions.

``TN.compile(...)`` returns a :class:`CompiledContraction`: a reusable,
introspectable handle over the jitted contraction program — the TPU-native
analog of ``opt_einsum.contract_expression`` and the natural seam the
reference exposed as ``make_contract_fun`` (``ctn.py:349-387``), upgraded
with cost-model and compile-time observability.
"""

from ..utils.introspect import CompileStats, compile_stats


def contract_expression(einstr, *shapes, optimize="auto",
                        split_format=False, **kwargs):
    """Standalone reusable einsum expression (opt_einsum-style).

    ``expr = contract_expression("ab,bc->ac", (8, 8), (8, 8))`` builds the
    jitted program for that signature once; ``expr(x, y)`` then contracts
    with zero path-finding or retracing cost.  Thin wrapper over
    :func:`contractn_tpu.compiler.engine.contract`, whose caches do the
    heavy lifting — provided for drop-in familiarity.
    """
    from .engine import contract as _contract

    shapes = tuple(tuple(int(d) for d in s) for s in shapes)

    def expr(*tensors):
        given = tuple(tuple(int(d) for d in t.shape) for t in tensors)
        if given != shapes:
            raise ValueError(
                f"Expression built for shapes {shapes}, got {given}"
            )
        return _contract(
            einstr, *tensors, optimize=optimize,
            split_format=split_format, **kwargs
        )

    expr.einsum_str = einstr
    expr.shapes = shapes
    return expr


class CompiledContraction:
    """Reusable contraction with attached cost model and compile metrics."""

    def __init__(self, tn, optimize="auto", split_format=False, **kwargs):
        self._tn = tn
        self.optimize = optimize
        self.split_format = split_format
        self.einsum_str = tn.einsum_str
        self._fn = tn.make_contract_fun(
            optimize=optimize, split_format=split_format, **kwargs
        )
        self._info = None
        self.stats: CompileStats | None = None

    def __call__(self, params=None, inputs=()):
        """Contract; ``params`` defaults to the TN's current tensors."""
        if params is None:
            params = self._tn.params
        return self._fn(params, inputs)

    def info(self, inputs_shapes=None):
        """Static cost model (FLOPs, largest intermediate, path)."""
        if self._info is None:
            opt = self.optimize if isinstance(self.optimize, str) else "auto"
            if opt == "native-greedy":
                opt = "greedy"
            self._info = self._tn.contraction_info(
                optimize=opt, inputs_shapes=inputs_shapes
            )
        return self._info

    def measure_compile(self, params=None, inputs=()):
        """Stage the program ahead of time; records trace/lower/compile ms.

        Returns the populated :class:`CompileStats` (also kept on
        ``self.stats``) — the BASELINE "graph -> HLO compile ms" metric.
        """
        if params is None:
            params = self._tn.params
        _, self.stats = compile_stats(
            lambda p, i: self._fn(p, i), tuple(params), tuple(inputs)
        )
        return self.stats

    def __repr__(self):
        return (
            f"CompiledContraction({self.einsum_str!r}, "
            f"optimize={self.optimize!r}, split_format={self.split_format})"
        )
