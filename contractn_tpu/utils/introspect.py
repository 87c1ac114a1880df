"""Contraction introspection and compile-time observability.

The reference computes an opt_einsum path and throws away every statistic
attached to it (``einsum.py:318-323`` keeps only the call list).  Here the
path metadata — FLOP estimate, largest intermediate, scaling, the path
itself — is a first-class query, and the XLA side exposes structured
trace/lower/compile timings (the "graph -> HLO compile ms" BASELINE metric).
"""

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import jax
import opt_einsum as oe


@dataclass
class ContractionInfo:
    """Static cost model of a TN contraction, from the opt_einsum optimizer."""

    einsum_str: str
    shapes: Tuple[Tuple[int, ...], ...]
    path: List[Tuple[int, ...]]
    flops: float  # total scalar ops estimated for the contraction
    largest_intermediate: float  # elements
    opt_cost: float  # optimizer's internal cost metric
    speedup_vs_naive: float
    per_step: List[str] = field(default_factory=list)

    def __str__(self):
        lines = [
            f"einsum: {self.einsum_str}",
            f"path: {self.path}",
            f"estimated FLOPs: {self.flops:.3g}",
            f"largest intermediate: {self.largest_intermediate:.3g} elements",
            f"speedup vs naive: {self.speedup_vs_naive:.3g}x",
        ]
        return "\n".join(lines)


def contraction_info(tn, optimize="auto", inputs_shapes=None,
                     memory_limit=None):
    """Cost-model a TN's contraction without executing it.

    Args:
        tn: the tensor network.
        optimize: path strategy (as in ``contract``).
        inputs_shapes: shapes for input nodes (required if the TN has any).
        memory_limit: optional bound on intermediate size.

    Returns:
        A :class:`ContractionInfo`.
    """
    from ..compiler.einstring import make_einstring, make_operand_spec

    einstr = make_einstring(tn)
    slots, num_params, num_inputs = make_operand_spec(tn)
    param_shapes = [tuple(p.shape) for p in tn.params]
    inputs_shapes = [tuple(s) for s in (inputs_shapes or [])]
    if len(inputs_shapes) != num_inputs:
        raise ValueError(
            f"TN has {num_inputs} input nodes; got {len(inputs_shapes)} "
            "shapes in inputs_shapes"
        )
    shapes = tuple(
        param_shapes[i] if kind == "param" else inputs_shapes[i]
        for kind, i in slots
    )
    from ..compiler.engine import _freeze, _resolve_optimize

    opt = _resolve_optimize(einstr, shapes, _freeze(optimize))
    if isinstance(opt, tuple):  # explicit path, thaw for opt_einsum
        opt = [tuple(p) for p in opt]
    path, info = oe.contract_path(
        einstr, *shapes, shapes=True, optimize=opt,
        memory_limit=memory_limit,
    )
    return ContractionInfo(
        einsum_str=einstr,
        shapes=shapes,
        path=list(path),
        flops=float(info.opt_cost),
        largest_intermediate=float(info.largest_intermediate),
        opt_cost=float(info.opt_cost),
        speedup_vs_naive=float(info.speedup) if info.speedup else 1.0,
        per_step=str(info).splitlines(),
    )


@dataclass
class CompileStats:
    """Wall-clock breakdown of staging a jitted contraction."""

    trace_ms: float
    lower_ms: float
    compile_ms: float
    flops_estimate: float | None = None

    @property
    def total_ms(self):
        return self.trace_ms + self.lower_ms + self.compile_ms


def compile_stats(fn, *args, **kwargs):
    """Measure trace / lower / XLA-compile time of ``fn`` on ``args``.

    ``fn`` is any jittable callable.  Returns ``(compiled, CompileStats)``
    where ``compiled`` is the ready-to-run executable.  This is the
    "graph -> HLO compile ms" metric from BASELINE.md, split by stage.
    """
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    traced = jitted.trace(*args, **kwargs)
    t1 = time.perf_counter()
    lowered = traced.lower()
    t2 = time.perf_counter()
    compiled = lowered.compile()
    t3 = time.perf_counter()
    flops = None
    try:
        analysis = compiled.cost_analysis()
        if analysis:
            entry = analysis[0] if isinstance(analysis, list) else analysis
            flops = entry.get("flops")
    except Exception:
        pass
    return compiled, CompileStats(
        trace_ms=(t1 - t0) * 1e3,
        lower_ms=(t2 - t1) * 1e3,
        compile_ms=(t3 - t2) * 1e3,
        flops_estimate=flops,
    )


class Timings:
    """Tiny structured-timing registry for library-internal phases.

    Usage::

        with Timings.measure("path_find"):
            ...
        Timings.report()  # {"path_find": [ms, ...]}
    """

    _records: Dict[str, List[float]] = {}
    enabled: bool = False

    class _Ctx:
        def __init__(self, name):
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            if Timings.enabled:
                Timings._records.setdefault(self.name, []).append(
                    (time.perf_counter() - self.t0) * 1e3
                )

    @classmethod
    def measure(cls, name) -> Any:
        return cls._Ctx(name)

    @classmethod
    def report(cls) -> Dict[str, List[float]]:
        return dict(cls._records)

    @classmethod
    def reset(cls) -> None:
        cls._records.clear()


from contextlib import contextmanager  # noqa: E402


@contextmanager
def profile_trace(log_dir):
    """Capture a device profile around a block of work.

    Thin wrapper over ``jax.profiler`` producing a TensorBoard/XProf
    trace directory — the device-level complement to the host-side
    :class:`Timings` phases.  Usage::

        with profile_trace("/tmp/tn_trace"):
            tn.contract()
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
