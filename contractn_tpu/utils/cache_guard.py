"""Guard against jaxlib's compiled-executable accumulation crash.

Reproduced in round 3 (see ``tests/conftest.py``): a single process
that keeps compiling COMPLEX programs (scan/eigh/shard_map-heavy — the
exact shape of phase scans, per-momentum spectra, or optimization loops
over changing shapes) segfaults inside jaxlib's
``backend_compile_and_load`` after a few hundred live executables.
The crash is position-dependent, not test-dependent, and independent of
free RAM; the only known mitigation is dropping the compiled-program
caches periodically, which is cheap (recompiles are rare in steady
loops because steady loops reuse shapes — the hazard IS the many-shape
workload, and that workload pays one recompile per shape either way).

Two user-facing forms:

* :func:`cache_guard` — a context manager / decorator that clears the
  caches on exit (wrap each outer iteration of a long campaign);
* :class:`CompileGuard` — an object whose :meth:`tick` clears every
  ``every_n`` *newly compiled* programs (cheap to call every iteration:
  it reads jax's live compilation counter instead of guessing).

The long-loop drivers in this package (``ipeps_cell_scan`` family) run
as ONE jitted program per call and are not themselves at risk; the
guard is for USER loops that call many differently-shaped entry points
from one process.  Documented in README ("Long-running processes").
"""

import contextlib

import jax


_compiles = {"n": 0, "registered": False}


def _listener(event, *args, **kwargs):
    if event == "/jax/core/compile/backend_compile_duration":
        _compiles["n"] += 1


def _compiled_count():
    """MONOTONIC count of backend compiles in this process (counts
    survive ``jax.clear_caches``, unlike jit-cache miss counters),
    via jax's monitoring event stream; -1 if unavailable (callers then
    fall back to call counting)."""
    if not _compiles["registered"]:
        try:
            from jax._src import monitoring

            monitoring.register_event_duration_secs_listener(_listener)
            _compiles["registered"] = True
        except Exception:
            return -1
    return _compiles["n"]


@contextlib.contextmanager
def cache_guard():
    """Clear jax's compiled-program caches when the block exits.

    Usage::

        for mu in mu_grid:                 # many shapes / programs
            with cache_guard():
                results.append(expensive_scan(mu))
    """
    try:
        yield
    finally:
        jax.clear_caches()


class CompileGuard:
    """Clears jax caches after every ``every_n`` NEW compilations.

    Call :meth:`tick` once per outer iteration::

        guard = CompileGuard(every_n=100)
        for point in grid:
            run(point)
            guard.tick()

    ``every_n=100`` keeps a process far from the ~300-executable crash
    region while amortizing recompiles.  When the compilation counter is
    unavailable (older jaxlib), ``tick`` falls back to clearing every
    ``every_n`` calls.
    """

    def __init__(self, every_n=100):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = int(every_n)
        self._base = _compiled_count()
        self._calls = 0
        self.clears = 0

    def tick(self):
        """Clear the caches if enough new programs accumulated.

        Returns True when a clear happened."""
        self._calls += 1
        count = _compiled_count()
        if count >= 0 and self._base >= 0:
            due = (count - self._base) >= self.every_n
        else:
            due = (self._calls % self.every_n) == 0
        if due:
            jax.clear_caches()
            self._base = _compiled_count()
            self.clears += 1
            return True
        return False
