"""Native (C++) runtime components, bound through ctypes.

Currently: the greedy contraction-path optimizer (``pathopt.cpp``).  The
shared library is built on demand with the system ``g++`` the first time it
is needed and cached next to the source; if no compiler is available the
engine silently falls back to opt_einsum's Python optimizers, so the native
layer is an accelerator, never a hard dependency.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pathopt.cpp")
_LIB = os.path.join(_DIR, "libpathopt.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.ctn_greedy_path.restype = ctypes.c_int32
            lib.ctn_greedy_path.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            if lib.ctn_pathopt_abi_version() != 1:
                raise OSError("pathopt ABI version mismatch")
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def native_available():
    """Whether the C++ path optimizer can be used in this environment."""
    return _load() is not None


def greedy_path(terms, output, sym_dims):
    """Find a pairwise contraction path with the native greedy optimizer.

    Args:
        terms: sequence of index-symbol sequences (one per operand), symbols
            being any hashables.
        output: sequence of output symbols.
        sym_dims: mapping symbol -> dimension.

    Returns:
        List of ``(i, j)`` position pairs in opt_einsum path convention, or
        None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    sym_ids = {}
    for term in terms:
        for s in term:
            sym_ids.setdefault(s, len(sym_ids))
    for s in output:
        sym_ids.setdefault(s, len(sym_ids))

    flat = []
    offsets = [0]
    for term in terms:
        flat.extend(sym_ids[s] for s in term)
        offsets.append(len(flat))
    dims = np.ones(max(len(sym_ids), 1), np.float64)
    for s, i in sym_ids.items():
        dims[i] = float(sym_dims[s])
    out_syms = np.asarray(
        sorted({sym_ids[s] for s in output}), np.int32
    ).reshape(-1)
    flat = np.asarray(flat, np.int32).reshape(-1)
    offsets = np.asarray(offsets, np.int32)
    n_terms = len(terms)
    out_pairs = np.empty(max(2 * (n_terms - 1), 1), np.int32)

    n_steps = lib.ctn_greedy_path(
        n_terms, offsets, flat, len(dims), dims,
        len(out_syms), out_syms, out_pairs,
    )
    if n_steps < 0:
        return None
    return [
        (int(out_pairs[2 * k]), int(out_pairs[2 * k + 1]))
        for k in range(n_steps)
    ]
