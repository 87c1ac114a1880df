"""Native (C++) runtime components, bound through ctypes.

Currently: the greedy contraction-path optimizer (``pathopt.cpp``).  The
shared library is built on demand with the system ``g++`` the first time it
is needed and cached next to the source; if no compiler is available the
engine silently falls back to opt_einsum's Python optimizers, so the native
layer is an accelerator, never a hard dependency.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pathopt.cpp")
_LIB = os.path.join(_DIR, "libpathopt.so")
_STAMP = _LIB + ".srchash"  # sha256 of the source the .so was built from

_lock = threading.Lock()
_lib = None
_load_failed = False


def _src_hash():
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash):
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    with open(_STAMP, "w") as f:
        f.write(src_hash)


def _load():
    """Load (building if needed) the native library; None when unavailable.

    Staleness is decided by a content hash of ``pathopt.cpp`` recorded at
    build time (never mtimes, which are all checkout time after a fresh
    clone), so the library in use is always one compiled from the reviewed
    source on this machine — prebuilt binaries are never trusted.
    """
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            src_hash = _src_hash()
            stamp = None
            if os.path.exists(_STAMP):
                with open(_STAMP) as f:
                    stamp = f.read().strip()
            if not os.path.exists(_LIB) or stamp != src_hash:
                _build(src_hash)
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
