"""Native (C++) data-plane components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host-side data plane — HITRAN
line-file parsing and line accumulation for lookup-table construction — has a
native implementation here (hitran_native.cpp), compiled on demand with g++
and loaded through ctypes.  Everything degrades gracefully: if no compiler is
available the NumPy/JAX fallbacks in climatemodel_tpu.spectral.hitran are used
(results are identical; tests compare the backends).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, 'hitran_native.cpp')
_LIB = os.path.join(_DIR, '_hitran_native.so')
_lock = threading.Lock()
_lib = None
_tried = False


def build(force=False):
    """Compile the shared library with g++ (-O3 -fPIC -fopenmp).

    Rebuilds automatically when the source is newer than an existing .so
    (a prebuilt library must not silently shadow source edits — r04 review
    finding)."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-fopenmp', '-o', _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        # retry without OpenMP (always available toolchains vary)
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            if os.path.exists(_LIB) and not force:
                return _LIB        # no compiler: a stale .so beats none
            raise
    return _LIB


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception:
            return None
        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_long_p = ctypes.POINTER(ctypes.c_long)
        lib.table_dims.argtypes = [ctypes.c_char_p, ctypes.c_long, c_long_p,
                                   c_long_p]
        lib.table_dims.restype = ctypes.c_int
        lib.parse_table.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                    ctypes.c_long, ctypes.c_long, c_double_p]
        lib.parse_table.restype = ctypes.c_long
        lib.accumulate_lines.argtypes = [
            c_double_p, c_double_p, ctypes.c_long,          # p, T, np
            c_double_p, ctypes.c_long, ctypes.c_double,     # nu, nnu, dnu
            c_double_p, c_double_p, c_double_p, c_double_p,  # line arrays
            ctypes.c_long, ctypes.c_double,                 # nlines, n_widths
            ctypes.c_double, ctypes.c_double, ctypes.c_double,  # refs, hck
            c_double_p]                                     # out
        lib.accumulate_lines.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    """True iff the compiled C++ backend built (or shipped) and loaded."""
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_numeric_table(path, skip_lines=1):
    """Parse the numeric body of a whitespace-delimited table (native
    np.genfromtxt replacement; header handled by the caller).

    :return: [rows, cols] float64 array.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.table_dims(path.encode(), skip_lines, ctypes.byref(rows),
                        ctypes.byref(cols))
    if rc != 0:
        raise OSError(f'cannot read {path}')
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    got = lib.parse_table(path.encode(), skip_lines, rows.value, cols.value,
                          _ptr(out))
    if got != rows.value:
        raise ValueError(f'parsed {got} of {rows.value} rows from {path}')
    return out


def accumulate_lines(p, T, nu_grid, lines, n_line_widths, p_reference,
                     T_reference, hck):
    """Native windowed Lorentzian accumulation; see hitran_native.cpp.

    :param lines: dict with 'nu', 'sw', 'gamma_air', 'n_air' float64 arrays.
    :return: [np, n_nu] float64 absorption-coefficient grid.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    p = np.ascontiguousarray(p, dtype=np.float64)
    T = np.ascontiguousarray(T, dtype=np.float64)
    nu_grid = np.ascontiguousarray(nu_grid, dtype=np.float64)
    lnu = np.ascontiguousarray(lines['nu'], dtype=np.float64)
    lsw = np.ascontiguousarray(lines['sw'], dtype=np.float64)
    lg = np.ascontiguousarray(lines['gamma_air'], dtype=np.float64)
    ln = np.ascontiguousarray(lines['n_air'], dtype=np.float64)
    out = np.zeros((p.size, nu_grid.size), dtype=np.float64)
    dnu = float(nu_grid[1] - nu_grid[0]) if nu_grid.size > 1 else 1.0
    lib.accumulate_lines(_ptr(p), _ptr(T), p.size, _ptr(nu_grid), nu_grid.size,
                         dnu, _ptr(lnu), _ptr(lsw), _ptr(lg), _ptr(ln),
                         lnu.size, float(n_line_widths), float(p_reference),
                         float(T_reference), float(hck), _ptr(out))
    return out
