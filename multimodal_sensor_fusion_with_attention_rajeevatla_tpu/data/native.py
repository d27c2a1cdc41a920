"""ctypes bindings for the native ETL core (``native/fastload.cpp``).

Auto-builds ``libfastload.so`` with ``make`` on first use when a compiler is
available; every entry point degrades to the pure-numpy implementation when
the native library is unavailable, so the framework has no hard native
dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfastload.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.pamap2_count_rows.restype = ctypes.c_long
    lib.pamap2_count_rows.argtypes = [ctypes.c_char_p]
    lib.pamap2_parse.restype = ctypes.c_long
    lib.pamap2_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.window_gather.restype = None
    lib.window_gather.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def parse_dat(path: str | Path, n_cols: int, strict: bool = False) -> Optional[np.ndarray]:
    """Parse a whitespace-separated .dat file natively. None if unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    path_b = str(path).encode()
    rows = lib.pamap2_count_rows(path_b)
    if rows < 0:
        return None
    out = np.empty((rows, n_cols), dtype=np.float32)
    got = lib.pamap2_parse(
        path_b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows,
        n_cols,
        1 if strict else 0,
        0,
    )
    if got < 0:
        if got == -2:
            raise ValueError(f"Row width mismatch in {path}")
        return None
    return out[:got]


def window_gather(
    data: np.ndarray,
    starts: Sequence[int],
    ends: Sequence[int],
    window: int,
    col_idx: Sequence[int],
) -> Optional[np.ndarray]:
    """Native windowing: slice + scrub + zero-pad in one multithreaded pass."""
    lib = _load_library()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    starts_arr = np.asarray(starts, dtype=np.int64)
    ends_arr = np.asarray(ends, dtype=np.int64)
    cols = np.asarray(col_idx, dtype=np.int64)
    n_windows = starts_arr.shape[0]
    out = np.empty((n_windows, window, cols.shape[0]), dtype=np.float32)
    lib.window_gather(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[1],
        starts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ends_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_windows,
        window,
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        cols.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        0,
    )
    return out
