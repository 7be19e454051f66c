"""Native runtime components (C++ via ctypes).

The reference reaches native code through assimp/pycuda/taichi bindings
(SURVEY.md section 2 [NATIVE-EQ] items). The TPU compute path is JAX/Pallas;
the host runtime pieces that benefit from native speed live here:

  * objloader.cpp — single-pass OBJ parser with vertex dedup + fan triangulation
    (the assimp replacement for the example assets; keeps asset IO off the
    Python interpreter while frames stream).

The shared library builds on demand with g++ (cached next to the source); every
entry point has a pure-Python fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from stable_renderer_tpu.utils.log import get_logger

logger = get_logger("sr_tpu.native")

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libobjloader.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = _DIR / "objloader.cpp"
    if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(_SO)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            logger.info(f"built native obj loader: {_SO}")
        except Exception as e:  # noqa: BLE001
            logger.warning(f"native build failed ({e}); using Python OBJ parser")
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:  # pragma: no cover
        logger.warning(f"native load failed ({e})")
        _build_failed = True
        return None
    lib.obj_parse.restype = ctypes.c_void_p
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_counts.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.obj_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.obj_material_name.restype = ctypes.c_char_p
    lib.obj_material_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.obj_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _ensure_lib() is not None


def load_obj_native(path: str | Path):
    """Parse an OBJ natively. Returns
    (positions (V,3), uvs (V,2), normals (V,3), tris (T,3), tri_mat (T,),
    material_names) or None when the native library is unavailable."""
    lib = _ensure_lib()
    if lib is None:
        return None
    handle = lib.obj_parse(str(path).encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        counts = (ctypes.c_int64 * 3)()
        lib.obj_counts(handle, counts)
        nv, nt, nm = counts[0], counts[1], counts[2]
        pos = np.empty((nv, 3), np.float32)
        uv = np.empty((nv, 2), np.float32)
        nrm = np.empty((nv, 3), np.float32)
        tris = np.empty((nt, 3), np.int32)
        tri_mat = np.empty((nt,), np.int32)
        lib.obj_fill(
            handle,
            pos.ctypes.data_as(ctypes.c_void_p),
            uv.ctypes.data_as(ctypes.c_void_p),
            nrm.ctypes.data_as(ctypes.c_void_p),
            tris.ctypes.data_as(ctypes.c_void_p),
            tri_mat.ctypes.data_as(ctypes.c_void_p),
        )
        names = [lib.obj_material_name(handle, i).decode() for i in range(nm)]
        return pos, uv, nrm, tris, tri_mat, names
    finally:
        lib.obj_free(handle)
