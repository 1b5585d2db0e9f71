"""ctypes binding for the native mesh-connectivity library
(admm_elastic_tpu/native/libmeshops.so). Built with `make -C
admm_elastic_tpu/native`; every entry point has a numpy fallback in
connectivity.py / tetmesh.py, selected automatically by size."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libmeshops.so",
    )
    if not os.path.exists(path):
        # build on demand if a toolchain is around; stay silent on failure
        try:
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.dirname(path), "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.aet_unique_edges.restype = ctypes.c_int64
    lib.aet_unique_edges.argtypes = [i32p, ctypes.c_int64, i32p]
    lib.aet_across_edge.restype = None
    lib.aet_across_edge.argtypes = [i32p, ctypes.c_int64, i32p]
    lib.aet_hinges.restype = ctypes.c_int64
    lib.aet_hinges.argtypes = [i32p, ctypes.c_int64, i32p]
    lib.aet_surface_faces.restype = ctypes.c_int64
    lib.aet_surface_faces.argtypes = [i32p, ctypes.c_int64, i32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def unique_edges(faces: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty((3 * len(f), 2), dtype=np.int32)
    n = lib.aet_unique_edges(f, len(f), out)
    return out[:n].copy()


def across_edge(faces: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty((len(f), 3), dtype=np.int32)
    lib.aet_across_edge(f, len(f), out)
    return out


def extract_hinges(faces: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty((3 * len(f), 4), dtype=np.int32)
    n = lib.aet_hinges(f, len(f), out)
    return out[:n].copy()


def surface_faces(tets: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(tets, dtype=np.int32)
    out = np.empty((4 * len(t), 3), dtype=np.int32)
    n = lib.aet_surface_faces(t, len(t), out)
    return out[:n].copy()
