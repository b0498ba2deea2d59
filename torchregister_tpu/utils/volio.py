"""Python bindings for the native volio library (csrc/volio.cpp).

ctypes bindings with on-demand compilation (g++ -O3 -shared; no pybind11 in
the image) and a pure-numpy NIfTI-1 fallback so the package works without a
toolchain. The native path exists for cohort-scale serving: parallel batch
staging of volumes into one contiguous buffer feeds a single ``device_put``.
"""
from __future__ import annotations

import ctypes
import gzip
import os
import struct
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "volio.cpp")


def _cache_path() -> str:
    """Per-user, 0700 cache dir — never the world-shared /tmp: a fixed
    predictable /tmp path lets another local user pre-plant a malicious .so
    that ``ctypes.CDLL`` would execute, and concurrent builds could dlopen a
    half-written file."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "torchregister_tpu")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
    except OSError:
        d = tempfile.mkdtemp(prefix="torchregister_tpu_")
    return os.path.join(d, "volio.so")


_LIB_CACHE = _cache_path()
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_lib() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if os.path.exists(_LIB_CACHE) and os.path.getmtime(_LIB_CACHE) >= os.path.getmtime(src):
        return _LIB_CACHE
    # Atomic publish: compile to a process-unique temp name, then rename —
    # a concurrent process either sees the complete .so or none.
    tmp = f"{_LIB_CACHE}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_CACHE)
        return _LIB_CACHE
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        path = _build_lib()
        if path:
            try:
                lib = ctypes.CDLL(path)
                lib.volio_nifti_shape.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.volio_read_nifti.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ]
                lib.volio_write_nifti.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ]
                lib.volio_load_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ]
                lib.volio_normalize_minmax.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


# ------------------------------------------------------- numpy NIfTI fallback

_NIFTI_DTYPES = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
                 64: np.float64, 256: np.int8, 512: np.uint16}


def _np_read_nifti(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()
    if struct.unpack_from("<i", raw, 0)[0] != 348:
        raise ValueError(f"{path}: not a little-endian NIfTI-1 file")
    dim = struct.unpack_from("<8h", raw, 40)
    nd = dim[0]
    shape = dim[1 : 1 + nd]
    datatype = struct.unpack_from("<h", raw, 70)[0]
    vox_offset = int(struct.unpack_from("<f", raw, 108)[0]) or 352
    slope, inter = struct.unpack_from("<2f", raw, 112)
    dt = _NIFTI_DTYPES.get(datatype)
    if dt is None:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    n = int(np.prod(shape))
    data = np.frombuffer(raw, dt, count=n, offset=vox_offset).astype(np.float32)
    # NIfTI-1 spec: scl_slope == 0 means "no scaling" (scl_inter ignored too)
    if slope != 0.0 and (slope != 1.0 or inter != 0.0):
        data = data * slope + inter
    # NIfTI stores fastest-varying first: shape is (x, y, z, ...) in file
    # order, so reshape in Fortran order to get [x, y, z] array indexing.
    return data.reshape(shape, order="F")


def _np_write_nifti(path: str, data: np.ndarray) -> None:
    data = np.asarray(data, np.float32)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)  # float32
    struct.pack_into("<h", hdr, 72, 32)
    struct.pack_into("<8f", hdr, 76, 0, *([1.0] * 7))
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 1.0)
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<4f", hdr, 280, 1, 0, 0, 0)
    struct.pack_into("<4f", hdr, 296, 0, 1, 0, 0)
    struct.pack_into("<4f", hdr, 312, 0, 0, 1, 0)
    hdr[344:348] = b"n+1\x00"
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(np.asfortranarray(data).tobytes(order="F"))


# --------------------------------------------------------------- public API


def read_volume(path: str) -> np.ndarray:
    """Read a NIfTI-1 volume (.nii/.nii.gz) as float32 (native path when the
    toolchain is available, numpy fallback otherwise)."""
    lib = _get_lib()
    if lib is not None:
        shape = (ctypes.c_int64 * 8)()
        nd = ctypes.c_int()
        if lib.volio_nifti_shape(path.encode(), shape, ctypes.byref(nd)) == 0:
            dims = tuple(shape[i] for i in range(nd.value))
            out = np.empty(int(np.prod(dims)), np.float32)
            rc = lib.volio_read_nifti(
                path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.size,
            )
            if rc == 0:
                return out.reshape(dims, order="F")
    return _np_read_nifti(path)


def write_volume(path: str, data) -> None:
    """Write a float32 volume as uncompressed .nii."""
    data = np.asarray(data, np.float32)
    lib = _get_lib()
    if lib is not None and not path.endswith(".gz"):
        fdata = np.asfortranarray(data).reshape(-1, order="F").copy()
        shape = (ctypes.c_int64 * data.ndim)(*data.shape)
        rc = lib.volio_write_nifti(
            path.encode(), fdata.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            shape, data.ndim,
        )
        if rc == 0:
            return
    _np_write_nifti(path, data)


def load_batch(paths: Sequence[str], volume_shape, nthreads: int = 8) -> np.ndarray:
    """Load a cohort of same-shaped volumes into one contiguous
    ``[B, *volume_shape]`` float32 array (parallel native loader when
    available)."""
    shape = tuple(volume_shape)
    d = len(shape)
    n = int(np.prod(shape))
    out = np.zeros((len(paths), n), np.float32)
    lib = _get_lib()
    loaded = False
    if lib is not None:
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        ok = lib.volio_load_batch(
            arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, nthreads,
        )
        loaded = ok == len(paths)
    if not loaded:
        for i, p in enumerate(paths):
            out[i] = read_volume(p).reshape(-1, order="F")
    # Rows hold file (Fortran) element order of each volume: view as reversed
    # dims (C order) and transpose back to [B, *shape].
    return np.ascontiguousarray(
        out.reshape((len(paths),) + shape[::-1]).transpose((0,) + tuple(range(d, 0, -1)))
    )


def normalize_minmax_(data: np.ndarray, nthreads: int = 8) -> np.ndarray:
    """In-place min-max normalization to [0, 1] (native when available)."""
    assert data.dtype == np.float32 and data.flags["C_CONTIGUOUS"]
    lib = _get_lib()
    if lib is not None:
        lib.volio_normalize_minmax(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size, nthreads
        )
        return data
    lo, hi = data.min(), data.max()
    data -= lo
    data /= (hi - lo) + 1e-9
    return data
