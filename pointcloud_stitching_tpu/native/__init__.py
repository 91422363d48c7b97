"""Native (C++) components, loaded via ctypes.

The shared library builds from native/*.cc at first use if a toolchain is
available (g++), or ahead of time with `python -m
pointcloud_stitching_tpu.native.build`. Pure-Python callers must treat
native availability as optional and fall back (see runtime/wire.py codecs).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_pcs_native.so")
_lock = threading.Lock()
_lib = None


def build(force: bool = False) -> str:
    """Compile the native library. Returns the .so path."""
    srcs = [os.path.join(_SRC_DIR, f) for f in ("snappy.cc", "lzf.cc")]
    srcs = [s for s in srcs if os.path.exists(s)]
    stale = force or not os.path.exists(_LIB_PATH) or any(
        os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs)
    if stale:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH] + srcs,
            check=True, capture_output=True)
    return _LIB_PATH


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is None:
            build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pcs_snappy_max_compressed_length.restype = ctypes.c_size_t
            lib.pcs_snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
            lib.pcs_snappy_compress.restype = ctypes.c_size_t
            lib.pcs_snappy_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
            lib.pcs_snappy_uncompressed_length.restype = ctypes.c_size_t
            lib.pcs_snappy_uncompressed_length.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t]
            lib.pcs_snappy_decompress.restype = ctypes.c_int
            lib.pcs_snappy_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ctypes.c_size_t]
            lib.pcs_lzf_compress.restype = ctypes.c_size_t
            lib.pcs_lzf_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ctypes.c_size_t]
            lib.pcs_lzf_decompress.restype = ctypes.c_size_t
            lib.pcs_lzf_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ctypes.c_size_t]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False
