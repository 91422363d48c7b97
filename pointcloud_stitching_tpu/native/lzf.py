"""LZF codec: native (ctypes, native/lzf.cc) with a pure-Python fallback.

LZF is what PCL compresses PCD ``DATA binary_compressed`` sections with
(pcl::lzfCompress/lzfDecompress; SURVEY.md §3.4 — the registration tool
loads .pcd clouds, and compressed is PCL's common on-disk mode). The
Python implementation below is written independently from the same
public stream format and serves two roles: the fallback when no C++
toolchain exists, and the cross-check oracle for the native codec
(tests/test_native_snappy.py pattern).
"""
from __future__ import annotations

import ctypes

from . import available, load

_MAX_LIT = 32     # ctrl 0..31 -> 1..32 literal bytes
_MAX_MATCH = 264  # 2 + 7 + 255
_MAX_OFF = 1 << 13


def _compress_py(data: bytes) -> bytes:
    n = len(data)
    if n == 0:
        return b""
    out = bytearray()
    htab: dict = {}
    ip = 0
    lit_start = 0

    def flush(upto: int) -> None:
        s = lit_start
        while s < upto:
            run = min(upto - s, _MAX_LIT)
            out.append(run - 1)
            out.extend(data[s:s + run])
            s += run

    while ip + 2 < n:
        key = data[ip:ip + 3]
        ref = htab.get(key, -1)
        htab[key] = ip
        off = ip - ref - 1
        if ref >= 0 and off < _MAX_OFF:
            limit = min(n - ip, _MAX_MATCH)
            ln = 3
            while ln < limit and data[ref + ln] == data[ip + ln]:
                ln += 1
            flush(ip)
            l = ln - 2
            if l < 7:
                out.append((l << 5) | (off >> 8))
            else:
                out.append((7 << 5) | (off >> 8))
                out.append(l - 7)
            out.append(off & 0xFF)
            if ip + ln + 2 < n:
                htab[data[ip + 1:ip + 4]] = ip + 1
                htab[data[ip + 2:ip + 5]] = ip + 2
            ip += ln
            lit_start = ip
        else:
            ip += 1
    flush(n)
    return bytes(out)


def _decompress_py(data: bytes, expected_size: int) -> bytes:
    out = bytearray(expected_size)
    ip, op, n = 0, 0, len(data)
    while ip < n:
        ctrl = data[ip]
        ip += 1
        if ctrl < 0x20:
            run = ctrl + 1
            if ip + run > n or op + run > expected_size:
                raise ValueError("corrupt LZF stream (literal overrun)")
            out[op:op + run] = data[ip:ip + run]
            ip += run
            op += run
        else:
            ln = ctrl >> 5
            if ln == 7:
                if ip >= n:
                    raise ValueError("corrupt LZF stream (len byte)")
                ln += data[ip]
                ip += 1
            ln += 2
            if ip >= n:
                raise ValueError("corrupt LZF stream (offset byte)")
            back = ((ctrl & 0x1F) << 8 | data[ip]) + 1
            ip += 1
            if back > op or op + ln > expected_size:
                raise ValueError("corrupt LZF stream (bad reference)")
            # byte-serial: overlapping references repeat the window
            for i in range(ln):
                out[op + i] = out[op - back + i]
            op += ln
    if op != expected_size:
        raise ValueError(
            f"LZF stream decodes to {op} bytes, header said "
            f"{expected_size}")
    return bytes(out)


def compress(data: bytes, force_python: bool = False) -> bytes:
    """LZF-compress. Worst case grows by len/32 + O(1) (literal ctrl
    bytes), so output always fits in len + len//32 + 64."""
    if force_python or not available():
        return _compress_py(data)
    lib = load()
    n = len(data)
    if n == 0:
        return b""
    cap = n + n // 32 + 64
    out = ctypes.create_string_buffer(cap)
    written = lib.pcs_lzf_compress(data, n, out, cap)
    if written == 0:
        raise RuntimeError("LZF compression failed")
    return out.raw[:written]


def decompress(data: bytes, expected_size: int,
               force_python: bool = False) -> bytes:
    """Decompress an LZF stream whose decoded size is known (PCD headers
    carry it). Raises ValueError on corrupt input."""
    if expected_size == 0:
        if data:
            # reject BEFORE backend dispatch: the native path's
            # capacity-overrun return value (0) would equal
            # expected_size and silently accept the corrupt stream,
            # while the Python path raises — one contract, checked here
            raise ValueError(
                "corrupt LZF stream: header says 0 decoded bytes but "
                f"the stream carries {len(data)}")
        return b""
    if force_python or not available():
        return _decompress_py(data, expected_size)
    lib = load()
    out = ctypes.create_string_buffer(max(expected_size, 1))
    written = lib.pcs_lzf_decompress(data, len(data), out, expected_size)
    if written != expected_size:
        raise ValueError(
            f"corrupt LZF stream (decoded {written} of {expected_size} "
            "expected bytes)")
    return out.raw[:expected_size]
