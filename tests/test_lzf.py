"""LZF codec (PCL binary_compressed) — format vectors, roundtrips,
native<->Python cross-checks, and PCD binary_compressed integration.

Format vectors are hand-decoded from the public LZF stream spec, so they
pin the FORMAT, not just self-consistency (the test_native_snappy.py
pattern).
"""
import os
import struct

import numpy as np
import pytest

from pointcloud_stitching_tpu.native import lzf
from pointcloud_stitching_tpu.native import available as native_available

IMPLS = ([False, True] if native_available() else [True])


# --- hand-built format vectors ------------------------------------------

VECTORS = [
    # literal run: ctrl 0x04 = 5 literal bytes
    (b"\x04hello", b"hello"),
    # literal + short back-reference: ctrl 0x20 -> len (0x20>>5)+2 = 3,
    # offset (0x00<<8|0x04)+1 = 5 back -> copies "hel"
    (b"\x04hello\x20\x04", b"hellohel"),
    # overlapping RLE reference: 1 literal 'a', then ctrl 0xE0 (len=7 ->
    # +ext byte 0x01 -> 7+1+2 = 10), offset 0+1 = 1 -> 'a' * 10 more
    (b"\x00a\xe0\x01\x00", b"a" * 11),
    # two literal runs back to back (max run is 32 per ctrl byte)
    (b"\x1f" + bytes(range(32)) + b"\x01ab",
     bytes(range(32)) + b"ab"),
]


@pytest.mark.parametrize("force_py", IMPLS)
@pytest.mark.parametrize("stream,plain", VECTORS)
def test_format_vectors_decompress(stream, plain, force_py):
    got = lzf.decompress(stream, len(plain), force_python=force_py)
    assert got == plain


@pytest.mark.parametrize("force_py", IMPLS)
@pytest.mark.parametrize("data", [
    b"", b"x", b"ab", b"hello hello hello hello", os.urandom(4096),
    b"ab" * 50000, bytes(range(256)) * 300, b"\x00" * 100000,
])
def test_roundtrip(data, force_py):
    c = lzf.compress(data, force_python=force_py)
    assert lzf.decompress(c, len(data), force_python=force_py) == data


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
@pytest.mark.parametrize("data", [
    b"hello hello hello", os.urandom(2048), b"xyz" * 9000,
])
def test_native_python_cross(data):
    # either encoder's stream must decode with either decoder
    cn = lzf.compress(data, force_python=False)
    cp = lzf.compress(data, force_python=True)
    assert lzf.decompress(cn, len(data), force_python=True) == data
    assert lzf.decompress(cp, len(data), force_python=False) == data


@pytest.mark.parametrize("force_py", IMPLS)
def test_compresses_repetitive_data(force_py):
    data = b"depthframe" * 10000
    c = lzf.compress(data, force_python=force_py)
    assert len(c) < len(data) // 10


@pytest.mark.parametrize("force_py", IMPLS)
def test_corrupt_stream_raises(force_py):
    # literal run header promising more bytes than the stream carries
    with pytest.raises(ValueError):
        lzf.decompress(b"\x1fabc", 32, force_python=force_py)
    # back-reference before the start of output
    with pytest.raises(ValueError):
        lzf.decompress(b"\x00a\x20\x07", 4, force_python=force_py)
    # stream decoding to fewer bytes than the header claimed
    with pytest.raises(ValueError):
        lzf.decompress(b"\x00a", 5, force_python=force_py)
    # header claims 0 decoded bytes but the stream is non-empty: must
    # raise on BOTH backends (the native capacity-overrun return value
    # equals 0 and would otherwise be mistaken for success)
    with pytest.raises(ValueError):
        lzf.decompress(b"\x00a", 0, force_python=force_py)


# --- PCD binary_compressed integration -----------------------------------

@pytest.mark.parametrize("with_rgb", [False, True])
def test_pcd_binary_compressed_roundtrip(tmp_path, with_rgb):
    from pointcloud_stitching_tpu.io import load_pcd, save_pcd
    rng = np.random.default_rng(11)
    xyz = rng.normal(size=(777, 3)).astype(np.float32)
    rgb = (rng.integers(0, 256, (777, 3), dtype=np.uint8)
           if with_rgb else None)
    p = tmp_path / "c.pcd"
    save_pcd(str(p), xyz, rgb, compressed=True)
    got_xyz, got_rgb = load_pcd(str(p))
    np.testing.assert_array_equal(got_xyz, xyz)
    if with_rgb:
        np.testing.assert_array_equal(got_rgb, rgb)
    else:
        assert got_rgb is None
    # compressed file actually smaller than the binary one for a
    # structured cloud
    xyz_grid = np.round(xyz, 1)  # quantized -> repetitive bytes
    save_pcd(str(tmp_path / "g.pcd"), xyz_grid, compressed=True)
    save_pcd(str(tmp_path / "gb.pcd"), xyz_grid, binary=True)
    assert (tmp_path / "g.pcd").stat().st_size < \
        (tmp_path / "gb.pcd").stat().st_size


def test_pcd_binary_compressed_layout_is_field_major(tmp_path):
    """The on-disk uncompressed buffer must be SoA (all x, then all y,
    ...) — that transpose is part of PCL's format, not an option."""
    from pointcloud_stitching_tpu.io import save_pcd
    xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
    p = tmp_path / "soa.pcd"
    save_pcd(str(p), xyz, compressed=True)
    data = p.read_bytes()
    body = data[data.index(b"DATA binary_compressed\n") + 23:]
    comp_size, raw_size = struct.unpack_from("<II", body, 0)
    raw = lzf.decompress(body[8:8 + comp_size], raw_size)
    assert raw_size == 10 * 3 * 4
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<f4", count=10), xyz[:, 0])
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<f4", count=10, offset=40), xyz[:, 1])


def test_pcd_binary_compressed_hand_built_file(tmp_path):
    """A PCL-style file assembled by hand (header + u32 sizes + LZF
    stream built from the format spec) must load — reader parity does
    not depend on our own writer."""
    from pointcloud_stitching_tpu.io import load_pcd
    xyz = np.array([[1.5, -2.0, 3.25], [0.0, 4.0, -1.0]], np.float32)
    raw = np.ascontiguousarray(xyz.T).tobytes()  # SoA: x x y y z z
    # encode as pure literal runs (always format-valid)
    stream = b""
    for i in range(0, len(raw), 32):
        chunk = raw[i:i + 32]
        stream += bytes([len(chunk) - 1]) + chunk
    hdr = ("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
           "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
           "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
           "DATA binary_compressed\n").encode()
    p = tmp_path / "hand.pcd"
    p.write_bytes(hdr + struct.pack("<II", len(stream), len(raw)) + stream)
    got, rgb = load_pcd(str(p))
    np.testing.assert_array_equal(got, xyz)
    assert rgb is None
