"""Native C++ snappy codec: roundtrip + wire integration."""
import os

import numpy as np
import pytest

native = pytest.importorskip("pointcloud_stitching_tpu.native")
if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from pointcloud_stitching_tpu.native import snappy
from pointcloud_stitching_tpu.runtime.wire import (Codec, compress,
                                                   decode_frame, decompress,
                                                   encode_depth_frame)


@pytest.mark.parametrize("data", [
    b"", b"x", b"hello hello hello hello", os.urandom(4096),
    b"ab" * 50000, bytes(range(256)) * 300,
])
def test_roundtrip(data):
    assert snappy.decompress(snappy.compress(data)) == data


def test_compresses_repetitive_data():
    data = b"depthframe" * 10000
    c = snappy.compress(data)
    assert len(c) < len(data) // 10
    assert snappy.decompress(c) == data


def test_depth_frame_roundtrip_snappy_codec():
    rng = np.random.default_rng(0)
    depth = rng.integers(0, 4000, (120, 212), dtype=np.uint16)
    depth[rng.random((120, 212)) < 0.3] = 0  # compressible holes
    frame = encode_depth_frame(depth, seq=7, codec=Codec.SNAPPY)
    from pointcloud_stitching_tpu.runtime.wire import HEADER_SIZE
    kind, seq, payload = decode_frame(frame[:HEADER_SIZE], frame[HEADER_SIZE:])
    assert seq == 7
    np.testing.assert_array_equal(payload, depth)


def test_known_format_vectors():
    """Hand-decoded vectors from the public snappy format description."""
    # literal: preamble len=5, tag (5-1)<<2, bytes
    stream = bytes([5, (4 << 2)]) + b"hello"
    assert snappy.decompress(stream) == b"hello"
    # copy with 1-byte offset: "aaaaaaaa" = literal 'a' + copy off=1 len=7
    stream = bytes([8, 0 << 2]) + b"a" + bytes([(3 << 2) | 1, 1])
    assert snappy.decompress(stream) == b"aaaaaaaa"
    # copy with 2-byte offset
    stream = bytes([8, (3 << 2)]) + b"abcd" + bytes([(3 << 2) | 2, 4, 0])
    assert snappy.decompress(stream) == b"abcdabcd"


def test_corrupt_stream_raises():
    with pytest.raises(ValueError):
        snappy.decompress(b"\xff\xff\xff\xff\xff\xff")  # unterminated varint
    with pytest.raises(ValueError):
        # declares 100 bytes but provides none
        snappy.decompress(bytes([100]))
