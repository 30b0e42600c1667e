"""rANS 4x8 codec tests (CRAM 3.0 block method 4).

Round-trips across sizes/distributions plus a hand-assembled golden
stream (single-symbol alphabet, where every field of the format can be
computed by hand) so encoder and decoder cannot share a format
misreading silently.
"""

import struct

import numpy as np
import pytest

from clair_tpu.io.rans import RANS_BYTE_L, compress, decompress


def roundtrip(data: bytes, order: int):
    blob = compress(data, order)
    assert blob[0] in (0, 1)
    comp_size, raw_size = struct.unpack_from("<II", blob, 1)
    assert raw_size == len(data)
    assert comp_size == len(blob) - 9
    assert decompress(blob) == data
    return blob


@pytest.mark.parametrize("order", [0, 1])
def test_small_sizes_all_remainders(order):
    rs = np.random.RandomState(0)
    for n in range(1, 18):
        data = bytes(rs.randint(65, 70, n).astype(np.uint8))
        roundtrip(data, order)


@pytest.mark.parametrize("order", [0, 1])
def test_single_symbol_runs(order):
    for n in (1, 2, 3, 4, 5, 1000):
        roundtrip(b"A" * n, order)


@pytest.mark.parametrize("order", [0, 1])
def test_random_bytes_full_alphabet(order):
    rs = np.random.RandomState(1)
    data = bytes(rs.randint(0, 256, 10_000).astype(np.uint8))
    roundtrip(data, order)


@pytest.mark.parametrize("order", [0, 1])
def test_skewed_distribution(order):
    rs = np.random.RandomState(2)
    # quality-score-like: heavily skewed small alphabet -> exercises
    # freq >= 128 two-byte entries and the consecutive-run RLE
    data = bytes(
        np.clip(rs.normal(30, 3, 50_000), 20, 40).astype(np.uint8) + 33
    )
    blob = roundtrip(data, order)
    assert len(blob) < len(data) // 2  # it actually compresses


def test_symbol_zero_and_terminator():
    # symbol 0 present (only legal as the first table entry; the 0
    # terminator must still be unambiguous)
    data = bytes([0, 0, 1, 2, 0, 1, 0]) * 40
    roundtrip(data, 0)
    roundtrip(data, 1)


def test_consecutive_symbol_rle_in_table():
    data = bytes(range(60, 80)) * 50  # long consecutive symbol run
    roundtrip(data, 0)
    roundtrip(data, 1)


def test_order1_contexts_differ():
    # order-1 should beat order-0 when transitions are deterministic
    data = b"ACGT" * 5000
    o0 = compress(data, 0)
    o1 = compress(data, 1)
    assert decompress(o1) == data
    assert len(o1) < len(o0)


def test_order1_tiny_input_falls_back_to_order0():
    blob = compress(b"xyz", 1)
    assert blob[0] == 0
    assert decompress(blob) == b"xyz"


def test_empty_raises():
    with pytest.raises(ValueError):
        compress(b"", 0)


def test_truncated_stream_raises():
    blob = compress(b"hello world", 0)
    with pytest.raises(ValueError):
        decompress(blob[:8])
    with pytest.raises(ValueError):
        decompress(blob[:-4][:9] + b"")  # header claims more than present


def test_golden_single_symbol_stream():
    """Hand-computed stream: alphabet {'A'} with freq 4096.

    Every encode step is the identity on the state (x -> (x//4096)<<12 +
    x%4096 + 0 = x), and x_max = 4096<<19 = 1<<31 is never reached, so all
    four states stay at the initial lower bound L = 1<<23 and each flush
    is the little-endian bytes of L. The frequency table is
    [0x41, 0x90, 0x00, 0x00]: symbol 'A', freq 4096 as the two-byte
    high-bit form 0x90 0x00, zero terminator.
    """
    n = 11
    table = bytes([0x41, 0x90, 0x00, 0x00])
    states = struct.pack("<IIII", *([RANS_BYTE_L] * 4))
    body = table + states
    golden = bytes([0]) + struct.pack("<II", len(body), n) + body
    assert decompress(golden) == b"A" * n
    # and our encoder produces exactly this stream
    assert compress(b"A" * n, 0) == golden


def test_python_and_native_decoders_agree():
    """`decompress` prefers the native decoder (clair_rans.cpp) when the
    library builds; the pure-Python decoder is the reference
    implementation — they must agree bit-for-bit on every stream."""
    from clair_tpu.io.rans import _decompress_o0, _decompress_o1

    rs = np.random.RandomState(9)
    cases = [
        b"Z",
        b"A" * 997,
        bytes(rs.randint(0, 256, 4096).astype(np.uint8)),
        bytes(np.clip(rs.normal(30, 3, 20000), 20, 40).astype(np.uint8) + 33),
        b"ACGT" * 2500 + b"N",
    ]
    for order in (0, 1):
        for data in cases:
            blob = compress(data, order)
            via_decompress = decompress(blob)  # native when available
            pure = (_decompress_o0 if blob[0] == 0 else _decompress_o1)(
                blob, 9, len(data)
            )
            assert via_decompress == data
            assert pure == data
