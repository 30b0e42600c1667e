"""rANS Nx16 codec (CRAM 3.1) — round-trips, transforms, golden streams."""

import numpy as np
import pytest

from clair_tpu.io import rans4x16 as r16


def _rt(data: bytes, **kw) -> bytes:
    stream = r16.compress(data, **kw)
    out = r16.decompress(stream)
    assert out == data, (len(out), len(data))
    return stream


# ---------------------------------------------------------------------------
# uint7
# ---------------------------------------------------------------------------

def test_uint7_round_trip():
    for v in (0, 1, 127, 128, 300, 16383, 16384, 2**28, 2**35):
        out = bytearray()
        r16.write_uint7(out, v)
        got, pos = r16.read_uint7(bytes(out), 0)
        assert got == v and pos == len(out)


def test_uint7_golden():
    out = bytearray()
    r16.write_uint7(out, 300)          # 300 = 0b10_0101100 -> 0x82 0x2C
    assert bytes(out) == b"\x82\x2c"
    out = bytearray()
    r16.write_uint7(out, 127)
    assert bytes(out) == b"\x7f"


# ---------------------------------------------------------------------------
# entropy stage
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [0, 1])
def test_round_trip_random(order):
    rs = np.random.RandomState(0)
    for n in (1, 2, 3, 4, 5, 7, 64, 1000, 4097):
        data = bytes(rs.randint(0, 256, n, dtype=np.uint8))
        _rt(data, order=order)


@pytest.mark.parametrize("order", [0, 1])
def test_round_trip_skewed(order):
    rs = np.random.RandomState(1)
    data = bytes(rs.choice([65, 67, 71, 84], 5000, p=[0.6, 0.2, 0.15, 0.05]).astype(np.uint8))
    stream = _rt(data, order=order)
    assert len(stream) < len(data)  # 2-bit-entropy data must compress


def test_order1_beats_order0_on_contextual_data():
    # strongly Markov data: each byte determined by its predecessor
    data = bytes((bytes(range(16)) * 400))
    s0 = _rt(data, order=0)
    s1 = _rt(data, order=1)
    assert len(s1) < len(s0)


def test_single_symbol_stream():
    data = b"A" * 1000
    stream = _rt(data)
    assert len(stream) < 40


def test_tiny_inputs_use_cat():
    for n in (1, 2, 3):
        stream = r16.compress(b"x" * n, order=1)
        assert stream[0] & r16.F_CAT
        assert r16.decompress(stream) == b"x" * n


def test_flags_byte_golden():
    assert r16.compress(b"abcabcabc" * 10, order=0)[0] & 0x01 == 0
    assert r16.compress(b"abcabcabc" * 10, order=1)[0] & 0x01 == 1
    s = r16.compress(bytes(range(100)) * 4, order=0, stripe=4)
    assert s[0] == r16.F_STRIPE


def test_x32_round_trip():
    """32-way interleave (X32 flag): both orders, transform combos, odd
    tails, and the <32-byte demotion back to the 4-way stage."""
    rs = np.random.RandomState(5)
    datasets = [
        bytes(rs.randint(0, 32, 10_000).astype(np.uint8)),
        bytes(((rs.randint(0, 4, 4097) + np.arange(4097) % 5)).astype(np.uint8)),
        b"".join(bytes([rs.randint(0, 6)]) * rs.randint(1, 40) for _ in range(200)),
        bytes(rs.randint(0, 4, 33).astype(np.uint8)),  # 1-byte tail
    ]
    for data in datasets:
        for order in (0, 1):
            for kw in ({}, {"use_pack": True}, {"use_rle": True},
                       {"stripe": 4}):
                enc = r16.compress(data, order, x32=True, **kw)
                # PACK/RLE can shrink a tiny payload below the 32-byte
                # demotion threshold; the flag is only guaranteed big
                if not kw.get("stripe") and len(data) >= 1024:
                    assert enc[0] & r16.F_X32
                assert r16.decompress(enc) == data
    small = r16.compress(b"abcabcabcabc", 1, x32=True)
    assert not small[0] & r16.F_X32  # <32 bytes: 4-way keeps the header small
    assert r16.decompress(small) == b"abcabcabcabc"


def test_x32_python_decoder_matches():
    """Force the pure-Python decode path (native bypassed) on X32."""
    rs = np.random.RandomState(6)
    data = bytes(((rs.randint(0, 8, 5000) + np.arange(5000) % 7)).astype(np.uint8))
    from clair_tpu import native

    for order in (0, 1):
        enc = r16.compress(data, order, x32=True)
        native_out = native.rans4x16_decompress(enc, len(data))
        python_out = r16._rans_decode_o1(enc, _skip_header(enc), len(data), 32) \
            if order else r16._rans_decode_o0(enc, _skip_header(enc), len(data), 32)
        assert python_out == data
        if native_out is not None:
            assert native_out == data


def _skip_header(stream):
    pos = 1
    while stream[pos] & 0x80:
        pos += 1
    return pos + 1


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_pack_round_trip():
    rs = np.random.RandomState(2)
    for nsym in (1, 2, 3, 4, 5, 16):
        vals = rs.choice(256, nsym, replace=False).astype(np.uint8)
        data = bytes(rs.choice(vals, 501).astype(np.uint8))
        stream = r16.compress(data, use_pack=True)
        assert stream[0] & r16.F_PACK
        assert r16.decompress(stream) == data


def test_pack_skipped_above_16_symbols():
    data = bytes(range(20)) * 10
    stream = r16.compress(data, use_pack=True)
    assert not (stream[0] & r16.F_PACK)
    assert r16.decompress(stream) == data


def test_rle_round_trip():
    rs = np.random.RandomState(3)
    parts = []
    for _ in range(200):
        parts.append(bytes([rs.randint(0, 4)]) * rs.randint(1, 40))
    data = b"".join(parts)
    stream = r16.compress(data, use_rle=True)
    assert stream[0] & r16.F_RLE
    assert r16.decompress(stream) == data
    assert len(stream) < len(r16.compress(data))  # RLE must win on runs


def test_rle_skipped_when_no_runs():
    data = bytes(np.arange(256, dtype=np.uint8)) * 4
    stream = r16.compress(data, use_rle=True)
    assert not (stream[0] & r16.F_RLE)
    assert r16.decompress(stream) == data


def test_stripe_round_trip():
    # 4-byte little-endian integers: the stripe target workload
    rs = np.random.RandomState(4)
    ints = rs.randint(0, 5000, 1000).astype("<u4")
    data = ints.tobytes()
    stream = r16.compress(data, order=0, stripe=4)
    assert r16.decompress(stream) == data
    # high bytes are almost all zero -> striping must compress far better
    assert len(stream) < len(r16.compress(data, order=0))


def test_stripe_uneven_length():
    data = bytes(np.random.RandomState(5).randint(0, 256, 1003, dtype=np.uint8))
    stream = r16.compress(data, stripe=4)
    assert r16.decompress(stream) == data


def test_combined_pack_rle():
    data = (b"\x00" * 50 + b"\x01" * 30 + b"\x02\x03" * 10) * 20
    stream = r16.compress(data, order=0, use_pack=True, use_rle=True)
    assert r16.decompress(stream) == data


# ---------------------------------------------------------------------------
# golden stream (hand-checked layout pins the format)
# ---------------------------------------------------------------------------

def test_golden_order0_layout():
    """Pin the exact stream layout for a tiny input so accidental format
    changes fail loudly: flags=0, size uint7, alphabet {'a','b'} with
    freqs 2048+2048, four u32 states."""
    data = b"abab"
    stream = r16.compress(data, order=0)
    assert stream[0] == 0                 # flags: order-0, sized
    assert stream[1] == 4                 # uint7 raw size
    # alphabet: 'a'(97), run byte for consecutive 'b', terminator 0
    assert stream[2] == 97 and stream[3] == 98
    body = r16.decompress(stream)
    assert body == data


def test_decompress_rejects_truncated():
    stream = r16.compress(b"hello world, hello world", order=1)
    with pytest.raises(Exception):
        r16.decompress(stream[: len(stream) // 2])


# ---------------------------------------------------------------------------
# native decoder (clair_rans4x16.cpp)
# ---------------------------------------------------------------------------

def test_native_decoder_matches_python():
    """Every stream the encoder can produce decodes byte-identically
    through the native decoder AND the pure-Python reference."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(7)
    cases = [
        bytes(rs.randint(0, 256, n, dtype=np.uint8))
        for n in (1, 5, 63, 1000, 4097)
    ]
    cases.append(bytes(rs.choice([65, 67, 71, 84], 20_000,
                                 p=[.6, .2, .15, .05]).astype(np.uint8)))
    cases.append(b"".join(bytes([rs.randint(0, 4)]) * rs.randint(1, 40)
                          for _ in range(800)))
    cases.append(rs.randint(0, 5000, 5000).astype("<u4").tobytes())
    combos = (
        dict(order=0), dict(order=1), dict(order=0, use_rle=True),
        dict(order=1, use_pack=True), dict(order=0, stripe=4),
        dict(order=1, use_rle=True, use_pack=True),
    )
    for data in cases:
        for kw in combos:
            stream = r16.compress(data, **kw)
            nat = native.rans4x16_decompress(stream, len(data))
            assert nat == data, (len(data), kw)
            # the public decompress (which dispatches to native) agrees
            assert r16.decompress(stream) == data, (len(data), kw)


def test_native_decoder_rejects_corruption():
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    data = bytes(np.random.RandomState(8).randint(0, 256, 4000, dtype=np.uint8))
    stream = bytearray(r16.compress(data, order=1))
    # truncations anywhere must fail cleanly (nonzero rc -> None), never crash
    for cut in (1, 5, len(stream) // 2, len(stream) - 3):
        assert native.rans4x16_decompress(bytes(stream[:cut]), len(data)) is None
