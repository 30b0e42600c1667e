"""Adaptive arithmetic codec (CRAM 3.1 "arith") — round-trips, transforms,
range-coder goldens."""

import numpy as np
import pytest

from clair_tpu.io import arith


def _rt(data: bytes, **kw) -> bytes:
    stream = arith.compress(data, **kw)
    out = arith.decompress(stream)
    assert out == data, (len(out), len(data))
    return stream


# ---------------------------------------------------------------------------
# range coder core
# ---------------------------------------------------------------------------

def test_range_coder_uniform_symbols():
    """Code a fixed symbol sequence with static frequencies and decode it
    back — exercises renormalisation and the 5-byte priming window."""
    seq = [0, 1, 2, 3, 2, 1, 0, 3, 3, 3, 0] * 97
    freqs = [10, 20, 30, 40]
    cum = [0, 10, 30, 60]
    tot = 100
    rc = arith.RangeEncoder()
    for s in seq:
        rc.encode(cum[s], freqs[s], tot)
    stream = rc.finish()
    dec = arith.RangeDecoder(stream)
    for s in seq:
        f = dec.get_freq(tot)
        sym = 0
        while not (cum[sym] <= f < cum[sym] + freqs[sym]):
            sym += 1
        assert sym == s
        dec.update(cum[sym], freqs[sym])


def test_range_coder_carry_propagation():
    """A long run of the most probable symbol drives low toward the carry
    boundary; the FF-run counter must resolve it correctly."""
    freqs = [1, 65535 - 1]
    cum = [0, 1]
    tot = 65536
    seq = [1] * 5000 + [0] + [1] * 5000
    rc = arith.RangeEncoder()
    for s in seq:
        rc.encode(cum[s], freqs[s], tot)
    stream = rc.finish()
    dec = arith.RangeDecoder(stream)
    for s in seq:
        f = dec.get_freq(tot)
        sym = 0 if f < 1 else 1
        assert sym == s
        dec.update(cum[sym], freqs[sym])


def test_adaptive_model_self_sorts():
    m = arith.AdaptiveModel(4)
    rc = arith.RangeEncoder()
    for _ in range(50):
        m.encode(rc, 3)
    # symbol 3 must have bubbled to the front of the scan order
    assert m.syms[0] == 3


def test_adaptive_model_rescale_preserves_decodability():
    """Push a model past the 16-bit rescale bound on both sides."""
    data = bytes(np.random.RandomState(0).choice([0, 7, 255], 30_000,
                                                 p=[.5, .3, .2]).astype(np.uint8))
    _rt(data, order=0)


# ---------------------------------------------------------------------------
# entropy stages
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [0, 1])
def test_round_trip_random(order):
    rs = np.random.RandomState(1)
    for n in (1, 2, 3, 4, 5, 7, 64, 1000, 4097):
        data = bytes(rs.randint(0, 256, n, dtype=np.uint8))
        _rt(data, order=order)


@pytest.mark.parametrize("order", [0, 1])
def test_round_trip_skewed_compresses(order):
    rs = np.random.RandomState(2)
    data = bytes(rs.choice([65, 67, 71, 84], 5000,
                           p=[0.6, 0.2, 0.15, 0.05]).astype(np.uint8))
    stream = _rt(data, order=order)
    assert len(stream) < len(data)


def test_order1_beats_order0_on_contextual_data():
    data = bytes((bytes(range(16)) * 400))
    s0 = _rt(data, order=0)
    s1 = _rt(data, order=1)
    assert len(s1) < len(s0)


def test_adaptive_beats_static_on_drifting_data():
    """The adaptive model's defining property: a distribution that changes
    mid-stream still codes near its local entropy."""
    half = bytes(np.random.RandomState(3).choice([0, 1], 4000, p=[.9, .1]).astype(np.uint8))
    other = bytes(np.random.RandomState(4).choice([254, 255], 4000, p=[.1, .9]).astype(np.uint8))
    stream = _rt(half + other, order=0)
    assert len(stream) < 2500  # ~0.5 bit/byte locally


def test_tiny_inputs_use_cat():
    for n in (1, 2, 3):
        stream = arith.compress(b"x" * n, order=1)
        assert stream[0] & arith.F_CAT
        assert arith.decompress(stream) == b"x" * n


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_pack_round_trip():
    rs = np.random.RandomState(5)
    for nsym in (1, 2, 3, 4, 5, 16):
        vals = rs.choice(256, nsym, replace=False).astype(np.uint8)
        data = bytes(rs.choice(vals, 501).astype(np.uint8))
        stream = arith.compress(data, use_pack=True)
        assert stream[0] & arith.F_PACK
        assert arith.decompress(stream) == data


def test_rle_round_trip_and_wins_on_runs():
    rs = np.random.RandomState(6)
    data = b"".join(bytes([rs.randint(0, 4)]) * rs.randint(1, 40)
                    for _ in range(200))
    stream = arith.compress(data, use_rle=True)
    assert stream[0] & arith.F_RLE
    assert arith.decompress(stream) == data
    assert len(stream) < len(arith.compress(data))


def test_rle_long_runs_chunk_chaining():
    """Runs beyond 255 exercise the continuation model."""
    data = b"\x00" * 1000 + b"ab" + b"\x07" * 300 + b"\x00" * 256
    for order in (0, 1):
        stream = arith.compress(data, order=order, use_rle=True)
        assert arith.decompress(stream) == data


def test_ext_round_trip():
    data = (b"the quick brown fox " * 200)
    stream = arith.compress(data, use_ext=True)
    assert stream[0] & arith.F_EXT
    assert arith.decompress(stream) == data


def test_stripe_round_trip():
    rs = np.random.RandomState(7)
    data = rs.randint(0, 5000, 1000).astype("<u4").tobytes()
    stream = arith.compress(data, order=0, stripe=4)
    assert stream[0] & arith.F_STRIPE
    assert arith.decompress(stream) == data
    assert len(stream) < len(arith.compress(data, order=0))


def test_stripe_uneven_length():
    data = bytes(np.random.RandomState(8).randint(0, 256, 1003, dtype=np.uint8))
    stream = arith.compress(data, stripe=4)
    assert arith.decompress(stream) == data


def test_combined_pack_rle_order1():
    data = (b"\x00" * 50 + b"\x01" * 30 + b"\x02\x03" * 10) * 20
    stream = arith.compress(data, order=1, use_pack=True, use_rle=True)
    assert arith.decompress(stream) == data


# ---------------------------------------------------------------------------
# format pins
# ---------------------------------------------------------------------------

def test_flags_byte_golden():
    assert arith.compress(b"abcabcabc" * 10, order=0)[0] & 0x01 == 0
    assert arith.compress(b"abcabcabc" * 10, order=1)[0] & 0x01 == 1
    s = arith.compress(bytes(range(100)) * 4, order=0, stripe=4)
    assert s[0] == arith.F_STRIPE


def test_header_layout_golden():
    stream = arith.compress(b"abab" * 100, order=0)
    assert stream[0] == 0          # flags
    assert stream[1] == 0x83 and stream[2] == 0x10  # uint7(400)
    # range-coded body begins with the encoder's zero cache byte
    assert stream[3] == 0


# ---------------------------------------------------------------------------
# native decoder (clair_arith.cpp)
# ---------------------------------------------------------------------------

def test_native_decoder_matches_python():
    """Every stream the encoder can produce decodes byte-identically
    through the native decoder AND the pure-Python reference (model
    update rules must mirror exactly)."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(9)
    cases = [
        bytes(rs.randint(0, 256, n, dtype=np.uint8))
        for n in (1, 5, 63, 1000, 4097)
    ]
    cases.append(bytes(rs.choice([65, 67, 71, 84], 20_000,
                                 p=[.6, .2, .15, .05]).astype(np.uint8)))
    cases.append(b"".join(bytes([rs.randint(0, 4)]) * rs.randint(1, 40)
                          for _ in range(800)))
    cases.append(rs.randint(0, 5000, 5000).astype("<u4").tobytes())
    cases.append(bytes([7]) * 70_000)  # rescale + carry stress
    combos = (
        dict(order=0), dict(order=1), dict(order=0, use_rle=True),
        dict(order=1, use_rle=True), dict(order=1, use_pack=True),
        dict(order=0, stripe=4), dict(order=1, use_rle=True, use_pack=True),
    )
    for data in cases:
        for kw in combos:
            stream = arith.compress(data, **kw)
            nat = native.arith_decompress(stream, len(data))
            assert nat == data, (len(data), kw)
            assert arith.decompress(stream) == data, (len(data), kw)


def test_native_decoder_ext_falls_back():
    """EXT (bzip2) bodies are Python-owned: native returns None, the
    public decompress still succeeds."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    data = b"the quick brown fox " * 200
    stream = arith.compress(data, use_ext=True)
    assert native.arith_decompress(stream, len(data)) is None
    assert arith.decompress(stream) == data


def test_native_decoder_rejects_corruption():
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    data = bytes(np.random.RandomState(10).randint(0, 256, 4000,
                                                   dtype=np.uint8))
    stream = bytearray(arith.compress(data, order=1))
    for cut in (1, 5, len(stream) // 2):
        got = native.arith_decompress(bytes(stream[:cut]), len(data))
        # truncation may still "decode" (the coder pads zero bytes) but
        # must never crash; a wrong size header must fail cleanly
        assert got is None or len(got) == len(data)
    assert native.arith_decompress(bytes(stream), len(data) + 7) is None


def test_native_decoder_rejects_pack_length_bomb():
    """A PACK header claiming a gigantic packed length must fail cleanly
    (regression: packed.resize threw bad_alloc across the ctypes
    boundary and aborted the process)."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    from clair_tpu.io.rans4x16 import write_uint7

    bomb = bytearray([arith.F_PACK])
    write_uint7(bomb, 100)          # raw size
    bomb += bytes([2, 0, 1])        # nsym=2, values {0,1}
    write_uint7(bomb, 1 << 62)      # packed length: absurd
    bomb += b"\x00" * 32
    assert native.arith_decompress(bytes(bomb), 100) is None
    with pytest.raises(Exception):
        arith.decompress(bytes(bomb))


def test_decompress_rejects_bad_sizes():
    stream = arith.compress(b"hello world, hello world", order=1)
    with pytest.raises(Exception):
        arith.decompress(b"")
    # NOSZ without a size must fail loudly
    nosz = bytes([stream[0] | arith.F_NOSZ]) + arith._strip_size(stream)
    with pytest.raises(ValueError):
        arith.decompress(nosz)
