"""fqzcomp quality codec (CRAM 3.1) — round-trips on realistic quality
profiles, in-stream record lengths, container wiring."""

import os

import numpy as np
import pytest

from clair_tpu.io import fqzcomp


def _rt(data: bytes, lengths=None) -> bytes:
    stream = fqzcomp.compress(data, lengths)
    out = fqzcomp.decompress(stream, len(data))
    assert out == data
    return stream


def _smooth_quals(rs, n, lo=10, hi=40):
    """Random-walk qualities — the profile the context model targets."""
    steps = rs.randint(-2, 3, n)
    q = np.clip(np.cumsum(steps) + (lo + hi) // 2, lo, hi)
    return bytes(q.astype(np.uint8))


# ---------------------------------------------------------------------------
# profiles
# ---------------------------------------------------------------------------

def test_constant_quals_are_nearly_free():
    data = bytes([30]) * 10_000
    stream = _rt(data, [100] * 100)
    assert len(stream) < 200


def test_smooth_ont_like_quals_compress():
    rs = np.random.RandomState(0)
    lengths = [int(x) for x in rs.randint(500, 1500, 40)]
    data = b"".join(_smooth_quals(rs, n) for n in lengths)
    stream = _rt(data, lengths)
    assert len(stream) < len(data) // 2  # smooth walk ≪ 8 bits/value


def test_binned_illumina_quals_use_dense_alphabet():
    rs = np.random.RandomState(1)
    lengths = [150] * 60
    data = bytes(rs.choice([2, 12, 23, 37], sum(lengths),
                           p=[.05, .1, .15, .7]).astype(np.uint8))
    stream = _rt(data, lengths)
    assert stream[8] == 3  # nsym-1: the 4 binned values only
    assert len(stream) < len(data) // 3


def test_random_quals_round_trip():
    rs = np.random.RandomState(2)
    data = bytes(rs.randint(0, 64, 5000, dtype=np.uint8))
    _rt(data, [500] * 10)


def test_varying_record_lengths_recovered_in_stream():
    rs = np.random.RandomState(3)
    lengths = [1, 7, 300, 2, 999, 64]
    data = b"".join(_smooth_quals(rs, n) for n in lengths)
    stream = fqzcomp.compress(data, lengths)
    # the decoder learns the lengths from the stream alone
    assert fqzcomp.decompress(stream) == data


def test_single_record_default():
    data = _smooth_quals(np.random.RandomState(4), 3000)
    _rt(data)  # lengths omitted -> one record spanning the block


def test_position_context_helps_positional_profile():
    """Illumina-style 3' quality droop: position belongs in the context."""
    rs = np.random.RandomState(5)
    rec = np.clip(38 - (np.arange(150) // 10) + rs.randint(-1, 2, 150), 2, 40)
    data = bytes(rec.astype(np.uint8)) * 200
    stream = _rt(data, [150] * 200)
    assert len(stream) < len(data) // 4


# ---------------------------------------------------------------------------
# format pins / errors
# ---------------------------------------------------------------------------

def test_header_layout_golden():
    data = bytes([20, 21, 22, 23]) * 100
    stream = fqzcomp.compress(data, [40] * 10)
    assert stream[0] == 5       # spec version
    assert stream[1] == 0       # gflags: single parameter set
    assert stream[2] == 23      # max symbol
    assert stream[7] == 10      # uint7 record count
    assert stream[8] == 3       # alphabet size minus one


def test_bad_version_and_gflags_rejected():
    data = bytes([30]) * 100
    stream = bytearray(fqzcomp.compress(data, [50, 50]))
    bad = bytearray(stream)
    bad[0] = 4
    with pytest.raises(ValueError, match="version"):
        fqzcomp.decompress(bytes(bad))
    bad = bytearray(stream)
    bad[1] = 1
    with pytest.raises(ValueError, match="gflags"):
        fqzcomp.decompress(bytes(bad))


def test_length_mismatch_rejected():
    with pytest.raises(ValueError, match="lengths"):
        fqzcomp.compress(b"\x1e" * 100, [30, 30])


def test_size_mismatch_rejected():
    stream = fqzcomp.compress(b"\x1e" * 100, [50, 50])
    with pytest.raises(ValueError):
        fqzcomp.decompress(stream, 99)


def test_truncated_rejected():
    with pytest.raises(Exception):
        fqzcomp.decompress(b"\x05\x00")


def test_full_256_symbol_alphabet_round_trips():
    """The nsym-1 header byte must carry a block touching every byte
    value (regression: u8 overflow crashed the writer)."""
    data = bytes(range(256)) * 4
    _rt(data, [256] * 4)


def test_reserved_qshift_rejected_loudly():
    stream = bytearray(fqzcomp.compress(b"\x1e" * 100, [50, 50]))
    stream[4] ^= 0x7F  # qshift != qbits
    with pytest.raises(ValueError, match="qshift"):
        fqzcomp.decompress(bytes(stream))


def test_overrunning_record_length_bails_early():
    """A record length exceeding the block's promised size must raise
    before decoding it (regression: a hostile 2^32-ish length spun for
    minutes building a multi-GB buffer first)."""
    data = bytes([30]) * 1000
    stream = fqzcomp.compress(data, [1000])
    with pytest.raises(ValueError, match="overruns"):
        fqzcomp.decompress(stream, 10)


# ---------------------------------------------------------------------------
# container wiring
# ---------------------------------------------------------------------------

def test_cram31_archive_profile_round_trip(tmp_path):
    from clair_tpu.io.bam import BamReader
    from clair_tpu.io.cram import (
        CramReader, METHOD_FQZCOMP, bam_to_cram,
    )
    from tests.test_cram import REF, _make_bam, _records_equal, _write_ref

    records = [
        (f"r{i}", 10 * i, 0, [(60, "M")], REF[10 * i: 10 * i + 60], 60)
        for i in range(30)
    ] + [
        ("ins", 150, 0, [(20, "M"), (4, "I"), (20, "M")],
         REF[150:170] + "ACGT" + REF[170:190], 60),
    ]
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, records)
    cram_path = os.path.join(str(tmp_path), "fqz.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1),
                fqzcomp_quals=True)
    with open(cram_path, "rb") as fh:
        payload = fh.read()
    # some block is fqzcomp + CT_EXTERNAL(4) + content id 23 (QS)
    assert bytes([METHOD_FQZCOMP, 4, 23]) in payload
    with BamReader(bam_path) as bam:
        originals = list(bam)
    with CramReader(cram_path, fasta=fasta_path) as cram:
        assert cram.version == (3, 1)
        decoded = list(cram)
    assert len(decoded) == len(originals)
    for a, b in zip(originals, decoded):
        _records_equal(a, b)


# ---------------------------------------------------------------------------
# native decoder (clair_fqzcomp.cpp)
# ---------------------------------------------------------------------------

def test_native_decoder_matches_python(monkeypatch):
    """Every stream the encoder can produce decodes byte-identically
    through the native decoder AND the pure-Python reference (context
    hash, model update, and range-coder rules must mirror exactly)."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(13)
    cases = []
    # smooth ONT-like walks, one and many records
    q = _smooth_quals(rs, 50_000)
    cases.append((q, None))
    lengths = []
    rem = len(q)
    while rem > 0:
        ln = int(min(rem, rs.randint(200, 1500)))
        lengths.append(ln)
        rem -= ln
    cases.append((q, lengths))
    # binned Illumina alphabet
    binned = bytes(rs.choice([2, 12, 23, 37], 30_000,
                             p=[.05, .15, .3, .5]).astype(np.uint8))
    cases.append((binned, [100] * 300))
    # constant, tiny, random-byte, and full-alphabet streams
    cases.append((bytes([30]) * 10_000, [250] * 40))
    cases.append((b"\x28", [1]))
    cases.append((bytes(rs.randint(0, 256, 8_000, dtype=np.uint8)), None))
    cases.append((bytes(range(256)) * 10, None))
    for data, lengths in cases:
        stream = fqzcomp.compress(data, lengths)
        nat = native.fqzcomp_decompress(stream, len(data))
        assert nat == data, (len(data), lengths and len(lengths))
        # pure-Python reference on the same bytes
        monkeypatch.setattr(native, "fqzcomp_decompress",
                            lambda *_a, **_k: None)
        assert fqzcomp.decompress(stream, len(data)) == data
        monkeypatch.undo()


def test_native_decoder_rejects_malformed():
    """Truncated/forged streams return None from the native decoder (the
    public path then raises via the Python reference) — never a crash."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(14)
    data = _smooth_quals(rs, 5_000)
    stream = bytearray(fqzcomp.compress(data, [500] * 10))
    assert native.fqzcomp_decompress(bytes(stream), len(data)) == data
    # wrong promised size
    assert native.fqzcomp_decompress(bytes(stream), len(data) - 7) is None
    # forged version / gflags / qshift
    for off, val in ((0, 4), (1, 1), (4, 9)):
        bad = bytearray(stream)
        bad[off] = val
        assert native.fqzcomp_decompress(bytes(bad), len(data)) is None
    # hostile context geometry
    bad = bytearray(stream)
    bad[3] = 200  # qbits
    bad[4] = 200  # qshift (keep == qbits so the geometry check is hit)
    assert native.fqzcomp_decompress(bytes(bad), len(data)) is None
    # truncations through the body
    for cut in (3, 8, len(stream) // 2):
        out = native.fqzcomp_decompress(bytes(stream[:cut]), len(data))
        assert out is None or out != data  # never a crash; typically None
