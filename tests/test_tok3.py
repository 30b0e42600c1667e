"""tok3 name tokenizer (CRAM 3.1) — round-trips on real name grammars,
token-type coverage, container wiring."""

import struct

import numpy as np
import pytest

from clair_tpu.io import tok3


def _rt(blob: bytes, **kw) -> bytes:
    stream = tok3.encode_names(blob, **kw)
    out = tok3.decode_names(stream)
    assert out == blob, (out[:80], blob[:80])
    return stream


def _blob(names, sep=b"\x00", final=True):
    joined = sep.join(n.encode("ascii") for n in names)
    return joined + (sep if final else b"")


# ---------------------------------------------------------------------------
# name grammars
# ---------------------------------------------------------------------------

def test_illumina_style_names_compress_hard():
    names = [
        f"A00111:159:HWWVJDSXX:1:{1101 + i // 500}:{1000 + (i * 37) % 9000}:{1000 + (i * 91) % 30000}"
        for i in range(2000)
    ]
    blob = _blob(names)
    stream = _rt(blob)
    assert len(stream) < len(blob) // 8  # structured names crush


def test_sra_style_names():
    names = [f"SRR1238539.{i} {i} length=150" for i in range(1, 1500)]
    blob = _blob(names)
    stream = _rt(blob)
    assert len(stream) < len(blob) // 8


def test_ont_style_uuid_names():
    rs = np.random.RandomState(0)
    hexd = "0123456789abcdef"
    names = [
        "-".join(
            "".join(hexd[rs.randint(16)] for _ in range(k))
            for k in (8, 4, 4, 4, 12)
        )
        for _ in range(300)
    ]
    blob = _blob(names)
    _rt(blob)  # random hex barely compresses but must round-trip exactly


def test_synthetic_simulator_names():
    names = [f"r{i}" for i in range(5000)]
    stream = _rt(_blob(names))
    assert len(stream) < 2000  # sequential integers are ~free


# ---------------------------------------------------------------------------
# token types
# ---------------------------------------------------------------------------

def test_duplicate_names_collapse():
    blob = _blob(["read1"] * 1000)
    stream = _rt(blob)
    assert len(stream) < 200


def test_leading_zero_digits_roundtrip():
    names = [f"tile{i:06d}end" for i in range(900, 1100)]
    _rt(_blob(names))


def test_leading_zero_width_change():
    # 0099 -> 0100 -> 101: width and leading-zero status change mid-stream
    names = [f"x{i:04d}" for i in range(90, 110)] + [f"x{i}" for i in range(90, 110)]
    _rt(_blob(names))


def test_digit_run_longer_than_u32_splits():
    names = ["q123456789012345678901234567890", "q123456789012345678901234567891"]
    _rt(_blob(names))


def test_delta_boundary_values():
    # deltas of exactly 0 (match), 1, 255, 256 (forces literal re-emit)
    names = ["n1000", "n1000", "n1001", "n1256", "n1512", "n1767", "n2030"]
    _rt(_blob(names))


def test_mixed_punctuation_and_empty_names():
    names = ["a/b/c", "", "a/b/d", "::x::", "", "a/b/d"]
    _rt(_blob(names))


def test_newline_separated_and_no_final_separator():
    names = ["m54238/0/ccs", "m54238/1/ccs", "m54238/2/ccs"]
    _rt(_blob(names, sep=b"\n", final=True))
    _rt(_blob(names, sep=b"\n", final=False))
    _rt(_blob(names, sep=b"\x00", final=False))


def test_arith_backed_streams():
    names = [f"A1:2:{i}:{i * 7 % 1000}" for i in range(800)]
    blob = _blob(names)
    stream = _rt(blob, use_arith=True)
    assert stream[8] & tok3.F_ARITH
    assert len(stream) < len(blob) // 4


# ---------------------------------------------------------------------------
# format pins
# ---------------------------------------------------------------------------

def test_header_layout_golden():
    blob = _blob(["ab1", "ab2"])
    stream = tok3.encode_names(blob)
    ulen, nnames = struct.unpack_from("<II", stream, 0)
    assert ulen == len(blob) and nnames == 2
    assert stream[8] == 0  # rans4x16, NUL-separated, trailing sep present
    # first stream descriptor: position 0 TYPE stream with the NEW_POS bit
    assert stream[9] == tok3.T_TYPE | 0x80


def test_decode_rejects_garbage():
    with pytest.raises(Exception):
        tok3.decode_names(b"\x01\x02")
    blob = _blob(["read1", "read2"])
    stream = bytearray(tok3.encode_names(blob))
    stream[0] ^= 0xFF  # corrupt ulen -> loud size mismatch
    with pytest.raises(ValueError):
        tok3.decode_names(bytes(stream))


# ---------------------------------------------------------------------------
# native decoder (clair_tok3.cpp)
# ---------------------------------------------------------------------------

def test_native_decoder_matches_python():
    """Every stream the encoder can produce decodes byte-identically
    through the native decoder AND the pure-Python reference, for both
    entropy backends."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(3)
    hexd = "0123456789abcdef"
    name_sets = [
        [f"A00111:159:HWWVJDSXX:1:{1101 + i // 50}:{(i * 37) % 9000}"
         for i in range(300)],
        [f"SRR1238539.{i} {i} length=150" for i in range(1, 200)],
        ["read1"] * 50,
        [f"tile{i:06d}end" for i in range(90, 120)],
        ["a/b/c", "", "a/b/d", "::x::", "", "a/b/d"],
        ["q123456789012345678901", "q123456789012345678902"],
        ["-".join("".join(hexd[rs.randint(16)] for _ in range(k))
                  for k in (8, 4, 4, 4, 12)) for _ in range(40)],
    ]
    variants = [(b"\x00", True), (b"\n", True), (b"\x00", False)]
    for names in name_sets:
        for sep, final in variants:
            data = _blob(names, sep=sep, final=final)
            for use_arith in (False, True):
                stream = tok3.encode_names(data, use_arith=use_arith)
                nat = native.tok3_decode(stream, len(data))
                assert nat == data, (names[0], sep, final, use_arith)
                # the public decode (which dispatches to native) agrees
                assert tok3.decode_names(stream) == data


def test_native_decoder_rejects_corruption():
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    data = _blob([f"r{i}" for i in range(500)])
    stream = bytearray(tok3.encode_names(data))
    for cut in (1, 8, 12, len(stream) // 2, len(stream) - 2):
        assert native.tok3_decode(bytes(stream[:cut]), len(data)) is None
    bad = bytearray(stream)
    bad[0] ^= 0xFF  # ulen mismatch
    assert native.tok3_decode(bytes(bad), len(data)) is None


def test_native_decoder_rejects_malformed_descriptors():
    """Regression pair: a first descriptor without the new-position bit
    indexed the dense table at position -1 (heap underflow write), and a
    UINT64_MAX duplicate index wrapped the bounds check."""
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    data = _blob([f"r{i}" for i in range(50)])
    stream = bytearray(tok3.encode_names(data))
    no_newpos = bytearray(stream)
    no_newpos[9] &= 0x7F  # clear D_NEW_POS on the first descriptor
    assert native.tok3_decode(bytes(no_newpos), len(data)) is None
    # dup index with all-continuation uint7 bytes -> huge value
    forged = bytes(stream[:9]) + bytes([0x80 | 0x40 | tok3.T_TYPE]) \
        + b"\xff" * 9 + b"\x7f"
    assert native.tok3_decode(forged, len(data)) is None


# ---------------------------------------------------------------------------
# container wiring
# ---------------------------------------------------------------------------

def test_cram31_rn_block_uses_tok3(tmp_path):
    import os

    from clair_tpu.io.bam import BamReader
    from clair_tpu.io.cram import (
        CramReader, METHOD_TOK3, bam_to_cram,
    )
    from tests.test_cram import REF, _make_bam, _records_equal, _write_ref

    records = [
        (f"A001:23:{i}:{(i * 17) % 4000}", 10 * i, 0, [(60, "M")],
         REF[10 * i: 10 * i + 60], 60)
        for i in range(30)
    ]
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, records)
    cram_path = os.path.join(str(tmp_path), "tok3.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1))
    with open(cram_path, "rb") as fh:
        payload = fh.read()
    # the method byte of some block in the file is tok3 followed by
    # CT_EXTERNAL(4) and content id 6 (RN)
    assert bytes([METHOD_TOK3, 4, 6]) in payload
    with BamReader(bam_path) as bam:
        originals = list(bam)
    with CramReader(cram_path, fasta=fasta_path) as cram:
        decoded = list(cram)
    assert len(decoded) == len(originals)
    for a, b in zip(originals, decoded):
        _records_equal(a, b)
