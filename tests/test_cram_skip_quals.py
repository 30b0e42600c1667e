"""Lazy quality skipping: exclusive QS/QQ blocks stay compressed, record
output is unchanged, and the safety analysis refuses shared/core codecs."""

import numpy as np
import pytest

from clair_tpu.io import cram as cram_mod
from clair_tpu.io.bam import BamReader
from clair_tpu.io.cram import (
    ByteArrayLenCodec,
    CompressionHeader,
    CramReader,
    ExternalCodec,
    HuffmanCodec,
    METHOD_FQZCOMP,
    bam_to_cram,
    qual_skip_info,
)

from tests.test_cram import REF, _make_bam, _records_equal, _write_ref


def _header(codecs):
    h = CompressionHeader()
    h.codecs = codecs
    return h


# ---------------------------------------------------------------------------
# safety analysis
# ---------------------------------------------------------------------------

def test_exclusive_external_qs_is_skippable():
    h = _header({"BA": ExternalCodec(16), "QS": ExternalCodec(23)})
    skip_ids, qs, qq = qual_skip_info(h)
    assert qs and skip_ids == frozenset({23})
    assert not qq or True  # QQ absent -> not skippable, no ids


def test_qs_sharing_block_with_other_series_is_not_skippable():
    h = _header({"BA": ExternalCodec(23), "QS": ExternalCodec(23)})
    skip_ids, qs, _ = qual_skip_info(h)
    assert not qs and not skip_ids


def test_qs_sharing_block_with_qq_is_not_skippable():
    h = _header({
        "QS": ExternalCodec(23),
        "QQ": ByteArrayLenCodec(ExternalCodec(7), ExternalCodec(23)),
    })
    skip_ids, qs, qq = qual_skip_info(h)
    assert not qs and not qq and not skip_ids


def test_core_coded_qs_is_not_skippable():
    # non-constant Huffman consumes core bits; skipping would desync MQ
    h = _header({"QS": HuffmanCodec([30, 35], [1, 1])})
    _, qs, _ = qual_skip_info(h)
    assert not qs


def test_constant_huffman_qs_is_noopable_without_blocks():
    h = _header({"QS": HuffmanCodec([30], [0])})
    skip_ids, qs, _ = qual_skip_info(h)
    assert qs and not skip_ids


def test_tag_sharing_qs_block_is_not_skippable():
    h = _header({"QS": ExternalCodec(23)})
    h.tag_codecs = {(ord("N") << 16) | (ord("M") << 8) | ord("c"):
                    ExternalCodec(23)}
    _, qs, _ = qual_skip_info(h)
    assert not qs


# ---------------------------------------------------------------------------
# end to end
# ---------------------------------------------------------------------------

def _records():
    return [
        (f"r{i}", 10 * i, 0, [(60, "M")], REF[10 * i: 10 * i + 60], 60)
        for i in range(30)
    ] + [
        ("ins", 150, 0, [(20, "M"), (4, "I"), (20, "M")],
         REF[150:170] + "ACGT" + REF[170:190], 60),
        ("dele", 300, 16, [(20, "M"), (3, "D"), (20, "M")],
         REF[300:320] + REF[323:343], 60),
    ]


@pytest.mark.parametrize("use_native", [True, False])
def test_fqzcomp_qs_block_never_decompressed(tmp_path, monkeypatch,
                                             use_native):
    """Reading an archive-profile CRAM must not touch the fqzcomp
    decoder at all; forcing full decode must."""
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, _records())
    cram_path = str(tmp_path / "a.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1),
                fqzcomp_quals=True)
    with open(cram_path, "rb") as fh:
        assert bytes([METHOD_FQZCOMP, 4, 23]) in fh.read()

    from clair_tpu.io import fqzcomp

    calls = []
    orig = fqzcomp.decompress
    monkeypatch.setattr(fqzcomp, "decompress",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))

    with BamReader(bam_path) as bam:
        originals = list(bam)
    with CramReader(cram_path, fasta=fasta_path,
                    use_native=use_native) as r:
        skipped = list(r)
    assert not calls, "QS block was decompressed despite skip_quals"
    assert len(skipped) == len(originals)
    for a, b in zip(originals, skipped):
        _records_equal(a, b)

    with CramReader(cram_path, fasta=fasta_path, use_native=use_native,
                    skip_quals=False) as r:
        full = list(r)
    assert calls, "skip_quals=False must exercise the quality codec"
    assert len(full) == len(skipped)
    for a, b in zip(full, skipped):
        _records_equal(a, b)


def test_skip_matches_full_decode_on_default_cram(tmp_path):
    """3.0 files (rans QS) give identical records either way, via both
    decoders."""
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, _records())
    cram_path = str(tmp_path / "b.cram")
    bam_to_cram(bam_path, cram_path, fasta_path)
    outs = []
    for use_native in (True, False):
        for skip in (True, False):
            with CramReader(cram_path, fasta=fasta_path,
                            use_native=use_native, skip_quals=skip) as r:
                outs.append(list(r))
    n = len(outs[0])
    assert n == len(_records())
    for other in outs[1:]:
        assert len(other) == n
        for a, b in zip(outs[0], other):
            _records_equal(a, b)


def test_embedded_ref_id_aliasing_is_respected(tmp_path):
    """An embedded-reference file still decodes when skipping is on
    (the embedded block id must never be skipped)."""
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, _records())
    cram_path = str(tmp_path / "c.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1),
                embed_reference=True, fqzcomp_quals=True)
    with CramReader(cram_path) as r:  # no FASTA: embedded ref must work
        assert len(list(r)) == len(_records())
