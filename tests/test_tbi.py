"""Tabix (.tbi) index: build/read round trip and the windowed truth-VCF
fetch path (ref GetTruth.py:88-95 uses external tabix for this)."""

import gzip

import numpy as np
import pytest

from clair_tpu.data.truth import truth_variants_from_vcf
from clair_tpu.io.tbi import (
    TbiIndex,
    build_tbi,
    indexed_vcf_lines,
    write_bgzf,
)

HEADER = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"


def _vcf_row(ctg, pos, ref, alt, gt):
    return f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t60\tPASS\t.\tGT\t{gt}\n"


def _make_vcf(tmp_path, rows, name="truth.vcf.gz"):
    path = tmp_path / name
    write_bgzf(str(path), (HEADER + "".join(rows)).encode("ascii"))
    build_tbi(str(path))
    return str(path)


def _big_vcf(tmp_path):
    rs = np.random.RandomState(5)
    rows = []
    for ctg in ("chr1", "chr2"):
        positions = np.sort(rs.choice(np.arange(100, 2_000_000), 3000, replace=False))
        for p in positions:
            rows.append(_vcf_row(ctg, int(p), "A", "T", "0/1"))
    return _make_vcf(tmp_path, rows), rows


def test_tbi_roundtrip_and_gzip_readable(tmp_path):
    path, _ = _big_vcf(tmp_path)
    index = TbiIndex(path + ".tbi")
    assert index.names == ["chr1", "chr2"]
    assert index.format == 2 and index.col_beg == 2
    # the index itself must be BGZF (gzip-readable) for external tabix
    with gzip.open(path + ".tbi", "rb") as fh:
        assert fh.read(4) == b"TBI\x01"


def test_indexed_window_matches_full_scan(tmp_path):
    path, _ = _big_vcf(tmp_path)
    # full scan fallback: a copy without the .tbi next to it
    import shutil

    plain = tmp_path / "plain.vcf.gz"
    shutil.copy(path, plain)
    nonempty = 0
    for ctg, start, end in (
        ("chr1", 500_000, 600_000),
        ("chr1", 1, 100),
        ("chr2", 1_900_000, 2_000_000),
        ("chr2", 1, 2_000_000),
    ):
        indexed = [
            v.line() for v in truth_variants_from_vcf(path, ctg, start, end)
        ]
        full = [
            v.line()
            for v in truth_variants_from_vcf(str(plain), ctg, start, end)
        ]
        assert indexed == full, (ctg, start, end)
        nonempty += bool(indexed)
    assert nonempty >= 3


def test_indexed_fetch_skips_preceding_data(tmp_path):
    path, _ = _big_vcf(tmp_path)
    lines = indexed_vcf_lines(path, "chr2", 1_500_000)
    first = next(iter(lines))
    columns = first.split("\t")
    # seek landed at/before the window, not at the file top
    assert columns[0] == "chr2" and int(columns[1]) > 1_000_000


def test_indexed_early_stop_is_lazy(tmp_path):
    """The windowed fetch must not inflate the whole file: consuming a
    small window touches only a prefix of the post-seek lines."""
    path, _ = _big_vcf(tmp_path)
    consumed = 0

    from clair_tpu.io import tbi as tbi_module

    original = tbi_module.lines_from_voffset

    def counting(path_, voffset):
        nonlocal consumed
        for line in original(path_, voffset):
            consumed += 1
            yield line

    tbi_module.lines_from_voffset = counting
    try:
        list(truth_variants_from_vcf(path, "chr1", 200_000, 210_000))
    finally:
        tbi_module.lines_from_voffset = original
    assert 0 < consumed < 1000  # 6000 data lines total


def test_multiallelic_merge_inside_window(tmp_path):
    rows = [
        _vcf_row("chr1", 150, "A", "T", "0/1"),
        _vcf_row("chr1", 150, "A", "G", "0/1"),
        _vcf_row("chr1", 300, "C", "CTT", "1/1"),
    ]
    path = _make_vcf(tmp_path, rows)
    out = list(truth_variants_from_vcf(path, "chr1", 100, 200))
    assert len(out) == 1
    assert out[0].alternate == "T,G" and (out[0].genotype_1, out[0].genotype_2) == ("1", "2")


def test_cli_index_vcf(tmp_path, capsys):
    rows = [_vcf_row("chr1", 100, "A", "T", "0/1")]
    path = tmp_path / "x.vcf.gz"
    write_bgzf(str(path), (HEADER + "".join(rows)).encode("ascii"))
    from clair_tpu.cli import main as cli_main

    cli_main(["index_vcf", "--vcf_fn", str(path)])
    assert (tmp_path / "x.vcf.gz.tbi").exists()
    TbiIndex(str(path) + ".tbi")


def test_lazy_fetch_survives_partial_block_headers(tmp_path):
    """Regression: a BGZF block header straddling a raw-read chunk boundary
    must wait for more bytes, not be misread as EOF (which silently
    truncated the stream) or crash. Tiny chunk sizes force the straddle at
    every block."""
    from clair_tpu.io.tbi import lines_from_voffset

    rows = [_vcf_row("chr1", p, "A", "T", "0/1") for p in range(100, 5100, 10)]
    path = tmp_path / "t.vcf.gz"
    # small bgzf blocks -> many block boundaries
    write_bgzf(str(path), (HEADER + "".join(rows)).encode("ascii"), block_size=256)

    expected = list(lines_from_voffset(str(path), 0))
    assert len(expected) == len(rows) + 2  # header lines included
    for chunk in (7, 18, 19, 255, 300):
        got = list(lines_from_voffset(str(path), 0, chunk_size=chunk))
        assert got == expected, f"chunk_size={chunk}"


def test_streaming_index_over_tiny_blocks(tmp_path):
    """Force lines to straddle many BGZF members (512-byte blocks): the
    streaming builder's carry/virtual-offset bookkeeping must index them
    identically to the full scan."""
    rs = np.random.RandomState(11)
    rows = [
        _vcf_row("chr1", int(p), "A", "T", "0/1")
        for p in np.sort(rs.choice(np.arange(100, 500_000), 800, replace=False))
    ]
    path = str(tmp_path / "tiny_blocks.vcf.gz")
    write_bgzf(path, (HEADER + "".join(rows)).encode("ascii"), block_size=512)
    build_tbi(path)
    import shutil

    plain = tmp_path / "plain.vcf.gz"
    shutil.copy(path, plain)
    for ctg, start, end in (("chr1", 1, 1000), ("chr1", 200_000, 300_000),
                            ("chr1", 490_000, 500_000)):
        indexed = [v.line() for v in truth_variants_from_vcf(path, ctg, start, end)]
        full = [v.line() for v in truth_variants_from_vcf(str(plain), ctg, start, end)]
        assert indexed == full, (ctg, start, end)
