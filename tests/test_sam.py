"""SAM text layer: record <-> line conversion, reader/writer round
trips, the `view` CLI (the samtools-view stand-in)."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.io.sam import (
    SamReader,
    record_to_sam,
    sam_line_to_record,
    sam_to_bam,
    write_sam,
)

REFS = [("chr1", 100000), ("chr2", 50000)]


def _bam_with_everything(tmp_path):
    rs = np.random.RandomState(2)
    path = str(tmp_path / "full.bam")
    seq1 = "".join(rs.choice(list("ACGT"), 60))
    seq2 = "".join(rs.choice(list("ACGT"), 60))
    tags = (b"NMi" + struct.pack("<i", 2)
            + b"MDZ30A29\x00"
            + b"XSf" + struct.pack("<f", 2.5)
            + b"ZAA" + b"Q"
            + b"ZBB" + b"s" + struct.pack("<I", 3)
            + struct.pack("<hhh", -1, 0, 300))
    with BamWriter(path, REFS) as w:
        w.write("p1", 0, 99, 60, 0x1 | 0x2 | 0x40, [(60, "M")], seq1,
                qual=rs.randint(2, 40, 60).astype(np.uint8),
                next_ref_id=0, next_pos=299, tlen=260, tags=tags)
        w.write("p2", 0, 299, 55, 0x1 | 0x2 | 0x10 | 0x80,
                [(30, "S"), (30, "M")], seq2,
                qual=rs.randint(2, 40, 60).astype(np.uint8),
                next_ref_id=0, next_pos=99, tlen=-260)
        w.write("x1", 1, 10, 50, 0, [(60, "M")], seq1, qual=None,
                next_ref_id=0, next_pos=500, tlen=0)  # cross-contig mate
    return path


def test_record_sam_line_roundtrip(tmp_path):
    bam = _bam_with_everything(tmp_path)
    with BamReader(bam) as reader:
        recs = list(reader)
        refs = reader.references
    name_to_id = {name: i for i, (name, _) in enumerate(refs)}
    for rec in recs:
        line = record_to_sam(rec, refs)
        back = sam_line_to_record(line, name_to_id.get)
        assert back.read_name == rec.read_name
        assert back.flag == rec.flag
        assert back.ref_id == rec.ref_id and back.pos == rec.pos
        assert back.mapq == rec.mapq
        assert back.cigar_str() == rec.cigar_str()
        assert back.seq_str() == rec.seq_str()
        if rec.qual is None:
            assert back.qual is None
        else:
            assert np.array_equal(back.qual, rec.qual)
        assert back.next_ref_id == rec.next_ref_id
        assert back.next_pos == rec.next_pos
        assert back.tlen == rec.tlen


def test_same_contig_mate_uses_equals_sign(tmp_path):
    bam = _bam_with_everything(tmp_path)
    with BamReader(bam) as reader:
        lines = [record_to_sam(r, reader.references) for r in reader]
    assert lines[0].split("\t")[6] == "="
    assert lines[2].split("\t")[6] == "chr1"  # cross-contig: named


def test_tag_text_value_fidelity(tmp_path):
    bam = _bam_with_everything(tmp_path)
    with BamReader(bam) as reader:
        rec = next(iter(reader))
        refs = reader.references
    fields = record_to_sam(rec, refs).split("\t")[11:]
    assert "NM:i:2" in fields
    assert "MD:Z:30A29" in fields
    assert "XS:f:2.5" in fields
    assert "ZA:A:Q" in fields
    assert "ZB:B:s,-1,0,300" in fields


def test_sam_to_bam_value_faithful(tmp_path):
    """BAM -> SAM -> BAM: every field value-identical (int tags may
    renarrow, so compare through the SAM text projection)."""
    bam = _bam_with_everything(tmp_path)
    sam = str(tmp_path / "t.sam")
    back = str(tmp_path / "back.bam")
    with BamReader(bam) as reader, open(sam, "w") as out:
        write_sam(iter(reader), reader.references, out,
                  header_text=reader.header_text)
    assert sam_to_bam(sam, back) == 3
    with BamReader(bam) as a, BamReader(back) as b:
        refs = a.references
        assert refs == b.references
        for ra, rb in zip(a, b):
            assert record_to_sam(ra, refs) == record_to_sam(rb, refs)


def test_sam_reader_rejects_malformed(tmp_path):
    path = str(tmp_path / "bad.sam")
    with open(path, "w") as fh:
        fh.write("@SQ\tSN:chr1\tLN:1000\n")
        fh.write("r1\t0\tchr1\t10\t60\t5M\t*\t0\t0\tACGTACGT\t*\n")  # 8 vs 5M
    with pytest.raises(ValueError, match="CIGAR consumes"):
        with SamReader(path) as reader:
            list(reader)


def test_view_cli_bam_cram_sam(tmp_path):
    """view: BAM -> SAM == CRAM -> SAM; SAM -> BAM re-imports."""
    from clair_tpu.io.cram import bam_to_cram

    bam = _bam_with_everything(tmp_path)
    fa = str(tmp_path / "ref.fa")
    rs = np.random.RandomState(3)
    from clair_tpu.utils.simulate import build_fai
    with open(fa, "w") as fh:
        for name, length in REFS:
            seq = "".join(rs.choice(list("ACGT"), length))
            fh.write(f">{name}\n")
            for off in range(0, length, 60):
                fh.write(seq[off:off + 60] + "\n")
    build_fai(fa)
    cram = str(tmp_path / "v.cram")
    bam_to_cram(bam, cram, fa)

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")

    def run_view(*args):
        r = subprocess.run(
            [sys.executable, "-m", "clair_tpu", "view", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]
        return r.stdout

    sam_from_bam = run_view("--input_fn", bam)
    sam_from_cram = run_view("--input_fn", cram, "--ref_fn", fa)
    body_a = [l for l in sam_from_bam.splitlines() if not l.startswith("@")]
    body_b = [l for l in sam_from_cram.splitlines() if not l.startswith("@")]
    assert body_a == body_b and len(body_a) == 3

    sam_path = str(tmp_path / "v.sam")
    with open(sam_path, "w") as fh:
        fh.write(sam_from_bam)
    out_bam = str(tmp_path / "v2.bam")
    run_view("--input_fn", sam_path, "--output_fn", out_bam)
    with BamReader(out_bam) as reader:
        assert len(list(reader)) == 3

    region = run_view("--input_fn", bam, "--region", "chr1:1-200")
    body_r = [l for l in region.splitlines() if not l.startswith("@")]
    assert [l.split("\t")[0] for l in body_r] == ["p1"]
