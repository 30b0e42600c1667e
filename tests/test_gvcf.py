"""gVCF output mode (pipeline/gvcf.py): reference-confidence math, block
segmentation, and end-to-end coverage invariants through call_bam and the
threaded WGS runner."""

import io
import re

import numpy as np
import pytest

from clair_tpu.pipeline.gvcf import (
    GvcfWriter,
    _variant_pl,
    reference_confidence,
)


def test_reference_confidence_math():
    # columns A,C,G,T,I,D,N
    counts = np.zeros((5, 7), dtype=np.int32)
    counts[0, 0] = 30            # clean depth-30 ref-A site
    counts[1, 0] = 15
    counts[1, 1] = 15            # 50/50 het-looking site
    counts[2] = 0                # no coverage
    counts[3, 0] = 4             # thin but clean
    counts[4, 1] = 30            # clean, but reference byte is '*'
    ref = b"AAAA*"
    depth, gq = reference_confidence(counts, ref, base_err=0.001)
    assert depth.tolist() == [30, 30, 0, 4, 30]
    assert gq[0] == 90           # 30 * ~3.0 per clean ref read
    assert gq[1] == 0            # hom-ref likelihood far below het
    assert gq[2] == 0
    assert 10 <= gq[3] <= 13
    assert gq[4] == 0            # unknown reference byte: no confidence


def test_variant_pl_vectors():
    # biallelic + NON_REF = 3 alleles -> 6 genotypes; called 0/1 at index 1
    assert _variant_pl("0/1", 3, 42) == "42,0,42,42,42,42"
    assert _variant_pl("1/1", 3, 42) == "42,42,0,42,42,42"
    assert _variant_pl("1/2", 4, 7) == "7,7,7,7,0,7,7,7,7,7"
    assert _variant_pl("./.", 3, 9) == "9,9,9,9,9,9"


def _parse_gvcf(text):
    """(blocks, variants): blocks as (pos, end, gq, min_dp), variants as
    field lists."""
    blocks, variants = [], []
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        if f[4].startswith("<NON_REF>"):
            end = int(re.search(r"END=(\d+)", f[7]).group(1))
            sample = f[9].split(":")
            assert f[8] == "GT:GQ:MIN_DP:PL"
            assert sample[0] == "0/0"
            blocks.append((int(f[1]), end, int(sample[1]), int(sample[2])))
        else:
            variants.append(f)
    return blocks, variants


def _coverage_check(blocks, variants, start, end):
    """Every position in [start, end] covered exactly once by a block or a
    variant REF span."""
    covered = np.zeros(end - start + 1, dtype=np.int32)
    for pos, bend, _, _ in blocks:
        covered[pos - start: bend - start + 1] += 1
    for f in variants:
        pos, ref = int(f[1]), f[3]
        covered[pos - start: pos - start + len(ref)] += 1
    assert (covered == 1).all(), (
        f"positions covered != once: {np.flatnonzero(covered != 1)[:10] + start}"
    )


@pytest.fixture(scope="module")
def gvcf_genome(tmp_path_factory):
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    tmp = tmp_path_factory.mktemp("gvcf")
    rs = np.random.RandomState(5)
    ref = random_reference(rs, 6_000)
    variants = plant_variants(rs, ref, n_variants=10, spacing=450)
    bam = str(tmp / "g.bam")
    fa = str(tmp / "g.fa")
    simulate_bam(bam, ref, variants, rs, coverage=30)
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    return bam, fa, ref, variants


def test_call_bam_gvcf_end_to_end(gvcf_genome, tmp_path):
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam

    bam, fa, ref, variants = gvcf_genome
    out = io.StringIO()
    config = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4, gvcf=True,
    )
    call_bam(config, OraclePredictor(), output_fh=out)
    text = out.getvalue()

    assert "##ALT=<ID=NON_REF" in text
    assert "##FORMAT=<ID=MIN_DP" in text
    blocks, rows = _parse_gvcf(text)
    assert blocks and rows
    _coverage_check(blocks, rows, 1, len(ref))
    # blocks and variants interleave in position order
    positions = [b[0] for b in blocks] + [int(f[1]) for f in rows]
    emitted_order = [
        int(line.split("\t")[1])
        for line in text.splitlines()
        if line and not line.startswith("#")
    ]
    assert emitted_order == sorted(positions)
    # every variant row carries NON_REF and a PL tail of the right size
    planted = {v.position for v in variants}
    hit = 0
    for f in rows:
        alts = f[4].split(",")
        assert alts[-1] == "<NON_REF>"
        assert f[8].endswith(":PL")
        n_alleles = 1 + len(alts)
        pl = f[9].split(":")[-1].split(",")
        assert len(pl) == n_alleles * (n_alleles + 1) // 2
        assert pl.count("0") >= 1
        if int(f[1]) in planted:
            hit += 1
    assert hit >= 0.7 * len(planted)
    # interior blocks carry real coverage
    interior = [b for b in blocks if 500 < b[0] and b[1] < len(ref) - 500]
    assert interior and all(b[3] >= 4 for b in interior)


def test_threaded_runner_gvcf_multiwindow(gvcf_genome, tmp_path):
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded

    bam, fa, ref, variants = gvcf_genome
    out_path = str(tmp_path / "wgs.gvcf")
    base = CallBamConfig(
        bam_path=bam, fasta_path=fa, minimum_af=0.2, minimum_coverage=4,
        gvcf=True,
    )
    call_bam_windows_threaded(
        base, OraclePredictor(), out_path,
        chunk_size=2_000, include_all_contigs=True, pileup_workers=1,
    )
    with open(out_path) as fh:
        text = fh.read()
    blocks, rows = _parse_gvcf(text)
    # three 2 kb windows merge into seamless coverage of the whole contig
    _coverage_check(blocks, rows, 1, len(ref))
    assert any(b[0] <= 2000 < b[1] + 1 or b[0] == 2001 for b in blocks)


def test_gvcf_rejects_debug_and_ensemble(gvcf_genome):
    from clair_tpu.pipeline.call_bam import CallBamConfig, prepare_window

    bam, fa, _, _ = gvcf_genome
    for kw in ({"debug": True}, {"output_for_ensemble": True}):
        config = CallBamConfig(
            bam_path=bam, fasta_path=fa, contig="chr1", gvcf=True, **kw
        )
        with pytest.raises(ValueError):
            prepare_window(config)


def test_gvcf_block_binning():
    """Blocks break exactly at GQ-bin boundaries and report min depth/GQ."""
    writer = GvcfWriter(io.StringIO(), gq_bin_size=10)
    depth = np.array([30, 28, 29, 6, 5, 30, 30], dtype=np.int64)
    gq = np.array([90, 95, 98, 15, 12, 91, 95], dtype=np.int64)
    ref = b"ACGTACG"
    out = []
    writer._emit_blocks(out, "chr1", 101, depth, gq, ref, 101, 107)
    parsed, _ = _parse_gvcf("\n".join(out))
    assert parsed == [
        (101, 103, 90, 28),
        (104, 105, 12, 5),
        (106, 107, 91, 30),
    ]
    # REF base of each block comes from the block start
    assert [o.split("\t")[3] for o in out] == ["A", "T", "C"]


def test_variant_pl_haploid():
    # haploid GTs ('1', '0') place the 0 at the homozygous cell
    assert _variant_pl("1", 3, 42) == "42,42,0,42,42,42"
    assert _variant_pl("0", 3, 42) == "0,42,42,42,42,42"


def test_gvcf_show_ref_rows_fold_into_blocks(gvcf_genome):
    """--show_ref hom-ref rows (ALT == REF) are dropped in gVCF mode; the
    covered-exactly-once invariant holds."""
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam

    bam, fa, ref, _ = gvcf_genome
    out = io.StringIO()
    config = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4, gvcf=True, show_reference=True,
    )
    call_bam(config, OraclePredictor(), output_fh=out)
    blocks, rows = _parse_gvcf(out.getvalue())
    for f in rows:
        assert f[4].split(",")[0] != f[3], f
    _coverage_check(blocks, rows, 1, len(ref))


def test_gvcf_deletion_spanning_window_boundary():
    """A deletion whose REF span crosses the window edge suppresses the
    next window's leading block positions (single-writer carry)."""
    out = io.StringIO()
    writer = GvcfWriter(out, gq_bin_size=100)

    class _Work:
        pass

    # window 1: [1, 10]; deletion at pos 9 with 4 bp REF covers 9-12
    w1 = _Work()
    w1.gvcf_data = (
        "chr1", 1,
        np.full(10, 20, dtype=np.int64), np.full(10, 60, dtype=np.int64),
        b"ACGTACGTAC",
    )
    writer.begin_window(w1)
    writer.write_raw("chr1\t9\t.\tACGT\tA\t50\t.\t.\tGT:GQ:DP:AF\t1/1:50:20:0.9\n")
    writer.end_window()

    # window 2: [11, 20], contiguous
    w2 = _Work()
    w2.gvcf_data = (
        "chr1", 11,
        np.full(10, 20, dtype=np.int64), np.full(10, 60, dtype=np.int64),
        b"GTACGTACGT",
    )
    writer.begin_window(w2)
    writer.end_window()

    blocks, rows = _parse_gvcf(out.getvalue())
    assert len(rows) == 1 and rows[0][1] == "9"
    _coverage_check(blocks, rows, 1, 20)
    # window 2's first block starts after the deletion span, not at 11
    assert min(b[0] for b in blocks if b[0] >= 11) == 13
