"""High-coverage regime (BASELINE config 5: 578x HG002HD ONT).

The per-start-position depth cap (--dcov, reference
dataPrepScripts/CreateTensor.py:267-274) defines tensor semantics exactly
in this regime: once a start position holds more than dcov flag/mapq-
passing reads, the reference keeps the FIRST dcov of them in walk (file)
order and silently drops the rest — mapq-failing and excluded-flag reads
are skipped BEFORE the counter (CreateTensor.py:255-274), so they never
consume cap slots. These tests saturate the cap at 2x and verify that
selection through both the Python and native engines, then run a 500x+
flowcell through both tensor paths for byte parity.
"""

import numpy as np
import pytest

from clair_tpu.data.pileup import (
    apply_depth_cap,
    create_tensors,
    events_from_reads,
    finalize_window_tensors,
)
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.params import FLANKING_BASE_NUM, MAX_DEPTH_PER_POSITION

BASE_ROW = {"A": 0, "C": 1, "G": 2, "T": 3}


def _write_saturated_bam(path, reference, pile_pos, read_len, dcov):
    """2x-cap pile at one start position, in an order that witnesses the
    walk-order contract:

    - 10 mapq-0 reads FIRST, carrying the alt (must not consume slots),
    - 5 supplementary-flag reads carrying the alt (excluded by -F 2316),
    - dcov passing reads carrying the REFERENCE base,
    - dcov more passing reads carrying an ALT SNP at the center.

    If the engine keeps the first dcov passing reads in file order, the
    tensor's SNP channel at the center sees zero alt support.
    """
    center0 = pile_pos + read_len // 2           # 0-based center
    ref_base = reference[center0]
    alt_base = "ACGT"[(BASE_ROW[ref_base] + 1) % 4]
    ref_read = reference[pile_pos:pile_pos + read_len]
    alt_read = (
        ref_read[: read_len // 2] + alt_base + ref_read[read_len // 2 + 1:]
    )
    cigar = [(read_len, "M")]
    with BamWriter(str(path), [("chr1", len(reference))]) as writer:
        for i in range(10):
            writer.write(f"lowmq{i}", 0, pile_pos, 0, 0, cigar, alt_read)
        for i in range(5):
            writer.write(f"supp{i}", 0, pile_pos, 60, 2048, cigar, alt_read)
        for i in range(dcov):
            writer.write(f"pass{i}", 0, pile_pos, 60, 0, cigar, ref_read)
        for i in range(dcov):
            writer.write(f"late{i}", 0, pile_pos, 60, 0, cigar, alt_read)
    return center0 + 1, ref_base, alt_base      # 1-based center


def test_depth_cap_keeps_first_dcov_passing_reads_in_walk_order(tmp_path):
    """At 2x cap saturation the kept set is exactly the first dcov
    flag/mapq-passing reads in file order; filtered reads consume no
    slots."""
    rs = np.random.RandomState(5)
    reference = "".join(rs.choice(list("ACGT"), 400))
    dcov = MAX_DEPTH_PER_POSITION
    bam = tmp_path / "pile.bam"
    _write_saturated_bam(bam, reference, pile_pos=100, read_len=120,
                         dcov=dcov)

    with BamReader(str(bam)) as reader:
        records = list(reader.fetch("chr1", 0, 400, min_mapq=10))
    # flag/mapq filtering upstream of the cap: lowmq/supp never arrive
    assert len(records) == 2 * dcov
    kept = apply_depth_cap(records, dcov)
    assert [r.read_name for r in kept] == [f"pass{i}" for i in range(dcov)]


def test_saturated_pile_tensor_matches_native_and_oracle(tmp_path):
    """The center-column tensor at a 2x-saturated pile witnesses the
    selection: ref-row channel 0 counts exactly dcov reads and the alt
    row's SNP channel is zero (every alt-carrying read arrived after the
    cap). Native and Python tensors must be identical."""
    from clair_tpu import native

    rs = np.random.RandomState(6)
    reference = "".join(rs.choice(list("ACGT"), 400))
    dcov = MAX_DEPTH_PER_POSITION
    bam = tmp_path / "pile.bam"
    center1, ref_base, alt_base = _write_saturated_bam(
        bam, reference, pile_pos=100, read_len=120, dcov=dcov
    )
    centers = np.array([center1], dtype=np.int64)

    with BamReader(str(bam)) as reader:
        records = list(reader.fetch("chr1", 0, 400, min_mapq=10))
    tensors_py, kept_py, _ = create_tensors(
        events_from_reads(apply_depth_cap(records, dcov)),
        centers, reference, 0, minimum_coverage=0,
    )
    assert kept_py.tolist() == [center1]
    center_col = tensors_py[0, FLANKING_BASE_NUM]
    # all pile reads are forward strand: rows 0-3
    assert center_col[BASE_ROW[ref_base], 0] == dcov
    assert center_col[BASE_ROW[alt_base], 3] == 0.0

    if not native.available():
        pytest.skip("native library unavailable")
    scan = native.RegionScan(str(bam), 0, 0, 400, use_index=False,
                             min_mapq=10)
    try:
        tensors_native, _indels = scan.tensors(centers, reference, 0,
                                               dcov=dcov)
    finally:
        scan.close()
    ref_raw = np.frombuffer(reference.encode("ascii"), dtype=np.uint8)
    tensors_nat_f, kept_nat, _ = finalize_window_tensors(
        tensors_native.astype(np.float32), centers, ref_raw, 0, 0
    )
    np.testing.assert_array_equal(kept_nat, kept_py)
    np.testing.assert_array_equal(tensors_nat_f, tensors_py)


def test_highcov_flowcell_tensor_parity_native_vs_python(tmp_path):
    """A 500x ONT-like flowcell (the config-5 regime, ~8x the bench's 60x
    ceiling) through both tensor engines: candidate counts and window
    tensors must byte-match, and the column depth must actually reach the
    high-coverage regime (>2x the 250 cap) so the parity claim covers it."""
    from clair_tpu import native
    from clair_tpu.data.pileup import pileup_counts, soft_clip_fraction_ok
    from clair_tpu.utils.simulate import simulate_ont_fast

    if not native.available():
        pytest.skip("native library unavailable")

    rs = np.random.RandomState(21)
    bam = str(tmp_path / "hc.bam")
    reference, variants = simulate_ont_fast(
        bam, rs, length=9000, coverage=520, mean_read_length=450,
        variant_spacing=900,
    )

    region_start, region_length = 500, 8000
    scan = native.RegionScan(bam, 0, region_start,
                             region_start + region_length, use_index=False)
    counts = scan.counts(region_start, region_length)

    with BamReader(bam) as reader:
        records = list(
            reader.fetch("chr1", region_start, region_start + region_length)
        )
    expected_counts = pileup_counts(
        events_from_reads([r for r in records if soft_clip_fraction_ok(r)]),
        region_start, region_length,
    )
    np.testing.assert_array_equal(counts, expected_counts)
    # the regime is real: column depth far beyond the 250 cap
    assert counts.sum(axis=1).max() > 500

    centers = np.array(
        sorted(v.position for v in variants
               if region_start + 40 < v.position < region_start
               + region_length - 40),
        dtype=np.int64,
    )
    assert len(centers) >= 5
    tensors_native, indel_events = scan.tensors(
        centers, reference, 0, dcov=MAX_DEPTH_PER_POSITION
    )
    scan.close()

    expected_events = events_from_reads(
        apply_depth_cap(records, MAX_DEPTH_PER_POSITION)
    )
    tensors_py, kept_py, _ = create_tensors(
        expected_events, centers, reference, 0, minimum_coverage=0,
    )
    ref_raw = np.frombuffer(reference.encode("ascii"), dtype=np.uint8)
    tensors_nat_f, kept_nat, _ = finalize_window_tensors(
        tensors_native.astype(np.float32), centers, ref_raw, 0, 0
    )
    np.testing.assert_array_equal(kept_nat, kept_py)
    np.testing.assert_array_equal(tensors_nat_f, tensors_py)
    np.testing.assert_array_equal(
        indel_events.ins_op_pos, expected_events.ins_op_pos
    )
    np.testing.assert_array_equal(
        indel_events.del_op_pos, expected_events.del_op_pos
    )
