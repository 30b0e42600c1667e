"""Native engine with BAI-seeded region seeks: events must match the
unindexed full scan."""

import numpy as np
import pytest

from clair_tpu.io.bai import build_bai
from clair_tpu.io.bam import BamWriter
from clair_tpu.native import available, events_from_bam_native

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")

REF = ("ACGT" * 3000)[:12000]


def _sorted_bam(tmp_path, n=2500):
    path = str(tmp_path / "s.bam")
    positions = sorted((i * 11) % (len(REF) - 160) for i in range(n))
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        for i, pos in enumerate(positions):
            cigar = [(100, "M")] if i % 5 else [(50, "M"), (2, "I"), (50, "M")]
            seq = REF[pos:pos + 100] + ("GG" if i % 5 == 0 else "")
            if i % 5 == 0:
                seq = REF[pos:pos + 50] + "GG" + REF[pos + 50:pos + 100]
            writer.write(f"r{i:05d}", 0, pos, 60, 0, cigar, seq)
    return path


def _canon(e):
    order = np.lexsort((e.match_strand, e.match_qcol, e.match_pos))
    return (
        e.match_pos[order], e.match_qcol[order], e.match_strand[order],
        np.sort(e.ins_op_pos), np.sort(e.del_op_pos),
    )


def test_indexed_scan_matches_full_scan(tmp_path):
    path = _sorted_bam(tmp_path)
    build_bai(path)

    start, end = 8000, 10_000
    full = events_from_bam_native(path, 0, start, end, use_index=False)
    indexed = events_from_bam_native(path, 0, start, end, use_index=True)

    for a, b in zip(_canon(full), _canon(indexed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: the scan actually sees reads in the window
    assert ((full.match_pos >= start) & (full.match_pos < end)).any()
