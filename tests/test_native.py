"""Native C++ event engine: equivalence against the Python/numpy path."""

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.data.pileup import (
    apply_depth_cap,
    create_tensors,
    events_from_reads,
    soft_clip_fraction_ok,
)
from clair_tpu.native import available, events_from_bam_native

REF = ("ACGT" * 60)[:200]

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


def _sort_events(e):
    """Canonical ordering for comparison (engines may order reads equally but
    events within a read are sequential in both)."""
    def key(*arrays):
        return np.lexsort(arrays[::-1])

    m = key(e.match_pos, e.match_qcol, e.match_strand)
    i = key(e.ins_pos, e.ins_adv, e.ins_qcol, e.ins_strand)
    d = key(e.del_pos, e.del_strand)
    return (
        e.match_pos[m], e.match_qcol[m], e.match_strand[m],
        e.ins_pos[i], e.ins_adv[i], e.ins_qcol[i], e.ins_strand[i],
        e.del_pos[d], e.del_strand[d],
        np.sort(e.ins_op_pos), np.sort(e.del_op_pos),
    )


def test_native_events_match_python(tmp_path):
    rs = np.random.RandomState(3)
    path = str(tmp_path / "t.bam")
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        reads = []
        for i in range(60):
            pos = int(rs.randint(0, 150))
            m1 = int(rs.randint(10, 25))
            cigar = [(m1, "M")]
            seq = REF[pos:pos + m1]
            r = rs.rand()
            refp = pos + m1
            if r < 0.3:
                cigar.append((2, "I"))
                seq += "GT"
            elif r < 0.5 and refp + 2 < len(REF):
                cigar.append((3, "D"))
                refp += 3
            m2 = min(int(rs.randint(5, 15)), len(REF) - refp)
            if m2 > 0:
                cigar.append((m2, "M"))
                seq += REF[refp:refp + m2]
            flag = 16 if rs.rand() < 0.5 else 0
            reads.append((f"r{i}", pos, flag, cigar, seq))
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            writer.write(name, 0, pos, 60, flag, cigar, seq)

    with BamReader(path) as reader:
        records = list(reader.fetch("chr1"))
    python_events = events_from_reads(records)
    native_events = events_from_bam_native(path, ref_id=0)

    for a, b in zip(_sort_events(python_events), _sort_events(native_events)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the downstream tensors agree
    centers = np.array([60, 100], dtype=np.int64)
    t_py, k_py, s_py = create_tensors(python_events, centers, REF, 0)
    t_na, k_na, s_na = create_tensors(native_events, centers, REF, 0)
    np.testing.assert_array_equal(t_py, t_na)
    assert s_py == s_na


def test_native_filters_match_python(tmp_path):
    path = str(tmp_path / "t.bam")
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        writer.write("ok", 0, 10, 60, 0, [(40, "M")], REF[10:50])
        writer.write("lowmq", 0, 12, 5, 0, [(40, "M")], REF[12:52])
        writer.write("clip", 0, 14, 60, 0, [(60, "S"), (40, "M")], "A" * 60 + REF[14:54])
        writer.write("sup", 0, 16, 60, 2048, [(40, "M")], REF[16:56])

    native_events = events_from_bam_native(
        path, ref_id=0, min_mapq=10, softclip_filter=True
    )
    with BamReader(path) as reader:
        records = [
            r for r in reader.fetch("chr1", min_mapq=10) if soft_clip_fraction_ok(r)
        ]
    python_events = events_from_reads(records)
    assert native_events.match_pos.shape == python_events.match_pos.shape
    np.testing.assert_array_equal(
        np.sort(native_events.match_pos), np.sort(python_events.match_pos)
    )
