"""BAM IO + pileup engine tests: round trips through our own BAM
writer/reader, candidate selection goldens, and tensor-creation equivalence
against a naive per-read CIGAR-walk oracle built from the reference spec
(CreateTensor.py:29-65, 245-365)."""

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.data.pileup import (
    COL_A, COL_C, COL_D, COL_G, COL_I, COL_N, COL_T,
    apply_depth_cap,
    create_tensors,
    events_from_reads,
    pileup_counts,
    select_candidates,
    soft_clip_fraction_ok,
)
from clair_tpu.params import FLANKING_BASE_NUM, NO_OF_POSITIONS

REF = ("ACGT" * 60)[:200]  # 200bp reference for contig "chr1"


def _write_bam(path, reads):
    """reads: list of (name, pos0, flag, cigar[(len,op)], seq)."""
    with BamWriter(str(path), [("chr1", len(REF))]) as writer:
        for name, pos, flag, cigar, seq in reads:
            writer.write(name, 0, pos, 60, flag, cigar, seq)


def test_bam_roundtrip(tmp_path):
    path = tmp_path / "t.bam"
    reads = [
        ("r1", 10, 0, [(20, "M")], REF[10:30]),
        ("r2", 15, 16, [(5, "S"), (10, "M"), (2, "I"), (5, "M")], "TTTTT" + REF[15:25] + "GG" + REF[25:30]),
        ("r3", 40, 0, [(10, "M"), (3, "D"), (10, "M")], REF[40:50] + REF[53:63]),
    ]
    _write_bam(path, reads)
    with BamReader(str(path)) as reader:
        assert reader.references == [("chr1", 200)]
        records = list(reader)
    assert [r.read_name for r in records] == ["r1", "r2", "r3"]
    assert records[0].pos == 10 and records[0].cigar_str() == "20M"
    assert records[1].is_reverse and records[1].cigar_str() == "5S10M2I5M"
    assert records[1].seq_str().endswith(REF[25:30])
    assert records[2].reference_length == 23
    assert records[2].reference_end == 63


def test_bam_fetch_region_and_flags(tmp_path):
    path = tmp_path / "t.bam"
    reads = [
        ("r1", 10, 0, [(20, "M")], REF[10:30]),
        ("sup", 12, 2048, [(20, "M")], REF[12:32]),   # supplementary flag
        ("r2", 50, 0, [(20, "M")], REF[50:70]),
        ("r3", 100, 0, [(20, "M")], REF[100:120]),
    ]
    _write_bam(path, reads)
    with BamReader(str(path)) as reader:
        names = [r.read_name for r in reader.fetch("chr1", 15, 60)]
    assert names == ["r1", "r2"]  # supplementary excluded, r3 out of region


def test_soft_clip_filter():
    class Fake:
        def __init__(self, cigar_ops, cigar_lens):
            self.cigar_ops = np.asarray(cigar_ops, dtype=np.uint8)
            self.cigar_lens = np.asarray(cigar_lens, dtype=np.int32)

    # 60M: fine. 60S40M: 40/101 aligned < 55% -> reject
    assert soft_clip_fraction_ok(Fake([0], [60]))
    assert not soft_clip_fraction_ok(Fake([4, 0], [60, 40]))


def test_depth_cap():
    class Fake:
        def __init__(self, pos):
            self.pos = pos

    records = [Fake(5)] * 300 + [Fake(6)] * 2
    kept = apply_depth_cap(records, dcov=250)
    assert len([r for r in kept if r.pos == 5]) == 250
    assert len([r for r in kept if r.pos == 6]) == 2


def test_pileup_counts_and_candidates(tmp_path):
    path = tmp_path / "t.bam"
    # 10 reads ref-matching 20..60; 4 reads with C at position 30 (ref G);
    # 3 reads with a 2bp insertion after position 40; one N base read
    seq = REF[20:60]
    alt = seq[:10] + "C" + seq[11:]
    assert REF[30] == "G"
    reads = [(f"m{i}", 20, 0, [(40, "M")], seq) for i in range(6)]
    reads += [(f"s{i}", 20, 0, [(40, "M")], alt) for i in range(4)]
    reads += [
        (f"i{i}", 20, 0, [(21, "M"), (2, "I"), (19, "M")], seq[:21] + "TT" + seq[21:])
        for i in range(3)
    ]
    reads += [("n0", 20, 0, [(40, "M")], "N" + seq[1:])]
    _write_bam(path, reads)

    with BamReader(str(path)) as reader:
        records = [r for r in reader.fetch("chr1") if soft_clip_fraction_ok(r)]
    events = events_from_reads(records)
    counts = pileup_counts(events, region_start=0, region_length=200)

    assert counts[30, COL_G] == 10      # 6 ref + 3 ins-carrying + 1 n-read
    assert counts[30, COL_C] == 4
    assert counts[40, COL_I] == 3       # insertion attaches before op pos 41
    assert counts[20, COL_N] == 1

    sites = select_candidates(
        counts, REF, region_start=0, ref_seq_start=0,
        minimum_af=0.2, minimum_coverage=4,
    )
    assert 30 in sites.positions        # 4/14 C alt > 0.2
    assert 40 in sites.positions        # 3 I / 14 > 0.2
    idx30 = list(sites.positions).index(30)
    assert sites.reference_bases[idx30] == "G"
    assert sites.depths[idx30] == 14


# ---------------------------------------------------------------------------
# Tensor oracle: naive per-read walk implementing the reference spec
# ---------------------------------------------------------------------------

def oracle_tensor(records, center_1based, ref, min_coverage=0):
    flank = FLANKING_BASE_NUM
    tensor = np.zeros((NO_OF_POSITIONS, 8, 4), dtype=np.int64)
    depth = np.zeros(NO_OF_POSITIONS, dtype=np.int64)
    b2n = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 0}

    for record in records:
        refpos = record.pos
        qpos = 0
        strand = 4 if record.is_reverse else 0
        seq = record.seq_str()
        for op, length in zip(record.cigar_ops, record.cigar_lens):
            opc = "MIDNSHP=X"[op]
            if opc == "S":
                qpos += length
            elif opc in "M=X":
                for _ in range(length):
                    index = refpos - center_1based + flank + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        rb, qb = ref[refpos], seq[qpos]
                        depth[index] += 1
                        tensor[index][b2n[rb] + strand][0] += 1
                        tensor[index][b2n[qb] + strand][1] += 1
                        tensor[index][b2n[rb] + strand][2] += 1
                        tensor[index][b2n[qb] + strand][3] += 1
                    refpos += 1
                    qpos += 1
            elif opc == "I":
                for adv in range(length):
                    index = refpos - center_1based + flank + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        index = min(index + adv, NO_OF_POSITIONS - 1)
                        tensor[index][b2n[seq[qpos]] + strand][1] += 1
                    qpos += 1
            elif opc == "D":
                for _ in range(length):
                    index = refpos - center_1based + flank + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        tensor[index][b2n[ref[refpos]] + strand][2] += 1
                    refpos += 1
            elif opc == "N":
                refpos += length
    if depth[flank] < min_coverage:
        return None
    return tensor


def _random_reads(rs, n=40):
    reads = []
    for i in range(n):
        pos = int(rs.randint(0, 150))
        cigar = []
        seq_parts = []
        refpos = pos
        # random structure: M (+ optional I or D + M)
        m1 = int(rs.randint(10, 30))
        cigar.append((m1, "M"))
        seq_parts.append(_mutate(rs, REF[refpos:refpos + m1]))
        refpos += m1
        choice = rs.rand()
        if choice < 0.3:
            ilen = int(rs.randint(1, 5))
            cigar.append((ilen, "I"))
            seq_parts.append("".join(rs.choice(list("ACGT"), ilen)))
        elif choice < 0.6:
            dlen = int(rs.randint(1, 5))
            cigar.append((dlen, "D"))
            refpos += dlen
        m2 = int(rs.randint(5, 20))
        if refpos + m2 > len(REF):
            m2 = len(REF) - refpos
        if m2 > 0:
            cigar.append((m2, "M"))
            seq_parts.append(_mutate(rs, REF[refpos:refpos + m2]))
        flag = 16 if rs.rand() < 0.5 else 0
        reads.append((f"r{i}", pos, flag, cigar, "".join(seq_parts)))
    return reads


def _mutate(rs, seq):
    out = list(seq)
    for j in range(len(out)):
        if rs.rand() < 0.1:
            out[j] = rs.choice(list("ACGT"))
    return "".join(out)


def test_create_tensors_matches_oracle(tmp_path):
    rs = np.random.RandomState(11)
    reads = _random_reads(rs)
    path = tmp_path / "t.bam"
    _write_bam(path, sorted(reads, key=lambda r: r[1]))
    with BamReader(str(path)) as reader:
        records = list(reader.fetch("chr1"))

    centers = np.array([40, 60, 61, 90, 120], dtype=np.int64)  # 1-based
    events = events_from_reads(records)
    tensors, kept, seqs = create_tensors(events, centers, REF, 0, minimum_coverage=0)

    assert list(kept) == [40, 60, 61, 90, 120]
    for i, center in enumerate(kept):
        expected = oracle_tensor(records, int(center), REF)
        np.testing.assert_array_equal(
            tensors[i].astype(np.int64), expected, err_msg=f"center {center}"
        )
        # sequence context: index 16 is the candidate site (0-based c-1)
        assert seqs[i] == REF[center - 17: center + 16]
        assert seqs[i][16] == REF[center - 1]


def test_create_tensors_min_coverage_drops():
    events = events_from_reads([])
    tensors, kept, seqs = create_tensors(
        events, np.array([50]), REF, 0, minimum_coverage=1
    )
    assert len(kept) == 0 and tensors.shape[0] == 0
