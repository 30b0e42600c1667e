"""Reference-parity tensor modes: --stop_consider_left_edge and the
available-slots throttle (ref CreateTensor.py:92-100, 180, 279-304),
validated against a naive per-read walk oracle implementing the documented
semantics independently of the vectorized engine."""

import numpy as np

from clair_tpu.data.pileup import (
    apply_slot_throttle,
    create_tensors,
    events_from_reads,
)
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.params import FLANKING_BASE_NUM, NO_OF_POSITIONS

REF = ("ACGTTGCA" * 40)[:320]
FLANK = FLANKING_BASE_NUM


def _write_bam(path, reads):
    with BamWriter(str(path), [("chr1", len(REF))]) as writer:
        for name, pos, flag, cigar, seq in reads:
            writer.write(name, 0, pos, 60, flag, cigar, seq)


def _records(tmp_path, reads):
    path = tmp_path / "t.bam"
    _write_bam(path, reads)
    with BamReader(str(path)) as reader:
        return list(reader.fetch("chr1"))


def oracle_tensor(records, center_1based, ref, consider_left_edge=True):
    """Per-read walk for ONE window. With left-edge inclusion off, a read
    contributes only if it covers the window's activation key at 0-based
    position center-17 (ref CreateTensor.py:99-100), i.e. starts at or
    before it."""
    tensor = np.zeros((NO_OF_POSITIONS, 8, 4), dtype=np.int64)
    b2n = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 0}
    for record in records:
        if not consider_left_edge and record.pos > center_1based - (FLANK + 1):
            continue
        refpos, qpos = record.pos, 0
        strand = 4 if record.is_reverse else 0
        seq = record.seq_str()
        for op, length in zip(record.cigar_ops, record.cigar_lens):
            opc = "MIDNSHP=X"[op]
            if opc == "S":
                qpos += length
            elif opc in "M=X":
                for _ in range(length):
                    index = refpos - center_1based + FLANK + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        rb, qb = ref[refpos], seq[qpos]
                        tensor[index][b2n[rb] + strand][0] += 1
                        tensor[index][b2n[qb] + strand][1] += 1
                        tensor[index][b2n[rb] + strand][2] += 1
                        tensor[index][b2n[qb] + strand][3] += 1
                    refpos += 1
                    qpos += 1
            elif opc == "I":
                for adv in range(length):
                    index = refpos - center_1based + FLANK + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        index = min(index + adv, NO_OF_POSITIONS - 1)
                        tensor[index][b2n[seq[qpos]] + strand][1] += 1
                    qpos += 1
            elif opc == "D":
                for _ in range(length):
                    index = refpos - center_1based + FLANK + 1
                    if 0 <= index < NO_OF_POSITIONS:
                        tensor[index][b2n[ref[refpos]] + strand][2] += 1
                    refpos += 1
    return tensor


def _random_reads(rs, n=50):
    reads = []
    for i in range(n):
        pos = int(rs.randint(0, 260))
        m1 = int(rs.randint(8, 25))
        m1 = min(m1, len(REF) - pos - 10)
        cigar = [(m1, "M")]
        seq_parts = [REF[pos:pos + m1]]
        refpos = pos + m1
        choice = rs.rand()
        if choice < 0.35:
            ilen = int(rs.randint(1, 4))
            cigar.append((ilen, "I"))
            seq_parts.append("".join(rs.choice(list("ACGT"), ilen)))
        elif choice < 0.6:
            dlen = int(rs.randint(1, 4))
            cigar.append((dlen, "D"))
            refpos += dlen
        m2 = min(int(rs.randint(5, 15)), len(REF) - refpos)
        if m2 > 0:
            cigar.append((m2, "M"))
            seq_parts.append(REF[refpos:refpos + m2])
        flag = 16 if rs.rand() < 0.5 else 0
        reads.append((f"r{i}", pos, flag, cigar, "".join(seq_parts)))
    return reads


def test_left_edge_modes_match_oracle(tmp_path):
    rs = np.random.RandomState(7)
    records = _records(tmp_path, _random_reads(rs))
    centers = np.array([60, 61, 100, 140, 200], dtype=np.int64)

    for consider in (True, False):
        events = events_from_reads(records, track_read_layout=True)
        tensors, kept, _ = create_tensors(
            events, centers, REF, 0, consider_left_edge=consider
        )
        for i, c in enumerate(kept):
            expected = oracle_tensor(records, int(c), REF, consider_left_edge=consider)
            np.testing.assert_array_equal(
                tensors[i].astype(np.int64), expected,
                err_msg=f"center {c} consider_left_edge={consider}",
            )


def test_left_edge_off_excludes_mid_window_read(tmp_path):
    center = 100  # 1-based; activation key at 0-based 83
    covering = ("cov", 80, 0, [(40, "M")], REF[80:120])
    inside = ("ins", 90, 0, [(30, "M")], REF[90:120])
    records = _records(tmp_path, [covering, inside])
    centers = np.array([center], dtype=np.int64)

    events = events_from_reads(records, track_read_layout=True)
    t_on, _, _ = create_tensors(events, centers, REF, 0, consider_left_edge=True)
    t_off, _, _ = create_tensors(events, centers, REF, 0, consider_left_edge=False)

    # with left-edge on, both reads cover the center: depth 2; off: only 1
    assert t_on[0, FLANK, :, 0].sum() == 2
    assert t_off[0, FLANK, :, 0].sum() == 1
    # the boundary read (start == key) still contributes in off mode
    boundary = ("bnd", 83, 0, [(37, "M")], REF[83:120])
    records2 = _records(tmp_path, [covering, inside, boundary])
    events2 = events_from_reads(records2, track_read_layout=True)
    t_off2, _, _ = create_tensors(events2, centers, REF, 0, consider_left_edge=False)
    assert t_off2[0, FLANK, :, 0].sum() == 2


def oracle_throttle_cut(records, centers, budget, consider_left_edge=True):
    """Walk events in read-stream order; an event is kept iff the pair
    budget (one slot per window it feeds) has not been exceeded after
    charging it whole. Returns the set of kept global walk ordinals."""
    kept = set()
    used = 0
    ordinal = 0

    def windows_for(pos, rstart):
        count = 0
        for c in centers:
            if pos - c + FLANK + 1 < 0 or pos - c + FLANK + 1 >= NO_OF_POSITIONS:
                continue
            if not consider_left_edge and rstart > c - (FLANK + 1):
                continue
            count += 1
        return count

    for record in records:
        refpos = record.pos
        for op, length in zip(record.cigar_ops, record.cigar_lens):
            opc = "MIDNSHP=X"[op]
            if opc in "M=XD":
                for _ in range(length):
                    used += windows_for(refpos, record.pos)
                    if used <= budget:
                        kept.add(ordinal)
                    ordinal += 1
                    refpos += 1
            elif opc == "I":
                for _ in range(length):
                    used += windows_for(refpos, record.pos)
                    if used <= budget:
                        kept.add(ordinal)
                    ordinal += 1
    return kept


def test_slot_throttle_matches_walk_order_oracle(tmp_path):
    rs = np.random.RandomState(11)
    records = _records(tmp_path, _random_reads(rs, n=25))
    centers = np.array([60, 100, 140], dtype=np.int64)
    events = events_from_reads(records, track_read_layout=True)

    for budget in (0, 37, 150, 10**9):
        kept_oracle = oracle_throttle_cut(records, centers, budget)
        throttled = apply_slot_throttle(events, centers, budget)
        kept_engine = set(
            np.concatenate(
                [throttled.match_ord, throttled.ins_ord, throttled.del_ord]
            ).tolist()
        )
        # engine keeps only events that feed >= 0 windows; oracle keeps all
        # within budget — compare on events that feed at least one window
        spans = {}
        ordinal = 0
        for record in records:
            refpos = record.pos
            for op, length in zip(record.cigar_ops, record.cigar_lens):
                opc = "MIDNSHP=X"[op]
                if opc in "M=XD":
                    for _ in range(length):
                        spans[ordinal] = any(
                            0 <= refpos - c + FLANK + 1 < NO_OF_POSITIONS
                            for c in centers
                        )
                        ordinal += 1
                        refpos += 1
                elif opc == "I":
                    for _ in range(length):
                        spans[ordinal] = any(
                            0 <= refpos - c + FLANK + 1 < NO_OF_POSITIONS
                            for c in centers
                        )
                        ordinal += 1
        assert {o for o in kept_engine if spans.get(o)} == {
            o for o in kept_oracle if spans.get(o)
        }, f"budget {budget}"


def test_slot_throttle_huge_budget_is_identity(tmp_path):
    rs = np.random.RandomState(3)
    records = _records(tmp_path, _random_reads(rs, n=30))
    centers = np.array([80, 120], dtype=np.int64)
    events = events_from_reads(records, track_read_layout=True)

    t_plain, _, _ = create_tensors(events, centers, REF, 0)
    t_throttled, _, _ = create_tensors(events, centers, REF, 0, slot_budget=10**9)
    np.testing.assert_array_equal(t_plain, t_throttled)

    # zero budget -> empty tensors
    t_zero, _, _ = create_tensors(events, centers, REF, 0, slot_budget=0)
    assert t_zero.sum() == 0


def test_create_tensor_cli_flags(tmp_path):
    """CLI surface: --stop_consider_left_edge changes emitted tensors."""
    from clair_tpu.cli import main as cli_main

    bam = tmp_path / "t.bam"
    _write_bam(
        bam,
        [
            ("cov", 80, 0, [(40, "M")], REF[80:120]),
            ("ins", 90, 0, [(30, "M")], REF[90:120]),
        ],
    )
    from clair_tpu.io.bai import build_bai
    build_bai(str(bam), str(bam) + ".bai")
    ref_fn = tmp_path / "ref.fa"
    ref_fn.write_text(">chr1\n" + REF + "\n")
    can_fn = tmp_path / "can"
    can_fn.write_text("chr1 100 A 2\n")

    def run(extra):
        out = tmp_path / "tensor_out"
        cli_main(
            [
                "create_tensor",
                "--bam_fn", str(bam), "--ref_fn", str(ref_fn),
                "--can_fn", str(can_fn), "--tensor_fn", str(out),
                "--ctgName", "chr1",
            ]
            + extra
        )
        return out.read_text()

    default = run([])
    off = run(["--stop_consider_left_edge"])
    assert default != off
    throttled = run(["--compat_slot_throttle", "5000000"])
    assert throttled == default  # budget far above this tiny window
