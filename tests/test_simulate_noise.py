"""ONT-like error-profile simulation: CIGAR/query consistency, homopolymer
bias, and read-length spread (the realistic-noise evidence path — the
reference's target platform is noisy ONT data, README.md:57-59)."""

import numpy as np

from clair_tpu.io.bam import BamReader
from clair_tpu.utils.simulate import (
    CLEAN,
    ONT_R94,
    ErrorProfile,
    corrupt_read,
    plant_variants,
    random_reference,
    simulate_bam,
)


def _ref_consumed(cigar):
    return sum(n for n, op in cigar if op in "MDN=X")


def _query_consumed(cigar):
    return sum(n for n, op in cigar if op in "MIS=X")


def test_clean_profile_is_identity():
    cigar, seq = [(30, "M")], "A" * 30
    out_cigar, out_seq = corrupt_read(np.random.RandomState(0), cigar, seq, CLEAN)
    assert out_cigar == cigar and out_seq == seq


def test_all_mismatch_keeps_alignment_shape():
    rs = np.random.RandomState(1)
    seq = "".join(rs.choice(list("ACGT"), 40))
    out_cigar, out_seq = corrupt_read(
        rs, [(40, "M")], seq, ErrorProfile(mismatch=1.0)
    )
    assert out_cigar == [(40, "M")]
    assert len(out_seq) == 40
    assert all(a != b for a, b in zip(seq, out_seq))


def test_deletions_preserve_reference_span():
    rs = np.random.RandomState(2)
    seq = "".join(rs.choice(list("ACGT"), 200))
    cigar = [(200, "M")]
    out_cigar, out_seq = corrupt_read(rs, cigar, seq, ErrorProfile(deletion=0.2))
    assert _ref_consumed(out_cigar) == 200      # M+D spans the same reference
    assert _query_consumed(out_cigar) == len(out_seq) < 200
    assert any(op == "D" for _, op in out_cigar)
    # ends stay M-anchored
    assert out_cigar[0][1] == "M" and out_cigar[-1][1] == "M"


def test_insertions_extend_query_only():
    rs = np.random.RandomState(3)
    seq = "".join(rs.choice(list("ACGT"), 200))
    out_cigar, out_seq = corrupt_read(
        rs, [(200, "M")], seq, ErrorProfile(insertion=0.1, max_indel=2)
    )
    assert _ref_consumed(out_cigar) == 200
    assert _query_consumed(out_cigar) == len(out_seq) > 200
    assert any(op == "I" for _, op in out_cigar)


def test_homopolymer_deletion_bias():
    """Deletions concentrate in homopolymer runs (nanopore signature)."""
    rs = np.random.RandomState(4)
    homopolymer = "A" * 100
    mixed = "ACGT" * 25
    profile = ErrorProfile(deletion=0.02, homopolymer_boost=0.05)
    del_hp = del_mixed = 0
    for _ in range(200):
        c, _ = corrupt_read(rs, [(100, "M")], homopolymer, profile)
        del_hp += sum(n for n, op in c if op == "D")
        c, _ = corrupt_read(rs, [(100, "M")], mixed, profile)
        del_mixed += sum(n for n, op in c if op == "D")
    assert del_hp > 3 * del_mixed


def test_ont_simulation_round_trips(tmp_path):
    rs = np.random.RandomState(5)
    reference = random_reference(rs, 4000)
    variants = plant_variants(rs, reference, n_variants=10, spacing=300)
    bam = str(tmp_path / "ont.bam")
    n = simulate_bam(
        bam, reference, variants, rs, coverage=20,
        read_length=800, error_profile=ONT_R94, read_length_sigma=0.4,
    )
    assert n > 0
    with BamReader(bam) as reader:
        records = list(reader)
    assert len(records) == n
    lengths = [len(r.seq) for r in records]
    assert min(lengths) >= 30 and max(lengths) > 1.3 * min(lengths)  # spread
    # CIGARs carry the noise
    has_indel = sum(
        1 for r in records
        if any(op in (1, 2) for op in r.cigar_ops)
    )
    assert has_indel > n * 0.9
    # positions sorted (valid coordinate-sorted BAM)
    positions = [r.pos for r in records]
    assert positions == sorted(positions)
