"""Candidate-extraction equivalence against a naive per-read oracle built
from the reference spec (EVC.py:254-378), plus truth-extraction edge cases."""

import io

import numpy as np

from clair_tpu.data.candidates import (
    CandidateConfig,
    candidate_sites_from_events,
    non_variant_positions_near_variants,
)
from clair_tpu.data.pileup import events_from_reads, pileup_counts
from clair_tpu.data.truth import truth_variants_from_vcf
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.io.fasta import FastaReader, build_fai

REF = ("ACGTTGCA" * 40)[:320]


def oracle_pileup(records, region_length):
    """Per-read CIGAR walk filling {pos: {A,C,G,T,I,D,N}} like the
    reference's dict pileup."""
    counts = {p: dict.fromkeys("ACGTIDN", 0) for p in range(region_length)}
    for record in records:
        refpos, qpos = record.pos, 0
        seq = record.seq_str()
        for op, length in zip(record.cigar_ops, record.cigar_lens):
            opc = "MIDNSHP=X"[op]
            if opc == "S":
                qpos += length
            elif opc in "M=X":
                for _ in range(length):
                    base = seq[qpos]
                    base = base if base == "N" else base  # ACGT stay
                    counts[refpos][base if base in "ACGTN" else "N"] += 1
                    refpos += 1
                    qpos += 1
            elif opc == "I":
                counts[refpos - 1]["I"] += 1
                qpos += length
            elif opc == "D":
                counts[refpos - 1]["D"] += 1
                refpos += length
    return counts


def oracle_candidates(counts, reference, minimum_af, minimum_coverage):
    out = []
    for pos in sorted(counts):
        d = counts[pos]
        depth = sum(d.values()) - d["I"] - d["D"]
        if depth < minimum_coverage:
            continue
        items = sorted(d.items(), key=lambda kv: -kv[1])
        denominator = depth if depth > 0 else 1
        ref_base = reference[pos]
        if items[0][0] != ref_base or items[1][1] / denominator >= minimum_af:
            out.append(pos)
    return out


def test_candidates_match_oracle(tmp_path):
    rs = np.random.RandomState(9)
    reads = []
    for i in range(60):
        pos = int(rs.randint(0, 250))
        m = int(rs.randint(15, 40))
        chunk = list(REF[pos:pos + m])
        for j in range(len(chunk)):
            if rs.rand() < 0.15:
                chunk[j] = rs.choice(list("ACGT"))
        cigar = [(m, "M")]
        if rs.rand() < 0.3:
            cigar.append((2, "I"))
            chunk.append("GG")
        reads.append((f"r{i}", pos, 0, cigar, "".join(chunk)))

    path = tmp_path / "t.bam"
    with BamWriter(str(path), [("chr1", len(REF))]) as writer:
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            writer.write(name, 0, pos, 60, flag, cigar, seq)
    with BamReader(str(path)) as reader:
        records = list(reader.fetch("chr1"))

    events = events_from_reads(records)
    config = CandidateConfig(minimum_af=0.25, minimum_coverage=4, contig="chr1")
    sites = candidate_sites_from_events(events, REF, 0, len(REF), 0, config)

    expected = oracle_candidates(
        oracle_pileup(records, len(REF)), REF, minimum_af=0.25, minimum_coverage=4
    )
    assert list(sites.positions) == expected


def test_near_variant_positions():
    near = non_variant_positions_near_variants({100})
    # 15-16 bp away on both sides, nothing closer
    assert near == {84, 85, 115, 116}
    # overlapping exclusion: a second variant at 110 excludes positions
    # within 15bp of it
    near2 = non_variant_positions_near_variants({100, 110})
    assert 115 not in near2 and 116 not in near2  # too close to 110
    assert 84 in near2 and 85 in near2
    assert 125 in near2 and 126 in near2


def _write_ref(tmp_path, seq):
    path = tmp_path / "r.fa"
    path.write_text(">chr1\n" + seq + "\n")
    build_fai(str(path))
    return FastaReader(str(path))


def test_truth_star_allele_and_merge(tmp_path):
    fasta = _write_ref(tmp_path, "ACGTACGTACGTACGTACGT")
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "\n".join([
            "##fileformat=VCFv4.1",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
            # star allele: spanning deletion resolved against the reference
            "chr1\t5\t.\tA\tT,*\t50\tPASS\t.\tGT\t1/2",
            # two records at one position merge to 1/2
            "chr1\t10\t.\tG\tA\t50\tPASS\t.\tGT\t0/1",
            "chr1\t10\t.\tG\tC\t50\tPASS\t.\tGT\t0/1",
        ]) + "\n"
    )
    variants = list(truth_variants_from_vcf(str(vcf), "chr1", fasta=fasta))
    by_pos = {int(v.position): v for v in variants}
    # star expansion: T kept at 5, deletion anchored at 4
    assert 5 in by_pos and by_pos[5].alternate == "T"
    assert 4 in by_pos
    assert len(by_pos[4].reference) == 2 and len(by_pos[4].alternate) == 1
    # merged multiallelic
    assert by_pos[10].alternate == "A,C"
    assert (by_pos[10].genotype_1, by_pos[10].genotype_2) == ("1", "2")


def test_truth_genotype_normalization(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "\n".join([
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
            "chr1\t5\t.\tA\tT\t50\tPASS\t.\tGT:DP\t1|0:30",   # phased, sorted
            "chr1\t9\t.\tC\tG\t50\tPASS\t.\tGT\t./1",          # missing -> 0
        ]) + "\n"
    )
    variants = list(truth_variants_from_vcf(str(vcf), "chr1"))
    assert (variants[0].genotype_1, variants[0].genotype_2) == ("0", "1")
    assert (variants[1].genotype_1, variants[1].genotype_2) == ("0", "1")
