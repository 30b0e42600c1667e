"""Synthetic diploid genome / read simulator.

The reference's only end-to-end check is a downloadable demo script
(SURVEY §4); this framework ships a self-contained simulator instead:
plant variants on two haplotypes, generate error-free or noisy reads, and
write reference FASTA + sorted BAM + truth VCF with this framework's own
IO stack. Used by the demo pipeline and the full-loop tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from clair_tpu.io.bam import BamWriter
from clair_tpu.io.fasta import build_fai


@dataclasses.dataclass
class PlantedVariant:
    position: int          # 1-based
    ref: str
    alt: str
    genotype: Tuple[int, int]   # (0,1) het / (1,1) hom

    @property
    def is_het(self) -> bool:
        return self.genotype == (0, 1)


def random_reference(rs: np.random.RandomState, length: int) -> str:
    return "".join(rs.choice(list("ACGT"), length))


def plant_variants(
    rs: np.random.RandomState,
    reference: str,
    n_variants: int = 60,
    spacing: int = 150,
    start: int = 300,
) -> List[PlantedVariant]:
    """Alternate SNP / insertion / deletion variants, evenly spaced, each
    randomly hom (1/1) or het (0/1)."""
    variants = []
    position = start
    kinds = ["snp", "ins", "del"]
    for i in range(n_variants):
        if position + spacing >= len(reference) - 300:
            break
        kind = kinds[i % 3]
        het = bool(rs.randint(2))
        ref_base = reference[position - 1]  # 1-based position
        if kind == "snp":
            alt = rs.choice([b for b in "ACGT" if b != ref_base])
            variants.append(PlantedVariant(position, ref_base, alt, (0, 1) if het else (1, 1)))
        elif kind == "ins":
            ins = "".join(rs.choice(list("ACGT"), rs.randint(1, 4)))
            variants.append(
                PlantedVariant(position, ref_base, ref_base + ins, (0, 1) if het else (1, 1))
            )
        else:
            dlen = int(rs.randint(1, 4))
            ref_seq = reference[position - 1: position + dlen]
            variants.append(
                PlantedVariant(position, ref_seq, ref_base, (0, 1) if het else (1, 1))
            )
        position += spacing + int(rs.randint(0, spacing // 2))
    return variants


def haplotype_sequences(
    reference: str, variants: List[PlantedVariant]
) -> Tuple[List[Tuple[int, str, str]], List[Tuple[int, str, str]]]:
    """Per-haplotype variant lists [(pos1, ref, alt)]: hap1 carries every
    variant; hap0 carries only hom variants."""
    hap1 = [(v.position, v.ref, v.alt) for v in variants]
    hap0 = [(v.position, v.ref, v.alt) for v in variants if not v.is_het]
    return hap0, hap1


def _read_from_haplotype(
    reference: str,
    hap_variants: List[Tuple[int, str, str]],
    start0: int,
    read_length: int,
):
    """Build (cigar, seq) for a read starting at 0-based start0 over the
    haplotype, expressed against the reference coordinates."""
    cigar: List[Tuple[int, str]] = []
    seq_parts: List[str] = []
    refp = start0
    consumed = 0
    by_pos = {p - 1: (r, a) for p, r, a in hap_variants}

    def push(op: str, length: int):
        if length <= 0:
            return
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + length, op)
        else:
            cigar.append((length, op))

    while consumed < read_length and refp < len(reference):
        if refp in by_pos:
            ref_allele, alt_allele = by_pos[refp]
            if len(ref_allele) == len(alt_allele) == 1:       # SNP
                seq_parts.append(alt_allele)
                push("M", 1)
                refp += 1
                consumed += 1
            elif len(alt_allele) > len(ref_allele):           # insertion
                take = min(read_length - consumed, 1)
                seq_parts.append(alt_allele[0])
                push("M", 1)
                consumed += take
                ins = alt_allele[1:]
                ins_take = min(len(ins), read_length - consumed)
                if ins_take > 0:
                    seq_parts.append(ins[:ins_take])
                    push("I", ins_take)
                    consumed += ins_take
                refp += 1
            else:                                             # deletion
                seq_parts.append(alt_allele)
                push("M", 1)
                consumed += 1
                push("D", len(ref_allele) - 1)
                refp += len(ref_allele)
        else:
            seq_parts.append(reference[refp])
            push("M", 1)
            refp += 1
            consumed += 1
    return cigar, "".join(seq_parts)


def simulate_bam(
    bam_path: str,
    reference: str,
    variants: List[PlantedVariant],
    rs: np.random.RandomState,
    coverage: int = 30,
    read_length: int = 150,
    error_rate: float = 0.0,
    contig: str = "chr1",
) -> int:
    """Write a coordinate-sorted BAM of haplotype-aware reads; returns the
    number of reads."""
    hap0, hap1 = haplotype_sequences(reference, variants)
    n_reads = coverage * len(reference) // read_length
    reads = []
    for i in range(n_reads):
        start0 = int(rs.randint(0, len(reference) - read_length))
        hap = hap1 if i % 2 else hap0
        cigar, seq = _read_from_haplotype(reference, hap, start0, read_length)
        if error_rate > 0:
            seq_arr = np.array(list(seq))
            err = rs.rand(len(seq_arr)) < error_rate
            if err.any():
                seq_arr[err] = rs.choice(list("ACGT"), int(err.sum()))
                seq = "".join(seq_arr)
        flag = 16 if rs.rand() < 0.5 else 0
        reads.append((f"sim{i}", start0, flag, cigar, seq))

    with BamWriter(bam_path, [(contig, len(reference))]) as writer:
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            writer.write(name, 0, pos, 60, flag, cigar, seq)
    return n_reads


def write_fasta(path: str, reference: str, contig: str = "chr1") -> None:
    with open(path, "w") as fh:
        fh.write(f">{contig}\n")
        for offset in range(0, len(reference), 60):
            fh.write(reference[offset:offset + 60] + "\n")
    build_fai(path)


def write_truth_vcf(path: str, variants: List[PlantedVariant], contig: str = "chr1") -> None:
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.1\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE\n")
        for v in variants:
            gt = "0/1" if v.is_het else "1/1"
            fh.write(
                f"{contig}\t{v.position}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t{gt}\n"
            )
