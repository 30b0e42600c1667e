"""Overlapping-variant filter.

Drops the lower-quality call when a deletion's span overlaps a following
SNP or deletion, matching the reference filter's interval algebra and
tie-breaking (/root/reference/clair/post_processing/overlap_variant.py:
29-152, 228-267; only the deletion-vs-SNP and deletion-vs-deletion checks
are active there).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Iterable, List, Optional, TextIO, Tuple

EMPTY_INTERVAL = (-1, -1)


@dataclass
class Variant:
    chromosome: str
    position: int
    reference_base: str
    alternate_base: str
    alternate_base_multi: Optional[str]
    quality_score: int
    genotype: str
    depth: str
    allele_frequency: str

    @classmethod
    def from_row(cls, row: str) -> "Variant":
        columns = row.split("\t")
        alternates = columns[4].split(",")
        last = columns[-1].split(":")
        return cls(
            chromosome=columns[0],
            position=int(columns[1]),
            reference_base=columns[3],
            alternate_base=alternates[0],
            alternate_base_multi=alternates[1] if len(alternates) > 1 else None,
            quality_score=int(float(columns[5])),
            genotype=last[0],
            depth=last[2],
            allele_frequency=last[3],
        )

    def to_row(self) -> str:
        alternates = ",".join(
            [self.alternate_base]
            + ([] if self.alternate_base_multi is None else [self.alternate_base_multi])
        )
        last = ":".join(
            [self.genotype, str(self.quality_score), self.depth, self.allele_frequency]
        )
        return "\t".join(
            [self.chromosome, str(self.position), ".", self.reference_base,
             alternates, str(self.quality_score), ".", ".", "GT:GQ:DP:AF", last]
        )


def _maximum_deletion_length(variant: Variant) -> int:
    return len(variant.reference_base) - min(
        len(variant.alternate_base),
        1024 if variant.alternate_base_multi is None else len(variant.alternate_base_multi),
    )


def _snp_interval(variant: Variant) -> Tuple[int, int]:
    is_snp = len(variant.reference_base) == len(variant.alternate_base) or (
        variant.alternate_base_multi is not None
        and len(variant.reference_base) == len(variant.alternate_base_multi)
    )
    return EMPTY_INTERVAL if not is_snp else (variant.position - 1, variant.position)


def _deletion_interval(variant: Variant) -> Tuple[int, int]:
    maximum = _maximum_deletion_length(variant)
    if maximum <= 0:
        return EMPTY_INTERVAL
    return (variant.position - 1, variant.position + maximum)


def _overlaps(interval_1: Tuple[int, int], interval_2: Tuple[int, int]) -> bool:
    if interval_1 is EMPTY_INTERVAL or interval_2 is EMPTY_INTERVAL:
        return False
    begin_1, end_1 = interval_1
    begin_2, _ = interval_2
    return begin_1 <= begin_2 < end_1


def variants_overlap(variant_1: Variant, variant_2: Variant) -> bool:
    if variant_1.chromosome != variant_2.chromosome:
        return False
    if variant_1.position > variant_2.position:
        return variants_overlap(variant_2, variant_1)
    deletion = _deletion_interval(variant_1)
    return _overlaps(deletion, _snp_interval(variant_2)) or _overlaps(
        deletion, _deletion_interval(variant_2)
    )


def filter_overlapping_variants(variants: Iterable[Variant]) -> List[Variant]:
    filtered: List[Variant] = []
    for variant in variants:
        if filtered and variants_overlap(filtered[-1], variant):
            # strict >: on a tie the later variant wins (ref :228-234)
            if filtered[-1].quality_score > variant.quality_score:
                continue
            filtered.pop()
        filtered.append(variant)
    return filtered


def run_filter(input_fh: TextIO = sys.stdin, output_fh: TextIO = sys.stdout) -> None:
    headers, variants = [], []
    for row in input_fh:
        row = row.rstrip("\n")
        if row.startswith("#"):
            headers.append(row)
        elif row:
            variants.append(Variant.from_row(row))
    for header in headers:
        print(header, file=output_fh)
    for variant in filter_overlapping_variants(variants):
        print(variant.to_row(), file=output_fh)
