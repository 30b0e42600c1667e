"""Vectorized batch decode.

The reference decodes every site through a Python list lattice
(call_var.py:693-947, HOT LOOP #2 in SURVEY §3.2). Here the winning
category of EVERY site in a batch is computed with a handful of numpy
reductions (each category's maximum factorizes over the two length heads),
and sites that resolve to homo-reference or SNPs — the overwhelming
majority — are fully decoded vectorized. Only indel winners fall back to
the exact per-site lattice walk (pipeline.decode.decode_site), which
preserves the retry semantics those categories need.

Equivalence with the per-site path is tested against random probability
vectors (tests/test_batch_decode.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from clair_tpu.params import FLANKING_BASE_NUM
from clair_tpu.pipeline.decode import (
    CH_DELETE,
    CH_REFERENCE,
    CH_SNP,
    IndelSources,
    OutputConfig,
    SiteCall,
    decode_site,
    quality_score_from,
)
from clair_tpu.task.genotype import Genotype, genotype_string_from
from clair_tpu.task.gt21 import GT21, HETERO_SNP_GT21, HOMO_SNP_GT21
from clair_tpu.utils.genomics import BASE2ACGT, BASE2NUM, BASIC_BASES

OFF = 16
_HOMO_SNP = np.asarray(HOMO_SNP_GT21, dtype=int)
_HETERO_SNP = np.asarray(HETERO_SNP_GT21, dtype=int)
_HET_INS = np.asarray([GT21.AIns, GT21.CIns, GT21.GIns, GT21.TIns], dtype=int)
_HET_DEL = np.asarray([GT21.ADel, GT21.CDel, GT21.GDel, GT21.TDel], dtype=int)

# category indices in the reference's tie-break order
CAT_REF, CAT_HOMO_SNP, CAT_HET_SNP = 0, 1, 2
_N_CATEGORIES = 10

# base pair -> gt21 code for the 10 unordered pairs
_PAIR_CODE = np.zeros((4, 4), dtype=int)
for _i, _b1 in enumerate("ACGT"):
    for _j, _b2 in enumerate("ACGT"):
        pair = "".join(sorted(_b1 + _b2))
        _PAIR_CODE[_i, _j] = GT21[pair]

_BASES = "ACGT"


def _top2(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(max, argmax, second_max) along the last axis."""
    argmax = values.argmax(axis=-1)
    vmax = np.take_along_axis(values, argmax[..., None], -1)[..., 0]
    masked = values.copy()
    np.put_along_axis(masked, argmax[..., None], -np.inf, -1)
    second = masked.max(axis=-1)
    return vmax, argmax, second


def category_maxima(
    gt21_p: np.ndarray,
    geno_p: np.ndarray,
    vl1_p: np.ndarray,
    vl2_p: np.ndarray,
    ref_codes: np.ndarray,
) -> np.ndarray:
    """(10, B) per-category maximum probabilities in tie-break order.

    Mirrors OutcomeLattice category maxima exactly; each pair category's
    maximum factorizes over the two independent length heads, with the
    DelDel i != j constraint handled via top-2.
    """
    gt21 = gt21_p.astype(np.float64)
    geno = geno_p.astype(np.float64)
    vl1 = vl1_p.astype(np.float64)
    vl2 = vl2_p.astype(np.float64)
    n = len(gt21)

    p_ref, p_homo, p_het = geno[:, 0], geno[:, 1], geno[:, 2]
    z1, z2 = vl1[:, OFF], vl2[:, OFF]
    vl0 = z1 * z2
    pos1, pos2 = vl1[:, OFF + 1:], vl2[:, OFF + 1:]
    neg1, neg2 = vl1[:, :OFF], vl2[:, :OFF]

    rows = np.arange(n)
    out = np.empty((_N_CATEGORIES, n), dtype=np.float64)
    out[CAT_REF] = vl0 * p_ref * gt21[rows, ref_codes]
    out[CAT_HOMO_SNP] = vl0 * p_homo * gt21[:, _HOMO_SNP].max(-1)
    out[CAT_HET_SNP] = vl0 * p_het * gt21[:, _HETERO_SNP].max(-1)

    ins_ins = gt21[:, GT21.InsIns]
    del_del = gt21[:, GT21.DelDel]
    out[3] = (pos1 * pos2).max(-1) * p_homo * ins_ins            # homo Ins
    het_ins_len = np.maximum(z1 * pos2.max(-1), pos1.max(-1) * z2)
    out[4] = het_ins_len * gt21[:, _HET_INS].max(-1) * p_het     # het ACGT+Ins
    out[5] = pos1.max(-1) * pos2.max(-1) * p_het * ins_ins       # het InsIns
    out[6] = (neg1 * neg2).max(-1) * p_homo * del_del            # homo Del
    het_del_len = np.maximum(z1 * neg2.max(-1), neg1.max(-1) * z2)
    out[7] = het_del_len * gt21[:, _HET_DEL].max(-1) * p_het     # het ACGT+Del

    # het DelDel needs i != j: use top-2 when the argmaxes collide
    n1max, n1arg, n1second = _top2(neg1)
    n2max, n2arg, n2second = _top2(neg2)
    same = n1arg == n2arg
    deldel_pair = np.where(
        same, np.maximum(n1max * n2second, n1second * n2max), n1max * n2max
    )
    out[8] = deldel_pair * p_het * del_del

    out[9] = (
        np.maximum(pos1.max(-1) * n2max, n1max * pos2.max(-1))
        * p_het * gt21[:, GT21.InsDel]
    )
    return out


def decode_batch(
    x: np.ndarray,
    infos: Sequence[Tuple[str, str, str]],
    gt21_p: np.ndarray,
    genotype_p: np.ndarray,
    vl1_p: np.ndarray,
    vl2_p: np.ndarray,
    output_config: OutputConfig,
    indel_sources: IndelSources = IndelSources(),
) -> List[Tuple[int, SiteCall]]:
    """Decode a batch; returns [(batch_index, SiteCall), ...] in order."""
    n = len(infos)
    center = FLANKING_BASE_NUM

    center_bases = np.array([info[2][center] for info in infos])
    valid = np.isin(center_bases, list(BASIC_BASES))
    read_depth = (x[:, center, :, CH_DELETE] + x[:, center, :, CH_REFERENCE]).sum(-1)
    valid &= read_depth > 0

    ref_acgt_idx = np.array(
        [BASE2NUM[BASE2ACGT.get(b, "A")] for b in center_bases], dtype=int
    )
    ref_codes = _PAIR_CODE[ref_acgt_idx, ref_acgt_idx]

    maxima = category_maxima(gt21_p, genotype_p, vl1_p, vl2_p, ref_codes)
    winners = maxima.argmax(axis=0)

    results: List[Tuple[int, SiteCall]] = []
    gt21_64 = gt21_p.astype(np.float64)

    homo_snp_arg = gt21_64[:, _HOMO_SNP].argmax(-1)
    het_snp_arg = gt21_64[:, _HETERO_SNP].argmax(-1)

    for i in range(n):
        if not valid[i]:
            continue
        winner = winners[i]
        chromosome, position_str, sequence = infos[i]

        if winner > CAT_HET_SNP:
            # indel categories: exact per-site lattice (retry semantics)
            call = decode_site(
                x[i], chromosome, int(position_str), sequence,
                gt21_p[i], genotype_p[i], vl1_p[i], vl2_p[i],
                output_config, indel_sources,
            )
            if call is not None:
                results.append((i, call))
            continue

        ref_base_raw = sequence[center]
        depth = float(read_depth[i])

        if winner == CAT_REF:
            if not (output_config.is_show_reference or output_config.is_debug):
                continue
            ref_base = BASE2ACGT[ref_base_raw]
            b = BASE2NUM[ref_base]
            supported = float(
                x[i, center, b, CH_REFERENCE] + x[i, center, b + 4, CH_REFERENCE]
            )
            genotype_string = genotype_string_from(Genotype.homo_reference)
            category = "homo_ref"
            alternate = ref_base
            reference = ref_base
            is_reference, is_multi = True, False
        else:
            if winner == CAT_HOMO_SNP:
                label = GT21(int(_HOMO_SNP[homo_snp_arg[i]])).name
                base1, base2 = label[0], label[1]
                reference = ref_base_raw
                alternate = base1 if base1 != reference else base2
                is_multi = False
                genotype_string = genotype_string_from(Genotype.homo_variant)
                category = "homo_snp"
            else:
                label = GT21(int(_HETERO_SNP[het_snp_arg[i]])).name
                base1, base2 = label[0], label[1]
                reference = ref_base_raw
                is_multi = base1 != reference and base2 != reference
                if is_multi:
                    alternate = f"{base1},{base2}"
                    genotype_string = genotype_string_from(Genotype.hetero_variant_multi)
                else:
                    alternate = base1 if base1 != reference else base2
                    genotype_string = genotype_string_from(Genotype.hetero_variant)
                category = "hetero_snp"
            is_reference = False
            if reference == alternate and not output_config.is_debug:
                continue
            supported = 0.0
            for base in alternate:
                if base == ",":
                    continue
                b = BASE2NUM[base]
                supported += float(
                    x[i, center, b, CH_SNP] + x[i, center, b + 4, CH_SNP]
                    + x[i, center, b, CH_REFERENCE] + x[i, center, b + 4, CH_REFERENCE]
                )

        # haploid modes (ref call_var.py:1077-1084)
        if output_config.is_haploid_precision_mode_enabled and category == "hetero_snp":
            continue
        if output_config.is_haploid_sensitive_mode_enabled and is_multi:
            continue

        quality = quality_score_from(
            reference, alternate, genotype_string, gt21_p[i], genotype_p[i]
        )
        if (
            output_config.is_haploid_precision_mode_enabled
            or output_config.is_haploid_sensitive_mode_enabled
        ):
            genotype_string = "1" if "1" in genotype_string else "0"

        results.append((
            i,
            SiteCall(
                category=category,
                reference_base=reference,
                alternate_base=alternate,
                genotype_string=genotype_string,
                quality_score=quality,
                read_depth=int(depth),
                allele_frequency=min(supported / depth, 1.0) if depth else 0.0,
                is_reference=is_reference,
                is_multi=is_multi,
            ),
        ))
    return results
