"""Decode-lattice golden tests.

The OutcomeLattice is validated against a straightforward loop-based oracle
built from the reference's enumeration spec (call_var.py:344-425, 589-690),
plus end-to-end site decodes on constructed tensors.
"""

import numpy as np
import pytest

from clair_tpu.data.tensor_stream import normalize_channels
from clair_tpu.pipeline.decode import (
    IndelSources,
    OutcomeLattice,
    OutputConfig,
    decode_site,
    inferred_deletion_length,
    insertion_bases_using_tensor,
    quality_score_from,
)
from clair_tpu.task.genotype import Genotype
from clair_tpu.task.gt21 import GT21

RS = np.random.RandomState(7)
OFF = 16


def random_probs(rs):
    def softmax(v):
        ev = np.exp(v - v.max())
        return ev / ev.sum()
    return (
        softmax(rs.randn(21)), softmax(rs.randn(3)),
        softmax(rs.randn(33)), softmax(rs.randn(33)),
    )


def oracle_categories(gt21_p, geno_p, vl1, vl2, ref_base):
    """Loop-built candidate lists in the reference's exact ordering."""
    from clair_tpu.task.gt21 import gt21_code_from_label, HOMO_SNP_GT21, HETERO_SNP_GT21

    p_homo, p_het, p_ref = geno_p[1], geno_p[2], geno_p[0]
    vl0 = vl1[OFF] * vl2[OFF]
    out = {}
    out["homo_ref"] = vl0 * p_ref * gt21_p[gt21_code_from_label(ref_base * 2)]
    out["homo_snp"] = [vl0 * p_homo * gt21_p[g] for g in HOMO_SNP_GT21]
    out["hetero_snp"] = [vl0 * p_het * gt21_p[g] for g in HETERO_SNP_GT21]
    out["homo_ins"] = [
        vl1[i + OFF] * vl2[i + OFF] * p_homo * gt21_p[GT21.InsIns] for i in range(1, 17)
    ]
    het_ins = [
        max(vl1[OFF] * vl2[i + OFF], vl1[i + OFF] * vl2[OFF]) for i in range(1, 17)
    ]
    out["het_acgt_ins"] = [
        p * gt21_p[g] * p_het
        for p in het_ins
        for g in (GT21.AIns, GT21.CIns, GT21.GIns, GT21.TIns)
    ]
    out["het_insins"] = [
        vl1[i + OFF] * vl2[j + OFF] * p_het * gt21_p[GT21.InsIns]
        for i in range(1, 17) for j in range(1, 17)
    ]
    out["homo_del"] = [
        vl1[-i + OFF] * vl2[-i + OFF] * p_homo * gt21_p[GT21.DelDel] for i in range(1, 17)
    ]
    het_del = [
        max(vl1[OFF] * vl2[-i + OFF], vl1[-i + OFF] * vl2[OFF]) for i in range(1, 17)
    ]
    out["het_acgt_del"] = [
        p * gt21_p[g] * p_het
        for p in het_del
        for g in (GT21.ADel, GT21.CDel, GT21.GDel, GT21.TDel)
    ]
    out["het_deldel"] = [
        vl1[-i + OFF] * vl2[-j + OFF] * p_het * gt21_p[GT21.DelDel]
        for i in range(1, 17) for j in range(1, 17) if i != j
    ]
    insdel = []
    for i in range(1, 17):
        for j in range(1, 17):
            insdel.append(vl1[i + OFF] * vl2[-j + OFF] * p_het * gt21_p[GT21.InsDel])
            insdel.append(vl1[-i + OFF] * vl2[j + OFF] * p_het * gt21_p[GT21.InsDel])
    out["het_insdel"] = insdel
    return out


@pytest.mark.parametrize("trial", range(20))
def test_lattice_matches_oracle(trial):
    rs = np.random.RandomState(trial)
    gt21_p, geno_p, vl1, vl2 = random_probs(rs)
    lat = OutcomeLattice(gt21_p, geno_p, vl1, vl2, "A")
    oracle = oracle_categories(
        gt21_p.astype(np.float64), geno_p.astype(np.float64),
        vl1.astype(np.float64), vl2.astype(np.float64), "A",
    )
    np.testing.assert_allclose(lat.homo_ref, oracle["homo_ref"], rtol=1e-12)
    for name in OutcomeLattice.CATEGORY_ORDER:
        np.testing.assert_allclose(
            getattr(lat, name), np.asarray(oracle[name]), rtol=1e-12,
            err_msg=name,
        )
    # pick() must agree with the oracle's first-attaining order
    cat, idx = lat.pick()
    global_max = max(
        [oracle["homo_ref"]] + [max(oracle[n]) for n in OutcomeLattice.CATEGORY_ORDER]
    )
    if oracle["homo_ref"] == global_max:
        assert cat == "homo_ref"
    else:
        for name in OutcomeLattice.CATEGORY_ORDER:
            if max(oracle[name]) == global_max:
                assert cat == name
                assert idx == int(np.argmax(oracle[name]))
                break


def _blank_counts():
    return np.zeros((33, 8, 4), dtype=np.float32)


def _add_match(x, row, ref_idx, query_idx, n, strand=0):
    s = 4 * strand
    x[row, ref_idx + s, 0] += n
    x[row, query_idx + s, 1] += n
    x[row, ref_idx + s, 2] += n
    x[row, query_idx + s, 3] += n


SEQ = "ACGTACGTACGTACGTAGGTACGTACGTACGTA"  # center (idx 16) = 'A'
B = {"A": 0, "C": 1, "G": 2, "T": 3}


def _cfg(**kw):
    return OutputConfig(**kw)


def _probs(gt21_idx, geno_idx, len1=0, len2=0):
    gt21 = np.full(21, 1e-4); gt21[gt21_idx] = 1.0; gt21 /= gt21.sum()
    geno = np.full(3, 1e-4); geno[geno_idx] = 1.0; geno /= geno.sum()
    vl1 = np.full(33, 1e-5); vl1[len1 + OFF] = 1.0; vl1 /= vl1.sum()
    vl2 = np.full(33, 1e-5); vl2[len2 + OFF] = 1.0; vl2 /= vl2.sum()
    return gt21, geno, vl1, vl2


def test_decode_hom_snp():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B["G"] if row == 16 else B[SEQ[row]], 10)
    normalize_channels(x)
    gt21, geno, vl1, vl2 = _probs(GT21.GG, Genotype.homo_variant)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg())
    assert call.reference_base == "A" and call.alternate_base == "G"
    assert call.genotype_string == "1/1"
    assert call.read_depth == 10
    assert call.allele_frequency == 1.0  # all reads support G


def test_decode_het_snp_and_multiallelic():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    _add_match(x, 16, B["A"], B["C"], 5)
    normalize_channels(x)
    gt21, geno, vl1, vl2 = _probs(GT21.AC, Genotype.hetero_variant)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg())
    assert (call.reference_base, call.alternate_base) == ("A", "C")
    assert call.genotype_string == "0/1"

    # both alleles non-reference -> 1/2 with two ALTs
    gt21, geno, vl1, vl2 = _probs(GT21.CG, Genotype.hetero_variant)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg())
    assert call.alternate_base == "C,G"
    assert call.genotype_string == "1/2"


def test_decode_hom_insertion_bases_from_tensor():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    # 2-bp "GG" insertion after the center in 6 reads: rows 17, 18 insert G
    x[17, B["G"], 1] += 6
    x[18, B["G"], 1] += 6
    normalize_channels(x)
    gt21, geno, vl1, vl2 = _probs(GT21.InsIns, Genotype.homo_variant, 2, 2)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg())
    assert call.reference_base == "A"
    assert call.alternate_base == "AGG"
    assert call.genotype_string == "1/1"


def test_decode_hom_deletion_uses_context():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    x[17, B[SEQ[17]], 2] += 6  # deletion marks in delete channel
    x[18, B[SEQ[18]], 2] += 6
    normalize_channels(x)
    gt21, geno, vl1, vl2 = _probs(GT21.DelDel, Genotype.homo_variant, -2, -2)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg())
    # deleted bases = context seq[17:19] == "GG"
    assert call.reference_base == "A" + SEQ[17:19]
    assert call.alternate_base == "A"


def test_decode_insins_identical_alleles_retries():
    """An InsIns pair (k, k) without BAM recovery yields identical alleles
    and must fall through to the next-best outcome (ref :838-841)."""
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    x[17, B["G"], 1] += 6
    x[18, B["G"], 1] += 6
    normalize_channels(x)
    gt21 = np.full(21, 1e-6)
    gt21[GT21.InsIns] = 0.6
    gt21[GT21.AA] = 0.4
    gt21 /= gt21.sum()
    geno = np.array([0.35, 0.05, 0.60])
    vl1 = np.full(33, 1e-6); vl1[2 + OFF] = 1.0; vl1 /= vl1.sum()
    vl2 = np.full(33, 1e-6); vl2[2 + OFF] = 1.0; vl2 /= vl2.sum()
    call = decode_site(
        x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2, _cfg(is_show_reference=True)
    )
    # het InsIns (2,2) is the top outcome (0.6 * 0.6) but degenerates to
    # identical alleles; homo Ins (0.05 * 0.6) is the next-best that decodes
    assert call.category == "homo_ins"
    assert call.alternate_base == "AGG"
    assert call.genotype_string == "1/1"


def test_quality_score_golden():
    gt21 = np.full(21, 0.001); gt21[GT21.GG] = 0.9
    geno = np.array([0.05, 0.9, 0.05])
    q = quality_score_from("A", "G", "1/1", gt21, geno)
    from math import e, log
    p = 0.9 * 0.9
    tmp = max((-10 * log(e, 10)) * log(((1.0 - p) + 1e-300) / (p + 1e-300)) + 16, 0)
    assert q == int(round(tmp * tmp))


def test_insertion_bases_tensor_extraction():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    x[17, B["T"], 1] += 5
    x[18, B["C"], 1] += 5
    x[19, B["A"] + 4, 1] += 5  # reverse strand folds onto A
    normalize_channels(x)
    assert insertion_bases_using_tensor(x, 3) == "TCA"


def test_insertion_bases_all_negative_profile_defaults_to_A():
    """Reference parity: when SNP counts exceed insert counts on every base
    the 8-entry argmax lands in the zeroed reverse half -> base 'A'
    (ref call_var.py:465-477), NOT the least-negative base."""
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    # at row 17: small insert counts, larger SNP counts on every base
    x[17, :4, 1] += np.array([1, 1, 3, 1])
    x[17, :4, 3] += np.array([5, 5, 4, 5])
    normalize_channels(x)
    assert insertion_bases_using_tensor(x, 1) == "A"


def test_inferred_deletion_length_af_cutoff():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 16)
    for row in range(17, 33):
        # deletion support decays below 12.5% of ref after 18 rows... keep 4 rows strong
        x[row, 0, 2] += 8 if row < 21 else 1
    normalize_channels(x)
    # rows 17..31 are within min-length window (pos < 32) -> counted anyway;
    # the cutoff only kicks in at position 32 (support 1 < 2 = 0.125 * 16)
    assert inferred_deletion_length(x) == 15


def test_haploid_modes():
    x = _blank_counts()
    for row in range(33):
        _add_match(x, row, B[SEQ[row]], B[SEQ[row]], 10)
    _add_match(x, 16, B["A"], B["C"], 5)
    normalize_channels(x)
    gt21, geno, vl1, vl2 = _probs(GT21.AC, Genotype.hetero_variant)
    assert (
        decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2,
                    _cfg(is_haploid_precision_mode_enabled=True))
        is None
    )
    gt21, geno, vl1, vl2 = _probs(GT21.CG, Genotype.hetero_variant)
    assert (
        decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2,
                    _cfg(is_haploid_sensitive_mode_enabled=True))
        is None
    )
    # haploid rewrites genotype to a single allele
    gt21, geno, vl1, vl2 = _probs(GT21.GG, Genotype.homo_variant)
    call = decode_site(x, "chr1", 1000, SEQ, gt21, geno, vl1, vl2,
                       _cfg(is_haploid_precision_mode_enabled=True))
    assert call.genotype_string == "1"
