"""Batched decode must agree exactly with the per-site lattice decode."""

import numpy as np
import pytest

from clair_tpu.data.tensor_stream import normalize_channels
from clair_tpu.pipeline.batch_decode import category_maxima, decode_batch
from clair_tpu.pipeline.decode import (
    OutcomeLattice,
    OutputConfig,
    decode_site,
)
from clair_tpu.utils.genomics import BASE2ACGT
from clair_tpu.task.gt21 import gt21_code_from_label

SEQ = "ACGTACGTACGTACGTAGGTACGTACGTACGTA"
B = {"A": 0, "C": 1, "G": 2, "T": 3}


def _tensor():
    x = np.zeros((33, 8, 4), np.float32)
    for row in range(33):
        b = B[SEQ[row]]
        for ch in range(4):
            x[row, b, ch] = 10
    x[16, B["G"], 1] += 5
    x[16, B["G"], 3] += 5
    x[16, B["A"], 0] += 5
    x[16, B["A"], 2] += 5
    x[17, B["T"], 1] += 4   # some insertion evidence
    x[18, B["C"], 2] += 4   # some deletion evidence
    return normalize_channels(x)


def _random_probs(rs, n):
    def softmax(v):
        e = np.exp(v - v.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    return (
        softmax(rs.randn(n, 21) * 2).astype(np.float32),
        softmax(rs.randn(n, 3) * 2).astype(np.float32),
        softmax(rs.randn(n, 33) * 2).astype(np.float32),
        softmax(rs.randn(n, 33) * 2).astype(np.float32),
    )


def test_category_maxima_match_lattice():
    rs = np.random.RandomState(0)
    n = 50
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    ref_code = gt21_code_from_label("AA")
    maxima = category_maxima(gt21, geno, vl1, vl2, np.full(n, ref_code))
    for i in range(n):
        lattice = OutcomeLattice(gt21[i], geno[i], vl1[i], vl2[i], "A")
        expected = [lattice.homo_ref] + [
            getattr(lattice, name).max() for name in OutcomeLattice.CATEGORY_ORDER
        ]
        np.testing.assert_allclose(maxima[:, i], expected, rtol=1e-12, err_msg=f"site {i}")


@pytest.mark.parametrize("config", [
    OutputConfig(is_show_reference=True),
    OutputConfig(is_show_reference=False),
    OutputConfig(is_show_reference=True, is_haploid_precision_mode_enabled=True),
    OutputConfig(is_show_reference=True, is_haploid_sensitive_mode_enabled=True),
])
def test_batch_decode_equals_per_site(config):
    rs = np.random.RandomState(1)
    n = 120
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    x = np.stack([_tensor()] * n)
    infos = [("chr1", str(1000 + i), SEQ) for i in range(n)]

    batch_results = dict(decode_batch(x, infos, gt21, geno, vl1, vl2, config))

    for i in range(n):
        expected = decode_site(
            x[i], "chr1", 1000 + i, SEQ, gt21[i], geno[i], vl1[i], vl2[i], config
        )
        got = batch_results.get(i)
        if expected is None:
            assert got is None, f"site {i}: expected no call, got {got}"
            continue
        assert got is not None, f"site {i}: missing call (expected {expected})"
        assert got.reference_base == expected.reference_base, i
        assert got.alternate_base == expected.alternate_base, i
        assert got.genotype_string == expected.genotype_string, i
        assert got.quality_score == expected.quality_score, i
        assert got.read_depth == expected.read_depth, i
        assert got.allele_frequency == pytest.approx(expected.allele_frequency), i
        assert got.is_reference == expected.is_reference, i


@pytest.mark.slow
def test_batch_decode_speed():
    from conftest import best_of, machine_scale

    rs = np.random.RandomState(2)
    n = 1000
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    # SNP-dominated probabilities with length peaked at 0
    # (the realistic fast-path regime)
    gt21[:, 10:] *= 0.01
    gt21 /= gt21.sum(-1, keepdims=True)
    for vl in (vl1, vl2):
        vl[:, :] *= 0.01
        vl[:, 16] = 1.0
        vl /= vl.sum(-1, keepdims=True)
    x = np.stack([_tensor()] * n)
    infos = [("chr1", str(1000 + i), SEQ) for i in range(n)]
    config = OutputConfig(is_show_reference=True)

    decode_batch(x[:10], infos[:10], gt21[:10], geno[:10], vl1[:10], vl2[:10], config)
    sec = best_of(lambda: decode_batch(x, infos, gt21, geno, vl1, vl2, config))
    budget = 150 * machine_scale()
    per_site = sec / n * 1e6
    assert per_site < budget, (
        f"batched decode too slow: {per_site:.0f} us/site (budget {budget:.0f})"
    )


def test_batch_indel_decode_matches_per_site_chain():
    """batch_decode_indels must reproduce the per-site
    decode_indel_fast -> assemble_site_call -> decode_site chain EXACTLY,
    across random probability mixes hitting every indel category, with an
    IndelSources carrying callbacks (exercises the het_insins 'another'
    lookup and long-indel source paths)."""
    import numpy as np

    from clair_tpu.pipeline.batch_decode import (
        _CATEGORY_NAMES,
        batch_decode_indels,
        category_maxima,
    )
    from clair_tpu.pipeline.decode import (
        IndelSources,
        OutputConfig,
        assemble_site_call,
        decode_indel_fast,
        decode_site,
    )
    from clair_tpu.task.gt21 import gt21_code_from_label

    rs = np.random.RandomState(5)
    n = 400
    seq = "".join(rs.choice(list("ACGT"), 33))
    x = rs.randint(0, 30, size=(n, 33, 8, 4)).astype(np.float32)
    x[:, 16, :, 0] += 5  # nonzero depth everywhere

    def softmax_rows(a):
        e = np.exp(a - a.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    gt21_p = softmax_rows(rs.randn(n, 21) * 3)
    geno_p = softmax_rows(rs.randn(n, 3) * 3)
    vl1_p = softmax_rows(rs.randn(n, 33) * 3)
    vl2_p = softmax_rows(rs.randn(n, 33) * 3)

    ref_codes = np.full(n, gt21_code_from_label(seq[16] * 2))
    winners = category_maxima(gt21_p, geno_p, vl1_p, vl2_p, ref_codes).argmax(0)
    fallback = np.nonzero(winners > 2)[0]
    assert len(set(winners[fallback])) >= 5  # many categories exercised

    def fake_ins(contig, position, minimum_length, maximum_length, ignore=""):
        bases = "ACGTACGTACGTACGTACGTACGT"[: max(minimum_length, 3)]
        return bases if bases != ignore else ""

    def fake_del(contig, position, minimum_length, maximum_length):
        return "TGCA" * 5

    for sources, oc in (
        (IndelSources(), OutputConfig()),
        (IndelSources(insertion_bases=fake_ins, deletion_bases=fake_del),
         OutputConfig()),
        (IndelSources(insertion_bases=fake_ins, deletion_bases=fake_del,
                      use_bam_for_all=True), OutputConfig()),
        (IndelSources(), OutputConfig(is_haploid_precision_mode_enabled=True)),
        (IndelSources(), OutputConfig(is_haploid_sensitive_mode_enabled=True)),
    ):
        names = [_CATEGORY_NAMES[w] for w in winners[fallback]]
        positions = 1000 + fallback.astype(np.int64)
        got = dict(batch_decode_indels(
            x[fallback], [seq] * len(fallback), "chr1", positions,
            gt21_p[fallback], geno_p[fallback], vl1_p[fallback], vl2_p[fallback],
            names, oc, sources,
        ))
        for k, i in enumerate(fallback.tolist()):
            fast = decode_indel_fast(
                names[k], x[i], seq, "chr1", int(positions[k]),
                gt21_p[i], geno_p[i], vl1_p[i], vl2_p[i], sources,
            )
            if fast is not None:
                expected = assemble_site_call(
                    fast[0], fast[1], fast[2], x[i], gt21_p[i], geno_p[i], oc
                )
            else:
                expected = decode_site(
                    x[i], "chr1", int(positions[k]), seq,
                    gt21_p[i], geno_p[i], vl1_p[i], vl2_p[i], oc, sources,
                )
            assert got.get(k) == expected, (k, names[k], got.get(k), expected)
