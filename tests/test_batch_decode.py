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


def test_batch_decode_speed():
    import time

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
    start = time.perf_counter()
    decode_batch(x, infos, gt21, geno, vl1, vl2, config)
    per_site = (time.perf_counter() - start) / n * 1e6
    assert per_site < 150, f"batched decode too slow: {per_site:.0f} us/site"
