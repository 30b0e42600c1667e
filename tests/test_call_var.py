"""End-to-end call_var tests: tensor text stream -> batched inference ->
VCF rows, with both a deterministic fake predictor and the real jitted model."""

import io

import jax
import numpy as np

from clair_tpu.data.tensor_stream import (
    normalize_channels,
    parse_tensor_line,
    tensor_batches_from,
    tensor_line_from,
)
from clair_tpu.io.vcf import VcfWriter
from clair_tpu.models.clair import init_params
from clair_tpu.params import ModelConfig
from clair_tpu.pipeline.call_var import Predictor, call_variants
from clair_tpu.pipeline.decode import OutputConfig
from clair_tpu.task.genotype import Genotype
from clair_tpu.task.gt21 import GT21

SEQ = "ACGTACGTACGTACGTAGGTACGTACGTACGTA"
B = {"A": 0, "C": 1, "G": 2, "T": 3}


def _counts_tensor(alt_base=None, alt_reads=0, depth=10):
    x = np.zeros((33, 8, 4), dtype=np.float32)
    for row in range(33):
        b = B[SEQ[row]]
        x[row, b, 0] += depth
        x[row, b, 1] += depth
        x[row, b, 2] += depth
        x[row, b, 3] += depth
    if alt_base is not None:
        x[16, B[alt_base], 1] += alt_reads
        x[16, B[alt_base], 3] += alt_reads
        x[16, B[SEQ[16]], 0] += alt_reads
        x[16, B[SEQ[16]], 2] += alt_reads
    return x


def test_tensor_stream_roundtrip():
    x = _counts_tensor("G", 5)
    line = tensor_line_from("chr20", 12345, SEQ, x)
    info, parsed = parse_tensor_line(line)
    assert info == ("chr20", "12345", SEQ)
    np.testing.assert_array_equal(parsed, x)

    lines = [tensor_line_from("chr20", 1000 + i, SEQ, x) for i in range(5)]
    batches = list(tensor_batches_from(iter(lines), batch_size=2))
    assert [len(b[1]) for b in batches] == [2, 2, 1]
    expected = normalize_channels(x.copy())
    np.testing.assert_array_equal(batches[0][0][0], expected)


class FakePredictor:
    """Deterministic predictor: every site is a confident hom G SNP."""

    batch_size = 4

    def predict_async(self, x):
        n = x.shape[0]
        gt21 = np.full((n, 21), 1e-4, np.float32)
        gt21[:, GT21.GG] = 1.0
        geno = np.full((n, 3), 1e-3, np.float32)
        geno[:, Genotype.homo_variant] = 1.0
        vl = np.full((n, 33), 1e-5, np.float32)
        vl[:, 16] = 1.0
        return (gt21, geno, vl, vl), n

    def gather(self, out, n):
        return [a[:n] for a in out]


def test_call_variants_with_fake_predictor_writes_vcf():
    x = _counts_tensor("G", 9)
    lines = [tensor_line_from("chr20", 1000 + i, SEQ, x) for i in range(6)]
    out = io.StringIO()
    writer = VcfWriter(out, sample_name="HG002", quality_score_for_pass=100)
    writer.write_header()
    total = call_variants(
        iter(lines), FakePredictor(), OutputConfig(), writer, batch_size=4
    )
    assert total == 6
    text = out.getvalue()
    rows = [r for r in text.splitlines() if not r.startswith("#")]
    assert len(rows) == 6
    cols = rows[0].split("\t")
    assert cols[0] == "chr20" and cols[3] == "A" and cols[4] == "G"
    assert cols[8] == "GT:GQ:DP:AF"
    gt, gq, dp, af = cols[9].split(":")
    assert gt == "1/1" and dp == "19"
    assert "##contig" not in text  # no contigs passed
    assert "#CHROM\tPOS" in text


def test_call_variants_real_model_runs():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    predictor = Predictor(params, config, batch_size=8)
    x = _counts_tensor("G", 5)
    lines = [tensor_line_from("chr1", 500 + i, SEQ, x) for i in range(10)]
    out = io.StringIO()
    writer = VcfWriter(out)
    total = call_variants(
        iter(lines), predictor, OutputConfig(is_show_reference=True), writer
    )
    assert total == 10
    rows = [r for r in out.getvalue().splitlines() if r and not r.startswith("#")]
    assert len(rows) == 10  # show_reference emits every site


def test_lazy_center_bases_vectorized_matches_per_site():
    """LazyTensorInfos.center_bases uses one C-loop bytes encode + strided
    pick (the genexpr+join it replaced was ~60% of the ONT decode loop);
    it must byte-match the per-site definition and fall back for
    non-ascii sequences."""
    import numpy as np

    from clair_tpu.data.tensor_stream import LazyTensorInfos

    rs = np.random.RandomState(3)
    seqs = ["".join(rs.choice(list("ACGTN"), 33)) for _ in range(257)]
    infos = LazyTensorInfos("chr1", np.arange(257, dtype=np.int64), seqs)
    expected = np.array([s[16] for s in seqs], dtype="S1")
    assert np.array_equal(infos.center_bases, expected)
    assert infos.center_bases.dtype == np.dtype("S1")

    weird = LazyTensorInfos(
        "chr1", np.arange(2, dtype=np.int64),
        ["A" * 16 + "é" + "A" * 16, "C" * 33],
    )
    assert np.array_equal(weird.center_bases,
                          np.array([b"?", b"C"], dtype="S1"))
