"""Native fast-path decode must reproduce the Python batch decode exactly:
same rows (text-identical) for fast-path sites, same fallback set."""

import numpy as np
import pytest

from clair_tpu.io.vcf import VcfWriter
from clair_tpu.native import available, decode_fast_native
from clair_tpu.pipeline.batch_decode import decode_batch
from clair_tpu.pipeline.decode import OutputConfig
from tests.test_batch_decode import SEQ, _random_probs, _tensor

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


def _python_rows(x, infos, probs, config, qual_cutoff=None):
    writer = VcfWriter(None, quality_score_for_pass=qual_cutoff)
    rows = {}
    fallback_like = set()
    for i, call in decode_batch(x, infos, *probs, config):
        rows[i] = writer.format_site(infos[i][0], int(infos[i][1]), call)
    return rows


@pytest.mark.parametrize("config_kwargs,qual", [
    (dict(is_show_reference=True), None),
    (dict(is_show_reference=False), 100),
    (dict(is_show_reference=True, is_haploid_precision_mode_enabled=True), None),
    (dict(is_show_reference=True, is_haploid_sensitive_mode_enabled=True), 50),
])
def test_native_decode_matches_python(config_kwargs, qual):
    rs = np.random.RandomState(11)
    n = 200
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    # mix of regimes: half SNP-ish (length peaked at 0), half free
    for vl in (vl1, vl2):
        vl[: n // 2] *= 0.01
        vl[: n // 2, 16] = 1.0
        vl /= vl.sum(-1, keepdims=True)
    x = np.stack([_tensor()] * n)
    infos = [("chr7", str(5000 + i), SEQ) for i in range(n)]
    positions = np.array([5000 + i for i in range(n)], dtype=np.int64)
    center_bases = [SEQ[16]] * n

    config = OutputConfig(**config_kwargs, quality_score_for_pass=qual)
    python_rows = _python_rows(x, infos, (gt21, geno, vl1, vl2), config, qual)

    result = decode_fast_native(
        x, gt21, geno, vl1, vl2, positions, center_bases, "chr7",
        show_ref=config.is_show_reference,
        haploid_precision=config.is_haploid_precision_mode_enabled,
        haploid_sensitive=config.is_haploid_sensitive_mode_enabled,
        qual_cutoff=qual,
    )
    assert result is not None
    rows_text, row_sites, fallback = result
    native_rows = dict(zip(row_sites.tolist(), rows_text.splitlines()))

    fallback_set = set(fallback.tolist())
    # every python row is either produced identically by native or belongs
    # to the fallback (indel) set
    for i, row in python_rows.items():
        if i in fallback_set:
            continue
        assert i in native_rows, f"site {i} missing from native rows: {row}"
        assert native_rows[i] == row, f"site {i}:\n py: {row}\n na: {native_rows[i]}"
    # and native produced nothing python didn't
    for i in native_rows:
        assert i in python_rows, f"native extra row at {i}: {native_rows[i]}"
    # fallback sites are exactly the indel winners python also saw
    from clair_tpu.pipeline.batch_decode import category_maxima
    from clair_tpu.task.gt21 import gt21_code_from_label

    ref_code = gt21_code_from_label(SEQ[16] * 2)
    maxima = category_maxima(gt21, geno, vl1, vl2, np.full(n, ref_code))
    expected_fallback = set(np.nonzero(maxima.argmax(0) > 2)[0].tolist())
    assert fallback_set == expected_fallback


@pytest.mark.slow
def test_native_decode_speed():
    from conftest import best_of, machine_scale

    rs = np.random.RandomState(2)
    n = 5000
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    gt21[:, 10:] *= 0.01
    gt21 /= gt21.sum(-1, keepdims=True)
    for vl in (vl1, vl2):
        vl[:, :] *= 0.01
        vl[:, 16] = 1.0
        vl /= vl.sum(-1, keepdims=True)
    x = np.stack([_tensor()] * n)
    positions = np.arange(1000, 1000 + n, dtype=np.int64)
    center_bases = [SEQ[16]] * n

    decode_fast_native(x[:50], gt21[:50], geno[:50], vl1[:50], vl2[:50],
                       positions[:50], center_bases[:50], "chr1", show_ref=True)
    out = []

    def run():
        out.append(decode_fast_native(
            x, gt21, geno, vl1, vl2, positions, center_bases, "chr1",
            show_ref=True,
        ))

    sec = best_of(run)
    rows_text, row_sites, fallback = out[-1]
    assert len(row_sites) + len(fallback) > 0.9 * n
    budget = 20 * machine_scale()
    per_site = sec / n * 1e6
    assert per_site < budget, (
        f"native decode too slow: {per_site:.1f} us/site (budget {budget:.0f})"
    )


def _pipeline_rows(x, infos, probs, config, sources, native_on, monkeypatch):
    """Full production decode (_decode_batch) -> output text."""
    import io as _io

    from clair_tpu.pipeline import call_var as cv

    if not native_on:
        monkeypatch.setattr("clair_tpu.native.available", lambda: False)
    sink = _io.StringIO()
    writer = VcfWriter(sink, quality_score_for_pass=config.quality_score_for_pass)

    class _Pre:
        def gather(self, out, n):
            return out

    n = len(infos)
    cv._decode_batch((infos, x, probs, n), _Pre(), config, writer, sources, None)
    monkeypatch.undo()
    return sink.getvalue()


@pytest.mark.parametrize("config_kwargs,qual", [
    (dict(is_show_reference=True), None),
    (dict(is_show_reference=False), 60),
    (dict(is_haploid_precision_mode_enabled=True), None),
    (dict(is_haploid_sensitive_mode_enabled=True), None),
])
def test_native_indel_assembly_matches_python(config_kwargs, qual, monkeypatch):
    """The native indel assembly (clair_decode.cpp) must reproduce the
    Python batch path byte-for-byte across every indel category, including
    crafted probability ties (argmax order) and recovery fallbacks."""
    from clair_tpu.pipeline.decode import IndelSources

    rs = np.random.RandomState(23)
    n = 600
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    # bias hard toward indel categories: length mass away from zero,
    # genotype mass away from ref, indel gt21 classes boosted
    for vl in (vl1, vl2):
        vl[:, 16] *= 0.05
        vl /= vl.sum(-1, keepdims=True)
    geno[:, 0] *= 0.05
    geno /= geno.sum(-1, keepdims=True)
    gt21[:, 10:] *= 20.0
    gt21 /= gt21.sum(-1, keepdims=True)
    # exact ties in the length heads on some sites (argmax order must match)
    for i in range(0, n, 17):
        vl1[i, 17] = vl1[i, 19] = vl1[i, 21]
        vl2[i, 14] = vl2[i, 12] = vl2[i, 10]
    for i in range(0, n, 29):
        vl1[i, 20:25] = vl1[i, 20]
        vl2[i, 3:9] = vl2[i, 3]

    x = np.stack([_tensor()] * n)
    # vary insertion-channel support so ins_str picks differing bases,
    # including all-negative folded profiles (the 'A'-via-zero quirk)
    x[:, 17:25, :4, 1] += rs.randint(-8, 12, size=(n, 8, 4)).astype(np.float32)
    x[:, 17:25, 4:, 1] += rs.randint(-8, 12, size=(n, 8, 4)).astype(np.float32)

    seqs = []
    bases = "ACGT"
    for i in range(n):
        seqs.append("".join(bases[b] for b in rs.randint(0, 4, 33)))
    infos = [("chr3", str(9000 + 2 * i), seqs[i]) for i in range(n)]

    config = OutputConfig(**config_kwargs, quality_score_for_pass=qual)
    probs = (gt21, geno, vl1, vl2)
    sources = IndelSources()

    py_text = _pipeline_rows(x, infos, probs, config, sources, False, monkeypatch)
    na_text = _pipeline_rows(x, infos, probs, config, sources, True, monkeypatch)
    assert py_text  # the mix actually produces rows
    assert na_text == py_text


def test_native_indel_respects_use_bam_for_all(monkeypatch):
    """--bam_for_all_indel_bases sends every indel through the source
    callbacks; the native assembly must stand aside."""
    from clair_tpu.pipeline.decode import IndelSources

    rs = np.random.RandomState(5)
    n = 80
    gt21, geno, vl1, vl2 = _random_probs(rs, n)
    for vl in (vl1, vl2):
        vl[:, 16] *= 0.02
        vl /= vl.sum(-1, keepdims=True)
    geno[:, 0] *= 0.02
    geno /= geno.sum(-1, keepdims=True)
    gt21[:, 10:] *= 30.0
    gt21 /= gt21.sum(-1, keepdims=True)
    x = np.stack([_tensor()] * n)
    infos = [("chr3", str(7000 + i), SEQ) for i in range(n)]

    calls = []

    def fake_ins(contig, position, minimum_length, maximum_length, bases_to_ignore=""):
        calls.append(position)
        return "ACGTACGT"[:max(minimum_length, 1)]

    sources = IndelSources(insertion_bases=fake_ins, use_bam_for_all=True)
    config = OutputConfig()
    probs = (gt21, geno, vl1, vl2)
    py_text = _pipeline_rows(x, infos, probs, config, sources, False, monkeypatch)
    n_py_calls = len(calls)
    calls.clear()
    na_text = _pipeline_rows(x, infos, probs, config, sources, True, monkeypatch)
    assert na_text == py_text
    assert len(calls) == n_py_calls  # callbacks fired identically
