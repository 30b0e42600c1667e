"""Coverage for the smaller components: genome windows, VCF merge, tensor
transform, pairing, FASTA reader, sharded inference on the virtual mesh."""

import io

import numpy as np

from clair_tpu.data.pairing import pair_with_non_variants
from clair_tpu.data.transform import shrink_tensor, transform_stream
from clair_tpu.io.fasta import FastaReader, build_fai
from clair_tpu.pipeline.call_bam_parallel import genome_windows, merge_vcfs
from clair_tpu.utils.intervals import BedIntervals


def _write_fasta(tmp_path, contigs):
    path = tmp_path / "ref.fa"
    with open(path, "w") as fh:
        for name, seq in contigs:
            fh.write(f">{name}\n")
            for off in range(0, len(seq), 9):  # short odd line width
                fh.write(seq[off:off + 9] + "\n")
    build_fai(str(path))
    return str(path)


def test_fasta_reader_fetch(tmp_path):
    seq1 = "ACGTACGTACGTACGTACGTACG"
    seq2 = "TTTTGGGGCCCCAAAA"
    path = _write_fasta(tmp_path, [("chr1", seq1), ("chr2", seq2)])
    with FastaReader(path) as fasta:
        assert fasta.contigs == [("chr1", len(seq1)), ("chr2", len(seq2))]
        assert fasta.fetch("chr1", 0, 4) == "ACGT"
        assert fasta.fetch("chr1", 7, 13) == seq1[7:13]   # crosses a line break
        assert fasta.fetch("chr2", 10) == seq2[10:]
        assert fasta.fetch("chr2", -5, 3) == seq2[:3]     # clamped
        assert fasta.fetch("chr1", 20, 100) == seq1[20:]  # clamped right


def test_genome_windows_whitelist_and_bed(tmp_path):
    path = _write_fasta(
        tmp_path,
        [("chr1", "A" * 25), ("chrUn_scaffold", "A" * 30), ("2", "C" * 12)],
    )
    fasta = FastaReader(path)
    windows = list(genome_windows(fasta, chunk_size=10))
    assert ("chr1", 1, 10) in windows and ("chr1", 21, 25) in windows
    assert ("2", 1, 10) in windows
    assert all(w[0] != "chrUn_scaffold" for w in windows)

    all_windows = list(genome_windows(fasta, chunk_size=10, include_all_contigs=True))
    assert any(w[0] == "chrUn_scaffold" for w in all_windows)

    bed = BedIntervals.from_intervals([("chr1", 0, 5)])
    filtered = list(genome_windows(fasta, chunk_size=10, bed=bed))
    assert filtered == [("chr1", 1, 10)]


def test_merge_vcfs(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    a.write_text("##header\n#CHROM\nchr1\t1\trow\n")
    b.write_text("##header\n#CHROM\nchr1\t2\trow\n")
    out = tmp_path / "m.vcf"
    merge_vcfs([str(a), str(b)], str(out))
    lines = out.read_text().splitlines()
    assert lines.count("##header") == 1
    assert lines[-2:] == ["chr1\t1\trow", "chr1\t2\trow"]


def test_shrink_tensor_and_stream():
    t65 = np.arange(65 * 8 * 4, dtype=np.float32).reshape(65, 8, 4)
    t33 = shrink_tensor(t65)
    np.testing.assert_array_equal(t33, t65[16:49])

    folded = shrink_tensor(t65, collapse_strand=True)
    np.testing.assert_array_equal(folded[:, :4], t65[16:49, :4] + t65[16:49, 4:])
    assert (folded[:, 4:] == 0).all()

    seq65 = "A" * 65
    line = "chr1 500 %s %s" % (seq65, " ".join(map(str, range(65 * 32))))
    out = io.StringIO()
    n = transform_stream(io.StringIO(line + "\n"), out)
    assert n == 1
    columns = out.getvalue().split()
    assert len(columns) == 3 + 33 * 32
    assert len(columns[2]) == 33


def test_pair_with_non_variants(tmp_path):
    var = tmp_path / "var.txt"
    can = tmp_path / "can.txt"
    var.write_text("".join(f"chr1 {100 + i} x\n" for i in range(10)))
    # candidate tensors overlap 3 truth positions (deduped) + 50 others
    rows = [f"chr1 {100 + i} y\n" for i in range(3)]
    rows += [f"chr1 {500 + i} y\n" for i in range(50)]
    can.write_text("".join(rows))
    out = tmp_path / "out.txt"
    n_truth, n_non = pair_with_non_variants(
        str(can), str(var), str(out), amplification=2.0, seed=0
    )
    assert n_truth == 10
    assert 8 <= n_non <= 32  # ~20 expected, sampling is random
    emitted = out.read_text().splitlines()
    assert len(emitted) == n_truth + n_non


def test_sharded_predictor_on_virtual_mesh():
    import jax

    from clair_tpu.models.clair import forward, init_params
    from clair_tpu.params import ModelConfig
    from clair_tpu.parallel.mesh import make_mesh
    from clair_tpu.pipeline.call_var import Predictor, ShardedPredictor

    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    mesh = make_mesh(8, model_parallel=1)
    sharded = ShardedPredictor(params, config, batch_size=16, mesh=mesh)
    plain = Predictor(params, config, batch_size=16)

    x = np.random.RandomState(0).rand(11, 33, 8, 4).astype(np.float32)
    out_s, n_s = sharded.predict_async(x)
    out_p, n_p = plain.predict_async(x)
    assert n_s == n_p == 11
    for a, b in zip(sharded.gather(out_s, 11), plain.gather(out_p, 11)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_call_variants_with_sharded_predictor():
    """Slice inference: the full call_variants pipeline over the 8-device
    virtual mesh produces the same VCF as the single-device predictor."""
    import io as _io

    import jax

    from clair_tpu.data.tensor_stream import tensor_line_from
    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.models.clair import init_params
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_var import Predictor, ShardedPredictor, call_variants
    from clair_tpu.pipeline.decode import OutputConfig
    from tests.test_call_var import SEQ, _counts_tensor

    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    x = _counts_tensor("G", 6)
    lines = [tensor_line_from("chr9", 100 + i, SEQ, x) for i in range(20)]

    def run(predictor):
        sink = _io.StringIO()
        writer = VcfWriter(sink)
        call_variants(iter(lines), predictor, OutputConfig(is_show_reference=True), writer)
        return [r for r in sink.getvalue().splitlines() if not r.startswith("#")]

    from clair_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_parallel=1)
    plain_rows = run(Predictor(params, config, batch_size=8))
    sharded_rows = run(ShardedPredictor(params, config, batch_size=8, mesh=mesh))
    assert len(plain_rows) == 20
    assert sharded_rows == plain_rows


def test_main_export_thread_cap(monkeypatch):
    """The clair-tpu entry point must export OMP_NUM_THREADS from
    --threads BEFORE heavy imports (numpy/XLA read it at import time)."""
    import sys as _sys

    from clair_tpu.__main__ import _export_thread_cap

    for argv, expect in (
        (["prog", "call_var", "--threads", "3"], "3"),
        (["prog", "call_var", "--threads=5"], "5"),
        (["prog", "call_var"], None),
        (["prog", "call_var", "--threads", "bogus"], None),
    ):
        monkeypatch.setattr(_sys, "argv", argv)
        monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
        _export_thread_cap()
        import os as _os
        assert _os.environ.get("OMP_NUM_THREADS") == expect, argv
