"""Raw-uint8 uplink: windows ship raw counts and the device normalizes.

Guards for the r05 link optimization: the default calling path stores
WindowWork.tensors as raw uint8 counts (dcov <= 255), ships the bytes
as-is (half the int16 link cost), and performs channel normalization
(ref clair/utils.py:96-98) inside the jitted forward. These tests pin
(a) the device-normalized forward bit-identical to the host-normalized
one, and (b) decode decisions identical between the raw path and the
forced float32 host-normalized path.
"""

import numpy as np
import pytest

from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam, prepare_window
from clair_tpu.utils.simulate import (
    plant_variants,
    random_reference,
    simulate_bam,
    write_fasta,
)
from tests.test_pipeline_e2e import OraclePredictor


def _flowcell(tmp_path, seed=11, length=6000, coverage=25):
    rs = np.random.RandomState(seed)
    reference = random_reference(rs, length)
    variants = plant_variants(rs, reference, n_variants=20, spacing=200)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    write_fasta(fasta_path, reference, contig="chr1")
    simulate_bam(bam_path, reference, variants, rs, coverage=coverage)
    return bam_path, fasta_path


def test_prepare_window_ships_raw_uint8(tmp_path):
    """Default dcov (250) stores raw uint8 counts; dcov > 255 falls back
    to normalized float32; the two agree after normalization."""
    from clair_tpu.data.tensor_stream import normalized_f32

    bam, fasta = _flowcell(tmp_path)
    raw_cfg = CallBamConfig(
        bam_path=bam, fasta_path=fasta, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )
    f32_cfg = CallBamConfig(
        bam_path=bam, fasta_path=fasta, contig="chr1",
        minimum_af=0.2, minimum_coverage=4, dcov=256,
    )
    raw = prepare_window(raw_cfg)
    f32 = prepare_window(f32_cfg)
    assert raw.tensors.dtype == np.uint8
    assert f32.tensors.dtype == np.float32
    assert len(raw.tensors) > 0
    # coverage 25 << either cap, so the counts are cap-independent and the
    # raw path must reproduce the normalized tensors exactly
    assert np.array_equal(raw.centers, f32.centers)
    assert np.array_equal(normalized_f32(raw.tensors), f32.tensors)
    assert raw.sequences == f32.sequences


def test_raw_and_f32_paths_call_identical_vcf(tmp_path):
    """End-to-end guard: the raw-uint8 uplink path produces byte-identical
    VCF rows to the host-normalized float32 path."""
    import io

    bam, fasta = _flowcell(tmp_path)
    outputs = []
    for dcov in (250, 256):
        out = io.StringIO()
        config = CallBamConfig(
            bam_path=bam, fasta_path=fasta, contig="chr1",
            minimum_af=0.2, minimum_coverage=4, dcov=dcov,
        )
        total = call_bam(config, OraclePredictor(), output_fh=out)
        assert total > 0
        outputs.append(out.getvalue())
    assert outputs[0] == outputs[1]


def test_device_normalization_bit_identical():
    """The jitted forward on a raw uint8 batch matches the forward on the
    host-normalized float batch bit-for-bit (counts are small integers;
    f32 arithmetic on them is exact)."""
    jax = pytest.importorskip("jax")
    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_var import Predictor

    params, _ = load_checkpoint("examples/ont_synthetic.ckpt")
    predictor = Predictor(params=params, config=ModelConfig(), batch_size=16)
    rs = np.random.RandomState(0)
    raw = rs.randint(0, 250, size=(16, 33, 8, 4)).astype(np.uint8)
    norm = raw.astype(np.float32)
    norm[..., 1:] -= norm[..., :1]

    out_raw, n1 = predictor.predict_async(raw)
    out_norm, n2 = predictor.predict_async(norm)
    assert n1 == n2 == 16
    assert np.array_equal(np.asarray(out_raw), np.asarray(out_norm))


def test_pack_uplink_dtypes():
    """Raw uint8 ships as-is (with uint8 padding); normalized floats ship
    int16-clipped; short batches pad to the fixed shape."""
    from clair_tpu.pipeline.call_var import _pack_uplink

    raw = np.arange(2 * 33 * 8 * 4, dtype=np.uint8).reshape(2, 33, 8, 4)
    packed = _pack_uplink(raw, 4)
    assert packed.dtype == np.uint8 and packed.shape[0] == 4
    assert np.array_equal(packed[:2], raw) and not packed[2:].any()

    norm = np.full((2, 33, 8, 4), -40000.0, dtype=np.float32)
    packed = _pack_uplink(norm, 2)
    assert packed.dtype == np.int16
    assert packed.min() == -32767  # clipped, not wrapped


def test_raw_finalize_refuses_overbyte_counts():
    """dcov caps reads per START position (ref CreateTensor.py:267-274),
    not pileup column depth, so counts can exceed a byte on >255x data
    even at dcov=250. The u8 finalize must ABORT on such a cell (never
    silently saturate — that changed model inputs and therefore calls)
    and the wrapper must return the exact float32 finalize instead."""
    from clair_tpu.native import (
        finalize_windows_native,
        finalize_windows_raw_native,
    )

    rs = np.random.RandomState(3)
    n = 6
    tensor_ints = rs.randint(0, 200, size=(n, 33, 8, 4)).astype(np.int32)
    tensor_ints[2, 10, 3, 1] = 300  # one >byte pileup cell
    centers = (np.arange(n, dtype=np.int64) * 40 + 40)
    ref = bytes(rs.choice(np.frombuffer(b"ACGT", np.uint8), 400).tobytes())

    res_raw = finalize_windows_raw_native(tensor_ints, centers, ref, 0)
    if res_raw is None:
        pytest.skip("native library unavailable")
    res_f32 = finalize_windows_native(tensor_ints, centers, ref, 0)
    t_raw, c_raw, s_raw = res_raw
    t_f32, c_f32, s_f32 = res_f32
    assert t_raw.dtype == np.float32  # fell back to exact, not clamped
    assert np.array_equal(t_raw, t_f32)
    assert np.array_equal(c_raw, c_f32)
    assert s_raw == s_f32

    # without the over-byte cell the raw path still engages
    tensor_ints[2, 10, 3, 1] = 255
    t_ok, _, _ = finalize_windows_raw_native(tensor_ints, centers, ref, 0)
    assert t_ok.dtype == np.uint8


def test_highcov_window_ships_exact_f32(tmp_path):
    """Flowcell-level guard for the same hazard: a >255x pileup at the
    default dcov=250 must ship channel-normalized float32 (the exact
    representation), matching the pure-Python engine cell for cell."""
    import clair_tpu.native as nat
    from clair_tpu.data.tensor_stream import PackedSequences

    bam, fasta = _flowcell(tmp_path, seed=7, length=1500, coverage=420)
    cfg = CallBamConfig(
        bam_path=bam, fasta_path=fasta, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )
    work = prepare_window(cfg)
    assert len(work.tensors) > 0
    # the regime precondition: channel-0 counts genuinely exceed a byte
    assert float(work.tensors[..., 0].max()) > 255
    assert work.tensors.dtype == np.float32

    # pure-Python engine oracle (native library disabled)
    lib, failed = nat._lib, nat._build_failed
    nat._lib, nat._build_failed = None, True
    try:
        oracle = prepare_window(cfg)
    finally:
        nat._lib, nat._build_failed = lib, failed
    assert oracle.tensors.dtype == np.float32
    assert np.array_equal(work.centers, oracle.centers)
    assert np.array_equal(work.tensors, oracle.tensors)
    want = oracle.sequences
    got = work.sequences
    if isinstance(got, PackedSequences) != isinstance(want, PackedSequences):
        got, want = list(got), list(want)
    assert got == want


def test_mixed_depth_windows_one_run(tmp_path):
    """A genome whose first half is >255x and second half 25x: windows
    independently pick their ship dtype (f32 fallback vs raw uint8) and
    one threaded run handles both, matching the sequential runner."""
    from clair_tpu.io.bam import BamWriter
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded
    from clair_tpu.utils.simulate import (
        _read_from_haplotype,
        haplotype_sequences,
    )

    rs = np.random.RandomState(5)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=20, spacing=250)
    hap0, hap1 = haplotype_sequences(reference, variants)
    half = len(reference) // 2
    reads, i = [], 0
    for lo, hi, cov in ((0, half, 420), (half, len(reference), 25)):
        for _ in range(cov * (hi - lo) // 150):
            start0 = int(rs.randint(lo, hi - 150))
            cigar, seq = _read_from_haplotype(
                reference, hap1 if i % 2 else hap0, start0, 150)
            reads.append((f"sim{i}", start0, 16 if rs.rand() < 0.5 else 0,
                          cigar, seq))
            i += 1
    bam = str(tmp_path / "mixed.bam")
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, reference, contig="chr1")
    with BamWriter(bam, [("chr1", len(reference))]) as w:
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            w.write(name, 0, pos, 60, flag, cigar, seq)

    base = dict(bam_path=bam, fasta_path=fasta, contig="chr1",
                minimum_af=0.2, minimum_coverage=4)
    deep = prepare_window(CallBamConfig(ctg_start=1, ctg_end=half, **base))
    shallow = prepare_window(
        CallBamConfig(ctg_start=half + 1, ctg_end=len(reference), **base))
    assert deep.tensors.dtype == np.float32      # >255x: exact fallback
    # the regime precondition: pileup depth genuinely exceeds a byte
    # (individual cells split across the 8 strand/type rows, so the
    # over-byte cell that triggered the refusal may be any channel)
    assert float(deep.tensors[:, 16, :, 0].sum(axis=-1).max()) > 255
    assert shallow.tensors.dtype == np.uint8     # raw fast path

    import io as _io

    seq_out = _io.StringIO()
    total = call_bam(CallBamConfig(**base), OraclePredictor(),
                     output_fh=seq_out)
    assert total > 0
    thr_out = str(tmp_path / "thr.vcf")
    call_bam_windows_threaded(
        CallBamConfig(**base), OraclePredictor(), thr_out,
        chunk_size=half, include_all_contigs=True, pileup_workers=2,
    )
    seq_rows = [r for r in seq_out.getvalue().splitlines()
                if not r.startswith("#")]
    thr_rows = [r.rstrip("\n") for r in open(thr_out)
                if not r.startswith("#")]
    assert thr_rows == seq_rows and len(thr_rows) > 0
