"""SimulatedDevicePredictor: the co-located overlap measurement rig.

Guards (1) the serial-queue timing model, (2) that the simulated device
changes TIMING ONLY — the threaded WGS runner emits byte-identical VCFs
under a fast and a slow device model — and (3) the overlap law the bench
stage substantiates: wall >= modelled device leg when the device is the
bottleneck (wall ~= max(host leg, device leg))."""

import time

import numpy as np
import pytest

from clair_tpu.models.checkpoint import load_checkpoint
from clair_tpu.params import ModelConfig
from clair_tpu.pipeline.call_bam import CallBamConfig
from clair_tpu.pipeline.call_bam_parallel import (
    PipelineStats,
    call_bam_windows_threaded,
)
from clair_tpu.pipeline.device_sim import SimulatedDevicePredictor


def _rows(n=64):
    rs = np.random.RandomState(3)
    rows = np.zeros((n, 90), np.float32)
    for off, width in ((0, 21), (21, 3), (24, 33), (57, 33)):
        block = rs.rand(n, width).astype(np.float32) + 0.01
        rows[:, off:off + width] = block / block.sum(1, keepdims=True)
    return rows


def test_serial_queue_model():
    sim = SimulatedDevicePredictor(_rows(), compute_ms=20.0, batch_size=64,
                                   bytes_per_s=1e12)
    x = np.zeros((64, 33, 8, 4), np.uint8)
    (r1, _), n1 = sim.predict_async(x)
    (r2, _), n2 = sim.predict_async(x)
    assert n1 == n2 == 64
    # second batch queues behind the first: ready times 20 ms apart
    assert r2 - r1 == pytest.approx(0.020, abs=1e-4)
    assert sim.device_busy_s == pytest.approx(0.040, rel=0.01)
    t0 = time.perf_counter()
    probs = sim.gather((r1, 64), 10)
    waited = time.perf_counter() - t0
    assert len(probs) == 4 and probs[0].shape == (10, 21)
    # gather blocked until the batch's ready time (dispatched just above,
    # so ~20 ms remained)
    assert waited >= 0.010


def test_gather_group_blocks_until_last():
    sim = SimulatedDevicePredictor(_rows(), compute_ms=15.0, batch_size=64,
                                   bytes_per_s=1e12)
    x = np.zeros((64, 33, 8, 4), np.uint8)
    outs = [sim.predict_async(x)[0] for _ in range(3)]
    t0 = time.perf_counter()
    results = sim.gather_group(outs, [64, 64, 64])
    waited = time.perf_counter() - t0
    assert len(results) == 3
    assert waited >= 0.030  # 3 serialized 15 ms batches


@pytest.fixture(scope="module")
def flowcell(tmp_path_factory):
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import simulate_ont_fast, write_fasta

    tmp = tmp_path_factory.mktemp("coloc")
    bam = str(tmp / "s.bam")
    fasta = str(tmp / "ref.fa")
    rs = np.random.RandomState(424242)
    reference, _ = simulate_ont_fast(
        bam, rs, length=30_000, coverage=30, variant_spacing=500
    )
    write_fasta(fasta, reference)
    build_bai(bam, bam + ".bai")
    return bam, fasta


def _run(flowcell, tmp_path, name, compute_ms, rows):
    bam, fasta = flowcell
    sim = SimulatedDevicePredictor(rows, compute_ms, batch_size=128)
    base = CallBamConfig(bam_path=bam, fasta_path=fasta,
                         minimum_af=0.2, minimum_coverage=4)
    out = str(tmp_path / f"{name}.vcf")
    stats = PipelineStats()
    t0 = time.perf_counter()
    call_bam_windows_threaded(
        base, sim, out, chunk_size=10_000, include_all_contigs=True,
        pileup_workers=2, stats=stats,
    )
    return out, time.perf_counter() - t0, sim


def test_pipeline_timing_only_and_overlap_law(flowcell, tmp_path):
    # realistic rows: one real (CPU) forward of the vendored checkpoint,
    # exactly like the bench stage
    import jax

    from clair_tpu.models.clair import forward

    params, _ = load_checkpoint("examples/ont_synthetic.ckpt")
    x = np.random.RandomState(0).rand(128, 33, 8, 4).astype(np.float32) * 20
    rows = np.concatenate(
        [np.asarray(a) for a in
         jax.jit(lambda p, t: forward(p, t, ModelConfig()))(params, x)],
        axis=-1,
    )

    fast_vcf, _, fast_sim = _run(flowcell, tmp_path, "fast", 0.3, rows)
    slow_vcf, slow_wall, slow_sim = _run(flowcell, tmp_path, "slow", 40.0, rows)

    # the device model changes timing only: identical calls byte for byte
    assert open(fast_vcf, "rb").read() == open(slow_vcf, "rb").read()
    assert fast_sim.batches == slow_sim.batches >= 2

    # device-bound regime: wall tracks the modelled device leg
    assert slow_sim.device_busy_s >= 0.08
    assert slow_wall >= slow_sim.device_busy_s * 0.9
