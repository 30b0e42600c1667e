"""Threaded WGS runner: windows overlap pileup and inference in one
process, output is genome-ordered and matches the sequential runner."""

import numpy as np

from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded
from clair_tpu.utils.simulate import (
    plant_variants,
    random_reference,
    simulate_bam,
    write_fasta,
)
from tests.test_pipeline_e2e import OraclePredictor


def test_threaded_runner_matches_sequential(tmp_path):
    rs = np.random.RandomState(3)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=20, spacing=200)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    write_fasta(fasta_path, reference, contig="chr1")
    simulate_bam(bam_path, reference, variants, rs, coverage=25)

    config = CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )

    seq_out = str(tmp_path / "seq.vcf")
    call_bam(config, OraclePredictor(), output_path=seq_out)

    thr_out = str(tmp_path / "thr.vcf")
    total = call_bam_windows_threaded(
        config, OraclePredictor(), thr_out,
        chunk_size=2000, include_all_contigs=True, pileup_workers=3,
    )
    assert total > 0

    def rows(path):
        return [r for r in open(path) if not r.startswith("#")]

    seq_rows = rows(seq_out)
    thr_rows = rows(thr_out)
    # windowed calling can differ at chunk boundaries only; here variants
    # are well inside windows so the calls must match exactly
    assert thr_rows == seq_rows
    positions = [int(r.split("\t")[1]) for r in thr_rows]
    assert positions == sorted(positions)


def _simulated_flowcell(tmp_path, seed=3, length=6000, n_variants=20):
    rs = np.random.RandomState(seed)
    reference = random_reference(rs, length)
    variants = plant_variants(rs, reference, n_variants=n_variants, spacing=200)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    write_fasta(fasta_path, reference, contig="chr1")
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    return CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )


def test_deep_inflight_matches_shallow_and_records_stats(tmp_path):
    """Cross-window pipelining: a queue deeper than any window's batch
    count must produce byte-identical output to synchronous draining, and
    the stats object must account for every dispatched batch."""
    from clair_tpu.pipeline.call_bam_parallel import PipelineStats

    config = _simulated_flowcell(tmp_path)

    shallow = str(tmp_path / "shallow.vcf")
    call_bam_windows_threaded(
        config, OraclePredictor(), shallow,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=0,
    )

    stats = PipelineStats()
    deep = str(tmp_path / "deep.vcf")
    total = call_bam_windows_threaded(
        config, OraclePredictor(), deep,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=64, stats=stats,
    )
    assert open(deep).read() == open(shallow).read()

    # every window prepared, every batch timed through all three legs
    assert stats.summary()["windows"] == 4  # 6000 bp / 1500
    assert len(stats.wait_s) == len(stats.decode_s) == len(stats.dispatch_s)
    assert stats.summary()["batches"] > 0
    assert sum(len(b) for b in [stats.wait_s]) > 0 and total > 0
    s = stats.summary()
    assert s["device_wait_ms_p99"] >= s["device_wait_ms_p50"] >= 0.0
    # byte accounting: every dispatched batch ships the padded int16 block,
    # every fetch returns stacked (k, B, 90) f32 probabilities
    assert len(stats.dispatch_bytes) == s["batches"]
    assert s["uplink_mb"] > 0 and s["downlink_mb"] > 0
    # each batch ships batch_size x (33*8*4) int16 rows regardless of fill
    assert all(b == stats.dispatch_bytes[0] and b % (33 * 8 * 4 * 2) == 0
               for b in stats.dispatch_bytes)


def test_pipelined_runner_survives_dispatch_failure(tmp_path):
    """A batch whose device dispatch fails poisons ONLY its window; the
    other windows still land in the output and the joblog audits all."""
    import json

    config = _simulated_flowcell(tmp_path)

    class FailOneDispatch(OraclePredictor):
        def __init__(self):
            self.dispatches = 0

        def predict_async(self, x):
            self.dispatches += 1
            if self.dispatches == 2:
                raise RuntimeError("injected dispatch failure")
            return super().predict_async(x)

    out = str(tmp_path / "partial.vcf")
    call_bam_windows_threaded(
        config, FailOneDispatch(), out,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )
    entries = [json.loads(l) for l in open(out + ".joblog")]
    assert len(entries) == 4
    statuses = [e["status"] for e in entries]
    assert statuses.count("failed") == 1
    assert "injected dispatch failure" in next(
        e for e in entries if e["status"] == "failed"
    )["error"]
    body = [r for r in open(out) if not r.startswith("#")]
    assert body and body[-1].endswith("\n")


def test_pipelined_runner_survives_fetch_failure(tmp_path):
    """A failed grouped fetch poisons the windows in that group (the
    transfer is all-or-nothing) but the run continues, every window is
    audited, and the output stays complete."""
    import json

    config = _simulated_flowcell(tmp_path)

    class FailOnceGather(OraclePredictor):
        def __init__(self):
            self.gathers = 0

        def gather(self, out, n):
            self.gathers += 1
            if self.gathers == 2:
                raise RuntimeError("injected gather failure")
            return super().gather(out, n)

    out = str(tmp_path / "partial.vcf")
    call_bam_windows_threaded(
        config, FailOnceGather(), out,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )
    entries = [json.loads(l) for l in open(out + ".joblog")]
    assert len(entries) == 4
    statuses = [e["status"] for e in entries]
    assert statuses.count("failed") >= 1
    assert any(
        "injected gather failure" in e.get("error", "") for e in entries
    )
    assert open(out).read().endswith("\n")
