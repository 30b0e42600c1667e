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


def test_transient_fetch_failure_recovers_via_per_batch_retry(tmp_path):
    """One grouped fetch can carry batches from many windows; a TRANSIENT
    link error must not fail them all — the runner retries per batch and
    the whole run completes with zero failed windows, byte-identical to a
    clean run."""
    import json

    config = _simulated_flowcell(tmp_path)

    clean = str(tmp_path / "clean.vcf")
    call_bam_windows_threaded(
        config, OraclePredictor(), clean,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )

    class FailOnceGather(OraclePredictor):
        def __init__(self):
            self.gathers = 0

        def gather(self, out, n):
            self.gathers += 1
            if self.gathers == 2:
                raise RuntimeError("injected transient gather failure")
            return super().gather(out, n)

    out = str(tmp_path / "retried.vcf")
    call_bam_windows_threaded(
        config, FailOnceGather(), out,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )
    entries = [json.loads(l) for l in open(out + ".joblog")]
    assert len(entries) == 4
    assert [e["status"] for e in entries].count("failed") == 0
    assert ([r for r in open(out) if not r.startswith("#")]
            == [r for r in open(clean) if not r.startswith("#")])


def test_persistent_fetch_failure_poisons_only_its_window(tmp_path):
    """A batch whose fetch fails on the retry too marks ONLY its own
    window failed; other windows in the same grouped fetch still land."""
    import json

    config = _simulated_flowcell(tmp_path)

    class FailOneBatchGather(OraclePredictor):
        def __init__(self):
            self.dispatches = 0
            self.poisoned = None

        def predict_async(self, x):
            out, n = super().predict_async(x)
            self.dispatches += 1
            if self.dispatches == 2:
                self.poisoned = out
            return out, n

        def gather(self, out, n):
            if out is self.poisoned:
                raise RuntimeError("injected persistent gather failure")
            return super().gather(out, n)

    out = str(tmp_path / "partial.vcf")
    call_bam_windows_threaded(
        config, FailOneBatchGather(), out,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )
    entries = [json.loads(l) for l in open(out + ".joblog")]
    assert len(entries) == 4
    statuses = [e["status"] for e in entries]
    assert statuses.count("failed") == 1
    assert "injected persistent gather failure" in next(
        e for e in entries if e["status"] == "failed"
    )["error"]
    body = [r for r in open(out) if not r.startswith("#")]
    assert body and body[-1].endswith("\n")


def test_failed_gvcf_window_writes_nothing(tmp_path):
    """gVCF mode: a window that fails mid-decode must contribute ZERO
    output rows — flushing its partial rows would fill the undecoded
    remainder with hom-ref blocks (false calls) and a --resume re-run
    would then cover the window twice."""
    config = _simulated_flowcell(tmp_path)
    import dataclasses as _dc
    config = _dc.replace(config, gvcf=True)

    clean = str(tmp_path / "clean.gvcf")
    call_bam_windows_threaded(
        config, OraclePredictor(), clean,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )

    class FailOneBatchGather(OraclePredictor):
        def __init__(self):
            self.dispatches = 0
            self.poisoned = None

        def predict_async(self, x):
            out, n = super().predict_async(x)
            self.dispatches += 1
            if self.dispatches == 2:
                self.poisoned = out
            return out, n

        def gather(self, out, n):
            if out is self.poisoned:
                raise RuntimeError("injected persistent gather failure")
            return super().gather(out, n)

    out = str(tmp_path / "partial.gvcf")
    call_bam_windows_threaded(
        config, FailOneBatchGather(), out,
        chunk_size=1500, include_all_contigs=True, pileup_workers=2,
        inflight_depth=8,
    )

    import json
    entries = [json.loads(l) for l in open(out + ".joblog")]
    failed = [e for e in entries if e["status"] == "failed"]
    assert len(failed) == 1
    _, lo, hi = failed[0]["window"]

    def body(path):
        return [r for r in open(path) if not r.startswith("#")]

    # no row of the failed window appears; every other window's rows match
    # the clean run exactly
    in_window = [r for r in body(out) if lo <= int(r.split("\t")[1]) <= hi]
    assert in_window == []
    expected = [r for r in body(clean)
                if not (lo <= int(r.split("\t")[1]) <= hi)]
    assert body(out) == expected
