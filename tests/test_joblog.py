"""Per-window failure audit + resume (the in-process equivalent of the
reference's GNU parallel --joblog Exitval workflow and trailing-newline
completeness check, README.md:299-300, docs/TRAIN.md:58-59)."""

import json

import numpy as np
import pytest

import clair_tpu.pipeline.call_bam_parallel as cbp
from clair_tpu.pipeline.call_bam import CallBamConfig
from clair_tpu.pipeline.call_bam_parallel import (
    JobLog,
    call_bam_parallel,
    call_bam_windows_threaded,
    vcf_is_complete,
)
from clair_tpu.utils.simulate import (
    plant_variants,
    random_reference,
    simulate_bam,
    write_fasta,
)
from tests.test_pipeline_e2e import OraclePredictor


@pytest.fixture()
def genome(tmp_path):
    rs = np.random.RandomState(9)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=12, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    write_fasta(fasta_path, reference, contig="chr1")
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    return CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )


def test_joblog_records_and_resume_skips(genome, tmp_path):
    prefix = str(tmp_path / "out")
    paths = call_bam_parallel(
        genome, OraclePredictor, prefix,
        chunk_size=2000, include_all_contigs=True,
    )
    assert len(paths) == 3
    log = JobLog(prefix + ".joblog")
    entries = [json.loads(l) for l in open(log.path)]
    assert len(entries) == 3
    assert all(e["status"] == "ok" for e in entries)
    assert log.completed() == {("chr1", 1, 2000), ("chr1", 2001, 4000), ("chr1", 4001, 6000)}

    # resume: nothing left to do, same outputs returned, log unchanged
    calls = []
    original = cbp.call_bam

    def counting(*a, **k):
        calls.append(1)
        return original(*a, **k)

    cbp.call_bam = counting
    try:
        paths2 = call_bam_parallel(
            genome, OraclePredictor, prefix,
            chunk_size=2000, include_all_contigs=True, resume=True,
        )
    finally:
        cbp.call_bam = original
    assert not calls
    assert sorted(paths2) == sorted(paths)


def test_failed_window_is_audited_and_resumable(genome, tmp_path):
    prefix = str(tmp_path / "out")
    original = cbp.call_bam
    state = {"n": 0}

    def flaky(config, predictor, output_path=None):
        state["n"] += 1
        if config.ctg_start == 2001:
            raise RuntimeError("injected window failure")
        return original(config, predictor, output_path=output_path)

    cbp.call_bam = flaky
    try:
        paths = call_bam_parallel(
            genome, OraclePredictor, prefix,
            chunk_size=2000, include_all_contigs=True,
        )
    finally:
        cbp.call_bam = original

    assert len(paths) == 2  # the failed window is not in the outputs
    entries = [json.loads(l) for l in open(prefix + ".joblog")]
    failed = [e for e in entries if e["status"] == "failed"]
    assert len(failed) == 1
    assert failed[0]["window"] == ["chr1", 2001, 4000]
    assert "injected window failure" in failed[0]["error"]

    # one-command resume: only the failed window runs
    runs = []

    def tracking(config, predictor, output_path=None):
        runs.append((config.ctg_start, config.ctg_end))
        return original(config, predictor, output_path=output_path)

    cbp.call_bam = tracking
    try:
        paths2 = call_bam_parallel(
            genome, OraclePredictor, prefix,
            chunk_size=2000, include_all_contigs=True, resume=True,
        )
    finally:
        cbp.call_bam = original
    assert runs == [(2001, 4000)]
    assert len(paths2) == 3


def test_threaded_runner_joblog_and_resume(genome, tmp_path):
    out = str(tmp_path / "wgs.vcf")

    import clair_tpu.pipeline.call_bam as cb

    orig_prepare = cb.prepare_window

    def flaky_prepare(config):
        if config.ctg_start == 4001:
            raise RuntimeError("injected prepare failure")
        return orig_prepare(config)

    cb.prepare_window = flaky_prepare
    try:
        total = call_bam_windows_threaded(
            genome, OraclePredictor(), out,
            chunk_size=2000, include_all_contigs=True, pileup_workers=2,
        )
    finally:
        cb.prepare_window = orig_prepare

    entries = [json.loads(l) for l in open(out + ".joblog")]
    assert [e["status"] for e in entries].count("failed") == 1
    assert vcf_is_complete(out)
    rows_before = [r for r in open(out) if not r.startswith("#")]

    total2 = call_bam_windows_threaded(
        genome, OraclePredictor(), out,
        chunk_size=2000, include_all_contigs=True, pileup_workers=2,
        resume=True,
    )
    rows_after = [r for r in open(out) if not r.startswith("#")]
    # resume appended only the failed window's rows, header not duplicated
    assert len(rows_after) > len(rows_before)
    assert sum(1 for r in open(out) if r.startswith("#CHROM")) == 1
    done = JobLog(out + ".joblog").completed()
    assert done == {("chr1", 1, 2000), ("chr1", 2001, 4000), ("chr1", 4001, 6000)}


def test_vcf_is_complete(tmp_path):
    p = tmp_path / "x.vcf"
    p.write_text("")
    assert not vcf_is_complete(str(p))
    p.write_text("#header\nrow")
    assert not vcf_is_complete(str(p))
    p.write_text("#header\nrow\n")
    assert vcf_is_complete(str(p))
    assert not vcf_is_complete(str(tmp_path / "missing.vcf"))


def test_window_sharding_partitions_exactly(genome, tmp_path):
    """Multi-host sharding: shards are disjoint, cover every window, and
    each shard's run produces its own outputs + joblog independently."""
    from clair_tpu.io.fasta import FastaReader
    from clair_tpu.pipeline.call_bam_parallel import genome_windows, merge_vcfs

    fasta = FastaReader(genome.fasta_path)
    all_windows = list(genome_windows(fasta, 1500, include_all_contigs=True))
    shards = [
        list(genome_windows(fasta, 1500, include_all_contigs=True,
                            num_shards=3, shard_id=k))
        for k in range(3)
    ]
    fasta.close()
    flat = [w for shard in shards for w in shard]
    assert sorted(flat) == sorted(all_windows)
    assert len(set(flat)) == len(all_windows)
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1

    outputs = []
    for k in range(2):
        prefix = str(tmp_path / f"host{k}")
        outputs += call_bam_parallel(
            genome, OraclePredictor, prefix,
            chunk_size=3000, include_all_contigs=True,
            num_shards=2, shard_id=k,
        )
    merged = str(tmp_path / "merged.vcf")
    merge_vcfs(sorted(outputs), merged)
    rows = [r for r in open(merged) if not r.startswith("#")]
    assert len(rows) > 0

    # single-host run produces the same variant set
    solo_prefix = str(tmp_path / "solo")
    solo_outputs = call_bam_parallel(
        genome, OraclePredictor, solo_prefix,
        chunk_size=3000, include_all_contigs=True,
    )
    solo = str(tmp_path / "solo.vcf")
    merge_vcfs(sorted(solo_outputs), solo)
    solo_rows = [r for r in open(solo) if not r.startswith("#")]
    assert sorted(rows) == sorted(solo_rows)
