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
