"""Process-pool WGS runner (call_bam_parallel max_workers>1): each spawn
worker owns a predictor and a disjoint set of windows. This is the
in-process equivalent of the reference's GNU-parallel share-nothing model
(callVarBamParallel.py:98-119) — the partition must be airtight: every
window called exactly once, no site lost, no site duplicated, and the
merged VCF identical to a single-worker run."""

import json

import numpy as np
import pytest

from clair_tpu.pipeline.call_bam import CallBamConfig
from clair_tpu.pipeline.call_bam_parallel import call_bam_parallel, merge_vcfs


@pytest.fixture(scope="module")
def pool_genome(tmp_path_factory):
    import jax

    from clair_tpu.io.bai import build_bai
    from clair_tpu.models.checkpoint import save_checkpoint
    from clair_tpu.models.clair import init_params
    from clair_tpu.params import ModelConfig
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    tmp = tmp_path_factory.mktemp("pool")
    rs = np.random.RandomState(29)
    ref = random_reference(rs, 8_000)
    variants = plant_variants(rs, ref, n_variants=20, spacing=300)
    bam = str(tmp / "s.bam")
    fa = str(tmp / "ref.fa")
    simulate_bam(bam, ref, variants, rs, coverage=25)
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")

    # a real checkpoint: pool workers load it and build real Predictors
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    ckpt = str(tmp / "model.ckpt")
    save_checkpoint(ckpt, jax.tree.map(np.asarray, params))
    base = CallBamConfig(
        bam_path=bam, fasta_path=fa, minimum_af=0.2, minimum_coverage=4,
    )
    return base, ckpt, tmp


@pytest.mark.slow
def test_process_pool_partitions_windows_without_overlap_or_loss(
    pool_genome, tmp_path
):
    base, ckpt, _ = pool_genome

    pool_prefix = str(tmp_path / "pool")
    paths = call_bam_parallel(
        base, None, pool_prefix,
        chunk_size=2_000, include_all_contigs=True,
        max_workers=2, checkpoint_path=ckpt,
    )
    # 8 kb / 2 kb windows, one output per window, all ok in the joblog
    assert len(paths) == 4
    entries = [json.loads(l) for l in open(pool_prefix + ".joblog")]
    assert len(entries) == 4
    assert all(e["status"] == "ok" for e in entries)
    windows = [tuple(e["window"]) for e in entries]
    assert len(set(windows)) == 4                      # exactly once each

    # no overlap, no loss: per-window row positions are disjoint and their
    # union equals the single-worker run's rows byte-for-byte
    per_window_rows = []
    for p in paths:
        per_window_rows.append(
            [r for r in open(p) if not r.startswith("#")]
        )
    all_positions = [
        int(r.split("\t")[1]) for rows in per_window_rows for r in rows
    ]
    assert len(all_positions) == len(set(all_positions))

    merged = str(tmp_path / "pool_merged.vcf")
    merge_vcfs(paths, merged)

    solo_prefix = str(tmp_path / "solo")
    solo_paths = call_bam_parallel(
        base, None, solo_prefix,
        chunk_size=2_000, include_all_contigs=True,
        max_workers=2, checkpoint_path=ckpt,
    )
    # second pool run (fresh workers) must reproduce the set; then compare
    # a 1-worker in-process run decoding with the same checkpoint
    solo_merged = str(tmp_path / "solo_merged.vcf")
    merge_vcfs(solo_paths, solo_merged)
    pool_rows = [r for r in open(merged) if not r.startswith("#")]
    solo_rows = [r for r in open(solo_merged) if not r.startswith("#")]
    assert pool_rows == solo_rows
    assert len(pool_rows) == len(all_positions) > 0

    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.params import PREDICT_COMPUTE_DTYPE, ModelConfig
    from clair_tpu.pipeline.call_var import Predictor

    # same compute dtype as the pool workers build with (the calling
    # default) — this test checks the window partition, not dtype parity
    params, _ = load_checkpoint(ckpt)
    one_prefix = str(tmp_path / "one")
    one_paths = call_bam_parallel(
        base,
        lambda: Predictor(
            params, ModelConfig(compute_dtype=PREDICT_COMPUTE_DTYPE)
        ),
        one_prefix,
        chunk_size=2_000, include_all_contigs=True,
    )
    one_merged = str(tmp_path / "one_merged.vcf")
    merge_vcfs(one_paths, one_merged)
    one_rows = [r for r in open(one_merged) if not r.startswith("#")]
    assert pool_rows == one_rows
