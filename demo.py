"""Self-contained end-to-end demo: the framework's equivalent of the
reference's downloadable demo script (SURVEY §4 "quick demo as smoke test"),
with no external data needed.

Simulates a diploid genome with planted SNPs/indels, builds training data
through the real pipeline (truth extraction -> candidate sampling -> tensor
creation -> pairing -> binning), trains the model, calls variants on the
BAM, and scores calls against the planted truth.

    python demo.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np


def run_demo(
    genome_length=40_000,
    n_variants=200,
    coverage=30,
    error_rate=0.002,
    lstm_units=32,
    epochs=400,
    work_dir=None,
    seed=7,
    verbose=True,
    error_profile=None,
    read_length=150,
    read_length_sigma=0.0,
    spacing=150,
):
    import jax

    if jax.default_backend() == "cpu":
        pass  # fine
    from clair_tpu.data.bins import build_bin_from_tensors
    from clair_tpu.data.candidates import (
        CandidateConfig,
        candidate_sites_from_events,
    )
    from clair_tpu.data.pairing import pair_with_non_variants
    from clair_tpu.data.pileup import create_tensors
    from clair_tpu.data.tensor_stream import tensor_line_from
    from clair_tpu.data.truth import write_truth
    from clair_tpu.io.fasta import FastaReader
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam, load_region_events
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.pipeline.train import TrainingConfig, train_model
    from clair_tpu.utils.simulate import (
        plant_variants,
        random_reference,
        simulate_bam,
        write_fasta,
        write_truth_vcf,
    )

    rs = np.random.RandomState(seed)
    work_dir = work_dir or tempfile.mkdtemp(prefix="clair_tpu_demo_")
    os.makedirs(work_dir, exist_ok=True)
    paths = {name: os.path.join(work_dir, name) for name in (
        "ref.fa", "sample.bam", "truth.vcf", "truth.var", "var_tensors.txt",
        "can_tensors.txt", "paired.txt", "train.bin", "calls.vcf",
    )}

    def log(*args):
        if verbose:
            print("[demo]", *args, file=sys.stderr)

    # 1. simulate
    reference = random_reference(rs, genome_length)
    variants = plant_variants(rs, reference, n_variants=n_variants, spacing=spacing)
    write_fasta(paths["ref.fa"], reference)
    n_reads = simulate_bam(
        paths["sample.bam"], reference, variants, rs,
        coverage=coverage, error_rate=error_rate,
        error_profile=error_profile,
        read_length=read_length, read_length_sigma=read_length_sigma,
    )
    write_truth_vcf(paths["truth.vcf"], variants)
    log(f"simulated {len(variants)} variants, {n_reads} reads at ~{coverage}x")

    # 2. truth extraction (GetTruth equivalent)
    with open(paths["truth.var"], "w") as fh:
        write_truth(paths["truth.vcf"], "chr1", fh)

    # 3. tensors at truth sites + sampled non-variant sites
    candidate_events, tensor_events = load_region_events(
        paths["sample.bam"], "chr1", 0, genome_length, minimum_mapq=0, dcov=250,
    )
    truth_centers = np.array(sorted(v.position for v in variants), dtype=np.int64)
    xt, kept_t, seq_t = create_tensors(
        tensor_events, truth_centers, reference, 0, minimum_coverage=4
    )
    with open(paths["var_tensors.txt"], "w") as fh:
        for i in range(len(kept_t)):
            print(tensor_line_from("chr1", int(kept_t[i]), seq_t[i], xt[i]), file=fh)

    config = CandidateConfig(
        gen4training=True, output_probability=0.05,
        minimum_coverage=4, contig="chr1", seed=seed,
    )
    sites = candidate_sites_from_events(
        candidate_events, reference, 0, genome_length, 0, config
    )
    xc, kept_c, seq_c = create_tensors(
        tensor_events, sites.positions + 1, reference, 0, minimum_coverage=4
    )
    with open(paths["can_tensors.txt"], "w") as fh:
        for i in range(len(kept_c)):
            print(tensor_line_from("chr1", int(kept_c[i]), seq_c[i], xc[i]), file=fh)
    log(f"{len(kept_t)} truth tensors, {len(kept_c)} candidate tensors")

    # 4. pair truth with ~2x non-variants, bin
    pair_with_non_variants(
        paths["can_tensors.txt"], paths["var_tensors.txt"], paths["paired.txt"],
        amplification=2.0, seed=seed,
    )
    dataset = build_bin_from_tensors(
        paths["paired.txt"], paths["truth.var"], shuffle=True, block_size=100
    )
    log(f"training bin: {dataset.dataset_size} examples")

    # 5. train (cyclical LR)
    model_config = ModelConfig(
        lstm1_num_units=lstm_units, lstm2_num_units=lstm_units,
        l3_num_units=8, l4_num_units=64, l5_num_units=32,
    )
    result = train_model(
        dataset,
        TrainingConfig(
            model=model_config,
            output_prefix=os.path.join(work_dir, "model"),
            learning_rate=1e-3,
            train_batch_size=256, val_batch_size=32,
            schedule="fixed", max_epochs=epochs, checkpoint_every=50,
            evaluate_at_end=False, seed=seed,
            # the demo's val split is ~50 examples — too noisy to pick a
            # best epoch by val loss; keep the final parameters
            restore_best=False,
        ),
    )
    log(f"trained; best epoch {result.best_epoch}")

    # 6. call variants on the BAM
    predictor = Predictor(result.params, model_config, batch_size=256)
    call_bam(
        CallBamConfig(
            bam_path=paths["sample.bam"], fasta_path=paths["ref.fa"],
            contig="chr1", minimum_af=0.2, minimum_coverage=4,
        ),
        predictor,
        output_path=paths["calls.vcf"],
    )

    # 7. score against planted truth (position+genotype-class level),
    #    SNP and indel tallied separately (the reference's benchmark
    #    tables report them separately, benchmark-modelWith2HD.png)
    truth_by_pos = {v.position: v for v in variants}
    called = {}
    with open(paths["calls.vcf"]) as fh:
        for row in fh:
            if row.startswith("#"):
                continue
            columns = row.split("\t")
            called[int(columns[1])] = (columns[3], columns[4], columns[9].split(":")[0])

    def is_snp_alleles(ref, alt):
        return len(ref) == 1 and all(len(a) == 1 for a in alt.split(","))

    def score(kind):
        if kind == "snp":
            truth = {p for p, v in truth_by_pos.items() if is_snp_alleles(v.ref, v.alt)}
            calls = {p for p, (r, a, _) in called.items() if is_snp_alleles(r, a)}
        else:
            truth = {p for p, v in truth_by_pos.items() if not is_snp_alleles(v.ref, v.alt)}
            calls = {p for p, (r, a, _) in called.items() if not is_snp_alleles(r, a)}
        tp = len(truth & set(called))   # site found at all (any representation)
        fp = len(calls - set(truth_by_pos))
        fn = len(truth - set(called))
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        return {"tp": tp, "fp": fp, "fn": fn,
                "precision": precision, "recall": recall, "f1": f1}

    snp, indel = score("snp"), score("indel")
    tp = sum(1 for p in truth_by_pos if p in called)
    fn = len(truth_by_pos) - tp
    fp = len(called) - tp
    exact = sum(
        1 for p, v in truth_by_pos.items()
        if p in called and called[p][0] == v.ref and called[p][1].split(",")[-1] == v.alt
    )
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    log(
        f"calls: {len(called)}; site recall {recall:.3f}, precision {precision:.3f}, "
        f"exact allele matches {exact}/{len(truth_by_pos)}"
    )
    log(
        f"SNP   P {snp['precision']:.3f} R {snp['recall']:.3f} F1 {snp['f1']:.3f} | "
        f"Indel P {indel['precision']:.3f} R {indel['recall']:.3f} F1 {indel['f1']:.3f}"
    )
    return {
        "work_dir": work_dir,
        "n_truth": len(truth_by_pos),
        "n_called": len(called),
        "recall": recall,
        "precision": precision,
        "exact": exact,
        "snp": snp,
        "indel": indel,
    }


def main():
    parser = argparse.ArgumentParser(description="clair_tpu end-to-end demo")
    parser.add_argument("--quick", action="store_true", help="smaller/faster settings")
    parser.add_argument(
        "--profile", choices=("clean", "ont", "ccs", "ilmn"), default="clean",
        help="read error model: 'ont' = R9.4.1-like noise (homopolymer-"
             "biased indels, 5%% mismatch, lognormal read lengths); "
             "'ccs' = PacBio HiFi (~0.5%% indel-leaning); 'ilmn' = "
             "Illumina short reads (0.2%% mismatch)",
    )
    parser.add_argument("--work_dir", default=None)
    args = parser.parse_args()

    kwargs = {}
    if args.profile == "ont":
        from clair_tpu.utils.simulate import ONT_R94

        kwargs = dict(
            error_profile=ONT_R94, coverage=60,
            read_length=1000, read_length_sigma=0.4,
        )
    elif args.profile == "ccs":
        from clair_tpu.utils.simulate import PACBIO_CCS

        kwargs = dict(
            error_profile=PACBIO_CCS, coverage=30,
            read_length=2000, read_length_sigma=0.2,
        )
    elif args.profile == "ilmn":
        from clair_tpu.utils.simulate import ILLUMINA

        kwargs = dict(error_profile=ILLUMINA, coverage=60, read_length=150)
    if args.quick:
        stats = run_demo(genome_length=30_000, n_variants=150, epochs=400,
                         coverage=kwargs.pop("coverage", 60),
                         work_dir=args.work_dir, **kwargs)
    else:
        stats = run_demo(genome_length=60_000, n_variants=300, epochs=600,
                         coverage=kwargs.pop("coverage", 60),
                         work_dir=args.work_dir, **kwargs)
    print(stats)
    floor = 0.8 if args.profile == "ont" else 0.95
    if stats["recall"] < floor:
        sys.exit(f"demo recall below {floor} — something is off")


if __name__ == "__main__":
    main()
