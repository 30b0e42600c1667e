"""Reproduce the vendored full-size synthetic checkpoints.

The reference publishes one trained model per platform (ONT / PacBio CCS /
Illumina, /root/reference/README.md:207-229). This environment has no
real flowcell data, so the framework vendors the equivalent: the full-size
2BiLSTM (the reference's "2BiLSTM" structure, model.py:400) trained ON THE
TPU over a simulated genome with the platform's error profile, through the
production data pipeline (simulate -> truth extraction -> candidate
sampling -> tensor creation -> pairing -> binning -> train_model).

    python examples/train_synthetic.py --profile ont|ccs|ilmn

writes examples/<profile>_synthetic.ckpt and prints held-out calling
metrics on a genome the model never saw (fresh seed). Recipes per
docs/ACCURACY.md: 150 kb genome, ~660 planted variants, 400 epochs at
train batch 256, fixed 1e-3, final-epoch parameters (the tiny val split
is too noisy for best-epoch selection at this scale).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clair_tpu.utils.simulate import PLATFORM_RECIPES as PROFILES  # noqa: E402


def build_dataset(work_dir, seed, genome_length, n_variants, profile_name,
                  coverage, read_length, read_length_sigma, spacing=200):
    from clair_tpu.data.bins import build_bin_from_tensors
    from clair_tpu.data.candidates import (
        CandidateConfig,
        candidate_sites_from_events,
    )
    from clair_tpu.data.pairing import pair_with_non_variants
    from clair_tpu.data.pileup import create_tensors
    from clair_tpu.data.tensor_stream import tensor_line_from
    from clair_tpu.data.truth import write_truth
    from clair_tpu.pipeline.call_bam import load_region_events
    from clair_tpu.utils import simulate
    from clair_tpu.utils.simulate import (
        plant_variants,
        random_reference,
        simulate_bam,
        write_fasta,
        write_truth_vcf,
    )

    rs = np.random.RandomState(seed)
    paths = {n: os.path.join(work_dir, n) for n in (
        "ref.fa", "sample.bam", "truth.vcf", "truth.var",
        "var_tensors.txt", "can_tensors.txt", "paired.txt",
    )}
    reference = random_reference(rs, genome_length)
    variants = plant_variants(rs, reference, n_variants=n_variants, spacing=spacing)
    write_fasta(paths["ref.fa"], reference)
    simulate_bam(
        paths["sample.bam"], reference, variants, rs, coverage=coverage,
        error_profile=getattr(simulate, profile_name),
        read_length=read_length, read_length_sigma=read_length_sigma,
    )
    write_truth_vcf(paths["truth.vcf"], variants)
    with open(paths["truth.var"], "w") as fh:
        write_truth(paths["truth.vcf"], "chr1", fh)

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
        gen4training=True, output_probability=0.03,
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
    pair_with_non_variants(
        paths["can_tensors.txt"], paths["var_tensors.txt"], paths["paired.txt"],
        amplification=2.0, seed=seed,
    )
    return build_bin_from_tensors(
        paths["paired.txt"], paths["truth.var"], shuffle=True, block_size=200
    ), variants


def evaluate_held_out(params, model_config, profile_kwargs, seed=424243,
                      genome_length=30_000, n_variants=120):
    """Call a genome the model never saw; return (recall, precision, exact)."""
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.utils import simulate
    from clair_tpu.utils.simulate import (
        plant_variants,
        random_reference,
        simulate_bam,
        write_fasta,
    )

    tmp = tempfile.mkdtemp(prefix="clair_tpu_heldout_")
    rs = np.random.RandomState(seed)
    reference = random_reference(rs, genome_length)
    variants = plant_variants(rs, reference, n_variants=n_variants, spacing=200)
    fasta_path = os.path.join(tmp, "ref.fa")
    bam_path = os.path.join(tmp, "s.bam")
    write_fasta(fasta_path, reference)
    simulate_bam(
        bam_path, reference, variants, rs,
        coverage=profile_kwargs["coverage"],
        error_profile=getattr(simulate, profile_kwargs["profile_name"]),
        read_length=profile_kwargs["read_length"],
        read_length_sigma=profile_kwargs["read_length_sigma"],
    )
    out = os.path.join(tmp, "calls.vcf")
    call_bam(
        CallBamConfig(bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
                      minimum_af=0.2, minimum_coverage=4),
        Predictor(params, model_config, batch_size=256),
        output_path=out,
    )
    truth = {v.position: (v.ref, v.alt) for v in variants}
    called = {}
    for row in open(out):
        if not row.startswith("#"):
            c = row.split("\t")
            called[int(c[1])] = (c[3], c[4])
    tp = len(set(truth) & set(called))
    exact = sum(1 for p in truth if p in called and called[p] == truth[p])
    return tp / len(truth), tp / max(len(called), 1), exact, len(truth)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile", choices=sorted(PROFILES), required=True)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--genome_length", type=int, default=150_000)
    parser.add_argument("--n_variants", type=int, default=700)
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument("--output", default=None)
    parser.add_argument("--train_compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="default: the TrainingConfig default (bfloat16 "
                             "compute, f32 master/loss/cell state). The "
                             "vendored examples/*_synthetic.ckpt were "
                             "trained with float32")
    args = parser.parse_args()

    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.train import TrainingConfig, train_model

    profile = PROFILES[args.profile]
    work_dir = tempfile.mkdtemp(prefix=f"clair_tpu_train_{args.profile}_")
    dataset, variants = build_dataset(
        work_dir, args.seed, args.genome_length, args.n_variants, **profile
    )
    print(f"[train] {dataset.dataset_size} examples "
          f"({len(variants)} truth variants)", file=sys.stderr)

    model_config = ModelConfig()  # full-size 2BiLSTM
    result = train_model(
        dataset,
        TrainingConfig(
            model=model_config,
            output_prefix=os.path.join(work_dir, "model"),
            learning_rate=1e-3, train_batch_size=256, val_batch_size=32,
            schedule="fixed", max_epochs=args.epochs, checkpoint_every=100,
            evaluate_at_end=False, seed=args.seed, restore_best=False,
            **({"train_compute_dtype": args.train_compute_dtype}
               if args.train_compute_dtype else {}),
        ),
    )

    from clair_tpu.models.checkpoint import save_checkpoint

    output = args.output or os.path.join(
        REPO, "examples", f"{args.profile}_synthetic.ckpt"
    )
    save_checkpoint(output, result.params, extra={"epoch": args.epochs})
    print(f"[train] wrote {output}", file=sys.stderr)

    recall, precision, exact, n = evaluate_held_out(
        result.params, model_config, profile
    )
    print(f"[held-out] recall {recall:.3f} precision {precision:.3f} "
          f"exact {exact}/{n}")


if __name__ == "__main__":
    main()
