"""Run the reference's PRODUCTION training recipe on the chip.

The vendored checkpoints (examples/*_synthetic.ckpt) were trained at
batch 256 with a fixed LR — a demo-scale recipe. The reference's actual
recipe is batch 10,000 with the adaptive-decay schedule (initial LR 1e-3
decayed x0.1 on val-loss oscillation/increase, 3 switches, best-val
restore; /root/reference/shared/param.py:15 + clair/train.py:18-62).
This script runs THAT recipe end to end on the TPU over a large
ONT-profile simulated flowcell (the fast vectorized simulator), through
the production data pipeline, and reports held-out calling metrics for
docs/ACCURACY.md.

    python examples/train_production.py [--genome_kb 600] [--coverage 50]

Dataset scale note: ~0.6 Mb at variant spacing 100 yields ~6k truth
variants + ~2x sampled non-variants -> a few batches per epoch at batch
10k. The reference's epochs span millions of samples; the recipe (batch
size, schedule, loss, clipping) is what is being exercised here, at the
largest dataset this harness builds in reasonable time.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_ont_dataset(work_dir, seed, genome_kb, coverage, variant_spacing,
                      platform="ont"):
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
    from clair_tpu.utils.simulate import (
        platform_fast_kwargs,
        simulate_platform_fast,
        write_fasta,
        write_truth_vcf,
    )

    length = genome_kb * 1000
    rs = np.random.RandomState(seed)
    paths = {n: os.path.join(work_dir, n) for n in (
        "ref.fa", "sample.bam", "truth.vcf", "truth.var",
        "var_tensors.txt", "can_tensors.txt", "paired.txt",
    )}
    reference, variants = simulate_platform_fast(
        paths["sample.bam"], rs, length=length,
        variant_spacing=variant_spacing,
        **platform_fast_kwargs(platform, coverage),
    )
    write_fasta(paths["ref.fa"], reference)
    write_truth_vcf(paths["truth.vcf"], variants)
    with open(paths["truth.var"], "w") as fh:
        write_truth(paths["truth.vcf"], "chr1", fh)

    candidate_events, tensor_events = load_region_events(
        paths["sample.bam"], "chr1", 0, length, minimum_mapq=0, dcov=250,
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
        candidate_events, reference, 0, length, 0, config
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
        paths["paired.txt"], paths["truth.var"], shuffle=True, block_size=500
    ), variants


def evaluate_held_out_ont(params, model_config, seed=515151, genome_kb=60,
                          coverage=None, platform="ont"):
    """Call a fresh flowcell the model never saw."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.utils.simulate import (
        platform_fast_kwargs, simulate_platform_fast, write_fasta,
    )

    tmp = tempfile.mkdtemp(prefix="clair_tpu_prod_heldout_")
    rs = np.random.RandomState(seed)
    bam_path = os.path.join(tmp, "s.bam")
    fasta_path = os.path.join(tmp, "ref.fa")
    reference, variants = simulate_platform_fast(
        bam_path, rs, length=genome_kb * 1000,
        variant_spacing=400, **platform_fast_kwargs(platform, coverage),
    )
    write_fasta(fasta_path, reference)
    build_bai(bam_path, bam_path + ".bai")
    out = os.path.join(tmp, "calls.vcf")
    call_bam(
        CallBamConfig(bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
                      minimum_af=0.2, minimum_coverage=4),
        Predictor(params, model_config, batch_size=512),
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
    parser.add_argument("--platform", choices=("ont", "ccs", "ilmn"),
                        default="ont")
    parser.add_argument("--genome_kb", type=int, default=600)
    parser.add_argument("--coverage", type=int, default=0,
                        help="override the platform recipe's coverage")
    parser.add_argument("--variant_spacing", type=int, default=100)
    parser.add_argument("--seed", type=int, default=21)
    parser.add_argument("--hard_max_epochs", type=int, default=200)
    parser.add_argument("--output", default=None)
    parser.add_argument("--train_compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="default: the TrainingConfig default (bfloat16; "
                             "both dtypes have a production-recipe held-out "
                             "row in docs/ACCURACY.md)")
    parser.add_argument("--dataset_bin", default=None,
                        help="cache the built dataset at this path (loaded "
                             "if it exists — the 2 Mb dataset takes ~20 min "
                             "to simulate, so pre-build it host-side once)")
    args = parser.parse_args()

    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.train import TrainingConfig, train_model
    from clair_tpu.utils.jaxcache import enable

    enable()
    work_dir = tempfile.mkdtemp(prefix="clair_tpu_prod_train_")
    t0 = time.perf_counter()
    if args.dataset_bin and os.path.isfile(args.dataset_bin):
        from clair_tpu.data.bins import load_bin

        dataset = load_bin(args.dataset_bin)
        print(f"[prod] dataset {dataset.dataset_size} examples loaded from "
              f"{args.dataset_bin} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr)
    else:
        dataset, variants = build_ont_dataset(
            work_dir, args.seed, args.genome_kb, args.coverage,
            args.variant_spacing, platform=args.platform,
        )
        if args.dataset_bin:
            from clair_tpu.data.bins import write_bin

            write_bin(args.dataset_bin, dataset)
        print(f"[prod] dataset {dataset.dataset_size} examples "
              f"({len(variants)} truth variants) in "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

    model_config = ModelConfig()
    t0 = time.perf_counter()
    # THE production recipe: batch 10000, adaptive decay, best-val restore
    result = train_model(
        dataset,
        TrainingConfig(
            model=model_config,
            output_prefix=os.path.join(work_dir, "model"),
            schedule="adaptive",
            hard_max_epochs=args.hard_max_epochs,
            checkpoint_every=10,
            evaluate_at_end=True,
            seed=args.seed,
            **({"train_compute_dtype": args.train_compute_dtype}
               if args.train_compute_dtype else {}),
        ),
    )
    train_secs = time.perf_counter() - t0
    print(f"[prod] trained {len(result.training_losses)} epochs in "
          f"{train_secs:.0f}s (best epoch {result.best_epoch})",
          file=sys.stderr)

    from clair_tpu.models.checkpoint import save_checkpoint

    output = args.output or os.path.join(
        work_dir, f"{args.platform}_production.ckpt"
    )
    save_checkpoint(output, result.params, extra={
        "recipe": "production-adaptive-b10000",
        "epochs": len(result.training_losses),
        "best_epoch": result.best_epoch,
    })
    print(f"[prod] wrote {output}", file=sys.stderr)

    recall, precision, exact, n = evaluate_held_out_ont(
        result.params, model_config, platform=args.platform
    )
    print(f"[held-out] recall {recall:.3f} precision {precision:.3f} "
          f"exact {exact}/{n} "
          f"(epochs {len(result.training_losses)}, best {result.best_epoch}, "
          f"{train_secs:.0f}s train)")


if __name__ == "__main__":
    main()
