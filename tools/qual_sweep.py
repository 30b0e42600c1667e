"""QUAL calibration sweep: precision/recall vs quality threshold per platform.

Mirrors the reference's published operating-point methodology — it derives
a "best quality cutoff" per platform from precision/recall sweeps against
truth (ONT 748 / PacBio CCS 143 / Illumina 113, reference README.md:383-401)
— on this framework's held-out flowcells: simulate a genome the vendored
checkpoint never saw, call it through the production pipeline, and score
calls above each QUAL threshold against the planted truth. The quality
itself is the reference formula (pipeline/decode.py port of
call_var.py:568-586).

Platforms (reference treats all three as first class, README.md:374-401):

- ont:  examples/ont_production.ckpt on the production held-out flowcell
        (systematic error hotspots — the configuration whose unfiltered
        precision sits at ~0.90, docs/ACCURACY.md production-recipe rows)
- ccs:  examples/ccs_synthetic.ckpt, PacBio CCS fast profile
- ilmn: examples/ilmn_synthetic.ckpt, Illumina fast profile

Usage: python tools/qual_sweep.py [--platform ont|ccs|ilmn|all]
                                  [--genome-kb N] [--markdown]

Prints one JSON line per platform; --markdown adds the docs/ACCURACY.md
table block.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# fresh seeds per platform, disjoint from every training seed
# (examples/train_production.py seed 424242 data / 515151 heldout;
# examples/train_synthetic.py seeds)
HELDOUT_SEEDS = {"ont": 515151, "ccs": 626262, "ilmn": 636363}
CHECKPOINTS = {
    "ont": "examples/ont_production.ckpt",
    "ccs": "examples/ccs_synthetic.ckpt",
    "ilmn": "examples/ilmn_synthetic.ckpt",
}


def call_heldout(platform: str, genome_kb: int = 60, batch_size: int = 512):
    """Simulate a held-out flowcell, call it, return (truth, calls):
    truth maps position -> (REF, ALT, genotype_string) for every planted
    variant, calls is [(position, qual, is_tp)]. A call is a TP only
    when position, REF, ALT, and genotype ALL match the planted truth
    (the allele-aware matching of the hap.py-style methodology behind
    the reference's published cutoffs) — a wrong-allele or
    wrong-genotype call at a truth position is a false positive, and
    its truth site can no longer be recalled by any cutoff."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.utils.simulate import (
        platform_fast_kwargs,
        simulate_platform_fast,
        write_fasta,
    )

    params, _ = load_checkpoint(os.path.join(REPO, CHECKPOINTS[platform]))
    tmp = tempfile.mkdtemp(prefix=f"clair_tpu_qual_{platform}_")
    rs = np.random.RandomState(HELDOUT_SEEDS[platform])
    bam = os.path.join(tmp, "s.bam")
    fasta = os.path.join(tmp, "ref.fa")
    reference, variants = simulate_platform_fast(
        bam, rs, length=genome_kb * 1000, variant_spacing=400,
        **platform_fast_kwargs(platform, None),
    )
    write_fasta(fasta, reference)
    build_bai(bam, bam + ".bai")
    out = os.path.join(tmp, "calls.vcf")
    # the reference's per-platform candidate alt-AF defaults
    # (README.md:374-381): Illumina 0.1, CCS 0.2, ONT 0.2
    minimum_af = 0.1 if platform == "ilmn" else 0.2
    call_bam(
        CallBamConfig(bam_path=bam, fasta_path=fasta, contig="chr1",
                      minimum_af=minimum_af, minimum_coverage=4),
        Predictor(params, ModelConfig(), batch_size=batch_size),
        output_path=out,
    )
    gt_str = {(0, 1): "0/1", (1, 1): "1/1"}
    truth = {
        v.position: (v.ref, v.alt, gt_str[tuple(v.genotype)])
        for v in variants
    }
    calls = []
    for row in open(out):
        if row.startswith("#"):
            continue
        c = row.rstrip("\n").split("\t")
        position, qual = int(c[1]), float(c[5])
        called_gt = c[9].split(":", 1)[0].replace("|", "/")
        is_tp = truth.get(position) == (c[3], c[4], called_gt)
        calls.append((position, qual, is_tp))
    return truth, calls


def sweep(truth, calls, thresholds=None):
    """Precision/recall/F1 at each QUAL threshold (calls with
    QUAL >= threshold kept). Returns list of dict rows, ascending."""
    if thresholds is None:
        quals = sorted({q for _, q, _ in calls})
        # candidate cutoffs: 0 plus every distinct call QUAL (the exact
        # sweep — each threshold between two quals scores identically to
        # the upper one)
        thresholds = [0.0] + quals
    n_truth = len(truth)
    rows = []
    for t in thresholds:
        kept = [(p, q, is_tp) for p, q, is_tp in calls if q >= t]
        tp = len({p for p, _, is_tp in kept if is_tp})
        fp = sum(1 for _, _, is_tp in kept if not is_tp)
        precision = tp / max(tp + fp, 1)
        recall = tp / max(n_truth, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        rows.append({"qual": t, "tp": tp, "fp": fp,
                     "precision": round(precision, 4),
                     "recall": round(recall, 4), "f1": round(f1, 4)})
    return rows


def operating_point(rows):
    """Best-F1 threshold (the reference's cutoff selection criterion);
    ties break toward the LOWER threshold (more recall headroom)."""
    return max(rows, key=lambda r: (r["f1"], -r["qual"]))


def run_platform(platform: str, genome_kb: int):
    truth, calls = call_heldout(platform, genome_kb=genome_kb)
    rows = sweep(truth, calls)
    best = operating_point(rows)
    unfiltered = rows[0]
    return {
        "platform": platform,
        "genome_kb": genome_kb,
        "n_truth": len(truth),
        "n_called": len(calls),
        "unfiltered": unfiltered,
        "best": best,
        "fp_quals": sorted(q for _, q, is_tp in calls if not is_tp),
        "tp_qual_p10": float(np.percentile(
            [q for _, q, is_tp in calls if is_tp], 10))
        if any(is_tp for _, _, is_tp in calls) else 0.0,
        "sweep": rows,
    }


def markdown_table(results):
    lines = [
        "| Platform | Unfiltered P / R | Best cutoff | P / R / F1 at cutoff | FPs removed |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        u, b = r["unfiltered"], r["best"]
        lines.append(
            f"| {r['platform'].upper()} | {u['precision']:.3f} / {u['recall']:.3f} "
            f"| QUAL >= {b['qual']:.0f} | {b['precision']:.3f} / {b['recall']:.3f} / {b['f1']:.3f} "
            f"| {u['fp'] - b['fp']}/{u['fp']} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default="all",
                    choices=["all", "ont", "ccs", "ilmn"])
    ap.add_argument("--genome-kb", type=int, default=60)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    platforms = ["ont", "ccs", "ilmn"] if args.platform == "all" else [args.platform]
    results = []
    for platform in platforms:
        r = run_platform(platform, args.genome_kb)
        results.append(r)
        compact = {k: v for k, v in r.items() if k not in ("sweep", "fp_quals")}
        compact["sweep_points"] = len(r["sweep"])
        print(json.dumps(compact))
    if args.markdown:
        print()
        print(markdown_table(results))


if __name__ == "__main__":
    main()
