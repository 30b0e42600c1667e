#!/usr/bin/env python3
"""Turnkey first-contact validation of the CRAM 3.0/3.1 stack vs htslib.

The CRAM codecs (rANS 4x8, rANS Nx16 incl. X32, adaptive arithmetic,
tok3 name tokenizer, fqzcomp quality model) were built to the spec and
validated by round-trips against this repo's own writer — this build
image has no htslib/samtools, so no byte stream written by htslib has
ever been decoded and vice versa (the likely divergence points are named
in each codec module's docstring). On any machine WITH samtools (>=1.16
for 3.1 profiles), this script closes that link in one command:

    python tools/validate_cram31.py --workdir /tmp/cram31

It builds a deterministic noisy ONT-like flowcell (BAM + FASTA via
clair_tpu.utils.simulate) and then checks BOTH directions over a profile
matrix:

  OURS -> HTSLIB: write CRAM with clair_tpu's writer in each profile
      (3.0; 3.1 default; 3.1 X32 interleave; 3.1 arith; 3.1 fqzcomp
      quals; 3.1 embedded reference) and `samtools view` it — per-record
      name/flag/pos/mapq/CIGAR/SEQ must match the BAM.
  HTSLIB -> OURS: `samtools view -C` in each profile (3.0; 3.1; 3.1
      small; 3.1 archive — the small/archive profiles are what turns on
      fqzcomp/arith/tok3 in htslib) and decode with CramReader, both
      with quality-skipping on (production path) and off (every block
      decompressed, every CRC checked) — per-record parity with the BAM
      again.

`--self_check` runs the same matrix with this repo's own reader standing
in for samtools (no htslib required): it proves the kit's plumbing and
the writer profiles end-to-end, which is what the unit test covers
(tests/test_validation_kit.py).

Exit status 0 = every profile in every direction PASSed.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_SEED = 20260817

# (name, extra bam2cram argv) — our writer's profile matrix
WRITE_PROFILES = [
    ("3.0-rans4x8", ["--cram_version", "3.0"]),
    ("3.1-ransNx16", ["--cram_version", "3.1"]),
    ("3.1-ransNx16-X32", ["--cram_version", "3.1", "--rans_x32"]),
    ("3.1-arith", ["--cram_version", "3.1", "--codec", "arith"]),
    ("3.1-fqzcomp-quals", ["--cram_version", "3.1", "--fqzcomp_quals"]),
    ("3.1-embed-ref", ["--cram_version", "3.1", "--embed_ref"]),
]

# (name, samtools --output-fmt-option list) — htslib's profile matrix
READ_PROFILES = [
    ("3.0", ["version=3.0"]),
    ("3.1-normal", ["version=3.1"]),
    ("3.1-small", ["version=3.1", "small=1"]),
    ("3.1-archive", ["version=3.1", "archive=1"]),
]


def build_fixture(workdir: str, genome_kb: int = 60, coverage: int = 20):
    """Deterministic noisy flowcell: lognormal ONT-like reads, 5%
    mismatch, homopolymer-biased indels, planted variants."""
    import numpy as np

    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import simulate_ont_fast, write_fasta

    bam = os.path.join(workdir, "fixture.bam")
    fasta = os.path.join(workdir, "fixture.fa")
    rs = np.random.RandomState(FIXTURE_SEED)
    reference, _ = simulate_ont_fast(
        bam, rs, length=genome_kb * 1000, coverage=coverage
    )
    write_fasta(fasta, reference)
    build_bai(bam, bam + ".bai")
    return bam, fasta


def _qual_text(rec) -> str:
    if rec.qual is None:
        return "*"
    return bytes((min(int(q), 93) + 33) for q in rec.qual).decode("ascii")


def bam_records(bam_path: str, with_qual: bool = False):
    """name/flag/pos/mapq/cigar/seq[/qual] rows via this repo's reader."""
    from clair_tpu.io.bam import BamReader

    with BamReader(bam_path) as bam:
        return [
            (r.read_name, r.flag, r.pos, r.mapq, r.cigar_str(), r.seq_str())
            + ((_qual_text(r),) if with_qual else ())
            for r in bam
        ]


def cram_records_ours(cram_path: str, fasta_path: str, skip_quals: bool):
    from clair_tpu.io.cram import CramReader
    from clair_tpu.io.fasta import FastaReader

    with FastaReader(fasta_path) as fasta:
        with CramReader(cram_path, fasta=fasta,
                        skip_quals=skip_quals) as reader:
            # quality text joins the row only on full-decode legs (the
            # skip legs never decompress the QS blocks by design)
            return [
                (r.read_name, r.flag, r.pos, r.mapq, r.cigar_str(),
                 r.seq_str())
                + (() if skip_quals else (_qual_text(r),))
                for r in reader
            ]


def sam_records_htslib(samtools: str, path: str, fasta_path: str):
    """Rows as htslib sees them (works for BAM and CRAM inputs)."""
    out = subprocess.run(
        [samtools, "view", "-T", fasta_path, path],
        capture_output=True, text=True, check=True,
    )
    rows = []
    for line in out.stdout.splitlines():
        f = line.split("\t")
        # SAM POS is 1-based; our records are 0-based
        rows.append((f[0], int(f[1]), int(f[3]) - 1, int(f[4]), f[5], f[9],
                     f[10]))
    return rows


def compare(name: str, got, want) -> bool:
    if len(got) != len(want):
        print(f"FAIL {name}: {len(got)} records, expected {len(want)}")
        return False
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            print(f"FAIL {name}: record {i} differs")
            print(f"  got : {g[:5]} seq[:40]={g[5][:40]}")
            print(f"  want: {w[:5]} seq[:40]={w[5][:40]}")
            return False
    print(f"PASS {name} ({len(got)} records)")
    return True


def write_ours(bam: str, fasta: str, out_path: str, extra_argv) -> None:
    from clair_tpu.cli import cmd_bam2cram
    from clair_tpu.io import cram as cram_mod

    # cmd_bam2cram sets the X32 module flag for --rans_x32 and leaves it;
    # snapshot/restore so one profile can't leak into the next
    saved = cram_mod.RANS4X16_X32
    try:
        cmd_bam2cram(["--bam_fn", bam, "--ref_fn", fasta,
                      "--cram_fn", out_path] + extra_argv)
    finally:
        cram_mod.RANS4X16_X32 = saved


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--workdir", default="/tmp/clair_tpu_cram31")
    parser.add_argument("--samtools", default="samtools",
                        help="samtools binary (>=1.16 for 3.1 profiles)")
    parser.add_argument("--genome_kb", type=int, default=60)
    parser.add_argument("--coverage", type=int, default=20)
    parser.add_argument("--self_check", action="store_true",
                        help="run the matrix against this repo's own "
                             "reader instead of samtools (no htslib "
                             "needed; proves kit plumbing only)")
    args = parser.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    samtools = shutil.which(args.samtools)
    if not samtools and not args.self_check:
        print(f"samtools not found ({args.samtools!r}); re-run with "
              f"--samtools /path/to/samtools, or --self_check for the "
              f"htslib-free plumbing check", file=sys.stderr)
        return 2

    bam, fasta = build_fixture(args.workdir, args.genome_kb, args.coverage)
    want = bam_records(bam)
    want_full = bam_records(bam, with_qual=True)  # + QUAL text
    print(f"fixture: {len(want)} records, {args.genome_kb} kb @ "
          f"{args.coverage}x -> {bam}")
    ok = True

    # direction 1: our writer -> htslib reader
    for name, extra in WRITE_PROFILES:
        cram = os.path.join(args.workdir, f"ours_{name}.cram")
        write_ours(bam, fasta, cram, extra)
        if args.self_check:
            got = cram_records_ours(cram, fasta, skip_quals=False)
        else:
            got = sam_records_htslib(samtools, cram, fasta)
        ok &= compare(f"ours->{'ours' if args.self_check else 'htslib'} "
                      f"{name}", got, want_full)

    # direction 2: htslib writer -> our reader
    if not args.self_check:
        for name, fmt_opts in READ_PROFILES:
            cram = os.path.join(args.workdir, f"htslib_{name}.cram")
            cmd = [samtools, "view", "-C", "-T", fasta, "-o", cram]
            for opt in fmt_opts:
                cmd += ["--output-fmt-option", opt]
            cmd.append(bam)
            r = subprocess.run(cmd, capture_output=True, text=True)
            if r.returncode != 0:
                print(f"SKIP htslib->{name}: samtools cannot write this "
                      f"profile ({r.stderr.strip().splitlines()[-1] if r.stderr else 'unknown error'})")
                continue
            for skip_quals in (True, False):
                got = cram_records_ours(cram, fasta, skip_quals=skip_quals)
                ok &= compare(
                    f"htslib->ours {name} skip_quals={skip_quals}",
                    got, want if skip_quals else want_full,
                )

    print("ALL PASS" if ok else "FAILURES above", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
