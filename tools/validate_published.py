#!/usr/bin/env python3
"""Turnkey validation of the PUBLISHED reference checkpoints.

The format link of the parity chain is validated against real TensorFlow
(tests/test_tf_real_fixture.py round-trips the full production variable
set through tf.compat.v1.train.Saver both directions, bit-exact); what no
test here can see is the content of the PUBLISHED files themselves (this
build environment has no network).  On any machine WITH network access,
this script closes that last link in one command:

    python tools/validate_published.py --workdir /tmp/clair_models

Per model (ont / pacbio-ccs / illumina, URLs from
/root/reference/README.md:96-108) it

  1. downloads + untars the Saver triplet,
  2. runs the STRICT structural audit (clair_tpu.models.audit) — every
     expected variable name/shape present, nothing unexpected — and
     aborts loudly with the diff otherwise,
  3. converts to a clair_tpu checkpoint (models/convert_tf1.py),
  4. forwards a deterministic tensor fixture through the jitted model and
     writes per-site head probabilities (probs_<model>.tsv) plus decoded
     VCF-style rows (calls_<model>.txt),
  5. writes fixture_<model>.tensor.txt in the reference's text tensor
     format, so the reference's own `call_var --debug` can be run on
     byte-identical inputs, and
  6. if --reference_probs (the reference run's dump) is given, checks
     per-class probability parity within --tolerance and prints PASS/FAIL.

Steps 2-4+6 contain no network code and are unit-tested against
self-generated fixtures (tests/test_validation_kit.py); step 1 is a thin
urllib wrapper.  Individual steps are reusable:

    python tools/validate_published.py --checkpoint /path/to/model --name ont
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_URLS = {
    # /root/reference/README.md:96-108
    "ont": "http://www.bio8.cs.hku.hk/clair_models/ont/122HD34.tar",
    "pacbio-ccs": "http://www.bio8.cs.hku.hk/clair_models/pacbio/ccs/15.tar",
    "illumina": "http://www.bio8.cs.hku.hk/clair_models/illumina/12345.tar",
}

FIXTURE_SITES = 64
FIXTURE_SEED = 20260817


def make_fixture():
    """Deterministic pileup-tensor fixture: FIXTURE_SITES sites of 33x8x4
    integer counts shaped like a ~30x pileup, identical on every machine.

    Counts are generated in the reference's RAW text-tensor convention
    (channel 0 = reference counts; channels 1-3 NOT yet normalized) so the
    emitted text fixture feeds the reference's call_var unmodified; the
    model forward below applies the same channel normalization the
    reference applies at load (ref clair/utils.py:96-98).
    """
    rs = np.random.RandomState(FIXTURE_SEED)
    bases = "ACGT"
    x = np.zeros((FIXTURE_SITES, 33, 8, 4), dtype=np.int32)
    refseqs, positions = [], []
    for i in range(FIXTURE_SITES):
        refseq = "".join(bases[b] for b in rs.randint(0, 4, 33))
        depth = int(rs.randint(20, 45))
        for pos in range(33):
            ref_row = bases.index(refseq[pos])
            for _ in range(depth):
                strand = int(rs.randint(2))
                if rs.rand() < 0.9:
                    row = ref_row + 4 * strand
                    x[i, pos, row, 0] += 1
                    x[i, pos, row, 2] += 1
                    x[i, pos, ref_row + 4 * strand, 1] += 1
                    x[i, pos, ref_row + 4 * strand, 3] += 1
                else:
                    row = int(rs.randint(4)) + 4 * strand
                    x[i, pos, row, 1] += 1
                    x[i, pos, row, 3] += 1
                    x[i, pos, ref_row + 4 * strand, 0] += 1
                    x[i, pos, ref_row + 4 * strand, 2] += 1
        refseqs.append(refseq)
        positions.append(1_000_000 + 100 * i)
    return x, refseqs, positions


def write_text_fixture(path: str, x, refseqs, positions, ctg="chr20"):
    """Reference text tensor rows: `ctg pos refseq 1056*int` (ref
    dataPrepScripts/CreateTensor.py:60-65)."""
    with open(path, "w") as fh:
        for i, (refseq, pos) in enumerate(zip(refseqs, positions)):
            flat = " ".join(str(v) for v in x[i].reshape(-1))
            fh.write(f"{ctg} {pos} {refseq} {flat}\n")


def normalize(x: np.ndarray) -> np.ndarray:
    """Channel normalization applied by both frameworks at load time
    (ref clair/utils.py:96-98)."""
    x = x.astype(np.float32).copy()
    x[:, :, :, 1:] -= x[:, :, :, 0:1]
    return x


def forward_probs(converted_ckpt: str, x_norm: np.ndarray) -> np.ndarray:
    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.params import ModelConfig

    params, _ = load_checkpoint(converted_ckpt)
    predictor = Predictor(params, ModelConfig(), batch_size=FIXTURE_SITES)
    out, n = predictor.predict_async(x_norm)
    gt21, genotype, vl1, vl2 = predictor.gather(out, n)
    return np.concatenate([gt21, genotype, vl1, vl2], axis=-1)


def decode_calls(probs: np.ndarray, x_norm, refseqs, positions, ctg="chr20"):
    from clair_tpu.pipeline.batch_decode import decode_batch
    from clair_tpu.pipeline.decode import OutputConfig

    infos = [
        (ctg, str(pos), refseq)
        for refseq, pos in zip(refseqs, positions)
    ]
    gt21 = probs[:, :21]
    genotype = probs[:, 21:24]
    vl1 = probs[:, 24:57]
    vl2 = probs[:, 57:90]
    config = OutputConfig(is_show_reference=True)
    return decode_batch(x_norm, infos, gt21, genotype, vl1, vl2, config)


def compare_probs(ours: np.ndarray, reference_tsv: str, tolerance: float):
    """Parity check against a reference dump: rows of 90 floats (site
    order must match the fixture)."""
    ref = np.loadtxt(reference_tsv)
    if ref.shape != ours.shape:
        return False, f"shape mismatch: ours {ours.shape} vs reference {ref.shape}"
    diff = np.abs(ref - ours)
    worst = float(diff.max())
    ok = worst <= tolerance
    return ok, (
        f"max abs probability diff {worst:.3e} over {ours.size} entries "
        f"(tolerance {tolerance:g}): {'PASS' if ok else 'FAIL'}"
    )


def find_checkpoint_prefix(root: str) -> str:
    """Locate the Saver triplet prefix under an untarred model dir."""
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".index"):
                return os.path.join(dirpath, f[: -len(".index")])
    raise FileNotFoundError(f"no .index file under {root}")


def validate_one(name: str, prefix: str, outdir: str,
                 reference_probs: str = None, tolerance: float = 1e-3) -> bool:
    from clair_tpu.models.audit import audit_tf1_vars
    from clair_tpu.models.convert_tf1 import (
        convert_tf1_checkpoint, load_tf1_variables,
    )

    print(f"== {name}: {prefix}")
    report = audit_tf1_vars(load_tf1_variables(prefix))
    print(report.render())
    if not report.ok:
        print(f"{name}: STRUCTURAL AUDIT FAILED — not converting", file=sys.stderr)
        return False

    converted = os.path.join(outdir, f"{name}_converted.ckpt")
    convert_tf1_checkpoint(prefix, converted)

    x, refseqs, positions = make_fixture()
    write_text_fixture(
        os.path.join(outdir, f"fixture_{name}.tensor.txt"), x, refseqs, positions
    )
    x_norm = normalize(x)
    probs = forward_probs(converted, x_norm)
    np.savetxt(os.path.join(outdir, f"probs_{name}.tsv"), probs, fmt="%.8g")
    rows = decode_calls(probs, x_norm, refseqs, positions)
    with open(os.path.join(outdir, f"calls_{name}.txt"), "w") as fh:
        for row in rows:
            fh.write(str(row) + "\n")
    print(f"{name}: wrote probs/calls for {len(probs)} fixture sites")

    if reference_probs:
        ok, msg = compare_probs(probs, reference_probs, tolerance)
        print(f"{name}: {msg}")
        return ok
    print(f"{name}: no --reference_probs given; run the reference's "
          f"call_var --debug on fixture_{name}.tensor.txt and re-run with "
          f"--reference_probs to close the parity check")
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--workdir", default="clair_model_validation")
    parser.add_argument("--models", default="ont,pacbio-ccs,illumina")
    parser.add_argument("--checkpoint",
                        help="skip download: validate this Saver prefix")
    parser.add_argument("--name", default="local",
                        help="model name when using --checkpoint")
    parser.add_argument("--reference_probs",
                        help="TSV of 90 per-site probabilities dumped by the "
                             "reference on the same fixture (site order must "
                             "match)")
    parser.add_argument("--tolerance", type=float, default=1e-3)
    args = parser.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    if args.checkpoint:
        ok = validate_one(args.name, args.checkpoint, args.workdir,
                          args.reference_probs, args.tolerance)
        return 0 if ok else 1

    all_ok = True
    for name in args.models.split(","):
        url = MODEL_URLS[name]
        tar_path = os.path.join(args.workdir, os.path.basename(url))
        if not os.path.exists(tar_path):
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, tar_path)
        extract_dir = os.path.join(args.workdir, name)
        os.makedirs(extract_dir, exist_ok=True)
        with tarfile.open(tar_path) as tf:
            try:
                tf.extractall(extract_dir, filter="data")
            except TypeError:
                # Python < 3.12 has no filter argument: enforce the
                # equivalent guarantees by hand (the tars arrive over
                # plain http) — regular files/dirs only, sane paths
                for member in tf.getmembers():
                    member_path = member.name
                    if (member_path.startswith(("/", os.sep))
                            or ".." in member_path.split("/")):
                        raise ValueError(
                            f"refusing unsafe tar member path: {member_path!r}"
                        )
                    if not (member.isfile() or member.isdir()):
                        raise ValueError(
                            "refusing non-regular tar member "
                            f"(link/device/fifo): {member_path!r}"
                        )
                    member.mode &= 0o755  # drop setuid/sticky/world-write
                tf.extractall(extract_dir)
        prefix = find_checkpoint_prefix(extract_dir)
        all_ok &= validate_one(name, prefix, args.workdir,
                               args.reference_probs, args.tolerance)
    print("ALL OK" if all_ok else "FAILURES — see above", file=sys.stderr)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
