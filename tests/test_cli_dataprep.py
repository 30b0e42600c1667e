"""Data-prep CLI round trips: get_truth, pair_with_non_variants,
tensor_transform, plot_tensor."""

import os
import subprocess
import sys

import numpy as np

from clair_tpu.data.tensor_stream import tensor_line_from

CLI_ENV = {**os.environ, "JAX_PLATFORMS": "", "JAX_PLATFORM_NAME": "cpu",
           "MPLBACKEND": "Agg"}


def _run(args, stdin_text=None):
    result = subprocess.run(
        [sys.executable, "-m", "clair_tpu"] + args,
        capture_output=True, text=True, input=stdin_text, env=CLI_ENV, timeout=120,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    return result.stdout


def test_get_truth_cli(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "\n".join([
            "##fileformat=VCFv4.1",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
            "chr1\t100\t.\tA\tG\t60\tPASS\t.\tGT\t0/1",
            "chr1\t200\t.\tCT\tC\t60\tPASS\t.\tGT\t1/1",
            "chr2\t300\t.\tG\tT\t60\tPASS\t.\tGT\t1/1",   # other contig
        ]) + "\n"
    )
    out = _run(["get_truth", "--vcf_fn", str(vcf), "--ctgName", "chr1"])
    lines = out.strip().splitlines()
    assert lines == ["chr1 100 A G 0 1", "chr1 200 CT C 1 1"]

    # region restriction
    out = _run(["get_truth", "--vcf_fn", str(vcf), "--ctgName", "chr1",
                "--ctgStart", "150", "--ctgEnd", "250"])
    assert out.strip() == "chr1 200 CT C 1 1"


def test_pair_with_non_variants_cli(tmp_path):
    seq = "A" * 33
    x = np.ones((33, 8, 4))
    var = tmp_path / "var.txt"
    can = tmp_path / "can.txt"
    var.write_text("\n".join(tensor_line_from("chr1", 100 + i, seq, x) for i in range(5)) + "\n")
    can.write_text("\n".join(tensor_line_from("chr1", 500 + i, seq, x) for i in range(40)) + "\n")
    out_fn = tmp_path / "paired.txt"
    _run(["pair_with_non_variants", "--tensor_var_fn", str(var),
          "--tensor_can_fn", str(can), "--output_fn", str(out_fn), "--amp", "2"])
    lines = out_fn.read_text().splitlines()
    truth = [l for l in lines if int(l.split()[1]) < 500]
    assert len(truth) == 5
    assert 5 < len(lines) <= 30


def test_tensor_transform_cli():
    seq65 = "C" * 65
    x65 = np.arange(65 * 32).reshape(65, 8, 4)
    line = tensor_line_from("chr1", 900, seq65, x65)
    out = _run(["tensor_transform"], stdin_text=line + "\n")
    columns = out.split()
    assert len(columns) == 3 + 33 * 32
    assert len(columns[2]) == 33
    # cropped window starts at source row 16
    np.testing.assert_array_equal(
        np.array(columns[3:3 + 32], dtype=int), x65[16].reshape(-1)
    )


def test_plot_tensor_cli(tmp_path):
    seq = "G" * 33
    x = np.random.RandomState(0).randint(0, 40, (33, 8, 4))
    tensor_fn = tmp_path / "t.txt"
    tensor_fn.write_text(tensor_line_from("chr1", 42, seq, x) + "\n")
    _run(["plot_tensor", "--array_fn", str(tensor_fn),
          "--name", str(tmp_path / "viz")])
    assert (tmp_path / "viz_chr1_42.png").exists()
    assert (tmp_path / "viz_chr1_42.png").stat().st_size > 1000

def test_dataprep_native_paths_match_python(tmp_path, monkeypatch, capsys):
    """extract_candidates and create_tensor produce identical text through
    the native scans and the Python events engine, for BAM and CRAM."""
    import clair_tpu.cli as cli
    from clair_tpu.io.bai import build_bai
    from clair_tpu.io.cram import bam_to_cram
    from clair_tpu.utils.simulate import (
        ErrorProfile, plant_variants, random_reference, simulate_bam,
        write_fasta,
    )

    rs = np.random.RandomState(51)
    ref = random_reference(rs, 7_000)
    variants = plant_variants(rs, ref, n_variants=8, spacing=500)
    bam = str(tmp_path / "c.bam")
    fa = str(tmp_path / "c.fa")
    cram = str(tmp_path / "c.cram")
    simulate_bam(bam, ref, variants, rs, coverage=18,
                 error_profile=ErrorProfile(mismatch=0.03, insertion=0.01,
                                            deletion=0.01))
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    bam_to_cram(bam, cram, fa)

    # the native arm must actually engage; a silent fallback would make
    # the equality below vacuous
    for aln_check in (bam, cram):
        scan = cli._native_region_scan(aln_check, fa, "chr1", 1, 7_000, 0)
        assert scan is not None, f"native scan did not engage for {aln_check}"
        scan.close()

    def run_pair(fn, argv_builder):
        outputs = {}
        for native_on in (True, False):
            if not native_on:
                monkeypatch.setattr(cli, "_native_region_scan",
                                    lambda *a, **kw: None)
            else:
                monkeypatch.undo()
            out_path = tmp_path / f"out.{fn.__name__}.{native_on}"
            fn(argv_builder(str(out_path)))
            outputs[native_on] = out_path.read_text()
        assert outputs[True] == outputs[False]
        assert outputs[True].strip()
        return outputs[True]

    for aln in (bam, cram):
        cands = run_pair(
            cli.cmd_extract_candidates,
            lambda out: ["--bam_fn", aln, "--ref_fn", fa,
                         "--ctgName", "chr1", "--threshold", "0.15",
                         "--can_fn", out],
        )
        can_path = tmp_path / "cands.txt"
        can_path.write_text(cands)
        run_pair(
            cli.cmd_create_tensor,
            lambda out: ["--bam_fn", aln, "--ref_fn", fa,
                         "--ctgName", "chr1", "--can_fn", str(can_path),
                         "--tensor_fn", out],
        )
