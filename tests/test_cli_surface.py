"""CLI surface smoke tests: every command resolves and prints usage; the
help listing covers the reference's submodule names."""

import os as _os
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

import os
import subprocess
import sys

import numpy as np
import pytest

CLI_ENV = {**os.environ, "JAX_PLATFORMS": "", "JAX_PLATFORM_NAME": "cpu"}


def _run(args, stdin_text=None, check=True):
    result = subprocess.run(
        [sys.executable, "-m", "clair_tpu"] + args,
        capture_output=True, text=True, input=stdin_text, env=CLI_ENV, timeout=120,
    )
    if check:
        assert result.returncode == 0, result.stderr[-1500:]
    return result


def test_help_lists_reference_aliases():
    out = _run(["--help"]).stdout
    for name in (
        "call_var", "call_bam", "call_bam_parallel", "train", "train_clr",
        "evaluate", "learning_rate_finder", "extract_candidates",
        "create_tensor", "get_truth", "pair_with_non_variants", "tensor2bin",
        "combine_bins", "convert_bin", "tensor_transform", "overlap_variant",
        "ensemble", "plot_tensor", "variables",
    ):
        assert name in out, f"{name} missing from CLI help"


def test_unknown_command_fails_cleanly():
    result = _run(["definitely_not_a_command"], check=False)
    assert result.returncode == 1
    assert "unknown command" in result.stderr


@pytest.mark.parametrize("command", [
    "call_var", "call_bam", "call_bam_parallel", "train", "evaluate",
    "learning_rate_finder", "extract_candidates", "create_tensor",
    "get_truth", "pair_with_non_variants", "tensor2bin", "combine_bins",
    "convert_bin", "tensor_transform", "ensemble", "plot_tensor", "variables",
])
def test_command_help(command):
    result = _run([command, "--help"], check=False)
    assert result.returncode == 0, result.stderr[-500:]
    assert "usage" in result.stdout.lower()


def test_variables_command(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clair_tpu.models.checkpoint import save_checkpoint
    from clair_tpu.models.clair import init_params

    path = str(tmp_path / "m-000001")
    save_checkpoint(path, init_params(jax.random.PRNGKey(0)))
    out = _run(["variables", "--chkpnt_fn", path, "-v", "l4/.*"]).stdout
    assert "l4/w (7680, 192)" in out
    assert "lstm1" not in out


def test_convert_bin_roundtrip(tmp_path):
    from clair_tpu.data.bins import BinDataset, _pack, load_bin, write_bin

    rs = np.random.RandomState(0)
    xs = rs.rand(12, 33, 8, 4).astype(np.float32)
    ys = np.zeros((12, 90), np.float32)
    blocks = lambda a: [_pack(a[o:o + 4]) for o in range(0, 12, 4)]
    src = str(tmp_path / "a.bin")
    dst = str(tmp_path / "b.bin")
    write_bin(src, BinDataset(12, blocks(xs), blocks(ys),
                              blocks(np.array([str(i) for i in range(12)])), 4))
    _run(["convert_bin", "--input_fn", src, "--output_fn", dst])
    out = load_bin(dst)
    assert out.dataset_size == 12
    np.testing.assert_array_equal(out.x_block(0), xs[:4])


def test_train_profile_dir(tmp_path):
    """--profile_dir captures a jax.profiler trace around training."""
    import numpy as np

    from clair_tpu.cli import main as cli_main
    from clair_tpu.data.tensor_stream import tensor_line_from

    rs = np.random.RandomState(0)
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGTA"
    lines = [
        tensor_line_from("chr1", 100 + i, seq, rs.randint(0, 20, size=(33, 8, 4)))
        for i in range(10)
    ]
    tensor_fn = tmp_path / "tensors.txt"
    tensor_fn.write_text("\n".join(lines) + "\n")
    var_fn = tmp_path / "vars.txt"
    var_fn.write_text("chr1 103 A G 0 1\n")
    bin_fn = str(tmp_path / "train.bin")
    cli_main(["tensor2bin", "--tensor_fn", str(tensor_fn), "--var_fn", str(var_fn),
              "--bin_fn", bin_fn])
    profile_dir = str(tmp_path / "trace")
    cli_main([
        "train", "--bin_fn", bin_fn, "--maxEpoch", "1",
        "--ochk_prefix", str(tmp_path / "m"),
        "--profile_dir", profile_dir,
    ])
    import glob
    assert glob.glob(profile_dir + "/**/*", recursive=True)


def test_call_bam_reference_flag_surface(tmp_path):
    """The call_bam CLI accepts the reference callVarBam flag set: --debug,
    --output_for_ensemble, --stop_consider_left_edge, --threads,
    --log_path, and the obsolete process flags (--pypy/--samtools/--delay)
    as compat no-ops."""
    import subprocess
    import sys as _sys

    import numpy as np

    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    rs = np.random.RandomState(3)
    ref = random_reference(rs, 4000)
    variants = plant_variants(rs, ref, n_variants=6, spacing=400)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "s.bam")
    write_fasta(fasta, ref)
    simulate_bam(bam, ref, variants, rs, coverage=25)

    env = {**__import__("os").environ, "JAX_PLATFORMS": "",
           "JAX_PLATFORM_NAME": "cpu"}
    base = [
        _sys.executable, "-m", "clair_tpu", "call_bam",
        "--bam_fn", bam, "--ref_fn", fasta,
        "--chkpnt_fn", "examples/ont_synthetic.ckpt",
        "--ctgName", "chr1", "--threshold", "0.2",
        "--pypy", "pypy3", "--samtools", "samtools", "--delay", "10",
        "--threads", "2", "--log_path", str(tmp_path / "run.log"),
    ]
    # ensemble output: headerless tensor+probability rows
    out = str(tmp_path / "ens.txt")
    r = subprocess.run(base + ["--output_for_ensemble", "--call_fn", out],
                       capture_output=True, text=True, env=env, cwd=_REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = open(out).read().splitlines()
    assert rows and not rows[0].startswith("#")
    columns = rows[0].split("\t")
    assert len(columns) == 3 + 33 * 8 * 4 + 90  # ctg pos seq tensor probs
    assert len(columns[2]) == 33

    # debug mode: per-site probability vectors, no VCF rows
    out = str(tmp_path / "dbg.txt")
    r = subprocess.run(base + ["--debug", "--call_fn", out],
                       capture_output=True, text=True, env=env, cwd=_REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    body = [l for l in open(out) if not l.startswith("#")]
    assert body and ("Normal output" in body[0] or "Reference" in body[0])

    # left-edge parity mode still calls variants
    out = str(tmp_path / "edge.vcf")
    r = subprocess.run(base + ["--stop_consider_left_edge", "--call_fn", out],
                       capture_output=True, text=True, env=env, cwd=_REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [l for l in open(out) if not l.startswith("#")]
    assert len(rows) >= len(variants) - 1


def test_calling_predictor_defaults_to_bf16_with_f32_escape(tmp_path):
    """The calling pipelines build their predictors in bfloat16 by default
    (params.PREDICT_COMPUTE_DTYPE; decode decisions guarded f32-identical
    in tests/test_bf16.py); --dtype float32 is the exact-probability
    escape hatch."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clair_tpu.cli import _predictor_from
    from clair_tpu.models.checkpoint import save_checkpoint
    from clair_tpu.models.clair import init_params
    from clair_tpu.params import PREDICT_COMPUTE_DTYPE

    assert PREDICT_COMPUTE_DTYPE == "bfloat16"
    path = str(tmp_path / "m-000001")
    save_checkpoint(path, init_params(jax.random.PRNGKey(0)))
    assert _predictor_from(path).config.compute_dtype == "bfloat16"
    assert (_predictor_from(path, dtype="float32").config.compute_dtype
            == "float32")
