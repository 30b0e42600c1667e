"""CLI surface smoke tests: every command resolves and prints usage; the
help listing covers the reference's submodule names."""

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
