"""Strict checkpoint audit + published-model validation kit.

First contact with real TF-written checkpoints happens off-harness
(tools/validate_published.py); everything below it — the variable
manifest, the audit diff, the fail-loud conversion gate, the fixture
forward + parity comparison — is exercised here against self-generated
Saver-V2 bundles (io/tfckpt.py writer).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from clair_tpu.io.tfckpt import save_variables
from clair_tpu.models.audit import (
    LAYOUT_COMPATIBLE,
    LAYOUT_CUDNN,
    audit_tf1_vars,
    expected_manifest,
)
from clair_tpu.models.clair import init_params
from clair_tpu.models.convert_tf1 import (
    convert_tf1_checkpoint,
    cudnn_blob_from_lstm,
    tf1_vars_from_params,
)
from clair_tpu.params import ModelConfig

CONFIG = ModelConfig()


def _fixture_vars():
    params = init_params(jax.random.PRNGKey(0), CONFIG)
    return tf1_vars_from_params(jax.tree.map(np.asarray, params), CONFIG)


def test_manifest_matches_generated_vars_exactly():
    tf_vars = _fixture_vars()
    manifest = expected_manifest(CONFIG, LAYOUT_COMPATIBLE)
    assert set(manifest) == set(tf_vars)
    for name, shape in manifest.items():
        assert tuple(tf_vars[name].shape) == tuple(shape), name


def test_manifest_cudnn_layout_shapes():
    manifest = expected_manifest(CONFIG, LAYOUT_CUDNN)
    # one opaque blob per LSTM scope instead of 4 kernel/bias vars
    assert "LSTM1/cudnn_lstm/opaque_kernel" in manifest
    assert "LSTM2/cudnn_lstm/opaque_kernel" in manifest
    params = init_params(jax.random.PRNGKey(1), CONFIG)
    blob = cudnn_blob_from_lstm(
        jax.tree.map(np.asarray, params)["lstm1"],
        CONFIG.feature_dim, CONFIG.lstm1_num_units,
    )
    assert manifest["LSTM1/cudnn_lstm/opaque_kernel"] == blob.shape


def test_audit_clean_checkpoint_passes():
    tf_vars = _fixture_vars()
    report = audit_tf1_vars(tf_vars, CONFIG)
    assert report.ok and report.layout == LAYOUT_COMPATIBLE
    assert report.matched == len(expected_manifest(CONFIG))
    assert "OK" in report.render()


def test_audit_ignores_saver_bookkeeping_vars():
    tf_vars = _fixture_vars()
    # tf.train.Saver persists optimizer slots + counters (ref model.py:712)
    tf_vars["L4/kernel/Adam"] = np.zeros_like(tf_vars["L4/kernel"])
    tf_vars["L4/kernel/Adam_1"] = np.zeros_like(tf_vars["L4/kernel"])
    tf_vars["beta1_power"] = np.float32(0.9)
    tf_vars["global_step"] = np.int64(12)
    report = audit_tf1_vars(tf_vars, CONFIG)
    assert report.ok
    assert len(report.ignored) == 4


@pytest.mark.parametrize("mutate,expect", [
    (lambda v: v.pop("L4/bias"), "missing"),
    (lambda v: v.update(surprise=np.zeros(3, np.float32)), "unexpected"),
    (lambda v: v.update({"L4/kernel": np.zeros((7, 7), np.float32)}), "mismatched"),
])
def test_audit_fails_on_drift(mutate, expect):
    tf_vars = _fixture_vars()
    mutate(tf_vars)
    report = audit_tf1_vars(tf_vars, CONFIG)
    assert not report.ok
    assert getattr(report, expect), report.render()


def test_strict_convert_refuses_drifted_checkpoint(tmp_path):
    tf_vars = _fixture_vars()
    del tf_vars["Prediction/Y_genotype_logits/bias"]
    prefix = str(tmp_path / "model")
    save_variables(prefix, tf_vars)
    with pytest.raises(ValueError, match="structural audit"):
        convert_tf1_checkpoint(prefix, str(tmp_path / "out.ckpt"))
    assert not os.path.exists(tmp_path / "out.ckpt")
    # non-strict mode still refuses only at the mapping layer (KeyError),
    # but an intact graph converts fine with strict on
    tf_vars = _fixture_vars()
    save_variables(prefix, tf_vars)
    report = convert_tf1_checkpoint(prefix, str(tmp_path / "out.ckpt"))
    assert report.ok and os.path.exists(tmp_path / "out.ckpt")


def test_validation_kit_end_to_end(tmp_path):
    """tools/validate_published.py offline path: audit -> convert ->
    fixture forward -> probability dump -> parity self-check."""
    import validate_published as vp

    prefix = str(tmp_path / "model")
    save_variables(prefix, _fixture_vars())
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)

    ok = vp.validate_one("selftest", prefix, outdir)
    assert ok
    probs_path = os.path.join(outdir, "probs_selftest.tsv")
    probs = np.loadtxt(probs_path)
    assert probs.shape == (vp.FIXTURE_SITES, 90)
    # each head is a softmax
    np.testing.assert_allclose(probs[:, :21].sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(probs[:, 21:24].sum(-1), 1.0, atol=1e-4)
    # the text fixture is reference-format: ctg pos refseq + 33*8*4 ints
    line = open(os.path.join(outdir, "fixture_selftest.tensor.txt")).readline().split()
    assert len(line) == 3 + 33 * 8 * 4
    assert len(line[2]) == 33

    # parity comparison: against our own dump it must PASS, against a
    # perturbed dump it must FAIL
    ok, msg = vp.compare_probs(probs, probs_path, tolerance=1e-3)
    assert ok, msg
    bad = probs.copy()
    bad[0, 0] += 0.01
    np.savetxt(str(tmp_path / "bad.tsv"), bad, fmt="%.8g")
    ok, msg = vp.compare_probs(probs, str(tmp_path / "bad.tsv"), tolerance=1e-3)
    assert not ok

    # CLI surface: --checkpoint skips the download path entirely
    rc = vp.main(["--checkpoint", prefix, "--name", "cli",
                  "--workdir", str(tmp_path / "cli_out")])
    assert rc == 0


def test_audit_cli(tmp_path, capsys):
    from clair_tpu.cli import main as cli_main

    prefix = str(tmp_path / "model")
    save_variables(prefix, _fixture_vars())
    rc = cli_main(["convert_tf1", "--chkpnt_fn", prefix, "--audit_only"])
    out = capsys.readouterr().out
    assert rc == 0 and "audit: OK" in out

    tf_vars = _fixture_vars()
    del tf_vars["L3/Unit_0/kernel"]
    save_variables(prefix, tf_vars)
    rc = cli_main(["convert_tf1", "--chkpnt_fn", prefix, "--audit_only"])
    out = capsys.readouterr().out
    assert rc == 1 and "MISSING" in out
