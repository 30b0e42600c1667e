"""TF1 checkpoint converter: round-trip and gate-order mapping tests."""

import jax
import numpy as np

from clair_tpu.models.clair import forward, init_params
from clair_tpu.models.convert_tf1 import (
    params_from_tf1_vars,
    tf1_vars_from_params,
)
from clair_tpu.params import ModelConfig


def test_round_trip_preserves_params():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    tf_vars = tf1_vars_from_params(params, config)
    # expected variable surface
    assert "LSTM1/stack_bidirectional_rnn/cell_0/bidirectional_rnn/fw/cudnn_compatible_lstm_cell/kernel" in tf_vars
    assert "L3/Unit_0/kernel" in tf_vars and "L3/Unit_255/kernel" in tf_vars
    assert "Prediction/Y_base_change_logits/kernel" in tf_vars
    assert tf_vars["L4/kernel"].shape == (7680, 192)

    recovered = params_from_tf1_vars(tf_vars, config)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        rec = recovered
        for k in path:
            rec = rec[k.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(rec), err_msg=str(path))


def test_converted_params_run_forward():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(1), config)
    recovered = params_from_tf1_vars(tf1_vars_from_params(params, config), config)
    x = np.random.RandomState(0).rand(3, 33, 8, 4).astype(np.float32)
    out_a = forward(params, x, config)
    out_b = forward(recovered, x, config)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_gate_reordering_is_permutation():
    """TF kernels store gates as (i, j, f, o); ours are (i, f, g, o)."""
    from clair_tpu.models.convert_tf1 import _reorder_gates

    hidden = 4
    blocks = [np.full((2, hidden), v) for v in (1.0, 2.0, 3.0, 4.0)]  # i j f o
    kernel = np.concatenate(blocks, axis=-1)
    reordered = _reorder_gates(kernel, hidden)
    # expect i(1), f(3), g=j(2), o(4)
    np.testing.assert_array_equal(reordered[:, :hidden], 1.0)
    np.testing.assert_array_equal(reordered[:, hidden:2 * hidden], 3.0)
    np.testing.assert_array_equal(reordered[:, 2 * hidden:3 * hidden], 2.0)
    np.testing.assert_array_equal(reordered[:, 3 * hidden:], 4.0)


# ---------------------------------------------------------------------------
# CudnnLSTM opaque-blob layout (the GPU training path, ref model.py:281-296)
# ---------------------------------------------------------------------------

def test_cudnn_blob_round_trip():
    from clair_tpu.models.convert_tf1 import (
        _lstm_from_cudnn_blob,
        cudnn_blob_from_lstm,
    )

    rs = np.random.RandomState(2)
    hidden, input_dim = 3, 5
    sub = {
        d: {
            "w": rs.randn(input_dim, 4 * hidden).astype(np.float32),
            "u": rs.randn(hidden, 4 * hidden).astype(np.float32),
            "b": rs.randn(4 * hidden).astype(np.float32),
        }
        for d in ("fw", "bw")
    }
    blob = cudnn_blob_from_lstm(sub, input_dim, hidden)
    assert blob.size == 2 * (4 * hidden * input_dim + 4 * hidden * hidden) + 2 * 8 * hidden
    recovered = _lstm_from_cudnn_blob(blob, input_dim, hidden)
    for d in ("fw", "bw"):
        for key in ("w", "u", "b"):
            np.testing.assert_allclose(recovered[d][key], sub[d][key], rtol=1e-6)


def test_cudnn_split_biases_sum():
    """cuDNN keeps separate b_W/b_R vectors; the effective bias is the sum
    (the CudnnCompatibleLSTMCell reduction)."""
    from clair_tpu.models.convert_tf1 import _lstm_from_cudnn_blob

    hidden, input_dim = 2, 2
    per_dir_w = 4 * hidden * input_dim + 4 * hidden * hidden
    blob = np.zeros(2 * per_dir_w + 2 * 8 * hidden, np.float32)
    bias_base = 2 * per_dir_w
    blob[bias_base:bias_base + 4 * hidden] = 1.0          # fw b_W gates
    blob[bias_base + 4 * hidden:bias_base + 8 * hidden] = 0.25  # fw b_R gates
    out = _lstm_from_cudnn_blob(blob, input_dim, hidden)
    np.testing.assert_allclose(out["fw"]["b"], 1.25)
    np.testing.assert_allclose(out["bw"]["b"], 0.0)


def test_params_from_blob_layout_vars():
    """A variable dict carrying CudnnLSTM blobs (GPU checkpoints) converts
    to the same params as the compatible-cell layout."""
    from clair_tpu.models.convert_tf1 import cudnn_blob_from_lstm

    config = ModelConfig(lstm1_num_units=2, lstm2_num_units=2)
    params = init_params(jax.random.PRNGKey(3), config)
    tf_vars = tf1_vars_from_params(params, config)
    # swap the compatible-cell LSTM vars for opaque blobs
    for scope, sub, input_dim, hidden in (
        ("LSTM1", params["lstm1"], config.feature_dim, 2),
        ("LSTM2", params["lstm2"], 4, 2),
    ):
        base = f"{scope}/stack_bidirectional_rnn/cell_0/bidirectional_rnn"
        for d in ("fw", "bw"):
            del tf_vars[f"{base}/{d}/cudnn_compatible_lstm_cell/kernel"]
            del tf_vars[f"{base}/{d}/cudnn_compatible_lstm_cell/bias"]
        tf_vars[f"{scope}/cudnn_lstm/opaque_kernel"] = cudnn_blob_from_lstm(
            sub, input_dim, hidden
        )
    recovered = params_from_tf1_vars(tf_vars, config)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        rec = recovered
        for k in path:
            rec = rec[k.key]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(rec), rtol=1e-6, err_msg=str(path)
        )


# ---------------------------------------------------------------------------
# Saver-V2 file round trip + end-to-end convert -> forward golden
# ---------------------------------------------------------------------------

def test_tfckpt_save_load_round_trip(tmp_path):
    from clair_tpu.io.tfckpt import load_variables, save_variables

    rs = np.random.RandomState(4)
    # >16 variables exercises the block restart interval; mixed dtypes
    variables = {
        f"scope_{i}/nested/kernel_{i}": rs.randn(3, i + 1).astype(np.float32)
        for i in range(20)
    }
    variables["global_step"] = np.array(7, dtype=np.int64)
    variables["counts"] = np.arange(5, dtype=np.int32)
    save_variables(str(tmp_path / "model"), variables)
    assert (tmp_path / "model.index").exists()
    assert (tmp_path / "model.data-00000-of-00001").exists()

    loaded = load_variables(str(tmp_path / "model"))
    assert set(loaded) == set(variables)
    for name in variables:
        assert loaded[name].dtype == variables[name].dtype
        np.testing.assert_array_equal(loaded[name], variables[name], err_msg=name)


def test_convert_checkpoint_end_to_end(tmp_path):
    """Miniature TF1-format checkpoint fixture (2-unit model, both layouts):
    convert -> forward equals forward with the source params."""
    from clair_tpu.io.tfckpt import save_variables
    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.models.convert_tf1 import (
        convert_tf1_checkpoint,
        cudnn_blob_from_lstm,
    )

    config = ModelConfig(lstm1_num_units=2, lstm2_num_units=2)
    params = init_params(jax.random.PRNGKey(5), config)
    x = np.random.RandomState(1).rand(2, 33, 8, 4).astype(np.float32)
    golden = [np.asarray(a) for a in forward(params, x, config)]

    for layout in ("compatible", "blob"):
        tf_vars = tf1_vars_from_params(params, config)
        if layout == "blob":
            for scope, sub, input_dim in (
                ("LSTM1", params["lstm1"], config.feature_dim),
                ("LSTM2", params["lstm2"], 4),
            ):
                base = f"{scope}/stack_bidirectional_rnn/cell_0/bidirectional_rnn"
                for d in ("fw", "bw"):
                    del tf_vars[f"{base}/{d}/cudnn_compatible_lstm_cell/kernel"]
                    del tf_vars[f"{base}/{d}/cudnn_compatible_lstm_cell/bias"]
                tf_vars[f"{scope}/cudnn_lstm/opaque_kernel"] = cudnn_blob_from_lstm(
                    sub, input_dim, 2
                )
        prefix = str(tmp_path / f"tf_{layout}" / "model")
        import os

        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        save_variables(prefix, tf_vars)
        out_path = str(tmp_path / f"converted_{layout}.ckpt")
        convert_tf1_checkpoint(prefix, out_path, config)
        loaded, _meta = load_checkpoint(out_path)
        got = [np.asarray(a) for a in forward(loaded, x, config)]
        for a, b in zip(golden, got):
            np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=layout)


def test_convert_tf1_cli(tmp_path):
    from clair_tpu.cli import main as cli_main
    from clair_tpu.io.tfckpt import save_variables
    from clair_tpu.models.checkpoint import load_checkpoint

    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(6), config)
    prefix = str(tmp_path / "model")
    save_variables(prefix, tf1_vars_from_params(params, config))
    out = str(tmp_path / "converted.ckpt")
    cli_main(["convert_tf1", "--chkpnt_fn", prefix, "--output_fn", out])
    loaded, meta = load_checkpoint(out)
    assert meta.get("source") == prefix
