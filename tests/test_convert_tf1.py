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
