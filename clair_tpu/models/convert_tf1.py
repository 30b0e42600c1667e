"""TF1 checkpoint -> clair_tpu params converter.

The reference saves tf.train.Saver triplets with these trainable-variable
scopes (ref /root/reference/clair/model.py:280-303, 237-243, 464-620):

  LSTM{1,2}/stack_bidirectional_rnn/cell_0/bidirectional_rnn/{fw,bw}/
      cudnn_compatible_lstm_cell/{kernel,bias}          (CPU training path)
  L3/Unit_{i}/{kernel,bias}   i in 0..255 (slice-dense per feature column)
  L4/{kernel,bias}
  L5_{1..4}/{kernel,bias}
  Prediction/Y_base_change_logits/{kernel,bias}
  Prediction/Y_genotype_logits/{kernel,bias}
  Prediction/Y_indel_length_logits_{1,2}/{kernel,bias}

Layout conversions performed:
- CudnnCompatibleLSTMCell kernels are (F+H, 4H) with TF's BasicLSTMCell
  gate order (i, j, f, o) and zero forget bias; we split rows into W/U and
  reorder gate columns to this framework's (i, f, g, o).
- L3's 256 per-unit (33, 30) kernels stack into the single (256, 33, 30)
  einsum weight; biases into (256, 30).
- Dense kernels/biases map 1:1.

``load_tf1_variables`` reads an actual TF checkpoint when tensorflow is
importable (not the case in this image); ``params_from_tf1_vars`` operates
on a plain {name: ndarray} dict so the mapping is testable without TF.
GPU-trained checkpoints store an opaque CudnnLSTM blob; convert those once
with TF's cudnn_rnn canonical-weight export, then feed the canonical dict
here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from clair_tpu.params import ModelConfig

_TF_GATE_ORDER = ("i", "j", "f", "o")   # TF BasicLSTMCell
_OUR_GATE_ORDER = ("i", "f", "j", "o")  # (i, f, g, o)


def _reorder_gates(kernel_4h: np.ndarray, hidden: int) -> np.ndarray:
    """Reorder the last axis from TF (i,j,f,o) to ours (i,f,g,o)."""
    blocks = {
        name: kernel_4h[..., k * hidden:(k + 1) * hidden]
        for k, name in enumerate(_TF_GATE_ORDER)
    }
    return np.concatenate([blocks[name] for name in _OUR_GATE_ORDER], axis=-1)


def _lstm_direction(tf_vars: Dict[str, np.ndarray], scope: str, input_dim: int, hidden: int):
    kernel = np.asarray(tf_vars[scope + "/kernel"], dtype=np.float32)
    bias = np.asarray(tf_vars[scope + "/bias"], dtype=np.float32)
    if kernel.shape != (input_dim + hidden, 4 * hidden):
        raise ValueError(f"{scope}/kernel has shape {kernel.shape}")
    w = _reorder_gates(kernel[:input_dim], hidden)
    u = _reorder_gates(kernel[input_dim:], hidden)
    b = _reorder_gates(bias[None], hidden)[0]
    return {"w": w, "u": u, "b": b}


def params_from_tf1_vars(
    tf_vars: Dict[str, np.ndarray], config: ModelConfig = ModelConfig()
) -> Dict:
    """Build the clair_tpu param pytree from a TF1 variable dict."""
    feat = config.feature_dim
    h1, h2 = config.lstm1_num_units, config.lstm2_num_units
    l3_in = 2 * h2

    def lstm(scope: str, input_dim: int, hidden: int):
        base = f"{scope}/stack_bidirectional_rnn/cell_0/bidirectional_rnn"
        return {
            "fw": _lstm_direction(
                tf_vars, base + "/fw/cudnn_compatible_lstm_cell", input_dim, hidden
            ),
            "bw": _lstm_direction(
                tf_vars, base + "/bw/cudnn_compatible_lstm_cell", input_dim, hidden
            ),
        }

    l3_w = np.stack(
        [np.asarray(tf_vars[f"L3/Unit_{i}/kernel"], dtype=np.float32) for i in range(l3_in)]
    )
    l3_b = np.stack(
        [np.asarray(tf_vars[f"L3/Unit_{i}/bias"], dtype=np.float32) for i in range(l3_in)]
    )

    def dense(scope: str):
        return {
            "w": np.asarray(tf_vars[scope + "/kernel"], dtype=np.float32),
            "b": np.asarray(tf_vars[scope + "/bias"], dtype=np.float32),
        }

    return {
        "lstm1": lstm("LSTM1", feat, h1),
        "lstm2": lstm("LSTM2", 2 * h1, h2),
        "l3": {"w": l3_w, "b": l3_b},
        "l4": dense("L4"),
        "l5_1": dense("L5_1"),
        "l5_2": dense("L5_2"),
        "l5_3": dense("L5_3"),
        "l5_4": dense("L5_4"),
        "head_gt21": dense("Prediction/Y_base_change_logits"),
        "head_genotype": dense("Prediction/Y_genotype_logits"),
        "head_len1": dense("Prediction/Y_indel_length_logits_1"),
        "head_len2": dense("Prediction/Y_indel_length_logits_2"),
    }


def tf1_vars_from_params(params: Dict, config: ModelConfig = ModelConfig()) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests and exporting)."""
    h1, h2 = config.lstm1_num_units, config.lstm2_num_units

    def inverse_gates(kernel_4h: np.ndarray, hidden: int) -> np.ndarray:
        blocks = {
            name: kernel_4h[..., k * hidden:(k + 1) * hidden]
            for k, name in enumerate(_OUR_GATE_ORDER)
        }
        return np.concatenate([blocks[name] for name in _TF_GATE_ORDER], axis=-1)

    out: Dict[str, np.ndarray] = {}

    def put_lstm(scope: str, sub: Dict, hidden: int):
        base = f"{scope}/stack_bidirectional_rnn/cell_0/bidirectional_rnn"
        for direction in ("fw", "bw"):
            d = sub[direction]
            kernel = np.concatenate([np.asarray(d["w"]), np.asarray(d["u"])], axis=0)
            out[f"{base}/{direction}/cudnn_compatible_lstm_cell/kernel"] = inverse_gates(
                kernel, hidden
            )
            out[f"{base}/{direction}/cudnn_compatible_lstm_cell/bias"] = inverse_gates(
                np.asarray(d["b"])[None], hidden
            )[0]

    put_lstm("LSTM1", params["lstm1"], h1)
    put_lstm("LSTM2", params["lstm2"], h2)
    l3_w, l3_b = np.asarray(params["l3"]["w"]), np.asarray(params["l3"]["b"])
    for i in range(l3_w.shape[0]):
        out[f"L3/Unit_{i}/kernel"] = l3_w[i]
        out[f"L3/Unit_{i}/bias"] = l3_b[i]
    for scope, key in (
        ("L4", "l4"), ("L5_1", "l5_1"), ("L5_2", "l5_2"),
        ("L5_3", "l5_3"), ("L5_4", "l5_4"),
        ("Prediction/Y_base_change_logits", "head_gt21"),
        ("Prediction/Y_genotype_logits", "head_genotype"),
        ("Prediction/Y_indel_length_logits_1", "head_len1"),
        ("Prediction/Y_indel_length_logits_2", "head_len2"),
    ):
        out[scope + "/kernel"] = np.asarray(params[key]["w"])
        out[scope + "/bias"] = np.asarray(params[key]["b"])
    return out


def load_tf1_variables(checkpoint_path: str) -> Dict[str, np.ndarray]:
    """Read all variables from a TF1 checkpoint (requires tensorflow)."""
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "tensorflow is required to read TF1 checkpoints; extract the "
            "variables elsewhere and use params_from_tf1_vars on the dict"
        ) from exc
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(checkpoint_path)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


def convert_tf1_checkpoint(
    checkpoint_path: str, output_path: str, config: ModelConfig = ModelConfig()
) -> None:
    from clair_tpu.models.checkpoint import save_checkpoint

    params = params_from_tf1_vars(load_tf1_variables(checkpoint_path), config)
    save_checkpoint(output_path, params, extra={"source": checkpoint_path})
