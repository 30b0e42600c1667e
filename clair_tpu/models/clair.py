"""The multi-task variant-calling network as a pure-JAX pytree model.

Structure replicates the reference "2BiLSTM" graph
(/root/reference/clair/model.py:400-622) but is built TPU-first:

  (B, 33, 8, 4) pileup tensor
    -> flatten base/channel axes -> (B, 33, 32)
    -> BiLSTM(128) -> BiLSTM(128) with dropout 0.5 between
    -> "slice dense" L3: an independent dense(33 -> 30) per feature column,
       expressed as ONE einsum (btf,ftu->buf) instead of the reference's 256
       separate unstacked dense layers — a single MXU-batched matmul
    -> flatten (B, 7680) -> dense L4 (192, selu, alpha-dropout 0.5)
    -> 4 head stems L5_* (96, selu, alpha-dropout 0.2)
    -> 4 output heads, each dense + SELU *then* softmax (the SELU-on-logits
       quirk is part of the trained-model contract, ref model.py:582-619)

Outputs: (gt21[21], genotype[3], indel_len_1[33], indel_len_2[33]) softmax
probability tensors.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from clair_tpu.models.bilstm import bilstm, init_bilstm_params
from clair_tpu.models.layers import alpha_dropout, dropout, he_fan_in, selu
from clair_tpu.params import ModelConfig


class ClairModel(NamedTuple):
    """Bundles a config with convenience constructors; parameters live in a
    plain dict pytree so they compose with jit/pjit/optax directly."""

    config: ModelConfig

    def init(self, rng: jax.Array) -> Dict:
        return init_params(rng, self.config)

    def apply(self, params, x, *, deterministic=True, rng=None):
        return forward(params, x, self.config, deterministic=deterministic, rng=rng)


def _dense_init(rng: jax.Array, in_dim: int, out_dim: int) -> Dict:
    return {
        "w": he_fan_in(rng, (in_dim, out_dim), jnp.float32),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def init_params(rng: jax.Array, config: ModelConfig = ModelConfig()) -> Dict:
    t, feat = config.no_of_positions, config.feature_dim
    h1, h2 = config.lstm1_num_units, config.lstm2_num_units
    l3_in = 2 * h2                      # 256 feature columns after BiLSTM2
    l3_flat = config.l3_num_units * l3_in

    keys = jax.random.split(rng, 12)
    return {
        "lstm1": init_bilstm_params(keys[0], feat, h1),
        "lstm2": init_bilstm_params(keys[1], 2 * h1, h2),
        "l3": {
            # per-feature-column dense over the time axis: (F, T, U)
            "w": he_fan_in(keys[2], (l3_in, t, config.l3_num_units), jnp.float32),
            "b": jnp.zeros((l3_in, config.l3_num_units), jnp.float32),
        },
        "l4": _dense_init(keys[3], l3_flat, config.l4_num_units),
        "l5_1": _dense_init(keys[4], config.l4_num_units, config.l5_num_units),
        "l5_2": _dense_init(keys[5], config.l4_num_units, config.l5_num_units),
        "l5_3": _dense_init(keys[6], config.l4_num_units, config.l5_num_units),
        "l5_4": _dense_init(keys[7], config.l4_num_units, config.l5_num_units),
        "head_gt21": _dense_init(keys[8], config.l5_num_units, config.output_gt21_shape),
        "head_genotype": _dense_init(keys[9], config.l5_num_units, config.output_genotype_shape),
        "head_len1": _dense_init(keys[10], config.l5_num_units, config.output_indel_length_shape_1),
        "head_len2": _dense_init(keys[11], config.l5_num_units, config.output_indel_length_shape_2),
    }


def _dense(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def forward_logits(
    params: Dict,
    x: jnp.ndarray,
    config: ModelConfig = ModelConfig(),
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward pass returning pre-softmax (SELU-activated) head outputs.

    ``mesh``: pass the active jax.sharding.Mesh when the surrounding step
    is batch-sharded AND a Pallas BiLSTM kernel is selected — pallas_call
    is opaque to GSPMD, so the kernel runs under shard_map over the
    mesh's 'data' axis instead (bilstm_train_stream_meshed). The GSPMD
    scan path ignores it."""
    if not deterministic and rng is None:
        raise ValueError("training-mode forward needs an rng for dropout")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_lstm1, k_lstm2, k_l4, k5_1, k5_2, k5_3, k5_4 = jax.random.split(rng, 7)

    b = x.shape[0]
    compute_dtype = jnp.dtype(config.compute_dtype)
    if compute_dtype != jnp.float32:
        # true reduced-precision compute: cast weights once at use; the
        # softmax/logits stay in the compute dtype and are upcast by callers.
        # jnp.asarray (not .astype) so numpy-held params (e.g. converted
        # checkpoints) become jnp arrays — numpy ml_dtypes bfloat16 leaves
        # would otherwise re-promote matmuls to float32
        params = jax.tree.map(lambda p: jnp.asarray(p, compute_dtype), params)
    h = x.reshape(b, config.no_of_positions, config.feature_dim).astype(compute_dtype)

    lstm = bilstm
    if config.use_pallas_bilstm and jax.default_backend() == "tpu":
        from clair_tpu.ops.pallas_bilstm import bilstm_pallas

        lstm = bilstm_pallas
    elif config.use_pallas_stream_bilstm:
        from clair_tpu.ops import pallas_bilstm_stream as _stream

        # engages on TPU, or anywhere in interpret mode (CPU-mesh tests
        # and the multichip dryrun flip _stream._INTERPRET)
        if jax.default_backend() == "tpu" or _stream._INTERPRET:
            lstm = (
                _stream.bilstm_train_stream if mesh is None
                else _stream.bilstm_train_stream_meshed(mesh)
            )
    elif config.use_pallas_train_bilstm and jax.default_backend() == "tpu":
        if compute_dtype != jnp.float32:
            raise ValueError(
                "use_pallas_train_bilstm is float32-only (the kernel "
                "computes and returns f32, which would silently defeat "
                f"compute_dtype={config.compute_dtype}); unset one of them"
            )
        from clair_tpu.ops.pallas_bilstm_train import bilstm_train_pallas

        lstm = bilstm_train_pallas

    h = lstm(params["lstm1"], h)
    # lstm1 dropout rate is 0.0 by structure; keep the hook for configs
    if not deterministic and config.lstm1_dropout_rate > 0:
        h = dropout(k_lstm1, h, config.lstm1_dropout_rate)

    h = lstm(params["lstm2"], h)
    if not deterministic and config.lstm2_dropout_rate > 0:
        h = dropout(k_lstm2, h, config.lstm2_dropout_rate)

    # L3 slice-dense: independent (T -> U) map per feature column, one einsum
    l3 = jnp.einsum("btf,ftu->buf", h, params["l3"]["w"])
    l3 = selu(l3 + params["l3"]["b"].T[None])        # bias (F,U) -> (1,U,F)
    l3 = l3.reshape(b, -1)                            # (B, U*F) row-major

    l4 = selu(_dense(params["l4"], l3))
    if not deterministic and config.l4_dropout_rate > 0:
        l4 = alpha_dropout(k_l4, l4, config.l4_dropout_rate)

    def stem(p, key):
        s = selu(_dense(p, l4))
        if not deterministic and config.l5_dropout_rate > 0:
            s = alpha_dropout(key, s, config.l5_dropout_rate)
        return s

    s1, s2, s3, s4 = (
        stem(params["l5_1"], k5_1),
        stem(params["l5_2"], k5_2),
        stem(params["l5_3"], k5_3),
        stem(params["l5_4"], k5_4),
    )

    # heads apply SELU before softmax (trained-model contract)
    return (
        selu(_dense(params["head_gt21"], s1)),
        selu(_dense(params["head_genotype"], s2)),
        selu(_dense(params["head_len1"], s3)),
        selu(_dense(params["head_len2"], s4)),
    )


def forward(
    params: Dict,
    x: jnp.ndarray,
    config: ModelConfig = ModelConfig(),
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward pass returning the four softmax probability tensors (always
    float32 — the decode lattice consumes them on host)."""
    logits = forward_logits(
        params, x, config, deterministic=deterministic, rng=rng, mesh=mesh
    )
    return tuple(
        jax.nn.softmax(l.astype(jnp.float32), axis=-1) for l in logits
    )


def forward_activations(
    params: Dict,
    x: jnp.ndarray,
    config: ModelConfig = ModelConfig(),
) -> Dict[str, jnp.ndarray]:
    """Named intermediate activations (the reference's --activation_only
    layer dump, ref call_var.py:1239-1273 / model.py layers list)."""
    b = x.shape[0]
    h = x.reshape(b, config.no_of_positions, config.feature_dim).astype(jnp.float32)
    acts: Dict[str, jnp.ndarray] = {"input": h}
    h = bilstm(params["lstm1"], h)
    acts["lstm1"] = h
    h = bilstm(params["lstm2"], h)
    acts["lstm2"] = h
    l3 = jnp.einsum("btf,ftu->buf", h, params["l3"]["w"])
    l3 = selu(l3 + params["l3"]["b"].T[None])
    acts["l3"] = l3
    l4 = selu(_dense(params["l4"], l3.reshape(b, -1)))
    acts["l4"] = l4
    for key in ("l5_1", "l5_2", "l5_3", "l5_4"):
        acts[key] = selu(_dense(params[key], l4))
    heads = (
        ("gt21", "head_gt21", "l5_1"),
        ("genotype", "head_genotype", "l5_2"),
        ("indel_length_1", "head_len1", "l5_3"),
        ("indel_length_2", "head_len2", "l5_4"),
    )
    for name, head_key, stem_key in heads:
        acts[name] = jax.nn.softmax(selu(_dense(params[head_key], acts[stem_key])), axis=-1)
    return acts
