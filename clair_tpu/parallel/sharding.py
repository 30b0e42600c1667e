"""Sharding strategy + the jitted data/model-parallel training step.

Parallelism design (replaces the reference's process-level parallelism,
SURVEY.md §2 "Parallelism strategies"):

- **data axis**: the batch is sharded; XLA inserts the gradient all-reduce
  over ICI. This is the workhorse — training batches are 10k samples.
- **model axis** (optional): the dense trunk after the BiLSTM is sharded
  Megatron-style — L4 column-parallel (output dim), L5 stems row-parallel
  (input dim) — so activations psum once between L5 and the heads. The
  BiLSTM itself is replicated: at 128 hidden units it is far below the
  size where weight sharding pays for its collectives.

All functions take the param pytree produced by models.clair.init_params.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clair_tpu.models.clair import forward_logits
from clair_tpu.models.losses import total_loss
from clair_tpu.params import GRADIENT_CLIP_NORM, ModelConfig


def param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree for the model parameters on a (data, model) mesh."""

    def spec_for(path: Tuple, leaf) -> P:
        keys = [getattr(k, "key", "") for k in path]
        name, leaf_name = keys[0], keys[-1]
        if name == "l4":
            # column-parallel: shard the output dim
            return P(None, "model") if leaf_name == "w" else P("model")
        if name.startswith("l5_"):
            # row-parallel: shard the input dim; bias replicated
            return P("model", None) if leaf_name == "w" else P(None)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_optimizer(
    optimizer_name: str = "Adam",
    learning_rate: float = 1e-3,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Gradient clip (global-norm 5.0, ref model.py:727) + Adam or SGD-M,
    with the learning rate exposed as a mutable hyperparameter."""
    if optimizer_name == "Adam":
        inner = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    elif optimizer_name == "SGDM":
        inner = optax.inject_hyperparams(optax.sgd)(
            learning_rate=learning_rate, momentum=momentum
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer_name}")
    return optax.chain(optax.clip_by_global_norm(GRADIENT_CLIP_NORM), inner)


def set_learning_rate(opt_state, learning_rate: float):
    """Return opt_state with a new learning rate (inject_hyperparams slot)."""
    inner = opt_state[1]
    new_hyper = dict(inner.hyperparams)
    # host scalar (not a committed device array): replicates cleanly into
    # the jitted step in both single- and multi-process runs
    import numpy as np

    new_hyper["learning_rate"] = np.float32(learning_rate)
    return (opt_state[0], inner._replace(hyperparams=new_hyper))


def loss_fn(params, x, y, rng, config: ModelConfig, l2_lambda, deterministic=False,
            sample_weights=None, mesh=None):
    logits = forward_logits(
        params, x, config, deterministic=deterministic, rng=rng, mesh=mesh
    )
    return total_loss(
        logits,
        y,
        params,
        loss_function=config.loss_function,
        l2_lambda=l2_lambda,
        task_weights=config.task_loss_weights,
        sample_weights=sample_weights,
    )


def make_train_step(
    config: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted training step.

    With a mesh, inputs are expected batch-sharded on 'data' and params laid
    out per param_shardings; XLA inserts the ICI all-reduce for gradients
    and the model-axis psum for the sharded trunk.
    """

    def step(params, opt_state, x, y, rng, l2_lambda, sample_weights=None):
        (loss, components), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, y, rng, config, l2_lambda, False, sample_weights, mesh
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, components

    if mesh is None:
        return jax.jit(step)

    # Donate params/opt_state so the update is in-place in HBM.
    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(config: ModelConfig, mesh: Optional[Mesh] = None):
    """Jitted validation step: loss components without gradient/update."""

    def step(params, x, y, l2_lambda, sample_weights=None):
        loss, components = loss_fn(
            params, x, y, jax.random.PRNGKey(0), config, l2_lambda,
            deterministic=True, sample_weights=sample_weights, mesh=mesh,
        )
        return loss, components

    return jax.jit(step)


@functools.partial(jax.jit, static_argnums=(2,))
def shard_batch_pad(x: jnp.ndarray, n: int, pad_to: int) -> jnp.ndarray:
    """Pad the leading axis to pad_to (for fixed-shape sharded dispatch)."""
    pad = [(0, pad_to - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)
