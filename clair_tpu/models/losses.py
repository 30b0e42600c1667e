"""Loss functions: focal loss (default), per-class-weighted cross entropy,
L2 regularization, and the 5-term weighted total.

Reduction semantics match the reference exactly — every per-task loss is a
SUM over the batch (not a mean), which the LR constants are calibrated to
(/root/reference/clair/model.py:630-709, 783-805).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from clair_tpu.task.labels import (
    GENOTYPE_SPAN,
    GT21_SPAN,
    LENGTH1_SPAN,
    LENGTH2_SPAN,
)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-class focal loss, summed over batch and classes.

    Positive entries weight by (y - p)^gamma on log(p); negative entries by
    p^gamma on log(1 - p) (ref model.py:783-805). ``alpha`` in the reference
    signature is unused there, so it is omitted here. ``sample_weights``
    zeroes padded rows in sharded training.
    """
    p = jax.nn.softmax(logits, axis=-1)
    is_pos = labels > 0
    pos_sub = jnp.where(is_pos, labels - p, 0.0)
    neg_sub = jnp.where(is_pos, 0.0, p)
    per_entry = -(
        (pos_sub ** gamma) * jnp.log(jnp.clip(p, 1e-8, 1.0))
        + (neg_sub ** gamma) * jnp.log(jnp.clip(1.0 - p, 1e-8, 1.0))
    )
    if sample_weights is not None:
        per_entry = per_entry * sample_weights[:, None]
    return jnp.sum(per_entry)


def weighted_cross_entropy(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    epsilon: float = 1e-10,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-class-weighted CE over softmaxed probabilities, summed over batch
    (ref model.py:246-263 + reduce_sum at :638)."""
    per_example = -jnp.sum(labels * jnp.log(probs + epsilon) * class_weights, axis=-1)
    if sample_weights is not None:
        per_example = per_example * sample_weights
    return jnp.sum(per_example)


def _is_bias_leaf(path: Tuple) -> bool:
    return any(getattr(k, "key", None) == "b" for k in path)


def l2_regularization(params: Dict) -> jnp.ndarray:
    """sum(||w||^2 / 2) over all non-bias parameters (ref model.py:689-691)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in leaves:
        if not _is_bias_leaf(path):
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total


def total_loss(
    logits: Sequence[jnp.ndarray],
    y: jnp.ndarray,
    params: Dict,
    *,
    loss_function: str = "FocalLoss",
    l2_lambda: float = 0.005,
    task_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
    class_weights: Sequence[jnp.ndarray] | None = None,
    sample_weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of the 4 task losses + L2 (ref model.py:697-709).

    Returns (scalar, dict of unweighted components). ``sample_weights``
    zeroes padded rows (sharded training pads batches to the data-axis
    multiple).
    """
    spans = (GT21_SPAN, GENOTYPE_SPAN, LENGTH1_SPAN, LENGTH2_SPAN)
    # losses always accumulate in float32: with bfloat16 compute the network
    # emits bf16 logits, and a batch-summed focal loss over 10k rows would
    # lose ~8 bits of mantissa to the reduction otherwise
    logits = [lg.astype(jnp.float32) for lg in logits]
    # the feed may ship labels in their stored int16 packing (bins.py
    # cast_to_float32=False halves the host->device transfer); the one-hot
    # counts are small integers, exact in either dtype
    y = y.astype(jnp.float32)
    labels = [y[..., s[0]:s[1]] for s in spans]

    if loss_function == "CrossEntropy":
        if class_weights is None:
            class_weights = [jnp.ones(l.shape[-1]) for l in labels]
        task_losses = [
            weighted_cross_entropy(
                jax.nn.softmax(lg, axis=-1), lb, cw, sample_weights=sample_weights
            )
            for lg, lb, cw in zip(logits, labels, class_weights)
        ]
    else:
        task_losses = [
            focal_loss(lg, lb, sample_weights=sample_weights)
            for lg, lb in zip(logits, labels)
        ]

    l2_raw = l2_regularization(params)
    l2 = l2_raw * l2_lambda
    weights = jnp.asarray(task_weights)
    terms = jnp.stack([task_losses[0], task_losses[1], task_losses[2], task_losses[3], l2])
    loss = jnp.sum(weights * terms)
    components = {
        "gt21": task_losses[0],
        "genotype": task_losses[1],
        "indel_length_1": task_losses[2],
        "indel_length_2": task_losses[3],
        "l2_without_lambda": l2_raw,
        "l2": l2,
    }
    return loss, components
