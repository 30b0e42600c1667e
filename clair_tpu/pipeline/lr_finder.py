"""Learning-rate range finder.

One-epoch LR sweep from min_lr to max_lr with per-batch multi-head accuracy
tracking; the suggested range comes from the extrema of the accuracy-curve
derivative (ref /root/reference/clair/learning_rate_finder.py:76-84,
:225-258).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional

import jax
import numpy as np

from clair_tpu.data.bins import BinDataset, EpochBatches
from clair_tpu.models.clair import forward, init_params
from clair_tpu.params import (
    LR_FINDER_MAX_LR,
    LR_FINDER_MIN_LR,
    TRAIN_BATCH_SIZE,
    TRAINING_DATASET_PERCENTAGE,
    ModelConfig,
)
from clair_tpu.parallel.sharding import (
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from clair_tpu.pipeline.schedules import CyclicalLR
from clair_tpu.task.labels import split_label_vector

logger = logging.getLogger(__name__)


@dataclass
class LrFinderResult:
    learning_rates: List[float]
    accuracies: List[float]
    losses: List[float]
    suggested_min_lr: float = 0.0
    suggested_max_lr: float = 0.0


def _batch_accuracy(params, config, x, y, fn) -> float:
    """Mean over the 4 heads of per-batch argmax accuracy, with the
    indel-length pair order-normalized (ref learning_rate_finder.py:21-73)."""
    gt21_p, geno_p, vl1_p, vl2_p = (np.asarray(a) for a in fn(params, x))
    y_gt21, y_geno, y_vl1, y_vl2 = split_label_vector(y)
    acc_gt21 = float((gt21_p.argmax(-1) == y_gt21.argmax(-1)).mean())
    acc_geno = float((geno_p.argmax(-1) == y_geno.argmax(-1)).mean())
    t1, t2 = y_vl1.argmax(-1), y_vl2.argmax(-1)
    p1, p2 = vl1_p.argmax(-1), vl2_p.argmax(-1)
    acc_l1 = float((np.minimum(p1, p2) == np.minimum(t1, t2)).mean())
    acc_l2 = float((np.maximum(p1, p2) == np.maximum(t1, t2)).mean())
    return (acc_gt21 + acc_geno + acc_l1 + acc_l2) / 4.0


def find_learning_rate(
    dataset: BinDataset,
    model_config: ModelConfig = ModelConfig(),
    min_lr: float = LR_FINDER_MIN_LR,
    max_lr: float = LR_FINDER_MAX_LR,
    train_batch_size: int = TRAIN_BATCH_SIZE,
    output_path: Optional[str] = None,
    seed: int = 0,
) -> LrFinderResult:
    # rbg dropout stream, threefry init — matches pipeline/train.py
    rng = jax.random.key(seed, impl="rbg")
    init_rng = jax.random.PRNGKey(seed + 1)
    params = init_params(init_rng, model_config)
    optimizer = make_optimizer(model_config.optimizer_name, min_lr)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model_config, optimizer)
    predict = jax.jit(lambda p, x: forward(p, x, model_config))

    n_train = dataset.train_size_hint or int(
        dataset.dataset_size * TRAINING_DATASET_PERCENTAGE
    )
    iterations = max(int(np.ceil(n_train / train_batch_size)), 1)
    # a half 'tri' cycle sweeps min_lr -> max_lr linearly over the epoch
    clr = CyclicalLR(step_size=iterations, max_lr=max_lr, mode="tri", min_lr=min_lr)

    lrs, accs, losses = [], [], []
    batches = EpochBatches(
        dataset, np.arange(dataset.n_blocks), n_train, train_batch_size
    )
    for x, y, is_training in batches:
        if not is_training:
            break
        lr = clr()
        opt_state = set_learning_rate(opt_state, lr)
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss, _ = train_step(
            params, opt_state, x, y, step_rng, np.float32(0.0)
        )
        lrs.append(lr)
        losses.append(float(loss))
        accs.append(_batch_accuracy(params, model_config, x, y, predict))

    result = LrFinderResult(learning_rates=lrs, accuracies=accs, losses=losses)
    if len(accs) >= 2:
        derivative = np.diff(accs)
        result.suggested_min_lr = lrs[int(np.argmax(derivative))]
        result.suggested_max_lr = lrs[int(np.argmin(derivative))]

    if output_path is not None:
        with open(output_path, "w") as fh:
            fh.write("lr,accuracy,loss\n")
            for lr, acc, loss in zip(lrs, accs, losses):
                fh.write(f"{lr},{acc},{loss}\n")
            fh.write(f"# suggested min_lr {result.suggested_min_lr}\n")
            fh.write(f"# suggested max_lr {result.suggested_max_lr}\n")
    return result
