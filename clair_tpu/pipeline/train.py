"""Training loop: blocked-bin epochs with adaptive-decay or cyclical LR.

Replaces the TF1 session loops (/root/reference/clair/train.py:78-263 and
train_clr.py) with a jitted (optionally pjit-sharded) train step. Host-side
block decompression overlaps device compute through JAX async dispatch: the
loss of batch N is only synced after batch N+1 has been dispatched.

Semantics preserved from the reference:
- 90/10 train/val split by index (or explicit train/val bins)
- per-epoch shuffle of the TRAIN blocks only (ref train.py:256-259)
- checkpoint every epoch as prefix-%06d, resume epoch parsed from the path
- adaptive LR x0.1 decay driven by val-loss heuristics, up to 3 switches
- CLR mode: fixed 30-epoch horizon, per-iteration cyclical LR
- final: restore best-val epoch and run the evaluator
"""

from __future__ import annotations

import dataclasses
import logging
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np

from clair_tpu.data.bins import BinDataset, EpochBatches
from clair_tpu.models.checkpoint import (
    checkpoint_path,
    epoch_from_path,
    load_checkpoint,
    save_checkpoint,
)
from clair_tpu.models.clair import init_params
from clair_tpu.params import (
    CLR_MAX_LR,
    CLR_STEPSIZE_CONSTANT,
    INITIAL_LEARNING_RATE,
    L2_REGULARIZATION_LAMBDA,
    L2_REGULARIZATION_LAMBDA_DECAY,
    LEARNING_RATE_DECAY,
    MAX_EPOCH,
    MAX_LEARNING_RATE_SWITCH,
    PREDICT_BATCH_SIZE,
    TRAIN_BATCH_SIZE,
    TRAINING_DATASET_PERCENTAGE,
    ModelConfig,
)
from clair_tpu.parallel.sharding import (
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from clair_tpu.pipeline.schedules import AdaptiveDecay, CyclicalLR

logging.basicConfig(format="%(message)s", level=logging.INFO)
logger = logging.getLogger(__name__)


@dataclass
class TrainingConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    learning_rate: float = INITIAL_LEARNING_RATE
    l2_lambda: float = L2_REGULARIZATION_LAMBDA
    l2_lambda_decay: float = L2_REGULARIZATION_LAMBDA_DECAY
    lr_decay: float = LEARNING_RATE_DECAY
    output_prefix: Optional[str] = None
    init_checkpoint: Optional[str] = None
    train_batch_size: int = TRAIN_BATCH_SIZE
    val_batch_size: int = PREDICT_BATCH_SIZE
    # "adaptive" (train.py), a CLR mode "tri" / "tri2" / "exp"
    # (train_clr.py), or "fixed" (constant LR for max_epochs)
    schedule: str = "adaptive"
    clr_max_lr: float = CLR_MAX_LR
    max_epochs: int = MAX_EPOCH
    # optional safety cap for the adaptive schedule (the reference trains
    # until 3 LR switches with no epoch limit)
    hard_max_epochs: Optional[int] = None
    checkpoint_every: int = 1
    # optional jax.sharding.Mesh: batch shards over 'data' (ICI all-reduce
    # for gradients), dense trunk over 'model'; batches pad to the data-axis
    # multiple with zero-weight rows
    mesh: Optional[object] = None
    seed: int = 0
    evaluate_at_end: bool = True
    # bf16 compute is the TRAINING DEFAULT (f32 master weights, f32 loss
    # accumulation — losses.py upcasts logits — and f32 cell state in the
    # recurrence): measured 352k samples/s at batch 10k on a v5e with the
    # stream kernel vs 170k for f32+remat, and the full production-recipe
    # held-out run (2 Mb ONT, 19,986 variants, batch 10,000 + adaptive
    # decay) scores recall 1.000 / precision 0.902 / 147/147 exact —
    # matching-or-beating the f32 run's 1.000 / 0.880 / 147/147
    # (docs/ACCURACY.md). "float32" remains the escape hatch for exact
    # numeric parity with converted reference checkpoints.
    train_compute_dtype: str = "bfloat16"
    # block-decompression threads for the epoch feed (None = one per spare
    # core, capped at 4; 0 = inline). One thread decodes ~173k samples/s
    # (int16 blocks) — below the bf16 step's 242k, so multi-core hosts
    # need the pool to keep the chip fed.
    decompress_workers: Optional[int] = None
    # restore the best-validation-loss epoch at the end (the reference's
    # behavior, train.py:364-372). With tiny validation sets the val loss
    # is too noisy to pick by — the demo disables this and keeps the final
    # epoch (measured: +0.03-0.04 site recall at demo scale).
    restore_best: bool = True
    # streaming-grid Pallas BiLSTM for the train/val steps
    # (ops/pallas_bilstm_stream.py, measured ~2x over the lax.scan at the
    # production batch). None = auto: on for reduced-precision TPU
    # training — meshed steps run it under shard_map over the 'data' axis
    # (bilstm_train_stream_meshed) — unless the model config already
    # picked another BiLSTM kernel; True forces it on; False forces the
    # scan.
    use_stream_bilstm: Optional[bool] = None


@dataclass
class TrainResult:
    params: dict
    training_losses: list
    validation_losses: list
    best_epoch: int


def train_model(dataset: BinDataset, config: TrainingConfig) -> TrainResult:
    from clair_tpu.utils.jaxcache import enable as enable_jax_cache

    enable_jax_cache()
    model_config = dataclasses.replace(
        config.model, compute_dtype=config.train_compute_dtype
    )
    use_stream = config.use_stream_bilstm
    if use_stream is None:
        # auto: reduced-precision TPU training — single-device AND meshed
        # (the meshed step runs the kernel under shard_map over 'data',
        # models/clair.py forward_logits + bilstm_train_stream_meshed).
        # float32 compute is the documented exact-parity escape hatch, so
        # auto never swaps its accumulation order for the kernel's; f32
        # users who want the kernel (216k vs 170k samples/s) opt in with
        # use_stream_bilstm=True
        use_stream = (
            jax.default_backend() == "tpu"
            and config.train_compute_dtype != "float32"
            and not model_config.use_pallas_bilstm
            and not model_config.use_pallas_train_bilstm
        )
    if use_stream:
        model_config = dataclasses.replace(
            model_config, use_pallas_stream_bilstm=True
        )
    # param init stays on the default threefry stream (checkpoint-stable);
    # the per-step dropout stream uses the rbg implementation — XLA's
    # hardware RngBitGenerator. The lstm2 dropout mask is (B, 33, 256)
    # ~86M bits/step at batch 10k, and threefry generation alone measured
    # 4.25 ms of the 32 ms step on a v5e (tools/step_decomp.py); rbg cuts
    # the mask cost to noise. Streams stay deterministic per seed.
    rng = jax.random.key(config.seed, impl="rbg")
    init_rng = jax.random.PRNGKey(config.seed + 1)

    shard = None
    pid, nproc = 0, 1
    if config.mesh is not None:
        from clair_tpu.parallel.distributed import (
            check_multihost_mesh,
            host_replicated,
            local_stripe,
            make_global_array,
            process_info,
        )
        from clair_tpu.parallel.sharding import (
            batch_sharding,
            param_shardings,
            replicate,
        )

        pid, nproc = process_info()
        data_size = config.mesh.shape["data"]
        if nproc > 1:
            check_multihost_mesh(config.mesh, nproc)

    if config.init_checkpoint is not None:
        if nproc > 1:
            # checkpoints are written by process 0 only (no shared-FS
            # assumption): resume loads there and broadcasts params AND
            # the epoch counter; other hosts contribute only the pytree
            # structure (their path string is never opened or parsed)
            from clair_tpu.parallel.distributed import broadcast_checkpoint

            params, epoch0 = broadcast_checkpoint(
                config.init_checkpoint, init_params(init_rng, model_config)
            )
            start_epoch = epoch0 + 1
        else:
            params, _ = load_checkpoint(config.init_checkpoint)
            start_epoch = epoch_from_path(config.init_checkpoint) + 1
    else:
        params = init_params(init_rng, model_config)
        start_epoch = 1

    optimizer = make_optimizer(model_config.optimizer_name, config.learning_rate)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model_config, optimizer, config.mesh)
    eval_step = make_eval_step(model_config, config.mesh)

    if config.mesh is not None:
        params = jax.device_put(params, param_shardings(params, config.mesh))
        opt_state = jax.device_put(
            opt_state, jax.tree.map(lambda _: replicate(config.mesh), opt_state)
        )
        x_sharding = batch_sharding(config.mesh, 4)
        flat_sharding = batch_sharding(config.mesh, 2)
        w_sharding = batch_sharding(config.mesh, 1)

        def shard(x, y):
            # every process sees the same GLOBAL batch (identical epoch
            # stream) and ships only its row stripe — multi-process runs
            # consume batches bit-identical to the single-process run
            n = len(x)
            padded = -(-n // data_size) * data_size
            w = np.zeros(padded, dtype=np.float32)
            w[:n] = 1.0
            if padded != n:
                x = np.concatenate([x, np.zeros((padded - n,) + x.shape[1:], x.dtype)])
                y = np.concatenate([y, np.zeros((padded - n,) + y.shape[1:], y.dtype)])
            if nproc == 1:
                return (
                    jax.device_put(x, x_sharding),
                    jax.device_put(y, flat_sharding),
                    jax.device_put(w, w_sharding),
                )
            rows = local_stripe(padded, pid, nproc)
            return (
                make_global_array(x_sharding, x[rows]),
                make_global_array(flat_sharding, y[rows]),
                make_global_array(w_sharding, w[rows]),
            )

    n_train = dataset.train_size_hint or int(
        dataset.dataset_size * TRAINING_DATASET_PERCENTAGE
    )
    n_val = dataset.dataset_size - n_train
    n_train_blocks = int(n_train / dataset.block_size)
    block_order = np.arange(dataset.n_blocks)
    # dedicated RNG: the per-epoch block shuffle is reproducible from
    # config.seed, which also keeps multi-process epoch streams identical
    shuffle_rs = np.random.RandomState(config.seed)
    best_snapshot = None  # (val_loss, epoch, host_params) for nproc > 1

    learning_rate = config.learning_rate
    l2_lambda = config.l2_lambda
    decay = AdaptiveDecay(max_switches=MAX_LEARNING_RATE_SWITCH)
    clr = None
    if config.schedule not in ("adaptive", "fixed"):
        iterations_per_epoch = max(int(np.ceil(n_train / config.train_batch_size)), 1)
        clr = CyclicalLR(
            step_size=CLR_STEPSIZE_CONSTANT * iterations_per_epoch,
            max_lr=config.clr_max_lr,
            mode=config.schedule,
        )

    training_losses, validation_losses = [], []
    training_start = time.time()
    logger.info("[INFO] Start training... LR %.2e, L2 lambda %.2e", learning_rate, l2_lambda)

    epoch = start_epoch
    while True:
        epoch_start = time.time()
        train_loss_sum = 0.0
        val_loss_sum = 0.0
        component_sums = {k: 0.0 for k in ("gt21", "genotype", "indel_length_1", "indel_length_2", "l2_without_lambda")}

        pending = None  # (device_loss, is_training, components)
        batches = EpochBatches(
            dataset, block_order, n_train,
            config.train_batch_size, config.val_batch_size,
            decompress_workers=config.decompress_workers,
            # ship int16-packed blocks as stored: the jitted steps cast on
            # device (forward astype + losses.total_loss y upcast), so the
            # feed skips its costliest host op and halves the transfer
            cast_to_float32=False,
        )
        for x, y, is_training in batches:
            weights = None
            if shard is not None:
                x, y, weights = shard(np.asarray(x), np.asarray(y))
            if is_training:
                if clr is not None:
                    learning_rate = clr()
                    opt_state = set_learning_rate(opt_state, learning_rate)
                rng, step_rng = jax.random.split(rng)
                params, opt_state, loss, components = train_step(
                    params, opt_state, x, y, step_rng, np.float32(l2_lambda), weights
                )
            else:
                loss, components = eval_step(params, x, y, np.float32(l2_lambda), weights)
            # sync the PREVIOUS batch's loss -> device/host overlap
            if pending is not None:
                _accumulate(pending, component_sums)
                if pending[1]:
                    train_loss_sum += float(pending[0])
                else:
                    val_loss_sum += float(pending[0])
            pending = (loss, is_training, components)
        if pending is not None:
            _accumulate(pending, component_sums)
            if pending[1]:
                train_loss_sum += float(pending[0])
            else:
                val_loss_sum += float(pending[0])

        logger.info("%d Training loss: %s", epoch, train_loss_sum / max(n_train, 1))
        logger.info(
            "%d Validation loss (Total/Base/Genotype/Indel_1_2): %s\t%s\t%s\t%s\t%s",
            epoch,
            val_loss_sum / max(n_val, 1),
            component_sums["gt21"] / max(n_val, 1),
            component_sums["genotype"] / max(n_val, 1),
            component_sums["indel_length_1"] / max(n_val, 1),
            component_sums["indel_length_2"] / max(n_val, 1),
        )
        logger.info("[INFO] Epoch time elapsed: %.2f s", time.time() - epoch_start)
        training_losses.append((train_loss_sum, epoch))
        validation_losses.append((val_loss_sum, epoch))

        is_last = (config.schedule == "fixed" and epoch >= config.max_epochs) or (
            config.schedule not in ("adaptive", "fixed") and epoch >= config.max_epochs
        )
        if nproc > 1 and config.restore_best and (
            best_snapshot is None or val_loss_sum < best_snapshot[0]
        ):
            best_snapshot = (
                val_loss_sum, epoch, host_replicated(params, config.mesh)
            )
        if config.output_prefix is not None and pid == 0 and (
            epoch % config.checkpoint_every == 0 or is_last
        ):
            ckpt_params = params
            if nproc > 1:
                ckpt_params = (
                    best_snapshot[2]
                    if best_snapshot is not None and best_snapshot[1] == epoch
                    else host_replicated(params, config.mesh)
                )
            save_checkpoint(
                checkpoint_path(config.output_prefix, epoch), ckpt_params,
                extra={"epoch": epoch, "learning_rate": learning_rate},
            )

        if config.schedule == "fixed":
            if epoch >= config.max_epochs:
                break
        elif clr is None:
            should_stop, did_decay = decay.observe(val_loss_sum, epoch)
            if should_stop:
                break
            if config.hard_max_epochs is not None and epoch >= config.hard_max_epochs:
                break
            if did_decay:
                learning_rate *= config.lr_decay
                l2_lambda *= config.l2_lambda_decay
                opt_state = set_learning_rate(opt_state, learning_rate)
                logger.info("[INFO] New learning rate: %.2e", learning_rate)
        else:
            if epoch >= config.max_epochs:
                break

        epoch += 1
        # shuffle the train blocks only (ref train.py:256)
        block_order = _shuffle_first_n(block_order, n_train_blocks, shuffle_rs)

    logger.info("[INFO] Training time elapsed: %.2f s", time.time() - training_start)

    import os

    if nproc > 1:
        # no shared-filesystem assumption: restore-best uses the in-memory
        # snapshot, and all processes end with identical host params
        best_epoch = sorted(validation_losses)[0][1]
        logger.info("[INFO] Best validation loss at epoch: %d", best_epoch)
        if config.restore_best and best_snapshot is not None:
            best_epoch = best_snapshot[1]
            params = best_snapshot[2]
        else:
            best_epoch = epoch
            params = host_replicated(params, config.mesh)
    else:
        saved = {
            e for _, e in validation_losses
            if config.output_prefix is not None
            and os.path.exists(checkpoint_path(config.output_prefix, e))
        }
        restorable = [v for v in validation_losses if v[1] in saved] or validation_losses
        best_epoch = sorted(restorable)[0][1]
        logger.info("[INFO] Best validation loss at epoch: %d", best_epoch)
        if not config.restore_best:
            best_epoch = epoch  # keep the final-epoch parameters
        elif config.output_prefix is not None and best_epoch in saved:
            params, _ = load_checkpoint(checkpoint_path(config.output_prefix, best_epoch))
    if config.evaluate_at_end and pid == 0:
        from clair_tpu.pipeline.evaluate import evaluate_model

        evaluate_model(params, model_config, dataset)

    return TrainResult(
        params=params,
        training_losses=training_losses,
        validation_losses=validation_losses,
        best_epoch=best_epoch,
    )


def _accumulate(pending, sums):
    _, is_training, components = pending
    if not is_training:
        for key in sums:
            sums[key] += float(components[key])


def _shuffle_first_n(array: np.ndarray, n: int, rs: np.random.RandomState) -> np.ndarray:
    array = array.copy()
    if len(array) <= n:
        rs.shuffle(array)
        return array
    head = array[:n]
    rs.shuffle(head)
    array[:n] = head
    return array
