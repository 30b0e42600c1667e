"""Training-stack tests: bin format round trips, epoch iteration semantics,
schedules, checkpointing, a short end-to-end training run, evaluate and the
LR finder on a synthetic separable dataset."""

import numpy as np
import pytest

from clair_tpu.data.bins import (
    BinDataset,
    EpochBatches,
    build_bin_from_tensors,
    combine_bins,
    load_bin,
    load_train_val_bins,
    write_bin,
    _pack,
)
from clair_tpu.data.tensor_stream import tensor_line_from
from clair_tpu.models.checkpoint import (
    checkpoint_path,
    epoch_from_path,
    load_checkpoint,
    save_checkpoint,
)
from clair_tpu.params import ModelConfig
from clair_tpu.pipeline.schedules import AdaptiveDecay, CyclicalLR
from clair_tpu.task.gt21 import GT21

SEQ = "ACGTACGTACGTACGTAGGTACGTACGTACGTA"


def _make_dataset(n=40, block_size=8, seed=0):
    rs = np.random.RandomState(seed)
    xs = rs.rand(n, 33, 8, 4).astype(np.float32)
    ys = np.zeros((n, 90), dtype=np.float32)
    # half hom-ref AA sites, half hom GG SNPs, recoverable from x[...,0] sign
    for i in range(n):
        if i % 2 == 0:
            ys[i, GT21.AA] = 1.0
            ys[i, 21 + 0] = 1.0
            xs[i, :, :, 0] += 1.0
        else:
            ys[i, GT21.GG] = 1.0
            ys[i, 21 + 1] = 1.0
            xs[i, :, :, 0] -= 1.0
        ys[i, 24 + 16] = 1.0
        ys[i, 57 + 16] = 1.0
    x_blocks, y_blocks, pos_blocks = [], [], []
    for off in range(0, n, block_size):
        x_blocks.append(_pack(xs[off:off + block_size]))
        y_blocks.append(_pack(ys[off:off + block_size]))
        pos_blocks.append(_pack(np.array([f"chr1:{off + j}" for j in range(min(block_size, n - off))])))
    return BinDataset(n, x_blocks, y_blocks, pos_blocks, block_size), xs, ys


def test_bin_roundtrip(tmp_path):
    ds, xs, ys = _make_dataset()
    path = str(tmp_path / "test.bin")
    write_bin(path, ds)
    loaded = load_bin(path)
    assert loaded.dataset_size == 40
    np.testing.assert_array_equal(loaded.x_block(0), xs[:8])
    np.testing.assert_array_equal(loaded.y_block(2), ys[16:24])
    assert loaded.pos_block(0)[0] == "chr1:0"


def test_pack_int16_fastpath_lossless():
    from clair_tpu.data.bins import _unpack

    # integer-valued float32 (the pileup-tensor case): packed via int16,
    # restored to float32 bit-exactly, and the blob shrinks
    rs = np.random.RandomState(3)
    counts = rs.randint(-250, 251, size=(64, 33, 8, 4)).astype(np.float32)
    blob = _pack(counts)
    out = _unpack(blob)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, counts)
    assert len(blob) < len(_pack(counts + 0.5))

    # fractional, out-of-int16-range, and NaN blocks must stay float32-exact
    for arr in (
        rs.rand(8, 4).astype(np.float32),
        np.array([40000.0, -40000.0], dtype=np.float32),
        np.array([1.0, np.nan], dtype=np.float32),
    ):
        got = _unpack(_pack(arr))
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, arr)

    # non-float arrays (position strings) pass through untouched
    pos = np.array(["chr1:5", "chr1:9"])
    assert _unpack(_pack(pos))[1] == "chr1:9"


def test_combine_and_train_val_bins(tmp_path):
    ds1, _, _ = _make_dataset(16, 8, seed=1)
    ds2, _, _ = _make_dataset(24, 8, seed=2)
    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    write_bin(p1, ds1)
    write_bin(p2, ds2)
    merged = combine_bins([p1, p2], str(tmp_path / "m.bin"))
    assert merged.dataset_size == 40 and merged.n_blocks == 5

    tv = load_train_val_bins(p1, p2)
    assert tv.train_size_hint == 16
    assert tv.dataset_size == 40


def test_build_bin_from_tensor_text(tmp_path):
    rs = np.random.RandomState(0)
    tensor_path = tmp_path / "tensors.txt"
    var_path = tmp_path / "vars.txt"
    lines = []
    for i in range(10):
        x = rs.randint(0, 20, size=(33, 8, 4))
        lines.append(tensor_line_from("chr1", 100 + i, SEQ, x))
    tensor_path.write_text("\n".join(lines) + "\n")
    # one truth variant at position 103: het A->G SNP
    var_path.write_text("chr1 103 A G 0 1\n")

    ds = build_bin_from_tensors(str(tensor_path), str(var_path), shuffle=False, block_size=4)
    assert ds.dataset_size == 10
    assert ds.n_blocks == 3
    positions = np.concatenate([ds.pos_block(i) for i in range(3)])
    y = np.concatenate([ds.y_block(i) for i in range(3)])
    idx = list(positions).index("chr1:103")
    assert y[idx, GT21.AG] == 1.0     # truth label applied
    others = [i for i in range(10) if i != idx]
    assert all(y[i, GT21.AA] == 1.0 for i in others)  # ref labels (center A)
    # X blocks are channel-normalized
    x0 = ds.x_block(0)
    assert (x0[..., 1:] <= x0[..., 1:].max()).all()


def test_epoch_batches_split_semantics():
    ds, _, _ = _make_dataset(40, 8)
    batches = list(EpochBatches(ds, np.arange(5), n_train=36, train_batch_size=16, val_batch_size=3))
    train_sizes = [len(x) for x, _, t in batches if t]
    val_sizes = [len(x) for x, _, t in batches if not t]
    assert train_sizes == [16, 16, 4]   # never crosses the 36 boundary
    assert val_sizes == [3, 1]
    assert sum(train_sizes) + sum(val_sizes) == 40


def test_epoch_batches_pooled_decompress_matches_serial():
    ds, _, _ = _make_dataset(40, 8)
    order = np.array([3, 0, 4, 1, 2])

    def run(workers):
        return list(EpochBatches(
            ds, order, n_train=32, train_batch_size=16, val_batch_size=4,
            decompress_workers=workers,
        ))

    serial, pooled = run(0), run(3)
    assert len(serial) == len(pooled)
    for (xs, ys, ts), (xp, yp, tp) in zip(serial, pooled):
        np.testing.assert_array_equal(xs, xp)
        np.testing.assert_array_equal(ys, yp)
        assert ts == tp

    # early consumer abandonment (the lr_finder pattern) must not wedge
    # the pool or the producer thread
    it = iter(EpochBatches(ds, order, n_train=32, train_batch_size=16,
                           decompress_workers=2))
    next(it)
    it.close()


def test_epoch_batches_int16_passthrough_matches_cast_feed():
    """The train loop consumes blocks in their stored int16 packing
    (cast_to_float32=False) and casts on device; the batches must be the
    stored dtype and forward/loss must be bit-identical to an f32 feed."""
    import jax

    from clair_tpu.models.clair import forward_logits, init_params
    from clair_tpu.models.losses import total_loss

    rs = np.random.RandomState(3)
    n, block = 24, 8
    xs = rs.randint(-120, 120, (n, 33, 8, 4)).astype(np.float32)
    ys = np.zeros((n, 90), np.float32)
    ys[:, 0] = 1.0
    ys[:, 21] = 1.0
    ys[:, 24 + 16] = 1.0
    ys[:, 57 + 16] = 1.0
    blocks = range(0, n, block)
    ds = BinDataset(
        n,
        [_pack(xs[o:o + block]) for o in blocks],
        [_pack(ys[o:o + block]) for o in blocks],
        [_pack(np.array([f"chr1:{o + j}" for j in range(block)]))
         for o in blocks],
        block,
    )
    order = np.arange(ds.n_blocks)

    def collect(cast):
        return list(EpochBatches(ds, order, n_train=16, train_batch_size=16,
                                 val_batch_size=8, decompress_workers=0,
                                 cast_to_float32=cast))

    packed, cast = collect(False), collect(True)
    assert [b[0].dtype for b in packed] == [np.dtype(np.int16)] * len(packed)
    assert [b[0].dtype for b in cast] == [np.dtype(np.float32)] * len(cast)
    for (xp, yp, tp), (xc, yc, tc) in zip(packed, cast):
        np.testing.assert_array_equal(xp.astype(np.float32), xc)
        np.testing.assert_array_equal(yp.astype(np.float32), yc)
        assert tp == tc

    config = ModelConfig(lstm1_num_units=8, lstm2_num_units=8)
    params = init_params(jax.random.PRNGKey(0), config)
    fwd = jax.jit(lambda p, x: forward_logits(p, x, config))
    xi, yi, _ = packed[0]
    xf, yf, _ = cast[0]
    logits_i, logits_f = fwd(params, xi), fwd(params, xf)
    for li, lf in zip(logits_i, logits_f):
        np.testing.assert_array_equal(np.asarray(li), np.asarray(lf))
    loss_i = total_loss(logits_i, yi, params)[0]
    loss_f = total_loss(logits_f, yf, params)[0]
    np.testing.assert_array_equal(np.asarray(loss_i), np.asarray(loss_f))


def test_cyclical_lr_matches_reference_semantics():
    clr = CyclicalLR(step_size=10, max_lr=0.03, mode="tri", min_lr=1e-4)
    values = [clr() for _ in range(40)]
    assert values[9] == pytest.approx(0.03)           # peak at step_size
    assert values[18] == pytest.approx(1e-4 + (0.03 - 1e-4) * (2 - 1.9))
    assert values[19] == pytest.approx(1e-4)  # x == 2.0 -> floor of the cycle
    # tri2 halves max_lr each cycle
    clr2 = CyclicalLR(step_size=5, max_lr=0.04, mode="tri2", min_lr=0.0)
    for _ in range(11):
        clr2()
    assert clr2.max_lr == pytest.approx(0.02)


def test_adaptive_decay_oscillation_trigger():
    decay = AdaptiveDecay(max_switches=3)
    # strictly improving: no trigger
    for i, loss in enumerate([10, 9, 8, 7, 6, 5, 4, 3]):
        stop, decayed = decay.observe(loss, i + 1)
        assert not stop and not decayed
    # now oscillate up/down while staying above the minimum
    decay2 = AdaptiveDecay(max_switches=3)
    seq = [10, 9, 8, 7, 6, 5, 7, 6.5, 7.2, 6.8, 7.5]
    out = [decay2.observe(v, i + 1) for i, v in enumerate(seq)]
    assert any(d for _, d in out)  # decayed at least once


def test_adaptive_decay_stops_after_three_switches():
    decay = AdaptiveDecay(max_switches=3)
    losses = [5, 4, 3, 2, 1] + [2, 3, 4, 5, 6, 7, 8, 9] * 6
    stopped = False
    for i, v in enumerate(losses):
        stop, _ = decay.observe(v, i + 1)
        if stop:
            stopped = True
            break
    assert stopped
    assert decay.switches_left == 0


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from clair_tpu.models.clair import init_params

    params = init_params(jax.random.PRNGKey(0), ModelConfig())
    path = checkpoint_path(str(tmp_path / "model"), 7)
    assert path.endswith("-000007")
    assert epoch_from_path(path) == 7
    save_checkpoint(path, params, extra={"epoch": 7})
    loaded, extra = load_checkpoint(path)
    assert extra["epoch"] == 7
    np.testing.assert_array_equal(
        np.asarray(params["l4"]["w"]), loaded["l4"]["w"]
    )


@pytest.mark.slow
def test_train_model_end_to_end(tmp_path):
    from clair_tpu.pipeline.train import TrainingConfig, train_model

    ds, _, _ = _make_dataset(60, 10, seed=3)
    config = TrainingConfig(
        model=ModelConfig(
            lstm1_num_units=8, lstm2_num_units=8, l3_num_units=4,
            l4_num_units=16, l5_num_units=8,
        ),
        learning_rate=1e-3,
        output_prefix=str(tmp_path / "ckpt"),
        train_batch_size=18,
        val_batch_size=6,
        schedule="tri",
        max_epochs=3,
        evaluate_at_end=False,
    )
    result = train_model(ds, config)
    assert len(result.validation_losses) == 3
    assert all(np.isfinite(l) for l, _ in result.validation_losses)
    # checkpoints written per epoch, best restored
    assert (tmp_path / "ckpt-000001").exists()
    assert (tmp_path / "ckpt-000003").exists()


@pytest.mark.slow
def test_evaluate_and_lr_finder(tmp_path):
    import jax

    from clair_tpu.models.clair import init_params
    from clair_tpu.pipeline.evaluate import evaluate_model
    from clair_tpu.pipeline.lr_finder import find_learning_rate

    small = ModelConfig(
        lstm1_num_units=8, lstm2_num_units=8, l3_num_units=4,
        l4_num_units=16, l5_num_units=8,
    )
    ds, _, _ = _make_dataset(60, 10, seed=4)
    params = init_params(jax.random.PRNGKey(0), small)
    result = evaluate_model(params, small, ds, batch_size=16, print_report=False)
    assert result.confusion_gt21.sum() == 60
    assert result.confusion_genotype.sum() == 60
    assert 0.0 <= result.gt21_top1 <= result.gt21_top2 <= 1.0

    out_csv = str(tmp_path / "lr_finder.txt")
    finder = find_learning_rate(
        ds, small, train_batch_size=18, output_path=out_csv
    )
    assert len(finder.learning_rates) == 3  # 54 train examples / 18
    assert finder.suggested_min_lr > 0
    assert "suggested" in open(out_csv).read()
