"""Mesh-sharded train_model on the 8-device virtual CPU mesh, including
non-divisible batch padding with zero-weight rows."""

import numpy as np

from clair_tpu.data.bins import BinDataset, _pack
from clair_tpu.params import ModelConfig
from clair_tpu.parallel.mesh import make_mesh
from clair_tpu.pipeline.train import TrainingConfig, train_model


def _dataset(n=50, block=10):
    rs = np.random.RandomState(0)
    xs = rs.rand(n, 33, 8, 4).astype(np.float32)
    ys = np.zeros((n, 90), dtype=np.float32)
    for i in range(n):
        cls = i % 2
        ys[i, [0, 7][cls]] = 1.0
        ys[i, 21 + cls] = 1.0
        ys[i, 24 + 16] = 1.0
        ys[i, 57 + 16] = 1.0
        xs[i, :, :, 0] += 1.0 if cls == 0 else -1.0
    blocks = lambda a: [_pack(a[o:o + block]) for o in range(0, n, block)]
    return BinDataset(n, blocks(xs), blocks(ys), blocks(np.array([str(i) for i in range(n)])), block)


def test_train_model_on_mesh():
    ds = _dataset()
    mesh = make_mesh(8, model_parallel=2)
    config = TrainingConfig(
        model=ModelConfig(
            lstm1_num_units=8, lstm2_num_units=8, l3_num_units=4,
            l4_num_units=16, l5_num_units=8,
        ),
        learning_rate=1e-3,
        train_batch_size=17,   # deliberately NOT divisible by data axis (4)
        val_batch_size=3,
        schedule="fixed", max_epochs=3,
        mesh=mesh,
    )
    result = train_model(ds, config)
    losses = [l for l, _ in result.validation_losses]
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)
    # learning happens (train loss falls epoch over epoch)
    train = [l for l, _ in result.training_losses]
    assert train[-1] < train[0]


def test_sharded_loss_matches_unsharded():
    """Padded zero-weight rows must not change the loss."""
    import jax

    from clair_tpu.models.clair import init_params
    from clair_tpu.parallel.sharding import make_eval_step

    model = ModelConfig(
        lstm1_num_units=8, lstm2_num_units=8, l3_num_units=4,
        l4_num_units=16, l5_num_units=8,
    )
    params = init_params(jax.random.PRNGKey(0), model)
    rs = np.random.RandomState(1)
    x = rs.rand(5, 33, 8, 4).astype(np.float32)
    y = np.zeros((5, 90), dtype=np.float32)
    y[:, 0] = y[:, 21] = y[:, 40] = y[:, 73] = 1.0

    eval_step = make_eval_step(model)
    loss_plain, _ = eval_step(params, x, y, np.float32(0.005))

    # pad to 8 with zero weights
    x_pad = np.concatenate([x, np.zeros((3, 33, 8, 4), np.float32)])
    y_pad = np.concatenate([y, np.zeros((3, 90), np.float32)])
    w = np.array([1.0] * 5 + [0.0] * 3, dtype=np.float32)
    loss_pad, _ = eval_step(params, x_pad, y_pad, np.float32(0.005), w)
    np.testing.assert_allclose(float(loss_plain), float(loss_pad), rtol=1e-5)
