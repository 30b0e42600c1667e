"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from clair_tpu.models.clair import forward, init_params
from clair_tpu.parallel.mesh import make_mesh
from clair_tpu.parallel.sharding import (
    batch_sharding,
    make_eval_step,
    make_optimizer,
    make_train_step,
    param_shardings,
    replicate,
    set_learning_rate,
)
from clair_tpu.params import ModelConfig


def _toy_batch(batch):
    x = np.random.RandomState(0).rand(batch, 33, 8, 4).astype(np.float32)
    y = np.zeros((batch, 90), dtype=np.float32)
    y[:, 0] = 1.0
    y[:, 21] = 1.0
    y[:, 24 + 16] = 1.0
    y[:, 57 + 16] = 1.0
    return jnp.asarray(x), jnp.asarray(y)


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_train_step_runs_and_matches_single_device():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer("Adam", 1e-3)
    opt_state = optimizer.init(params)
    x, y = _toy_batch(16)
    rng = jax.random.PRNGKey(1)
    lam = jnp.float32(config.l2_regularization_lambda)

    # single-device result (deterministic=False uses rng-seeded dropout, same
    # rng on both paths but device partitioning changes random bits layout —
    # so compare with dropout disabled via a no-dropout config)
    nodrop = ModelConfig(lstm2_dropout_rate=0.0, l4_dropout_rate=0.0, l5_dropout_rate=0.0)
    step1 = make_train_step(nodrop, optimizer)
    p1, _, loss1, _ = step1(params, opt_state, x, y, rng, lam)

    mesh = make_mesh(8, model_parallel=2)
    p_sh = param_shardings(params, mesh)
    params_sharded = jax.device_put(params, p_sh)
    opt_sharded = jax.device_put(
        optimizer.init(params), jax.tree.map(lambda _: replicate(mesh), optimizer.init(params))
    )
    x_sh = jax.device_put(x, batch_sharding(mesh, 4))
    y_sh = jax.device_put(y, batch_sharding(mesh, 2))
    stepN = make_train_step(nodrop, optimizer, mesh)
    with mesh:
        pN, _, lossN, _ = stepN(params_sharded, opt_sharded, x_sh, y_sh, rng, lam)

    np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-4)
    # updated parameters agree across the partitioning
    a = np.asarray(p1["l4"]["w"])
    b = np.asarray(pN["l4"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_eval_step_and_lr_mutation():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer("SGDM", 1e-3)
    opt_state = optimizer.init(params)
    opt_state = set_learning_rate(opt_state, 5e-4)
    np.testing.assert_allclose(float(opt_state[1].hyperparams["learning_rate"]), 5e-4, rtol=1e-6)

    x, y = _toy_batch(4)
    eval_step = make_eval_step(config)
    loss, components = eval_step(params, x, y, jnp.float32(0.005))
    assert np.isfinite(float(loss))
    assert set(components) >= {"gt21", "genotype", "indel_length_1", "indel_length_2"}


def test_graft_entry_dryrun():
    import importlib.util, pathlib, sys

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, (params, x) = mod.entry()
    out = jax.jit(fn)(params, x)
    assert out[0].shape == (256, 21)

    mod.dryrun_multichip(8)
