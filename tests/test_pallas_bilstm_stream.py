"""Streaming-grid training BiLSTM kernel vs jax.grad of the lax.scan
reference (interpret mode on CPU): values and every gradient (params +
input) must match the autodiff of models.bilstm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clair_tpu.ops.pallas_bilstm_stream as PS
from clair_tpu.models.bilstm import bilstm, init_bilstm_params


@pytest.fixture(autouse=True)
def _interpret_mode():
    PS._INTERPRET = True
    yield
    PS._INTERPRET = False


def _loss_ref(params, x, w):
    return jnp.sum(bilstm(params, x) * w)


def _loss_stream(params, x, w):
    return jnp.sum(PS.bilstm_train_stream(params, x) * w)


@pytest.mark.parametrize("b,t,f,h", [
    (8, 33, 32, 128),      # lstm1 geometry
    (8, 33, 256, 128),     # lstm2 geometry
    (12, 33, 32, 128),     # batch needing padding (12 -> tile multiple)
    (8, 7, 16, 8),         # tiny odd geometry
])
def test_forward_and_grads_match_scan(b, t, f, h):
    rng = jax.random.PRNGKey(0)
    params = init_bilstm_params(rng, f, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, f), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (b, t, 2 * h), jnp.float32)

    out_ref = bilstm(params, x)
    out_str = PS.bilstm_train_stream(params, x)
    np.testing.assert_allclose(out_str, out_ref, rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(_loss_ref, argnums=(0, 1))(params, x, w)
    g_str = jax.grad(_loss_stream, argnums=(0, 1))(params, x, w)
    for ref_leaf, str_leaf in zip(
        jax.tree.leaves(g_ref), jax.tree.leaves(g_str)
    ):
        np.testing.assert_allclose(
            str_leaf, ref_leaf, rtol=3e-4, atol=3e-5,
        )


def test_bf16_compute_path_close_to_f32():
    """bf16 x/h with f32 gates/cell: outputs track the f32 reference to
    bf16 resolution and gradients stay finite and correlated."""
    b, t, f, h = 8, 33, 32, 128
    params = init_bilstm_params(jax.random.PRNGKey(3), f, h)
    x32 = jax.random.normal(jax.random.PRNGKey(4), (b, t, f), jnp.float32)
    w = jnp.ones((b, t, 2 * h), jnp.float32)

    out_ref = bilstm(params, x32)
    out_b16 = PS.bilstm_train_stream(params, x32.astype(jnp.bfloat16))
    assert out_b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_b16, np.float32), out_ref, rtol=0.1, atol=0.05
    )

    def loss_b16(p, x):
        return jnp.sum(
            PS.bilstm_train_stream(p, x.astype(jnp.bfloat16))
            .astype(jnp.float32) * w
        )

    gp, gx = jax.grad(loss_b16, argnums=(0, 1))(params, x32)
    gp_ref, gx_ref = jax.grad(
        lambda p, x: jnp.sum(bilstm(p, x) * w), argnums=(0, 1)
    )(params, x32)
    for a, r in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        a, r = np.asarray(a, np.float64), np.asarray(r, np.float64)
        assert np.all(np.isfinite(a))
        denom = np.linalg.norm(a) * np.linalg.norm(r)
        assert denom > 0 and float((a * r).sum() / denom) > 0.99
    assert np.all(np.isfinite(np.asarray(gx, np.float32)))


def test_train_step_converges_with_stream_kernel():
    """One end-to-end sanity: SGD on the kernel's gradients reduces a
    regression loss, and the trajectory tracks the scan's."""
    b, t, f, h = 8, 9, 16, 8
    params = init_bilstm_params(jax.random.PRNGKey(5), f, h)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, t, f), jnp.float32)
    target = jax.random.normal(jax.random.PRNGKey(7), (b, t, 2 * h)) * 0.1

    def loss_fn(impl):
        def loss(p):
            return jnp.mean((impl(p, x) - target) ** 2)
        return loss

    def run(impl):
        p = params
        losses = []
        for _ in range(5):
            val, grads = jax.value_and_grad(loss_fn(impl))(p)
            p = jax.tree.map(lambda a, g: a - 0.5 * g, p, grads)
            losses.append(float(val))
        return losses

    l_ref = run(bilstm)
    l_str = run(PS.bilstm_train_stream)
    assert l_str[-1] < l_str[0]
    np.testing.assert_allclose(l_str, l_ref, rtol=1e-3)


def test_meshed_kernel_matches_scan_on_virtual_mesh():
    """shard_map'd streaming kernel over an 8-device CPU mesh: forward and
    every gradient (params + input) match the scan reference, and a jitted
    run with batch-sharded inputs compiles + executes (the multi-chip
    configuration the single-device kernel used to fall back from)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = Mesh(np.array(devices[:4]), ("data",))

    b, t, f, h = 16, 33, 32, 64
    params = init_bilstm_params(jax.random.PRNGKey(5), f, h)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, t, f), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(7), (b, t, 2 * h), jnp.float32)
    meshed = PS.bilstm_train_stream_meshed(mesh)

    out_ref = bilstm(params, x)
    out_meshed = meshed(params, x)
    np.testing.assert_allclose(out_meshed, out_ref, rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(_loss_ref, argnums=(0, 1))(params, x, w)
    g_meshed = jax.grad(
        lambda p, xx, ww: jnp.sum(meshed(p, xx) * ww), argnums=(0, 1)
    )(params, x, w)
    for ref_leaf, meshed_leaf in zip(
        jax.tree.leaves(g_ref), jax.tree.leaves(g_meshed)
    ):
        np.testing.assert_allclose(meshed_leaf, ref_leaf, rtol=3e-4, atol=3e-5)

    # jitted, with inputs actually laid out batch-sharded over the mesh
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    p_repl = jax.device_put(
        params, jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    )
    out_jit = jax.jit(meshed)(p_repl, x_sharded)
    np.testing.assert_allclose(np.asarray(out_jit), out_ref, rtol=2e-5, atol=2e-5)


def test_meshed_train_step_matches_single_device_losses():
    """A meshed bf16 train step with the stream kernel produces the same
    loss trajectory as the single-device stream-kernel step (same batch,
    same seed), within the kernel-vs-scan tolerance family."""
    from jax.sharding import Mesh

    from clair_tpu.params import ModelConfig
    from clair_tpu.models.clair import init_params
    from clair_tpu.parallel.sharding import (
        batch_sharding,
        make_optimizer,
        make_train_step,
        param_shardings,
        replicate,
    )

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = Mesh(np.array(devices[:4]).reshape(4, 1), ("data", "model"))

    config = ModelConfig(use_pallas_stream_bilstm=True)
    params = init_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer("Adam", 1e-3)

    rs = np.random.RandomState(0)
    x = rs.randint(0, 50, size=(16, 33, 8, 4)).astype(np.float32)
    x[..., 1:] -= x[..., :1]
    y = np.zeros((16, 90), np.float32)
    y[:, rs.randint(0, 21, 16)] = 1.0
    y[:, 21 + rs.randint(0, 3, 16)] = 1.0
    y[:, 24 + rs.randint(0, 33, 16)] = 1.0
    y[:, 57 + rs.randint(0, 33, 16)] = 1.0
    rng = jax.random.PRNGKey(3)

    losses = {}
    for name, m in (("single", None), ("meshed", mesh)):
        step = make_train_step(config, optimizer, m)
        p = jax.tree.map(jnp.asarray, params)
        opt_state = optimizer.init(p)
        if m is not None:
            p = jax.device_put(p, param_shardings(p, m))
            opt_state = jax.device_put(
                opt_state, jax.tree.map(lambda _: replicate(m), opt_state)
            )
            xs = jax.device_put(x, batch_sharding(m, 4))
            ys = jax.device_put(y, batch_sharding(m, 2))
        else:
            xs, ys = x, y
        run = []
        for _ in range(3):
            p, opt_state, loss, _ = step(p, opt_state, xs, ys, rng, 0.0)
            run.append(float(loss))
        losses[name] = run

    np.testing.assert_allclose(
        losses["meshed"], losses["single"], rtol=3e-4, atol=3e-5
    )
