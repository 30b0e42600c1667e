"""Fused training BiLSTM kernel vs jax.grad of the lax.scan reference.

Runs the Pallas kernels in interpret mode on CPU: values and every
gradient (params + input) must match the autodiff of models.bilstm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clair_tpu.ops.pallas_bilstm_train as PT
from clair_tpu.models.bilstm import bilstm, init_bilstm_params


@pytest.fixture(autouse=True)
def _interpret_mode():
    PT._INTERPRET = True
    yield
    PT._INTERPRET = False


def _loss_ref(params, x, w):
    out = bilstm(params, x)
    return jnp.sum(out * w)


def _loss_pallas(params, x, w):
    out = PT.bilstm_train_pallas(params, x)
    return jnp.sum(out * w)


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
    # non-uniform cotangent so every (t, feature) position is exercised
    w = jax.random.normal(jax.random.PRNGKey(2), (b, t, 2 * h), jnp.float32)

    out_ref = bilstm(params, x)
    out_pl = PT.bilstm_train_pallas(params, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(_loss_ref, argnums=(0, 1))(params, x, w)
    g_pl = jax.grad(_loss_pallas, argnums=(0, 1))(params, x, w)
    for (path, a), (_, e) in zip(
        jax.tree_util.tree_flatten_with_path(g_pl)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=3e-4, atol=3e-4,
            err_msg=str(path),
        )


def test_value_and_grad_under_jit():
    params = init_bilstm_params(jax.random.PRNGKey(3), 32, 16)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 33, 32), jnp.float32)
    w = jnp.ones((8, 33, 32), jnp.float32)

    @jax.jit
    def f(p, x):
        return jnp.sum(PT.bilstm_train_pallas(p, x) * w)

    @jax.jit
    def f_ref(p, x):
        return jnp.sum(bilstm(p, x) * w)

    np.testing.assert_allclose(float(f(params, x)), float(f_ref(params, x)),
                               rtol=1e-5)
    ga = jax.jit(jax.grad(f))(params, x)
    ge = jax.jit(jax.grad(f_ref))(params, x)
    for a, e in zip(jax.tree.leaves(ga), jax.tree.leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=3e-4, atol=3e-4)
