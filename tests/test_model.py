"""Model unit tests: shapes, SELU/alpha-dropout math, BiLSTM equivalence to
a straightforward per-direction implementation, loss semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair_tpu.models.bilstm import bilstm, init_bilstm_params
from clair_tpu.models.clair import forward, forward_logits, init_params
from clair_tpu.models.layers import alpha_dropout, selu
from clair_tpu.models.losses import focal_loss, l2_regularization, total_loss
from clair_tpu.params import ModelConfig


def test_selu_values():
    x = jnp.array([-1.0, 0.0, 1.0])
    y = selu(x)
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    np.testing.assert_allclose(y[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(y[2], scale, rtol=1e-6)
    np.testing.assert_allclose(y[0], scale * alpha * (np.expm1(-1.0)), rtol=1e-5)


def test_alpha_dropout_preserves_moments():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (200_000,))
    y = alpha_dropout(jax.random.PRNGKey(1), x, rate=0.5)
    assert abs(float(y.mean())) < 0.02
    assert abs(float(y.var()) - 1.0) < 0.05


def _reference_lstm(x, w, u, b):
    """Plain per-step forward LSTM in numpy for cross-checking."""
    t_len, hidden = x.shape[0], u.shape[0]
    h = np.zeros(hidden)
    c = np.zeros(hidden)
    outs = []
    for t in range(t_len):
        gates = x[t] @ w + h @ u + b
        i, f, g, o = np.split(gates, 4)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        c = sig(f) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        outs.append(h)
    return np.stack(outs)


def test_bilstm_matches_reference_recurrence():
    rng = jax.random.PRNGKey(42)
    params = init_bilstm_params(rng, input_dim=8, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 8))
    out = np.asarray(bilstm(params, x))
    assert out.shape == (3, 7, 32)

    for batch_idx in range(3):
        xb = np.asarray(x[batch_idx])
        fw = _reference_lstm(
            xb, np.asarray(params["fw"]["w"]), np.asarray(params["fw"]["u"]),
            np.asarray(params["fw"]["b"]),
        )
        bw = _reference_lstm(
            xb[::-1], np.asarray(params["bw"]["w"]), np.asarray(params["bw"]["u"]),
            np.asarray(params["bw"]["b"]),
        )[::-1]
        np.testing.assert_allclose(out[batch_idx, :, :16], fw, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(out[batch_idx, :, 16:], bw, rtol=2e-5, atol=2e-6)


@pytest.fixture(scope="module")
def small_model():
    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def test_forward_shapes_and_simplex(small_model):
    config, params = small_model
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 33, 8, 4))
    gt21, geno, len1, len2 = forward(params, x, config)
    assert gt21.shape == (4, 21)
    assert geno.shape == (4, 3)
    assert len1.shape == (4, 33) and len2.shape == (4, 33)
    for probs in (gt21, geno, len1, len2):
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
        assert (np.asarray(probs) >= 0).all()


def test_forward_jit_and_train_mode(small_model):
    config, params = small_model
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 33, 8, 4))
    jitted = jax.jit(lambda p, xx: forward(p, xx, config))
    out1 = jitted(params, x)
    out2 = forward(params, x, config)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # train mode (dropout active) must differ from eval mode
    train_out = forward(
        params, x, config, deterministic=False, rng=jax.random.PRNGKey(7)
    )
    assert not np.allclose(np.asarray(train_out[0]), np.asarray(out1[0]))


def test_focal_loss_agrees_with_manual():
    logits = jnp.array([[2.0, -1.0, 0.5]])
    labels = jnp.array([[1.0, 0.0, 0.0]])
    p = np.asarray(jax.nn.softmax(logits))[0]
    expected = -(
        (1 - p[0]) ** 2 * np.log(p[0])
        + p[1] ** 2 * np.log(1 - p[1])
        + p[2] ** 2 * np.log(1 - p[2])
    )
    np.testing.assert_allclose(float(focal_loss(logits, labels)), expected, rtol=1e-5)


def test_l2_excludes_biases():
    params = {"layer": {"w": jnp.ones((2, 2)), "b": jnp.ones((2,)) * 100}}
    np.testing.assert_allclose(float(l2_regularization(params)), 2.0)


def test_total_loss_and_gradients(small_model):
    config, params = small_model
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 33, 8, 4))
    y = np.zeros((2, 90), dtype=np.float32)
    y[:, 0] = 1.0   # gt21 AA
    y[:, 21] = 1.0  # genotype 0/0
    y[:, 24 + 16] = 1.0
    y[:, 57 + 16] = 1.0
    y = jnp.asarray(y)

    def loss_fn(p):
        logits = forward_logits(p, x, config, deterministic=True)
        loss, _ = total_loss(logits, y, p, l2_lambda=config.l2_regularization_lambda)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    grad_norms = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
    flat = jax.tree.leaves(grad_norms)
    assert all(np.isfinite(v) for v in flat)
    assert any(v > 0 for v in flat)


def test_bilstm_fused_form_matches_hoisted():
    """The large-batch fused step form (x@W inside the recurrence) must
    compute the same function as the hoisted form up to accumulation
    order; the dispatch threshold is batch > 512."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clair_tpu.models.bilstm import _bilstm_fused, bilstm, init_bilstm_params

    rng = jax.random.PRNGKey(3)
    params = init_bilstm_params(rng, 32, 64)
    x = jnp.asarray(np.random.RandomState(0).rand(24, 33, 32), jnp.float32)
    hoisted = bilstm(params, x)          # B=24 -> hoisted path
    fused = _bilstm_fused(params, x)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(fused), atol=2e-4, rtol=1e-4
    )
