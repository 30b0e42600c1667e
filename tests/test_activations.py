"""Activation dump and introspection surfaces."""

import jax
import numpy as np

from clair_tpu.models.clair import forward, forward_activations, init_params
from clair_tpu.params import ModelConfig


def test_forward_activations_shapes_and_consistency():
    # the activation dump always computes in f32 (it's a numerical debug
    # surface); compare against an f32 forward, not the bf16 default
    config = ModelConfig(compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    x = np.random.RandomState(0).rand(2, 33, 8, 4).astype(np.float32)
    acts = forward_activations(params, x, config)
    assert acts["input"].shape == (2, 33, 32)
    assert acts["lstm1"].shape == (2, 33, 256)
    assert acts["lstm2"].shape == (2, 33, 256)
    assert acts["l3"].shape == (2, 30, 256)
    assert acts["l4"].shape == (2, 192)
    for key in ("l5_1", "l5_2", "l5_3", "l5_4"):
        assert acts[key].shape == (2, 96)
    # head activations must equal the standard forward outputs
    out = forward(params, x, config)
    np.testing.assert_allclose(np.asarray(acts["gt21"]), np.asarray(out[0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(acts["indel_length_2"]), np.asarray(out[3]), rtol=1e-6
    )
