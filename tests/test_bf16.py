"""bfloat16 compute path: outputs close to f32, valid simplices."""

import dataclasses

import jax
import numpy as np

from clair_tpu.models.clair import forward, init_params
from clair_tpu.params import ModelConfig


def test_bf16_forward_close_to_f32():
    config32 = ModelConfig()
    config16 = dataclasses.replace(config32, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config32)
    x = np.random.RandomState(1).rand(8, 33, 8, 4).astype(np.float32) * 20

    out32 = forward(params, x, config32)
    out16 = forward(params, x, config16)
    for a, b in zip(out32, out16):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(b.sum(-1), 1.0, rtol=1e-3)
        # argmax agreement on confident outputs (bf16 tolerance)
        agree = (a.argmax(-1) == b.argmax(-1)).mean()
        assert agree >= 0.75, agree
