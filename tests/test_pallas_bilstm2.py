"""Two-layer fused Pallas BiLSTM kernel: interpret-mode equality against
the scan composition (runs on CPU; the kernel itself targets TPU)."""

import jax
import numpy as np
import pytest

from clair_tpu.models.bilstm import bilstm, init_bilstm_params
from clair_tpu.ops.pallas_bilstm2 import bilstm2_pallas


@pytest.mark.parametrize("batch", [16, 70])
def test_fused_two_layer_matches_scan(batch):
    rng = jax.random.PRNGKey(0)
    k1, k2, kx = jax.random.split(rng, 3)
    p1 = init_bilstm_params(k1, 32, 16)
    p2 = init_bilstm_params(k2, 32, 16)  # input = 2*16 = 32
    x = jax.random.normal(kx, (batch, 33, 32))

    expected = bilstm(p2, bilstm(p1, x))
    got = bilstm2_pallas(p1, p2, x, block_b=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )
