"""Fused Pallas TPU kernel for the bidirectional LSTM recurrence.

STATUS: experimental, NOT the production path. Measured history:
- vs the original rolled lax.scan it was +10% at batch 1024 (round 1).
- models/bilstm.py now fully unrolls the scan (T=33 is static), which
  measured 1.63x over the rolled scan on a v5e (0.64 ms vs 1.06 ms at
  batch 1000) — i.e. the unrolled scan overtakes this kernel (~0.67x by
  the same measurements), and at 0.64 ms the forward already runs at ~70%
  of the f32 MXU roofline (40 GFLOP/batch), leaving <1.4x theoretical
  headroom for any kernel. The kernel is kept as the starting point for a
  both-layers-fused variant (h/c resident across LSTM1+LSTM2 would also
  skip one HBM round trip of the (B,33,256) intermediate).

Design: the whole 33-step recurrence runs per grid cell with h/c pinned
in VMEM scratch, one MXU matmul per step, directions on a leading grid
axis (each direction has its own recurrent matrix). The input projection
x @ W stays outside — it is a single large batched matmul XLA already
schedules optimally.

VMEM budget per cell (batch tile 128, H=128, T=33, f32):
xw block 33*128*512*4 = 8.6 MB + out 2.2 MB + U 0.26 MB + scratch — fits
the ~16 MB/core budget.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilstm_kernel(xw_ref, u_ref, out_ref, h_scratch, c_scratch):
    t_len = xw_ref.shape[1]
    hidden = h_scratch.shape[-1]

    h_scratch[...] = jnp.zeros_like(h_scratch)
    c_scratch[...] = jnp.zeros_like(c_scratch)

    def step(t, _):
        h = h_scratch[...]
        c = c_scratch[...]
        gates = xw_ref[0, t] + jnp.dot(
            h, u_ref[0], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_scratch[...] = h_new
        c_scratch[...] = c_new
        out_ref[0, t] = h_new
        return 0

    jax.lax.fori_loop(0, t_len, step, 0)


@functools.partial(jax.jit, static_argnames=("block_b",))
def _lstm_pallas(xw: jnp.ndarray, u: jnp.ndarray, block_b: int = 64) -> jnp.ndarray:
    """Run the recurrence: xw (2, T, N, 4H) dir-major time-major padded
    batch, u (2, H, 4H). Returns (2, T, N, H)."""
    _, t_len, n, gate_dim = xw.shape
    hidden = gate_dim // 4
    grid = (2, n // block_b)
    return pl.pallas_call(
        _bilstm_kernel,
        out_shape=jax.ShapeDtypeStruct((2, t_len, n, hidden), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, t_len, block_b, gate_dim),
                lambda d, b: (d, 0, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hidden, gate_dim),
                lambda d, b: (d, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_len, block_b, hidden),
            lambda d, b: (d, 0, b, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
    )(xw, u)


def bilstm_pallas(params: Dict, x: jnp.ndarray, block_b: int = 64) -> jnp.ndarray:
    """Drop-in replacement for models.bilstm.bilstm using the fused kernel.

    x: (B, T, F) -> (B, T, 2H). The batch is padded to a block multiple;
    padding rows are discarded on return.
    """
    b, t_len, _ = x.shape
    hidden = params["fw"]["u"].shape[0]

    x_rev = jnp.flip(x, axis=1)
    xw_fw = x @ params["fw"]["w"] + params["fw"]["b"]      # (B, T, 4H)
    xw_bw = x_rev @ params["bw"]["w"] + params["bw"]["b"]

    padded = ((b + block_b - 1) // block_b) * block_b
    pad = padded - b

    def to_kernel_layout(a):
        a = a.transpose(1, 0, 2)                            # (T, B, 4H)
        return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))

    xw = jnp.stack([to_kernel_layout(xw_fw), to_kernel_layout(xw_bw)])
    u = jnp.stack([params["fw"]["u"], params["bw"]["u"]])

    out = _lstm_pallas(xw, u, block_b=block_b)              # (2, T, N, H)
    out_fw = out[0, :, :b].transpose(1, 0, 2)
    out_bw = jnp.flip(out[1, :, :b].transpose(1, 0, 2), axis=1)
    return jnp.concatenate([out_fw, out_bw], axis=-1)
