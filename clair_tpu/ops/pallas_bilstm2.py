"""Fused Pallas TPU kernel: BOTH BiLSTM layers in one kernel launch.

MEASURED VERDICT (v5e, 200-iteration in-jit deltas, batch 512, bit-exact
output): 0.283 ms/batch vs 0.292 ms for the fully unrolled lax.scan
composition — parity, not a win. The hypothesis was that keeping the
(B, 33, 256) inter-layer activations in VMEM would beat XLA's HBM round
trips; in practice the unrolled scan is already latency/shape-bound at
~70% of the f32 MXU roofline and the HBM traffic is not the limiter. The
kernel stays as the verified-correct starting point for future TPU
generations / larger models where the balance shifts; the production
forward keeps the unrolled scan.

Design: all four recurrences (fw1, bw1, fw2, bw2) run per batch tile with
every intermediate in VMEM scratch:

  x tile (33, Bt, 32)  -->  h1f/h1b scratch (33, Bt, 128)  -->  out tile
                                                              (33, Bt, 256)

The input projections happen inside the kernel (x is only 32 features —
streaming it costs ~60x less than streaming precomputed x@W gates).

VMEM per cell at Bt=64, H=128, T=33, f32: x 0.27 MB + h1 scratch 2.2 MB +
out 2.2 MB + weights 2.4 MB + h/c scratch 0.3 MB  ~= 7.4 MB — comfortable
under the ~16 MB budget with pipelining.

Semantics match models.bilstm.bilstm(p2, bilstm(p1, x)) exactly (equality
test in tests/test_pallas_bilstm2.py runs the kernel in interpret mode on
CPU); deterministic inference only (the inter-layer dropout is a training-
time op).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilstm2_kernel(
    x_ref, w1_ref, b1_ref, u1_ref, w2_ref, b2_ref, u2_ref,
    out_ref, h1f_ref, h1b_ref, h_ref, c_ref,
):
    t_len = x_ref.shape[0]
    h1 = u1_ref.shape[1]
    h2 = u2_ref.shape[1]

    def gates_to_h(gates, c, hidden):
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def run_layer1(direction, store_ref):
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

        def step(k, _):
            t = k if direction == 0 else t_len - 1 - k
            gates = (
                jnp.dot(x_ref[t], w1_ref[direction],
                        preferred_element_type=jnp.float32)
                + b1_ref[direction]
                + jnp.dot(h_ref[...], u1_ref[direction],
                          preferred_element_type=jnp.float32)
            )
            h_new, c_new = gates_to_h(gates, c_ref[...], h1)
            h_ref[...] = h_new
            c_ref[...] = c_new
            store_ref[t] = h_new  # stored at ORIGINAL time index
            return 0

        jax.lax.fori_loop(0, t_len, step, 0)

    run_layer1(0, h1f_ref)
    run_layer1(1, h1b_ref)

    def run_layer2(direction):
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

        def step(k, _):
            t = k if direction == 0 else t_len - 1 - k
            in2 = jnp.concatenate([h1f_ref[t], h1b_ref[t]], axis=-1)
            gates = (
                jnp.dot(in2, w2_ref[direction],
                        preferred_element_type=jnp.float32)
                + b2_ref[direction]
                + jnp.dot(h_ref[...], u2_ref[direction],
                          preferred_element_type=jnp.float32)
            )
            h_new, c_new = gates_to_h(gates, c_ref[...], h2)
            h_ref[...] = h_new
            c_ref[...] = c_new
            if direction == 0:
                out_ref[t, :, :h2] = h_new
            else:
                out_ref[t, :, h2:] = h_new
            return 0

        jax.lax.fori_loop(0, t_len, step, 0)

    run_layer2(0)
    run_layer2(1)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _bilstm2_pallas(x, w1, b1, u1, w2, b2, u2, block_b: int = 64,
                    interpret: bool = False):
    """x: (T, N, F) time-major padded batch; weights stacked (2, ...).
    Returns (T, N, 2*H2) in original time order."""
    t_len, n, _ = x.shape
    h1 = u1.shape[1]
    h2 = u2.shape[1]
    grid = (n // block_b,)
    return pl.pallas_call(
        _bilstm2_kernel,
        out_shape=jax.ShapeDtypeStruct((t_len, n, 2 * h2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_len, block_b, x.shape[2]), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(u1.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(u2.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_len, block_b, 2 * h2), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_len, block_b, h1), jnp.float32),
            pltpu.VMEM((t_len, block_b, h1), jnp.float32),
            pltpu.VMEM((block_b, max(h1, h2)), jnp.float32),
            pltpu.VMEM((block_b, max(h1, h2)), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1, u1, w2, b2, u2)


def bilstm2_pallas(params1: Dict, params2: Dict, x: jnp.ndarray,
                   block_b: int = 64, interpret: bool = False) -> jnp.ndarray:
    """Both BiLSTM layers fused: equivalent to
    ``bilstm(params2, bilstm(params1, x))`` for (B, T, F) -> (B, T, 2*H2).
    Batch pads to a block multiple; padding rows are dropped on return."""
    b, t_len, _ = x.shape

    def stack(p, key):
        return jnp.stack([jnp.asarray(p["fw"][key], jnp.float32),
                          jnp.asarray(p["bw"][key], jnp.float32)])

    w1, b1, u1 = stack(params1, "w"), stack(params1, "b"), stack(params1, "u")
    w2, b2, u2 = stack(params2, "w"), stack(params2, "b"), stack(params2, "u")

    padded = ((b + block_b - 1) // block_b) * block_b
    xt = jnp.pad(
        x.astype(jnp.float32).transpose(1, 0, 2), ((0, 0), (0, padded - b), (0, 0))
    )
    out = _bilstm2_pallas(xt, w1, b1, u1, w2, b2, u2,
                          block_b=block_b, interpret=interpret)
    return out[:, :b].transpose(1, 0, 2)
