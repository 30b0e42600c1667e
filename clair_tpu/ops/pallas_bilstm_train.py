"""Pallas TPU kernels for the TRAINING BiLSTM: fused forward + fused
backward behind a ``jax.custom_vjp``.

MEASURED VERDICT (v5e, batch 10000, in-jit deltas, gradient-exact vs the
scan reference): 61.2 ms/step vs 58.8 ms for the unrolled scan + remat —
a tie, the same shape-bound outcome as the inference kernel
(ops/pallas_bilstm2.py). The 16 MB scoped-VMEM budget must hold a batch
tile's x/h/c/dh across all 33 steps, which caps tiles at 64 (lstm1) /
32 (lstm2) rows — and (32, 384) @ (384, 512) matmuls leave the 128x128
MXU mostly idle, cancelling exactly the HBM-traffic savings the kernel
exists to capture. Production training keeps the scan + remat
(models/bilstm.py); this kernel stays as the verified-correct,
gradient-exact baseline (`ModelConfig.use_pallas_train_bilstm`) for
hardware with more VMEM per core or smaller per-step working sets.

Why it was tried: the batch-10000 training step is HBM-bound, not
compute-bound (docs/ROADMAP.md roofline: ~1.3 TFLOP/step vs a 58.6 ms
measured f32 step). XLA's backward through the 66 unrolled scan steps
streams every per-step gate/elementwise intermediate through HBM; the
remat default removes the *saved* gates but the elementwise chain still
touches (2B, 4H) tensors per step in both passes. These kernels keep a
batch tile's ENTIRE recurrence — h, c, gates, and their gradients — in
VMEM across all 33 timesteps, so HBM traffic drops to the tensors that
fundamentally must move: x, h (the layer output), the saved c residual,
and the gradients of the same.

Layout: the same stacked-directions form as models.bilstm._bilstm_fused —
xs is (T, 2B, F) with the time-reversed sequence in rows B:, so one
recurrence serves both directions; the grid tiles the 2B axis and each
tile selects its direction's weights by program id. The backward kernel
recomputes the gate activations from (x_t, h_{t-1}) — cheap MXU work —
and accumulates dW/dU/db per tile in VMEM scratch (summed across tiles by
XLA afterwards).

Gradient-correctness is pinned against ``jax.grad`` of the lax.scan
reference in interpret mode (tests/test_pallas_bilstm_train.py): values
and all parameter/input gradients to ~1e-5.

Reference for the modelled network: /root/reference/clair/model.py:266-325
(CudnnLSTM bidirectional layers).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clair_tpu.models.bilstm import _stack_directions, _unstack_outputs


def _fwd_kernel(x_ref, w_ref, u_ref, b_ref, h_out_ref, c_out_ref,
                h_ref, c_ref):
    t_len = x_ref.shape[0]
    hidden = u_ref.shape[0]
    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)

    def step(t, _):
        gates = (
            jnp.dot(x_ref[t], w_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(h_ref[...], u_ref[...], preferred_element_type=jnp.float32)
            + b_ref[...]
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = f * c_ref[...] + i * g
        h_new = o * jnp.tanh(c_new)
        h_ref[...] = h_new
        c_ref[...] = c_new
        h_out_ref[t] = h_new
        c_out_ref[t] = c_new
        return 0

    jax.lax.fori_loop(0, t_len, step, 0)


def _bwd_kernel(x_ref, h_out_ref, c_out_ref, dh_out_ref, w_ref, u_ref,
                b_ref, dx_ref, dw_ref, du_ref, db_ref,
                dh_ref, dc_ref):
    t_len = x_ref.shape[0]
    hidden = u_ref.shape[0]
    dh_ref[...] = jnp.zeros_like(dh_ref)
    dc_ref[...] = jnp.zeros_like(dc_ref)
    dw_ref[...] = jnp.zeros_like(dw_ref)
    du_ref[...] = jnp.zeros_like(du_ref)
    db_ref[...] = jnp.zeros_like(db_ref)

    def step(k, _):
        t = t_len - 1 - k
        h_prev = jnp.where(t > 0, h_out_ref[jnp.maximum(t - 1, 0)], 0.0)
        c_prev = jnp.where(t > 0, c_out_ref[jnp.maximum(t - 1, 0)], 0.0)
        # recompute gate activations (cheap MXU work vs streaming them)
        gates = (
            jnp.dot(x_ref[t], w_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(h_prev, u_ref[...], preferred_element_type=jnp.float32)
            + b_ref[...]
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_t = c_out_ref[t]
        tanh_c = jnp.tanh(c_t)

        dh = dh_out_ref[t] + dh_ref[...]
        dc = dc_ref[...] + dh * o * (1.0 - tanh_c * tanh_c)
        do = dh * tanh_c
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dx_ref[t] = jnp.dot(dgates, w_ref[...].T,
                            preferred_element_type=jnp.float32)
        dh_ref[...] = jnp.dot(dgates, u_ref[...].T,
                              preferred_element_type=jnp.float32)
        dc_ref[...] = dc * f
        dw_ref[...] += jnp.dot(x_ref[t].T, dgates,
                               preferred_element_type=jnp.float32)
        du_ref[...] += jnp.dot(h_prev.T, dgates,
                               preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_len, step, 0)


def _pick_tile(feat: int, hidden: int, t_len: int) -> int:
    """Largest tile keeping the BACKWARD pass's per-tile VMEM residency
    (x + dx + h + c + dh_out blocks over all t_len steps) under ~8 MB —
    headroom for Mosaic's block double-buffering in a ~16 MB budget. The
    batch axis is padded to a tile multiple by the wrapper."""
    # fixed residency: weights + their per-tile gradient blocks + carry
    # scratch (the 16 MB scoped-vmem limit is shared with Mosaic's block
    # double-buffering, so stay well under half)
    fixed = 4 * (2 * (feat + hidden + 1) * 4 * hidden)
    for tile in (512, 256, 128, 64, 32, 16, 8):
        bytes_needed = 4 * t_len * tile * (2 * feat + 3 * hidden) + fixed
        if bytes_needed <= 6 * 1024 * 1024:
            return tile
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(xs, w, u, b, *, interpret=False):
    """xs: (T, 2B, F) stacked directions; w/u/b stacked (2, ...).
    Returns (h_out, c_out), each (T, 2B, H)."""
    t_len, n2, feat = xs.shape
    hidden = u.shape[1]
    tile = _pick_tile(feat, hidden, t_len)
    tiles_per_dir = (n2 // 2) // tile
    grid = (n2 // tile,)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, n2, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_len, n2, hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_len, tile, feat), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_len, tile, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, tile, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), jnp.float32),
            pltpu.VMEM((tile, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xs, w, u, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_pallas(xs, h_out, c_out, dh_out, w, u, b, *, interpret=False):
    """Returns (dx (T,2B,F), dw (G,2?,F,4H) partials per tile...)
    — weight-gradient partials come back per grid tile and are summed
    per direction by the caller."""
    t_len, n2, feat = xs.shape
    hidden = u.shape[1]
    tile = _pick_tile(feat, hidden, t_len)
    n_tiles = n2 // tile
    tiles_per_dir = n_tiles // 2
    grid = (n_tiles,)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, n2, feat), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, feat, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, hidden, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 4 * hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_len, tile, feat), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, tile, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, tile, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, tile, hidden), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden),
                         lambda i, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_len, tile, feat), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), jnp.float32),
            pltpu.VMEM((tile, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xs, h_out, c_out, dh_out, w, u, b)


# ---------------------------------------------------------------------------
# custom_vjp wrapper with the models.bilstm API
# ---------------------------------------------------------------------------

_INTERPRET = False  # tests flip this for CPU interpret-mode runs


def _stack_params(params: Dict):
    w = jnp.stack([jnp.asarray(params["fw"]["w"], jnp.float32),
                   jnp.asarray(params["bw"]["w"], jnp.float32)])
    u = jnp.stack([jnp.asarray(params["fw"]["u"], jnp.float32),
                   jnp.asarray(params["bw"]["u"], jnp.float32)])
    b = jnp.stack([jnp.asarray(params["fw"]["b"], jnp.float32)[None],
                   jnp.asarray(params["bw"]["b"], jnp.float32)[None]])
    return w, u, b


@jax.custom_vjp
def bilstm_train_pallas(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for models.bilstm.bilstm (B, T, F) -> (B, T, 2H), f32,
    with a fused-VMEM backward. Batch must be a multiple of 8."""
    out, _ = _bilstm_fwd(params, x)
    return out


def _padded_batch(b: int, feat: int, hidden: int, t_len: int) -> int:
    tile = _pick_tile(feat, hidden, t_len)
    return ((b + tile - 1) // tile) * tile


def _bilstm_fwd(params: Dict, x: jnp.ndarray):
    b, t_len, feat = x.shape
    hidden = params["fw"]["u"].shape[0]
    bp = _padded_batch(b, feat, hidden, t_len)
    xf = x.astype(jnp.float32)
    if bp != b:
        xf = jnp.pad(xf, ((0, bp - b), (0, 0), (0, 0)))
    w, u, bias = _stack_params(params)
    xs = _stack_directions(xf)
    h_out, c_out = _fwd_pallas(xs, w, u, bias, interpret=_INTERPRET)
    out = _unstack_outputs(h_out, bp)[:b]
    return out, (params, xs, h_out, c_out, b)


def _bilstm_bwd(residual, dout):
    params, xs, h_out, c_out, b = residual
    bp = xs.shape[1] // 2
    # dout (B, T, 2H) -> stacked (T, 2Bp, H): forward half from features
    # :H, backward half re-reversed from features H:; pad rows get zero
    # cotangents so they contribute nothing to weight gradients
    hidden = dout.shape[-1] // 2
    if bp != b:
        dout = jnp.pad(dout, ((0, bp - b), (0, 0), (0, 0)))
    d_fw = dout[..., :hidden].transpose(1, 0, 2)
    d_bw = jnp.flip(dout[..., hidden:], axis=1).transpose(1, 0, 2)
    dh_out = jnp.concatenate([d_fw, d_bw], axis=1)

    w, u, bias = _stack_params(params)
    dx_s, dw_t, du_t, db_t = _bwd_pallas(
        xs, h_out, c_out, dh_out, w, u, bias, interpret=_INTERPRET
    )
    n_tiles = dw_t.shape[0]
    half = n_tiles // 2
    dparams = {
        "fw": {
            "w": jnp.sum(dw_t[:half], axis=0),
            "u": jnp.sum(du_t[:half], axis=0),
            "b": jnp.sum(db_t[:half], axis=0)[0],
        },
        "bw": {
            "w": jnp.sum(dw_t[half:], axis=0),
            "u": jnp.sum(du_t[half:], axis=0),
            "b": jnp.sum(db_t[half:], axis=0)[0],
        },
    }
    # dx: forward rows map straight back; backward rows un-reverse
    dx_fw = dx_s[:, :bp].transpose(1, 0, 2)
    dx_bw = jnp.flip(dx_s[:, bp:].transpose(1, 0, 2), axis=1)
    dx = (dx_fw + dx_bw)[:b]
    # match the param pytree dtype structure
    dparams = jax.tree.map(
        lambda g, p: g.astype(jnp.asarray(p).dtype), dparams,
        {k: dict(v) for k, v in params.items()},
    )
    return dparams, dx


bilstm_train_pallas.defvjp(_bilstm_fwd, _bilstm_bwd)
