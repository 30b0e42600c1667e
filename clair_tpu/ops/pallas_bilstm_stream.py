"""Streaming-grid Pallas TPU kernels for the TRAINING BiLSTM.

Second-generation fused train kernel (first: ops/pallas_bilstm_train.py,
measured tie). That kernel held a batch tile's ENTIRE recurrence —
x/h/c/dh blocks across all 33 timesteps — in VMEM, so the 16 MB budget
capped tiles at 64 (lstm1) / 32 (lstm2) rows and the resulting
(32, 384) @ (384, 512) matmuls left the 128-wide MXU mostly idle,
cancelling the HBM-traffic win.

This kernel removes the cap by making TIME a grid dimension: the grid is
(batch_tiles, T) with t innermost-sequential ("arbitrary"), and only the
recurrent carry (h, c — tile x 128 each) persists in VMEM scratch across
t iterations. Everything else STREAMS — per step the forward reads one
(tile, F) x block and writes one (tile, H) h block + one (tile, H) c
residual; the backward streams x/h/c/dh blocks at reversed time indices
while accumulating dW/dU/db directly in its VMEM-resident output blocks
(index maps constant in t, so they flush once per tile). With per-step
residency measured in hundreds of KB the tile is 512 rows — full-width
MXU matmuls (512, F+H) @ (F+H, 512) — while HBM traffic per step drops
to the tensors that fundamentally must move.

Mixed precision matches models/bilstm.py: x/h and the h_out output stay
in the input dtype (bf16 under bf16 compute), gate math and the cell
state run float32 (the additive accumulation path), parameter gradients
come back float32. Gradient-correctness is pinned against ``jax.grad``
of the lax.scan reference in interpret mode
(tests/test_pallas_bilstm_stream.py).

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

_INTERPRET = False  # tests flip this for CPU interpret-mode runs


def _split_gates(gates, hidden):
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    return i, f, g, o


def _fwd_kernel(x_ref, w_ref, u_ref, b_ref, h_out_ref, c_out_ref,
                h_scr, c_scr):
    t = pl.program_id(1)
    hidden = u_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    gates = (
        jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(h_scr[...], u_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )
    i, f, g, o = _split_gates(gates, hidden)
    c_new = f * c_scr[...] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[...] = h_new.astype(h_scr.dtype)
    c_scr[...] = c_new
    h_out_ref[...] = h_new.astype(h_out_ref.dtype)
    c_out_ref[...] = c_new


def _bwd_kernel(x_ref, h_prev_ref, c_prev_ref, c_t_ref, dh_out_ref,
                w_ref, u_ref, b_ref,
                dx_ref, dw_ref, du_ref, db_ref,
                dh_scr, dc_scr):
    k = pl.program_id(1)
    t_len = pl.num_programs(1)
    t = t_len - 1 - k
    hidden = u_ref.shape[0]

    @pl.when(k == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        du_ref[...] = jnp.zeros_like(du_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # t == 0 fetches block index 0 for the t-1 operands; mask to the real
    # initial state (zeros)
    live = (t > 0).astype(jnp.float32)
    h_prev = h_prev_ref[...].astype(jnp.float32) * live
    c_prev = c_prev_ref[...] * live

    # recompute the gate activations (cheap MXU work vs streaming them)
    gates = (
        jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(h_prev.astype(x_ref.dtype), u_ref[...],
                  preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )
    i, f, g, o = _split_gates(gates, hidden)
    tanh_c = jnp.tanh(c_t_ref[...])

    dh = dh_out_ref[...].astype(jnp.float32) + dh_scr[...]
    dc = dc_scr[...] + dh * o * (1.0 - tanh_c * tanh_c)
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
    dx_ref[...] = jnp.dot(
        dgates, w_ref[...].astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    dh_scr[...] = jnp.dot(
        dgates, u_ref[...].astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    dc_scr[...] = dc * f
    dw_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.float32).T, dgates,
        preferred_element_type=jnp.float32,
    )
    du_ref[...] += jnp.dot(h_prev.T, dgates,
                           preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)


def _pick_tile(n2: int) -> int:
    """Per-step VMEM residency is a handful of (tile, 512) blocks, so the
    tile is grid-overhead-bound more than VMEM-bound: at batch 10240 the
    measured fwd+bwd legs are 8.27/12.03 ms at tile 512 and 7.93/11.73 at
    1024 (lstm1/lstm2, tools/step_decomp.py) — fewer, fatter grid cells
    amortize the per-cell dispatch. 2048 fails to compile (VMEM: the
    backward streams five (tile, 128+) blocks plus f32 scratch). The
    per-direction tile count must stay integral."""
    for tile in (1024, 512, 256, 128, 64, 32, 16, 8):
        if (n2 // 2) % tile == 0:
            return tile
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(xs, w, u, b, *, interpret=False):
    """xs: (T, 2B, F) stacked directions; w/u/b stacked (2, ...).
    Returns (h_out in xs.dtype, c_out f32), each (T, 2B, H)."""
    t_len, n2, feat = xs.shape
    hidden = u.shape[1]
    tile = _pick_tile(n2)
    tiles_per_dir = (n2 // 2) // tile
    grid = (n2 // tile, t_len)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, n2, hidden), xs.dtype),
            jax.ShapeDtypeStruct((t_len, n2, hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile, feat), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden),
                         lambda i, t, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden),
                         lambda i, t, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden),
                         lambda i, t, _t=tiles_per_dir: (i // _t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, tile, hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), xs.dtype),
            pltpu.VMEM((tile, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, w, u, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_pallas(xs, h_out, c_out, dh_out, w, u, b, *, interpret=False):
    """Returns (dx (T,2B,F) in xs.dtype, per-tile dw/du/db f32 partials);
    weight-gradient partials are summed per direction by the caller."""
    t_len, n2, feat = xs.shape
    hidden = u.shape[1]
    tile = _pick_tile(n2)
    n_tiles = n2 // tile
    tiles_per_dir = n_tiles // 2
    grid = (n_tiles, t_len)

    def at_t(i, k):
        return (t_len - 1 - k, i, 0)

    def at_t_prev(i, k):
        # t-1, clamped to 0 at t == 0 (the kernel masks that fetch)
        return (jnp.maximum(t_len - 2 - k, 0), i, 0)

    def weight(i, k, _t=tiles_per_dir):
        return (i // _t, 0, 0)

    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, n2, feat), xs.dtype),
            jax.ShapeDtypeStruct((n_tiles, feat, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, hidden, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 4 * hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile, feat), at_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, hidden), at_t_prev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, hidden), at_t_prev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, hidden), at_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, hidden), at_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden), weight,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden), weight,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden), weight,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, tile, feat), at_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, feat, 4 * hidden), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hidden, 4 * hidden), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 4 * hidden), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), jnp.float32),
            pltpu.VMEM((tile, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, h_out, c_out, c_out, dh_out, w, u, b)


# ---------------------------------------------------------------------------
# custom_vjp wrapper with the models.bilstm API
# ---------------------------------------------------------------------------


def _stack_params(params: Dict, dtype):
    w = jnp.stack([jnp.asarray(params["fw"]["w"], dtype),
                   jnp.asarray(params["bw"]["w"], dtype)])
    u = jnp.stack([jnp.asarray(params["fw"]["u"], dtype),
                   jnp.asarray(params["bw"]["u"], dtype)])
    b = jnp.stack([jnp.asarray(params["fw"]["b"], jnp.float32)[None],
                   jnp.asarray(params["bw"]["b"], jnp.float32)[None]])
    return w, u, b


@jax.custom_vjp
def bilstm_train_stream(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for models.bilstm.bilstm: (B, T, F) -> (B, T, 2H) in
    x.dtype, with the streaming-grid fused backward."""
    out, _ = _bilstm_fwd(params, x)
    return out


def _bilstm_fwd(params: Dict, x: jnp.ndarray):
    b, t_len, feat = x.shape
    # pad to a 512 multiple: _pick_tile still selects 1024-row tiles
    # whenever the padded batch divides (e.g. 10000 -> 10240), while a
    # 1024 pad grain would waste up to 2x compute on batches just above
    # a 1024 boundary (1025 -> 2048 instead of 1536)
    pad_to = 512 if b >= 512 else 8
    bp = ((b + pad_to - 1) // pad_to) * pad_to
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
    w, u, bias = _stack_params(params, x.dtype)
    xs = _stack_directions(x)
    h_out, c_out = _fwd_pallas(xs, w, u, bias, interpret=_INTERPRET)
    out = _unstack_outputs(h_out, bp)[:b]
    return out, (params, xs, h_out, c_out, b)


def _bilstm_bwd(residual, dout):
    params, xs, h_out, c_out, b = residual
    bp = xs.shape[1] // 2
    hidden = dout.shape[-1] // 2
    dout = dout.astype(xs.dtype)
    if bp != b:
        dout = jnp.pad(dout, ((0, bp - b), (0, 0), (0, 0)))
    d_fw = dout[..., :hidden].transpose(1, 0, 2)
    d_bw = jnp.flip(dout[..., hidden:], axis=1).transpose(1, 0, 2)
    dh_out = jnp.concatenate([d_fw, d_bw], axis=1)

    w, u, bias = _stack_params(params, xs.dtype)
    dx_s, dw_t, du_t, db_t = _bwd_pallas(
        xs, h_out, c_out, dh_out, w, u, bias, interpret=_INTERPRET
    )
    half = dw_t.shape[0] // 2
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
    dx_fw = dx_s[:, :bp].transpose(1, 0, 2)
    dx_bw = jnp.flip(dx_s[:, bp:].transpose(1, 0, 2), axis=1)
    dx = (dx_fw + dx_bw)[:b]
    dparams = jax.tree.map(
        lambda g, p: g.astype(jnp.asarray(p).dtype), dparams,
        {k: dict(v) for k, v in params.items()},
    )
    return dparams, dx


bilstm_train_stream.defvjp(_bilstm_fwd, _bilstm_bwd)


def bilstm_train_stream_meshed(mesh, axis: str = "data"):
    """Mesh-shardable streaming kernel: shard_map over the batch axis.

    A pallas_call is opaque to GSPMD — under a mesh the partitioner would
    gather the full batch onto every device, so meshed training and
    sharded inference used to fall back to the ~2x-slower scan. This
    wrapper runs the kernel per-device on the local batch shard instead:

    - forward: x arrives sharded on ``axis``; each device pads its own
      shard, stacks directions, and runs _fwd_pallas locally. Outputs and
      residuals stay sharded (residual arrays are (T, 2bp, .), sharded on
      the stacked-batch axis 1).
    - backward: per-device _bwd_pallas on the local residuals; dx stays
      sharded, parameter gradients psum over ``axis`` (params are
      replicated, so their cotangent is the cross-shard sum).

    Mesh axes not named here (e.g. 'model') are untouched: the BiLSTM is
    replicated over them, exactly as under the GSPMD scan path. Numerics
    match the single-device kernel per shard; the psum changes dparam
    accumulation order across shards only (same tolerance family as the
    scan's all-reduce). Returns a drop-in for models.bilstm.bilstm.
    """
    pspec = jax.sharding.PartitionSpec()
    xspec = jax.sharding.PartitionSpec(axis)
    rspec = jax.sharding.PartitionSpec(None, axis)

    def fwd_local(params, x):
        out, (_, xs, h_out, c_out, _b) = _bilstm_fwd(params, x)
        return out, xs, h_out, c_out

    def bwd_local(params, xs, h_out, c_out, dout):
        dparams, dx = _bilstm_bwd(
            (params, xs, h_out, c_out, dout.shape[0]), dout
        )
        return jax.lax.psum(dparams, axis), dx

    sm_fwd = jax.shard_map(
        fwd_local, mesh=mesh, in_specs=(pspec, xspec),
        out_specs=(xspec, rspec, rspec, rspec), check_vma=False,
    )
    sm_bwd = jax.shard_map(
        bwd_local, mesh=mesh,
        in_specs=(pspec, rspec, rspec, rspec, xspec),
        out_specs=(pspec, xspec), check_vma=False,
    )

    @jax.custom_vjp
    def meshed(params, x):
        return sm_fwd(params, x)[0]

    def meshed_fwd(params, x):
        out, xs, h_out, c_out = sm_fwd(params, x)
        return out, (params, xs, h_out, c_out)

    def meshed_bwd(residual, dout):
        params, xs, h_out, c_out = residual
        return sm_bwd(params, xs, h_out, c_out, dout)

    meshed.defvjp(meshed_fwd, meshed_bwd)
    return meshed
