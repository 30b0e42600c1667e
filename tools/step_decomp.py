"""On-chip train-step latency decomposition for the <30 ms/step hunt.

Measures, at the production operating point (batch 10,000, bf16 compute,
streaming-grid Pallas BiLSTM — the train_model default on 1-chip TPU):

  1. the full train step (the bench protocol number),
  2. the step with deterministic=True (no dropout mask generation),
  3. fwd+bwd of each BiLSTM leg in isolation,
  4. the same legs at larger batch tiles (grid-overhead probe),
  5. the trunk alone (LSTM outputs precomputed, heads+loss+optimizer).

Usage: python tools/step_decomp.py [--batch 10000]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def bench_ms(fn, *args, iters=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    warm = (time.perf_counter() - t0) / 3
    best = warm
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=10000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from clair_tpu.models.clair import init_params
    from clair_tpu.ops import pallas_bilstm_stream as stream
    from clair_tpu.params import ModelConfig
    from clair_tpu.parallel.sharding import loss_fn, make_optimizer
    from clair_tpu.utils.jaxcache import enable

    enable()
    config = ModelConfig(compute_dtype="bfloat16",
                         use_pallas_stream_bilstm=True)
    params = init_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer(config.optimizer_name, learning_rate=1e-3)
    opt_state = optimizer.init(params)
    rs = np.random.RandomState(1)
    batch = args.batch
    x = jnp.asarray(rs.rand(batch, 33, 8, 4), jnp.float32)
    y = np.zeros((batch, 90), np.float32)
    y[:, 0] = 1.0
    y[:, 21] = 1.0
    y[:, 24 + 16] = 1.0
    y[:, 57 + 16] = 1.0
    y = jnp.asarray(y)
    l2 = jnp.float32(config.l2_regularization_lambda)

    def make_loop(cfg, deterministic=False, rng_impl="threefry2x32"):
        @partial(jax.jit, static_argnums=(4,))
        def loop(params, opt_state, x, y, iters):
            def body(carry, k):
                params, opt_state = carry
                rng = jax.random.fold_in(
                    jax.random.key(2, impl=rng_impl), k)
                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, x, y, rng, cfg, l2, deterministic, None
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss
            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(iters))
            return losses[-1]
        return lambda: float(loop(params, opt_state, x, y, 20))

    def step_ms(fn):
        fn()  # compile
        t0 = time.perf_counter()
        fn()
        one = time.perf_counter() - t0
        best = one
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best / 20 * 1e3

    full = step_ms(make_loop(config))
    print(f"full step (bf16 stream, threefry dropout): {full:.2f} ms",
          flush=True)
    rbg = step_ms(make_loop(config, rng_impl="rbg"))
    print(f"  rbg dropout (the train default):  {rbg:.2f} ms", flush=True)
    nodrop = step_ms(make_loop(config, deterministic=True))
    print(f"  deterministic (no dropout):       {nodrop:.2f} ms  "
          f"(threefry mask cost {full - nodrop:.2f} ms)", flush=True)
    scan_cfg = dataclasses.replace(config, use_pallas_stream_bilstm=False)
    scan = step_ms(make_loop(scan_cfg))
    print(f"  scan+remat step (comparison):     {scan:.2f} ms", flush=True)

    # --- BiLSTM legs in isolation, fwd+bwd, per tile size -----------------
    # goes through the custom_vjp wrapper (pallas_call itself has no
    # autodiff rule); the inner jitted pallas builders are cache-cleared
    # between tile overrides so the monkeypatched _pick_tile takes effect
    hidden = 128
    b_rows = ((batch + 511) // 512) * 512

    def leg(feat, tile):
        lparams = {
            d: {
                "w": jnp.asarray(rs.rand(feat, 4 * hidden) * 0.05,
                                 jnp.float32),
                "u": jnp.asarray(rs.rand(hidden, 4 * hidden) * 0.05,
                                 jnp.float32),
                "b": jnp.zeros((4 * hidden,), jnp.float32),
            }
            for d in ("fw", "bw")
        }
        xin = jnp.asarray(rs.rand(b_rows, 33, feat), jnp.bfloat16)
        orig = stream._pick_tile
        stream._pick_tile = lambda _n2, _tile=tile: _tile
        stream._fwd_pallas.clear_cache()
        stream._bwd_pallas.clear_cache()
        try:
            @jax.jit
            def fwdbwd(lparams, xin):
                def f(p, x_):
                    return jnp.sum(
                        stream.bilstm_train_stream(p, x_).astype(jnp.float32))
                return jax.value_and_grad(f, argnums=(0, 1))(lparams, xin)

            ms = bench_ms(fwdbwd, lparams, xin)
        finally:
            stream._pick_tile = orig
            stream._fwd_pallas.clear_cache()
            stream._bwd_pallas.clear_cache()
        return ms

    for feat, name in ((32, "lstm1"), (256, "lstm2")):
        for tile in (512, 1024, 2048):
            if b_rows % tile:
                continue
            try:
                ms = leg(feat, tile)
                print(f"  {name} fwd+bwd tile={tile}: {ms:.2f} ms",
                      flush=True)
            except Exception as exc:
                print(f"  {name} fwd+bwd tile={tile}: FAILED "
                      f"({type(exc).__name__}: {str(exc)[:160]})", flush=True)


if __name__ == "__main__":
    main()
