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

    # --- the residual: trunk alone + optimizer tail alone ----------------
    # trunk = L3 slice-dense -> L4 -> stems -> heads -> loss, fwd+bwd+Adam,
    # with the BiLSTM outputs precomputed (so this isolates the ~residual
    # the full-step number carries above the two kernel legs)
    import jax.numpy as _jnp

    from clair_tpu.models.losses import total_loss

    h2 = _jnp.asarray(rs.rand(batch, 33, 256), _jnp.bfloat16)

    trunk_keys = ("l3", "l4", "l5_1", "l5_2", "l5_3", "l5_4",
                  "head_gt21", "head_genotype", "head_len1", "head_len2")
    tparams = {k: params[k] for k in trunk_keys}
    topt = make_optimizer(config.optimizer_name, learning_rate=1e-3)
    topt_state = topt.init(tparams)

    def trunk_loss(tp, h, y, rng):
        # the trunk math inlined to match forward_logits exactly
        # (selu-on-logits contract included)
        from clair_tpu.models.layers import alpha_dropout, selu

        k_l4, k5 = jax.random.split(rng)
        l3 = _jnp.einsum("btf,ftu->buf", h, tp["l3"]["w"].astype(h.dtype))
        l3 = selu(l3 + tp["l3"]["b"].astype(h.dtype).T[None])
        l3 = l3.reshape(h.shape[0], -1)
        l4 = selu(l3 @ tp["l4"]["w"].astype(h.dtype)
                  + tp["l4"]["b"].astype(h.dtype))
        l4 = alpha_dropout(k_l4, l4, 0.5)
        logits = []
        for si, (stem_k, head_k) in enumerate((
            ("l5_1", "head_gt21"), ("l5_2", "head_genotype"),
            ("l5_3", "head_len1"), ("l5_4", "head_len2"),
        )):
            s = selu(l4 @ tp[stem_k]["w"].astype(h.dtype)
                     + tp[stem_k]["b"].astype(h.dtype))
            s = alpha_dropout(jax.random.fold_in(k5, si), s, 0.2)
            logits.append(selu(s @ tp[head_k]["w"].astype(h.dtype)
                               + tp[head_k]["b"].astype(h.dtype)))
        return total_loss(tuple(logits), y, tp,
                          loss_function=config.loss_function,
                          l2_lambda=l2)[0]

    @partial(jax.jit, static_argnums=(4,))
    def trunk_loop(tp, ts, h, y, iters):
        def body(carry, k):
            tp, ts = carry
            rng = jax.random.fold_in(jax.random.key(3, impl="rbg"), k)
            loss, grads = jax.value_and_grad(trunk_loss)(tp, h, y, rng)
            updates, ts = topt.update(grads, ts, tp)
            import optax as _optax

            tp = _optax.apply_updates(tp, updates)
            return (tp, ts), loss
        (_, _), losses = jax.lax.scan(body, (tp, ts), _jnp.arange(iters))
        return losses[-1]

    def trunk_run():
        return float(trunk_loop(tparams, topt_state, h2, y, 20))

    print(f"  trunk fwd+bwd+Adam (lstm outs precomputed): "
          f"{step_ms(trunk_run):.2f} ms", flush=True)

    # optimizer tail alone: clip-by-global-norm + Adam over the FULL pytree
    import optax as _optax

    grads0 = jax.tree.map(lambda p: _jnp.ones_like(p) * 1e-3, params)

    @partial(jax.jit, static_argnums=(3,))
    def opt_loop(p, s, g, iters):
        def body(carry, _):
            p, s = carry
            updates, s = optimizer.update(g, s, p)
            p = _optax.apply_updates(p, updates)
            return (p, s), updates["l4"]["b"][0]
        (_, _), u = jax.lax.scan(body, (p, s), None, length=iters)
        return u[-1]

    def opt_run():
        return float(opt_loop(params, opt_state, grads0, 20))

    print(f"  optimizer tail alone (clip + Adam, full pytree): "
          f"{step_ms(opt_run):.2f} ms", flush=True)

    # flattened optimizer: the tail is many-small-tensor bound, not
    # byte bound (~30 MB of f32 state at HBM rate is ~0.1 ms) — flatten
    # the pytree into one contiguous vector and the elementwise Adam math
    # becomes a handful of big fused ops
    fopt = _optax.flatten(optimizer)
    fopt_state = fopt.init(params)

    @partial(jax.jit, static_argnums=(3,))
    def fopt_loop(p, s, g, iters):
        def body(carry, _):
            p, s = carry
            updates, s = fopt.update(g, s, p)
            p = _optax.apply_updates(p, updates)
            return (p, s), updates["l4"]["b"][0]
        (_, _), u = jax.lax.scan(body, (p, s), None, length=iters)
        return u[-1]

    def fopt_run():
        return float(fopt_loop(params, fopt_state, grads0, 20))

    print(f"  optimizer tail, optax.flatten:    {step_ms(fopt_run):.2f} ms",
          flush=True)

    # --- trunk internals: which piece owns the ~7 ms ---------------------
    # each piece runs fwd+bwd in a 20-iter scan with a loop-carried param
    # nudge so XLA cannot fold or dead-code the math
    def piece_ms(f, inputs):
        @partial(jax.jit, static_argnums=(1,))
        def loop(carry, iters):
            def body(c, _):
                loss, g = jax.value_and_grad(f)(c)
                c = jax.tree.map(
                    lambda a, b: a - (1e-6 * b).astype(a.dtype), c, g)
                return c, loss
            c, losses = jax.lax.scan(body, carry, None, length=iters)
            return losses[-1]

        def run():
            return float(loop(inputs, 20))

        return step_ms(run)

    w3 = params["l3"]["w"].astype(_jnp.bfloat16)
    b3 = params["l3"]["b"].astype(_jnp.bfloat16)
    w4 = params["l4"]["w"].astype(_jnp.bfloat16)
    b4 = params["l4"]["b"].astype(_jnp.bfloat16)

    def l3_buf(c):
        # production layout: (B,33,256)x(256,33,30) -> (B,30,256) -> (B,7680)
        from clair_tpu.models.layers import selu
        l3 = _jnp.einsum("btf,ftu->buf", c["h"], c["w"])
        l3 = selu(l3 + c["b"].T[None])
        return _jnp.sum(l3.reshape(c["h"].shape[0], -1).astype(_jnp.float32))

    def l3_bfu(c):
        # candidate layout: output (B,256,30); the flatten to (B,7680) is
        # then a free trailing-dims reshape (W4 rows permuted to match)
        from clair_tpu.models.layers import selu
        l3 = _jnp.einsum("btf,ftu->bfu", c["h"], c["w"])
        l3 = selu(l3 + c["b"][None])
        return _jnp.sum(l3.reshape(c["h"].shape[0], -1).astype(_jnp.float32))

    print(f"  L3 einsum fwd+bwd, buf layout:    "
          f"{piece_ms(l3_buf, dict(h=h2, w=w3, b=b3)):.2f} ms", flush=True)
    print(f"  L3 einsum fwd+bwd, bfu layout:    "
          f"{piece_ms(l3_bfu, dict(h=h2, w=w3, b=b3)):.2f} ms", flush=True)

    l3_flat = _jnp.asarray(rs.rand(batch, 7680), _jnp.bfloat16)

    def l4_only(c):
        from clair_tpu.models.layers import selu
        return _jnp.sum(selu(c["l3"] @ c["w"] + c["b"]).astype(_jnp.float32))

    print(f"  L4 dense fwd+bwd (7680x192):      "
          f"{piece_ms(l4_only, dict(l3=l3_flat, w=w4, b=b4)):.2f} ms",
          flush=True)

    l4_act = _jnp.asarray(rs.rand(batch, 192), _jnp.bfloat16)
    head_p = {k: jax.tree.map(lambda a: a.astype(_jnp.bfloat16), params[k])
              for k in ("l5_1", "l5_2", "l5_3", "l5_4", "head_gt21",
                        "head_genotype", "head_len1", "head_len2")}

    def heads_loss(c):
        from clair_tpu.models.layers import selu
        logits = []
        for stem_k, head_k in (("l5_1", "head_gt21"),
                               ("l5_2", "head_genotype"),
                               ("l5_3", "head_len1"),
                               ("l5_4", "head_len2")):
            s = selu(c["l4"] @ c[stem_k]["w"] + c[stem_k]["b"])
            logits.append(selu(s @ c[head_k]["w"] + c[head_k]["b"]))
        return total_loss(tuple(logits), y, {},
                          loss_function=config.loss_function,
                          l2_lambda=_jnp.float32(0.0))[0]

    print(f"  stems+heads+loss fwd+bwd:         "
          f"{piece_ms(heads_loss, dict(l4=l4_act, **head_p)):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
