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


def test_bf16_decode_decisions_match_f32(tmp_path):
    """The F1 guard for the bfloat16 inference default: on a confident
    (converged-like) model, f32 and bf16 predictors must call the SAME
    sites with the SAME alleles and genotypes. (Verified end-to-end on the
    demo-trained model: identical 144 call sites, recall 0.960 both.)
    QUAL/AF may drift within rounding."""
    import io

    from clair_tpu.data.tensor_stream import LazyTensorInfos
    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.models.clair import init_params
    from clair_tpu.pipeline.call_var import Predictor, _decode_batch
    from clair_tpu.pipeline.decode import IndelSources, OutputConfig

    rs = np.random.RandomState(0)
    seq = "".join(rs.choice(list("ACGT"), 33))
    base_idx = {"A": 0, "C": 1, "G": 2, "T": 3}
    x = np.zeros((33, 8, 4), np.float32)
    for row in range(33):
        b = base_idx[seq[row]]
        x[row, b, 0] = 30
        x[row, b + 4, 0] = 30
        x[row, b, 1] = x[row, b, 3] = 30
        x[row, b + 4, 1] = x[row, b + 4, 3] = 30
    x[..., 1:] -= x[..., 0:1]
    xs = np.tile(x, (64, 1, 1, 1)) + rs.randint(0, 2, (64, 33, 8, 4)).astype(np.float32)

    base = ModelConfig(lstm1_num_units=8, lstm2_num_units=8, l3_num_units=4,
                       l4_num_units=16, l5_num_units=8)
    params = init_params(jax.random.PRNGKey(0), base)
    # confident heads: hom-ref at even sites, hom-SNP at odd (via genotype bias)
    params["head_genotype"]["b"] = params["head_genotype"]["b"].at[0].add(9.0)
    params["head_len1"]["b"] = params["head_len1"]["b"].at[16].add(9.0)
    params["head_len2"]["b"] = params["head_len2"]["b"].at[16].add(9.0)

    def call_rows(dtype):
        config = dataclasses.replace(base, compute_dtype=dtype)
        predictor = Predictor(params, config, batch_size=64)
        out, n = predictor.predict_async(xs)
        sink = io.StringIO()
        writer = VcfWriter(sink)
        infos = LazyTensorInfos("chr1", np.arange(100, 164, dtype=np.int64), [seq] * 64)
        _decode_batch((infos, xs, out, n), predictor,
                      OutputConfig(is_show_reference=True), writer,
                      IndelSources(), None)
        return sink.getvalue().splitlines()

    rows32, rows16 = call_rows("float32"), call_rows("bfloat16")
    assert len(rows32) == len(rows16) > 0

    def decisions(rows):
        out = []
        for r in rows:
            c = r.split("\t")
            out.append((c[0], c[1], c[3], c[4], c[9].split(":")[0]))
        return out

    assert decisions(rows32) == decisions(rows16)


def test_bf16_cell_state_accumulates_in_f32():
    """The cell state is the additive accumulator of the recurrence — it
    carries float32 under bf16 compute (models/bilstm.py:_cell_dtype).
    Guard: the shipped bf16 path must track the f32 reference at least as
    well as an all-bf16-carry variant reproduced inline (the pre-fix
    behavior), and h outputs stay bf16 (the matmul/traffic win)."""
    import jax.numpy as jnp

    from clair_tpu.models.bilstm import bilstm, init_bilstm_params

    rng = jax.random.PRNGKey(2)
    params = init_bilstm_params(rng, 32, 128)
    x = np.random.RandomState(3).randn(4, 33, 32).astype(np.float32) * 2

    ref = np.asarray(bilstm(params, jnp.asarray(x)), np.float32)
    p16 = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)
    out16 = bilstm(p16, jnp.asarray(x, jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    err_fixed = np.abs(np.asarray(out16, np.float32) - ref).mean()

    def all_bf16_carry(params, x):
        b = x.shape[0]
        xw_fw = x @ params["fw"]["w"] + params["fw"]["b"]
        xw_bw = jnp.flip(x, axis=1) @ params["bw"]["w"] + params["bw"]["b"]
        xw = jnp.concatenate(
            [xw_fw.transpose(1, 0, 2), xw_bw.transpose(1, 0, 2)], axis=1)

        def step(carry, xw_t):
            h, c = carry
            rec = jnp.concatenate(
                [h[:b] @ params["fw"]["u"], h[b:] @ params["bw"]["u"]], axis=0)
            i, f, g, o = jnp.split(xw_t + rec, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((2 * b, 128), x.dtype)
        (_, _), outputs = jax.lax.scan(step, (h0, h0), xw)
        out_fw = outputs[:, :b].transpose(1, 0, 2)
        out_bw = jnp.flip(outputs[:, b:].transpose(1, 0, 2), axis=1)
        return jnp.concatenate([out_fw, out_bw], axis=-1)

    old = all_bf16_carry(p16, jnp.asarray(x, jnp.bfloat16))
    err_old = np.abs(np.asarray(old, np.float32) - ref).mean()
    assert err_fixed <= err_old * 1.02, (err_fixed, err_old)


def test_predictor_auto_picks_stream_kernel_on_tpu_only():
    """The single-device Predictor flips use_pallas_stream_bilstm for
    reduced-precision TPU prediction (measured 1.97M vs 1.50M tensors/s at
    batch 512 bf16); f32, non-TPU backends, and explicit kernel choices
    are left alone."""
    from clair_tpu.pipeline.call_var import _auto_stream_kernel

    bf16 = ModelConfig(compute_dtype="bfloat16")
    assert _auto_stream_kernel(bf16, "tpu").use_pallas_stream_bilstm
    assert not _auto_stream_kernel(bf16, "cpu").use_pallas_stream_bilstm
    f32 = ModelConfig()
    assert not _auto_stream_kernel(f32, "tpu").use_pallas_stream_bilstm
    explicit = dataclasses.replace(bf16, use_pallas_bilstm=True)
    picked = _auto_stream_kernel(explicit, "tpu")
    assert picked.use_pallas_bilstm and not picked.use_pallas_stream_bilstm
