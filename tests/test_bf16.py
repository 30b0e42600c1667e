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
