"""Benchmark: call_var pipeline throughput (pileup tensors/sec) on one TPU
chip vs the reference's CPU operating point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages"}.

Methodology: the pipeline stages overlap (JAX async dispatch: host decodes
batch N-1 while the device runs batch N), so steady-state throughput is the
minimum of the stage throughputs:

  1. device: jitted multi-task BiLSTM forward at the production predict batch.
     MEASUREMENT PROTOCOL: on this image's remote 'axon' TPU,
     jax.block_until_ready is NOT a real device sync (30 dispatched
     batches "complete" in 5 ms — physically impossible), so timing a
     Python dispatch loop measures dispatch, not compute. Device numbers
     here come from an in-jit lax.scan loop with a data dependency between
     iterations and a value fetch at the end, timed at 1 vs 51 iterations
     so the tunnel round-trip cancels: per_iter = (t51 - t1) / 50.
  2. host decode: the production path (native C++ fast-path decoder with
     the Python lattice fallback) + VCF row emission, measured on this
     host's CPU over REAL window batches: pileup tensors from simulated
     flowcells, probabilities from the vendored trained checkpoints'
     actual forward output, event-indexed indel recovery sources wired in.
     The HEADLINE decode leg is the ONT regime (the reference's first
     platform, README.md:57-59) where a large share of sites leave the
     SNP fast path; the clean short-read regime is reported alongside.

Both float32 (the default — exact parity with converted reference
checkpoints; the unrolled BiLSTM made bf16's speed advantage vanish) and
bfloat16 are recorded in "stages", as are train-step samples/sec.

Baseline: the reference runs its TF1.13 network on 4 CPU threads
(README.md:310) at predict batch 1000; TF1.13 cannot be installed here, so
the SAME network in torch (CPU, 4 threads, MKL) is measured as the
stand-in, forward only — generous to the reference, whose per-site Python
decode is not charged. vs_baseline = value / cpu_tps.
"""

import dataclasses
import io
import json
import os
import sys
import time
from functools import partial

import numpy as np

# device/decode stages run at the production predict batch (512: the
# unrolled BiLSTM's VMEM sweet spot, ~2x batch-1000 throughput); the CPU
# baseline keeps the reference's own batch-1000 operating point.
BATCH = 512
BASELINE_BATCH = 1000
TRAIN_BATCH = 10_000


def _positive_samples(sample, tries=5):
    """All positive differenced timings out of several tries (smallest
    first).

    The remote link occasionally stalls mid-measurement; a stall during the
    1-iteration calibration makes the difference NEGATIVE, so clamping
    would let a poisoned sample win. Non-positive samples are discarded; a
    stall during the N-iteration run only ever makes a sample slower, so
    min() over positives is robust. If every try is poisoned, fall back to
    the N-run mean (round trip included) — pessimistic but sane."""
    values = []
    last_total = None
    for _ in range(tries):
        started = time.perf_counter()
        value = sample()
        last_total = time.perf_counter() - started
        if value > 0:
            values.append(value)
    if not values:
        return [last_total / 2]  # ~ the N-run wall clock per iteration block
    return sorted(values)


def _best_positive_sample(sample, tries=5):
    return _positive_samples(sample, tries)[0]


def _cpu_seconds() -> float:
    """Cumulative user+sys CPU seconds of this process and its reaped
    children. Per-stage deltas land in the artifact so multi-core
    throughput is derivable on hosts with >1 core even though this harness
    has one: a stage whose CPU seconds ~= wall seconds is compute-bound
    (scales with workers); one far below wall is waiting on the link."""
    import resource

    r = resource.getrusage(resource.RUSAGE_SELF)
    c = resource.getrusage(resource.RUSAGE_CHILDREN)
    return r.ru_utime + r.ru_stime + c.ru_utime + c.ru_stime


def _load_vendored(name):
    """Load a vendored per-platform checkpoint (examples/, trained by
    examples/train_synthetic.py); None when absent so every stage has an
    init-params fallback."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", f"{name}_synthetic.ckpt")
    if not os.path.isfile(path):
        return None
    from clair_tpu.models.checkpoint import load_checkpoint

    params, _ = load_checkpoint(path)
    return params


# ---------------------------------------------------------------------------
# Synthetic flowcells (generation is NOT timed)
# ---------------------------------------------------------------------------

def _make_clean_bam(tmp, genome_mb=4.0, coverage=30):
    """Short-read flowcell: 150 bp pure-M reads, 0.2% error, ~1 het SNP/kb
    (the Illumina-like easy regime). Vectorized so the bench measures the
    caller, not the simulator. 4 Mb (since r04; r01-r03 used 1 Mb): ~1 het
    SNP/kb means 1 Mb filled only ~2 predict batches, so the e2e stage
    measured the fixed tunnel latency, not steady state — the recorded
    97.1/42.8/31.4 Mbp/min drift across r02-r04 was that. Mbp/min is
    size-normalized, so the bigger flowcell only removes the fixed-cost
    share."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.io.bam import BamWriter
    from clair_tpu.utils.simulate import write_fasta

    rs = np.random.RandomState(0)
    length = int(genome_mb * 1e6)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rs.randint(0, 4, length)]
    read_len = 150
    n_reads = length * coverage // read_len
    starts = np.sort(rs.randint(0, length - read_len, n_reads))
    reads = ref[starts[:, None] + np.arange(read_len)].copy()

    err = rs.rand(n_reads, read_len) < 0.002
    reads[err] = bases[rs.randint(0, 4, int(err.sum()))]
    snp_positions = np.arange(500, length - 500, 1000)
    for pos in snp_positions:
        lo = np.searchsorted(starts, pos - read_len + 1, side="left")
        hi = np.searchsorted(starts, pos, side="right")
        rows = np.arange(lo, hi)
        rows = rows[rs.rand(len(rows)) < 0.5]
        alt = bases[(np.searchsorted(bases, ref[pos]) + 1) % 4]
        reads[rows, pos - starts[rows]] = alt

    fasta_path = os.path.join(tmp, "clean_ref.fa")
    bam_path = os.path.join(tmp, "clean.bam")
    write_fasta(fasta_path, ref.tobytes().decode("ascii"))
    cigar = [(read_len, "M")]
    with BamWriter(bam_path, [("chr1", length)]) as writer:
        for i in range(n_reads):
            writer.write(
                f"r{i}", 0, int(starts[i]), 60, 0, cigar,
                reads[i].tobytes().decode("ascii"),
            )
    build_bai(bam_path, bam_path + ".bai")
    return bam_path, fasta_path, length


def _make_ont_bam(tmp, genome_kb=1200, coverage=35):
    """ONT-like flowcell via the shared vectorized simulator
    (utils.simulate.simulate_ont_fast): lognormal read lengths, 5%
    mismatch, ~5% indels with homopolymer-boosted deletions, systematic
    error hotspots, planted SNP/ins/del variants every ~1.2 kb. This is
    the regime the reference was built for (ONT first, README.md:57-59):
    a large share of candidate sites carry indel evidence and leave the
    SNP fast path."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import simulate_ont_fast, write_fasta

    rs = np.random.RandomState(7)
    length = genome_kb * 1000
    fasta_path = os.path.join(tmp, "ont_ref.fa")
    bam_path = os.path.join(tmp, "ont.bam")
    reference, _variants = simulate_ont_fast(
        bam_path, rs, length=length, coverage=coverage
    )
    write_fasta(fasta_path, reference)
    build_bai(bam_path, bam_path + ".bai")
    return bam_path, fasta_path, length


def _make_ont_highcov_bam(tmp, genome_kb=1000, coverage=550):
    """BASELINE config-5 regime (578x HG002HD): the same ONT error model
    at ~550x coverage. Re-sized in r05 (r04 used 100 kb, which filled
    only 3 predict batches — below the >=10-batch steady-state bar r04
    itself established for the standard e2e stage, so the recorded number
    measured tunnel latency, not the 250+-depth regime; the measured
    density is ~10.2 candidates/kb, so 1 Mb fills the 20-batch bar). The per-start-position
    depth cap and dense pileup columns are what this regime uniquely
    exercises (tests/test_highcov.py proves the cap semantics; this stage
    records the throughput)."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import simulate_ont_fast, write_fasta

    rs = np.random.RandomState(9)
    length = genome_kb * 1000
    fasta_path = os.path.join(tmp, "ont_hc_ref.fa")
    bam_path = os.path.join(tmp, "ont_hc.bam")
    reference, _variants = simulate_ont_fast(
        bam_path, rs, length=length, coverage=coverage,
        mean_read_length=700.0,
    )
    write_fasta(fasta_path, reference)
    build_bai(bam_path, bam_path + ".bai")
    return bam_path, fasta_path, length


def _make_ccs_bam(tmp, genome_kb=3000, coverage=30):
    """PacBio CCS/HiFi flowcell: the vectorized simulator's 'ccs' recipe
    (~2 kb reads, ~0.5% indel-leaning error with mild systematic
    hotspots — utils/simulate.PLATFORM_FAST_RECIPES) at the reference's
    ~30x CCS operating point (/root/reference/README.md:391-395, HG005
    ~30x). Variants every 600 bp: the clean error model yields few
    noise candidates, so density comes from planted variants and the
    flowcell must be sized for e2e steady state (>=10 predict batches)."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import (
        platform_fast_kwargs,
        simulate_platform_fast,
        write_fasta,
    )

    rs = np.random.RandomState(11)
    length = genome_kb * 1000
    fasta_path = os.path.join(tmp, "ccs_ref.fa")
    bam_path = os.path.join(tmp, "ccs.bam")
    kwargs = platform_fast_kwargs("ccs", coverage=coverage)
    reference, _variants = simulate_platform_fast(
        bam_path, rs, length=length, variant_spacing=600, **kwargs
    )
    write_fasta(fasta_path, reference)
    build_bai(bam_path, bam_path + ".bai")
    return bam_path, fasta_path, length


def _synthetic_batch(batch=BATCH):
    """Realistic candidate tensors: ~60x depth sites, 1/3 alt support."""
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
    x[16, base_idx[seq[16]], 1] -= 20
    x[16, 3, 1] += 20
    x[16, 3, 3] += 20
    normalize_channels(x)
    xs = np.tile(x, (batch, 1, 1, 1))
    xs += rs.randint(0, 2, size=xs.shape).astype(np.float32)
    return xs, seq


# The standing measurement protocol for the device-forward stages, recorded
# verbatim in the artifact so round-over-round numbers are comparable (a
# drift under a pinned protocol is a regression; a protocol change must
# change this string). The step form is the batch-512 'hoisted' BiLSTM
# (models/bilstm.py picks it statically for B<=512).
DEVICE_FORWARD_PROTOCOL = (
    "STABLE (headline since r04): in-jit lax.scan diff (501-51 iters, "
    "median of 7) — the 450-batch compute delta dwarfs tunnel jitter. "
    "LEGACY (device_forward_tps_*, kept verbatim for r02/r03 "
    "comparability): scan diff (51-1 iters, best/median of 5); its 10 ms "
    "delta is jitter-order, which is the measured cause of the r02-r04 "
    "1.66M/1.39M/2.5M drift. f32/bf16 fields: hoisted BiLSTM step form. "
    "bf16_stream field (the CALLING default since the Predictor "
    "auto-picks the streaming Pallas kernel, r04): same timing protocol, "
    "streaming-grid kernel step form. All: batch "
    f"{BATCH}, int16 device-resident input, concat-free 4-head forward"
)

TRAIN_STEP_PROTOCOL = (
    f"in-jit lax.scan of 21-1 full train steps, batch {TRAIN_BATCH}, "
    "f32 device-resident input, rbg dropout stream (the train_model "
    "production rng since round 4; threefry measured +4.25 ms/step)"
)


def device_throughput(params, config, batch=BATCH):
    """Real device forward time via in-jit scan (see module docstring and
    DEVICE_FORWARD_PROTOCOL). Returns (tensors_per_sec legacy-best,
    tensors_per_sec stable-median, detail dict with per-batch ms)."""
    import jax
    import jax.numpy as jnp

    from clair_tpu.models.clair import forward

    xs, _ = _synthetic_batch(batch)
    x = jax.device_put(xs.astype(np.int16))

    @partial(jax.jit, static_argnums=(2,))
    def loop(params, x, iters):
        def body(carry, _):
            xi = x + carry.astype(x.dtype)  # runtime dependency: no hoisting
            o = forward(params, xi.astype(jnp.float32), config)
            return (o[0][0, 0] * 1e-20).astype(jnp.float32), ()
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return s

    float(loop(params, x, 1))
    float(loop(params, x, 51))
    float(loop(params, x, 501))

    def sample():
        t0 = time.perf_counter()
        float(loop(params, x, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, x, 51))
        return (time.perf_counter() - t0 - t1) / 50

    # STABLE protocol (standing since r04): (t501 - t51) / 450. Both calls
    # carry the same tunnel round trip, and the 450-batch compute delta
    # (~100 ms) is an order of magnitude above the link's jitter, where
    # the legacy (t51 - t1)/50 delta (~10 ms) was the same order as the
    # jitter — which is why the legacy best-of-5 drifted 1.66M/1.39M/2.5M
    # t/s across BENCH_r02-r04 for comparable code (a min of a noisy
    # subtraction is biased fast). Median of 7, not best: unbiased.
    def sample_stable():
        t0 = time.perf_counter()
        float(loop(params, x, 51))
        t51 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, x, 501))
        return (time.perf_counter() - t0 - t51) / 450

    samples = _positive_samples(sample)
    stable = sorted(sample_stable() for _ in range(7))
    stable_med = stable[len(stable) // 2]
    detail = {
        "ms_per_batch_best": round(samples[0] * 1e3, 4),
        "ms_per_batch_median": round(samples[len(samples) // 2] * 1e3, 4),
        "samples": len(samples),
        "ms_per_batch_stable": round(stable_med * 1e3, 4),
        "ms_per_batch_stable_spread": [round(stable[0] * 1e3, 4),
                                       round(stable[-1] * 1e3, 4)],
    }
    return batch / samples[0], batch / stable_med, detail


def decode_window_throughput(params, config, bam_path, fasta_path,
                             minimum_af, iters=20):
    """Host decode + VCF emission through the production path over a REAL
    window batch: tensors come from the production pileup on a simulated
    flowcell, probabilities from the given (vendored trained) checkpoint's
    actual forward output, and the indel sources are the window's
    event-indexed recovery tables (call_bam's production wiring) — so the
    sites that need recovery callbacks (het ins+ins, >=16 bp) take their
    real code path instead of a synthetic fast lane.

    Returns (sites_per_sec, indel_winner_fraction)."""
    import jax
    import jax.numpy as jnp

    from clair_tpu.data.tensor_stream import LazyTensorInfos, normalized_f32
    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.models.clair import forward
    from clair_tpu.pipeline.batch_decode import category_maxima
    from clair_tpu.pipeline.call_bam import CallBamConfig, prepare_window
    from clair_tpu.pipeline.call_var import _decode_batch, _device_input, _pack_uplink
    from clair_tpu.task.gt21 import gt21_code_from_label
    from clair_tpu.utils.genomics import BASE2ACGT

    work = prepare_window(CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
        minimum_af=minimum_af, minimum_coverage=4,
    ))
    n = min(len(work.tensors), BATCH)
    if n == 0:
        return 0.0, 0.0
    # raw uint8 counts (dcov <= 255) or channel-normalized float32 —
    # ship in the production link dtype and let the device normalize
    x = work.tensors[:n]
    infos = LazyTensorInfos("chr1", work.centers[:n], work.sequences[:n])

    fn = jax.jit(lambda p, t: forward(p, _device_input(t), config))
    out = [np.asarray(a) for a in fn(params, jax.device_put(_pack_uplink(x, n)))]

    # regime characterization: fraction of sites whose winning category is
    # an indel (leaves the vectorized SNP/ref fast path)
    ref_codes = np.array([
        gt21_code_from_label(BASE2ACGT.get(s[len(s) // 2], "A") * 2)
        for s in work.sequences[:n]
    ])
    winners = category_maxima(out[0], out[1], out[2], out[3], ref_codes).argmax(0)
    indel_fraction = float((winners > 2).mean())

    sink = io.StringIO()
    writer = VcfWriter(sink)

    class _Pre:
        def gather(self, o, m):
            return o

    # the decode lattice expects channel-normalized tensors (call_var's
    # raw-uplink branch does the same one-batch conversion)
    pending = (infos, normalized_f32(x) if x.dtype == np.uint8 else x, out, n)
    _decode_batch(pending, _Pre(), work.output_config, writer,
                  work.indel_sources, None)  # warmup
    start = time.perf_counter()
    for _ in range(iters):
        # production decodes each batch once: charge the per-batch
        # center-base materialization every iteration
        infos._center_bases = None
        _decode_batch(pending, _Pre(), work.output_config, writer,
                      work.indel_sources, None)
    elapsed = time.perf_counter() - start
    fasta = getattr(work, "_fasta_to_close", None)
    if fasta is not None:
        fasta.close()
    return n * iters / elapsed, indel_fraction


def train_throughput(config, batch=TRAIN_BATCH) -> float:
    """Real train-step samples/sec at the reference's training batch size
    (10,000, shared/param.py:15) via the in-jit scan protocol."""
    import jax
    import jax.numpy as jnp
    import optax

    from clair_tpu.models.clair import init_params
    from clair_tpu.parallel.sharding import loss_fn, make_optimizer

    params = init_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer(config.optimizer_name, learning_rate=1e-3)
    opt_state = optimizer.init(params)
    rs = np.random.RandomState(1)
    x = jax.device_put(jnp.asarray(rs.rand(batch, 33, 8, 4), jnp.float32))
    y = np.zeros((batch, 90), np.float32)
    y[:, 0] = 1.0
    y[:, 21] = 1.0
    y[:, 24 + 16] = 1.0
    y[:, 57 + 16] = 1.0
    y = jax.device_put(jnp.asarray(y))
    l2 = jnp.float32(config.l2_regularization_lambda)

    @partial(jax.jit, static_argnums=(4,))
    def loop(params, opt_state, x, y, iters):
        def body(carry, k):
            params, opt_state = carry
            # rbg: the production dropout stream (pipeline/train.py)
            rng = jax.random.fold_in(jax.random.key(2, impl="rbg"), k)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, rng, config, l2, False, None
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (_, _), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(iters))
        return losses[-1]

    float(loop(params, opt_state, x, y, 1))
    float(loop(params, opt_state, x, y, 21))

    def sample():
        t0 = time.perf_counter()
        float(loop(params, opt_state, x, y, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, opt_state, x, y, 21))
        return (time.perf_counter() - t0 - t1) / 20

    return batch / _best_positive_sample(sample)


def wgs_throughput(params, config, bam_path, fasta_path, genome_mb,
                   minimum_af=0.2, out_name="calls.vcf"):
    """End-to-end WGS calling throughput in Mbp/min over a prebuilt
    flowcell: threaded window runner (pileup + inference + decode + VCF)
    with the production predictor, batches kept in flight across window
    boundaries (call_bam_parallel.WGS_INFLIGHT_DEPTH). Host pileup runs on
    this machine's cores (nproc=1 in this harness — the number scales with
    pileup workers).

    Returns (mbp_per_min, decompose dict): the per-batch device-leg
    latency histogram plus stage-time totals of the BEST run, so when the
    e2e number moves between artifacts the decomposition says whether the
    framework or the link moved (the wait_s total IS the exposed link+
    device time; prepare/decode are host work that overlaps it)."""
    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import (
        WGS_INFLIGHT_DEPTH,
        PipelineStats,
        call_bam_windows_threaded,
    )
    from clair_tpu.pipeline.call_var import Predictor

    predictor = Predictor(params, config)
    base = CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path,
        minimum_af=minimum_af, minimum_coverage=4,
    )
    out = os.path.join(os.path.dirname(bam_path), out_name)
    workers = max(os.cpu_count() or 1, 1)
    # best-of-2: the remote link's per-batch round trips make a single
    # wall-clock sample noisy on this harness (observed 5-35 Mbp/min for
    # identical code); the faster run is the one closer to the hardware
    elapsed = float("inf")
    decompose = {}
    for _ in range(2):
        stats = PipelineStats()
        start = time.perf_counter()
        sites = call_bam_windows_threaded(
            base, predictor, out,
            chunk_size=250_000, include_all_contigs=True,
            pileup_workers=workers, stats=stats,
        )
        wall = time.perf_counter() - start
        if wall < elapsed:
            elapsed = wall
            decompose = stats.summary()
            decompose["wall_s"] = round(wall, 3)
            decompose["inflight_depth"] = WGS_INFLIGHT_DEPTH
            # candidate density: batches alone under-describe the regime
            # (a depth-capped flowcell packs more candidates per kb)
            decompose["candidate_sites"] = sites
            decompose["candidates_per_kb"] = round(
                sites / (genome_mb * 1000), 2)
    return genome_mb / (elapsed / 60.0), decompose


def wgs_host_ceiling(params, config, bam_path, fasta_path, genome_mb,
                     minimum_af=0.2) -> float:
    """WGS Mbp/min through the full host pipeline (native region scan,
    candidate selection, window tensors, decode, VCF) with the device leg
    stubbed out: each batch reuses ONE real forward of the vendored
    checkpoint, so decode still sees realistic probability rows but pays
    zero device/link time. This is the number the chip-side stages are
    hidden behind at steady state, and — unlike the e2e stage — it is
    immune to remote-link stalls, so it stays comparable across rounds."""
    import jax

    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.task.labels import split_label_vector

    real = Predictor(params, config, batch_size=BATCH)
    x = np.random.RandomState(0).rand(BATCH, 33, 8, 4).astype(np.float32) * 20
    out, _ = real.predict_async(x)
    rows = np.asarray(out)

    class _Stub:
        batch_size = BATCH

        def predict_async(self, t):
            return rows, t.shape[0]

        def gather(self, o, m):
            return split_label_vector(o[:m])

    base = CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path,
        minimum_af=minimum_af, minimum_coverage=4,
    )
    out_path = os.path.join(os.path.dirname(bam_path), "ceiling.vcf")
    stub = _Stub()
    elapsed = float("inf")
    for _ in range(2):  # best-of-2 vs transient host load
        start = time.perf_counter()
        call_bam_windows_threaded(
            base, stub, out_path,
            chunk_size=250_000, include_all_contigs=True, pileup_workers=1,
        )
        elapsed = min(elapsed, time.perf_counter() - start)
    return genome_mb / (elapsed / 60.0)


def wgs_colocated(params, config, bam_path, fasta_path, genome_mb,
                  compute_ms_fast, minimum_af=0.2,
                  host_ceiling_mbp_per_min=0.0):
    """MEASURE (not infer) the co-located overlap claim: replay the exact
    in-flight WGS pipeline against an in-process simulated device
    (pipeline/device_sim.py) honoring a per-batch device-leg cost at
    PCIe-class byte rates, twice:

      fast: compute_ms_fast = the measured stable ms/batch of the
            bf16 streaming-kernel forward (the calling default) — the
            co-located-chip model. Expected: wall ~= host leg.
      slow: a per-batch cost chosen AFTER the fast run so the modelled
            device leg is ~4x the fast wall — the device-bound regime.
            Expected: wall ~= device leg.

    Together the two runs substantiate wall ~= max(host leg, device leg)
    for the same runner, queue depths, and decode path the remote-link
    e2e stage measures. Probability rows come from one real forward of
    the vendored checkpoint (host-ceiling realism trick)."""
    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import (
        PipelineStats,
        call_bam_windows_threaded,
    )
    from clair_tpu.pipeline.call_var import Predictor
    from clair_tpu.pipeline.device_sim import SimulatedDevicePredictor

    real = Predictor(params, config, batch_size=BATCH)
    x = np.random.RandomState(0).rand(BATCH, 33, 8, 4).astype(np.float32) * 20
    out, _ = real.predict_async(x)
    rows = np.asarray(out)

    base = CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path,
        minimum_af=minimum_af, minimum_coverage=4,
    )
    workers = max(os.cpu_count() or 1, 1)
    result = {"device_model": "serial queue + DMA at 12 GB/s "
                              "(pipeline/device_sim.py)"}

    def run(name, ms):
        sim = SimulatedDevicePredictor(rows, ms, batch_size=BATCH)
        stats = PipelineStats()
        out_path = os.path.join(os.path.dirname(bam_path),
                                f"coloc_{name}.vcf")
        start = time.perf_counter()
        call_bam_windows_threaded(
            base, sim, out_path,
            chunk_size=250_000, include_all_contigs=True,
            pileup_workers=workers, stats=stats,
        )
        wall = time.perf_counter() - start
        result[f"device_ms_per_batch_{name}"] = round(ms, 4)
        result[f"wall_s_{name}"] = round(wall, 3)
        result[f"device_leg_s_{name}"] = round(sim.device_busy_s, 3)
        result[f"batches_{name}"] = sim.batches
        result[f"mbp_per_min_{name}"] = round(genome_mb / (wall / 60.0), 2)
        return wall, sim

    wall_fast, sim_fast = run("fast", compute_ms_fast)
    if host_ceiling_mbp_per_min > 0:
        host_wall = genome_mb / host_ceiling_mbp_per_min * 60.0
        result["host_ceiling_wall_s"] = round(host_wall, 3)
        result["fast_wall_vs_host_ceiling"] = round(wall_fast / host_wall, 3)
    slow_ms = max(25.0, 4.0 * wall_fast * 1e3 / max(sim_fast.batches, 1))
    wall_slow, sim_slow = run("slow", slow_ms)
    result["slow_wall_vs_device_leg"] = round(
        wall_slow / max(sim_slow.device_busy_s, 1e-9), 3)
    return result


def train_feed_throughput() -> float:
    """Host epoch-feed samples/s, one decompress thread (block inflate +
    batch concat; LZ4S byte-shuffled LZ4-HC blocks since bin format v3,
    zstd on hosts without liblz4; blocks stay int16-packed as the train
    loop consumes them — the jitted step casts on device). Link-immune;
    the number the training step's samples/s is gated by per feed thread
    (TrainingConfig.decompress_workers scales it across spare cores)."""
    from clair_tpu.data.bins import BinDataset, EpochBatches, _pack

    rs = np.random.RandomState(0)
    xs = rs.randint(0, 120, (500, 33, 8, 4)).astype(np.float32)
    xs[..., 1:] -= xs[..., 0:1]
    ys = np.zeros((500, 90), np.float32)
    ys[:, 0] = 1.0
    xb, yb = _pack(xs), _pack(ys)
    pb = _pack(np.array([f"chr1:{i}" for i in range(500)]))
    n_blocks = 40
    ds = BinDataset(500 * n_blocks, [xb] * n_blocks, [yb] * n_blocks,
                    [pb] * n_blocks, 500)

    def run() -> int:
        n = 0
        for x, _, _ in EpochBatches(ds, np.arange(n_blocks),
                                    n_train=500 * n_blocks,
                                    train_batch_size=2000,
                                    decompress_workers=0,
                                    cast_to_float32=False):
            n += len(x)
        return n

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        n = run()
        best = max(best, n / (time.perf_counter() - t0))
    return best


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
    x = torch.rand(BASELINE_BATCH, 33, 8, 4)
    best = 0.0
    with torch.no_grad():
        net(x)
        for _ in range(3):  # best-of-3: robust to transient machine load
            start = time.perf_counter()
            iters = 5
            for _ in range(iters):
                net(x)
            best = max(best, BASELINE_BATCH * iters / (time.perf_counter() - start))
    return best


def _device_reachable(timeout=240) -> bool:
    """Probe the accelerator from a SUBPROCESS before this process binds
    to it: the remote axon link can wedge for hours, and a fresh jax
    backend init against a wedged link hangs unkillably in-process. A
    subprocess probe times out cleanly; on failure the bench falls back
    to CPU so the artifact still carries the host-side stages instead of
    burning its whole budget producing nothing."""
    import subprocess

    code = (
        "import jax; d = jax.devices(); "
        "print(d[0].platform, len(d))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, timeout=timeout,
        )
        return r.returncode == 0
    except Exception:
        return False


class _Watchdog:
    """Emit a partial artifact and hard-exit if a stage wedges mid-run.

    The start-of-run `_device_reachable` probe only proves the link was up
    at t=0; the observed failure mode (round 3) is a link that wedges
    HOURS into a session, after which any device op hangs unkillably
    in-process. Without this guard a mid-run wedge burns the driver's
    whole budget and produces NO artifact at all — strictly worse than
    the CPU fallback. Each device-touching stage declares a generous
    budget (minutes, vs ~40 s worst-case healthy compile); if a stage
    overruns it, the watchdog prints the JSON line composed from every
    stage that DID complete (missing ones 0.0, `wedged_mid_run` names the
    culprit) and `os._exit(0)`s so the line is recorded."""

    def __init__(self, finish):
        import threading

        self._finish = finish
        self._lock = threading.Lock()
        self._deadline = None
        self._stage = ""
        threading.Thread(target=self._run, daemon=True).start()

    def enter(self, stage: str, budget_s: float) -> None:
        with self._lock:
            self._stage = stage
            self._deadline = time.monotonic() + budget_s

    def clear(self) -> None:
        with self._lock:
            self._deadline = None

    def _run(self) -> None:
        while True:
            time.sleep(5)
            with self._lock:
                deadline, stage = self._deadline, self._stage
            if deadline is not None and time.monotonic() > deadline:
                print(
                    f"[bench] stage {stage!r} exceeded its watchdog budget "
                    "(link wedged mid-run?); emitting partial artifact",
                    file=sys.stderr,
                )
                try:
                    self._finish(wedged=stage)
                finally:
                    sys.stdout.flush()
                    sys.stderr.flush()
                    os._exit(0)


def main():
    import tempfile

    device_ok = _device_reachable()
    if not device_ok:
        print("[bench] accelerator unreachable (wedged link?); "
              "falling back to CPU — device-stage numbers are NOT chip "
              "numbers in this artifact", file=sys.stderr)
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        )

    import jax

    if not device_ok:
        jax.config.update("jax_platforms", "cpu")

    from clair_tpu.models.clair import init_params
    from clair_tpu.params import ModelConfig
    from clair_tpu.utils.jaxcache import enable

    enable()
    config = ModelConfig()  # float32 (the parity default)
    config_bf16 = dataclasses.replace(config, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config)
    # vendored trained checkpoints drive the decode/WGS stages so the
    # probability distributions (and therefore the indel/fallback mix) are
    # the model's real output, not hand-crafted vectors
    params_ont = _load_vendored("ont")
    params_ilmn = _load_vendored("ilmn")
    params_ccs = _load_vendored("ccs")
    if params_ont is None or params_ilmn is None:
        print("[bench] vendored checkpoints missing; falling back to "
              "biased init params", file=sys.stderr)
        fallback = init_params(jax.random.PRNGKey(0), config)
        fallback["head_genotype"]["b"] = fallback["head_genotype"]["b"].at[0].add(8.0)
        fallback["head_len1"]["b"] = fallback["head_len1"]["b"].at[16].add(8.0)
        fallback["head_len2"]["b"] = fallback["head_len2"]["b"].at[16].add(8.0)
        params_ont = params_ont or fallback
        params_ilmn = params_ilmn or fallback
    params_ccs = params_ccs or params_ilmn

    tmp = tempfile.mkdtemp(prefix="clair_tpu_bench_")
    ont_bam, ont_fa, ont_len = _make_ont_bam(tmp)
    clean_bam, clean_fa, clean_len = _make_clean_bam(tmp)

    # every stage lands in this dict as it completes; _finish composes the
    # artifact from whatever is present so the watchdog can emit a partial
    # one if a later stage wedges the process
    st = {
        "device_forward_tps_f32": 0.0,
        "device_forward_tps_bf16": 0.0,
        "device_forward_tps_f32_stable": 0.0,
        "device_forward_tps_bf16_stable": 0.0,
        "device_forward_tps_bf16_stream_stable": 0.0,
        "host_decode_tps_ont_real": 0.0,
        "ont_indel_winner_fraction": 0.0,
        "host_decode_tps": 0.0,
        "clean_indel_winner_fraction": 0.0,
        "host_decode_tps_ccs_real": 0.0,
        "ccs_indel_winner_fraction": 0.0,
        "train_samples_per_sec": 0.0,
        "train_samples_per_sec_bf16": 0.0,
        "train_samples_per_sec_stream_bf16": None,  # null until measured
        "train_feed_samples_per_sec_1thread": 0.0,
        "wgs_ont_end_to_end_mbp_per_min": 0.0,
        "wgs_ont_highcov_mbp_per_min": 0.0,
        "wgs_ont_host_ceiling_mbp_per_min": 0.0,
        "wgs_ont_host_ceiling_cram_mbp_per_min": 0.0,
        "wgs_end_to_end_mbp_per_min": 0.0,
        # per-platform stages (r05): the reference treats ONT / PacBio CCS
        # / Illumina as first-class (README.md:374-401); ilmn runs the
        # clean flowcell at the platform alt-AF default 0.1, ccs its own
        # HiFi-profile flowcell at alt-AF 0.2
        "wgs_ccs_end_to_end_mbp_per_min": 0.0,
        "wgs_ccs_host_ceiling_mbp_per_min": 0.0,
        "wgs_ilmn_end_to_end_mbp_per_min": 0.0,
        "wgs_ilmn_host_ceiling_mbp_per_min": 0.0,
        "pileup_workers": os.cpu_count(),
        "device_unreachable_cpu_fallback": not device_ok,
        "device_forward_protocol": DEVICE_FORWARD_PROTOCOL,
        "train_step_protocol": TRAIN_STEP_PROTOCOL,
        # e2e flowcell sizes (r04+: sized so the in-flight pipeline reaches
        # steady state — ~24 ONT / ~10 clean predict batches; r01-r03 used
        # 400 kb / 1 Mb, few enough batches that the fixed tunnel latency
        # WAS the number)
        "wgs_flowcell": {"ont_kb": ont_len // 1000,
                         "clean_mb": clean_len / 1e6},
        # per-stage user+sys CPU seconds (process + children): on a >1-core
        # host, stages whose cpu_s ~= wall_s scale with workers
        "stage_cpu_s": {},
    }
    cpu_tps_box = [None]

    def _stage_cpu(name, cpu0):
        st["stage_cpu_s"][name] = round(_cpu_seconds() - cpu0, 3)

    def _finish(wedged=None):
        # steady-state pipeline rate in the headline (ONT) regime, composed
        # from the DEFAULT calling pipeline: bfloat16 device forward
        # (params.PREDICT_COMPUTE_DTYPE since r04; decode decisions guarded
        # f32-identical by tests/test_bf16.py) + host decode
        decode_ont = st["host_decode_tps_ont_real"]
        device_bf16 = (st["device_forward_tps_bf16_stream_stable"]
                       or st["device_forward_tps_bf16_stable"]
                       or st["device_forward_tps_bf16"])
        if device_ok and device_bf16 > 0:
            pipeline_tps = min(device_bf16, decode_ont)
        else:
            pipeline_tps = decode_ont
        st["pipeline_device_dtype"] = "bfloat16 (calling default since r04)"
        # the --dtype float32 exact-probability escape hatch, recorded so
        # r02/r03 headlines (f32-composed) stay comparable
        device_f32 = (st["device_forward_tps_f32_stable"]
                      or st["device_forward_tps_f32"])
        if device_ok and device_f32 > 0:
            st["pipeline_tps_f32_escape"] = min(device_f32, decode_ont)
        cpu_tps = cpu_tps_box[0] or 2500.0
        stages = {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in st.items()}
        if wedged is not None:
            stages["wedged_mid_run"] = wedged
        print(
            json.dumps(
                {
                    "metric": "call_var pipeline throughput, ONT regime "
                              "(pileup tensors/sec/chip)",
                    "value": round(pipeline_tps, 1),
                    "unit": "tensors/sec",
                    "vs_baseline": round(pipeline_tps / cpu_tps, 2),
                    "stages": stages,
                }
            ),
            flush=True,
        )

    wd = _Watchdog(_finish)

    # the budgets are sized against healthy-link device stages (~40 s
    # worst-case compile); in CPU-fallback mode the same stages run the
    # whole model on one (possibly loaded) core, where overrunning a
    # device-sized budget means "slow", not "wedged" — triple them so a
    # healthy fallback run is not killed into a partial artifact
    def budget(seconds: float) -> float:
        return seconds if device_ok else seconds * 3

    if device_ok:
        wd.enter("device_forward_f32", 1200)
        st["device_forward_tps_f32"], st["device_forward_tps_f32_stable"], \
            detail = device_throughput(params, config)
        st["device_forward_ms_f32"] = detail
        wd.enter("device_forward_bf16", 1200)
        st["device_forward_tps_bf16"], st["device_forward_tps_bf16_stable"], \
            detail = device_throughput(params, config_bf16)
        st["device_forward_ms_bf16"] = detail
        # the CALLING default since the Predictor auto-picks the streaming
        # Pallas kernel for reduced-precision TPU prediction (r04): the
        # number the pipeline headline composes from
        wd.enter("device_forward_bf16_stream", 1200)
        _, st["device_forward_tps_bf16_stream_stable"], detail = (
            device_throughput(params, dataclasses.replace(
                config_bf16, use_pallas_stream_bilstm=True)))
        st["device_forward_ms_bf16_stream"] = detail
    # decode over a REAL ONT-regime window (trained ONT checkpoint output +
    # event-indexed recovery sources): the HEADLINE decode leg — the
    # reference is an ONT caller first.  The forward that produces the
    # probabilities touches the device, so these stay under the watchdog.
    wd.enter("decode_ont", budget(1800))
    cpu0 = _cpu_seconds()
    decode_ont_tps, ont_indel_frac = decode_window_throughput(
        params_ont, config, ont_bam, ont_fa, minimum_af=0.2
    )
    _stage_cpu("decode_ont", cpu0)
    st["host_decode_tps_ont_real"] = decode_ont_tps
    st["ont_indel_winner_fraction"] = ont_indel_frac
    wd.enter("decode_clean", budget(1800))
    decode_clean_tps, clean_indel_frac = decode_window_throughput(
        params_ilmn, config, clean_bam, clean_fa, minimum_af=0.2
    )
    st["host_decode_tps"] = decode_clean_tps
    st["clean_indel_winner_fraction"] = clean_indel_frac
    # CCS decode leg (r05): the third reference platform's regime — clean
    # long reads whose residual error is indel-leaning, so its winner mix
    # sits between ONT and Illumina
    ccs_bam = ccs_fa = None
    ccs_len = 0
    try:
        wd.enter("decode_ccs", budget(1800))
        ccs_bam, ccs_fa, ccs_len = _make_ccs_bam(tmp)
        decode_ccs_tps, ccs_indel_frac = decode_window_throughput(
            params_ccs, config, ccs_bam, ccs_fa, minimum_af=0.2
        )
        st["host_decode_tps_ccs_real"] = decode_ccs_tps
        st["ccs_indel_winner_fraction"] = ccs_indel_frac
        st["wgs_flowcell"]["ccs_kb"] = ccs_len // 1000
    except Exception as exc:
        print(f"[bench] CCS decode stage failed ({exc})", file=sys.stderr)
    if device_ok:
        wd.enter("train_step", 1800)
        # f32: the exact-parity escape hatch (train_compute_dtype=
        # "float32"); kept first for round-over-round comparability with
        # BENCH_r01-r03 where it was the default
        st["train_samples_per_sec"] = train_throughput(config)
        # bf16 scan (no stream kernel): the meshed-training path's rate
        wd.enter("train_step_bf16", 1800)
        try:
            st["train_samples_per_sec_bf16"] = train_throughput(config_bf16)
        except Exception as exc:
            # null, not 0.0: a failed stage must be distinguishable from a
            # measured zero for downstream artifact consumers
            st["train_samples_per_sec_bf16"] = None
            st["train_step_bf16_failed"] = True
            print(f"[bench] bf16 train stage failed ({exc})", file=sys.stderr)
        # the TRAINING DEFAULT since round 4: bf16 compute + the
        # streaming-grid Pallas BiLSTM (TrainingConfig.train_compute_dtype
        # defaults to bfloat16 and train_model auto-enables the kernel on
        # single-device TPU runs; ops/pallas_bilstm_stream.py). Accuracy
        # evidence for the flip: the production-recipe held-out bf16 run,
        # docs/ACCURACY.md (recall 1.000 / precision 0.902 / 147/147 exact
        # vs f32's 1.000 / 0.880 / 147/147)
        wd.enter("train_step_stream_bf16", 1800)
        try:
            st["train_samples_per_sec_stream_bf16"] = train_throughput(
                dataclasses.replace(
                    config_bf16, use_pallas_stream_bilstm=True
                )
            )
            st["train_samples_per_sec_default"] = (
                st["train_samples_per_sec_stream_bf16"])
            st["train_default"] = "bfloat16+stream_kernel"
        except Exception as exc:
            st["train_samples_per_sec_stream_bf16"] = None
            st["train_step_stream_bf16_failed"] = True
            print(f"[bench] stream-kernel train stage failed ({exc})",
                  file=sys.stderr)
    wd.clear()
    try:
        cpu0 = _cpu_seconds()
        st["train_feed_samples_per_sec_1thread"] = train_feed_throughput()
        from clair_tpu.io import lz4 as _lz4

        st["train_feed_codec"] = ("lz4s" if _lz4.available()
                                  else "zstd (liblz4 missing)")
        _stage_cpu("train_feed", cpu0)
    except Exception as exc:
        st["train_feed_samples_per_sec_1thread"] = None
        st["train_feed_failed"] = True
        print(f"[bench] train feed stage failed ({exc})", file=sys.stderr)
    try:
        wd.enter("wgs_ont_host_ceiling", budget(2400))
        cpu0 = _cpu_seconds()
        st["wgs_ont_host_ceiling_mbp_per_min"] = wgs_host_ceiling(
            params_ont, config_bf16, ont_bam, ont_fa, ont_len / 1e6,
            minimum_af=0.2,
        )
        _stage_cpu("wgs_ont_host_ceiling", cpu0)
    except Exception as exc:
        print(f"[bench] host-ceiling stage failed ({exc})", file=sys.stderr)
    try:
        wd.enter("wgs_ont_e2e", budget(2400))
        cpu0 = _cpu_seconds()
        st["wgs_ont_end_to_end_mbp_per_min"], st["wgs_ont_e2e_decompose"] = (
            wgs_throughput(
                # the calling pipelines' default dtype (bfloat16 since r04)
                params_ont, config_bf16, ont_bam, ont_fa, ont_len / 1e6,
                minimum_af=0.2, out_name="ont.vcf",
            )
        )
        _stage_cpu("wgs_ont_e2e", cpu0)
    except Exception as exc:
        print(f"[bench] ONT wgs stage failed ({exc})", file=sys.stderr)
    try:
        # high-coverage regime (BASELINE config 5, 578x HG002HD): ~550x
        # over a small genome — Mbp/min is naturally ~10x lower than the
        # 35x stage because every megabase carries ~16x the base events
        wd.enter("wgs_ont_highcov", budget(3000))
        hc_bam, hc_fa, hc_len = _make_ont_highcov_bam(tmp)
        st["wgs_flowcell"]["ont_highcov_kb"] = hc_len // 1000
        cpu0 = _cpu_seconds()
        st["wgs_ont_highcov_mbp_per_min"], st["wgs_ont_highcov_decompose"] = (
            wgs_throughput(
                params_ont, config_bf16, hc_bam, hc_fa, hc_len / 1e6,
                minimum_af=0.2, out_name="ont_hc.vcf",
            )
        )
        _stage_cpu("wgs_ont_highcov", cpu0)
    except Exception as exc:
        print(f"[bench] highcov wgs stage failed ({exc})", file=sys.stderr)
    try:
        wd.enter("wgs_clean_e2e", budget(2400))
        cpu0 = _cpu_seconds()
        st["wgs_end_to_end_mbp_per_min"], st["wgs_e2e_decompose"] = (
            wgs_throughput(
                params_ilmn, config_bf16, clean_bam, clean_fa, clean_len / 1e6,
                minimum_af=0.2, out_name="clean.vcf",
            )
        )
        _stage_cpu("wgs_clean_e2e", cpu0)
    except Exception as exc:
        print(f"[bench] clean wgs stage failed ({exc})", file=sys.stderr)
    # per-platform CCS / Illumina stages (r05): host ceiling + e2e
    # decompose at each platform's alt-AF candidate default
    # (/root/reference/README.md:374-381: Illumina 0.1, PacBio CCS 0.2)
    if ccs_bam is not None:
        try:
            wd.enter("wgs_ccs_host_ceiling", budget(2400))
            cpu0 = _cpu_seconds()
            st["wgs_ccs_host_ceiling_mbp_per_min"] = wgs_host_ceiling(
                params_ccs, config_bf16, ccs_bam, ccs_fa, ccs_len / 1e6,
                minimum_af=0.2,
            )
            _stage_cpu("wgs_ccs_host_ceiling", cpu0)
            wd.enter("wgs_ccs_e2e", budget(2400))
            cpu0 = _cpu_seconds()
            st["wgs_ccs_end_to_end_mbp_per_min"], st["wgs_ccs_e2e_decompose"] = (
                wgs_throughput(
                    params_ccs, config_bf16, ccs_bam, ccs_fa, ccs_len / 1e6,
                    minimum_af=0.2, out_name="ccs.vcf",
                )
            )
            _stage_cpu("wgs_ccs_e2e", cpu0)
        except Exception as exc:
            print(f"[bench] CCS wgs stage failed ({exc})", file=sys.stderr)
    try:
        wd.enter("wgs_ilmn_host_ceiling", budget(2400))
        cpu0 = _cpu_seconds()
        st["wgs_ilmn_host_ceiling_mbp_per_min"] = wgs_host_ceiling(
            params_ilmn, config_bf16, clean_bam, clean_fa, clean_len / 1e6,
            minimum_af=0.1,
        )
        _stage_cpu("wgs_ilmn_host_ceiling", cpu0)
        wd.enter("wgs_ilmn_e2e", budget(2400))
        cpu0 = _cpu_seconds()
        st["wgs_ilmn_end_to_end_mbp_per_min"], st["wgs_ilmn_e2e_decompose"] = (
            wgs_throughput(
                params_ilmn, config_bf16, clean_bam, clean_fa, clean_len / 1e6,
                minimum_af=0.1, out_name="ilmn.vcf",
            )
        )
        _stage_cpu("wgs_ilmn_e2e", cpu0)
    except Exception as exc:
        print(f"[bench] Illumina wgs stage failed ({exc})", file=sys.stderr)
    # co-located overlap measurement (r05): the e2e stage above proves the
    # remote link is the wall; this stage proves the same runner sits at
    # the host ceiling once the device leg costs PCIe-class time
    try:
        wd.enter("wgs_ont_colocated", budget(2400))
        cpu0 = _cpu_seconds()
        stream_ms = (st.get("device_forward_ms_bf16_stream") or {}).get(
            "ms_per_batch_stable", 0.3)
        st["wgs_ont_colocated"] = wgs_colocated(
            params_ont, config_bf16, ont_bam, ont_fa, ont_len / 1e6,
            compute_ms_fast=stream_ms, minimum_af=0.2,
            host_ceiling_mbp_per_min=st["wgs_ont_host_ceiling_mbp_per_min"],
        )
        _stage_cpu("wgs_ont_colocated", cpu0)
    except Exception as exc:
        print(f"[bench] co-located stage failed ({exc})", file=sys.stderr)
    # CRAM-input host ceiling: same flowcell through the packed-array
    # bridge (clair_region_from_packed) — proves CRAM calling holds the
    # BAM-path rate instead of falling back to the Python events engine
    try:
        from clair_tpu.io.cram import bam_to_cram

        wd.enter("wgs_ont_host_ceiling_cram", budget(2400))
        ont_cram = os.path.join(tmp, "ont_bench.cram")
        bam_to_cram(ont_bam, ont_cram, ont_fa)
        st["wgs_ont_host_ceiling_cram_mbp_per_min"] = wgs_host_ceiling(
            params_ont, config_bf16, ont_cram, ont_fa, ont_len / 1e6,
            minimum_af=0.2,
        )
    except Exception as exc:
        print(f"[bench] CRAM ceiling stage failed ({exc})", file=sys.stderr)
    wd.clear()

    print(
        f"[bench] device f32 {st['device_forward_tps_f32_stable']:.0f} t/s "
        f"(bf16 {st['device_forward_tps_bf16_stable']:.0f}, bf16+stream "
        f"{st['device_forward_tps_bf16_stream_stable']:.0f}; stable "
        f"protocol), "
        f"host decode ONT-real {decode_ont_tps:.0f} t/s "
        f"({ont_indel_frac:.0%} indel winners; clean {decode_clean_tps:.0f} "
        f"t/s at {clean_indel_frac:.0%}), "
        f"train {st['train_samples_per_sec']:.0f} samples/s "
        f"(stream bf16 {st['train_samples_per_sec_stream_bf16'] or 0:.0f}), "
        f"wgs e2e ONT {st['wgs_ont_end_to_end_mbp_per_min']:.1f} "
        f"(host ceiling {st['wgs_ont_host_ceiling_mbp_per_min']:.1f}) / "
        f"clean {st['wgs_end_to_end_mbp_per_min']:.1f} / "
        f"ccs {st['wgs_ccs_end_to_end_mbp_per_min']:.1f} / "
        f"ilmn {st['wgs_ilmn_end_to_end_mbp_per_min']:.1f} Mbp/min/core, "
        f"colocated fast/slow "
        f"{(st.get('wgs_ont_colocated') or {}).get('wall_s_fast', 0):.2f}/"
        f"{(st.get('wgs_ont_colocated') or {}).get('wall_s_slow', 0):.2f} s",
        file=sys.stderr,
    )

    try:
        wd.enter("cpu_baseline", budget(1800))
        cpu_tps_box[0] = cpu_baseline_throughput()
    except Exception as exc:
        print(f"[bench] cpu baseline failed ({exc}); using recorded value", file=sys.stderr)
    finally:
        # must clear even on failure: nothing re-arms after this stage, so
        # a leftover deadline would fire mid-_finish and print a second,
        # contradictory artifact line
        wd.clear()
    _finish()


if __name__ == "__main__":
    main()
