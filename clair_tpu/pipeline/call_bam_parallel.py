"""Whole-genome fan-out (callVarBamParallel equivalent).

The reference prints one shell command per 10Mb window for GNU parallel
(/root/reference/clair/callVarBamParallel.py:90-119). Here windows become
in-process work items executed either sequentially, by a local process
pool, or (compat mode) emitted as a command sheet. On a TPU slice the
model forward is batched across windows on the chip while window pileups
run on host workers — the share-nothing chunk model the reference proves
out, minus the process-pipe overhead.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import sys
import time
from typing import Dict, Iterator, List, Optional, Set, TextIO, Tuple

from clair_tpu.io.fasta import FastaReader
from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
from clair_tpu.utils.intervals import BedIntervals

logger = logging.getLogger(__name__)


class JobLog:
    """Per-window failure audit + resume manifest.

    The in-process equivalent of the reference's GNU parallel `--joblog`
    Exitval workflow and trailing-newline completeness check
    (/root/reference/README.md:299-300, docs/TRAIN.md:58-59): one JSON line
    per finished window ({window, status, sites, output, error, elapsed}),
    flushed immediately so a killed run leaves a machine-readable record.
    Re-running with resume=True skips windows already logged ok.
    """

    def __init__(self, path: str):
        self.path = path
        self._fh = None

    def completed(self) -> Set[Tuple[str, int, int]]:
        """Windows recorded ok in an existing log (empty when absent)."""
        done: Set[Tuple[str, int, int]] = set()
        if not os.path.isfile(self.path):
            return done
        with open(self.path) as fh:
            for line in fh:
                try:
                    entry = json.loads(line)
                except ValueError:
                    continue  # torn write from a killed run
                if entry.get("status") == "ok":
                    ctg, start, end = entry["window"]
                    done.add((ctg, int(start), int(end)))
        return done

    def record(
        self,
        window: Tuple[str, int, int],
        status: str,
        sites: int = 0,
        output: Optional[str] = None,
        error: Optional[str] = None,
        elapsed: float = 0.0,
    ) -> None:
        if self._fh is None:
            self._fh = open(self.path, "a")
        entry = {
            "window": list(window),
            "status": status,
            "sites": sites,
            "elapsed": round(elapsed, 3),
        }
        if output is not None:
            entry["output"] = output
        if error is not None:
            entry["error"] = error
        self._fh.write(json.dumps(entry) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def vcf_is_complete(path: str) -> bool:
    """Trailing-newline completeness check (ref README.md:299-300)."""
    try:
        with open(path, "rb") as fh:
            fh.seek(0, 2)
            if fh.tell() == 0:
                return False
            fh.seek(-1, 2)
            return fh.read(1) == b"\n"
    except OSError:
        return False

# chr1-22,X,Y with and without "chr" (ref callVarBamParallel.py:15)
MAJOR_CONTIGS = (
    [f"chr{i}" for i in list(range(1, 23)) + ["X", "Y"]]
    + [str(i) for i in list(range(1, 23)) + ["X", "Y"]]
)
DEFAULT_CHUNK_SIZE = 10_000_000


def genome_windows(
    fasta: FastaReader,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    include_all_contigs: bool = False,
    bed: Optional[BedIntervals] = None,
    num_shards: int = 1,
    shard_id: int = 0,
) -> Iterator[Tuple[str, int, int]]:
    """(contig, ctg_start, ctg_end) 1-based inclusive windows, BED-filtered.

    num_shards/shard_id deterministically partition the window list for
    multi-host WGS: each host takes windows where index % num_shards ==
    shard_id (round-robin balances long contigs across hosts). Windows are
    share-nothing, so hosts need no coordination beyond merging VCFs —
    the DCN-level scale-out mirror of the reference's GNU-parallel model.
    """
    if not 0 <= shard_id < num_shards:
        raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
    whitelist = set(MAJOR_CONTIGS)
    index = 0
    for contig, length in fasta.contigs:
        if not include_all_contigs and contig not in whitelist:
            continue
        chunks = -(-length // chunk_size)
        for i in range(chunks):
            start = i * chunk_size + 1
            end = min((i + 1) * chunk_size, length)
            if bed is not None and not bed.is_empty:
                if not bed.overlaps_range(contig, start - 1, end):
                    continue
            if index % num_shards == shard_id:
                yield contig, start, end
            index += 1


def _run_window(args_tuple):
    """Worker entry: build a predictor in-process and call one window.
    Exceptions come back as data so one bad window can't sink the pool."""
    base_config, checkpoint_path, window, output_prefix = args_tuple
    contig, start, end = window
    path = f"{output_prefix}.{contig}_{start}_{end}.vcf"
    started = time.perf_counter()
    try:
        from clair_tpu.models.checkpoint import load_checkpoint
        from clair_tpu.params import ModelConfig
        from clair_tpu.pipeline.call_var import Predictor

        params, _ = load_checkpoint(checkpoint_path)
        predictor = Predictor(params, ModelConfig())
        config = dataclasses.replace(
            base_config, contig=contig, ctg_start=start, ctg_end=end
        )
        sites = call_bam(config, predictor, output_path=path)
        return path, window, sites, None, time.perf_counter() - started
    except Exception as exc:
        return (
            path, window, 0, f"{type(exc).__name__}: {exc}",
            time.perf_counter() - started,
        )


def call_bam_parallel(
    base_config: CallBamConfig,
    predictor_factory,
    output_prefix: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    include_all_contigs: bool = False,
    max_workers: int = 1,
    checkpoint_path: Optional[str] = None,
    resume: bool = False,
    joblog_path: Optional[str] = None,
    num_shards: int = 1,
    shard_id: int = 0,
) -> List[str]:
    """Run call_bam over every genome window; returns the per-window VCF
    paths (merge with merge_vcfs).

    With max_workers > 1 (requires checkpoint_path), window pileups run on
    a process pool — each worker has its own predictor, keeping the device
    saturated while host pileups proceed in parallel (the reference's
    GNU-parallel share-nothing model, in-process).

    Every window's outcome lands in a JobLog next to the outputs; a failed
    window is recorded and skipped (the run continues), and resume=True
    re-runs only windows not yet logged ok.
    """
    fasta = FastaReader(base_config.fasta_path)
    bed = BedIntervals.from_bed(base_config.bed_path) if base_config.bed_path else None
    all_windows = list(genome_windows(
        fasta, chunk_size, include_all_contigs, bed, num_shards, shard_id
    ))
    fasta.close()

    joblog = JobLog(joblog_path or output_prefix + ".joblog")
    done = joblog.completed() if resume else set()
    # path per completed window, keyed so the returned list stays in genome
    # order even when a resume re-runs a middle window (merge_vcfs
    # concatenates in list order — out-of-order rows would unsort the VCF)
    finished = {
        w: f"{output_prefix}.{w[0]}_{w[1]}_{w[2]}.vcf"
        for w in all_windows if w in done
    }
    windows = [w for w in all_windows if w not in done]
    failures = []

    def finish(window, path, sites, error, elapsed):
        if error is None and not vcf_is_complete(path):
            error = "output VCF has no trailing newline (incomplete)"
        if error is None:
            joblog.record(window, "ok", sites=sites, output=path, elapsed=elapsed)
            finished[window] = path
        else:
            joblog.record(window, "failed", output=path, error=error, elapsed=elapsed)
            failures.append((window, error))
            logger.error("window %s:%d-%d FAILED: %s", *window, error)

    if max_workers > 1 and checkpoint_path is not None:
        import multiprocessing

        context = multiprocessing.get_context("spawn")
        with context.Pool(max_workers) as pool:
            work = [
                (base_config, checkpoint_path, window, output_prefix)
                for window in windows
            ]
            for path, window, sites, error, elapsed in pool.imap(_run_window, work):
                if error is None:
                    logger.info("window %s:%d-%d -> %d sites", *window, sites)
                finish(window, path, sites, error, elapsed)
    else:
        predictor = predictor_factory()
        for window in windows:
            contig, start, end = window
            config = dataclasses.replace(
                base_config, contig=contig, ctg_start=start, ctg_end=end
            )
            path = f"{output_prefix}.{contig}_{start}_{end}.vcf"
            started = time.perf_counter()
            try:
                sites = call_bam(config, predictor, output_path=path)
                error = None
            except Exception as exc:  # keep calling the rest of the genome
                sites, error = 0, f"{type(exc).__name__}: {exc}"
            elapsed = time.perf_counter() - started
            if error is None:
                logger.info("window %s:%d-%d -> %d sites", contig, start, end, sites)
            finish(window, path, sites, error, elapsed)

    joblog.close()
    if failures:
        logger.error(
            "%d window(s) failed; re-run with resume=True (or --resume) to "
            "retry only those — audit log: %s", len(failures), joblog.path,
        )
    return [finished[w] for w in all_windows if w in finished]


def emit_command_sheet(
    fasta_path: str,
    bam_path: str,
    checkpoint_path: str,
    output_prefix: str,
    output: TextIO = sys.stdout,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    include_all_contigs: bool = False,
    bed_path: Optional[str] = None,
    extra_flags: str = "",
) -> int:
    """Compat mode: print one `python -m clair_tpu call_bam ...` command per
    window for GNU parallel / xargs, like the reference."""
    fasta = FastaReader(fasta_path)
    bed = BedIntervals.from_bed(bed_path) if bed_path else None
    n = 0
    for contig, start, end in genome_windows(fasta, chunk_size, include_all_contigs, bed):
        print(
            f"python -m clair_tpu call_bam --bam_fn {bam_path} --ref_fn {fasta_path}"
            f" --chkpnt_fn {checkpoint_path} --ctgName {contig}"
            f" --ctgStart {start} --ctgEnd {end}"
            f" --call_fn {output_prefix}.{contig}_{start}_{end}.vcf"
            + ((" " + extra_flags) if extra_flags else ""),
            file=output,
        )
        n += 1
    fasta.close()
    return n


def call_bam_windows_threaded(
    base_config: CallBamConfig,
    predictor,
    output_path: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    include_all_contigs: bool = False,
    pileup_workers: int = 4,
    prefetch: int = 2,
    resume: bool = False,
    joblog_path: Optional[str] = None,
    num_shards: int = 1,
    shard_id: int = 0,
) -> int:
    """Single-process WGS runner: ONE predictor owns the device while
    window pileups run on a thread pool (numpy releases the GIL in the hot
    loops). Windows are consumed in genome order into one merged VCF.

    This is the preferred topology for a host attached to one chip — the
    process-pool mode exists for multi-chip hosts where each worker can own
    a device.

    Per-window outcomes land in a JobLog (failures are recorded and the run
    continues). resume=True appends only windows not yet logged ok — rows
    then arrive out of genome order; sort or re-merge afterwards if order
    matters downstream.
    """
    import concurrent.futures
    import sys

    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.pipeline.call_bam import call_window, prepare_window

    gz_path = None
    if output_path and output_path.endswith(".gz"):
        # stream plain text while windows run (resume needs an appendable,
        # truncatable file); compress + tabix-index once every window lands
        gz_path = output_path
        output_path = output_path[: -len(".gz")]

    fasta = FastaReader(base_config.fasta_path)
    bed = BedIntervals.from_bed(base_config.bed_path) if base_config.bed_path else None
    windows = list(genome_windows(
        fasta, chunk_size, include_all_contigs, bed, num_shards, shard_id
    ))
    contigs = fasta.contigs
    fasta.close()

    joblog = JobLog(
        joblog_path or ((output_path or "call_bam_windows") + ".joblog")
    )
    appending = False
    if resume:
        done = joblog.completed()
        windows = [w for w in windows if w not in done]
        if (gz_path and not windows and os.path.isfile(gz_path)
                and not os.path.isfile(output_path)):
            # the previous run already finished, compressed, and removed
            # the plain stream; rebuilding from zero windows would replace
            # the complete .gz with a header-only file
            logger.info("resume: %s already complete", gz_path)
            joblog.close()
            return 0
        appending = bool(output_path) and os.path.isfile(output_path) and bool(done)
        if appending and not vcf_is_complete(output_path):
            # a kill mid-flush can leave a torn final line; drop it so the
            # re-run's first row doesn't concatenate onto a partial record
            with open(output_path, "rb+") as fh:
                data = fh.read()
                cut = data.rfind(b"\n") + 1
                fh.truncate(cut)

    output_fh = (
        open(output_path, "a" if appending else "w") if output_path else sys.stdout
    )
    from clair_tpu.io.vcf import make_writer

    writer = make_writer(base_config, output_fh, contigs=contigs)
    if not appending:
        writer.write_header()

    total = 0
    failures = 0
    with concurrent.futures.ThreadPoolExecutor(pileup_workers) as pool:
        pending = []  # (window, future)
        cursor = 0

        def submit_next():
            nonlocal cursor
            if cursor >= len(windows):
                return
            contig, start, end = windows[cursor]
            cursor += 1
            config = dataclasses.replace(
                base_config, contig=contig, ctg_start=start, ctg_end=end
            )
            pending.append(
                ((contig, start, end), pool.submit(prepare_window, config))
            )

        for _ in range(min(pileup_workers + prefetch, len(windows))):
            submit_next()
        while pending:
            window, future = pending.pop(0)
            started = time.perf_counter()
            try:
                work = future.result()
                submit_next()
                sites = call_window(work, predictor, writer)
                output_fh.flush()
            except Exception as exc:
                submit_next()
                failures += 1
                joblog.record(
                    window, "failed", error=f"{type(exc).__name__}: {exc}",
                    elapsed=time.perf_counter() - started,
                )
                logger.error("window %s:%d-%d FAILED: %s", *window, exc)
                continue
            joblog.record(
                window, "ok", sites=sites, output=output_path,
                elapsed=time.perf_counter() - started,
            )
            logger.info("window %s:%d-%d -> %d sites", *window, sites)
            total += sites
    if output_path:
        output_fh.close()
    joblog.close()
    if failures:
        logger.error(
            "%d window(s) failed; re-run with resume=True (or --resume) to "
            "retry only those — audit log: %s", failures, joblog.path,
        )
    if gz_path and output_path:
        if failures == 0:
            from clair_tpu.io.tbi import bgzip_file, build_tbi

            if appending:
                # retried windows appended AFTER later-coordinate rows;
                # build_tbi requires coordinate-sorted input, so an
                # unsorted stream would get a silently wrong index
                _sort_vcf_file(output_path)
            bgzip_file(output_path, gz_path, remove_src=True)
            build_tbi(gz_path)
        else:
            logger.error(
                "left %s uncompressed so --resume can append; a clean "
                "re-run will produce %s", output_path, gz_path,
            )
    return total


def _sort_vcf_file(path: str) -> None:
    """Re-sort a resumed plain-text VCF/gVCF into genome order in place
    (contig order from the ##contig header lines, then POS; stable, so
    same-position rows keep their emitted order). Holds the body lines in
    memory — bounded by the VCF itself (~100s of MB for a WGS VCF), and
    only the resumed-run path pays it."""
    header: List[str] = []
    body: List[str] = []
    with open(path) as fh:
        for line in fh:
            (header if line.startswith("#") else body).append(line)
    contig_rank: Dict[str, int] = {}
    for line in header:
        if line.startswith("##contig=<ID="):
            name = line[len("##contig=<ID="):].split(",", 1)[0].split(">", 1)[0]
            contig_rank.setdefault(name, len(contig_rank))

    def key(row: str):
        chrom, pos, _ = row.split("\t", 2)
        return (contig_rank.get(chrom, len(contig_rank)), chrom, int(pos))

    body.sort(key=key)
    with open(path, "w") as fh:
        fh.writelines(header)
        fh.writelines(body)


def merge_vcfs(paths: List[str], output_path: str) -> None:
    """Concatenate per-window VCFs, keeping the first header. A ``.gz``
    output is written as tabix-indexed BGZF (inputs stay plain text)."""
    if output_path.endswith(".gz"):
        from clair_tpu.io.tbi import BgzfTextWriter, build_tbi

        out = BgzfTextWriter(output_path)
    else:
        build_tbi = None
        out = open(output_path, "w")
    wrote_header = False
    try:
        for path in paths:
            with open(path) as fh:
                for line in fh:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                    else:
                        out.write(line)
            wrote_header = True
    finally:
        out.close()
    if build_tbi is not None:
        build_tbi(output_path)
