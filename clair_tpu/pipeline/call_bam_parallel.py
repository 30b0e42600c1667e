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
import logging
import sys
from typing import Iterator, List, Optional, TextIO, Tuple

from clair_tpu.io.fasta import FastaReader
from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
from clair_tpu.utils.intervals import BedIntervals

logger = logging.getLogger(__name__)

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
) -> Iterator[Tuple[str, int, int]]:
    """(contig, ctg_start, ctg_end) 1-based inclusive windows, BED-filtered."""
    whitelist = set(MAJOR_CONTIGS)
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
            yield contig, start, end


def _run_window(args_tuple):
    """Worker entry: build a predictor in-process and call one window."""
    base_config, checkpoint_path, window, output_prefix = args_tuple
    from clair_tpu.models.checkpoint import load_checkpoint
    from clair_tpu.params import ModelConfig
    from clair_tpu.pipeline.call_var import Predictor

    contig, start, end = window
    params, _ = load_checkpoint(checkpoint_path)
    predictor = Predictor(params, ModelConfig())
    config = dataclasses.replace(
        base_config, contig=contig, ctg_start=start, ctg_end=end
    )
    path = f"{output_prefix}.{contig}_{start}_{end}.vcf"
    sites = call_bam(config, predictor, output_path=path)
    return path, window, sites


def call_bam_parallel(
    base_config: CallBamConfig,
    predictor_factory,
    output_prefix: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    include_all_contigs: bool = False,
    max_workers: int = 1,
    checkpoint_path: Optional[str] = None,
) -> List[str]:
    """Run call_bam over every genome window; returns the per-window VCF
    paths (merge with merge_vcfs).

    With max_workers > 1 (requires checkpoint_path), window pileups run on
    a process pool — each worker has its own predictor, keeping the device
    saturated while host pileups proceed in parallel (the reference's
    GNU-parallel share-nothing model, in-process).
    """
    fasta = FastaReader(base_config.fasta_path)
    bed = BedIntervals.from_bed(base_config.bed_path) if base_config.bed_path else None
    windows = list(genome_windows(fasta, chunk_size, include_all_contigs, bed))
    fasta.close()

    outputs = []
    if max_workers > 1 and checkpoint_path is not None:
        import multiprocessing

        context = multiprocessing.get_context("spawn")
        with context.Pool(max_workers) as pool:
            work = [
                (base_config, checkpoint_path, window, output_prefix)
                for window in windows
            ]
            for path, window, sites in pool.imap(_run_window, work):
                logger.info("window %s:%d-%d -> %d sites", *window, sites)
                outputs.append(path)
        return outputs

    predictor = predictor_factory()
    for contig, start, end in windows:
        config = dataclasses.replace(
            base_config, contig=contig, ctg_start=start, ctg_end=end
        )
        path = f"{output_prefix}.{contig}_{start}_{end}.vcf"
        sites = call_bam(config, predictor, output_path=path)
        logger.info("window %s:%d-%d -> %d sites", contig, start, end, sites)
        outputs.append(path)
    return outputs


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
) -> int:
    """Single-process WGS runner: ONE predictor owns the device while
    window pileups run on a thread pool (numpy releases the GIL in the hot
    loops). Windows are consumed in genome order into one merged VCF.

    This is the preferred topology for a host attached to one chip — the
    process-pool mode exists for multi-chip hosts where each worker can own
    a device.
    """
    import concurrent.futures
    import sys

    from clair_tpu.io.vcf import VcfWriter
    from clair_tpu.pipeline.call_bam import call_window, prepare_window

    fasta = FastaReader(base_config.fasta_path)
    bed = BedIntervals.from_bed(base_config.bed_path) if base_config.bed_path else None
    windows = list(genome_windows(fasta, chunk_size, include_all_contigs, bed))
    contigs = fasta.contigs
    fasta.close()

    output_fh = open(output_path, "w") if output_path else sys.stdout
    writer = VcfWriter(
        output_fh,
        sample_name=base_config.sample_name,
        contigs=contigs,
        quality_score_for_pass=base_config.qual,
    )
    writer.write_header()

    total = 0
    with concurrent.futures.ThreadPoolExecutor(pileup_workers) as pool:
        pending = []
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
            pending.append(pool.submit(prepare_window, config))

        for _ in range(min(pileup_workers + prefetch, len(windows))):
            submit_next()
        while pending:
            work = pending.pop(0).result()
            submit_next()
            sites = call_window(work, predictor, writer)
            logger.info(
                "window %s:%d-%d -> %d sites",
                work.config.contig, work.config.ctg_start, work.config.ctg_end, sites,
            )
            total += sites
    if output_path:
        output_fh.close()
    return total


def merge_vcfs(paths: List[str], output_path: str) -> None:
    """Concatenate per-window VCFs, keeping the first header."""
    wrote_header = False
    with open(output_path, "w") as out:
        for path in paths:
            with open(path) as fh:
                for line in fh:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                    else:
                        out.write(line)
            wrote_header = True
