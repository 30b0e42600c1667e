"""call_bam: BAM -> VCF for one region, in ONE process.

The reference forks a 3-stage Unix pipe of PyPy processes streaming gzip
text (/root/reference/clair/callVarBam.py:185-201). Here the whole path —
read fetch, candidate selection, tensor creation, TPU inference, decode,
VCF — runs in-process on numpy arrays; chunk-level parallelism comes from
call_bam_parallel sharding regions instead.

Region semantics follow the reference: reads fetched with the 2316 flag
filter, candidates restricted to [ctg_start, ctg_end], reference context
fetched with a 1Mb expansion (shared/param.py:5).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

from clair_tpu.data.candidates import (
    CandidateConfig,
    candidate_sites_from_counts,
)
from clair_tpu.data.pileup import (
    apply_depth_cap,
    create_tensors,
    events_from_reads,
    soft_clip_fraction_ok,
)
from clair_tpu.data.tensor_stream import (
    LazyTensorInfos,
    fits_byte,
    normalize_channels,
)
from clair_tpu.io.bam import BamReader
from clair_tpu.io.cram import CramReader, is_cram, open_alignment
from clair_tpu.io.fasta import FastaReader
from clair_tpu.io.vcf import VcfWriter
from clair_tpu.params import EXPAND_REFERENCE_REGION, MAX_DEPTH_PER_POSITION
from clair_tpu.pipeline.call_var import Predictor, _decode_batch
from clair_tpu.pipeline.decode import IndelSources, OutputConfig
from clair_tpu.utils.intervals import BedIntervals

logger = logging.getLogger(__name__)

# batches kept in flight between dispatch and decode (call_window); >1 hides
# the remote link's per-batch round trip behind host decode of earlier
# batches, but a deep queue makes uploads crowd out the next needed
# device->host copy on a single tunnel — measured best at 1-2 on this link
PIPELINE_DEPTH = 1

_BAI_BUILD_LOCK = __import__("threading").Lock()


def _ensure_bai(bam_path: str) -> None:
    """Index once so every window after the first seeks instead of
    scanning; the lock stops the threaded runner's workers from all
    building it. No-op for CRAM (container headers self-index)."""
    import os

    if is_cram(bam_path) or os.path.isfile(bam_path + ".bai"):
        return
    with _BAI_BUILD_LOCK:
        if not os.path.isfile(bam_path + ".bai"):
            try:
                from clair_tpu.io.bai import build_bai

                build_bai(bam_path)
            except Exception:
                pass


def load_region_events(
    bam_path: str,
    contig: str,
    start0: int,
    end: int,
    minimum_mapq: int,
    dcov: int,
    fasta: Optional[FastaReader] = None,
    track_read_layout: bool = False,
):
    """(candidate_events, tensor_events) for a region, via the native C++
    engine when available (BAM only), else the Python reader. ``fasta``
    enables CRAM inputs (reference-based sequence reconstruction);
    ``track_read_layout`` forces the Python reader and per-read layout
    tracking (needed by the reference-parity tensor modes)."""
    from clair_tpu import native

    _ensure_bai(bam_path)

    if native.available() and not track_read_layout:
        if is_cram(bam_path):
            scan = _cram_packed_scan(
                bam_path, fasta, contig, start0, end, minimum_mapq
            )
            if scan is not None:
                with scan:
                    return scan.events_dual(dcov)
        else:
            with BamReader(bam_path) as bam:
                ref_id = bam.reference_id(contig)
            if ref_id is not None:
                result = native.dual_events_from_bam_native(
                    bam_path, ref_id, start0, end,
                    min_mapq=minimum_mapq, dcov=dcov,
                )
                if result is not None:
                    return result

    with open_alignment(bam_path, fasta=fasta) as bam:
        records = list(bam.fetch(contig, start0, end, min_mapq=minimum_mapq))
    candidate_events = events_from_reads(
        [r for r in records if soft_clip_fraction_ok(r)]
    )
    tensor_events = events_from_reads(
        apply_depth_cap(records, dcov), track_read_layout=track_read_layout
    )
    return candidate_events, tensor_events


def _cram_packed_scan(cram_path: str, fasta, contig: str, start0: int,
                      end: int, min_mapq: int, counts_region=None):
    """RegionScan over a CRAM region via the packed-array bridge
    (CramReader.fetch_packed -> clair_region_from_packed), or None when
    the native path cannot take it (library missing, slice needs the
    Python decoder, BAM-inexpressible records). ``fasta`` is a
    FastaReader or path; None returns None (the Python path raises the
    precise missing-reference error)."""
    from clair_tpu import native

    if not native.available() or fasta is None:
        return None
    try:
        with CramReader(cram_path, fasta=fasta) as cram:
            ref_id = cram.reference_id(contig)
            if ref_id is None:
                return None
            packed = cram.fetch_packed(contig, start0, end)
        if packed is None:
            return None
        return native.RegionScan.from_packed(
            packed, ref_id, start0, end, min_mapq=min_mapq,
            counts_region=counts_region,
        )
    except Exception:
        return None


def open_region_scan_path(bam_path: str, fasta, contig: str, ctg_start: int,
                          ctg_end: int, min_mapq: int, counts_region=None):
    """Native RegionScan over a BAM or CRAM region (None -> fall back to
    the Python events engine). CRAM goes through the packed-array bridge
    (_cram_packed_scan); BAM opens the stream scan directly. Shared by
    prepare_window, the region loaders, and the data-prep CLIs."""
    from clair_tpu import native

    if not native.available():
        return None
    if is_cram(bam_path):
        return _cram_packed_scan(
            bam_path, fasta, contig, ctg_start - 1, ctg_end, min_mapq,
            counts_region=counts_region,
        )
    _ensure_bai(bam_path)
    try:
        with BamReader(bam_path) as bam:
            ref_id = bam.reference_id(contig)
        if ref_id is None:
            return None
        return native.RegionScan(
            bam_path, ref_id, ctg_start - 1, ctg_end, min_mapq=min_mapq,
            counts_region=counts_region,
        )
    except Exception:
        return None


def _open_region_scan(config: "CallBamConfig", ctg_start: int, ctg_end: int,
                      fasta: Optional[FastaReader] = None):
    """Native RegionScan for the window (None -> fall back to events).
    CRAM input goes through the packed-array bridge: the native slice
    decoder's arrays feed clair_region_from_packed, which synthesizes
    BAM-format records in memory so the same counts/tensors passes run —
    without it a noisy ONT window paid the Python events engine (~128x
    slower host prepare than BAM)."""
    # fused counts only when something will read them: truth-mode
    # extraction would otherwise pay the dominant accumulation cost for a
    # matrix that is thrown away
    wants_counts = config.truth_vcf_path is None or config.gvcf
    return open_region_scan_path(
        config.bam_path, fasta or config.fasta_path, config.contig,
        ctg_start, ctg_end, config.minimum_mapq,
        counts_region=(
            (ctg_start - 1, ctg_end - (ctg_start - 1))
            if wants_counts else None
        ),
    )


def load_region_counts(
    bam_path: str,
    contig: str,
    start0: int,
    end: int,
    minimum_mapq: int,
    dcov: int,
    region_start: int,
    region_length: int,
    fasta: Optional[FastaReader] = None,
    track_read_layout: bool = False,
):
    """(candidate_counts, tensor_events) for a region. The native engine
    accumulates the candidate pileup matrix inside its single scan —
    candidate events never materialize (they carried ~10 bytes/aligned
    base only to be counted); the Python fallback counts from events."""
    from clair_tpu import native
    from clair_tpu.data.pileup import pileup_counts

    _ensure_bai(bam_path)

    if native.available() and not track_read_layout:
        if is_cram(bam_path):
            scan = _cram_packed_scan(
                bam_path, fasta, contig, start0, end, minimum_mapq
            )
            if scan is not None:
                with scan:
                    return scan.scan_window(dcov, region_start, region_length)
        else:
            with BamReader(bam_path) as bam:
                ref_id = bam.reference_id(contig)
            if ref_id is not None:
                result = native.scan_window_native(
                    bam_path, ref_id, start0, end, region_start, region_length,
                    min_mapq=minimum_mapq, dcov=dcov,
                )
                if result is not None:
                    return result

    candidate_events, tensor_events = load_region_events(
        bam_path, contig, start0, end, minimum_mapq, dcov, fasta=fasta,
        track_read_layout=track_read_layout,
    )
    return (
        pileup_counts(candidate_events, region_start, region_length),
        tensor_events,
    )


_QCOL_TO_BASE = "ACGT??N"
# vectorized form of the same map: index = 6 ('N') for negative or >6 codes
_QCOL_BASE_LUT = np.frombuffer(b"ACGT??N", dtype=np.uint8)


class EventsIndelSources(IndelSources):
    """Long-indel allele recovery from the region's event arrays.

    Replaces the reference's per-site pysam re-pileup (ref
    call_var.py:102-170), which reopened the BAM in the middle of decode.
    The event arrays already carry every indel op (position, length, and
    for insertions the inserted bases), so recovery is a dict lookup plus a
    majority vote — no IO, no second CIGAR walk.
    """

    def __init__(self, events, fasta: FastaReader, contig: str,
                 use_bam_for_all: bool = False):
        super().__init__(
            insertion_bases=self._insertion_bases,
            deletion_bases=self._deletion_bases,
            use_bam_for_all=use_bam_for_all,
        )
        self._fasta = fasta
        self._contig = contig
        self._events = events
        self._ins_sorted_pos = None
        self._del_sorted_pos = None

    def _build(self):
        # Index WITHOUT materializing a base string per insertion op: an ONT
        # window carries ~10^5 (mostly 1 bp, error) insertion ops, while
        # decode queries only the handful of sites that win as insertions.
        # One vectorized code->base blob + a position sort replaces what was
        # ~4 s/window of per-op str.join (profile, 400 kb 35x ONT); strings
        # are cut from the blob per QUERIED position only.
        events = self._events
        self._ins_offsets = np.concatenate(
            [[0], np.cumsum(events.ins_op_len)]
        ).astype(np.int64)
        codes = np.asarray(events.ins_qcol, dtype=np.int64)
        idx = np.where(codes < 0, 6, np.minimum(codes, 6))
        self._ins_blob = _QCOL_BASE_LUT[idx].tobytes()
        pos = np.asarray(events.ins_op_pos, dtype=np.int64)
        # stable: ops at one position keep event order, so the first-max
        # vote tie-break matches the old dict-insertion order exactly
        self._ins_order = np.argsort(pos, kind="stable")
        self._ins_sorted_pos = pos[self._ins_order]
        dpos = np.asarray(events.del_op_pos, dtype=np.int64)
        dorder = np.argsort(dpos, kind="stable")
        self._del_sorted_pos = dpos[dorder]
        self._del_sorted_len = np.asarray(
            events.del_op_len, dtype=np.int64
        )[dorder]

    def _insertion_bases(self, contig, position, minimum_length, maximum_length,
                         bases_to_ignore=""):
        if self._ins_sorted_pos is None:
            self._build()
        p = int(position)
        i0 = np.searchsorted(self._ins_sorted_pos, p, "left")
        i1 = np.searchsorted(self._ins_sorted_pos, p, "right")
        votes = {}
        for j in self._ins_order[i0:i1]:
            bases = self._ins_blob[
                self._ins_offsets[j]:self._ins_offsets[j + 1]
            ].decode("ascii")
            if minimum_length <= len(bases) <= maximum_length and bases != bases_to_ignore:
                votes[bases] = votes.get(bases, 0) + 1
        return max(votes, key=votes.get) if votes else ""

    def _deletion_bases(self, contig, position, minimum_length, maximum_length):
        if self._del_sorted_pos is None:
            self._build()
        p = int(position)
        i0 = np.searchsorted(self._del_sorted_pos, p, "left")
        i1 = np.searchsorted(self._del_sorted_pos, p, "right")
        votes = {}
        for length in self._del_sorted_len[i0:i1]:
            length = int(length)
            if minimum_length <= length <= maximum_length:
                bases = self._fasta.fetch(contig, position, position + length)
                votes[bases] = votes.get(bases, 0) + 1
        return max(votes, key=votes.get) if votes else ""


# backwards-compatible name
BamIndelSources = EventsIndelSources


class RegionIndelSources(IndelSources):
    """Indel recovery for tensor-stream callers (call_var with --bam_fn):
    on first use per contig the BAM region around queried sites is scanned
    via BAI-indexed fetch and CIGAR-walked for indel ops — the reference's
    pysam re-pileup behaviour (ref call_var.py:102-170) without pysam."""

    def __init__(self, bam_path: str, fasta: FastaReader,
                 use_bam_for_all: bool = False):
        super().__init__(
            insertion_bases=self._insertion_bases,
            deletion_bases=self._deletion_bases,
            use_bam_for_all=use_bam_for_all,
        )
        self._bam_path = bam_path
        self._fasta = fasta

    def _indels_at(self, contig: str, position_1based: int):
        insertions, deletions = [], []
        target = position_1based
        with open_alignment(self._bam_path, fasta=self._fasta) as bam:
            for record in bam.fetch(contig, target - 1, target + 1):
                refpos, qpos = record.pos, 0
                seq = record.seq_str()
                for op, length in zip(record.cigar_ops, record.cigar_lens):
                    opc = "MIDNSHP=X"[op]
                    if opc == "S":
                        qpos += length
                    elif opc in "M=X":
                        refpos += length
                        qpos += length
                    elif opc == "I":
                        if refpos == target:
                            insertions.append(seq[qpos:qpos + length].upper())
                        qpos += length
                    elif opc in "DN":
                        if refpos == target and opc == "D":
                            deletions.append(int(length))
                        refpos += length
        return insertions, deletions

    def _insertion_bases(self, contig, position, minimum_length, maximum_length,
                         bases_to_ignore=""):
        insertions, _ = self._indels_at(contig, position)
        votes = {}
        for bases in insertions:
            if minimum_length <= len(bases) <= maximum_length and bases != bases_to_ignore:
                votes[bases] = votes.get(bases, 0) + 1
        return max(votes, key=votes.get) if votes else ""

    def _deletion_bases(self, contig, position, minimum_length, maximum_length):
        _, deletions = self._indels_at(contig, position)
        votes = {}
        for length in deletions:
            if minimum_length <= length <= maximum_length:
                bases = self._fasta.fetch(contig, position, position + length)
                votes[bases] = votes.get(bases, 0) + 1
        return max(votes, key=votes.get) if votes else ""


@dataclass
class CallBamConfig:
    bam_path: str = ""
    fasta_path: str = ""
    contig: str = ""
    ctg_start: Optional[int] = None     # 1-based inclusive
    ctg_end: Optional[int] = None       # 1-based inclusive
    bed_path: Optional[str] = None
    minimum_af: float = 0.125
    minimum_coverage: float = 4
    minimum_mapq: int = 0
    dcov: int = MAX_DEPTH_PER_POSITION
    sample_name: str = "SAMPLE"
    qual: Optional[int] = None
    show_reference: bool = False
    haploid_precision: bool = False
    haploid_sensitive: bool = False
    use_bam_for_all_indels: bool = False
    # GetTruth-mode: call at truth positions instead of extracted candidates
    truth_vcf_path: Optional[str] = None
    # reference-parity tensor mode (CreateTensor.py:187: exclude candidates
    # whose window only overlaps a read's left edge); forces the Python
    # tensor engine with per-read layout tracking
    stop_consider_left_edge: bool = False
    # per-site probability dump / ensemble tensor+probability output
    debug: bool = False
    output_for_ensemble: bool = False
    # gVCF mode: reference-confidence blocks between variant rows
    # (pipeline/gvcf.py; flag names follow the Clair3 CLI)
    gvcf: bool = False
    base_err: float = 0.001
    gq_bin_size: int = 5


@dataclass
class WindowWork:
    """Host-side pileup result for one region, ready for device inference.

    ``tensors`` are RAW uint8 counts when every count in the window fits
    a byte (the common case at WGS depth with the default dcov=250): the
    predictor ships the bytes as-is (half the int16 uplink, the dominant
    e2e cost at remote-link speeds) and channel normalization
    (ch1..3 -= ch0, ref utils.py:96-98) happens on device inside the
    jitted forward; the host decode lattice normalizes lazily per batch
    (tensor_stream.normalized_f32). dcov caps reads per START position
    (ref CreateTensor.py:267-274), not column depth, so >255x pileups
    (chrM, amplicons, the 550x highcov regime) can exceed a byte even at
    dcov=250 — those windows, and any dcov > 255 run, ship
    channel-normalized float32 exactly as before (per-window decision;
    the predictor compiles once per link dtype). The
    text-tensor CLI (create_tensor) keeps raw counts: it goes through
    data/pileup.create_tensors directly, not through prepare_window."""

    config: CallBamConfig
    tensors: np.ndarray
    centers: np.ndarray
    sequences: list
    indel_sources: EventsIndelSources
    contigs: list
    output_config: OutputConfig
    # gVCF mode: (contig, window_start_1based, depth, gq, ref_bytes) for
    # the block writer (pipeline/gvcf.py), None otherwise
    gvcf_data: Optional[tuple] = None


def prepare_window(config: CallBamConfig, fasta: Optional[FastaReader] = None) -> WindowWork:
    """Host pileup for one region: read fetch -> candidate selection ->
    tensor creation. Pure host work (runs on worker threads in the WGS
    runner; numpy releases the GIL in the hot loops)."""
    import time

    t_start = time.perf_counter()
    own_fasta = fasta is None
    if own_fasta:
        fasta = FastaReader(config.fasta_path)
    contig_length = fasta.contig_length(config.contig)
    # clamp BOTH ends to the contig: a window spec beyond the end
    # (user-supplied ranges from a different build, round chunk sizes)
    # must not break candidate selection — a fully out-of-range window
    # degrades to a 1 bp window with zero candidates
    ctg_start = min(max(config.ctg_start or 1, 1), contig_length)
    ctg_end = min(max(config.ctg_end or contig_length, ctg_start),
                  contig_length)

    # expanded reference context around the region (ref param.py:5)
    ref_seq_start = max(ctg_start - 1 - EXPAND_REFERENCE_REGION, 0)
    ref_seq_end = min(ctg_end + EXPAND_REFERENCE_REGION, contig_length)
    reference_sequence = fasta.fetch(config.contig, ref_seq_start, ref_seq_end)

    # Fully-native fast path: inflate + filter the region's records ONCE,
    # run the candidate counts pass, select sites, then build the window
    # tensors in C++ — match events (~93% of event volume) never cross
    # into Python. Fallback: the dual-events path below (forced by the
    # left-edge parity mode, which needs per-read layout tracking).
    scan = (
        None if config.stop_consider_left_edge
        else _open_region_scan(config, ctg_start, ctg_end, fasta=fasta)
    )

    def truth_centers():
        from clair_tpu.data.truth import truth_variants_from_vcf

        return np.array(
            sorted(
                int(v.position)
                for v in truth_variants_from_vcf(
                    config.truth_vcf_path, config.contig, ctg_start, ctg_end, fasta
                )
            ),
            dtype=np.int64,
        )

    def select_sites(counts):
        candidate_config = CandidateConfig(
            minimum_af=config.minimum_af,
            minimum_coverage=config.minimum_coverage,
            bed=BedIntervals.from_bed(config.bed_path),
            contig=config.contig,
        )
        sites = candidate_sites_from_counts(
            counts,
            reference_sequence,
            region_start=ctg_start - 1,
            ref_seq_start=ref_seq_start,
            config=candidate_config,
        )
        return sites.positions + 1  # 1-based

    if config.gvcf and (config.output_for_ensemble or config.debug):
        raise ValueError(
            "--gvcf is incompatible with ensemble/debug output (those "
            "modes write non-VCF rows that cannot carry reference blocks)"
        )

    region_counts = None  # (region_length, 7) matrix, kept for gVCF mode
    if scan is not None:
        from clair_tpu.data.pileup import finalize_window_tensors

        with scan:
            if config.truth_vcf_path is None or config.gvcf:
                region_counts = scan.counts(
                    ctg_start - 1, ctg_end - (ctg_start - 1)
                )
            if config.truth_vcf_path is not None:
                centers = truth_centers()
            else:
                centers = select_sites(region_counts)
            tensor_ints, tensor_events = scan.tensors(
                centers, reference_sequence, ref_seq_start, dcov=config.dcov
            )
        ref_bytes = reference_sequence.encode("ascii")
        # raw-uint8 uplink only when every count actually fits a byte:
        # dcov caps reads per start position, not column depth, so the
        # finalizers verify the counts and fall back to exact float32
        # rather than saturate (which would change calls on >255x data)
        raw_uplink = config.dcov <= 255
        if raw_uplink:
            from clair_tpu.native import finalize_windows_raw_native

            finalized = finalize_windows_raw_native(
                tensor_ints, centers, ref_bytes, ref_seq_start
            )
        else:
            from clair_tpu.native import finalize_windows_native

            finalized = finalize_windows_native(
                tensor_ints, centers, ref_bytes, ref_seq_start
            )
        if finalized is not None:
            tensors, centers, sequences = finalized
        else:
            ref_raw = np.frombuffer(ref_bytes, dtype=np.uint8)
            tensors, centers, sequences = finalize_window_tensors(
                tensor_ints, centers, ref_raw, ref_seq_start
            )
            if raw_uplink and fits_byte(tensors):
                tensors = tensors.astype(np.uint8)
            else:
                tensors = tensors.astype(np.float32)
                normalize_channels(tensors)
    else:
        candidate_counts, tensor_events = load_region_counts(
            config.bam_path, config.contig, ctg_start - 1, ctg_end,
            config.minimum_mapq, config.dcov,
            region_start=ctg_start - 1,
            region_length=ctg_end - (ctg_start - 1),
            fasta=fasta,
            track_read_layout=config.stop_consider_left_edge,
        )
        region_counts = candidate_counts
        if config.truth_vcf_path is not None:
            centers = truth_centers()
        else:
            centers = select_sites(candidate_counts)
        tensors, centers, sequences = create_tensors(
            tensor_events, centers, reference_sequence, ref_seq_start,
            minimum_coverage=0,
            consider_left_edge=not config.stop_consider_left_edge,
        )
        if config.dcov <= 255 and fits_byte(tensors):
            tensors = tensors.astype(np.uint8)
        else:
            normalize_channels(tensors)

    gvcf_data = None
    if config.gvcf and region_counts is not None:
        from clair_tpu.pipeline.gvcf import reference_confidence

        offset = (ctg_start - 1) - ref_seq_start
        region_length = ctg_end - (ctg_start - 1)
        window_ref = reference_sequence[
            offset: offset + region_length
        ].encode("ascii")
        gvcf_depth, gvcf_gq = reference_confidence(
            region_counts, window_ref, config.base_err
        )
        gvcf_data = (config.contig, ctg_start, gvcf_depth, gvcf_gq, window_ref)

    work = WindowWork(
        config=config,
        tensors=tensors,
        centers=centers,
        sequences=sequences,
        gvcf_data=gvcf_data,
        indel_sources=EventsIndelSources(
            tensor_events, fasta, config.contig, config.use_bam_for_all_indels
        ),
        contigs=fasta.contigs,
        output_config=OutputConfig(
            is_show_reference=config.show_reference,
            is_haploid_precision_mode_enabled=config.haploid_precision,
            is_haploid_sensitive_mode_enabled=config.haploid_sensitive,
            is_debug=config.debug,
            is_output_for_ensemble=config.output_for_ensemble,
            quality_score_for_pass=config.qual,
        ),
    )
    if own_fasta:
        # keep the FASTA open: the indel sources fetch deletion bases lazily
        work._fasta_to_close = fasta  # type: ignore[attr-defined]
    logger.debug(
        "prepare %s:%s-%s: %d candidates in %.2fs",
        config.contig, ctg_start, ctg_end, len(centers),
        time.perf_counter() - t_start,
    )
    return work


def call_window(work: WindowWork, predictor: Predictor, writer: VcfWriter,
                debug_fh=None) -> int:
    """Device inference + decode + VCF rows for one prepared window.
    In ensemble mode rows are tensor+probability dumps instead of VCF
    (ref callVarBam.py forwards --output_for_ensemble to call_var)."""
    config = work.config
    total = 0
    batch = predictor.batch_size

    def flush(pending):
        from clair_tpu.pipeline.call_var import emit_batch

        return emit_batch(pending, predictor, work.output_config, writer,
                          work.indel_sources, debug_fh)

    # Keep several batches in flight: on a remote TPU link the round trip
    # per batch (dispatch + device->host copy) is the dominant cost, and
    # depth-1 pipelining exposes it once per batch. With the async host
    # copy started at dispatch (Predictor.predict_async), a deeper queue
    # lets transfers for batches k+1..k+D proceed while batch k decodes.
    from collections import deque

    writer.begin_window(work)
    try:
        pending = deque()
        for off in range(0, len(work.tensors), batch):
            x = work.tensors[off:off + batch]  # raw u8 or normalized f32; read-only
            infos = LazyTensorInfos(
                config.contig,
                work.centers[off:off + len(x)],
                work.sequences[off:off + len(x)],
            )
            out, n = predictor.predict_async(x)
            pending.append((infos, x, out, n))
            if len(pending) > PIPELINE_DEPTH:
                total += flush(pending.popleft())
        while pending:
            total += flush(pending.popleft())
        writer.end_window()
    except BaseException:
        # a failed window must write NOTHING (partial rows / gVCF blocks
        # over undecoded candidates would double-cover once it is retried)
        writer.abandon_window()
        raise
    finally:
        fasta = getattr(work, "_fasta_to_close", None)
        if fasta is not None:
            fasta.close()
    return total


def call_bam(
    config: CallBamConfig,
    predictor: Predictor,
    output_path: Optional[str] = None,
    output_fh=None,
) -> int:
    """Run the full BAM -> VCF pipeline for one region; returns the number
    of candidate sites called."""
    import sys

    work = prepare_window(config)

    close_output = False
    bgzip_out = bool(output_path) and output_path.endswith(".gz")
    if output_fh is None:
        if bgzip_out:
            from clair_tpu.io.tbi import BgzfTextWriter

            output_fh = BgzfTextWriter(output_path)
        else:
            output_fh = open(output_path, "w") if output_path else sys.stdout
        close_output = output_path is not None
    from clair_tpu.io.vcf import make_writer

    writer = make_writer(config, output_fh, contigs=work.contigs)
    if not config.output_for_ensemble:
        writer.write_header()

    total = call_window(
        work, predictor, writer,
        debug_fh=output_fh if config.debug else None,
    )

    if close_output:
        output_fh.close()
        if bgzip_out and not (config.output_for_ensemble or config.debug):
            # ensemble/debug streams interleave non-VCF lines the tabix
            # VCF preset cannot index; plain bgzf output still stands
            from clair_tpu.io.tbi import build_tbi

            build_tbi(output_path)
    return total
