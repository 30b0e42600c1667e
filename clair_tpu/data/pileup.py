"""Vectorized pileup engine: BAM reads -> candidate sites -> pileup tensors.

This replaces the reference's two PyPy CIGAR-walking processes — the
per-read-base dict pileup of ExtractVariantCandidates.py:254-317 and the
active-window event loop of CreateTensor.py:245-365 (the system bottleneck,
README.md:322) — with columnar numpy:

1. each read batch expands its CIGAR into flat event arrays (one np.repeat
   per op class, no per-base Python),
2. candidate selection is a bincount + argsort over the (L, 7) count matrix,
3. tensor creation scatters events into all overlapping candidate windows
   with one bincount over flattened (candidate, position, row, channel)
   indices.

Count semantics preserved from the reference (they define the model input):
- match increments ch0/ch2 at the ref-base row and ch1/ch3 at the
  query-base row; insertions increment ch1 at position+queryAdv (capped at
  the last row); deletions increment ch2 at the ref-base row
  (CreateTensor.py:29-65)
- per-start-position depth cap of 250 reads (CreateTensor.py:267-274)
- candidate I/D counts attach once per op to the position before it
  (ExtractVariantCandidates.py:304-311)
- the <55%-aligned soft-clip read filter (EVC.py:155-170)
- left-edge window inclusion (CreateTensor.py:92-100): with it on (the
  default), every event inside [center-17, center+15] contributes
- 'N' query bases count in the candidate N column (EVC evc_base_from) but
  map to base row 0 in tensors (BASE2NUM['N'] == 0)

Divergences (documented): the 5M "available slots" memory throttle is not
replicated (we never drop events), and N/ref-skip CIGAR ops advance the
reference coordinate correctly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Tuple

import numpy as np

from clair_tpu.params import (
    FLANKING_BASE_NUM,
    MATRIX_NUM,
    MATRIX_ROW,
    MAX_DEPTH_PER_POSITION,
    NO_OF_POSITIONS,
)
from clair_tpu.io.bam import BamRecord, CONSUMES_QUERY, CONSUMES_REF
from clair_tpu.utils.genomics import BASE2ACGT, BASE2NUM, BASE_NUM_LUT

OP_M, OP_I, OP_D, OP_N, OP_S, OP_H, OP_P, OP_EQ, OP_X = range(9)
_MATCH_OPS = (OP_M, OP_EQ, OP_X)

# candidate pileup columns (insertion order matters for tie-breaking: the
# reference sorts dict items {A,C,G,T,I,D,N} with a stable sort)
COL_A, COL_C, COL_G, COL_T, COL_I, COL_D, COL_N = range(7)
PILEUP_COLS = 7

# byte -> candidate column: IUPAC codes collapse to ACGT, N stays N
CANDIDATE_COL_LUT = np.full(256, -1, dtype=np.int8)
for _b in "ACGTURYSWKMBDHV":
    CANDIDATE_COL_LUT[ord(_b)] = BASE2NUM[BASE2ACGT[_b]]
    CANDIDATE_COL_LUT[ord(_b.lower())] = BASE2NUM[BASE2ACGT[_b]]
CANDIDATE_COL_LUT[ord("N")] = COL_N
CANDIDATE_COL_LUT[ord("n")] = COL_N


@dataclass
class ReadEvents:
    """Flat event arrays for a batch of reads (coordinates 0-based)."""

    # per aligned base
    match_pos: np.ndarray
    match_qcol: np.ndarray     # candidate column 0..3 / 6(N), -1 unknown
    match_strand: np.ndarray
    # per inserted base
    ins_pos: np.ndarray        # reference position AFTER the insertion point
    ins_adv: np.ndarray        # 0-based index within the insertion
    ins_qcol: np.ndarray
    ins_strand: np.ndarray
    # per deleted reference base
    del_pos: np.ndarray
    del_strand: np.ndarray
    # per indel OP (for candidate counting and allele recovery)
    ins_op_pos: np.ndarray     # ref position after the insertion point
    del_op_pos: np.ndarray     # first deleted position
    ins_op_len: np.ndarray
    del_op_len: np.ndarray


def _expand_spans(starts: np.ndarray, lengths: np.ndarray):
    """Flatten [start_i, start_i + len_i) spans into positions plus the
    owning span index and within-span cursor."""
    span_id = np.repeat(np.arange(len(lengths)), lengths)
    cursor = np.arange(int(lengths.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths
    )
    return starts[span_id] + cursor, span_id, cursor


def soft_clip_fraction_ok(record: BamRecord) -> bool:
    """Keep reads with >= 55% aligned bases (ref EVC.py:155-170)."""
    total = int(record.cigar_lens.sum())
    soft = int(record.cigar_lens[record.cigar_ops == OP_S].sum())
    return 1.0 - soft / (total + 1) >= 0.55


def apply_depth_cap(
    records: Iterable[BamRecord], dcov: int = MAX_DEPTH_PER_POSITION
) -> List[BamRecord]:
    """Cap reads per start position (ref CreateTensor.py:267-274 counts
    records sharing POS and skips beyond dcov)."""
    kept = []
    previous_pos, count = -1, 0
    for record in records:
        if record.pos != previous_pos:
            previous_pos, count = record.pos, 0
        else:
            count += 1
            if count >= dcov:
                continue
        kept.append(record)
    return kept


def events_from_reads(records: Iterable[BamRecord]) -> ReadEvents:
    """Expand a read batch's CIGARs into flat event arrays."""
    m_pos, m_qc, m_st = [], [], []
    i_pos, i_adv, i_qc, i_st = [], [], [], []
    d_pos, d_st = [], []
    iop_pos, dop_pos, iop_len, dop_len = [], [], [], []

    for record in records:
        ops, lens = record.cigar_ops, record.cigar_lens
        strand = 1 if record.is_reverse else 0
        qcol = CANDIDATE_COL_LUT[record.seq]

        ref_starts = record.pos + np.concatenate(
            [[0], np.cumsum(np.where(CONSUMES_REF[ops], lens, 0))[:-1]]
        )
        q_starts = np.concatenate(
            [[0], np.cumsum(np.where(CONSUMES_QUERY[ops], lens, 0))[:-1]]
        )

        is_match = np.isin(ops, _MATCH_OPS)
        if is_match.any():
            pos, span_id, cursor = _expand_spans(ref_starts[is_match], lens[is_match])
            q = q_starts[is_match][span_id] + cursor
            m_pos.append(pos)
            m_qc.append(qcol[q])
            m_st.append(np.full(len(pos), strand, dtype=np.int8))

        is_ins = ops == OP_I
        if is_ins.any():
            # insertions do not consume reference: every inserted base keeps
            # the op's reference position; only the query cursor advances
            _, span_id, cursor = _expand_spans(ref_starts[is_ins], lens[is_ins])
            q = q_starts[is_ins][span_id] + cursor
            i_pos.append(ref_starts[is_ins][span_id])
            i_adv.append(cursor)
            i_qc.append(qcol[q])
            i_st.append(np.full(len(span_id), strand, dtype=np.int8))
            iop_pos.append(ref_starts[is_ins])
            iop_len.append(lens[is_ins].astype(np.int64))

        is_del = ops == OP_D
        if is_del.any():
            pos, _, _ = _expand_spans(ref_starts[is_del], lens[is_del])
            d_pos.append(pos)
            d_st.append(np.full(len(pos), strand, dtype=np.int8))
            dop_pos.append(ref_starts[is_del])
            dop_len.append(lens[is_del].astype(np.int64))

    def cat(parts, dtype=np.int64):
        return np.concatenate(parts) if parts else np.empty(0, dtype=dtype)

    return ReadEvents(
        match_pos=cat(m_pos), match_qcol=cat(m_qc, np.int8), match_strand=cat(m_st, np.int8),
        ins_pos=cat(i_pos), ins_adv=cat(i_adv), ins_qcol=cat(i_qc, np.int8),
        ins_strand=cat(i_st, np.int8),
        del_pos=cat(d_pos), del_strand=cat(d_st, np.int8),
        ins_op_pos=cat(iop_pos), del_op_pos=cat(dop_pos),
        ins_op_len=cat(iop_len), del_op_len=cat(dop_len),
    )


# ---------------------------------------------------------------------------
# Candidate selection (ExtractVariantCandidates equivalent)
# ---------------------------------------------------------------------------

def pileup_counts(events: ReadEvents, region_start: int, region_length: int) -> np.ndarray:
    """(region_length, 7) counts of A/C/G/T/I/D/N per reference position."""
    counts = np.zeros((region_length, PILEUP_COLS), dtype=np.int32)

    ok = events.match_qcol >= 0
    pos = events.match_pos[ok] - region_start
    in_region = (pos >= 0) & (pos < region_length)
    np.add.at(
        counts,
        (pos[in_region], events.match_qcol[ok][in_region].astype(np.int64)),
        1,
    )

    for op_pos, column in ((events.ins_op_pos, COL_I), (events.del_op_pos, COL_D)):
        attach = op_pos - 1 - region_start
        in_region = (attach >= 0) & (attach < region_length)
        np.add.at(counts[:, column], attach[in_region], 1)

    return counts


@dataclass
class CandidateSites:
    positions: np.ndarray       # 0-based reference positions
    depths: np.ndarray
    counts: np.ndarray          # (n, 7) A/C/G/T/I/D/N
    reference_bases: List[str]  # collapsed to ACGT/N


def select_candidates(
    counts: np.ndarray,
    reference_sequence: str,
    region_start: int,
    ref_seq_start: int,
    minimum_af: float,
    minimum_coverage: float,
    position_mask: Optional[np.ndarray] = None,
) -> CandidateSites:
    """Vectorized candidate filter (ref EVC.py:319-378).

    depth = sum(A,C,G,T,N); a site passes if the dominant pileup column is
    not the reference base, or the second column's count / depth clears the
    AF threshold. Column tie-breaking keeps A,C,G,T,I,D,N order (stable
    sort), like the reference's dict-item sort.
    """
    region_length = len(counts)
    depth = counts[:, [COL_A, COL_C, COL_G, COL_T, COL_N]].sum(axis=1)

    offset = region_start - ref_seq_start
    ref_raw = np.frombuffer(reference_sequence.encode("ascii"), dtype=np.uint8)[
        offset: offset + region_length
    ]
    ref_column = CANDIDATE_COL_LUT[ref_raw].astype(np.int64)

    order = np.argsort(-counts, axis=1, kind="stable")
    top_column = order[:, 0]
    second_count = np.take_along_axis(counts, order[:, 1:2], axis=1)[:, 0]

    denominator = np.where(depth > 0, depth, 1)
    passes = (depth >= minimum_coverage) & (
        (top_column != ref_column) | (second_count / denominator >= minimum_af)
    )
    if position_mask is not None:
        passes &= position_mask
    passes &= ref_column >= 0

    idx = np.nonzero(passes)[0]
    # reference bases reported collapsed to ACGT (N stays N), EVC evc_base_from
    collapsed = bytes(
        ord(BASE2ACGT[chr(b)]) if chr(b) != "N" and chr(b) in BASE2ACGT else b
        for b in ref_raw[idx]
    ).decode("ascii")
    return CandidateSites(
        positions=idx + region_start,
        depths=depth[idx],
        counts=counts[idx],
        reference_bases=list(collapsed),
    )


# ---------------------------------------------------------------------------
# Tensor creation (CreateTensor equivalent)
# ---------------------------------------------------------------------------

def create_tensors(
    events: ReadEvents,
    centers: np.ndarray,
    reference_sequence: str,
    ref_seq_start: int,
    minimum_coverage: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Scatter events into 33x8x4 count tensors for every candidate center.

    centers: 1-based candidate positions, SORTED ascending.
    reference_sequence: chunk reference starting at 0-based ref_seq_start.

    Returns (tensors, kept_centers, sequences): raw count tensors (not yet
    channel-normalized) and the 33-mer contexts (sequence index i pairs with
    tensor row i; the candidate site sits at index 16). Candidates failing
    minimum coverage at the center row or with incomplete flank context are
    dropped (ref CreateTensor.py:57-59).
    """
    centers = np.asarray(centers, dtype=np.int64)
    n = len(centers)
    flank = FLANKING_BASE_NUM
    if n == 0:
        return (
            np.zeros((0, NO_OF_POSITIONS, MATRIX_ROW, MATRIX_NUM), np.float32),
            centers,
            [],
        )

    size = NO_OF_POSITIONS * MATRIX_ROW * MATRIX_NUM
    flat = np.zeros(n * size, dtype=np.int64)

    ref_raw = np.frombuffer(reference_sequence.encode("ascii"), dtype=np.uint8)
    ref_rows_full = BASE_NUM_LUT[ref_raw].astype(np.int64)

    def scatter(pos, row_base, strand, channels, adv=None):
        """Add events to every candidate window containing them."""
        if len(pos) == 0:
            return
        # windows with center c (1-based) contain event position p (0-based)
        # when p - c + 17 falls in [0, 33) -> c in [p - 15, p + 17]
        lo = np.searchsorted(centers, pos - flank + 1, side="left")
        hi = np.searchsorted(centers, pos + flank + 1, side="right")
        span = hi - lo
        keep = span > 0
        if not keep.any():
            return
        pos, row_base, strand, lo, span = (
            pos[keep], row_base[keep], strand[keep], lo[keep], span[keep]
        )
        if adv is not None:
            adv = adv[keep]
        pair_cand, pair_event, _ = _expand_spans(lo, span)
        position_index = pos[pair_event] - centers[pair_cand] + flank + 1
        if adv is not None:
            position_index = np.minimum(
                position_index + adv[pair_event], NO_OF_POSITIONS - 1
            )
        row = row_base[pair_event] + 4 * strand[pair_event]
        base_index = (
            pair_cand * size
            + position_index * (MATRIX_ROW * MATRIX_NUM)
            + row * MATRIX_NUM
        )
        for channel in channels:
            np.add.at(flat, base_index + channel, 1)

    ref_lo, ref_hi = ref_seq_start, ref_seq_start + len(ref_raw)

    # match events: ref row ch0+ch2, query row ch1+ch3
    ok = events.match_qcol >= 0
    mpos = events.match_pos[ok]
    in_ref = (mpos >= ref_lo) & (mpos < ref_hi)
    mpos = mpos[in_ref]
    mq = events.match_qcol[ok][in_ref].astype(np.int64)
    mst = events.match_strand[ok][in_ref].astype(np.int64)
    mq_row = np.where(mq > 3, 0, mq)          # N -> row 0 (BASE2NUM['N'])
    mref_row = ref_rows_full[mpos - ref_seq_start]
    known = mref_row >= 0
    scatter(mpos[known], mref_row[known], mst[known], (0, 2))
    scatter(mpos[known], mq_row[known], mst[known], (1, 3))

    # insertion events: query row ch1 at position + queryAdv (capped)
    ok = events.ins_qcol >= 0
    iq = events.ins_qcol[ok].astype(np.int64)
    scatter(
        events.ins_pos[ok],
        np.where(iq > 3, 0, iq),
        events.ins_strand[ok].astype(np.int64),
        (1,),
        adv=events.ins_adv[ok],
    )

    # deletion events: ref row ch2
    dpos = events.del_pos
    in_ref = (dpos >= ref_lo) & (dpos < ref_hi)
    dpos = dpos[in_ref]
    dref_row = ref_rows_full[dpos - ref_seq_start]
    known = dref_row >= 0
    scatter(
        dpos[known], dref_row[known],
        events.del_strand[in_ref][known].astype(np.int64), (2,),
    )

    tensors = flat.reshape(n, NO_OF_POSITIONS, MATRIX_ROW, MATRIX_NUM).astype(np.float32)

    # depth at the center row == match count == ch0 row sum there
    center_depth = tensors[:, flank, :, 0].sum(axis=1)
    has_left = (centers - (flank + 1) - ref_seq_start) >= 0
    has_right = (centers + flank - ref_seq_start) <= len(ref_raw)
    keep = (center_depth >= minimum_coverage) & has_left & has_right

    sequences = []
    kept = np.nonzero(keep)[0]
    for i in kept:
        c = centers[i] - ref_seq_start
        sequences.append(ref_raw[c - (flank + 1): c + flank].tobytes().decode("ascii"))
    return tensors[kept], centers[kept], sequences
