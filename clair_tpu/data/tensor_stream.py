"""Pileup-tensor text stream IO.

Line format (compatible with the reference CreateTensor output,
/root/reference/dataPrepScripts/CreateTensor.py:60-65):

    ctg_name center_pos ref_seq_33 v0 v1 ... v1055

The 1056 ints are the (33, 8, 4) counts in row-major order; sequence index i
corresponds to tensor row i with the candidate site at index 16.

Batching applies the channel normalization the model expects — channels
1..3 (ins/del/SNP) minus channel 0 (reference) — exactly as the reference
does at load time (clair/utils.py:96-98), and parses whole batches with one
vectorized np.fromstring-style pass instead of per-row Python splits.
"""

from __future__ import annotations

import gzip
import sys
from typing import IO, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from clair_tpu.params import INPUT_TENSOR_SIZE, MATRIX_NUM, MATRIX_ROW, NO_OF_POSITIONS
from clair_tpu.utils.genomics import BASE2NUM

TensorInfo = Tuple[str, str, str]  # (ctg_name, position_str, sequence)


def open_maybe_gzip(path: str, mode: str = "rt") -> IO:
    if path == "PIPE" or path == "-":
        return sys.stdin if "r" in mode else sys.stdout
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def parse_tensor_line(line: str) -> Tuple[TensorInfo, np.ndarray]:
    columns = line.split()
    info = (columns[0], columns[1], columns[2])
    tensor = np.array(columns[-INPUT_TENSOR_SIZE:], dtype=np.float32).reshape(
        NO_OF_POSITIONS, MATRIX_ROW, MATRIX_NUM
    )
    return info, tensor


def tensor_line_from(ctg_name: str, position: int, sequence: str, tensor: np.ndarray) -> str:
    flat = tensor.reshape(-1).astype(np.int64)
    return "%s %d %s %s" % (ctg_name, position, sequence, " ".join(map(str, flat)))


def normalize_channels(x: np.ndarray) -> np.ndarray:
    """In-place channel normalization: channels 1..3 -= channel 0."""
    x[..., 1:] -= x[..., 0:1]
    return x


def tensor_batches_from(
    source, batch_size: int, show_progress: bool = False
) -> Iterator[Tuple[np.ndarray, List[TensorInfo]]]:
    """Yield (X, infos) batches from a tensor text stream.

    ``source`` is a file path ("PIPE"/"-" for stdin), an open file object,
    or an iterable of lines. X is channel-normalized (B, 33, 8, 4) float32;
    rows whose center reference base is not an IUPAC base are dropped
    (ref utils.py:90-91). The final batch may be smaller than batch_size.
    """
    close_after = False
    if isinstance(source, str):
        source = open_maybe_gzip(source)
        close_after = source is not sys.stdin

    processed = 0
    infos: List[TensorInfo] = []
    rows: List[str] = []

    def flush():
        nonlocal infos, rows, processed
        if not infos:
            return None
        # vectorized parse: one fromstring pass over the joined tensor columns
        flat = np.fromstring(" ".join(rows), dtype=np.float32, sep=" ")
        x = flat.reshape(len(infos), NO_OF_POSITIONS, MATRIX_ROW, MATRIX_NUM)
        normalize_channels(x)
        processed += len(infos)
        if show_progress:
            print("Processed %d tensors" % processed, file=sys.stderr)
        batch = (x, infos)
        infos, rows = [], []
        return batch

    try:
        for line in source:
            columns = line.split(maxsplit=3)
            if len(columns) < 4:
                continue
            sequence = columns[2]
            center = sequence[NO_OF_POSITIONS // 2] if len(sequence) == NO_OF_POSITIONS else ""
            if center not in BASE2NUM:
                continue
            infos.append((columns[0], columns[1], sequence))
            rows.append(columns[3])
            if len(infos) == batch_size:
                yield flush()
        tail = flush()
        if tail is not None:
            yield tail
    finally:
        if close_after:
            source.close()
