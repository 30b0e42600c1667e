"""Training-bin format: blocked, compressed tensor/label arrays.

The reference pickles lists of blosc-lz4hc(shuffle) blocks of 500 examples
(/root/reference/clair/utils.py:133-220, dataPrepScripts/Tensor2Bin.py).
blosc is not available here, so this framework defines its own format with
the same blocked layout (block = shuffle/IO unit). Block codec since v3:
byte-shuffled LZ4-HC over the system liblz4 (clair_tpu/io/lz4.py) — the
same codec blosc gave the reference — because the 1-thread epoch feed is
decompression-bound and LZ4S inflates 2.5x faster than the zstd-6 blocks
of v1/v2 at ~5% worse ratio. zstd stays the write fallback where liblz4
is missing and the read path for v1/v2 bins; an optional compatibility
reader handles reference blosc bins when the blosc package is importable.

Bins store CHANNEL-NORMALIZED X blocks (normalization happens at bin build
time, like the reference utils.py:152-154).
"""

from __future__ import annotations

import io as _io
import pickle
import sys
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np
import zstandard

from clair_tpu.data.tensor_stream import normalize_channels, open_maybe_gzip
from clair_tpu.io import lz4 as _lz4
from clair_tpu.params import (
    BIN_BLOCK_SIZE,
    INPUT_TENSOR_SIZE,
    MATRIX_NUM,
    MATRIX_ROW,
    NO_OF_POSITIONS,
    PREDICT_BATCH_SIZE,
    TRAIN_BATCH_SIZE,
)
from clair_tpu.task.labels import label_vector_from_reference, label_vector_from_truth
from clair_tpu.utils.genomics import BASE2ACGT, BASIC_BASES
from clair_tpu.utils.intervals import BedIntervals

# v2: block payloads may be int16-packed (restored to float32 on read).
# v3: blocks may additionally be LZ4S frames (byte-shuffled LZ4-HC, the
# reference's own blosc-lz4hc-9+shuffle codec — clair/utils.py:47-48 —
# over the system liblz4). Magic bumped at each step so an older reader
# rejects newer bins loudly; this reader accepts all three.
MAGIC = "clair_tpu_bin_v3"
_KNOWN_MAGICS = {"clair_tpu_bin_v1", "clair_tpu_bin_v2", MAGIC}
_DUP_PREFIXES = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

# LZ4S block frame: magic, pad byte count (0/1), raw (shuffled) length,
# then one LZ4 block. Byte-pair shuffle turns the int16 tensor stream
# into a low-byte plane + a high-byte plane (the high plane is almost
# pure 0x00/0xFF for channel-normalized counts), which both compresses
# better under LZ4 and decompresses at LZ4 speed — measured 2.2x the
# zstd-6 block inflate rate at ~5% worse ratio on the bench fixture; the
# 1-thread epoch feed was the bf16 train step's binding stage.
_LZ4S_MAGIC = b"LZ4S"


def _pack(array: np.ndarray) -> bytes:
    # Pileup tensors are channel-normalized integer counts in
    # [-dcov, dcov] stored as float32; packing them as int16 when that
    # round-trips losslessly halves the raw bytes the epoch iterator
    # must decompress (the host feed was the training bottleneck:
    # ~130k samples/s vs the chip's 171k+). _unpack restores float32,
    # so readers are unchanged; float blocks that do not fit (shouldn't
    # happen for tensors, possible for exotic labels) stay float32.
    if array.dtype == np.float32:
        with np.errstate(invalid="ignore"):  # NaN/overflow fail the check below
            as_int = array.astype(np.int16)
        if np.array_equal(as_int.astype(np.float32), array):
            array = as_int
    buf = _io.BytesIO()
    np.save(buf, array, allow_pickle=False)
    payload = buf.getvalue()
    if _lz4.available():
        pad = len(payload) & 1
        if pad:
            payload += b"\x00"
        flat = np.frombuffer(payload, np.uint8)
        # byte-pair shuffle: all low bytes, then all high bytes
        shuffled = np.ascontiguousarray(
            flat.reshape(-1, 2).T
        ).tobytes()
        return (_LZ4S_MAGIC + bytes([pad])
                + len(payload).to_bytes(4, "little")
                + _lz4.compress_hc(shuffled, level=9))
    return zstandard.ZstdCompressor(level=6).compress(payload)


import threading as _threading

_TLS = _threading.local()  # ZstdDecompressor is not thread-safe; cache one per thread
_NPY_MAGIC = b"\x93NUMPY"


def _fast_npy(raw) -> np.ndarray:
    """Zero-copy .npy v1.0 reader for the blocks _pack writes.

    np.load's generic path re-parses the header dict through ast on every
    block — measured ~18% of the 1-thread epoch-feed cost. _pack always
    writes C-order v1.0 arrays, so a minimal scanner + np.frombuffer
    suffices; anything unexpected falls back to np.load. Accepts bytes or
    any buffer (the LZ4S path hands it a uint8 array view)."""
    if not isinstance(raw, bytes):
        raw = memoryview(raw)
        head = bytes(raw[:10])
    else:
        head = raw[:10]
    if head[:6] != _NPY_MAGIC or head[6:8] != b"\x01\x00":
        return np.load(_io.BytesIO(bytes(raw)), allow_pickle=False)
    header_len = int.from_bytes(head[8:10], "little")
    header = bytes(raw[10:10 + header_len]).decode("latin1")
    try:
        descr_at = header.index("'descr':")
        q0 = header.index("'", descr_at + 8) + 1
        descr = header[q0:header.index("'", q0)]
        shape_at = header.index("'shape':")
        p0 = header.index("(", shape_at) + 1
        shape = tuple(
            int(x) for x in header[p0:header.index(")", p0)].split(",")
            if x.strip()
        )
        if "'fortran_order': False" not in header:
            raise ValueError
        return np.frombuffer(
            raw, dtype=np.dtype(descr), offset=10 + header_len
        ).reshape(shape)
    except (ValueError, TypeError):
        return np.load(_io.BytesIO(raw), allow_pickle=False)


def _unpack(blob: bytes, cast: bool = True) -> np.ndarray:
    if blob[:4] == _LZ4S_MAGIC:
        pad = blob[4]
        raw_n = int.from_bytes(blob[5:9], "little")
        planes = _lz4.decompress(memoryview(blob)[9:], raw_n).reshape(
            2, raw_n // 2
        )
        # un-shuffle by u16 arithmetic (low | high<<8, then view the
        # little-endian bytes): ~10x faster than a strided transpose copy
        interleaved = planes[1].astype("<u2")
        interleaved <<= 8
        interleaved |= planes[0]
        out = _fast_npy(interleaved.view(np.uint8)[: raw_n - pad])
    else:
        dctx = getattr(_TLS, "dctx", None)
        if dctx is None:
            dctx = _TLS.dctx = zstandard.ZstdDecompressor()
        out = _fast_npy(dctx.decompress(blob))
    if cast and out.dtype == np.int16:
        return out.astype(np.float32)
    return out


@dataclass
class BinDataset:
    dataset_size: int
    x_blocks: List[bytes]
    y_blocks: List[bytes]
    pos_blocks: List[bytes]
    block_size: int = BIN_BLOCK_SIZE
    # set when train/val bins were concatenated (ref utils.py:276-289)
    train_size_hint: Optional[int] = None
    _codec: str = "zstd"

    @property
    def n_blocks(self) -> int:
        return len(self.x_blocks)

    def x_block(self, i: int, cast: bool = True) -> np.ndarray:
        return self._load(self.x_blocks[i], cast=cast)

    def y_block(self, i: int, cast: bool = True) -> np.ndarray:
        return self._load(self.y_blocks[i], cast=cast)

    def pos_block(self, i: int) -> np.ndarray:
        return self._load(self.pos_blocks[i])

    def _load(self, blob: bytes, cast: bool = True) -> np.ndarray:
        if self._codec == "zstd":
            return _unpack(blob, cast=cast)
        if self._codec == "blosc":  # reference-bin compatibility
            import blosc

            return blosc.unpack_array(blob)
        raise ValueError(f"unknown codec {self._codec}")


def write_bin(path: str, dataset: BinDataset) -> None:
    with open(path, "wb") as fh:
        pickle.dump(
            {
                "magic": MAGIC,
                "dataset_size": dataset.dataset_size,
                "block_size": dataset.block_size,
                "x_blocks": dataset.x_blocks,
                "y_blocks": dataset.y_blocks,
                "pos_blocks": dataset.pos_blocks,
            },
            fh,
            protocol=4,
        )


def load_bin(path: str) -> BinDataset:
    """Load a clair_tpu bin; falls back to the reference's 4-pickle blosc
    layout (Tensor2Bin.py:15-33) when blosc is importable."""
    with open(path, "rb") as fh:
        head = pickle.load(fh)
        if isinstance(head, dict) and "magic" in head:
            if head["magic"] not in _KNOWN_MAGICS:
                raise ValueError(
                    f"{path} carries bin format {head['magic']!r}, which this "
                    "version does not know — it was written by a newer clair_tpu"
                )
            return BinDataset(
                dataset_size=head["dataset_size"],
                x_blocks=head["x_blocks"],
                y_blocks=head["y_blocks"],
                pos_blocks=head["pos_blocks"],
                block_size=head["block_size"],
            )
        # reference layout: dataset_size, X[], Y[], pos[] as 4 pickles
        dataset_size = head
        x_blocks = pickle.load(fh)
        y_blocks = pickle.load(fh)
        pos_blocks = pickle.load(fh)
        return BinDataset(
            dataset_size=dataset_size,
            x_blocks=x_blocks,
            y_blocks=y_blocks,
            pos_blocks=pos_blocks,
            _codec="blosc",
        )


def load_train_val_bins(train_path: str, validation_path: str) -> BinDataset:
    """Concatenate separate train/val bins; records the train size so the
    split is by file rather than by percentage (ref utils.py:276-289)."""
    train = load_bin(train_path)
    val = load_bin(validation_path)
    if train._codec != val._codec:
        raise ValueError("cannot mix bin codecs")
    return BinDataset(
        dataset_size=train.dataset_size + val.dataset_size,
        x_blocks=train.x_blocks + val.x_blocks,
        y_blocks=train.y_blocks + val.y_blocks,
        pos_blocks=train.pos_blocks + val.pos_blocks,
        block_size=train.block_size,
        train_size_hint=train.dataset_size,
        _codec=train._codec,
    )


def combine_bins(paths: List[str], output_path: str) -> BinDataset:
    """Merge bins (the reference's CombineBins.py)."""
    datasets = [load_bin(p) for p in paths]
    merged = BinDataset(
        dataset_size=sum(d.dataset_size for d in datasets),
        x_blocks=[b for d in datasets for b in d.x_blocks],
        y_blocks=[b for d in datasets for b in d.y_blocks],
        pos_blocks=[b for d in datasets for b in d.pos_blocks],
        block_size=datasets[0].block_size,
        _codec=datasets[0]._codec,
    )
    if merged._codec != "zstd":
        raise ValueError("combine only supports clair_tpu bins")
    write_bin(output_path, merged)
    return merged


# ---------------------------------------------------------------------------
# Bin building from tensor/truth text streams (Tensor2Bin equivalent)
# ---------------------------------------------------------------------------

def variant_map_from(var_fn: Optional[str], bed: BedIntervals) -> dict:
    """Truth-label map keyed 'ctg:pos' from GetTruth-format lines
    (ref clair/utils.py:112-130)."""
    y = {}
    if var_fn is None:
        return y
    with open_maybe_gzip(var_fn) as fh:
        for row in fh:
            columns = row.split()
            ctg_name, position_str = columns[0], columns[1]
            if not (bed.is_empty or bed.contains_point(ctg_name, int(position_str))):
                continue
            y[ctg_name + ":" + position_str] = label_vector_from_truth(
                columns[2], columns[3], int(columns[4]), int(columns[5])
            )
    return y


def build_bin_from_tensors(
    tensor_fn: str,
    var_fn: Optional[str] = None,
    bed_fn: Optional[str] = None,
    shuffle: bool = True,
    is_allow_duplicate_chr_pos: bool = False,
    block_size: int = BIN_BLOCK_SIZE,
) -> BinDataset:
    """Join tensors with truth labels into a blocked bin
    (ref clair/utils.py:133-220 get_training_array)."""
    bed = BedIntervals.from_bed(bed_fn)
    y_map = variant_map_from(var_fn, bed)

    x_map = {}
    with open_maybe_gzip(tensor_fn) as fh:
        for row in fh:
            columns = row.split(maxsplit=3)
            if len(columns) < 4:
                continue
            chrom, coord, seq = columns[0], columns[1], columns[2].upper()
            if not (bed.is_empty or bed.contains_point(chrom, int(coord))):
                continue
            if seq[NO_OF_POSITIONS // 2] not in BASIC_BASES:
                continue
            x = np.fromstring(columns[3], dtype=np.float32, sep=" ").reshape(
                NO_OF_POSITIONS, MATRIX_ROW, MATRIX_NUM
            )
            normalize_channels(x)
            key = chrom + ":" + coord
            if key not in x_map:
                x_map[key] = x
            elif is_allow_duplicate_chr_pos:
                for ch in _DUP_PREFIXES:
                    if ch + key not in x_map:
                        x_map[ch + key] = x
                        break
            if key not in y_map:
                y_map[key] = label_vector_from_reference(
                    BASE2ACGT[seq[NO_OF_POSITIONS // 2]]
                )

    all_keys = sorted(x_map.keys())
    if shuffle:
        np.random.shuffle(all_keys)

    x_blocks, y_blocks, pos_blocks = [], [], []
    xs, ys, keys = [], [], []

    def flush():
        if not xs:
            return
        x_blocks.append(_pack(np.asarray(xs, dtype=np.float32)))
        y_blocks.append(_pack(np.asarray(ys, dtype=np.float32)))
        pos_blocks.append(_pack(np.asarray(keys)))
        xs.clear(), ys.clear(), keys.clear()

    total = 0
    for key in all_keys:
        # duplicate keys carry a one-char prefix and share the base truth label
        base_key = key if key in y_map else key[1:]
        xs.append(x_map[key])
        ys.append(y_map[base_key])
        keys.append(base_key)
        total += 1
        if len(xs) == block_size:
            flush()
    flush()

    return BinDataset(
        dataset_size=total,
        x_blocks=x_blocks,
        y_blocks=y_blocks,
        pos_blocks=pos_blocks,
        block_size=block_size,
    )


# ---------------------------------------------------------------------------
# Epoch iteration (the reference's decompress_array cursor, re-designed)
# ---------------------------------------------------------------------------

@dataclass
class EpochBatches:
    """Iterate one epoch: train batches first (never crossing the train/val
    boundary), then validation batches (ref train.py:134-187 semantics).

    Block decompression runs on a background thread so host decompress
    overlaps the device step — the reference does the same with a Thread
    around session.run (ref train.py:141-161).
    """

    dataset: BinDataset
    block_order: np.ndarray
    n_train: int
    train_batch_size: int = TRAIN_BATCH_SIZE
    val_batch_size: int = PREDICT_BATCH_SIZE
    # deep enough that a burst of slow blocks (cold page cache, co-tenant
    # load) never leaves the device step waiting while earlier batches
    # were droppable; a batch is ~10 MB int16 so 8 bounds memory at ~80 MB
    prefetch: int = 8
    # zstd decompression releases the GIL, so block decode scales across
    # threads. One thread feeds ~173k samples/s (int16 blocks) — below the
    # bf16 train step's 242k — so on multi-core hosts the pool keeps the
    # chip fed. None = one worker per spare core (capped at 4; a block is
    # ~3 ms so more buys nothing), 0 = inline serial decode.
    decompress_workers: Optional[int] = None
    # False: leave int16-packed blocks in their stored dtype — the jitted
    # train step casts on device. Skips the host astype (the single
    # costliest feed op after zstd inflate), halves batch-concat bytes,
    # and halves the host->device transfer. Training uses this; default
    # True preserves f32 batches for host-side consumers.
    cast_to_float32: bool = True

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, bool]]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices an abandoned consumer (lr_finder
            # breaks out of the epoch early) instead of blocking forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self._generate():
                    if not put(item):
                        return
                put(_END)
            except BaseException as exc:  # surface in the consumer
                put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    thread.join()
                    raise item
                yield item
        finally:
            stop.set()
            thread.join()

    def _block_stream(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (x, y) block pairs in block_order, decompressing ahead on a
        thread pool when workers are available (in-order delivery; the
        lookahead bounds memory at ~2 blocks per worker)."""
        ds = self.dataset
        cast = self.cast_to_float32
        workers = self.decompress_workers
        if workers is None:
            import os

            workers = min(4, max((os.cpu_count() or 1) - 1, 0))
        if workers <= 0:
            for i in self.block_order:
                i = int(i)
                yield ds.x_block(i, cast=cast), ds.y_block(i, cast=cast)
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def load(i: int):
            return ds.x_block(i, cast=cast), ds.y_block(i, cast=cast)

        block_iter = iter(self.block_order)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending: "deque" = deque()

            def submit() -> None:
                try:
                    i = int(next(block_iter))
                except StopIteration:
                    return
                pending.append(pool.submit(load, i))

            for _ in range(2 * workers):
                submit()
            while pending:
                x, y = pending.popleft().result()
                submit()
                yield x, y

    def _generate(self) -> Iterator[Tuple[np.ndarray, np.ndarray, bool]]:
        from collections import deque

        buffer_x: "deque" = deque()
        buffer_y: "deque" = deque()
        head_off = 0  # rows of the head block already emitted
        buffered = 0
        produced = 0
        blocks = self._block_stream()

        def fill(target: int) -> None:
            nonlocal buffered
            while buffered < target:
                try:
                    x, y = next(blocks)
                except StopIteration:
                    return
                buffer_x.append(x)
                buffer_y.append(y)
                buffered += len(x)

        def take(n: int):
            # copy block slices straight into a preallocated batch: one copy
            # per byte. The previous concatenate+slice form re-copied the
            # leftover tail of the buffer into every subsequent batch
            # (~1.5x bytes at batch 10k / block 2k), which showed up as the
            # single largest non-zstd cost in the 1-thread feed profile.
            nonlocal buffered, head_off
            if head_off == 0 and len(buffer_x[0]) == n:
                buffered -= n
                return buffer_x.popleft(), buffer_y.popleft()
            x_dt = (buffer_x[0].dtype if len(buffer_x) == 1
                    else np.result_type(*(b.dtype for b in buffer_x)))
            y_dt = (buffer_y[0].dtype if len(buffer_y) == 1
                    else np.result_type(*(b.dtype for b in buffer_y)))
            out_x = np.empty((n,) + buffer_x[0].shape[1:], x_dt)
            out_y = np.empty((n,) + buffer_y[0].shape[1:], y_dt)
            got = 0
            while got < n:
                bx, by = buffer_x[0], buffer_y[0]
                k = min(n - got, len(bx) - head_off)
                out_x[got:got + k] = bx[head_off:head_off + k]
                out_y[got:got + k] = by[head_off:head_off + k]
                got += k
                head_off += k
                if head_off == len(bx):
                    buffer_x.popleft()
                    buffer_y.popleft()
                    head_off = 0
            buffered -= n
            return out_x, out_y

        while produced < self.n_train:
            want = min(self.train_batch_size, self.n_train - produced)
            fill(want)
            if buffered == 0:
                return
            n = min(want, buffered)
            x, y = take(n)
            produced += n
            yield x, y, True

        while True:
            fill(self.val_batch_size)
            if buffered == 0:
                return
            n = min(self.val_batch_size, buffered)
            x, y = take(n)
            yield x, y, False
