"""CRAM 3.0/3.1 reading/writing from scratch.

The reference handles CRAM implicitly: every alignment path shells out to
`samtools view`, which accepts BAM and CRAM alike (e.g.
/root/reference/clair/callVarBam.py:122-181 passes --bam_fn straight
through; dataPrepScripts/CreateTensor.py:136 opens it with samtools).
This framework's own IO stack was BAM-only; this module closes the gap so
`call_bam`/`call_var --bam_fn` accept .cram inputs transparently.

Implemented surface (hts-specs CRAM 3.0):

- itf8/ltf8 varints, containers (+CRC32), blocks (+CRC32) with the raw /
  gzip / bzip2 / lzma / rans4x8 compression methods, plus the full CRAM
  3.1 codec set: rANS Nx16 (io/rans4x16.py), adaptive arithmetic
  (io/arith.py), the tok3 name tokenizer (io/tok3.py) and the fqzcomp
  quality model (io/fqzcomp.py),
- compression-header preservation map (RN, AP, RR, SM, TD), data-series
  and tag encoding maps,
- codecs: EXTERNAL, HUFFMAN (canonical, incl. the 0-bit constant form),
  BETA, GAMMA, SUBEXP, BYTE_ARRAY_LEN, BYTE_ARRAY_STOP, with an MSB-first
  core-block bit stream,
- slice headers, embedded references, multi-ref slices (RI series),
  AP-delta positions, substitution-matrix sequence reconstruction,
  feature-based CIGAR/SEQ rebuild, mate info (detached MF and downstream
  NF pair resolution for the mate-unmapped/reverse flag bits),
- EOF container detection/emission.

Records surface as the same ``BamRecord`` the BAM reader yields, so the
pileup engine is format-agnostic. The writer exists for round-trip tests
and the bam2cram/cram2bam utilities; it emits single-ref slices with
rans4x8-compressed external blocks plus core-block BETA (MQ) and constant
HUFFMAN (TL) series so the bit-level paths are exercised end-to-end.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from clair_tpu.io import rans
from clair_tpu.io.bam import (
    CIGAR_OP_TO_CODE,
    CIGAR_OPS,
    DEFAULT_EXCLUDE_FLAG,
    BamRecord,
)

CRAM_MAGIC = b"CRAM"

# block compression methods
METHOD_RAW = 0
METHOD_GZIP = 1
METHOD_BZIP2 = 2
METHOD_LZMA = 3
METHOD_RANS = 4
# CRAM 3.1 additions (hts-specs block methods)
METHOD_RANS4X16 = 5
METHOD_ARITH = 6
METHOD_FQZCOMP = 7
METHOD_TOK3 = 8

# Write rANS Nx16 blocks with the 32-way interleaved entropy stage
# (htslib's SIMD layout). Off by default: the 4-way stream is smaller
# for typical block sizes; reading X32 input always works.
RANS4X16_X32 = False

# block content types
CT_FILE_HEADER = 0
CT_COMPRESSION_HEADER = 1
CT_SLICE_HEADER = 2
CT_EXTERNAL = 4
CT_CORE = 5

# codec ids
C_EXTERNAL = 1
C_HUFFMAN = 3
C_BYTE_ARRAY_LEN = 4
C_BYTE_ARRAY_STOP = 5
C_BETA = 6
C_SUBEXP = 7
C_GAMMA = 9

# CRAM record flags (CF series)
CF_QS_ARRAY = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4
CF_NO_SEQ = 0x8

# mate flags (MF series)
MF_MATE_REVERSE = 0x1
MF_MATE_UNMAPPED = 0x2

# the spec's v3 EOF container (fixed 38 bytes)
EOF_CONTAINER = bytes.fromhex(
    "0f000000ffffffff0fe0454f460000000001000"
    "5bdd94f0001000606010001000100ee63014b"
)
EOF_START_POSITION = 4542278  # itf8 of ASCII "EOF" marks the EOF container

_SUB_BASES = b"ACGTN"


# ---------------------------------------------------------------------------
# Varints
# ---------------------------------------------------------------------------

def itf8_encode(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])
    return bytes([
        0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
        (v >> 4) & 0xFF, v & 0x0F,
    ])


def ltf8_encode(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    for extra in range(1, 7):
        bits = 7 - extra + 8 * extra
        if v < (1 << bits):
            prefix = (0xFF << (8 - extra)) & 0xFF
            out = [prefix | (v >> (8 * extra))]
            for k in range(extra - 1, -1, -1):
                out.append((v >> (8 * k)) & 0xFF)
            return bytes(out)
    if v < (1 << 56):
        return bytes([0xFE]) + v.to_bytes(7, "big")
    return bytes([0xFF]) + v.to_bytes(8, "big")


class ByteCursor:
    """Sequential reader over one uncompressed block's bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        out = self.data[self.pos: self.pos + n]
        if len(out) < n:
            raise ValueError("CRAM stream truncated")
        self.pos += n
        return out

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_until(self, stop: int) -> bytes:
        data = self.data
        end = data.index(stop, self.pos)
        out = data[self.pos: end]
        self.pos = end + 1
        return out

    def read_itf8(self) -> int:
        data = self.data
        p = self.pos
        b0 = data[p]
        if b0 < 0x80:
            self.pos = p + 1
            return b0
        if b0 < 0xC0:
            self.pos = p + 2
            return ((b0 << 8) | data[p + 1]) & 0x3FFF
        if b0 < 0xE0:
            self.pos = p + 3
            return ((b0 << 16) | (data[p + 1] << 8) | data[p + 2]) & 0x1FFFFF
        if b0 < 0xF0:
            self.pos = p + 4
            return (
                (b0 << 24) | (data[p + 1] << 16) | (data[p + 2] << 8) | data[p + 3]
            ) & 0x0FFFFFFF
        self.pos = p + 5
        v = (
            ((b0 & 0x0F) << 28) | (data[p + 1] << 20) | (data[p + 2] << 12)
            | (data[p + 3] << 4) | (data[p + 4] & 0x0F)
        )
        return v - (1 << 32) if v & 0x80000000 else v

    def read_ltf8(self) -> int:
        b0 = self.data[self.pos]
        if b0 < 0x80:
            self.pos += 1
            return b0
        extra = 1
        while extra < 7 and b0 >= (0xFF << (7 - extra)) & 0xFF:
            extra += 1
        if b0 == 0xFE:
            extra = 7
        elif b0 == 0xFF:
            extra = 8
        raw = self.read(1 + extra)
        if extra >= 7:
            v = int.from_bytes(raw[1:], "big")
        else:
            bits = 7 - extra
            v = raw[0] & ((1 << bits) - 1)
            for b in raw[1:]:
                v = (v << 8) | b
        return v - (1 << 64) if v & (1 << 63) else v

    def read_array(self) -> List[int]:
        return [self.read_itf8() for _ in range(self.read_itf8())]

    def eof(self) -> bool:
        return self.pos >= len(self.data)


def _write_array(out: bytearray, values) -> None:
    out += itf8_encode(len(values))
    for v in values:
        out += itf8_encode(v)


# ---------------------------------------------------------------------------
# Core-block bit stream (MSB first)
# ---------------------------------------------------------------------------

class BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 7

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.pos += 1
        else:
            self.bit -= 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class BitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> k) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._bytes.append(self._acc)
                self._acc = 0
                self._nbits = 0

    def getvalue(self) -> bytes:
        out = bytes(self._bytes)
        if self._nbits:
            out += bytes([self._acc << (8 - self._nbits)])
        return out


# ---------------------------------------------------------------------------
# Blocks and containers
# ---------------------------------------------------------------------------

@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes  # uncompressed


def _compress_payload(method: int, data: bytes,
                      fqz_lengths: Optional[List[int]] = None) -> bytes:
    if method == METHOD_RAW:
        return data
    if method == METHOD_GZIP:
        return gzip.compress(data, 6)
    if method == METHOD_BZIP2:
        return bz2.compress(data)
    if method == METHOD_LZMA:
        return lzma.compress(data)
    if method == METHOD_RANS:
        return rans.compress(data, 1 if len(data) >= 4 else 0)
    if method == METHOD_RANS4X16:
        from clair_tpu.io import rans4x16

        return rans4x16.compress(
            data, 1 if len(data) >= 4 else 0, x32=RANS4X16_X32
        )
    if method == METHOD_ARITH:
        from clair_tpu.io import arith

        return arith.compress(data, 1 if len(data) >= 4 else 0)
    if method == METHOD_TOK3:
        from clair_tpu.io import tok3

        return tok3.encode_names(data)
    if method == METHOD_FQZCOMP:
        from clair_tpu.io import fqzcomp

        return fqzcomp.compress(data, fqz_lengths)
    raise ValueError(f"unsupported CRAM block method {method}")


def _decompress_payload(method: int, data: bytes, raw_size: int) -> bytes:
    if method == METHOD_RAW:
        return data
    if method == METHOD_GZIP:
        return gzip.decompress(data)
    if method == METHOD_BZIP2:
        return bz2.decompress(data)
    if method == METHOD_LZMA:
        return lzma.decompress(data)
    if method == METHOD_RANS:
        return rans.decompress(data)
    if method == METHOD_RANS4X16:
        from clair_tpu.io import rans4x16

        return rans4x16.decompress(data)
    if method == METHOD_ARITH:
        from clair_tpu.io import arith

        return arith.decompress(data)
    if method == METHOD_TOK3:
        from clair_tpu.io import tok3

        return tok3.decode_names(data)
    if method == METHOD_FQZCOMP:
        from clair_tpu.io import fqzcomp

        return fqzcomp.decompress(data, raw_size)
    raise ValueError(f"unsupported CRAM block method {method}")


def write_block(block: Block, method: Optional[int] = None,
                fqz_lengths: Optional[List[int]] = None) -> bytes:
    method = block.method if method is None else method
    if len(block.data) == 0:
        method = METHOD_RAW
    comp = _compress_payload(method, block.data, fqz_lengths)
    if method != METHOD_RAW and len(comp) >= len(block.data):
        method, comp = METHOD_RAW, block.data
    out = bytearray()
    out.append(method)
    out.append(block.content_type)
    out += itf8_encode(block.content_id)
    out += itf8_encode(len(comp))
    out += itf8_encode(len(block.data))
    out += comp
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out)


def read_block(cursor: ByteCursor, verify_crc: bool = True,
               skip_ids=None) -> Block:
    """``skip_ids``: external content ids whose payloads the caller will
    never read — their blocks are parsed (and CRC-checked) but NOT
    decompressed, returned with empty data. The caller is responsible
    for making the matching series reads no-ops."""
    start = cursor.pos
    method = cursor.read_byte()
    content_type = cursor.read_byte()
    content_id = cursor.read_itf8()
    comp_size = cursor.read_itf8()
    raw_size = cursor.read_itf8()
    payload = cursor.read(comp_size)
    (crc,) = struct.unpack("<I", cursor.read(4))
    if verify_crc:
        actual = zlib.crc32(cursor.data[start: cursor.pos - 4])
        if actual != crc:
            raise ValueError("CRAM block CRC32 mismatch")
    if (skip_ids and content_type == CT_EXTERNAL
            and content_id in skip_ids):
        return Block(method, content_type, content_id, b"")
    data = _decompress_payload(method, payload, raw_size)
    if len(data) != raw_size:
        raise ValueError("CRAM block raw size mismatch")
    return Block(method, content_type, content_id, data)


@dataclass
class ContainerHeader:
    length: int                 # byte length of the container's blocks
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_bases: int
    n_blocks: int
    landmarks: List[int]

    @property
    def is_eof(self) -> bool:
        return self.ref_seq_id == -1 and self.start == EOF_START_POSITION


def write_container_header(h: ContainerHeader) -> bytes:
    out = bytearray()
    out += struct.pack("<i", h.length)
    out += itf8_encode(h.ref_seq_id)
    out += itf8_encode(h.start)
    out += itf8_encode(h.span)
    out += itf8_encode(h.n_records)
    out += ltf8_encode(h.record_counter)
    out += ltf8_encode(h.n_bases)
    out += itf8_encode(h.n_blocks)
    _write_array(out, h.landmarks)
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out)


def read_container_header(fh) -> Optional[ContainerHeader]:
    head = fh.read(4)
    if len(head) < 4:
        return None
    # the variable part is bounded by ~13 varints of <=9 bytes + landmarks;
    # read generously, then rewind the file to the end of the header
    rest = fh.read(128)
    cur = ByteCursor(head + rest, 4)
    (length,) = struct.unpack("<i", head)
    ref_seq_id = cur.read_itf8()
    start = cur.read_itf8()
    span = cur.read_itf8()
    n_records = cur.read_itf8()
    record_counter = cur.read_ltf8()
    n_bases = cur.read_ltf8()
    n_blocks = cur.read_itf8()
    n_landmarks = cur.read_itf8()
    needed = cur.pos + 5 * n_landmarks + 4 + 64
    if needed > len(cur.data):
        more = fh.read(needed - len(cur.data))
        cur = ByteCursor(cur.data + more, cur.pos)
    landmarks = [cur.read_itf8() for _ in range(n_landmarks)]
    crc_end = cur.pos + 4
    fh.seek(crc_end - len(cur.data), 1)  # rewind the over-read
    return ContainerHeader(
        length, ref_seq_id, start, span, n_records,
        record_counter, n_bases, n_blocks, landmarks,
    )


# ---------------------------------------------------------------------------
# Encodings / codecs
# ---------------------------------------------------------------------------

class SliceStreams:
    """Decode-side view of one slice: core bit stream + external cursors."""

    def __init__(self, core: bytes, external: Dict[int, bytes]):
        self.core = BitReader(core)
        self.ext = {cid: ByteCursor(data) for cid, data in external.items()}


class ExternalCodec:
    def __init__(self, cid: int):
        self.cid = cid

    def read_int(self, s: SliceStreams) -> int:
        return s.ext[self.cid].read_itf8()

    def read_byte(self, s: SliceStreams) -> int:
        return s.ext[self.cid].read_byte()

    def read_bytes(self, s: SliceStreams, n: Optional[int]) -> bytes:
        if n is None:
            raise ValueError("EXTERNAL byte-array read requires a length")
        return s.ext[self.cid].read(n)


class HuffmanCodec:
    """Canonical Huffman over an int alphabet (symbols sorted by bit length
    then value, codes assigned sequentially). The ubiquitous special case is
    a single zero-length symbol: a constant that consumes no bits."""

    def __init__(self, symbols: List[int], lengths: List[int]):
        order = sorted(range(len(symbols)), key=lambda i: (lengths[i], symbols[i]))
        self.codes: List[Tuple[int, int, int]] = []  # (length, code, symbol)
        code = 0
        prev_len = 0
        for i in order:
            code <<= lengths[i] - prev_len
            prev_len = lengths[i]
            self.codes.append((lengths[i], code, symbols[i]))
            code += 1
        self.constant = symbols[0] if len(symbols) == 1 and lengths[0] == 0 else None

    def read_int(self, s: SliceStreams) -> int:
        if self.constant is not None:
            return self.constant
        length = 0
        code = 0
        idx = 0
        while idx < len(self.codes):
            want_len = self.codes[idx][0]
            while length < want_len:
                code = (code << 1) | s.core.read_bit()
                length += 1
            if code == self.codes[idx][1]:
                return self.codes[idx][2]
            idx += 1
        raise ValueError("invalid Huffman code in CRAM core stream")

    read_byte = read_int


class BetaCodec:
    def __init__(self, offset: int, nbits: int):
        self.offset = offset
        self.nbits = nbits

    def read_int(self, s: SliceStreams) -> int:
        return s.core.read_bits(self.nbits) - self.offset

    read_byte = read_int


class GammaCodec:
    def __init__(self, offset: int):
        self.offset = offset

    def read_int(self, s: SliceStreams) -> int:
        n = 0
        while s.core.read_bit() == 0:
            n += 1
        return ((1 << n) | s.core.read_bits(n)) - self.offset


class SubexpCodec:
    def __init__(self, offset: int, k: int):
        self.offset = offset
        self.k = k

    def read_int(self, s: SliceStreams) -> int:
        count = 0
        while s.core.read_bit() == 1:
            count += 1
        if count == 0:
            v = s.core.read_bits(self.k)
        else:
            n = count + self.k - 1
            v = (1 << n) | s.core.read_bits(n)
        return v - self.offset


class ByteArrayLenCodec:
    def __init__(self, len_codec, val_codec):
        self.len_codec = len_codec
        self.val_codec = val_codec

    def read_bytes(self, s: SliceStreams, n: Optional[int] = None) -> bytes:
        length = self.len_codec.read_int(s)
        return self.val_codec.read_bytes(s, length)


class ByteArrayStopCodec:
    def __init__(self, stop: int, cid: int):
        self.stop = stop
        self.cid = cid

    def read_bytes(self, s: SliceStreams, n: Optional[int] = None) -> bytes:
        return s.ext[self.cid].read_until(self.stop)


def _parse_encoding(cursor: ByteCursor):
    codec_id = cursor.read_itf8()
    size = cursor.read_itf8()
    params = ByteCursor(cursor.read(size))
    return _build_codec(codec_id, params)


def _build_codec(codec_id: int, params: ByteCursor):
    if codec_id == 0:
        return None
    if codec_id == C_EXTERNAL:
        return ExternalCodec(params.read_itf8())
    if codec_id == C_HUFFMAN:
        return HuffmanCodec(params.read_array(), params.read_array())
    if codec_id == C_BYTE_ARRAY_LEN:
        len_codec = _parse_encoding(params)
        val_codec = _parse_encoding(params)
        return ByteArrayLenCodec(len_codec, val_codec)
    if codec_id == C_BYTE_ARRAY_STOP:
        stop = params.read_byte()
        return ByteArrayStopCodec(stop, params.read_itf8())
    if codec_id == C_BETA:
        return BetaCodec(params.read_itf8(), params.read_itf8())
    if codec_id == C_SUBEXP:
        return SubexpCodec(params.read_itf8(), params.read_itf8())
    if codec_id == C_GAMMA:
        return GammaCodec(params.read_itf8())
    raise ValueError(f"unsupported CRAM encoding id {codec_id}")


def _encode_external(cid: int) -> bytes:
    params = itf8_encode(cid)
    return itf8_encode(C_EXTERNAL) + itf8_encode(len(params)) + params


def _encode_huffman_const(value: int) -> bytes:
    params = bytearray()
    _write_array(params, [value])
    _write_array(params, [0])
    return itf8_encode(C_HUFFMAN) + itf8_encode(len(params)) + bytes(params)


def _encode_beta(offset: int, nbits: int) -> bytes:
    params = itf8_encode(offset) + itf8_encode(nbits)
    return itf8_encode(C_BETA) + itf8_encode(len(params)) + params


def _encode_byte_array_stop(stop: int, cid: int) -> bytes:
    params = bytes([stop]) + itf8_encode(cid)
    return itf8_encode(C_BYTE_ARRAY_STOP) + itf8_encode(len(params)) + params


def _encode_byte_array_len(len_enc: bytes, val_enc: bytes) -> bytes:
    params = len_enc + val_enc
    return itf8_encode(C_BYTE_ARRAY_LEN) + itf8_encode(len(params)) + params


def _codec_external_ids(codec) -> frozenset:
    """External content ids a codec reads from (recursively)."""
    if codec is None:
        return frozenset()
    if isinstance(codec, (ExternalCodec, ByteArrayStopCodec)):
        return frozenset((codec.cid,))
    if isinstance(codec, ByteArrayLenCodec):
        return _codec_external_ids(codec.len_codec) | _codec_external_ids(
            codec.val_codec
        )
    return frozenset()


def _codec_core_free(codec) -> bool:
    """True when reading through the codec consumes no core-block bits
    (skipping its reads cannot desync any other series)."""
    if codec is None:
        return True
    if isinstance(codec, (ExternalCodec, ByteArrayStopCodec)):
        return True
    if isinstance(codec, HuffmanCodec):
        return codec.constant is not None
    if isinstance(codec, ByteArrayLenCodec):
        return _codec_core_free(codec.len_codec) and _codec_core_free(
            codec.val_codec
        )
    return False


def qual_skip_info(h: "CompressionHeader"):
    """-> (skippable_block_ids, qs_noop, qq_noop).

    Quality values never surface from this stack (``BamRecord`` carries
    no quals — the pileup tensor is count-based, matching the reference
    model's input, /root/reference/dataPrepScripts/CreateTensor.py:29-65
    which ignores base qualities entirely). A quality series is
    skippable when its codec touches no core bits and its external
    blocks are shared with no other series or tag, so the reader can
    leave those blocks compressed — the big win on real-world 3.1
    archives whose QS blocks are fqzcomp/arith-coded."""
    cached = getattr(h, "_qual_skip", None)
    if cached is not None:
        return cached
    ids_of = {key: _codec_external_ids(c) for key, c in h.codecs.items()}
    other_ids = frozenset().union(
        *(ids for key, ids in ids_of.items() if key not in ("QS", "QQ")),
        *(_codec_external_ids(c) for c in h.tag_codecs.values()),
    ) if (h.codecs or h.tag_codecs) else frozenset()

    skip_ids = set()
    noop = {}
    for key in ("QS", "QQ"):
        codec = h.codecs.get(key)
        own = ids_of.get(key, frozenset())
        foreign = other_ids | frozenset().union(
            *(ids_of.get(k, frozenset()) for k in ("QS", "QQ") if k != key)
        )
        ok = (codec is not None and _codec_core_free(codec)
              and not (own & foreign))
        noop[key] = ok
        if ok:
            skip_ids |= own
    # a series can only be skipped if BOTH qual series tolerate losing a
    # shared block; the per-key foreign check above already enforces it
    result = (frozenset(skip_ids), noop["QS"], noop["QQ"])
    h._qual_skip = result
    return result


# ---------------------------------------------------------------------------
# Substitution matrix
# ---------------------------------------------------------------------------

class SubstitutionMatrix:
    """5 bytes, one per reference base ACGTN; each packs 2-bit codes for
    the four substitute bases in ACGTN-minus-ref order."""

    IDENTITY = bytes([0x1B] * 5)

    def __init__(self, raw: bytes = IDENTITY):
        self.raw = raw
        self.decode_table: Dict[int, List[int]] = {}
        self.encode_table: Dict[Tuple[int, int], int] = {}
        for ri, ref in enumerate(_SUB_BASES):
            others = [b for b in _SUB_BASES if b != ref]
            by_code = [0, 0, 0, 0]
            for oi, alt in enumerate(others):
                code = (raw[ri] >> (6 - 2 * oi)) & 3
                by_code[code] = alt
                self.encode_table[(ref, alt)] = code
            self.decode_table[ref] = by_code

    def substitute(self, ref_base: int, code: int) -> int:
        table = self.decode_table.get(ref_base)
        if table is None:  # non-ACGTN reference base: decode as if N
            table = self.decode_table[ord("N")]
        return table[code]

    def code_for(self, ref_base: int, alt_base: int) -> Optional[int]:
        return self.encode_table.get((ref_base, alt_base))


# ---------------------------------------------------------------------------
# Compression header
# ---------------------------------------------------------------------------

_SERIES_INT = (
    "BF CF RI RL AP RG MF NS NP TS NF TL FN FP DL HC PD RS MQ".split()
)
_SERIES_BYTE = ("FC", "BA", "QS")
_SERIES_BYTES = ("RN", "BB", "QQ", "IN", "SC")


@dataclass
class CompressionHeader:
    read_names_included: bool = True
    ap_delta: bool = True
    reference_required: bool = True
    substitution_matrix: SubstitutionMatrix = field(default_factory=SubstitutionMatrix)
    tag_lines: List[List[Tuple[str, str]]] = field(default_factory=lambda: [[]])
    codecs: Dict[str, object] = field(default_factory=dict)
    tag_codecs: Dict[int, object] = field(default_factory=dict)


def parse_compression_header(data: bytes) -> CompressionHeader:
    cur = ByteCursor(data)
    h = CompressionHeader()

    # preservation map
    cur.read_itf8()  # byte size (redundant)
    for _ in range(cur.read_itf8()):
        key = cur.read(2).decode("ascii")
        if key == "RN":
            h.read_names_included = bool(cur.read_byte())
        elif key == "AP":
            h.ap_delta = bool(cur.read_byte())
        elif key == "RR":
            h.reference_required = bool(cur.read_byte())
        elif key == "SM":
            h.substitution_matrix = SubstitutionMatrix(cur.read(5))
        elif key == "TD":
            raw = cur.read(cur.read_itf8())
            lines = raw.split(b"\x00")[:-1] if raw.endswith(b"\x00") else raw.split(b"\x00")
            h.tag_lines = [
                [
                    (line[i: i + 2].decode("ascii"), chr(line[i + 2]))
                    for i in range(0, len(line), 3)
                ]
                for line in lines
            ] or [[]]
        else:
            raise ValueError(f"unknown CRAM preservation key {key}")

    # data series encodings
    cur.read_itf8()
    for _ in range(cur.read_itf8()):
        key = cur.read(2).decode("ascii")
        h.codecs[key] = _parse_encoding(cur)

    # tag encodings
    cur.read_itf8()
    for _ in range(cur.read_itf8()):
        key = cur.read_itf8()
        h.tag_codecs[key] = _parse_encoding(cur)
    return h


def _serialize_map(entries: List[bytes]) -> bytes:
    body = itf8_encode(len(entries)) + b"".join(entries)
    return itf8_encode(len(body)) + body


def serialize_compression_header(h: CompressionHeader) -> bytes:
    preservation = [
        b"RN" + bytes([1 if h.read_names_included else 0]),
        b"AP" + bytes([1 if h.ap_delta else 0]),
        b"RR" + bytes([1 if h.reference_required else 0]),
        b"SM" + h.substitution_matrix.raw,
    ]
    td = b""
    for line in h.tag_lines:
        for (tag, typ) in line:
            td += tag.encode("ascii") + typ.encode("ascii")
        td += b"\x00"
    preservation.append(b"TD" + itf8_encode(len(td)) + td)

    series = [key.encode("ascii") + enc for key, enc in h.codecs.items()]
    tags = [itf8_encode(key) + enc for key, enc in h.tag_codecs.items()]
    return (
        _serialize_map(preservation)
        + _serialize_map(series)
        + _serialize_map(tags)
    )


# ---------------------------------------------------------------------------
# Slice header
# ---------------------------------------------------------------------------

@dataclass
class SliceHeader:
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_blocks: int
    content_ids: List[int]
    embedded_ref_id: int = -1
    ref_md5: bytes = b"\x00" * 16


def parse_slice_header(data: bytes) -> SliceHeader:
    cur = ByteCursor(data)
    return SliceHeader(
        ref_seq_id=cur.read_itf8(),
        start=cur.read_itf8(),
        span=cur.read_itf8(),
        n_records=cur.read_itf8(),
        record_counter=cur.read_ltf8(),
        n_blocks=cur.read_itf8(),
        content_ids=cur.read_array(),
        embedded_ref_id=cur.read_itf8(),
        ref_md5=cur.read(16),
    )


def serialize_slice_header(h: SliceHeader) -> bytes:
    out = bytearray()
    out += itf8_encode(h.ref_seq_id)
    out += itf8_encode(h.start)
    out += itf8_encode(h.span)
    out += itf8_encode(h.n_records)
    out += ltf8_encode(h.record_counter)
    out += itf8_encode(h.n_blocks)
    _write_array(out, h.content_ids)
    out += itf8_encode(h.embedded_ref_id)
    out += h.ref_md5
    return bytes(out)


# ---------------------------------------------------------------------------
# Tag value sizing (to consume EXTERNAL-coded fixed-size tag values)
# ---------------------------------------------------------------------------

def _capture_tag_value(codec, typ: str, s: SliceStreams) -> bytes:
    """Read one tag value and return its BAM-layout bytes (what
    _consume_tag_value discards)."""
    if hasattr(codec, "read_bytes") and not isinstance(codec, ExternalCodec):
        return bytes(codec.read_bytes(s, None))
    if not isinstance(codec, ExternalCodec):
        raise ValueError(
            f"unsupported tag value encoding {type(codec).__name__}"
        )
    cursor = s.ext[codec.cid]
    if typ in ("A", "c", "C"):
        return bytes(cursor.read(1))
    if typ in ("s", "S"):
        return bytes(cursor.read(2))
    if typ in ("i", "I", "f"):
        return bytes(cursor.read(4))
    if typ in ("Z", "H"):
        return bytes(cursor.read_until(0)) + b"\x00"
    if typ == "B":
        sub = cursor.read(1)
        count_raw = cursor.read(4)
        (count,) = struct.unpack("<I", count_raw)
        size = {"c": 1, "C": 1, "s": 2, "S": 2,
                "i": 4, "I": 4, "f": 4}[chr(sub[0])]
        return bytes(sub) + bytes(count_raw) + bytes(cursor.read(count * size))
    raise ValueError(f"unknown tag type {typ}")


def _consume_tag_value(codec, typ: str, s: SliceStreams) -> None:
    if hasattr(codec, "read_bytes") and not isinstance(codec, ExternalCodec):
        codec.read_bytes(s, None)
        return
    if not isinstance(codec, ExternalCodec):
        raise ValueError(
            f"unsupported tag value encoding {type(codec).__name__}"
        )
    cursor = s.ext[codec.cid]
    if typ in ("A", "c", "C"):
        cursor.read(1)
    elif typ in ("s", "S"):
        cursor.read(2)
    elif typ in ("i", "I", "f"):
        cursor.read(4)
    elif typ in ("Z", "H"):
        cursor.read_until(0)
    elif typ == "B":
        sub = chr(cursor.read_byte())
        (count,) = struct.unpack("<I", cursor.read(4))
        size = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
        cursor.read(count * size)
    else:
        raise ValueError(f"unknown tag type {typ}")


# ---------------------------------------------------------------------------
# Record decoding (slice -> BamRecords)
# ---------------------------------------------------------------------------

_FEATURE_QUERY_CONSUMING = frozenset(b"XBIiSb")


def decode_slice_records(
    header: CompressionHeader,
    slice_header: SliceHeader,
    streams: SliceStreams,
    ref_fetch,
    name_prefix: str = "cram",
    skip_quals: bool = False,
    collect_tags: bool = False,
) -> List[BamRecord]:
    """Decode one slice's records. ``ref_fetch(ref_id, start0, length)``
    returns uppercase reference bytes (or None when RR=false).
    ``skip_quals``: quality reads become no-ops for series
    qual_skip_info() proved exclusive, so their blocks may arrive
    undecompressed (empty). ``collect_tags``: rebuild each record's
    BAM-layout tag blob instead of discarding the values (conversions)."""
    codecs = header.codecs
    sub = header.substitution_matrix
    multi_ref = slice_header.ref_seq_id == -2
    prev_ap = slice_header.start
    records: List[BamRecord] = []
    downstream: List[Tuple[int, int]] = []

    # Hoisted per-slice bindings: a noisy long read decodes ~100 features,
    # and per-feature dict/attribute lookups dominated the record loop
    # (profiled 5.1 -> ~2.5 s over a 150 kb 30x ONT slice set).
    def _codec_method(key, attr):
        codec = codecs.get(key)
        if codec is None:
            def missing(_streams, _key=key):
                raise KeyError(
                    f"series {_key} referenced but absent from the "
                    "compression header"
                )
            return missing
        return getattr(codec, attr)

    read_bf = _codec_method("BF", "read_int")
    read_cf = _codec_method("CF", "read_int")
    read_ri = _codec_method("RI", "read_int") if multi_ref else None
    read_rl = _codec_method("RL", "read_int")
    read_ap = _codec_method("AP", "read_int")
    read_rg = _codec_method("RG", "read_int")
    read_rn = _codec_method("RN", "read_bytes")
    read_tl = _codec_method("TL", "read_int")
    read_fn = _codec_method("FN", "read_int")
    read_mq = _codec_method("MQ", "read_int")
    read_fc = _codec_method("FC", "read_byte")
    read_fp = _codec_method("FP", "read_int")
    read_bs = _codec_method("BS", "read_byte")
    read_ba = _codec_method("BA", "read_byte")
    read_qs = _codec_method("QS", "read_byte")
    read_in = _codec_method("IN", "read_bytes")
    read_sc = _codec_method("SC", "read_bytes")
    read_bb = _codec_method("BB", "read_bytes")
    read_qq = _codec_method("QQ", "read_bytes")
    qs_noop = qq_noop = False
    collect_quals = not skip_quals
    if skip_quals:
        _, qs_noop, qq_noop = qual_skip_info(header)
        if qs_noop:
            read_qs = lambda _s: _DEFAULT_QUAL  # noqa: E731
        if qq_noop:
            read_qq = lambda _s, _n=None: b""  # noqa: E731
    read_dl = _codec_method("DL", "read_int")
    read_rs = _codec_method("RS", "read_int")
    read_hc = _codec_method("HC", "read_int")
    read_pd = _codec_method("PD", "read_int")
    substitute = sub.substitute
    op_m = CIGAR_OP_TO_CODE["M"]
    op_i = CIGAR_OP_TO_CODE["I"]
    op_s = CIGAR_OP_TO_CODE["S"]
    op_d = CIGAR_OP_TO_CODE["D"]
    op_n = CIGAR_OP_TO_CODE["N"]
    op_h = CIGAR_OP_TO_CODE["H"]
    op_p = CIGAR_OP_TO_CODE["P"]
    ap_delta = header.ap_delta
    names_included = header.read_names_included
    tag_lines = header.tag_lines
    tag_codecs = header.tag_codecs

    for rec_i in range(slice_header.n_records):
        bf = read_bf(streams)
        cf = read_cf(streams)
        ref_id = read_ri(streams) if multi_ref else slice_header.ref_seq_id
        rl = read_rl(streams)
        if ap_delta:
            ap = prev_ap + read_ap(streams)
            prev_ap = ap
        else:
            ap = read_ap(streams)
        read_rg(streams)  # read group (unused downstream)
        if names_included:
            name = read_rn(streams).decode("ascii")
        else:
            name = f"{name_prefix}.{slice_header.record_counter + rec_i}"
        flag = bf
        mate_ref, mate_pos, mate_tlen = -1, -1, 0
        if cf & CF_DETACHED:
            mf = codecs["MF"].read_int(streams)
            if not names_included:
                name = read_rn(streams).decode("ascii")
            mate_ref = codecs["NS"].read_int(streams)
            mate_pos = codecs["NP"].read_int(streams) - 1  # NP is 1-based
            mate_tlen = codecs["TS"].read_int(streams)
            if mf & MF_MATE_REVERSE:
                flag |= 0x20
            if mf & MF_MATE_UNMAPPED:
                flag |= 0x8
        elif cf & CF_MATE_DOWNSTREAM:
            downstream.append((rec_i, codecs["NF"].read_int(streams)))

        tl = read_tl(streams)
        rec_tags = b""
        for (tag, typ) in tag_lines[tl]:
            key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
            if collect_tags:
                val = _capture_tag_value(tag_codecs[key], typ, streams)
                rec_tags += tag.encode("ascii") + typ.encode("ascii") + val
            else:
                _consume_tag_value(tag_codecs[key], typ, streams)

        cigar_ops: List[List[int]] = []
        seq = bytearray(b"N" * rl)
        qual = bytearray(b"\xff" * rl) if collect_quals else None
        mapq = 0
        if not (bf & 4):  # mapped
            fn = read_fn(streams)
            qc = 1                      # 1-based query cursor
            rc = ap - 1                 # 0-based absolute reference cursor
            fpos = 0
            ref_start = None
            ref_data = b""

            def ref_window(pos0: int, n: int) -> bytes:
                """n reference bytes from pos0 ('N'-padded past the contig
                end / when no reference is available). The over-request
                amortizes per-record fetches — but against a per-slice
                prefetch it must stay small, or long reads near the slice
                end would miss the prefetched span and hit the FASTA."""
                nonlocal ref_start, ref_data
                if (ref_start is None or pos0 < ref_start
                        or pos0 + n > ref_start + len(ref_data)):
                    ahead = 64 if getattr(ref_fetch, "prefetched", False) else max(n, rl)
                    data = ref_fetch(ref_id, pos0, n + ahead)
                    if data is None:
                        return b"N" * n
                    ref_start, ref_data = pos0, data
                seg = ref_data[pos0 - ref_start: pos0 - ref_start + n]
                return seg if len(seg) == n else seg + b"N" * (n - len(seg))

            def fill_to(q: int):
                nonlocal qc, rc
                n = q - qc
                if n <= 0:
                    return
                seq[qc - 1: qc - 1 + n] = ref_window(rc, n)
                if cigar_ops and cigar_ops[-1][0] == op_m:
                    cigar_ops[-1][1] += n
                else:
                    cigar_ops.append([op_m, n])
                qc += n
                rc += n

            for _ in range(fn):
                fc = read_fc(streams)
                fpos += read_fp(streams)
                fill_to(fpos)
                if fc == 88:                       # 'X' substitution
                    code = read_bs(streams)
                    seq[qc - 1] = substitute(ref_window(rc, 1)[0], code)
                    if cigar_ops and cigar_ops[-1][0] == op_m:
                        cigar_ops[-1][1] += 1
                    else:
                        cigar_ops.append([op_m, 1])
                    qc += 1
                    rc += 1
                elif fc == 66:                     # 'B' base + qual
                    seq[qc - 1] = read_ba(streams)
                    qv = read_qs(streams)
                    if qual is not None:
                        qual[qc - 1] = qv
                    if cigar_ops and cigar_ops[-1][0] == op_m:
                        cigar_ops[-1][1] += 1
                    else:
                        cigar_ops.append([op_m, 1])
                    qc += 1
                    rc += 1
                elif fc == 73:                     # 'I' insertion
                    bases = read_in(streams)
                    nb = len(bases)
                    if nb:
                        seq[qc - 1: qc - 1 + nb] = bases
                        if cigar_ops and cigar_ops[-1][0] == op_i:
                            cigar_ops[-1][1] += nb
                        else:
                            cigar_ops.append([op_i, nb])
                        qc += nb
                elif fc == 105:                    # 'i' single-base insert
                    seq[qc - 1] = read_ba(streams)
                    if cigar_ops and cigar_ops[-1][0] == op_i:
                        cigar_ops[-1][1] += 1
                    else:
                        cigar_ops.append([op_i, 1])
                    qc += 1
                elif fc == 83:                     # 'S' soft clip
                    bases = read_sc(streams)
                    nb = len(bases)
                    if nb:
                        seq[qc - 1: qc - 1 + nb] = bases
                        if cigar_ops and cigar_ops[-1][0] == op_s:
                            cigar_ops[-1][1] += nb
                        else:
                            cigar_ops.append([op_s, nb])
                        qc += nb
                elif fc == 98:                     # 'b' verbatim bases
                    bases = read_bb(streams)
                    nb = len(bases)
                    if nb:
                        seq[qc - 1: qc - 1 + nb] = bases
                        if cigar_ops and cigar_ops[-1][0] == op_m:
                            cigar_ops[-1][1] += nb
                        else:
                            cigar_ops.append([op_m, nb])
                        qc += nb
                        rc += nb
                elif fc == 68:                     # 'D' deletion
                    n = read_dl(streams)
                    if n > 0:
                        if cigar_ops and cigar_ops[-1][0] == op_d:
                            cigar_ops[-1][1] += n
                        else:
                            cigar_ops.append([op_d, n])
                        rc += n
                elif fc == 78:                     # 'N' ref skip
                    n = read_rs(streams)
                    if n > 0:
                        if cigar_ops and cigar_ops[-1][0] == op_n:
                            cigar_ops[-1][1] += n
                        else:
                            cigar_ops.append([op_n, n])
                        rc += n
                elif fc == 72:                     # 'H' hard clip
                    n = read_hc(streams)
                    if n > 0:
                        if cigar_ops and cigar_ops[-1][0] == op_h:
                            cigar_ops[-1][1] += n
                        else:
                            cigar_ops.append([op_h, n])
                elif fc == 80:                     # 'P' padding
                    n = read_pd(streams)
                    if n > 0:
                        if cigar_ops and cigar_ops[-1][0] == op_p:
                            cigar_ops[-1][1] += n
                        else:
                            cigar_ops.append([op_p, n])
                elif fc == 81:                     # 'Q' single qual
                    qv = read_qs(streams)
                    if qual is not None and 0 <= qc - 1 < rl:
                        qual[qc - 1] = qv
                elif fc == 113:                    # 'q' qual run
                    qq = read_qq(streams)
                    if qual is not None and qq and qc >= 1:
                        ncp = min(len(qq), rl - (qc - 1))
                        if ncp > 0:
                            qual[qc - 1: qc - 1 + ncp] = qq[:ncp]
                else:
                    raise ValueError(f"unknown CRAM feature code {chr(fc)!r}")
            fill_to(rl + 1)
            mapq = read_mq(streams)
            if cf & CF_QS_ARRAY and not qs_noop:
                run = _read_byte_run(codecs["QS"], streams, rl)
                if qual is not None:
                    qual[:rl] = run
        else:
            # CF_NO_SEQ records carry no base bytes at all (htslib writes
            # nothing for SEQ '*' reads); reading BA would desync the stream
            if not (cf & CF_NO_SEQ):
                _read_bases_into(codecs["BA"], streams, seq, rl)
            if cf & CF_QS_ARRAY and not qs_noop:
                run = _read_byte_run(codecs["QS"], streams, rl)
                if qual is not None:
                    qual[:rl] = run
        if cf & CF_NO_SEQ:
            seq = bytearray(b"N" * rl)

        ops = np.array([o for o, _ in cigar_ops], dtype=np.uint8)
        lens = np.array([n for _, n in cigar_ops], dtype=np.int32)
        if qual is not None and (not rl or min(qual) == 0xFF):
            qual = None  # an all-0xFF run is 'missing' (BAM '*')
        records.append(
            BamRecord(
                ref_id=ref_id,
                pos=ap - 1,
                mapq=mapq,
                flag=flag,
                read_name=name,
                cigar_ops=ops,
                cigar_lens=lens,
                seq=np.frombuffer(bytes(seq), dtype=np.uint8),
                qual=(np.frombuffer(bytes(qual), dtype=np.uint8)
                      if qual is not None else None),
                next_ref_id=mate_ref,
                next_pos=mate_pos,
                tlen=mate_tlen,
                tags=rec_tags,
            )
        )

    for (i, nf) in downstream:  # mate bits from the downstream mate
        j = i + nf + 1
        if j < len(records):
            a, b = records[i], records[j]
            if b.flag & 0x10:
                a.flag |= 0x20
            if b.flag & 0x4:
                a.flag |= 0x8
            if a.flag & 0x10:
                b.flag |= 0x20
            if a.flag & 0x4:
                b.flag |= 0x8
            # mate pointers + computed TLEN (htslib semantics: leftmost
            # start to rightmost end, leftmost record positive; 0 across
            # contigs; ties keep the earlier record positive)
            a.next_ref_id, a.next_pos = b.ref_id, b.pos
            b.next_ref_id, b.next_pos = a.ref_id, a.pos
            if a.ref_id == b.ref_id and a.pos >= 0 and b.pos >= 0:
                lo = min(a.pos, b.pos)
                hi = max(a.reference_end, b.reference_end)
                span = hi - lo
                if a.pos <= b.pos:
                    a.tlen, b.tlen = span, -span
                else:
                    a.tlen, b.tlen = -span, span
    return records


def _read_byte_run(codec, streams: SliceStreams, n: int) -> bytes:
    if isinstance(codec, ExternalCodec):
        return streams.ext[codec.cid].read(n)
    return bytes(codec.read_byte(streams) for _ in range(n))


def _read_bases_into(codec, streams: SliceStreams, seq: bytearray, n: int) -> None:
    seq[:n] = _read_byte_run(codec, streams, n)


# ---------------------------------------------------------------------------
# Native record decode (clair_cram.cpp). The Python decode_slice_records
# above stays the reference implementation and the fallback for anything
# the native path does not cover (multi-ref slices, exotic codecs).
# ---------------------------------------------------------------------------

USE_NATIVE_RECORDS = True

# fixed series order shared with native/clair_cram.cpp (enum Series)
_NATIVE_SERIES_ORDER = (
    "BF CF RI RL AP RG RN MF NS NP TS NF TL FN FC FP BS BA QS IN "
    "SC BB QQ DL RS HC PD MQ"
).split()


def _native_codec_spec(codec) -> bytes:
    """Serialize one built codec into the clair_cram.cpp spec grammar."""
    if codec is None:
        return b"\x00"
    if isinstance(codec, ExternalCodec):
        return b"\x01" + struct.pack("<i", codec.cid)
    if isinstance(codec, HuffmanCodec):
        out = bytearray(b"\x02" + struct.pack("<i", len(codec.codes)))
        for (length, code, symbol) in codec.codes:
            if not 0 <= length <= 255:
                raise _NativeUnsupported
            out += struct.pack("<qBq", symbol, length, code)
        return bytes(out)
    if isinstance(codec, BetaCodec):
        return b"\x03" + struct.pack("<ii", codec.offset, codec.nbits)
    if isinstance(codec, GammaCodec):
        return b"\x04" + struct.pack("<i", codec.offset)
    if isinstance(codec, SubexpCodec):
        return b"\x05" + struct.pack("<ii", codec.offset, codec.k)
    if isinstance(codec, ByteArrayLenCodec):
        return (
            b"\x06"
            + _native_codec_spec(codec.len_codec)
            + _native_codec_spec(codec.val_codec)
        )
    if isinstance(codec, ByteArrayStopCodec):
        return b"\x07" + bytes([codec.stop]) + struct.pack("<i", codec.cid)
    raise _NativeUnsupported


class _NativeUnsupported(Exception):
    pass


def _native_header_blob(h: CompressionHeader,
                        skip_quals: bool = False) -> bytes:
    """Substitution table + series codecs + tag-line specs (the
    per-compression-header, slice-invariant part of the native spec).
    Cached on the header; b"" means the header is not natively decodable.
    ``skip_quals`` swaps the provably-exclusive quality series for the
    native NOOP codec (their blocks arrive undecompressed)."""
    qs_noop = qq_noop = False
    if skip_quals:
        _, qs_noop, qq_noop = qual_skip_info(h)
    cache_key = (qs_noop, qq_noop)
    cached = getattr(h, "_native_blob", None)
    if cached is not None and cache_key in cached:
        return cached[cache_key]
    try:
        out = bytearray()
        n_row = h.substitution_matrix.decode_table[ord("N")]
        for b in range(256):
            row = h.substitution_matrix.decode_table.get(b, n_row)
            out += bytes(row)
        out.append(len(_NATIVE_SERIES_ORDER))
        for key in _NATIVE_SERIES_ORDER:
            if (key == "QS" and qs_noop) or (key == "QQ" and qq_noop):
                out += b"\x08"  # CK_NOOP
            else:
                out += _native_codec_spec(h.codecs.get(key))
        out += struct.pack("<i", len(h.tag_lines))
        for line in h.tag_lines:
            out += struct.pack("<i", len(line))
            for (tag, typ) in line:
                key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
                codec = h.tag_codecs.get(key)
                if codec is None:
                    raise _NativeUnsupported
                out.append(ord(typ))
                out += _native_codec_spec(codec)
        blob = bytes(out)
    except (_NativeUnsupported, KeyError, IndexError, struct.error):
        blob = b""
    if cached is None:
        cached = {}
        h._native_blob = cached
    cached[cache_key] = blob
    return blob


def _native_decode_arrays(
    header: CompressionHeader,
    slice_header: SliceHeader,
    core: bytes,
    external: Dict[int, bytes],
    ref_buf: bytes,
    ref_buf_start: int,
    ref_pad_mode: bool,
    contig_len: int,
    skip_quals: bool = False,
):
    """One native decode attempt. Returns (rc, payload) as
    native.cram_decode_slice does, or (-1, None) when not applicable."""
    if slice_header.ref_seq_id == -2:
        return -1, None  # per-record reference windows: Python path
    blob = _native_header_blob(header, skip_quals)
    if not blob:
        return -1, None
    from clair_tpu import native as _native

    head = struct.pack(
        "<IBiqqqqq",
        0x43524D31,
        (1 if header.ap_delta else 0)
        | (2 if header.read_names_included else 0)
        | (4 if ref_pad_mode else 0)
        | (0 if skip_quals else 8),
        slice_header.ref_seq_id,
        slice_header.start,
        slice_header.n_records,
        ref_buf_start,
        len(ref_buf),
        contig_len,
    )
    return _native.cram_decode_slice(
        head + blob, core, list(external.items()), ref_buf
    )


def _concat_packed(parts):
    """Concatenate per-slice packed-array payloads into one (offsets are
    rebased); an empty part list yields a valid zero-record payload."""
    value_keys = ["pos", "mapq", "flag", "refid", "seq", "cig_ops",
                  "cig_lens"]
    if not parts:
        return {
            "pos": np.empty(0, np.int64), "mapq": np.empty(0, np.int32),
            "flag": np.empty(0, np.int32), "refid": np.empty(0, np.int32),
            "seq": np.empty(0, np.uint8), "seq_off": np.zeros(1, np.int64),
            "cig_ops": np.empty(0, np.uint8),
            "cig_lens": np.empty(0, np.int32),
            "cig_off": np.zeros(1, np.int64),
        }
    if len(parts) == 1:
        return parts[0]
    if all("qual" in p for p in parts):
        value_keys = value_keys + ["qual"]  # parallel to seq/seq_off
    for extra in ("next_ref", "next_pos", "tlen"):
        if all(extra in p for p in parts):
            value_keys = value_keys + [extra]
    out = {k: np.concatenate([p[k] for p in parts]) for k in value_keys}
    for key in ("seq_off", "cig_off"):
        base = 0
        segments = [np.zeros(1, dtype=np.int64)]
        for p in parts:
            offsets = np.asarray(p[key], dtype=np.int64)
            segments.append(offsets[1:] + base)
            base += int(offsets[-1])
        out[key] = np.concatenate(segments)
    return out


def _records_from_arrays(
    arrays, slice_header: SliceHeader, name_prefix: str
) -> List[BamRecord]:
    n = int(arrays["pos"].shape[0])
    pos = arrays["pos"]
    mapq = arrays["mapq"]
    flag = arrays["flag"]
    refid = arrays["refid"]
    seq = arrays["seq"]
    seq_off = arrays["seq_off"]
    cig_ops = arrays["cig_ops"]
    cig_lens = arrays["cig_lens"]
    cig_off = arrays["cig_off"]
    names = arrays["names"]
    name_off = arrays["name_off"]
    qual = arrays.get("qual")
    next_ref = arrays.get("next_ref")
    next_pos_a = arrays.get("next_pos")
    tlen_a = arrays.get("tlen")
    counter = slice_header.record_counter
    records = []
    for i in range(n):
        n0, n1 = int(name_off[i]), int(name_off[i + 1])
        name = (
            names[n0:n1].decode("ascii")
            if n1 > n0
            else f"{name_prefix}.{counter + i}"
        )
        s0, s1 = int(seq_off[i]), int(seq_off[i + 1])
        c0, c1 = int(cig_off[i]), int(cig_off[i + 1])
        rec_qual = None
        if qual is not None and s1 > s0:
            q = qual[s0:s1]
            if int(q.min()) != 0xFF:  # all-0xFF = missing (BAM '*')
                rec_qual = q
        records.append(
            BamRecord(
                ref_id=int(refid[i]),
                pos=int(pos[i]),
                mapq=int(mapq[i]),
                flag=int(flag[i]),
                read_name=name,
                cigar_ops=cig_ops[c0:c1],
                cigar_lens=cig_lens[c0:c1],
                seq=seq[s0:s1],
                qual=rec_qual,
                next_ref_id=int(next_ref[i]) if next_ref is not None else -1,
                next_pos=int(next_pos_a[i]) if next_pos_a is not None else -1,
                tlen=int(tlen_a[i]) if tlen_a is not None else 0,
            )
        )
    return records


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

class CramReader:
    """Drop-in BamReader equivalent over CRAM 3.0 files.

    ``fasta`` (a FastaReader or path) is required for reference-based
    sequence reconstruction unless slices embed their reference."""

    def __init__(self, path: str, fasta=None, verify_crc: bool = True,
                 use_native: Optional[bool] = None,
                 skip_quals: bool = True,
                 collect_tags: bool = False):
        """``skip_quals`` (default on): quality blocks whose series are
        provably exclusive (qual_skip_info) are never decompressed —
        ``BamRecord`` carries no qualities, and on real-world 3.1
        archives the QS blocks (fqzcomp/arith-coded, the largest series)
        dominate decode time. Pass False to force full decoding (e.g.
        integrity sweeps that want every CRC AND every codec exercised).
        ``collect_tags``: rebuild each record's BAM-layout tag blob
        (conversions); tag-bearing slices then decode through the Python
        reference decoder, which is the only one that captures values."""
        self.path = path
        self.verify_crc = verify_crc
        self._skip_quals = skip_quals
        self._collect_tags = collect_tags
        self._use_native = (
            USE_NATIVE_RECORDS if use_native is None else use_native
        )
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise ValueError(f"{path}: not a CRAM file")
        major, minor = self._fh.read(1)[0], self._fh.read(1)[0]
        if major != 3:
            raise ValueError(f"{path}: unsupported CRAM version {major}.{minor}")
        self.version = (major, minor)
        self._fh.read(20)  # file id

        header = read_container_header(self._fh)
        body = self._fh.read(header.length)
        block = read_block(ByteCursor(body), self.verify_crc)
        (text_len,) = struct.unpack_from("<i", block.data, 0)
        self.header_text = block.data[4: 4 + text_len].decode("ascii", "replace")
        self._data_start = self._fh.tell()

        self.references: List[Tuple[str, int]] = []
        for line in self.header_text.splitlines():
            if line.startswith("@SQ"):
                name, length = None, 0
                for fieldv in line.split("\t")[1:]:
                    if fieldv.startswith("SN:"):
                        name = fieldv[3:]
                    elif fieldv.startswith("LN:"):
                        length = int(fieldv[3:])
                if name is not None:
                    self.references.append((name, length))
        self._name_to_id = {name: i for i, (name, _) in enumerate(self.references)}

        if fasta is not None and isinstance(fasta, str):
            from clair_tpu.io.fasta import FastaReader

            fasta = FastaReader(fasta)
        self._fasta = fasta
        self._ref_cache: Dict[Tuple[int, int, int], bytes] = {}

    def reference_id(self, name: str) -> Optional[int]:
        return self._name_to_id.get(name)

    def _fasta_fetch(self, ref_id: int, start0: int, length: int) -> Optional[bytes]:
        if self._fasta is None:
            return None
        key = (ref_id, start0, length)
        cached = self._ref_cache.get(key)
        if cached is None:
            name, contig_len = self.references[ref_id]
            end = min(start0 + length, contig_len)
            text = self._fasta.fetch(name, max(start0, 0), end).upper()
            cached = text.encode("ascii")
            if len(self._ref_cache) > 64:
                self._ref_cache.clear()
            self._ref_cache[key] = cached
        return cached

    def _containers(self, want_ref: Optional[int], start: Optional[int],
                    end: Optional[int]):
        """Yield (header, body bytes) for containers that can hold matching
        records, seeking past the rest via the header's length field."""
        self._fh.seek(self._data_start)
        while True:
            header = read_container_header(self._fh)
            if header is None or header.is_eof:
                return
            skip = False
            if want_ref is not None and header.ref_seq_id >= 0:
                if header.ref_seq_id != want_ref:
                    # containers are file-ordered; a later ref means done
                    if header.ref_seq_id > want_ref:
                        return
                    skip = True
                elif end is not None and header.start > end:
                    return
                elif start is not None and header.start + header.span <= start:
                    skip = True
            if want_ref is not None and header.ref_seq_id == -1:
                skip = True  # unmapped-only container
            if skip:
                self._fh.seek(header.length, 1)
                continue
            yield header, self._fh.read(header.length)

    def _native_slice_arrays(self, comp, sh, core, external, skip_quals=None):
        """Try the native record decoder for one slice. Returns the
        packed arrays payload, or None to fall back to the Python decoder
        (which either handles the case or raises the precise error).
        ``skip_quals=None`` derives the flag from reader state (matching
        what _slice_records would have skipped for this slice)."""
        if sh.ref_seq_id == -2:
            return None  # multi-ref: per-record reference windows
        if skip_quals is None:
            skip_quals = False
            if self._skip_quals:
                skip_ids, _, _ = qual_skip_info(comp)
                if sh.embedded_ref_id >= 0:
                    skip_ids = skip_ids - {sh.embedded_ref_id}
                skip_quals = bool(skip_ids)
        if sh.embedded_ref_id >= 0:
            ref_buf = external.get(sh.embedded_ref_id, b"")
            rc, payload = _native_decode_arrays(
                comp, sh, core, external, ref_buf, sh.start - 1, True, -1,
                skip_quals,
            )
        elif comp.reference_required:
            if self._fasta is None:
                return None  # Python path raises the missing-fasta error
            buf_start = max(sh.start - 1, 0)
            contig_len = -1
            if 0 <= sh.ref_seq_id < len(self.references):
                contig_len = self.references[sh.ref_seq_id][1]
            buf = b""
            if sh.ref_seq_id >= 0 and sh.span > 0:
                buf = (
                    self._fasta_fetch(sh.ref_seq_id, buf_start, sh.span + 1024)
                    or b""
                )
            rc, payload = 2, None
            for _ in range(4):
                rc, payload = _native_decode_arrays(
                    comp, sh, core, external, buf, buf_start, False,
                    contig_len, skip_quals,
                )
                if rc != 2:
                    break
                # the slice needs reference bases outside the prefetch:
                # grow the window to cover both spans and retry
                need_lo, need_hi = payload
                if need_lo < 0:
                    return None
                new_start = min(buf_start, need_lo)
                new_end = max(need_hi + 1024, buf_start + len(buf))
                if contig_len >= 0:
                    new_end = min(new_end, contig_len)
                if new_end <= new_start:
                    return None
                fetched = self._fasta_fetch(
                    sh.ref_seq_id, new_start, new_end - new_start
                )
                if fetched is None or (
                    new_start == buf_start and len(fetched) <= len(buf)
                ):
                    return None  # no progress: Python fallback
                buf, buf_start = fetched, new_start
            if rc == 2:
                return None
        else:
            rc, payload = _native_decode_arrays(
                comp, sh, core, external, b"", 0, True, -1, skip_quals
            )
        if rc != 0:
            return None
        return payload

    def _native_slice(self, comp, sh, core, external, skip_quals=None):
        """Native record decode for one slice as BamRecord objects, or
        None to fall back to the Python decoder."""
        payload = self._native_slice_arrays(comp, sh, core, external,
                                            skip_quals)
        if payload is None:
            return None
        return _records_from_arrays(payload, sh, "cram")

    def _slice_blocks(self, header: ContainerHeader, body: bytes):
        """Walk one container's slices, yielding (comp, sh, core,
        external, skipping) per slice — the shared preamble of the record
        and packed-array decoders (compression-header parse, qual-skip
        derivation including the embedded-ref id-aliasing workaround,
        block gathering)."""
        cursor = ByteCursor(body)
        comp = parse_compression_header(
            read_block(cursor, self.verify_crc).data
        )
        skip_ids = frozenset()
        if self._skip_quals:
            skip_ids, _, _ = qual_skip_info(comp)
        for _ in range(max(len(header.landmarks), 1)):
            if cursor.eof():
                break
            sh = parse_slice_header(read_block(cursor, self.verify_crc).data)
            slice_skip = skip_ids
            if sh.embedded_ref_id >= 0 and sh.embedded_ref_id in slice_skip:
                # pathological id aliasing: keep the embedded reference
                slice_skip = slice_skip - {sh.embedded_ref_id}
            skipping = bool(slice_skip)
            core = b""
            external: Dict[int, bytes] = {}
            for _ in range(sh.n_blocks):
                block = read_block(cursor, self.verify_crc,
                                   skip_ids=slice_skip or None)
                if block.content_type == CT_CORE:
                    core = block.data
                elif not (skipping and block.content_id in slice_skip):
                    external[block.content_id] = block.data
            yield comp, sh, core, external, skipping

    def _container_arrays(self, header: ContainerHeader, body: bytes):
        """Packed arrays for every slice of one container, or None when
        any slice needs the Python decoder."""
        parts = []
        for comp, sh, core, external, skipping in self._slice_blocks(
            header, body
        ):
            payload = self._native_slice_arrays(comp, sh, core, external,
                                                skipping)
            if payload is None:
                return None
            parts.append(payload)
        return parts

    def fetch_packed(self, contig: Optional[str] = None,
                     start: Optional[int] = None,
                     end: Optional[int] = None):
        """Packed record arrays for a region — the zero-Python-object fast
        path feeding native.RegionScan.from_packed (flag/MAPQ/overlap
        filtering happens there, matching fetch()). Concatenates every
        slice of the containers overlapping [start, end); returns None
        when the native decoder is off or any overlapping slice needs the
        Python decoder (multi-ref slices, exotic codecs), so callers
        never silently lose records."""
        if not self._use_native:
            return None
        want_ref = self._name_to_id.get(contig) if contig is not None else None
        if contig is not None and want_ref is None:
            return None
        parts = []
        for header, body in self._containers(want_ref, start, end):
            arrays = self._container_arrays(header, body)
            if arrays is None:
                return None
            parts.extend(arrays)
        return _concat_packed(parts)

    def _slice_records(self, header: ContainerHeader, body: bytes):
        for comp, sh, core, external, skipping in self._slice_blocks(
            header, body
        ):
            use_native = self._use_native
            if self._collect_tags and any(comp.tag_lines):
                # the file carries tags and the caller wants them: the
                # native decoder skips tag values, so capturing needs
                # the Python reference decoder
                use_native = False
            if use_native:
                records = self._native_slice(comp, sh, core, external,
                                             skipping)
                if records is not None:
                    yield from records
                    continue
            if sh.embedded_ref_id >= 0:
                embedded = external.get(sh.embedded_ref_id, b"")
                ref_start = sh.start - 1

                def ref_fetch(ref_id, pos0, length, _e=embedded, _s=ref_start):
                    lo = pos0 - _s
                    # A record aligned before the slice start (unsorted input)
                    # has no bases in the embedded window; N-pad rather than
                    # silently returning the wrong window (which ref_window
                    # would then cache).
                    if lo < 0 or lo >= len(_e):
                        return None
                    return _e[lo: lo + length]
            elif comp.reference_required:
                if self._fasta is None:
                    raise ValueError(
                        "CRAM slice requires the reference; pass fasta= to CramReader"
                    )
                # one FASTA read per slice, not per record: prefetch the
                # slice's alignment span (+ slack for trailing deletions)
                span_start = max(sh.start - 1, 0)
                span = None
                if sh.ref_seq_id >= 0 and sh.span > 0:
                    span = self._fasta_fetch(
                        sh.ref_seq_id, span_start, sh.span + 1024
                    )

                def ref_fetch(ref_id, pos0, length, _s=span_start, _b=span):
                    if (
                        _b is not None
                        and pos0 >= _s
                        and pos0 + length <= _s + len(_b)
                    ):
                        return _b[pos0 - _s: pos0 - _s + length]
                    return self._fasta_fetch(ref_id, pos0, length)

                ref_fetch.prefetched = span is not None
            else:
                def ref_fetch(ref_id, pos0, length):
                    return None

            yield from decode_slice_records(
                comp, sh, SliceStreams(core, external), ref_fetch,
                skip_quals=skipping,
                collect_tags=self._collect_tags,
            )

    def __iter__(self) -> Iterator[BamRecord]:
        for header, body in self._containers(None, None, None):
            yield from self._slice_records(header, body)

    def fetch(
        self,
        contig: Optional[str] = None,
        start: Optional[int] = None,
        end: Optional[int] = None,
        exclude_flag: int = DEFAULT_EXCLUDE_FLAG,
        min_mapq: int = 0,
        use_index: bool = True,
    ) -> Iterator[BamRecord]:
        """Region scan with flag/MAPQ filtering (BamReader.fetch semantics:
        0-based half-open [start, end), overlap on the reference span).
        Container headers carry (ref, start, span), so non-overlapping
        containers are skipped without decompression — no .crai needed."""
        want_ref = self._name_to_id.get(contig) if contig is not None else None
        if contig is not None and want_ref is None:
            return
        for header, body in self._containers(want_ref, start, end):
            for record in self._slice_records(header, body):
                if record.flag & exclude_flag:
                    continue
                if record.mapq < min_mapq:
                    continue
                if want_ref is not None:
                    if record.ref_id != want_ref:
                        continue
                    if end is not None and record.pos >= end:
                        return
                    if start is not None and record.reference_end <= start:
                        continue
                yield record

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def is_cram(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(4) == CRAM_MAGIC


def open_alignment(path: str, fasta=None):
    """Open a BAM or CRAM by content sniffing; both yield BamRecords with
    the same fetch() surface (the reference gets this for free from
    samtools — ref callVarBam.py:122-181)."""
    if is_cram(path):
        return CramReader(path, fasta=fasta)
    from clair_tpu.io.bam import BamReader

    return BamReader(path)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

# fixed external content ids used by the writer
_W_IDS = {
    "BF": 1, "CF": 2, "RL": 3, "AP": 4, "RG": 5, "RN": 6, "MF": 7, "NS": 8,
    "NP": 9, "TS": 10, "NF": 11, "FN": 12, "FC": 13, "FP": 14, "DL": 15,
    "BA": 16, "BS": 17, "IN": 18, "SC": 19, "HC": 20, "PD": 21, "RS": 22,
    "QS": 23, "TL": 24,
}

_B_SUB_SIZE = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}


def _split_bam_tags(blob: bytes):
    """Parse a BAM-layout tag blob into (tag, typ, value-bytes) triples
    (value bytes stay in BAM layout: Z/H keep the trailing NUL, B keeps
    its sub-type + count prefix). Raises on torn blobs — a converter
    must fail loudly, not silently truncate a record's tags."""
    out = []
    i, n = 0, len(blob)
    while i < n:
        if i + 3 > n:
            raise ValueError("torn BAM tag blob")
        tag = blob[i: i + 2].decode("ascii")
        typ = chr(blob[i + 2])
        i += 3
        if typ in ("A", "c", "C"):
            size = 1
        elif typ in ("s", "S"):
            size = 2
        elif typ in ("i", "I", "f"):
            size = 4
        elif typ in ("Z", "H"):
            end = blob.index(0, i)
            size = end - i + 1
        elif typ == "B":
            if i + 5 > n:
                raise ValueError("torn BAM B-array tag")
            sub = chr(blob[i])
            (count,) = struct.unpack_from("<I", blob, i + 1)
            size = 5 + count * _B_SUB_SIZE[sub]
        else:
            raise ValueError(f"unknown BAM tag type {typ!r}")
        if i + size > n:
            raise ValueError("torn BAM tag blob")
        out.append((tag, typ, blob[i: i + size]))
        i += size
    return out

_DEFAULT_QUAL = 30


class _EncStreams:
    """Encode-side per-slice series buffers."""

    def __init__(self):
        self.ext: Dict[int, bytearray] = {cid: bytearray() for cid in _W_IDS.values()}
        self.core = BitWriter()

    def put_int(self, series: str, v: int) -> None:
        self.ext[_W_IDS[series]] += itf8_encode(v)

    def put_byte(self, series: str, v: int) -> None:
        self.ext[_W_IDS[series]].append(v)

    def put_stop_bytes(self, series: str, data: bytes) -> None:
        self.ext[_W_IDS[series]] += data + b"\x00"

    def put_bytes(self, series: str, data: bytes) -> None:
        self.ext[_W_IDS[series]] += data

    def put_tag(self, key: int, data: bytes) -> None:
        buf = self.ext.get(key)
        if buf is None:
            buf = self.ext[key] = bytearray()
        buf += data


def _writer_encoding_map() -> Dict[str, bytes]:
    enc: Dict[str, bytes] = {}
    for series in ("BF", "CF", "RL", "AP", "RG", "MF", "NS", "NP", "TS", "NF",
                   "FN", "FP", "DL", "HC", "PD", "RS"):
        enc[series] = _encode_external(_W_IDS[series])
    for series in ("FC", "BA", "BS", "QS"):
        enc[series] = _encode_external(_W_IDS[series])
    for series in ("RN", "IN", "SC"):
        enc[series] = _encode_byte_array_stop(0, _W_IDS[series])
    enc["TL"] = _encode_huffman_const(0)   # constant: no tags
    enc["MQ"] = _encode_beta(0, 8)         # core-block bits
    return enc


def _serialize_compression_block(tag_lines=None, tag_keys=()) -> bytes:
    h = CompressionHeader()
    h.codecs = _writer_encoding_map()
    if tag_lines and (len(tag_lines) > 1 or tag_lines[0]):
        h.tag_lines = tag_lines
        # per-record line selector becomes a real series; each distinct
        # (tag, typ) gets an external stream whose content id is the
        # spec-conventional 3-byte key
        h.codecs["TL"] = _encode_external(_W_IDS["TL"])
        # writer-side CompressionHeader carries SERIALIZED encodings
        h.tag_codecs = {key: _encode_external(key) for key in tag_keys}
    return serialize_compression_header(h)


class CramWriter:
    """CRAM 3.0 writer for BamRecords (round-trip tests + bam2cram).

    Emits one single-reference slice per container. Pair pointers (mate
    ref/pos/tlen) are not tracked by ``BamRecord``; paired reads are
    written detached with mate flags only, which preserves every flag bit
    the calling pipeline filters on."""

    def __init__(self, path: str, references: List[Tuple[str, int]], fasta,
                 header_text: str = "", records_per_slice: int = 2048,
                 method: Optional[int] = None, embed_reference: bool = False,
                 version: Tuple[int, int] = (3, 0),
                 fqzcomp_quals: bool = False):
        """embed_reference=True stores each slice's reference span as an
        extra external block (content id 99) and points the slice header's
        embedded-reference id at it — the resulting CRAM decodes without
        the FASTA at hand (htslib's `samtools view -O cram,embed_ref`).

        version=(3, 1) writes a CRAM 3.1 file whose external blocks use
        the rANS Nx16 codec (io/rans4x16.py) unless ``method`` overrides
        it, with read names through the tok3 tokenizer (io/tok3.py,
        htslib's default) and — when ``fqzcomp_quals`` is set, the
        archive profile — qualities through the fqzcomp context model
        (io/fqzcomp.py); the container structure is unchanged between
        3.0 and 3.1."""
        if version not in ((3, 0), (3, 1)):
            raise ValueError(f"unsupported CRAM write version {version}")
        if method is None:
            method = METHOD_RANS4X16 if version == (3, 1) else METHOD_RANS
        if fasta is not None and isinstance(fasta, str):
            from clair_tpu.io.fasta import FastaReader

            fasta = FastaReader(fasta)
        self._fasta = fasta
        self._fh = open(path, "wb")
        self._fh.write(
            CRAM_MAGIC + bytes(version) + b"clair_tpu".ljust(20, b"\x00")
        )
        self.references = references
        self._records_per_slice = records_per_slice
        self._method = method
        self._version = version
        self._embed_reference = embed_reference
        self._fqzcomp_quals = fqzcomp_quals
        self._counter = 0
        self._pending: List[BamRecord] = []
        self._sub = SubstitutionMatrix()

        if not header_text:
            header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
                f"@SQ\tSN:{name}\tLN:{length}\n" for name, length in references
            )
        payload = struct.pack("<i", len(header_text)) + header_text.encode("ascii")
        block = write_block(Block(METHOD_RAW, CT_FILE_HEADER, 0, payload))
        self._fh.write(
            write_container_header(
                ContainerHeader(len(block), 0, 0, 0, 0, 0, 0, 1, [0])
            )
        )
        self._fh.write(block)

    def write_record(self, rec: BamRecord) -> None:
        if self._pending and (
            len(self._pending) >= self._records_per_slice
            or rec.ref_id != self._pending[0].ref_id
        ):
            self._flush_slice()
        self._pending.append(rec)

    def _ref_bytes(self, ref_id: int, start0: int, end0: int) -> bytes:
        name, length = self.references[ref_id]
        return self._fasta.fetch(name, start0, min(end0, length)).upper().encode("ascii")

    def _encode_record(self, rec: BamRecord, streams: _EncStreams,
                       prev_ap: int, tl_index: int = 0,
                       rec_tags=None) -> int:
        mapped = not (rec.flag & 4)
        ap = rec.pos + 1
        cf = CF_QS_ARRAY
        if (rec.flag & 1 or getattr(rec, "next_ref_id", -1) >= 0
                or getattr(rec, "tlen", 0) != 0):
            # detached = mate data stored explicitly; also for unpaired
            # records that carry mate pointers (BAM allows it), so the
            # fields survive the round trip
            cf |= CF_DETACHED
        streams.put_int("BF", rec.flag & ~0x28)  # 0x8/0x20 reconstruct from MF
        streams.put_int("CF", cf)
        rl = len(rec.seq)
        streams.put_int("RL", rl)
        streams.put_int("AP", ap - prev_ap)
        streams.put_int("RG", -1)
        streams.put_stop_bytes("RN", rec.read_name.encode("ascii"))
        if cf & CF_DETACHED:
            mf = 0
            if rec.flag & 0x20:
                mf |= MF_MATE_REVERSE
            if rec.flag & 0x8:
                mf |= MF_MATE_UNMAPPED
            streams.put_int("MF", mf)
            streams.put_int("NS", getattr(rec, "next_ref_id", -1))
            streams.put_int("NP", getattr(rec, "next_pos", -1) + 1)
            streams.put_int("TS", getattr(rec, "tlen", 0))
        if rec_tags is None:
            pass  # TL: constant-huffman 0 (no bits), tagless slice
        else:
            streams.put_int("TL", tl_index)
            for (tag, typ, val) in rec_tags:
                streams.put_tag(
                    (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ), val
                )
        if mapped:
            features = self._features(rec)
            streams.put_int("FN", len(features))
            prev_fp = 0
            for (fp, code, payload) in features:
                streams.put_byte("FC", code)
                streams.put_int("FP", fp - prev_fp)
                prev_fp = fp
                c = chr(code)
                if c == "X":
                    streams.put_byte("BS", payload)
                elif c == "B":
                    streams.put_byte("BA", payload)
                    streams.put_byte("QS", _DEFAULT_QUAL)
                    # ('B' is never emitted by _features; the QS byte
                    # here keeps stream sync for any future emitter)
                elif c == "I":
                    streams.put_stop_bytes("IN", payload)
                elif c == "S":
                    streams.put_stop_bytes("SC", payload)
                elif c == "D":
                    streams.put_int("DL", payload)
                elif c == "N":
                    streams.put_int("RS", payload)
                elif c == "H":
                    streams.put_int("HC", payload)
                elif c == "P":
                    streams.put_int("PD", payload)
            streams.core.write_bits(rec.mapq & 0xFF, 8)  # MQ: beta(0,8)
            streams.put_bytes("QS", self._qual_bytes(rec, rl))
        else:
            streams.put_bytes("BA", rec.seq.tobytes())
            streams.put_bytes("QS", self._qual_bytes(rec, rl))
        return ap

    @staticmethod
    def _qual_bytes(rec: BamRecord, rl: int) -> bytes:
        """The record's real per-base qualities when present (lossless
        bam2cram), the historical constant otherwise."""
        qual = getattr(rec, "qual", None)
        if qual is not None and len(qual) == rl:
            return bytes(bytearray(qual))
        return b"\xff" * rl  # spec convention for missing ('*') quals

    def _features(self, rec: BamRecord):
        """(in-read 1-based position, feature code, payload) triples from
        CIGAR + SEQ vs the reference."""
        features = []
        seq = rec.seq
        qpos = 1
        refpos = rec.pos
        ref_end = rec.pos + rec.reference_length
        ref = self._ref_bytes(rec.ref_id, rec.pos, ref_end)
        sub = self._sub
        for op, length in zip(rec.cigar_ops, rec.cigar_lens):
            length = int(length)
            c = CIGAR_OPS[op]
            if c in "M=X":
                for k in range(length):
                    read_base = seq[qpos - 1 + k]
                    off = refpos - rec.pos + k
                    ref_base = ref[off] if off < len(ref) else ord("N")
                    if read_base == ref_base:
                        continue
                    code = sub.code_for(ref_base, read_base)
                    if code is not None:
                        features.append((qpos + k, ord("X"), code))
                    else:
                        features.append((qpos + k, ord("B"), int(read_base)))
                qpos += length
                refpos += length
            elif c == "I":
                features.append(
                    (qpos, ord("I"), seq[qpos - 1: qpos - 1 + length].tobytes())
                )
                qpos += length
            elif c == "S":
                features.append(
                    (qpos, ord("S"), seq[qpos - 1: qpos - 1 + length].tobytes())
                )
                qpos += length
            elif c == "D":
                features.append((qpos, ord("D"), length))
                refpos += length
            elif c == "N":
                features.append((qpos, ord("N"), length))
                refpos += length
            elif c == "H":
                features.append((qpos, ord("H"), length))
            elif c == "P":
                features.append((qpos, ord("P"), length))
            else:
                raise ValueError(f"cannot encode CIGAR op {c}")
        return features

    def _flush_slice(self) -> None:
        records = self._pending
        self._pending = []
        if not records:
            return
        ref_id = records[0].ref_id
        start = records[0].pos + 1
        end = max(r.pos + max(r.reference_length, 1) for r in records)
        span = max(end - start + 1, 1)
        # tag-line dictionary over the slice: line 0 stays the empty line
        # (the tagless TL default); records with tags select their line
        parsed_tags = []
        line_index = {(): 0}
        tag_lines = [[]]
        tag_keys = set()
        for rec in records:
            triples = _split_bam_tags(getattr(rec, "tags", b"") or b"")
            parsed_tags.append(triples)
            line = tuple((t, y) for (t, y, _v) in triples)
            if line not in line_index:
                line_index[line] = len(tag_lines)
                tag_lines.append(list(line))
            for (t, y, _v) in triples:
                tag_keys.add((ord(t[0]) << 16) | (ord(t[1]) << 8) | ord(y))
        has_tags = len(tag_lines) > 1

        streams = _EncStreams()
        prev_ap = start
        qs_lengths = []
        qs_buf = streams.ext[_W_IDS["QS"]]
        for rec, triples in zip(records, parsed_tags):
            qs_before = len(qs_buf)
            tl_index = line_index[tuple((t, y) for (t, y, _v) in triples)]
            prev_ap = self._encode_record(
                rec, streams, prev_ap, tl_index,
                triples if has_tags else None,
            )
            qs_lengths.append(len(qs_buf) - qs_before)

        comp_payload = _serialize_compression_block(
            tag_lines if has_tags else None, sorted(tag_keys))
        comp_block = write_block(
            Block(METHOD_RAW, CT_COMPRESSION_HEADER, 0, comp_payload)
        )

        core = streams.core.getvalue()
        data_blocks = [write_block(Block(self._method, CT_CORE, 0, core),
                       METHOD_RAW if len(core) < 32 else None)]
        content_ids = []
        for cid in sorted(streams.ext):
            data = bytes(streams.ext[cid])
            if not data:
                continue
            content_ids.append(cid)
            method = self._method if len(data) >= 32 else METHOD_RAW
            if (method != METHOD_RAW and self._version >= (3, 1)
                    and cid == _W_IDS["RN"]):
                # htslib's 3.1 default: read names go through the name
                # tokenizer (write_block falls back to RAW if it loses)
                method = METHOD_TOK3
            fqz_lengths = None
            if (method != METHOD_RAW and self._fqzcomp_quals
                    and self._version >= (3, 1) and cid == _W_IDS["QS"]):
                # archive profile: qualities through the fqzcomp model
                # with the true per-record lengths coded in-stream
                method = METHOD_FQZCOMP
                fqz_lengths = qs_lengths
            data_blocks.append(write_block(
                Block(method, CT_EXTERNAL, cid, data),
                fqz_lengths=fqz_lengths,
            ))

        embedded_ref_id = -1
        if self._embed_reference and ref_id >= 0:
            embedded_ref_id = 99  # outside the series id range
            ref_bytes = self._ref_bytes(ref_id, start - 1, start - 1 + span)
            content_ids.append(embedded_ref_id)
            data_blocks.append(write_block(
                Block(self._method, CT_EXTERNAL, embedded_ref_id, ref_bytes)
            ))

        slice_header = SliceHeader(
            ref_seq_id=ref_id, start=start, span=span,
            n_records=len(records), record_counter=self._counter,
            n_blocks=len(data_blocks), content_ids=content_ids,
            embedded_ref_id=embedded_ref_id,
        )
        slice_block = write_block(
            Block(METHOD_RAW, CT_SLICE_HEADER, 0, serialize_slice_header(slice_header))
        )
        body = comp_block + slice_block + b"".join(data_blocks)
        container = ContainerHeader(
            length=len(body), ref_seq_id=ref_id, start=start, span=span,
            n_records=len(records), record_counter=self._counter,
            n_bases=sum(len(r.seq) for r in records),
            n_blocks=2 + len(data_blocks),
            landmarks=[len(comp_block)],
        )
        self._fh.write(write_container_header(container))
        self._fh.write(body)
        self._counter += len(records)

    def close(self) -> None:
        self._flush_slice()
        self._fh.write(EOF_CONTAINER)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------

def bam_to_cram(bam_path: str, cram_path: str, fasta, **writer_kwargs) -> int:
    """Convert BAM -> CRAM (per-base qualities are preserved through the
    QS series; lossy only in what BamRecord drops: tags and mate
    pointers). Returns the record count."""
    from clair_tpu.io.bam import BamReader

    n = 0
    with BamReader(bam_path) as bam:
        with CramWriter(cram_path, bam.references, fasta,
                        header_text=bam.header_text, **writer_kwargs) as out:
            for rec in bam:
                out.write_record(rec)
                n += 1
    return n


def cram_to_bam(cram_path: str, bam_path: str, fasta) -> int:
    """Convert CRAM -> BAM through the record model (qualities decoded
    and preserved; a record without them writes BAM's '*' convention).
    Returns the count."""
    from clair_tpu.io.bam import BamWriter

    n = 0
    with CramReader(cram_path, fasta=fasta, skip_quals=False,
                    collect_tags=True) as cram:
        with BamWriter(bam_path, cram.references,
                       header_text=cram.header_text) as out:
            for rec in cram:
                out.write(
                    rec.read_name, rec.ref_id, rec.pos, rec.mapq, rec.flag,
                    [(int(l), CIGAR_OPS[o]) for o, l in
                     zip(rec.cigar_ops, rec.cigar_lens)],
                    rec.seq_str(),
                    qual=rec.qual,
                    next_ref_id=rec.next_ref_id,
                    next_pos=rec.next_pos,
                    tlen=rec.tlen,
                    tags=rec.tags,
                )
                n += 1
    return n
