"""BGZF block layer + BAI index round trips."""

import numpy as np

from clair_tpu.io.bai import BaiIndex, build_bai, reg2bin
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.io.bgzf import (
    block_offsets,
    inflate_range,
    resolve_virtual_offset,
)

REF = ("ACGT" * 3000)[:12000]


def _big_bam(tmp_path):
    """Enough reads to span multiple BGZF blocks."""
    path = str(tmp_path / "big.bam")
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        for i in range(3000):
            pos = (i * 4) % (len(REF) - 150)
            writer.write(f"r{i:05d}", 0, pos, 60, 0, [(100, "M")], REF[pos:pos + 100])
        # writer sorts nothing: generate pre-sorted positions
    return path


def _sorted_bam(tmp_path, n=3000):
    path = str(tmp_path / "sorted.bam")
    positions = sorted((i * 7) % (len(REF) - 150) for i in range(n))
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        for i, pos in enumerate(positions):
            writer.write(f"r{i:05d}", 0, pos, 60, 0, [(100, "M")], REF[pos:pos + 100])
    return path, positions


def test_block_offsets_and_parallel_inflate(tmp_path):
    path, _ = _sorted_bam(tmp_path)
    raw = open(path, "rb").read()
    blocks = block_offsets(raw)
    assert len(blocks) > 3  # multi-block file
    assert sum(size for _, size in blocks) == len(raw)

    seq_data, index = inflate_range(raw, threads=1)
    par_data, index2 = inflate_range(raw, threads=4)
    assert seq_data == par_data
    assert index == index2
    assert seq_data[:4] == b"BAM\x01"


def test_bai_roundtrip_and_seek(tmp_path):
    path, positions = _sorted_bam(tmp_path)
    bai_path = build_bai(path)
    index = BaiIndex(bai_path)

    # seek into the middle of the file
    start = 8000
    voffset = index.min_virtual_offset(0, start)
    assert voffset is not None

    raw = open(path, "rb").read()
    coffset = voffset >> 16
    data, block_index = inflate_range(raw, coffset)
    upos = resolve_virtual_offset(block_index, voffset, 0)
    # the record at upos parses and is the first that may overlap `start`
    import struct

    (block_size,) = struct.unpack_from("<i", data, upos)
    ref_id, pos = struct.unpack_from("<ii", data, upos + 4)
    assert ref_id == 0
    assert pos <= start          # may start before, must be able to overlap
    assert pos + 100 > start - 16384  # within one linear window of the target


def test_reg2bin_spec_values():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, 1 << 17) == 585
    assert reg2bin(0, 1 << 29) == 0
