"""Bin block codec v3: byte-shuffled LZ4-HC frames (LZ4S) over the system
liblz4 — the reference's own blosc-lz4hc-9+shuffle choice
(/root/reference/clair/utils.py:47-48) rebuilt without blosc. The codec
must round-trip every block dtype the bins carry, stay readable through
the pure-Python fallback decoder, and coexist with v1/v2 zstd blocks in
the same dataset."""

import io

import numpy as np
import pytest
import zstandard

from clair_tpu.data.bins import (
    _LZ4S_MAGIC, BinDataset, _pack, _unpack, load_bin, write_bin,
)
from clair_tpu.io import lz4


def test_liblz4_available_in_this_image():
    # the write path falls back to zstd without it; this image has it
    assert lz4.available()


@pytest.mark.parametrize("arr", [
    np.random.RandomState(0).randint(-250, 250, (500, 33, 8, 4)).astype(np.float32),
    np.random.RandomState(1).rand(100, 90).astype(np.float32),  # not int16-packable
    np.array([f"chr1:{i}" for i in range(500)]),
    np.zeros((0, 90), np.float32),
    np.arange(7, dtype=np.uint8),  # odd payload length exercises the pad byte
    np.float32(3.0).reshape(()),   # 0-d
])
def test_lz4s_round_trip(arr):
    blob = _pack(arr)
    assert blob[:4] == _LZ4S_MAGIC
    out = _unpack(blob)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_int16_packing_survives_codec_change():
    counts = np.random.RandomState(2).randint(-250, 251, (64, 33, 8, 4))
    blob = _pack(counts.astype(np.float32))
    assert _unpack(blob, cast=False).dtype == np.int16
    restored = _unpack(blob)
    assert restored.dtype == np.float32
    assert np.array_equal(restored, counts)


def test_pure_python_decoder_matches_native():
    rs = np.random.RandomState(3)
    for data in (
        rs.randint(0, 255, 10_000).astype(np.uint8).tobytes(),  # incompressible
        bytes(10_000),                                           # overlapping RLE
        (b"ACGT" * 2500),                                        # short-period matches
        rs.randint(0, 4, 10_000).astype(np.uint8).tobytes(),
        b"",
        b"x",
    ):
        comp = lz4.compress_hc(data)
        assert bytes(lz4.decompress(comp, len(data))) == data
        assert bytes(lz4._py_decompress(comp, len(data))) == data


def test_python_decoder_rejects_corruption():
    comp = bytearray(lz4.compress_hc(b"ACGTACGTACGT" * 100))
    with pytest.raises(ValueError):
        lz4._py_decompress(bytes(comp), 12_000)  # wrong raw size
    with pytest.raises((ValueError, IndexError)):
        lz4._py_decompress(bytes(comp[: len(comp) // 2]), 1200)  # truncated


def test_native_decoder_rejects_corruption():
    comp = lz4.compress_hc(b"ACGTACGTACGT" * 100)
    with pytest.raises(ValueError):
        lz4.decompress(comp, 1200 + 1)  # wrong raw size
    with pytest.raises(ValueError):
        lz4.decompress(comp[: len(comp) // 2], 1200)  # truncated


def test_v2_zstd_blocks_still_read():
    """Blocks written by the v1/v2 packer (plain zstd over npy) decode
    through the same _unpack; a dataset may mix them with LZ4S blocks."""
    arr = np.random.RandomState(4).randint(-9, 9, (50, 33, 8, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, arr.astype(np.int16), allow_pickle=False)
    v2_blob = zstandard.ZstdCompressor(level=6).compress(buf.getvalue())
    assert np.array_equal(_unpack(v2_blob), arr)

    mixed = BinDataset(
        dataset_size=100,
        x_blocks=[v2_blob, _pack(arr)],
        y_blocks=[_pack(np.zeros((50, 90), np.float32))] * 2,
        pos_blocks=[_pack(np.array(["chr1:1"] * 50))] * 2,
        block_size=50,
    )
    assert np.array_equal(mixed.x_block(0), mixed.x_block(1))


def test_bin_file_round_trip_carries_v3_magic(tmp_path):
    arr = np.random.RandomState(5).randint(0, 5, (20, 33, 8, 4)).astype(np.float32)
    ds = BinDataset(
        dataset_size=20,
        x_blocks=[_pack(arr)],
        y_blocks=[_pack(np.zeros((20, 90), np.float32))],
        pos_blocks=[_pack(np.array(["chr1:1"] * 20))],
        block_size=20,
    )
    path = str(tmp_path / "v3.bin")
    write_bin(path, ds)
    back = load_bin(path)
    assert np.array_equal(back.x_block(0), arr)


def test_zstd_fallback_when_liblz4_missing(monkeypatch):
    """Hosts without liblz4 write zstd blocks (readable everywhere) and
    still READ LZ4S blocks through the pure-Python decoder."""
    arr = np.random.RandomState(6).randint(-3, 3, (30, 33, 8, 4)).astype(np.float32)
    lz4s_blob = _pack(arr)  # written while the lib is available
    monkeypatch.setattr(lz4, "_lib", None)
    monkeypatch.setattr(lz4, "_lib_checked", True)
    assert not lz4.available()
    zstd_blob = _pack(arr)
    assert zstd_blob[:4] != _LZ4S_MAGIC
    assert np.array_equal(_unpack(zstd_blob), arr)
    assert np.array_equal(_unpack(lz4s_blob), arr)  # pure-Python read path
