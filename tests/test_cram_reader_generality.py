"""CRAM reader generality: containers this framework's own writer never
produces (ADVICE round 2 — real-world CRAMs exercise codec paths the
writer-roundtrip tests cannot reach).

A container is built fully BY HAND here: GAMMA-coded BF, SUBEXP-coded RL,
BETA-coded AP (non-delta) — all in the core bit stream — plus a populated
tag dictionary (one NM:c tag per record) and TWO slices inside one
container. The reader must decode records through its generic codec map,
not through any assumption mirroring the writer's encoding choices
(EXTERNAL itf8 everywhere + BETA MQ only).
"""

import numpy as np

from clair_tpu.io.cram import (
    Block,
    BitWriter,
    CompressionHeader,
    ContainerHeader,
    CramReader,
    CRAM_MAGIC,
    CT_COMPRESSION_HEADER,
    CT_CORE,
    CT_EXTERNAL,
    CT_FILE_HEADER,
    CT_SLICE_HEADER,
    EOF_CONTAINER,
    METHOD_RAW,
    SliceHeader,
    _encode_beta,
    _encode_byte_array_stop,
    _encode_external,
    _encode_huffman_const,
    itf8_encode,
    serialize_compression_header,
    serialize_slice_header,
    write_block,
    write_container_header,
)

C_HUFFMAN, C_BETA, C_SUBEXP, C_GAMMA = 3, 6, 7, 9


def _enc(codec_id: int, params: bytes) -> bytes:
    return itf8_encode(codec_id) + itf8_encode(len(params)) + params


def _encode_gamma_spec(offset: int) -> bytes:
    return _enc(C_GAMMA, itf8_encode(offset))


def _encode_subexp_spec(offset: int, k: int) -> bytes:
    return _enc(C_SUBEXP, itf8_encode(offset) + itf8_encode(k))


def _put_gamma(bits: BitWriter, v: int, offset: int) -> None:
    u = v + offset
    assert u >= 1
    n = u.bit_length() - 1
    bits.write_bits(0, n)            # n zeros
    bits.write_bits(1, 1)            # the stop 1 (top bit of u)
    bits.write_bits(u - (1 << n), n) if n else None


def _put_subexp(bits: BitWriter, v: int, offset: int, k: int) -> None:
    u = v + offset
    if u < (1 << k):
        bits.write_bits(0, 1)
        bits.write_bits(u, k)
    else:
        n = u.bit_length() - 1
        count = n - k + 1
        for _ in range(count):
            bits.write_bits(1, 1)
        bits.write_bits(0, 1)
        bits.write_bits(u - (1 << n), n)


RECORDS_SLICE1 = [  # (flag, pos0, read_length, name, nm_tag)
    (0, 99, 36, "g1", 0),
    (16, 149, 150, "g2", 3),
    (0, 151, 7, "g3", 1),
]
RECORDS_SLICE2 = [
    (16, 999, 64, "h1", 2),
    (0, 1200, 1000, "h2", 7),
]


def _build_slice(records, counter: int) -> bytes:
    core = BitWriter()
    rn = bytearray()
    nm = bytearray()
    for (flag, pos0, rl, name, tag) in records:
        _put_gamma(core, flag, offset=1)           # BF: gamma(1)
        # CF: huffman const 0 -> zero bits
        _put_subexp(core, rl, offset=0, k=3)       # RL: subexp(0, 3)
        core.write_bits(pos0 + 1, 16)              # AP: beta(0, 16), no delta
        # RG: huffman const 0; RN from the stop-byte stream
        rn += name.encode("ascii") + b"\x00"
        # TL: huffman const 0 -> tag line 0 = [NM:c]
        nm.append(tag)
        # FN: huffman const 0 -> no features
        core.write_bits(60, 8)                     # MQ: beta(0, 8)
        # CF has no QS_ARRAY bit: no quality stream at all

    start = min(p for (_, p, _, _, _) in records) + 1
    end = max(p + rl for (_, p, rl, _, _) in records)
    blocks = [
        write_block(Block(METHOD_RAW, CT_CORE, 0, core.getvalue())),
        write_block(Block(METHOD_RAW, CT_EXTERNAL, 30, bytes(rn))),
        write_block(Block(METHOD_RAW, CT_EXTERNAL, 40, bytes(nm))),
    ]
    header = SliceHeader(
        ref_seq_id=0, start=start, span=end - start + 1,
        n_records=len(records), record_counter=counter,
        n_blocks=len(blocks), content_ids=[30, 40],
    )
    return write_block(
        Block(METHOD_RAW, CT_SLICE_HEADER, 0, serialize_slice_header(header))
    ) + b"".join(blocks)


def _build_cram(path: str) -> None:
    h = CompressionHeader()
    h.read_names_included = True
    h.ap_delta = False
    h.reference_required = False
    h.tag_lines = [[("NM", "c")]]
    h.codecs = {
        "BF": _encode_gamma_spec(1),
        "CF": _encode_huffman_const(0),
        "RL": _encode_subexp_spec(0, 3),
        "AP": _encode_beta(0, 16),
        "RG": _encode_huffman_const(0),
        "RN": _encode_byte_array_stop(0, 30),
        "TL": _encode_huffman_const(0),
        "FN": _encode_huffman_const(0),
        "MQ": _encode_beta(0, 8),
    }
    nm_key = (ord("N") << 16) | (ord("M") << 8) | ord("c")
    h.tag_codecs = {nm_key: _encode_external(40)}
    comp_block = write_block(
        Block(METHOD_RAW, CT_COMPRESSION_HEADER, 0,
              serialize_compression_header(h))
    )

    slice1 = _build_slice(RECORDS_SLICE1, 0)
    slice2 = _build_slice(RECORDS_SLICE2, len(RECORDS_SLICE1))
    body = comp_block + slice1 + slice2
    all_recs = RECORDS_SLICE1 + RECORDS_SLICE2
    container = ContainerHeader(
        length=len(body), ref_seq_id=0,
        start=min(p for (_, p, _, _, _) in all_recs) + 1,
        span=max(p + rl for (_, p, rl, _, _) in all_recs),
        n_records=len(all_recs), record_counter=0,
        n_bases=sum(rl for (_, _, rl, _, _) in all_recs),
        n_blocks=2 + 3 + 1 + 3 + 1,
        landmarks=[len(comp_block), len(comp_block) + len(slice1)],
    )

    header_text = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:500000\n"
    payload = np.int32(len(header_text)).tobytes() + header_text.encode()
    fh_block = write_block(Block(METHOD_RAW, CT_FILE_HEADER, 0, payload))

    with open(path, "wb") as fh:
        fh.write(CRAM_MAGIC + bytes([3, 0]) + b"handmade".ljust(20, b"\x00"))
        fh.write(write_container_header(
            ContainerHeader(len(fh_block), 0, 0, 0, 0, 0, 0, 1, [0])
        ))
        fh.write(fh_block)
        fh.write(write_container_header(container))
        fh.write(body)
        fh.write(EOF_CONTAINER)


def test_gamma_subexp_multislice_tagged_container(tmp_path):
    path = str(tmp_path / "handmade.cram")
    _build_cram(path)
    with CramReader(path) as cram:
        assert cram.references == [("chr1", 500000)]
        decoded = list(cram)
    expected = RECORDS_SLICE1 + RECORDS_SLICE2
    assert len(decoded) == len(expected)
    for rec, (flag, pos0, rl, name, _) in zip(decoded, expected):
        assert rec.read_name == name
        assert rec.flag == flag
        assert rec.pos == pos0
        assert rec.mapq == 60
        assert rec.cigar_str() == f"{rl}M"
        # reference_required=False and no FASTA: bases reconstruct as N
        assert rec.seq_str() == "N" * rl


def test_region_fetch_spans_slices(tmp_path):
    path = str(tmp_path / "handmade.cram")
    _build_cram(path)
    with CramReader(path) as cram:
        got = [r.read_name for r in cram.fetch("chr1", 900, 1300)]
    assert got == ["h1", "h2"]


# ---------------------------------------------------------------------------
# downstream-mate resolution (CF_MATE_DOWNSTREAM pairs, the layout real
# aligners' CRAMs use for pairs inside one slice)
# ---------------------------------------------------------------------------

PAIR_RECORDS = [  # (cf, nf, flag, pos0, rl, name)
    (0x4, 0, 0x1 | 0x2 | 0x40, 99, 50, "m1"),       # mate is next record
    (0x0, 0, 0x1 | 0x2 | 0x10 | 0x80, 299, 50, "m2"),
    (0x0, 0, 0x0, 600, 30, "solo"),
]


def _build_pair_cram(path: str) -> None:
    core = BitWriter()
    rn = bytearray()
    nf = bytearray()
    for (cf, nfv, flag, pos0, rl, name) in PAIR_RECORDS:
        _put_gamma(core, flag, offset=1)       # BF: gamma(1)
        core.write_bits(cf, 3)                 # CF: beta(0, 3)
        _put_subexp(core, rl, offset=0, k=3)   # RL: subexp(0, 3)
        core.write_bits(pos0 + 1, 16)          # AP: beta(0, 16)
        rn += name.encode("ascii") + b"\x00"
        if cf & 0x4:
            nf += itf8_encode(nfv)             # NF: external itf8
        core.write_bits(60, 8)                 # MQ: beta(0, 8)

    start = min(p for (_, _, _, p, _, _) in PAIR_RECORDS) + 1
    end = max(p + rl for (_, _, _, p, rl, _) in PAIR_RECORDS)
    blocks = [
        write_block(Block(METHOD_RAW, CT_CORE, 0, core.getvalue())),
        write_block(Block(METHOD_RAW, CT_EXTERNAL, 30, bytes(rn))),
        write_block(Block(METHOD_RAW, CT_EXTERNAL, 50, bytes(nf))),
    ]
    sh = SliceHeader(
        ref_seq_id=0, start=start, span=end - start + 1,
        n_records=len(PAIR_RECORDS), record_counter=0,
        n_blocks=len(blocks), content_ids=[30, 50],
    )
    slice_bytes = write_block(
        Block(METHOD_RAW, CT_SLICE_HEADER, 0, serialize_slice_header(sh))
    ) + b"".join(blocks)

    h = CompressionHeader()
    h.read_names_included = True
    h.ap_delta = False
    h.reference_required = False
    h.codecs = {
        "BF": _encode_gamma_spec(1),
        "CF": _encode_beta(0, 3),
        "RL": _encode_subexp_spec(0, 3),
        "AP": _encode_beta(0, 16),
        "RG": _encode_huffman_const(0),
        "RN": _encode_byte_array_stop(0, 30),
        "NF": _encode_external(50),
        "TL": _encode_huffman_const(0),
        "FN": _encode_huffman_const(0),
        "MQ": _encode_beta(0, 8),
    }
    comp_block = write_block(
        Block(METHOD_RAW, CT_COMPRESSION_HEADER, 0,
              serialize_compression_header(h))
    )
    body = comp_block + slice_bytes
    container = ContainerHeader(
        length=len(body), ref_seq_id=0, start=start,
        span=end - start + 1, n_records=len(PAIR_RECORDS),
        record_counter=0,
        n_bases=sum(rl for (_, _, _, _, rl, _) in PAIR_RECORDS),
        n_blocks=2 + 3, landmarks=[len(comp_block)],
    )
    header_text = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:500000\n"
    payload = np.int32(len(header_text)).tobytes() + header_text.encode()
    fh_block = write_block(Block(METHOD_RAW, CT_FILE_HEADER, 0, payload))
    with open(path, "wb") as fh:
        fh.write(CRAM_MAGIC + bytes([3, 0]) + b"handmade".ljust(20, b"\x00"))
        fh.write(write_container_header(
            ContainerHeader(len(fh_block), 0, 0, 0, 0, 0, 0, 1, [0])
        ))
        fh.write(fh_block)
        fh.write(write_container_header(container))
        fh.write(body)
        fh.write(EOF_CONTAINER)


def _check_pair_records(records):
    assert [r.read_name for r in records] == ["m1", "m2", "solo"]
    m1, m2, solo = records
    assert (m1.next_ref_id, m1.next_pos) == (0, 299)
    assert (m2.next_ref_id, m2.next_pos) == (0, 99)
    # span: 99 .. 299+50 -> 250; leftmost positive
    assert m1.tlen == 250 and m2.tlen == -250
    # mate strand/unmapped bits propagated both ways
    assert m1.flag & 0x20          # mate reverse (m2 is reverse)
    assert not m2.flag & 0x20      # m1 is forward
    assert (solo.next_ref_id, solo.next_pos, solo.tlen) == (-1, -1, 0)


def test_downstream_mates_resolve(tmp_path):
    path = str(tmp_path / "pairs.cram")
    _build_pair_cram(path)
    with CramReader(path) as reader:           # native-first path
        native_records = list(reader)
    with CramReader(path, use_native=False) as reader:
        python_records = list(reader)
    _check_pair_records(native_records)
    _check_pair_records(python_records)
