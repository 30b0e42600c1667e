"""CRAM 3.0 stack tests: varints, blocks, codecs, and full BAM<->CRAM
record round-trips through the same BamRecord model the pileup consumes."""

import os
import struct

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.io.cram import (
    BitReader,
    BitWriter,
    Block,
    ByteCursor,
    CramReader,
    CramWriter,
    METHOD_BZIP2,
    METHOD_GZIP,
    METHOD_LZMA,
    METHOD_RANS,
    METHOD_RAW,
    SubstitutionMatrix,
    _build_codec,
    _encode_beta,
    _encode_byte_array_len,
    _encode_byte_array_stop,
    _encode_external,
    _encode_huffman_const,
    _parse_encoding,
    SliceStreams,
    bam_to_cram,
    cram_to_bam,
    is_cram,
    itf8_encode,
    ltf8_encode,
    open_alignment,
    read_block,
    write_block,
)
from clair_tpu.utils.simulate import write_fasta


# ---------------------------------------------------------------------------
# Varints
# ---------------------------------------------------------------------------

def test_itf8_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
              0x0FFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -2, -100):
        data = itf8_encode(v)
        cur = ByteCursor(data)
        assert cur.read_itf8() == v, v
        assert cur.pos == len(data)


def test_itf8_known_encodings():
    assert itf8_encode(0) == b"\x00"
    assert itf8_encode(0x7F) == b"\x7f"
    assert itf8_encode(0x80) == bytes([0x80, 0x80])
    assert itf8_encode(-1) == bytes([0xFF, 0xFF, 0xFF, 0xFF, 0x0F])


def test_ltf8_roundtrip():
    for v in (0, 0x7F, 0x80, 0x3FFF, 1 << 20, 1 << 27, 1 << 34, 1 << 41,
              1 << 48, 1 << 55, (1 << 62), 123456789012345):
        data = ltf8_encode(v)
        cur = ByteCursor(data)
        assert cur.read_ltf8() == v, v
        assert cur.pos == len(data)


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------

def test_bit_io_msb_first():
    w = BitWriter()
    w.write_bits(0b101, 3)
    w.write_bits(0xAB, 8)
    w.write_bits(1, 1)
    data = w.getvalue()
    r = BitReader(data)
    assert r.read_bits(3) == 0b101
    assert r.read_bits(8) == 0xAB
    assert r.read_bit() == 1
    # MSB-first: first written bit is the top bit of byte 0
    assert data[0] & 0x80 == 0x80


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "method", [METHOD_RAW, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RANS]
)
def test_block_roundtrip_all_methods(method):
    payload = b"The quick brown fox jumps over the lazy dog. " * 40
    raw = write_block(Block(method, 4, 7, payload))
    block = read_block(ByteCursor(raw))
    assert block.data == payload
    assert block.content_id == 7


def test_block_crc_detects_corruption():
    raw = bytearray(write_block(Block(METHOD_GZIP, 4, 7, b"x" * 500)))
    raw[10] ^= 0xFF
    with pytest.raises(ValueError):
        read_block(ByteCursor(bytes(raw)))


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------

def test_huffman_canonical_multi_symbol():
    # symbols 5,6,7 with lengths 1,2,2 -> canonical codes 0, 10, 11
    from clair_tpu.io.cram import HuffmanCodec

    codec = HuffmanCodec([5, 6, 7], [1, 2, 2])
    w = BitWriter()
    for bits, n in ((0b0, 1), (0b10, 2), (0b11, 2), (0b0, 1)):
        w.write_bits(bits, n)
    s = SliceStreams(w.getvalue(), {})
    assert [codec.read_int(s) for _ in range(4)] == [5, 6, 7, 5]


def test_huffman_constant_consumes_no_bits():
    enc = _encode_huffman_const(42)
    codec = _parse_encoding(ByteCursor(enc))
    s = SliceStreams(b"", {})
    assert codec.read_int(s) == 42
    assert codec.read_int(s) == 42


def test_beta_gamma_subexp():
    from clair_tpu.io.cram import GammaCodec, SubexpCodec

    beta = _parse_encoding(ByteCursor(_encode_beta(10, 6)))
    w = BitWriter()
    w.write_bits(42, 6)
    assert beta.read_int(SliceStreams(w.getvalue(), {})) == 32  # 42 - offset 10

    # gamma(offset 0): value 5 = '00' '101' -> leading zeros then bits
    w = BitWriter()
    w.write_bits(0b00101, 5)
    assert GammaCodec(0).read_int(SliceStreams(w.getvalue(), {})) == 5

    # subexp k=2: v=3 -> prefix 0, then 2 bits '11'
    w = BitWriter()
    w.write_bits(0b011, 3)
    assert SubexpCodec(0, 2).read_int(SliceStreams(w.getvalue(), {})) == 3
    # v=9 -> count=2: '110' prefix, then k+count-1=3 bits of 9-8=1
    w = BitWriter()
    w.write_bits(0b110, 3)
    w.write_bits(0b001, 3)
    assert SubexpCodec(0, 2).read_int(SliceStreams(w.getvalue(), {})) == 9


def test_external_and_byte_array_codecs():
    ext = _parse_encoding(ByteCursor(_encode_external(3)))
    stop = _parse_encoding(ByteCursor(_encode_byte_array_stop(0, 4)))
    bal = _parse_encoding(
        ByteCursor(_encode_byte_array_len(_encode_external(5), _encode_external(6)))
    )
    s = SliceStreams(b"", {
        3: itf8_encode(300) + itf8_encode(7),
        4: b"hello\x00world\x00",
        5: itf8_encode(3) + itf8_encode(0),
        6: b"abc",
    })
    assert ext.read_int(s) == 300
    assert ext.read_int(s) == 7
    assert stop.read_bytes(s) == b"hello"
    assert stop.read_bytes(s) == b"world"
    assert bal.read_bytes(s) == b"abc"
    assert bal.read_bytes(s) == b""


def test_substitution_matrix_identity_and_custom():
    m = SubstitutionMatrix()
    # identity: ref A, code 0 -> C (first of CGTN)
    assert m.substitute(ord("A"), 0) == ord("C")
    assert m.code_for(ord("A"), ord("C")) == 0
    assert m.code_for(ord("C"), ord("A")) == 0
    assert m.code_for(ord("A"), ord("A")) is None
    # a permuted matrix must invert consistently
    custom = SubstitutionMatrix(bytes([0b11100100] * 5))
    for ref in b"ACGTN":
        for code in range(4):
            alt = custom.substitute(ref, code)
            assert custom.code_for(ref, alt) == code
    # non-ACGTN reference bases decode via the N row
    assert m.substitute(ord("R"), 0) == m.substitute(ord("N"), 0)


# ---------------------------------------------------------------------------
# End-to-end record round-trips
# ---------------------------------------------------------------------------

REF = (
    "ACGTACGTGGCCTTAAGCTAGCTAGCATCGATCGATTACGGCATTTTACGCATGCATGCA"
    "GCTAGCATCGACTGACTGACTAGCTGACTGACTGATCGATCGATCGGCTAGCTAGCTAAC" * 10
)


def _write_ref(tmp_path):
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    write_fasta(fasta_path, REF, contig="chr1")
    return fasta_path


def _mutate(seq: str, pos: int, base: str) -> str:
    return seq[:pos] + base + seq[pos + 1:]


def _make_bam(tmp_path, records):
    bam_path = os.path.join(str(tmp_path), "in.bam")
    with BamWriter(bam_path, [("chr1", len(REF))]) as writer:
        for (name, pos, flag, cigar, seq, mapq) in records:
            writer.write(name, 0, pos, mapq, flag, cigar, seq)
    return bam_path


def _records_equal(a, b):
    assert a.read_name == b.read_name
    assert a.ref_id == b.ref_id
    assert a.pos == b.pos
    assert a.flag == b.flag
    assert a.mapq == b.mapq
    assert a.cigar_str() == b.cigar_str()
    assert a.seq_str() == b.seq_str()


def _roundtrip_records(tmp_path, records, **writer_kwargs):
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, records)
    cram_path = os.path.join(str(tmp_path), "out.cram")
    n = bam_to_cram(bam_path, cram_path, fasta_path, **writer_kwargs)
    assert n == len(records)
    assert is_cram(cram_path)
    with BamReader(bam_path) as bam:
        originals = list(bam)
    with CramReader(cram_path, fasta=fasta_path) as cram:
        assert cram.references == [("chr1", len(REF))]
        decoded = list(cram)
    assert len(decoded) == len(originals)
    for a, b in zip(originals, decoded):
        _records_equal(a, b)
    return cram_path


def test_roundtrip_perfect_matches(tmp_path):
    records = [
        (f"r{i}", 10 * i, 0, [(60, "M")], REF[10 * i: 10 * i + 60], 60)
        for i in range(30)
    ]
    _roundtrip_records(tmp_path, records)


def test_roundtrip_snps_indels_clips(tmp_path):
    seq_m = REF[100:160]
    records = [
        # SNP in the middle (X feature, substitution code path)
        ("snp", 100, 0, [(60, "M")], _mutate(seq_m, 30, "A" if seq_m[30] != "A" else "G"), 60),
        # insertion
        ("ins", 200, 16, [(30, "M"), (5, "I"), (30, "M")],
         REF[200:230] + "TTTTT" + REF[230:260], 50),
        # deletion
        ("del", 300, 0, [(25, "M"), (7, "D"), (25, "M")],
         REF[300:325] + REF[332:357], 40),
        # soft clips both sides
        ("clip", 400, 0, [(8, "S"), (40, "M"), (6, "S")],
         "ACGTACGT" + REF[400:440] + "GGGGGG", 30),
        # hard clip + pad + ref skip
        ("hard", 500, 0, [(5, "H"), (20, "M"), (9, "N"), (20, "M")],
         REF[500:520] + REF[529:549], 20),
        # N base in the read (not in the substitution alphabet target set? N
        # is: ref->N is an X code; a non-ACGTN read base goes through 'B')
        ("nbase", 600, 0, [(40, "M")], _mutate(REF[600:640], 10, "N"), 60),
        # unmapped read (BA byte path)
        ("unmapped", 700, 4, [], "ACGTACGTACGTACGT", 0),
        # multiple adjacent SNPs (FP delta 1)
        ("adj", 800, 0, [(40, "M")],
         _mutate(_mutate(REF[800:840], 15, "A" if REF[815] != "A" else "C"),
                 16, "A" if REF[816] != "A" else "C"), 60),
    ]
    _roundtrip_records(tmp_path, records)


def test_roundtrip_paired_flags(tmp_path):
    # paired reads written detached: mate-unmapped/reverse bits (part of the
    # default 2316 exclusion filter) must survive via MF
    records = [
        ("p1", 50, 1 | 0x20, [(30, "M")], REF[50:80], 60),      # mate reverse
        ("p2", 90, 1 | 0x8, [(30, "M")], REF[90:120], 60),      # mate unmapped
        ("p3", 130, 1 | 0x40 | 0x80, [(30, "M")], REF[130:160], 60),
    ]
    _roundtrip_records(tmp_path, records)


def test_roundtrip_multiple_slices_and_methods(tmp_path):
    rs = np.random.RandomState(0)
    records = []
    for i in range(50):
        pos = int(rs.randint(0, len(REF) - 80))
        records.append((f"m{i}", pos, 0, [(70, "M")], REF[pos: pos + 70], 60))
    records.sort(key=lambda r: r[1])
    for method in (METHOD_GZIP, METHOD_RANS):
        _roundtrip_records(tmp_path, records,
                           records_per_slice=16, method=method)


def test_fetch_region_and_flag_filter(tmp_path):
    records = [
        ("a", 100, 0, [(50, "M")], REF[100:150], 60),
        ("b", 200, 0, [(50, "M")], REF[200:250], 60),
        ("secondary", 210, 256, [(50, "M")], REF[210:260], 60),
        ("c", 300, 0, [(50, "M")], REF[300:350], 60),
        ("lowmapq", 310, 0, [(50, "M")], REF[310:360], 5),
    ]
    cram_path = _roundtrip_records(tmp_path, records, records_per_slice=2)
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    with CramReader(cram_path, fasta=fasta_path) as cram:
        got = [r.read_name for r in cram.fetch("chr1", 190, 320, min_mapq=10)]
    assert got == ["b", "c"]  # secondary excluded by 2316, lowmapq by mapq
    with CramReader(cram_path, fasta=fasta_path) as cram:
        assert [r.read_name for r in cram.fetch("chrX", 0, 10)] == []


def test_cram_to_bam_conversion(tmp_path):
    records = [
        ("x", 100, 0, [(50, "M")], _mutate(REF[100:150], 25, "N"), 60),
        ("y", 160, 16, [(20, "M"), (3, "I"), (20, "M")],
         REF[160:180] + "AAA" + REF[180:200], 42),
    ]
    cram_path = _roundtrip_records(tmp_path, records)
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    back_path = os.path.join(str(tmp_path), "back.bam")
    assert cram_to_bam(cram_path, back_path, fasta_path) == 2
    with BamReader(os.path.join(str(tmp_path), "in.bam")) as bam:
        originals = list(bam)
    with BamReader(back_path) as bam:
        converted = list(bam)
    for a, b in zip(originals, converted):
        _records_equal(a, b)


def test_open_alignment_sniffs_format(tmp_path):
    records = [("r", 100, 0, [(50, "M")], REF[100:150], 60)]
    cram_path = _roundtrip_records(tmp_path, records)
    bam_path = os.path.join(str(tmp_path), "in.bam")
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    with open_alignment(bam_path) as handle:
        assert isinstance(handle, BamReader)
        assert len(list(handle.fetch("chr1", 0, 1000))) == 1
    with open_alignment(cram_path, fasta=fasta_path) as handle:
        assert isinstance(handle, CramReader)
        assert len(list(handle.fetch("chr1", 0, 1000))) == 1


def test_eof_and_truncation(tmp_path):
    records = [("r", 100, 0, [(50, "M")], REF[100:150], 60)]
    cram_path = _roundtrip_records(tmp_path, records)
    data = open(cram_path, "rb").read()
    from clair_tpu.io.cram import EOF_CONTAINER

    assert data.endswith(EOF_CONTAINER)
    # a file truncated before EOF still yields complete containers
    trunc = os.path.join(str(tmp_path), "trunc.cram")
    open(trunc, "wb").write(data[: len(data) - len(EOF_CONTAINER)])
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    with CramReader(trunc, fasta=fasta_path) as cram:
        assert len(list(cram)) == 1


# ---------------------------------------------------------------------------
# End-to-end: variant calling from CRAM == calling from the source BAM
# ---------------------------------------------------------------------------

def test_call_bam_from_cram_matches_bam(tmp_path):
    import io as _io

    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.utils.simulate import (
        plant_variants,
        random_reference,
        simulate_bam,
        write_fasta,
    )
    from tests.test_pipeline_e2e import OraclePredictor

    rs = np.random.RandomState(7)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=12, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    cram_path = str(tmp_path / "s.cram")
    write_fasta(fasta_path, reference)
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    n = bam_to_cram(bam_path, cram_path, fasta_path)
    assert n > 0
    # CRAM actually compresses relative to BAM on clean reads
    assert os.path.getsize(cram_path) < os.path.getsize(bam_path)

    outputs = {}
    for label, path in (("bam", bam_path), ("cram", cram_path)):
        sink = _io.StringIO()
        config = CallBamConfig(
            bam_path=path, fasta_path=fasta_path, contig="chr1",
            ctg_start=1, ctg_end=6000, minimum_af=0.2, minimum_coverage=4,
        )
        total = call_bam(config, OraclePredictor(), output_fh=sink)
        assert total > 0
        outputs[label] = [
            r for r in sink.getvalue().splitlines() if not r.startswith("#")
        ]
    assert outputs["cram"] == outputs["bam"]
    called = {int(r.split("\t")[1]) for r in outputs["cram"]}
    truth = {v.position for v in variants}
    assert len(truth & called) >= len(truth) - 1  # oracle-level recall


def test_corrupt_cram_fails_cleanly(tmp_path):
    """Bit flips / truncations anywhere in the file must raise a clean
    error (or EOF-stop) — never hang, loop, or crash the interpreter."""
    records = [
        ("a", 100, 0, [(50, "M")], REF[100:150], 60),
        ("b", 200, 0, [(20, "M"), (3, "I"), (20, "M")],
         REF[200:220] + "TTT" + REF[220:240], 60),
    ]
    cram_path = _roundtrip_records(tmp_path, records)
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    data = bytearray(open(cram_path, "rb").read())
    rs = np.random.RandomState(0)

    bad = os.path.join(str(tmp_path), "bad.cram")
    # truncations at every region of the file
    for cut in [30, 60, len(data) // 2, len(data) - 45]:
        open(bad, "wb").write(bytes(data[:cut]))
        try:
            with CramReader(bad, fasta=fasta_path) as cram:
                list(cram)
        except (ValueError, IndexError, EOFError, OSError):
            pass
    # random single-byte corruptions (CRCs catch block damage; header
    # damage must raise, not wedge)
    for _ in range(60):
        corrupted = bytearray(data)
        pos = int(rs.randint(26, len(data)))
        corrupted[pos] ^= 1 + int(rs.randint(255))
        open(bad, "wb").write(bytes(corrupted))
        try:
            with CramReader(bad, fasta=fasta_path) as cram:
                list(cram)
        except (ValueError, IndexError, EOFError, OSError, KeyError,
                UnicodeDecodeError, MemoryError, struct.error):
            pass


def test_no_seq_records_consume_no_base_bytes():
    """CF_NO_SEQ (SEQ '*') records carry no BA bytes; reading any would
    desync every later record in the slice (htslib writes such records for
    seq-less secondary alignments)."""
    from clair_tpu.io.cram import (
        CF_NO_SEQ,
        CF_QS_ARRAY,
        CompressionHeader,
        SliceHeader,
        _writer_encoding_map,
        _W_IDS,
        decode_slice_records,
        parse_compression_header,
        serialize_compression_header,
    )

    # serialize a compression header with the writer's encoding map, then
    # parse it back to get decode-side codecs
    h = CompressionHeader()
    h.codecs = _writer_encoding_map()
    header = parse_compression_header(serialize_compression_header(h))

    # two unmapped records: first NO_SEQ (rl=5, no BA bytes), second normal
    ext = {cid: bytearray() for cid in _W_IDS.values()}
    def put(series, *vals):
        for v in vals:
            ext[_W_IDS[series]] += itf8_encode(v)
    # record 1: BF=4 (unmapped), CF = NO_SEQ (no quals either), RL=5, AP
    # delta 0, RG -1, name
    put("BF", 4); put("CF", CF_NO_SEQ); put("RL", 5); put("AP", 0); put("RG", -1)
    ext[_W_IDS["RN"]] += b"noseq\x00"
    # record 2: BF=4, CF = quals array, RL=4, AP delta 1, RG -1, name, bases+quals
    put("BF", 4); put("CF", CF_QS_ARRAY); put("RL", 4); put("AP", 1); put("RG", -1)
    ext[_W_IDS["RN"]] += b"normal\x00"
    ext[_W_IDS["BA"]] += b"ACGT"
    ext[_W_IDS["QS"]] += bytes([30] * 4)

    slice_header = SliceHeader(
        ref_seq_id=0, start=100, span=10, n_records=2, record_counter=0,
        n_blocks=0, content_ids=[],
    )
    streams = SliceStreams(b"", {cid: bytes(data) for cid, data in ext.items()})
    records = decode_slice_records(
        header, slice_header, streams, lambda ref_id, pos0, length: None
    )
    assert records[0].read_name == "noseq"
    assert records[0].seq_str() == "NNNNN"
    assert records[1].read_name == "normal"
    assert records[1].seq_str() == "ACGT"  # would be garbage on desync


def test_multi_contig_roundtrip_and_fetch(tmp_path):
    """Records spanning contigs: the writer must cut slices at contig
    boundaries and region fetch must confine itself to the asked contig."""
    from clair_tpu.io.bam import BamWriter

    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    with open(fasta_path, "w") as fh:
        for name in ("chr1", "chr2"):
            fh.write(f">{name}\n{REF}\n")
    from clair_tpu.io.fasta import build_fai

    build_fai(fasta_path)

    bam_path = os.path.join(str(tmp_path), "mc.bam")
    with BamWriter(bam_path, [("chr1", len(REF)), ("chr2", len(REF))]) as w:
        for i in range(10):
            w.write(f"a{i}", 0, 40 * i, 60, 0, [(60, "M")], REF[40 * i: 40 * i + 60])
        for i in range(10):
            w.write(f"b{i}", 1, 40 * i, 60, 0, [(60, "M")], REF[40 * i: 40 * i + 60])
    cram_path = os.path.join(str(tmp_path), "mc.cram")
    assert bam_to_cram(bam_path, cram_path, fasta_path) == 20

    with CramReader(cram_path, fasta=fasta_path) as cram:
        assert cram.references == [("chr1", len(REF)), ("chr2", len(REF))]
        all_records = list(cram)
        assert [r.ref_id for r in all_records] == [0] * 10 + [1] * 10
        chr2_only = list(cram.fetch("chr2", 0, 1000))
        assert [r.read_name for r in chr2_only] == [f"b{i}" for i in range(10)]
        chr1_window = list(cram.fetch("chr1", 100, 200))
        assert all(r.ref_id == 0 for r in chr1_window)
        assert {r.read_name for r in chr1_window} == {
            f"a{i}" for i in range(10) if 40 * i < 200 and 40 * i + 60 > 100
        }


def test_embedded_reference_decodes_without_fasta(tmp_path):
    """embed_reference=True makes the CRAM self-contained: the reader
    reconstructs sequences from the embedded slice reference blocks and
    never needs the FASTA."""
    fasta_path = _write_ref(tmp_path)
    seq_m = REF[100:160]
    records = [
        ("m", 100, 0, [(60, "M")], seq_m, 60),
        ("snp", 200, 0, [(60, "M")],
         _mutate(REF[200:260], 30, "A" if REF[230] != "A" else "G"), 60),
        ("del", 300, 0, [(25, "M"), (5, "D"), (25, "M")],
         REF[300:325] + REF[330:355], 40),
    ]
    bam_path = _make_bam(tmp_path, records)
    cram_path = os.path.join(str(tmp_path), "embed.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, embed_reference=True)
    with BamReader(bam_path) as bam:
        originals = list(bam)
    # NO fasta passed: decode must still reconstruct every base
    with CramReader(cram_path) as cram:
        decoded = list(cram)
    assert len(decoded) == len(originals)
    for a, b in zip(originals, decoded):
        _records_equal(a, b)


# ---------------------------------------------------------------------------
# per-base quality fidelity (bam2cram / cram2bam lossless round trip)
# ---------------------------------------------------------------------------

def _qual_records(rs):
    """(write args, quals) pairs: varied real quals + one '*' record."""
    recs = []
    for i, (pos, cig, seqlen) in enumerate(
        [(5, [(60, "M")], 60), (40, [(30, "M"), (5, "I"), (25, "M")], 60),
         (80, [(10, "S"), (50, "M")], 60)]
    ):
        seq = "".join(rs.choice(list("ACGT"), seqlen))
        qual = rs.randint(0, 60, seqlen).astype(np.uint8)
        recs.append((f"q{i}", pos, 0, cig, seq, 60, qual))
    seq = "".join(rs.choice(list("ACGT"), 40))
    recs.append(("star", 120, 0, [(40, "M")], seq, 60, None))  # '*' quals
    return recs


def _write_qual_bam(tmp_path, recs, name="qin.bam"):
    bam_path = os.path.join(str(tmp_path), name)
    with BamWriter(bam_path, [("chr1", len(REF))]) as writer:
        for (rname, pos, flag, cigar, seq, mapq, qual) in recs:
            writer.write(rname, 0, pos, mapq, flag, cigar, seq, qual=qual)
    return bam_path


def test_bam_writer_reader_qual_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    recs = _qual_records(rs)
    bam_path = _write_qual_bam(tmp_path, recs)
    with BamReader(bam_path) as reader:
        got = list(reader)
    assert len(got) == len(recs)
    for rec, (_, _, _, _, _, _, qual) in zip(got, recs):
        if qual is None:
            assert rec.qual is None
        else:
            assert rec.qual is not None
            assert np.array_equal(rec.qual, qual)


@pytest.mark.parametrize("writer_kwargs", [
    {},                                        # CRAM 3.0
    {"version": (3, 1)},                       # 3.1 (rANS Nx16 + tok3)
    {"version": (3, 1), "fqzcomp_quals": True},  # archive profile
    {"embed_reference": True},
])
def test_qual_roundtrip_bam_cram_bam(tmp_path, writer_kwargs):
    """bam2cram -> cram2bam preserves per-base qualities exactly; a
    record with '*' (missing) quals stays missing."""
    rs = np.random.RandomState(3)
    recs = _qual_records(rs)
    fasta_path = _write_ref(tmp_path)
    bam_path = _write_qual_bam(tmp_path, recs)
    cram_path = os.path.join(str(tmp_path), "q.cram")
    out_bam = os.path.join(str(tmp_path), "qout.bam")
    assert bam_to_cram(bam_path, cram_path, fasta_path, **writer_kwargs) \
        == len(recs)
    assert cram_to_bam(cram_path, out_bam, fasta_path) == len(recs)
    with BamReader(bam_path) as a, BamReader(out_bam) as b:
        for ra, rb in zip(a, b):
            _records_equal(ra, rb)
            if ra.qual is None:
                assert rb.qual is None, ra.read_name
            else:
                assert rb.qual is not None, ra.read_name
                assert np.array_equal(ra.qual, rb.qual), ra.read_name


def test_qual_native_matches_python_decoder(tmp_path, monkeypatch):
    """The native slice decoder's quality arrays must match the Python
    reference decoder record for record."""
    import clair_tpu.io.cram as cram_mod

    rs = np.random.RandomState(4)
    recs = _qual_records(rs)
    fasta_path = _write_ref(tmp_path)
    bam_path = _write_qual_bam(tmp_path, recs)
    cram_path = os.path.join(str(tmp_path), "qn.cram")
    bam_to_cram(bam_path, cram_path, fasta_path)

    with CramReader(cram_path, fasta=fasta_path, skip_quals=False) as r:
        native_recs = list(r)
    monkeypatch.setattr(cram_mod, "_native_decode_arrays",
                        lambda *a, **k: (-1, None))
    with CramReader(cram_path, fasta=fasta_path, skip_quals=False) as r:
        python_recs = list(r)
    assert len(native_recs) == len(python_recs) == len(recs)
    for rn, rp in zip(native_recs, python_recs):
        _records_equal(rn, rp)
        if rp.qual is None:
            assert rn.qual is None, rp.read_name
        else:
            assert rn.qual is not None, rp.read_name
            assert np.array_equal(rn.qual, rp.qual), rp.read_name


def test_skip_quals_reader_attaches_no_quals(tmp_path):
    """The calling path (skip_quals=True, the default) must never carry
    quality arrays — blocks stay compressed and records stay lean."""
    rs = np.random.RandomState(5)
    recs = _qual_records(rs)
    fasta_path = _write_ref(tmp_path)
    bam_path = _write_qual_bam(tmp_path, recs)
    cram_path = os.path.join(str(tmp_path), "qs.cram")
    bam_to_cram(bam_path, cram_path, fasta_path)
    with CramReader(cram_path, fasta=fasta_path) as r:
        for rec in r:
            assert rec.qual is None


# ---------------------------------------------------------------------------
# mate-pointer + tag fidelity (full lossless bam2cram / cram2bam)
# ---------------------------------------------------------------------------

def _tagged_paired_records(rs):
    """Paired records with real mate pointers, tlen, and a mixed tag set
    (int, string, float, char, B-array), plus a tagless unpaired one."""
    import struct as _struct

    def tags(*triples):
        out = b""
        for tag, typ, val in triples:
            out += tag.encode() + typ.encode() + val
        return out

    seq1 = "".join(rs.choice(list("ACGT"), 50))
    seq2 = "".join(rs.choice(list("ACGT"), 50))
    t1 = tags(("NM", "i", _struct.pack("<i", 3)),
               ("MD", "Z", b"10A39\x00"),
               ("AS", "c", b"\x28"),
               ("XS", "f", _struct.pack("<f", 1.5)))
    t2 = tags(("NM", "i", _struct.pack("<i", 0)),
               ("MD", "Z", b"50\x00"),
               ("ZB", "B", b"c\x03\x00\x00\x00\x01\x02\x03"))
    # flags: paired+proper (0x1|0x2), mate strands
    recs = [
        ("p1", 10, 0x1 | 0x2 | 0x40, [(50, "M")], seq1, 60,
         rs.randint(5, 40, 50).astype(np.uint8), 0, 200, 240, t1),
        ("p2", 200, 0x1 | 0x2 | 0x10 | 0x80, [(50, "M")], seq2, 55,
         rs.randint(5, 40, 50).astype(np.uint8), 0, 10, -240, t2),
        ("solo", 300, 0, [(40, "M")],
         "".join(rs.choice(list("ACGT"), 40)), 50,
         rs.randint(5, 40, 40).astype(np.uint8), -1, -1, 0, b""),
    ]
    return recs


def _write_full_bam(tmp_path, recs, name="fin.bam"):
    bam_path = os.path.join(str(tmp_path), name)
    with BamWriter(bam_path, [("chr1", len(REF))]) as writer:
        for (rname, pos, flag, cigar, seq, mapq, qual,
             nref, npos, tlen, tags) in recs:
            writer.write(rname, 0, pos, mapq, flag, cigar, seq, qual=qual,
                         next_ref_id=nref, next_pos=npos, tlen=tlen,
                         tags=tags)
    return bam_path


def test_bam_reader_mates_and_tags_roundtrip(tmp_path):
    rs = np.random.RandomState(8)
    recs = _tagged_paired_records(rs)
    bam_path = _write_full_bam(tmp_path, recs)
    with BamReader(bam_path) as reader:
        got = list(reader)
    for rec, src in zip(got, recs):
        (_, _, _, _, _, _, _, nref, npos, tlen, tags) = src
        assert rec.next_ref_id == nref
        assert rec.next_pos == npos
        assert rec.tlen == tlen
        assert rec.tags == tags


@pytest.mark.parametrize("writer_kwargs", [
    {},                                        # CRAM 3.0
    {"version": (3, 1)},                       # 3.1 codec set
    {"version": (3, 1), "fqzcomp_quals": True},
    {"embed_reference": True},
])
def test_full_fidelity_bam_cram_bam(tmp_path, writer_kwargs):
    """bam2cram -> cram2bam preserves seq, quals, mate pointers, tlen,
    AND the BAM tag blob byte for byte."""
    rs = np.random.RandomState(9)
    recs = _tagged_paired_records(rs)
    fasta_path = _write_ref(tmp_path)
    bam_path = _write_full_bam(tmp_path, recs)
    cram_path = os.path.join(str(tmp_path), "f.cram")
    out_bam = os.path.join(str(tmp_path), "fout.bam")
    assert bam_to_cram(bam_path, cram_path, fasta_path, **writer_kwargs) \
        == len(recs)
    assert cram_to_bam(cram_path, out_bam, fasta_path) == len(recs)
    with BamReader(bam_path) as a, BamReader(out_bam) as b:
        for ra, rb in zip(a, b):
            _records_equal(ra, rb)
            assert rb.next_ref_id == ra.next_ref_id, ra.read_name
            assert rb.next_pos == ra.next_pos, ra.read_name
            assert rb.tlen == ra.tlen, ra.read_name
            assert rb.tags == ra.tags, ra.read_name
            if ra.qual is None:
                assert rb.qual is None
            else:
                assert np.array_equal(ra.qual, rb.qual)


def test_tagged_cram_still_decodes_native_when_tags_not_requested(tmp_path):
    """A tag-bearing CRAM read WITHOUT collect_tags must keep the native
    fast path (tag values are skipped in C) and produce the same records
    minus the tag blobs."""
    rs = np.random.RandomState(10)
    recs = _tagged_paired_records(rs)
    fasta_path = _write_ref(tmp_path)
    bam_path = _write_full_bam(tmp_path, recs)
    cram_path = os.path.join(str(tmp_path), "fn.cram")
    bam_to_cram(bam_path, cram_path, fasta_path)
    with CramReader(cram_path, fasta=fasta_path) as r:
        fast = list(r)
    with CramReader(cram_path, fasta=fasta_path, collect_tags=True,
                    skip_quals=False) as r:
        full = list(r)
    assert len(fast) == len(full) == len(recs)
    for rf, rt in zip(fast, full):
        _records_equal(rf, rt)
        assert rf.tags == b""      # skipped
        assert rf.next_ref_id == rt.next_ref_id
        assert rf.next_pos == rt.next_pos
        assert rf.tlen == rt.tlen
