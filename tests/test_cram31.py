"""CRAM 3.1 support: rANS Nx16 blocks, version wiring, named errors for
the unimplemented 3.1 codecs. Containers are structurally identical to
3.0; only the file-definition minor version and the block codec change."""

import io as _io
import os

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader
from clair_tpu.io.cram import (
    Block,
    ByteCursor,
    CramReader,
    METHOD_ARITH,
    METHOD_FQZCOMP,
    METHOD_RANS4X16,
    METHOD_TOK3,
    bam_to_cram,
    read_block,
    write_block,
)

from tests.test_cram import (  # shared fixtures/helpers
    REF,
    _make_bam,
    _records_equal,
    _write_ref,
)


def _records():
    return [
        (f"r{i}", 10 * i, 0, [(60, "M")], REF[10 * i: 10 * i + 60], 60)
        for i in range(30)
    ] + [
        ("ins", 150, 0, [(20, "M"), (4, "I"), (20, "M")],
         REF[150:170] + "ACGT" + REF[170:190], 60),
        ("dele", 300, 16, [(20, "M"), (3, "D"), (20, "M")],
         REF[300:320] + REF[323:343], 60),
    ]


def _roundtrip_31(tmp_path, **writer_kwargs):
    fasta_path = _write_ref(tmp_path)
    bam_path = _make_bam(tmp_path, _records())
    cram_path = os.path.join(str(tmp_path), "out31.cram")
    n = bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1),
                    **writer_kwargs)
    assert n == len(_records())
    with open(cram_path, "rb") as fh:
        header = fh.read(6)
    assert header == b"CRAM\x03\x01"
    with BamReader(bam_path) as bam:
        originals = list(bam)
    with CramReader(cram_path, fasta=fasta_path) as cram:
        assert cram.version == (3, 1)
        decoded = list(cram)
    assert len(decoded) == len(originals)
    for a, b in zip(originals, decoded):
        _records_equal(a, b)
    return cram_path


def test_cram31_round_trip(tmp_path):
    _roundtrip_31(tmp_path)


def test_cram31_x32_blocks_round_trip(tmp_path, monkeypatch):
    """A 3.1 file whose rANS Nx16 blocks use the 32-way interleaved
    entropy stage (X32 flag — htslib's SIMD layout) reads back exactly."""
    from clair_tpu.io import cram as cram_mod

    monkeypatch.setattr(cram_mod, "RANS4X16_X32", True)
    _roundtrip_31(tmp_path)

    data = b"ACGTACGTAAAACCCCGGGG" * 100
    raw = write_block(
        Block(method=METHOD_RANS4X16, content_type=4, content_id=1,
              data=data),
    )
    block = read_block(ByteCursor(raw), verify_crc=True)
    assert block.data == data
    # the compressed payload's first byte is the rANS flags byte: the
    # writer really emitted the 32-way stage for this block size
    from clair_tpu.io.cram import _compress_payload
    from clair_tpu.io.rans4x16 import F_X32

    stream = _compress_payload(METHOD_RANS4X16, data)
    assert stream[0] & F_X32


def test_cram31_embed_ref_round_trip(tmp_path):
    cram_path = _roundtrip_31(tmp_path, embed_reference=True)
    # decodes without the FASTA at hand
    with CramReader(cram_path) as cram:
        assert len(list(cram)) == len(_records())


def test_cram31_blocks_use_rans4x16(tmp_path):
    data = b"ACGTACGTAAAACCCCGGGG" * 100
    raw = write_block(
        Block(method=METHOD_RANS4X16, content_type=4, content_id=1,
              data=data),
    )
    assert raw[0] == METHOD_RANS4X16
    block = read_block(ByteCursor(raw), verify_crc=True)
    assert block.data == data
    assert len(raw) < len(data)


def test_cram31_arith_blocks_round_trip(tmp_path):
    """A 3.1 file whose external blocks use the adaptive arithmetic coder
    (archive-profile codec) reads back exactly, and beats the raw size."""
    _roundtrip_31(tmp_path, method=METHOD_ARITH)

    data = b"ACGTACGTAAAACCCCGGGG" * 100
    raw = write_block(
        Block(method=METHOD_ARITH, content_type=4, content_id=1, data=data),
    )
    assert raw[0] == METHOD_ARITH
    block = read_block(ByteCursor(raw), verify_crc=True)
    assert block.data == data
    assert len(raw) < len(data)


def test_call_bam_from_cram31_arith_matches_bam(tmp_path):
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )
    from tests.test_pipeline_e2e import OraclePredictor

    rs = np.random.RandomState(11)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=12, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    cram_path = str(tmp_path / "s31a.cram")
    write_fasta(fasta_path, reference)
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    assert bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1),
                       method=METHOD_ARITH) > 0

    outputs = {}
    for label, path in (("bam", bam_path), ("cram31_arith", cram_path)):
        sink = _io.StringIO()
        config = CallBamConfig(
            bam_path=path, fasta_path=fasta_path, contig="chr1",
            ctg_start=1, ctg_end=6000, minimum_af=0.2, minimum_coverage=4,
        )
        assert call_bam(config, OraclePredictor(), output_fh=sink) > 0
        outputs[label] = [
            r for r in sink.getvalue().splitlines() if not r.startswith("#")
        ]
    assert outputs["cram31_arith"] == outputs["bam"]


@pytest.mark.parametrize("method", [METHOD_ARITH, METHOD_FQZCOMP,
                                    METHOD_TOK3])
def test_31_codecs_reject_garbage_payloads(tmp_path, method):
    """Every 3.1 codec is implemented now; a block whose method byte
    claims one of them but whose payload is garbage must fail loudly,
    never return wrong bytes."""
    raw = bytearray(
        write_block(Block(method=0, content_type=4, content_id=1,
                          data=b"payload"))
    )
    raw[0] = method  # flip the method byte; CRC covers it, so skip verify
    with pytest.raises(Exception):
        read_block(ByteCursor(bytes(raw)), verify_crc=False)


def test_cram31_smaller_than_bam_on_clean_reads(tmp_path):
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    rs = np.random.RandomState(7)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=10, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    cram_path = str(tmp_path / "s31.cram")
    write_fasta(fasta_path, reference)
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1))
    assert os.path.getsize(cram_path) < os.path.getsize(bam_path)


def test_call_bam_from_cram31_matches_bam(tmp_path):
    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )
    from tests.test_pipeline_e2e import OraclePredictor

    rs = np.random.RandomState(9)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=12, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    cram_path = str(tmp_path / "s31.cram")
    write_fasta(fasta_path, reference)
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    assert bam_to_cram(bam_path, cram_path, fasta_path, version=(3, 1)) > 0

    outputs = {}
    for label, path in (("bam", bam_path), ("cram31", cram_path)):
        sink = _io.StringIO()
        config = CallBamConfig(
            bam_path=path, fasta_path=fasta_path, contig="chr1",
            ctg_start=1, ctg_end=6000, minimum_af=0.2, minimum_coverage=4,
        )
        assert call_bam(config, OraclePredictor(), output_fh=sink) > 0
        outputs[label] = [
            r for r in sink.getvalue().splitlines() if not r.startswith("#")
        ]
    assert outputs["cram31"] == outputs["bam"]
