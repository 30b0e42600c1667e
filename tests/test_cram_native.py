"""Native CRAM record decoder (native/clair_cram.cpp) vs the Python
reference decoder (io/cram.py decode_slice_records).

The rest of the CRAM suite runs with the native path enabled by default,
so its BAM-parity assertions already cover it end-to-end; these tests pin
the direct native-vs-Python equivalence, prove the native path is
actually taken (not a silent fallback), and exercise the
reference-window retry protocol (rc == 2)."""

import dataclasses
import os

import numpy as np
import pytest

from clair_tpu import native
from clair_tpu.io import cram as cram_mod
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.io.cram import CramReader, bam_to_cram
from clair_tpu.utils.simulate import write_fasta

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

rs = np.random.RandomState(42)
REF = "".join(rs.choice(list("ACGT"), size=4000))


def _mutate(seq, pos, base):
    return seq[:pos] + base + seq[pos + 1:]


def _mixed_records():
    return [
        ("snp", 100, 0, [(60, "M")],
         _mutate(REF[100:160], 30, "A" if REF[130] != "A" else "G"), 60),
        ("ins", 200, 16, [(30, "M"), (5, "I"), (30, "M")],
         REF[200:230] + "TTTTT" + REF[230:260], 50),
        ("del", 300, 0, [(25, "M"), (7, "D"), (25, "M")],
         REF[300:325] + REF[332:357], 40),
        ("clip", 400, 0, [(8, "S"), (40, "M"), (6, "S")],
         "ACGTACGT" + REF[400:440] + "GGGGGG", 30),
        ("hard", 500, 0, [(5, "H"), (20, "M"), (9, "N"), (20, "M")],
         REF[500:520] + REF[529:549], 20),
        ("nbase", 600, 0, [(40, "M")], _mutate(REF[600:640], 10, "N"), 60),
        ("unmapped", 700, 4, [], "ACGTACGTACGTACGT", 0),
        ("mate_rev", 50, 1 | 0x20, [(30, "M")], REF[50:80], 60),
        ("mate_unm", 90, 1 | 0x8, [(30, "M")], REF[90:120], 60),
        # read running to the contig end (ref window N-padding path)
        ("tail", len(REF) - 30, 0, [(25, "M"), (10, "S")],
         REF[-30:-5] + "ACGTACGTAC", 60),
    ]


def _build_cram(tmp_path, records, **writer_kwargs):
    fasta_path = os.path.join(str(tmp_path), "ref.fa")
    write_fasta(fasta_path, REF, contig="chr1")
    bam_path = os.path.join(str(tmp_path), "in.bam")
    with BamWriter(bam_path, [("chr1", len(REF))]) as writer:
        for (name, pos, flag, cigar, seq, mapq) in records:
            writer.write(name, 0, pos, mapq, flag, cigar, seq)
    cram_path = os.path.join(str(tmp_path), "out.cram")
    bam_to_cram(bam_path, cram_path, fasta_path, **writer_kwargs)
    return cram_path, fasta_path, bam_path


def _assert_identical(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.read_name == rb.read_name
        assert ra.ref_id == rb.ref_id
        assert ra.pos == rb.pos
        assert ra.flag == rb.flag
        assert ra.mapq == rb.mapq
        assert np.array_equal(ra.cigar_ops, rb.cigar_ops)
        assert np.array_equal(ra.cigar_lens, rb.cigar_lens)
        assert np.array_equal(ra.seq, rb.seq)


def test_native_matches_python_decoder(tmp_path, monkeypatch):
    cram_path, fasta_path, _ = _build_cram(tmp_path, _mixed_records())

    native_slices = []
    orig = cram_mod._records_from_arrays
    monkeypatch.setattr(
        cram_mod, "_records_from_arrays",
        lambda *a, **k: native_slices.append(1) or orig(*a, **k),
    )
    with CramReader(cram_path, fasta=fasta_path, use_native=True) as r:
        via_native = list(r)
    assert native_slices, "native decoder was never reached"
    with CramReader(cram_path, fasta=fasta_path, use_native=False) as r:
        via_python = list(r)
    _assert_identical(via_native, via_python)


def test_native_matches_python_embedded_ref(tmp_path, monkeypatch):
    cram_path, fasta_path, _ = _build_cram(
        tmp_path, _mixed_records(), embed_reference=True
    )
    native_slices = []
    orig = cram_mod._records_from_arrays
    monkeypatch.setattr(
        cram_mod, "_records_from_arrays",
        lambda *a, **k: native_slices.append(1) or orig(*a, **k),
    )
    # embedded reference: decodes without any FASTA on both paths
    with CramReader(cram_path, use_native=True) as r:
        via_native = list(r)
    assert native_slices, "native decoder was never reached"
    with CramReader(cram_path, use_native=False) as r:
        via_python = list(r)
    _assert_identical(via_native, via_python)


def test_native_matches_bam_source(tmp_path):
    cram_path, fasta_path, bam_path = _build_cram(tmp_path, _mixed_records())
    with BamReader(bam_path) as r:
        originals = list(r)
    with CramReader(cram_path, fasta=fasta_path, use_native=True) as r:
        decoded = list(r)
    _assert_identical(originals, decoded)


def test_ref_window_retry_protocol(tmp_path, monkeypatch):
    """A slice whose prefetch window is too small must signal rc == 2 and
    succeed after the reader re-prefetches (the retry loop in
    CramReader._native_slice)."""
    cram_path, fasta_path, _ = _build_cram(tmp_path, _mixed_records())
    reader = CramReader(cram_path, fasta=fasta_path, use_native=True)

    captured = {}
    orig_native = cram_mod._native_decode_arrays

    def capture(comp, sh, core, external, *rest):
        captured.setdefault("args", (comp, sh, core, external))
        return orig_native(comp, sh, core, external, *rest)

    monkeypatch.setattr(cram_mod, "_native_decode_arrays", capture)
    baseline = list(reader)
    comp, sh, core, external = captured["args"]
    monkeypatch.setattr(cram_mod, "_native_decode_arrays", orig_native)

    # direct call with an empty window: must ask for bases, not fabricate
    rc, payload = cram_mod._native_decode_arrays(
        comp, sh, core, external, b"", max(sh.start - 1, 0), False, len(REF)
    )
    assert rc == 2
    need_lo, need_hi = payload
    assert need_hi > need_lo >= 0

    # full reader path with a span-starved slice header: retry loop
    # re-prefetches and the records still come out exactly
    fetches = []
    orig_fetch = reader._fasta_fetch

    def counting_fetch(ref_id, start0, length):
        fetches.append((start0, length))
        return orig_fetch(ref_id, start0, length)

    reader._fasta_fetch = counting_fetch
    starved = dataclasses.replace(sh, span=1)
    records = reader._native_slice(comp, starved, core, external)
    assert records is not None, "retry loop fell back unexpectedly"
    n = starved.n_records
    _assert_identical(records, baseline[:n])
    assert len(fetches) >= 2, "expected an initial prefetch plus a retry"


def test_python_fallback_on_multi_ref_slice(tmp_path):
    """ref_seq_id == -2 slices (per-record reference windows) stay on the
    Python decoder."""
    cram_path, fasta_path, _ = _build_cram(tmp_path, _mixed_records())
    reader = CramReader(cram_path, fasta=fasta_path, use_native=True)
    header, body = next(reader._containers(None, None, None))
    from clair_tpu.io.cram import ByteCursor, parse_compression_header, \
        parse_slice_header, read_block, CT_CORE

    cursor = ByteCursor(body)
    comp = parse_compression_header(read_block(cursor).data)
    sh = parse_slice_header(read_block(cursor).data)
    core, external = b"", {}
    for _ in range(sh.n_blocks):
        block = read_block(cursor)
        if block.content_type == CT_CORE:
            core = block.data
        else:
            external[block.content_id] = block.data
    multi = dataclasses.replace(sh, ref_seq_id=-2)
    assert reader._native_slice(comp, multi, core, external) is None


def test_packed_bridge_matches_python_engine(tmp_path):
    """prepare_window over CRAM via the packed-array bridge
    (clair_region_from_packed) == the Python events engine: identical
    tensors, centers, and 33-mers on a noisy flowcell."""
    import clair_tpu.native as native_mod
    from clair_tpu.io.bai import build_bai
    from clair_tpu.io.cram import bam_to_cram
    from clair_tpu.pipeline.call_bam import CallBamConfig, prepare_window
    from clair_tpu.utils.simulate import (
        ErrorProfile, plant_variants, random_reference, simulate_bam,
        write_fasta,
    )

    rs = np.random.RandomState(31)
    ref = random_reference(rs, 12_000)
    variants = plant_variants(rs, ref, n_variants=12, spacing=700)
    bam = str(tmp_path / "p.bam")
    fa = str(tmp_path / "p.fa")
    cram = str(tmp_path / "p.cram")
    simulate_bam(bam, ref, variants, rs, coverage=25,
                 error_profile=ErrorProfile(mismatch=0.05, insertion=0.02,
                                            deletion=0.02))
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    bam_to_cram(bam, cram, fa)

    config = CallBamConfig(bam_path=cram, fasta_path=fa, contig="chr1",
                           minimum_af=0.2, minimum_coverage=4)
    # the bridge must actually engage or the comparison below is vacuous
    from clair_tpu.pipeline.call_bam import _cram_packed_scan

    probe = _cram_packed_scan(cram, fa, "chr1", 0, 12_000, 0)
    assert probe is not None and probe.n_records > 0
    probe.close()
    fast = prepare_window(config)
    orig = native_mod.RegionScan.from_packed
    native_mod.RegionScan.from_packed = classmethod(
        lambda cls, *a, **kw: None
    )
    try:
        slow = prepare_window(config)
    finally:
        native_mod.RegionScan.from_packed = orig

    assert len(fast.centers) > 0
    assert np.array_equal(fast.centers, slow.centers)
    assert np.array_equal(fast.tensors, slow.tensors)
    assert fast.sequences == slow.sequences


def test_from_packed_rejects_bam_limits():
    """Records inexpressible in BAM limits (>65535 cigar ops) make
    from_packed return None so the caller falls back instead of
    silently dropping reads."""
    from clair_tpu.native import RegionScan, available

    if not available():
        pytest.skip("native lib unavailable")
    n_ops = 70_000
    arrays = {
        "pos": np.array([100], dtype=np.int64),
        "mapq": np.array([60], dtype=np.int32),
        "flag": np.array([0], dtype=np.int32),
        "refid": np.array([0], dtype=np.int32),
        "seq": np.frombuffer(b"A" * n_ops, dtype=np.uint8),
        "seq_off": np.array([0, n_ops], dtype=np.int64),
        "cig_ops": np.zeros(n_ops, dtype=np.uint8),
        "cig_lens": np.ones(n_ops, dtype=np.int32),
        "cig_off": np.array([0, n_ops], dtype=np.int64),
    }
    assert RegionScan.from_packed(arrays, 0, 0, 1_000_000) is None
    # and a well-formed sibling still opens
    arrays["cig_ops"] = np.zeros(1, dtype=np.uint8)
    arrays["cig_lens"] = np.array([n_ops], dtype=np.int32)
    arrays["cig_off"] = np.array([0, 1], dtype=np.int64)
    scan = RegionScan.from_packed(arrays, 0, 0, 1_000_000)
    assert scan is not None and scan.n_records == 1


def test_cram_dataprep_loaders_match_python_engine(tmp_path):
    """load_region_events / load_region_counts over CRAM via the handle
    scans == the Python events engine (same candidate/tensor events,
    same counts matrix)."""
    import clair_tpu.pipeline.call_bam as cb
    from clair_tpu.io.bai import build_bai
    from clair_tpu.io.cram import bam_to_cram
    from clair_tpu.io.fasta import FastaReader
    from clair_tpu.utils.simulate import (
        ErrorProfile, plant_variants, random_reference, simulate_bam,
        write_fasta,
    )
    from tests.test_native import _sort_events

    rs = np.random.RandomState(41)
    ref = random_reference(rs, 9_000)
    variants = plant_variants(rs, ref, n_variants=9, spacing=600)
    bam = str(tmp_path / "d.bam")
    fa = str(tmp_path / "d.fa")
    cram = str(tmp_path / "d.cram")
    simulate_bam(bam, ref, variants, rs, coverage=20,
                 error_profile=ErrorProfile(mismatch=0.04, insertion=0.02,
                                            deletion=0.02))
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    bam_to_cram(bam, cram, fa)

    fasta = FastaReader(fa)
    probe = cb._cram_packed_scan(cram, fasta, "chr1", 0, 9_000, 0)
    assert probe is not None and probe.n_records > 0  # bridge engaged
    probe.close()
    args = (cram, "chr1", 0, 9_000, 0, 144)
    fast_cand, fast_tens = cb.load_region_events(*args, fasta=fasta)
    fast_counts, fast_tens2 = cb.load_region_counts(
        *args, region_start=0, region_length=9_000, fasta=fasta
    )
    orig = cb._cram_packed_scan
    cb._cram_packed_scan = lambda *a, **kw: None
    try:
        slow_cand, slow_tens = cb.load_region_events(*args, fasta=fasta)
        slow_counts, _ = cb.load_region_counts(
            *args, region_start=0, region_length=9_000, fasta=fasta
        )
    finally:
        cb._cram_packed_scan = orig

    assert fast_cand.match_pos.size > 0
    for got, want in ((fast_cand, slow_cand), (fast_tens, slow_tens)):
        for a, b in zip(_sort_events(got), _sort_events(want)):
            assert np.array_equal(a, b)
    assert np.array_equal(fast_counts, slow_counts)
    assert np.array_equal(
        np.sort(fast_tens2.match_pos), np.sort(fast_tens.match_pos)
    )


def test_fetch_packed_multi_slice_concat(tmp_path):
    """fetch_packed over a CRAM written with tiny slices (forcing many
    containers) rebases offsets correctly: the concatenated payload
    decodes to the same records as fetch()."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.io.cram import CramReader, bam_to_cram
    from clair_tpu.native import RegionScan
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    rs = np.random.RandomState(61)
    ref = random_reference(rs, 5_000)
    variants = plant_variants(rs, ref, n_variants=5, spacing=600)
    bam = str(tmp_path / "m.bam")
    fa = str(tmp_path / "m.fa")
    cram = str(tmp_path / "m.cram")
    simulate_bam(bam, ref, variants, rs, coverage=12)
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    bam_to_cram(bam, cram, fa, records_per_slice=64)  # many containers

    with CramReader(cram, fasta=fa) as reader:
        packed = reader.fetch_packed("chr1", 0, 5_000)
        records = list(reader.fetch("chr1", 0, 5_000))
    assert packed is not None
    # the packed arrays span > 1 slice part (offsets were rebased)
    n = len(packed["pos"])
    assert n > 64
    # record-level parity with fetch()
    assert n == len(records)
    assert np.array_equal(packed["pos"], [r.pos for r in records])
    for i, r in enumerate(records):
        c0, c1 = int(packed["cig_off"][i]), int(packed["cig_off"][i + 1])
        assert np.array_equal(packed["cig_ops"][c0:c1], r.cigar_ops)
        s0, s1 = int(packed["seq_off"][i]), int(packed["seq_off"][i + 1])
        assert np.array_equal(packed["seq"][s0:s1], r.seq)
    scan = RegionScan.from_packed(packed, 0, 0, 5_000)
    assert scan is not None and scan.n_records == n
    scan.close()


def test_forged_ref_len_in_spec_cannot_widen_the_window(tmp_path):
    """The spec blob carries file-derived (hostile) fields next to the
    ref-window geometry; the decoder must size its reference window from
    the caller's actual buffer, never the blob (fuzz regression: a forged
    ref_buf_len moved every bounds check past the real allocation and
    fill_to's memcpy read out of bounds)."""
    import struct

    cram_path, fasta_path, _ = _build_cram(tmp_path, _mixed_records())

    captured = []
    orig = native.cram_decode_slice

    def capture(spec, core, externals, ref_buf):
        captured.append((bytes(spec), bytes(core),
                         [(c, bytes(d)) for c, d in externals],
                         bytes(ref_buf)))
        return orig(spec, core, externals, ref_buf)

    native.cram_decode_slice = capture
    try:
        with CramReader(cram_path, fasta=fasta_path) as reader:
            baseline = list(reader)
    finally:
        native.cram_decode_slice = orig
    assert baseline and captured

    spec, core, externals, ref_buf = captured[0]
    # head: <IBiqqqqq -> magic(4) flags(1) ref_seq_id(4) start(8)
    # n_records(8) ref_buf_start(8) ref_buf_len(8) contig_len(8)
    forged = bytearray(spec)
    struct.pack_into("<q", forged, 4 + 1 + 4 + 8 + 8 + 8, 1 << 40)
    rc, payload = orig(bytes(forged), core, externals, ref_buf)
    # clamped to the real buffer: the decode behaves exactly as unforged
    rc0, payload0 = orig(spec, core, externals, ref_buf)
    assert rc == rc0
    if rc == 0:
        assert np.array_equal(payload["pos"], payload0["pos"])
        assert np.array_equal(payload["seq"], payload0["seq"])


def test_forged_window_geometry_fields_fail_cleanly(tmp_path):
    """ref_buf_start and contig_len are as file-derived (hostile) as the
    ref_buf_len the decoder already distrusts: a negative or near-
    INT64_MAX value must not wrap the window bounds checks (the additive
    `start + len` forms were UB) — any rc is acceptable, but never a
    crash or an out-of-bounds window."""
    import struct

    cram_path, fasta_path, _ = _build_cram(tmp_path, _mixed_records())

    captured = []
    orig = native.cram_decode_slice

    def capture(spec, core, externals, ref_buf):
        captured.append((bytes(spec), bytes(core),
                         [(c, bytes(d)) for c, d in externals],
                         bytes(ref_buf)))
        return orig(spec, core, externals, ref_buf)

    native.cram_decode_slice = capture
    try:
        with CramReader(cram_path, fasta=fasta_path) as reader:
            list(reader)
    finally:
        native.cram_decode_slice = orig
    assert captured

    spec, core, externals, ref_buf = captured[0]
    off_start = 4 + 1 + 4 + 8 + 8          # ref_buf_start
    off_contig = 4 + 1 + 4 + 8 + 8 + 8 + 8  # contig_len
    for offset, value in [
        (off_start, -1), (off_start, -(1 << 62)),
        (off_start, (1 << 63) - 2), (off_contig, (1 << 63) - 2),
        (off_contig, -(1 << 62)),
    ]:
        forged = bytearray(spec)
        struct.pack_into("<q", forged, offset, value)
        native.cram_decode_slice(bytes(forged), core, externals, ref_buf)


def test_from_packed_rejects_seq_cigar_mismatch():
    """The scans index the synthesized record's seq by cumulative query-
    consumed cigar length; a packed record whose cigar consumes more
    query bases than its seq span would read past the seq blob (the
    check_record gate covers only BGZF walks). from_packed must return
    None so callers fall back to the Python engine."""
    from clair_tpu.native import RegionScan, available

    if not available():
        pytest.skip("native lib unavailable")
    arrays = {
        "pos": np.array([100], dtype=np.int64),
        "mapq": np.array([60], dtype=np.int32),
        "flag": np.array([0], dtype=np.int32),
        "refid": np.array([0], dtype=np.int32),
        "seq": np.frombuffer(b"A" * 100, dtype=np.uint8),
        "seq_off": np.array([0, 100], dtype=np.int64),
        "cig_ops": np.zeros(1, dtype=np.uint8),      # 200M over 100 bases
        "cig_lens": np.array([200], dtype=np.int32),
        "cig_off": np.array([0, 1], dtype=np.int64),
    }
    assert RegionScan.from_packed(arrays, 0, 0, 1_000_000) is None
    # an op code past X (no defined query/ref semantics) is also rejected
    arrays["cig_ops"] = np.full(1, 9, dtype=np.uint8)
    arrays["cig_lens"] = np.array([100], dtype=np.int32)
    assert RegionScan.from_packed(arrays, 0, 0, 1_000_000) is None
    # the consistent sibling opens
    arrays["cig_ops"] = np.zeros(1, dtype=np.uint8)
    scan = RegionScan.from_packed(arrays, 0, 0, 1_000_000)
    assert scan is not None and scan.n_records == 1
