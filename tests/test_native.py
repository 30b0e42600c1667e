"""Native C++ event engine: equivalence against the Python/numpy path."""

import os

import numpy as np
import pytest

from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.data.pileup import (
    apply_depth_cap,
    create_tensors,
    events_from_reads,
    soft_clip_fraction_ok,
)
from clair_tpu.native import available, events_from_bam_native

REF = ("ACGT" * 60)[:200]

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


def _sort_events(e):
    """Canonical ordering for comparison (engines may order reads equally but
    events within a read are sequential in both)."""
    def key(*arrays):
        return np.lexsort(arrays[::-1])

    m = key(e.match_pos, e.match_qcol, e.match_strand)
    i = key(e.ins_pos, e.ins_adv, e.ins_qcol, e.ins_strand)
    d = key(e.del_pos, e.del_strand)
    return (
        e.match_pos[m], e.match_qcol[m], e.match_strand[m],
        e.ins_pos[i], e.ins_adv[i], e.ins_qcol[i], e.ins_strand[i],
        e.del_pos[d], e.del_strand[d],
        np.sort(e.ins_op_pos), np.sort(e.del_op_pos),
    )


def test_native_events_match_python(tmp_path):
    rs = np.random.RandomState(3)
    path = str(tmp_path / "t.bam")
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        reads = []
        for i in range(60):
            pos = int(rs.randint(0, 150))
            m1 = int(rs.randint(10, 25))
            cigar = [(m1, "M")]
            seq = REF[pos:pos + m1]
            r = rs.rand()
            refp = pos + m1
            if r < 0.3:
                cigar.append((2, "I"))
                seq += "GT"
            elif r < 0.5 and refp + 2 < len(REF):
                cigar.append((3, "D"))
                refp += 3
            m2 = min(int(rs.randint(5, 15)), len(REF) - refp)
            if m2 > 0:
                cigar.append((m2, "M"))
                seq += REF[refp:refp + m2]
            flag = 16 if rs.rand() < 0.5 else 0
            reads.append((f"r{i}", pos, flag, cigar, seq))
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            writer.write(name, 0, pos, 60, flag, cigar, seq)

    with BamReader(path) as reader:
        records = list(reader.fetch("chr1"))
    python_events = events_from_reads(records)
    native_events = events_from_bam_native(path, ref_id=0)

    for a, b in zip(_sort_events(python_events), _sort_events(native_events)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the downstream tensors agree
    centers = np.array([60, 100], dtype=np.int64)
    t_py, k_py, s_py = create_tensors(python_events, centers, REF, 0)
    t_na, k_na, s_na = create_tensors(native_events, centers, REF, 0)
    np.testing.assert_array_equal(t_py, t_na)
    assert s_py == s_na


def test_native_filters_match_python(tmp_path):
    path = str(tmp_path / "t.bam")
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        writer.write("ok", 0, 10, 60, 0, [(40, "M")], REF[10:50])
        writer.write("lowmq", 0, 12, 5, 0, [(40, "M")], REF[12:52])
        writer.write("clip", 0, 14, 60, 0, [(60, "S"), (40, "M")], "A" * 60 + REF[14:54])
        writer.write("sup", 0, 16, 60, 2048, [(40, "M")], REF[16:56])

    native_events = events_from_bam_native(
        path, ref_id=0, min_mapq=10, softclip_filter=True
    )
    with BamReader(path) as reader:
        records = [
            r for r in reader.fetch("chr1", min_mapq=10) if soft_clip_fraction_ok(r)
        ]
    python_events = events_from_reads(records)
    assert native_events.match_pos.shape == python_events.match_pos.shape
    np.testing.assert_array_equal(
        np.sort(native_events.match_pos), np.sort(python_events.match_pos)
    )


def test_scan_window_counts_match_python(tmp_path):
    """The native window scan's candidate count matrix must equal the
    Python pileup_counts over soft-clip-filtered events."""
    import numpy as np

    from clair_tpu import native
    from clair_tpu.data.pileup import (
        events_from_reads,
        pileup_counts,
        soft_clip_fraction_ok,
    )
    from clair_tpu.io.bam import BamReader
    from clair_tpu.utils.simulate import (
        ONT_R94,
        plant_variants,
        random_reference,
        simulate_bam,
    )

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rs = np.random.RandomState(8)
    reference = random_reference(rs, 5000)
    variants = plant_variants(rs, reference, n_variants=12, spacing=300)
    bam = str(tmp_path / "s.bam")
    simulate_bam(bam, reference, variants, rs, coverage=20,
                 read_length=300, error_profile=ONT_R94)

    region_start, region_length = 100, 4500
    counts, tensor_events = native.scan_window_native(
        bam, 0, region_start, region_start + region_length,
        region_start, region_length, dcov=250, use_index=False,
    )

    with BamReader(bam) as reader:
        records = list(reader.fetch("chr1", region_start, region_start + region_length))
    expected = pileup_counts(
        events_from_reads([r for r in records if soft_clip_fraction_ok(r)]),
        region_start, region_length,
    )
    np.testing.assert_array_equal(counts, expected)
    assert tensor_events.match_pos.size > 0


def test_region_scan_tensors_match_python(tmp_path):
    """The fully-native path (RegionScan counts + window tensors) must
    byte-match the Python engine: same candidate counts, same tensors,
    same indel op/base arrays for allele recovery."""
    import numpy as np
    import pytest

    from clair_tpu import native
    from clair_tpu.data.pileup import (
        apply_depth_cap,
        create_tensors,
        events_from_reads,
        pileup_counts,
        soft_clip_fraction_ok,
    )
    from clair_tpu.io.bam import BamReader
    from clair_tpu.utils.simulate import (
        ONT_R94,
        plant_variants,
        random_reference,
        simulate_bam,
    )

    if not native.available():
        pytest.skip("native library unavailable")

    rs = np.random.RandomState(13)
    reference = random_reference(rs, 6000)
    variants = plant_variants(rs, reference, n_variants=15, spacing=250)
    bam = str(tmp_path / "s.bam")
    simulate_bam(bam, reference, variants, rs, coverage=25,
                 read_length=400, error_profile=ONT_R94)

    region_start, region_length = 50, 5800
    scan = native.RegionScan(bam, 0, region_start, region_start + region_length,
                             use_index=False)
    counts = scan.counts(region_start, region_length)

    with BamReader(bam) as reader:
        records = list(reader.fetch("chr1", region_start, region_start + region_length))
    expected_counts = pileup_counts(
        events_from_reads([r for r in records if soft_clip_fraction_ok(r)]),
        region_start, region_length,
    )
    np.testing.assert_array_equal(counts, expected_counts)

    centers = np.array(sorted(v.position for v in variants), dtype=np.int64)
    tensors_native, indel_events = scan.tensors(centers, reference, 0, dcov=250)
    scan.close()

    tensors_py, kept_py, _ = create_tensors(
        events_from_reads(apply_depth_cap(records, 250)),
        centers, reference, 0, minimum_coverage=0,
    )
    # python path filters at finalize; compare pre-filter by re-finalizing
    from clair_tpu.data.pileup import finalize_window_tensors

    ref_raw = np.frombuffer(reference.encode("ascii"), dtype=np.uint8)
    tensors_nat_f, kept_nat, _ = finalize_window_tensors(
        tensors_native.astype(np.float32), centers, ref_raw, 0, 0
    )
    np.testing.assert_array_equal(kept_nat, kept_py)
    np.testing.assert_array_equal(tensors_nat_f, tensors_py)

    # indel arrays power allele recovery: ops must match the python events
    expected_events = events_from_reads(apply_depth_cap(records, 250))
    np.testing.assert_array_equal(indel_events.ins_op_pos, expected_events.ins_op_pos)
    np.testing.assert_array_equal(indel_events.ins_op_len, expected_events.ins_op_len)
    np.testing.assert_array_equal(indel_events.del_op_pos, expected_events.del_op_pos)
    np.testing.assert_array_equal(indel_events.del_op_len, expected_events.del_op_len)
    np.testing.assert_array_equal(indel_events.ins_qcol, expected_events.ins_qcol)


def test_corrupt_library_rebuilds_or_falls_back(tmp_path, monkeypatch):
    """A vendored .so that fails to load (wrong arch / truncated) must be
    rebuilt from source, not crash the import chain."""
    import shutil

    from clair_tpu import native as nat

    src_dir = os.path.dirname(nat.__file__)
    work = tmp_path / "native"
    shutil.copytree(src_dir, work)
    bad = work / "libclair_native.so"
    bad.write_bytes(b"not an elf file")
    monkeypatch.setattr(nat, "_LIB_PATH", str(bad))
    monkeypatch.setattr(nat, "_DIR", str(work))
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_build_failed", False)

    def rebuild():
        import subprocess

        subprocess.run(["make", "-C", str(work), "libclair_native.so"],
                       check=True, capture_output=True, timeout=120)
        return bad.is_file()

    monkeypatch.setattr(nat, "_build", rebuild)
    lib = nat.load_library()
    assert lib is not None  # rebuilt from source and loaded
    monkeypatch.setattr(nat, "_lib", None)


def test_select_candidates_native_matches_numpy():
    """clair_select_candidates == the numpy filter, including the stable
    A,C,G,T,I,D,N argmax tie order, zero-depth rows, position masks, and
    IUPAC/lowercase/unknown reference bytes."""
    import clair_tpu.native as native_mod
    from clair_tpu.data import pileup

    rs = np.random.RandomState(11)
    n = 20_000
    counts = rs.randint(0, 25, size=(n, 7)).astype(np.int32)
    counts[::7, :] = 5          # full seven-way ties
    counts[::11, :] = 0         # zero depth
    ref = "".join(rs.choice(list("ACGTNRYKacgtnX*"), size=n + 200))
    mask = rs.rand(n) > 0.15

    for position_mask in (None, mask):
        got = pileup.select_candidates(
            counts, ref, 500, 400, 0.2, 4, position_mask=position_mask
        )
        orig = native_mod.select_candidates_native
        native_mod.select_candidates_native = lambda *a, **kw: None
        try:
            want = pileup.select_candidates(
                counts, ref, 500, 400, 0.2, 4, position_mask=position_mask
            )
        finally:
            native_mod.select_candidates_native = orig
        assert np.array_equal(got.positions, want.positions)
        assert np.array_equal(got.depths, want.depths)
        assert np.array_equal(got.counts, want.counts)
        assert got.reference_bases == want.reference_bases
        assert len(want.positions) > 0


def test_finalize_windows_native_matches_numpy():
    """clair_finalize_windows == finalize_window_tensors + astype(float32)
    + normalize_channels, including edge-of-reference drops and the
    center-coverage filter."""
    from clair_tpu.native import finalize_windows_native
    from clair_tpu.data.pileup import finalize_window_tensors
    from clair_tpu.data.tensor_stream import normalize_channels

    rs = np.random.RandomState(12)
    n = 300
    ref = "".join(rs.choice(list("ACGT"), size=1500))
    ref_bytes = ref.encode("ascii")
    ref_raw = np.frombuffer(ref_bytes, dtype=np.uint8)
    ref_seq_start = 50
    centers = np.sort(
        rs.choice(np.arange(40, 1650), size=n, replace=False)
    ).astype(np.int64)
    tensors = rs.randint(0, 60, size=(n, 33, 8, 4)).astype(np.int32)
    tensors[::9] = 0  # zero center depth

    for minimum_coverage in (0, 4):
        got = finalize_windows_native(
            tensors, centers, ref_bytes, ref_seq_start,
            minimum_coverage=minimum_coverage,
        )
        want_t, want_c, want_s = finalize_window_tensors(
            tensors.astype(np.float32), centers, ref_raw, ref_seq_start,
            minimum_coverage=minimum_coverage,
        )
        normalize_channels(want_t)
        assert got[0].dtype == np.float32
        assert np.array_equal(got[0], want_t)
        assert np.array_equal(got[1], want_c)
        assert got[2] == want_s
        assert 0 < len(want_c) < n  # both filters actually fired


def test_fused_open_counts_matches_counts_pass(tmp_path):
    """RegionScan(counts_region=...) accumulates the same candidate counts
    during the open walk as the standalone counts pass, and a counts()
    call for a different range still runs the real pass."""
    from clair_tpu.io.bai import build_bai
    from clair_tpu.native import RegionScan
    from clair_tpu.utils.simulate import (
        ErrorProfile, plant_variants, random_reference, simulate_bam,
    )

    rs = np.random.RandomState(21)
    ref = random_reference(rs, 8_000)
    variants = plant_variants(rs, ref, n_variants=12, spacing=400)
    bam = str(tmp_path / "fused.bam")
    simulate_bam(bam, ref, variants, rs, coverage=20,
                 error_profile=ErrorProfile(mismatch=0.03, insertion=0.01,
                                            deletion=0.01))
    build_bai(bam, bam + ".bai")

    plain = RegionScan(bam, 0, 0, 8_000)
    fused = RegionScan(bam, 0, 0, 8_000, counts_region=(0, 8_000))
    assert plain.n_records == fused.n_records
    assert np.array_equal(plain.counts(0, 8_000), fused.counts(0, 8_000))
    assert np.array_equal(plain.counts(100, 500), fused.counts(100, 500))


def test_packed_sequences_list_equality():
    """PackedSequences compares equal to a list of the same window
    strings in both directions, to another PackedSequences with the same
    bytes, and unequal otherwise — the contract the native-vs-Python
    engine equivalence guards rely on."""
    from clair_tpu.data.tensor_stream import PackedSequences

    rs = np.random.RandomState(3)
    packed = rs.choice(np.frombuffer(b"ACGT", np.uint8), size=(5, 33))
    ps = PackedSequences(packed.astype(np.uint8))
    as_list = [packed[i].tobytes().decode("ascii") for i in range(5)]

    assert ps == as_list
    assert as_list == ps
    assert ps == PackedSequences(packed.copy())
    assert not (ps != as_list)
    assert ps != as_list[:-1]
    assert ps != as_list[:-1] + ["G" * 33]
    assert (ps == 7) is False and (ps != 7) is True
