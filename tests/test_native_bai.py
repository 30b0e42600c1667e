"""Native BAI builder must be byte-identical to the Python builder."""

import numpy as np
import pytest

from clair_tpu.io.bai import BaiIndex, build_bai
from clair_tpu.io.bam import BamReader, BamWriter
from clair_tpu.native import available, build_bai_native

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")

REF = ("ACGT" * 4000)[:16000]


def _sorted_bam(tmp_path, n=2500):
    path = str(tmp_path / "s.bam")
    positions = sorted((i * 13) % (len(REF) - 200) for i in range(n))
    with BamWriter(path, [("chr1", len(REF)), ("chr2", 5000)]) as writer:
        for i, pos in enumerate(positions):
            cigar = [(120, "M")] if i % 4 else [(60, "M"), (5, "D"), (60, "M")]
            seq = REF[pos:pos + 120]
            writer.write(f"r{i:05d}", 0, pos, 60, 0, cigar, seq)
        # a couple of reads on the second contig
        writer.write("c2a", 1, 100, 60, 0, [(50, "M")], REF[:50])
        writer.write("c2b", 1, 900, 60, 0, [(50, "M")], REF[:50])
    return path


def test_native_bai_matches_python(tmp_path):
    path = _sorted_bam(tmp_path)
    py_path = str(tmp_path / "py.bai")
    na_path = str(tmp_path / "na.bai")
    build_bai(path, py_path, prefer_native=False)
    assert build_bai_native(path, na_path)
    py_bytes = open(py_path, "rb").read()
    na_bytes = open(na_path, "rb").read()
    assert py_bytes == na_bytes

    # and the index actually drives indexed fetch
    import shutil

    shutil.copy(na_path, path + ".bai")
    with BamReader(path) as reader:
        streamed = [r.read_name for r in reader.fetch("chr1", 9000, 10000, use_index=False)]
    with BamReader(path) as reader:
        indexed = [r.read_name for r in reader.fetch("chr1", 9000, 10000, use_index=True)]
    assert streamed and indexed == streamed

    index = BaiIndex(na_path)
    assert index.min_virtual_offset(1, 0) is not None  # second contig indexed
