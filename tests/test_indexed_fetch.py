"""Python BamReader indexed fetch equals streaming fetch."""

from clair_tpu.io.bai import build_bai
from clair_tpu.io.bam import BamReader, BamWriter

REF = ("ACGT" * 3000)[:12000]


def test_indexed_fetch_matches_stream(tmp_path):
    path = str(tmp_path / "s.bam")
    positions = sorted((i * 13) % (len(REF) - 160) for i in range(2000))
    with BamWriter(path, [("chr1", len(REF))]) as writer:
        for i, pos in enumerate(positions):
            writer.write(f"r{i:05d}", 0, pos, 60, 0, [(100, "M")], REF[pos:pos + 100])
    build_bai(path)

    with BamReader(path) as reader:
        streamed = [
            (r.read_name, r.pos)
            for r in reader.fetch("chr1", 7000, 9000, use_index=False)
        ]
    with BamReader(path) as reader:
        indexed = [
            (r.read_name, r.pos)
            for r in reader.fetch("chr1", 7000, 9000, use_index=True)
        ]
    assert streamed and indexed == streamed
