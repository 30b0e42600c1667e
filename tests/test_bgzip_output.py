"""``.vcf.gz`` output: a ``.gz`` suffix on the calling outputs writes
spec-compliant BGZF and builds a tabix index in one step (the reference
leaves compression/indexing to the user's bgzip+tabix; here the framework
owns the BGZF/TBI layers, so the suffix is enough)."""

import gzip
import os
import zlib

import numpy as np
import pytest

from clair_tpu.io.bgzf import block_offsets
from clair_tpu.io.tbi import (
    BGZF_EOF,
    BgzfTextWriter,
    TbiIndex,
    bgzip_file,
    build_tbi,
    indexed_vcf_lines,
)


def _read_bgzf_text(path):
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw.endswith(BGZF_EOF)
    parts = [
        zlib.decompress(raw[off:off + size], 15 + 16)
        for off, size in block_offsets(raw)
    ]
    return b"".join(parts).decode()


def test_bgzf_text_writer_roundtrip(tmp_path):
    path = str(tmp_path / "t.gz")
    lines = [f"line {i} " + "x" * 97 + "\n" for i in range(3000)]
    with BgzfTextWriter(path) as out:
        for line in lines:
            out.write(line)
    text = _read_bgzf_text(path)
    assert text == "".join(lines)
    # multiple members were emitted (payload >> one block)
    assert len(list(block_offsets(open(path, "rb").read()))) > 2
    # stdlib gzip accepts the multi-member stream too
    with gzip.open(path, "rt") as fh:
        assert fh.read() == "".join(lines)


def test_bgzip_file_matches_source(tmp_path):
    src = str(tmp_path / "a.txt")
    payload = "".join(f"{i}\tabc\n" for i in range(50_000))
    with open(src, "w") as fh:
        fh.write(payload)
    dst = bgzip_file(src, remove_src=False)
    assert _read_bgzf_text(dst) == payload
    assert os.path.isfile(src)
    dst2 = bgzip_file(src, str(tmp_path / "b.gz"), remove_src=True)
    assert _read_bgzf_text(dst2) == payload
    assert not os.path.isfile(src)


@pytest.fixture(scope="module")
def tiny_genome(tmp_path_factory):
    from clair_tpu.io.bai import build_bai
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    tmp = tmp_path_factory.mktemp("bgz")
    rs = np.random.RandomState(11)
    ref = random_reference(rs, 6_000)
    variants = plant_variants(rs, ref, n_variants=10, spacing=450)
    bam = str(tmp / "g.bam")
    fa = str(tmp / "g.fa")
    simulate_bam(bam, ref, variants, rs, coverage=30)
    write_fasta(fa, ref)
    build_bai(bam, bam + ".bai")
    return bam, fa, ref, variants


def test_call_bam_gz_output_matches_plain(tiny_genome, tmp_path):
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam

    bam, fa, ref, variants = tiny_genome
    config = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )
    plain = str(tmp_path / "out.vcf")
    gz = str(tmp_path / "out.vcf.gz")
    call_bam(config, OraclePredictor(), output_path=plain)
    call_bam(config, OraclePredictor(), output_path=gz)

    assert _read_bgzf_text(gz) == open(plain).read()
    assert os.path.isfile(gz + ".tbi")
    # the index actually resolves a windowed fetch
    rows = [l for l in open(plain) if not l.startswith("#")]
    assert rows
    first_pos = int(rows[0].split("\t")[1])
    it = indexed_vcf_lines(gz, "chr1", max(0, first_pos - 1))
    assert it is not None
    fetched = [l for l in it if not l.startswith("#")]
    assert fetched[0] == rows[0].rstrip("\n")


def test_threaded_runner_gz_output(tiny_genome, tmp_path):
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded

    bam, fa, ref, variants = tiny_genome
    base = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )
    gz = str(tmp_path / "w.vcf.gz")
    call_bam_windows_threaded(
        base, OraclePredictor(), output_path=gz,
        chunk_size=2_000, pileup_workers=2,
    )
    # the plain stream was compressed, indexed, and removed
    assert os.path.isfile(gz)
    assert os.path.isfile(gz + ".tbi")
    assert not os.path.isfile(gz[:-3])
    text = _read_bgzf_text(gz)
    assert text.startswith("##fileformat=VCF")
    assert any(not l.startswith("#") for l in text.splitlines())
    index = TbiIndex(gz + ".tbi")
    assert "chr1" in index.names


def test_threaded_runner_gz_resume_noop(tiny_genome, tmp_path):
    """A resume re-run after a clean compressed run must not clobber the
    finished .gz with a header-only file."""
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded

    bam, fa, ref, variants = tiny_genome
    base = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )
    gz = str(tmp_path / "r.vcf.gz")
    joblog = str(tmp_path / "r.joblog")
    kwargs = dict(output_path=gz, chunk_size=2_000, joblog_path=joblog)
    call_bam_windows_threaded(base, OraclePredictor(), **kwargs)
    before = open(gz, "rb").read()
    total = call_bam_windows_threaded(
        base, OraclePredictor(), resume=True, **kwargs
    )
    assert total == 0
    assert open(gz, "rb").read() == before


def test_merge_vcfs_gz(tmp_path):
    from clair_tpu.pipeline.call_bam_parallel import merge_vcfs

    a = str(tmp_path / "a.vcf")
    b = str(tmp_path / "b.vcf")
    with open(a, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tline\nchr1\t5\t.\tA\tC\t.\t.\t.\n")
    with open(b, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tline\nchr1\t9\t.\tG\tT\t.\t.\t.\n")
    plain = str(tmp_path / "m.vcf")
    gz = str(tmp_path / "m.vcf.gz")
    merge_vcfs([a, b], plain)
    merge_vcfs([a, b], gz)
    assert _read_bgzf_text(gz) == open(plain).read()
    assert os.path.isfile(gz + ".tbi")


def test_sort_vcf_file_orders_by_contig_then_pos(tmp_path):
    from clair_tpu.pipeline.call_bam_parallel import _sort_vcf_file

    path = str(tmp_path / "u.vcf")
    header = ("##fileformat=VCFv4.2\n"
              "##contig=<ID=chr2,length=1000>\n"
              "##contig=<ID=chr1,length=1000>\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    rows = [
        "chr1\t500\t.\tA\tT\t60\tPASS\t.\tGT\t0/1\n",
        "chr2\t100\t.\tC\tG\t60\tPASS\t.\tGT\t0/1\n",
        "chr1\t30\t.\tG\tC\t60\tPASS\t.\tGT\t0/1\n",  # resumed append
        "chr2\t700\t.\tT\tA\t60\tPASS\t.\tGT\t0/1\n",
    ]
    with open(path, "w") as fh:
        fh.write(header + "".join(rows))
    _sort_vcf_file(path)
    lines = open(path).read().splitlines()
    assert lines[:4] == header.splitlines()
    body = [l.split("\t")[:2] for l in lines[4:]]
    # header contig order (chr2 first), then POS numerically
    assert body == [["chr2", "100"], ["chr2", "700"],
                    ["chr1", "30"], ["chr1", "500"]]


def test_threaded_runner_gz_resume_sorts_appended_rows(tiny_genome, tmp_path):
    """Retried windows append AFTER later-coordinate rows; the gz path
    must re-sort before compressing, or the tabix index over the
    unsorted stream would silently misresolve queries."""
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded

    bam, fa, ref, variants = tiny_genome
    base = CallBamConfig(
        bam_path=bam, fasta_path=fa, contig="chr1",
        minimum_af=0.2, minimum_coverage=4,
    )

    class FailFirstWindow:
        """Delegates to the oracle but fails the first window seen."""

        def __init__(self):
            self._inner = OraclePredictor()
            self._failed = False

        def predict_async(self, x):
            if not self._failed:
                self._failed = True
                raise RuntimeError("injected window failure")
            return self._inner.predict_async(x)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    gz = str(tmp_path / "s.vcf.gz")
    joblog = str(tmp_path / "s.joblog")
    kwargs = dict(output_path=gz, chunk_size=2_000, joblog_path=joblog)
    call_bam_windows_threaded(base, FailFirstWindow(), **kwargs)
    assert not os.path.isfile(gz)  # left plain for --resume
    call_bam_windows_threaded(base, OraclePredictor(), resume=True, **kwargs)
    assert os.path.isfile(gz) and os.path.isfile(gz + ".tbi")
    body = [l for l in _read_bgzf_text(gz).splitlines()
            if l and not l.startswith("#")]
    positions = [int(l.split("\t")[1]) for l in body]
    assert positions and positions == sorted(positions)
