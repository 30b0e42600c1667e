"""Long-indel (boundary class >= 16) allele recovery through the event
index — the path the reference serves with pysam re-pileups."""

import io

import numpy as np

from clair_tpu.io.bam import BamWriter
from clair_tpu.io.fasta import build_fai
from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
from clair_tpu.task.genotype import Genotype
from clair_tpu.task.gt21 import GT21

INS_SEQ = "ACGTACGTACGTACGTACGT"  # 20 bp, beyond the 16-class boundary


class LongInsPredictor:
    """Every site: confident hom insertion with length class +16 (the
    'needs inference' boundary)."""

    batch_size = 16

    def predict_async(self, x):
        n = len(x)
        gt21 = np.full((n, 21), 1e-5, np.float32)
        gt21[:, GT21.InsIns] = 1.0
        geno = np.full((n, 3), 1e-4, np.float32)
        geno[:, Genotype.homo_variant] = 1.0
        vl = np.full((n, 33), 1e-6, np.float32)
        vl[:, 16 + 16] = 1.0
        for a in (gt21, geno, vl):
            a /= a.sum(-1, keepdims=True)
        return (gt21, geno, vl, vl), n

    def gather(self, out, n):
        return [a[:n] for a in out]


def test_long_insertion_recovered_from_events(tmp_path):
    rs = np.random.RandomState(5)
    reference = "".join(rs.choice(list("ACGT"), 800))
    fasta_path = tmp_path / "ref.fa"
    with open(fasta_path, "w") as fh:
        fh.write(">chr1\n")
        for off in range(0, len(reference), 60):
            fh.write(reference[off:off + 60] + "\n")
    build_fai(str(fasta_path))

    # 20 reads, all carrying a 20bp insertion after 0-based 400
    bam_path = tmp_path / "s.bam"
    with BamWriter(str(bam_path), [("chr1", len(reference))]) as writer:
        for i in range(20):
            start = 320 + i * 4
            split = 401 - start
            seq = reference[start:start + split] + INS_SEQ + reference[start + split:start + 120]
            cigar = [(split, "M"), (len(INS_SEQ), "I"), (120 - split, "M")]
            writer.write(f"r{i}", 0, start, 60, 0, cigar, seq)

    out = io.StringIO()
    config = CallBamConfig(
        bam_path=str(bam_path), fasta_path=str(fasta_path), contig="chr1",
        ctg_start=380, ctg_end=420, minimum_af=0.2, minimum_coverage=4,
    )
    call_bam(config, LongInsPredictor(), output_fh=out)
    rows = [r.split("\t") for r in out.getvalue().splitlines() if not r.startswith("#")]
    by_pos = {int(r[1]): r for r in rows}
    assert 401 in by_pos, sorted(by_pos)
    # the full 20bp allele must come back from the event index
    assert by_pos[401][4] == reference[400] + INS_SEQ
    assert by_pos[401][9].startswith("1/1")
