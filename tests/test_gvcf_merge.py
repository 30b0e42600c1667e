"""gVCF consumer validation: the GLnexus-style joint genotyper
(post/gvcf_merge.py) consumes this framework's own gVCF output end to
end. This is the merge-readiness proof the gVCF writer needs — if blocks
left gaps or overlapped, reference filling would visibly degrade to
'./.' (missing) or double-covered positions."""

import io

import numpy as np
import pytest

from clair_tpu.post.gvcf_merge import (
    GvcfSample,
    merge_gvcfs,
    parse_gvcf,
)


def _make_gvcf_text(rows):
    head = (
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    )
    return head + "".join(r + "\n" for r in rows)


def test_parse_gvcf_blocks_and_variants():
    text = _make_gvcf_text([
        "chr1\t1\t.\tA\t<NON_REF>\t0\t.\tEND=99\tGT:GQ:MIN_DP:PL\t0/0:50:28:0,50,100",
        "chr1\t100\t.\tC\tT,<NON_REF>\t75\t.\t.\tGT:GQ:DP:PL\t0/1:75:30:75,0,75,75,75,75",
        "chr1\t101\t.\tG\t<NON_REF>\t0\t.\tEND=200\tGT:GQ:MIN_DP:PL\t0/0:40:25:0,40,80",
    ])
    s = parse_gvcf(io.StringIO(text))
    assert s.name == "S"
    assert [
        (b.position, b.end, b.gq, b.min_dp) for b in s.blocks["chr1"]
    ] == [(1, 99, 50, 28), (101, 200, 40, 25)]
    v = s.variants["chr1"][0]
    assert (v.position, v.reference, v.alternates) == (100, "C", ["T"])
    assert v.genotype == (0, 1) and v.gq == 75 and v.depth == 30
    # block + variant coverage tiles the contig: coverage_at everywhere
    assert s.coverage_at("chr1", 1) == (50, 28)
    assert s.coverage_at("chr1", 100) == (75, 30)   # variant REF span
    assert s.coverage_at("chr1", 200) == (40, 25)
    assert s.coverage_at("chr1", 201) is None


def test_merge_two_hand_written_samples():
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t1\t.\tA\t<NON_REF>\t0\t.\tEND=99\tGT:GQ:MIN_DP:PL\t0/0:45:20:.",
        "chr1\t100\t.\tC\tT,<NON_REF>\t80\t.\t.\tGT:GQ:DP:PL\t0/1:80:33:.",
        "chr1\t101\t.\tG\t<NON_REF>\t0\t.\tEND=300\tGT:GQ:MIN_DP:PL\t0/0:50:31:.",
    ])), name="A")
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t1\t.\tA\t<NON_REF>\t0\t.\tEND=199\tGT:GQ:MIN_DP:PL\t0/0:42:22:.",
        # deletion: REF span covers 200-202
        "chr1\t200\t.\tGAT\tG,<NON_REF>\t66\t.\t.\tGT:GQ:DP:PL\t1/1:66:29:.",
        "chr1\t203\t.\tT\t<NON_REF>\t0\t.\tEND=250\tGT:GQ:MIN_DP:PL\t0/0:38:26:.",
    ])), name="B")
    out = io.StringIO()
    n = merge_gvcfs([a, b], out)
    assert n == 2
    body = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    header = [l for l in out.getvalue().splitlines() if l.startswith("#CHROM")]
    assert header[0].endswith("A\tB")
    r100 = body[0].split("\t")
    # sample A called 0/1; sample B is filled 0/0 from its 1-199 block
    assert r100[1] == "100" and r100[3] == "C" and r100[4] == "T"
    assert r100[9] == "0/1:80:33" and r100[10] == "0/0:42:22"
    r200 = body[1].split("\t")
    # A is filled from its 101-300 block; B keeps its hom deletion
    assert r200[1] == "200" and r200[3] == "GAT" and r200[4] == "G"
    assert r200[9] == "0/0:50:31" and r200[10] == "1/1:66:29"


def test_merge_unifies_same_position_alleles():
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t50\t.\tAC\tA,<NON_REF>\t60\t.\t.\tGT:GQ:DP:PL\t0/1:60:30:.",
    ])), name="A")
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t50\t.\tA\tG,<NON_REF>\t70\t.\t.\tGT:GQ:DP:PL\t1/1:70:28:.",
    ])), name="B")
    out = io.StringIO()
    merge_gvcfs([a, b], out)
    row = [l for l in out.getvalue().splitlines() if not l.startswith("#")][0]
    f = row.split("\t")
    # longest REF (AC) wins; B's SNP G is lifted to GC
    assert f[3] == "AC" and f[4] == "A,GC"
    assert f[9].startswith("0/1") and f[10].startswith("2/2")


def test_merge_no_coverage_is_missing():
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t10\t.\tA\tT,<NON_REF>\t55\t.\t.\tGT:GQ:DP:PL\t0/1:55:20:.",
    ])), name="A")
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t100\t.\tC\t<NON_REF>\t0\t.\tEND=150\tGT:GQ:MIN_DP:PL\t0/0:40:22:.",
    ])), name="B")
    out = io.StringIO()
    merge_gvcfs([a, b], out)
    row = [l for l in out.getvalue().splitlines() if not l.startswith("#")][0]
    assert row.split("\t")[10] == "./.:.:."


# ---------------------------------------------------------------------------
# end to end: the framework's own gVCF output through the merger
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def two_sample_gvcfs(tmp_path_factory):
    """Two samples over one simulated contig, called through the full
    pipeline with gVCF output. Sample B carries a superset of sample A's
    hom variants (B adds its own private ones)."""
    from tests.test_pipeline_e2e import OraclePredictor

    from clair_tpu.io.bai import build_bai
    from clair_tpu.pipeline.call_bam import CallBamConfig
    from clair_tpu.pipeline.call_bam_parallel import call_bam_windows_threaded
    from clair_tpu.utils.simulate import (
        plant_variants, random_reference, simulate_bam, write_fasta,
    )

    tmp = tmp_path_factory.mktemp("gvcf_merge")
    rs = np.random.RandomState(17)
    ref = random_reference(rs, 6_000)
    all_variants = plant_variants(rs, ref, n_variants=14, spacing=380)
    shared = all_variants[::2]
    fa = str(tmp / "ref.fa")
    write_fasta(fa, ref)
    paths = {}
    for name, variants in (("A", shared), ("B", all_variants)):
        bam = str(tmp / f"{name}.bam")
        simulate_bam(bam, ref, variants, np.random.RandomState(23), coverage=30)
        build_bai(bam, bam + ".bai")
        gvcf = str(tmp / f"{name}.gvcf")
        config = CallBamConfig(
            bam_path=bam, fasta_path=fa, minimum_af=0.2,
            minimum_coverage=4, gvcf=True, sample_name=name,
        )
        call_bam_windows_threaded(
            config, OraclePredictor(), gvcf,
            chunk_size=2_000, include_all_contigs=True, pileup_workers=1,
        )
        paths[name] = gvcf
    return paths, ref, shared, all_variants


def test_pipeline_gvcfs_merge_ready(two_sample_gvcfs, tmp_path):
    """Round-trip: pipeline gVCFs -> own reader -> joint merge. Every
    private variant of B must be reference-filled (0/0 with real GQ/DP)
    in A — never './.' — which holds ONLY if A's blocks tile its whole
    contig with no gaps."""
    paths, ref, shared, all_variants = two_sample_gvcfs
    a = parse_gvcf(paths["A"])
    b = parse_gvcf(paths["B"])
    assert a.name == "A" and b.name == "B"

    # consumer-side coverage reconstruction: every position of the contig
    # is covered by exactly one block or variant REF span, per sample
    for s in (a, b):
        covered = np.zeros(len(ref), dtype=np.int32)
        for blk in s.blocks["chr1"]:
            covered[blk.position - 1: blk.end] += 1
        for v in s.variants["chr1"]:
            covered[v.position - 1: v.position - 1 + len(v.reference)] += 1
        assert (covered == 1).all(), np.flatnonzero(covered != 1)[:10] + 1

    out = io.StringIO()
    n = merge_gvcfs([a, b], out)
    body = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    assert n == len(body) >= len(b.variants["chr1"])

    a_sites = {v.position for v in a.variants["chr1"]}
    filled = missing = 0
    for line in body:
        f = line.split("\t")
        pos = int(f[1])
        call_a = f[9].split(":")
        if pos not in a_sites:
            # B-private site: A must be filled from a block, with evidence
            if call_a[0] == "0/0":
                filled += 1
                assert call_a[1] != "." and int(call_a[2]) > 0
            else:
                missing += 1
        # GT allele indices must stay within the joint ALT list
        n_alts = len(f[4].split(","))
        for token in (f[9], f[10]):
            gt = token.split(":")[0]
            for al in gt.replace("|", "/").split("/"):
                assert al == "." or int(al) <= n_alts
    assert filled > 0 and missing == 0


def test_merge_sample_with_itself_is_symmetric(two_sample_gvcfs):
    """Self-merge sanity: both columns carry identical calls."""
    paths, *_ = two_sample_gvcfs
    out = io.StringIO()
    merge_gvcfs(
        [parse_gvcf(paths["B"], name="B1"), parse_gvcf(paths["B"], name="B2")],
        out,
    )
    for line in out.getvalue().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        assert f[9] == f[10]


def test_merge_gvcf_cli(two_sample_gvcfs, tmp_path):
    from clair_tpu.cli import main as cli_main

    paths, *_ = two_sample_gvcfs
    out = str(tmp_path / "joint.vcf")
    rc = cli_main(["merge_gvcf", paths["A"], paths["B"], "--output_fn", out])
    assert rc == 0
    text = open(out).read()
    assert text.startswith("##fileformat")
    assert "\tA\tB\n" in text
    assert any(not l.startswith("#") for l in text.splitlines())


def test_coverage_at_sees_spanning_deletion_behind_nearer_row():
    """A long deletion's REF span must provide reference evidence even
    when a LATER variant row (inside the span) is the nearest-preceding
    row at the queried position (review finding, round 4)."""
    s = parse_gvcf(io.StringIO(_make_gvcf_text([
        # deletion REF span covers 100-109
        "chr1\t100\t.\tACGTACGTAC\tA,<NON_REF>\t60\t.\t.\tGT:GQ:DP:PL\t0/1:60:25:.",
        # SNP inside the span: nearest-preceding row for pos 107
        "chr1\t104\t.\tT\tG,<NON_REF>\t50\t.\t.\tGT:GQ:DP:PL\t0/1:50:24:.",
    ])), name="A")
    assert s.coverage_at("chr1", 107) == (60, 25)
    assert s.coverage_at("chr1", 104) == (50, 24)  # the SNP row itself
    assert s.coverage_at("chr1", 110) is None      # past the span

    # and through the merge: sample B has a variant at 107; A (het del
    # spanning 107) fills genotype-aware — REF haplotype 0, deleted
    # haplotype the '*' spanning allele (never a fabricated 0/0)
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t107\t.\tG\tC,<NON_REF>\t70\t.\t.\tGT:GQ:DP:PL\t1/1:70:30:.",
    ])), name="B")
    out = io.StringIO()
    merge_gvcfs([s, b], out)
    row107 = [l for l in out.getvalue().splitlines()
              if not l.startswith("#") and l.split("\t")[1] == "107"][0]
    f = row107.split("\t")
    alts = f[4].split(",")
    assert "*" in alts
    star = str(alts.index("*") + 1)
    assert f[9] == f"0/{star}:60:25"


def test_same_position_split_multiallelic_rows_keep_both_alleles():
    """GATK/bcftools-norm split form: two rows at one POS, one ALT each.
    Neither allele may vanish (review finding, round 4)."""
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t500\t.\tA\tG,<NON_REF>\t55\t.\t.\tGT:GQ:DP:PL\t0/1:55:30:.",
        "chr1\t500\t.\tA\tT,<NON_REF>\t52\t.\t.\tGT:GQ:DP:PL\t0/1:52:30:.",
    ])), name="A")
    out = io.StringIO()
    merge_gvcfs([a], out)
    rows = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    assert len(rows) == 1
    f = rows[0].split("\t")
    assert f[1] == "500" and sorted(f[4].split(",")) == ["G", "T"]
    # both alts called -> het-alt genotype over the joint allele list
    gt = f[9].split(":")[0]
    assert sorted(gt.split("/")) == ["1", "2"]


def test_same_position_hom_and_single_alt_combination():
    from clair_tpu.post.gvcf_merge import GvcfVariant, _combine_sample_rows

    # duplicate rows both calling the same alt, one hom -> stays hom
    v = _combine_sample_rows([
        GvcfVariant(10, "A", ["C"], 40.0, (1, 1), 40, 20),
        GvcfVariant(10, "A", ["C"], 35.0, (0, 1), 35, 22),
    ])
    assert v.alternates == ["C"] and v.genotype == (1, 1)
    assert v.gq == 40 and v.depth == 22 and v.qual == 40.0
    # different-length REFs unify to the longest with suffix lifting
    v = _combine_sample_rows([
        GvcfVariant(10, "AT", ["A"], 30.0, (0, 1), 30, 18),   # del
        GvcfVariant(10, "A", ["G"], 28.0, (0, 1), 28, 18),    # snp
    ])
    assert v.reference == "AT" and sorted(v.alternates) == ["A", "GT"]
    assert sorted(v.genotype) == [1, 2]


def test_hom_deletion_span_fills_star_not_homref():
    """A sample hom-alt for a spanning deletion has ZERO reference alleles
    at sites inside the span: the fill must be */* (spanning-deletion
    allele), never 0/0 (review finding, round 4)."""
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t200\t.\tGATGG\tG,<NON_REF>\t80\t.\t.\tGT:GQ:DP:PL\t1/1:80:28:.",
    ])), name="A")
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t202\t.\tT\tC,<NON_REF>\t66\t.\t.\tGT:GQ:DP:PL\t0/1:66:31:.",
    ])), name="B")
    out = io.StringIO()
    merge_gvcfs([a, b], out)
    row = [l for l in out.getvalue().splitlines()
           if not l.startswith("#") and l.split("\t")[1] == "202"][0]
    f = row.split("\t")
    alts = f[4].split(",")
    assert "*" in alts
    star = str(alts.index("*") + 1)
    assert f[9] == f"{star}/{star}:80:28"
    assert f[10].startswith("0/1")


def test_star_alt_is_never_suffix_extended():
    """The symbolic '*' allele must pass through allele unification
    unchanged — suffix-lifting would produce illegal alleles like '*C'
    (review finding, round 4)."""
    # sample A: deletion at 300 (REF 2bp); sample B: '*' ALT at 300 under
    # some upstream deletion, REF 1bp -> suffix would be 1 base
    a = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t300\t.\tAC\tA,<NON_REF>\t50\t.\t.\tGT:GQ:DP:PL\t0/1:50:20:.",
    ])), name="A")
    b = parse_gvcf(io.StringIO(_make_gvcf_text([
        "chr1\t300\t.\tA\t*,<NON_REF>\t44\t.\t.\tGT:GQ:DP:PL\t0/1:44:19:.",
    ])), name="B")
    out = io.StringIO()
    merge_gvcfs([a, b], out)
    row = [l for l in out.getvalue().splitlines()
           if not l.startswith("#") and l.split("\t")[1] == "300"][0]
    alts = row.split("\t")[4].split(",")
    assert "*" in alts and all("*" not in x or x == "*" for x in alts)
    # same invariant inside one sample's split rows
    from clair_tpu.post.gvcf_merge import GvcfVariant, _combine_sample_rows
    v = _combine_sample_rows([
        GvcfVariant(10, "AT", ["A"], 30.0, (0, 1), 30, 18),
        GvcfVariant(10, "A", ["*"], 25.0, (0, 1), 25, 18),
    ])
    assert "*" in v.alternates and "*T" not in v.alternates
