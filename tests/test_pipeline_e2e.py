"""End-to-end pipeline tests on a synthetic genome.

Builds a reference FASTA + a coordinate-sorted BAM with planted variants
(hom SNP, het SNP, het insertion, hom deletion), then drives:

1. call_bam with an oracle predictor (probabilities derived from the tensor
   itself) -> asserts the exact VCF REF/ALT/GT per planted variant, which
   exercises pileup, candidate selection, tensor creation and the decode
   lattice together without model noise;
2. the CLI data-prep chain extract_candidates -> create_tensor ->
   tensor2bin -> (structural assertions);
3. the overlap filter and ensemble combiner CLIs.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

from clair_tpu.io.bam import BamWriter
from clair_tpu.io.fasta import build_fai
from clair_tpu.params import FLANKING_BASE_NUM
from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
from clair_tpu.task.genotype import Genotype
from clair_tpu.task.gt21 import GT21, gt21_code_from_label


def _make_reference(rs, length=1200):
    return "".join(rs.choice(list("ACGT"), length))


VLEN_OFF = 16


class OraclePredictor:
    """Derives 'perfect' probabilities from the normalized tensor — a stand
    in for a converged model, so decode assertions are deterministic."""

    batch_size = 64

    def predict_async(self, x):
        # the real Predictor normalizes raw-uint8 uplink batches on device
        # (call_var._device_input); this model stand-in does the same
        from clair_tpu.data.tensor_stream import normalized_f32

        x = normalized_f32(x)
        n = len(x)
        c = FLANKING_BASE_NUM
        gt21 = np.full((n, 21), 1e-6, np.float32)
        geno = np.full((n, 3), 1e-6, np.float32)
        vl1 = np.full((n, 33), 1e-6, np.float32)
        vl2 = np.full((n, 33), 1e-6, np.float32)

        for i in range(n):
            t = x[i]
            depth = float(t[c, :, 0].sum())
            ref_base = int(np.argmax(t[c, :4, 0] + t[c, 4:, 0]))
            snp_support = t[c, :4, 3] + t[c, 4:, 3]        # normalized alt support
            ins_support = float(t[c + 1, :, 1].sum() - t[c + 1, :, 3].sum())
            del_support = float(t[c + 1, :, 2].sum())

            af_snp = snp_support / max(depth, 1)
            af_ins = ins_support / max(depth, 1)
            af_del = del_support / max(depth, 1)
            base_order = np.argsort(-af_snp)

            def ins_length():
                k = 0
                for pos in range(c + 1, 33):
                    support = float(t[pos, :, 1].sum() - t[pos, :, 3].sum())
                    if support >= 0.25 * depth:
                        k += 1
                    else:
                        break
                return max(k, 1)

            def del_length():
                k = 0
                for pos in range(c + 1, 33):
                    if float(t[pos, :, 2].sum()) >= 0.25 * depth:
                        k += 1
                    else:
                        break
                return max(k, 1)

            bases = "ACGT"
            if af_ins > 0.7:
                gt21[i, GT21.InsIns] = 1.0
                geno[i, Genotype.homo_variant] = 1.0
                k = ins_length()
                vl1[i, VLEN_OFF + k] = 1.0
                vl2[i, VLEN_OFF + k] = 1.0
            elif af_ins > 0.3:
                label = bases[ref_base] + "Ins"
                gt21[i, gt21_code_from_label(label)] = 1.0
                geno[i, Genotype.hetero_variant] = 1.0
                k = ins_length()
                vl1[i, VLEN_OFF] = 1.0
                vl2[i, VLEN_OFF + k] = 1.0
            elif af_del > 0.7:
                gt21[i, GT21.DelDel] = 1.0
                geno[i, Genotype.homo_variant] = 1.0
                k = del_length()
                vl1[i, VLEN_OFF - k] = 1.0
                vl2[i, VLEN_OFF - k] = 1.0
            elif af_del > 0.3:
                label = bases[ref_base] + "Del"
                gt21[i, gt21_code_from_label(label)] = 1.0
                geno[i, Genotype.hetero_variant] = 1.0
                k = del_length()
                vl1[i, VLEN_OFF - k] = 1.0
                vl2[i, VLEN_OFF] = 1.0
            else:
                vl1[i, VLEN_OFF] = 1.0
                vl2[i, VLEN_OFF] = 1.0
                top = int(base_order[0])
                if af_snp[top] > 0.7:
                    label = "".join(sorted(bases[top] * 2))
                    gt21[i, gt21_code_from_label(label)] = 1.0
                    geno[i, Genotype.homo_variant] = 1.0
                elif af_snp[top] > 0.2:
                    label = "".join(sorted(bases[ref_base] + bases[top]))
                    gt21[i, gt21_code_from_label(label)] = 1.0
                    geno[i, Genotype.hetero_variant] = 1.0
                else:
                    label = bases[ref_base] * 2
                    gt21[i, gt21_code_from_label(label)] = 1.0
                    geno[i, Genotype.homo_reference] = 1.0

        for a in (gt21, geno, vl1, vl2):
            a /= a.sum(-1, keepdims=True)
        return (gt21, geno, vl1, vl2), n

    def gather(self, out, n):
        return [a[:n] for a in out]


@pytest.fixture(scope="module")
def synthetic_genome(tmp_path_factory):
    """Reference + BAM with planted variants. 1-based positions:
    hom C>G SNP @ 301, het A>T SNP @ 501, het 'CA' ins after 701,
    hom 2bp del @ 901-903."""
    tmp = tmp_path_factory.mktemp("genome")
    rs = np.random.RandomState(42)
    ref = list(_make_reference(rs))
    ref[300] = "C"   # 1-based 301
    ref[500] = "A"   # 1-based 501
    reference = "".join(ref)

    fasta_path = tmp / "ref.fa"
    with open(fasta_path, "w") as fh:
        fh.write(">chr1\n")
        for off in range(0, len(reference), 60):
            fh.write(reference[off:off + 60] + "\n")
    build_fai(str(fasta_path))

    read_length = 120
    reads = []
    for i in range(40):
        start = 150 + i * 20
        if start + read_length > len(reference) - 50:
            break
        hap = i % 2  # haplotype 0 carries the het variants
        chunk = list(reference[start:start + read_length])
        cigar = [(read_length, "M")]
        # hom SNP at 0-based 300
        if start <= 300 < start + read_length:
            chunk[300 - start] = "G"
        # het SNP at 0-based 500 (hap 0 only)
        if hap == 0 and start <= 500 < start + read_length:
            chunk[500 - start] = "T"
        seq = "".join(chunk)
        # het insertion 'CA' after 0-based 700 (between 700 and 701), hap 0
        if hap == 0 and start + 10 <= 700 < start + read_length - 10:
            split = 700 - start + 1
            seq = seq[:split] + "CA" + seq[split:]
            cigar = [(split, "M"), (2, "I"), (read_length - split, "M")]
        # hom deletion of 0-based 901, 902 (2bp): reads skip them
        elif start + 10 <= 901 < start + read_length - 10:
            split = 901 - start
            seq = seq[:split] + reference[start + split + 2: start + read_length + 2]
            cigar = [(split, "M"), (2, "D"), (read_length - split, "M")]
        reads.append((f"read{i}", start, 16 if i % 4 >= 2 else 0, cigar, seq))

    bam_path = tmp / "sample.bam"
    with BamWriter(str(bam_path), [("chr1", len(reference))]) as writer:
        for name, pos, flag, cigar, seq in sorted(reads, key=lambda r: r[1]):
            writer.write(name, 0, pos, 60, flag, cigar, seq)

    return dict(
        fasta=str(fasta_path), bam=str(bam_path), reference=reference, tmp=tmp
    )


def test_call_bam_end_to_end(synthetic_genome):
    g = synthetic_genome
    out = io.StringIO()
    config = CallBamConfig(
        bam_path=g["bam"], fasta_path=g["fasta"], contig="chr1",
        ctg_start=200, ctg_end=1000, minimum_af=0.2, minimum_coverage=4,
    )
    total = call_bam(config, OraclePredictor(), output_fh=out)
    assert total > 0
    rows = [r.split("\t") for r in out.getvalue().splitlines() if not r.startswith("#")]
    by_pos = {int(r[1]): r for r in rows}
    reference = g["reference"]

    assert 301 in by_pos, f"hom SNP missing; called: {sorted(by_pos)}"
    assert by_pos[301][3] == "C" and by_pos[301][4] == "G"
    assert by_pos[301][9].startswith("1/1")

    assert 501 in by_pos
    assert by_pos[501][3] == "A" and by_pos[501][4] == "T"
    assert by_pos[501][9].startswith("0/1")

    assert 701 in by_pos
    assert by_pos[701][3] == reference[700]
    assert by_pos[701][4] == reference[700] + "CA"
    assert by_pos[701][9].startswith("0/1")

    assert 901 in by_pos
    assert by_pos[901][3] == reference[900:903]
    assert by_pos[901][4] == reference[900]
    assert by_pos[901][9].startswith("1/1")

    # no spurious calls besides the planted variants
    spurious = set(by_pos) - {301, 501, 701, 901}
    assert not spurious, f"unexpected calls at {spurious}"


def _run_cli(args, stdin_text=None):
    result = subprocess.run(
        [sys.executable, "-m", "clair_tpu"] + args,
        capture_output=True, text=True, input=stdin_text,
        env={**__import__("os").environ, "JAX_PLATFORMS": "", "JAX_PLATFORM_NAME": "cpu"},
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return result.stdout


def test_cli_data_prep_chain(synthetic_genome):
    g = synthetic_genome
    candidates = _run_cli([
        "extract_candidates", "--bam_fn", g["bam"], "--ref_fn", g["fasta"],
        "--ctgName", "chr1", "--ctgStart", "200", "--ctgEnd", "1000",
        "--threshold", "0.2",
    ])
    positions = [int(line.split()[1]) for line in candidates.splitlines()]
    assert {301, 501} <= set(positions)
    assert 701 in positions or 702 in positions  # insertion attaches nearby

    can_path = g["tmp"] / "cands.txt"
    can_path.write_text(candidates)
    tensors = _run_cli([
        "create_tensor", "--bam_fn", g["bam"], "--ref_fn", g["fasta"],
        "--can_fn", str(can_path), "--ctgName", "chr1",
        "--ctgStart", "200", "--ctgEnd", "1000",
    ])
    lines = tensors.splitlines()
    assert len(lines) == len(positions)
    first = lines[0].split()
    assert len(first) == 3 + 33 * 8 * 4
    assert len(first[2]) == 33

    tensor_path = g["tmp"] / "tensors.txt"
    tensor_path.write_text(tensors)
    bin_path = g["tmp"] / "train.bin"
    _run_cli([
        "tensor2bin", "--tensor_fn", str(tensor_path), "--bin_fn", str(bin_path),
        "--no_shuffle",
    ])
    from clair_tpu.data.bins import load_bin

    dataset = load_bin(str(bin_path))
    assert dataset.dataset_size == len(lines)


def test_cli_overlap_and_ensemble():
    vcf = "\n".join([
        "##fileformat=VCFv4.1",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
        "chr1\t100\t.\tGAAA\tG\t300\t.\t.\tGT:GQ:DP:AF\t1/1:300:20:0.9",
        "chr1\t102\t.\tA\tT\t50\t.\t.\tGT:GQ:DP:AF\t0/1:50:20:0.4",   # inside del span
        "chr1\t200\t.\tC\tG\t90\t.\t.\tGT:GQ:DP:AF\t0/1:90:20:0.5",
    ]) + "\n"
    out = _run_cli(["overlap_variant"], stdin_text=vcf)
    rows = [r for r in out.splitlines() if not r.startswith("#")]
    assert len(rows) == 2
    assert rows[0].split("\t")[1] == "100"   # higher-qual deletion kept
    assert rows[1].split("\t")[1] == "200"

    tensor_cols = "\t".join(["1"] * (33 * 8 * 4))
    probs_a = "\t".join(["0.100000"] * 90)
    probs_b = "\t".join(["0.300000"] * 90)
    ens_in = (
        f"chr1\t500\tACG\t{tensor_cols}\t{probs_a}\n"
        f"chr1\t500\tACG\t{tensor_cols}\t{probs_b}\n"
    )
    out = _run_cli(["ensemble", "--minimum_count_to_output", "2"], stdin_text=ens_in)
    columns = out.strip().split("\t")
    assert columns[1] == "500"
    assert columns[3 + 33 * 8 * 4] == "0.200000"  # averaged


def test_call_bam_truth_vcf_mode(tmp_path):
    """GetTruth-mode calling (ref callVarBam.py:183-188): candidate sites
    come from a truth VCF instead of extraction; every truth position
    inside the region must produce a row (oracle predictor, --showRef)."""
    import numpy as np

    from clair_tpu.pipeline.call_bam import CallBamConfig, call_bam
    from clair_tpu.utils.simulate import (
        plant_variants,
        random_reference,
        simulate_bam,
        write_fasta,
        write_truth_vcf,
    )

    rs = np.random.RandomState(21)
    reference = random_reference(rs, 8000)
    variants = plant_variants(rs, reference, n_variants=15, spacing=300)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    vcf_path = str(tmp_path / "truth.vcf")
    write_fasta(fasta_path, reference)
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    write_truth_vcf(vcf_path, variants)

    out = str(tmp_path / "calls.vcf")
    config = CallBamConfig(
        bam_path=bam_path, fasta_path=fasta_path, contig="chr1",
        ctg_start=1, ctg_end=8000, truth_vcf_path=vcf_path,
        show_reference=True,
    )
    total = call_bam(config, OraclePredictor(), output_path=out)
    called = {int(r.split("\t")[1]) for r in open(out) if not r.startswith("#")}
    truth_positions = {v.position for v in variants}
    assert total == len(truth_positions)
    assert truth_positions <= called
