"""--num_devices on the calling CLIs: sharding the inference batch over
the (virtual, conftest-forced 8-way CPU) device mesh must produce a
byte-identical VCF to the single-device run, through the real CLI path.
"""

import numpy as np
import pytest

from clair_tpu.cli import main as cli_main
from clair_tpu.utils.simulate import (
    plant_variants,
    random_reference,
    simulate_bam,
    write_fasta,
)

CKPT = "examples/ont_synthetic.ckpt"


def _flowcell(tmp_path):
    rs = np.random.RandomState(11)
    reference = random_reference(rs, 5000)
    variants = plant_variants(rs, reference, n_variants=15, spacing=220)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "s.bam")
    write_fasta(fasta_path, reference, contig="chr1")
    simulate_bam(bam_path, reference, variants, rs, coverage=25)
    return bam_path, fasta_path


@pytest.mark.parametrize("num_devices", [2, 8])
def test_call_bam_num_devices_identical(tmp_path, num_devices):
    import os

    if not os.path.exists(CKPT):
        pytest.skip("vendored checkpoint missing")
    bam, fasta = _flowcell(tmp_path)

    def run(out_name, extra):
        out = str(tmp_path / out_name)
        rc = cli_main(["call_bam", "--bam_fn", bam, "--ref_fn", fasta,
                       "--ctgName", "chr1", "--chkpnt_fn", CKPT,
                       "--call_fn", out, "--threshold", "0.2"] + extra)
        assert rc in (0, None)
        return [r for r in open(out) if not r.startswith("#")]

    single = run("single.vcf", [])
    sharded = run(f"mesh{num_devices}.vcf",
                  ["--num_devices", str(num_devices)])
    assert sharded == single
    assert len(single) > 0


def test_process_pool_rejects_num_devices(tmp_path, capsys):
    bam, fasta = _flowcell(tmp_path)
    with pytest.raises(SystemExit):
        cli_main(["call_bam_parallel", "--bam_fn", bam, "--ref_fn", fasta,
                  "--chkpnt_fn", CKPT,
                  "--output_prefix", str(tmp_path / "o"),
                  "--run", "--process_pool", "--num_devices", "8"])
