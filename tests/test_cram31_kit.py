"""The CRAM 3.1 first-contact kit's htslib-free plumbing: the full write
profile matrix (3.0, 3.1 default/X32/arith/fqzcomp/embed-ref) must
round-trip through the kit's own comparison path (tools/validate_cram31
--self_check), and the X32 module flag must not leak between profiles.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import validate_cram31 as kit


def test_self_check_matrix(tmp_path, capsys):
    argv = sys.argv
    sys.argv = ["validate_cram31", "--workdir", str(tmp_path),
                "--self_check", "--genome_kb", "12", "--coverage", "8"]
    try:
        rc = kit.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("PASS") == len(kit.WRITE_PROFILES)
    assert "FAIL" not in out


def test_x32_flag_restored(tmp_path):
    from clair_tpu.io import cram as cram_mod

    bam, fasta = kit.build_fixture(str(tmp_path), genome_kb=6, coverage=6)
    before = cram_mod.RANS4X16_X32
    kit.write_ours(bam, fasta, str(tmp_path / "x32.cram"),
                   ["--cram_version", "3.1", "--rans_x32"])
    assert cram_mod.RANS4X16_X32 == before
