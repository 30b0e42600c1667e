"""Bounded run of tools/fuzz_native.py — crash-freedom regression gate.

The full randomized sweep runs under ASAN out-of-band (tools/
fuzz_native.py docstring has the recipe); this keeps a small fixed-seed
slice in the default suite so a regression in the decoders' corruption
handling aborts a subprocess here instead of a production caller. Seed 5
is the seed whose container tier found the round-3 heap overflow in
clair_region_open2 (block_size trusted before the record geometry
check)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("tier,iters", [("codec", 4), ("container", 4),
                                        ("slice", 4)])
def test_fuzz_smoke_survives(tier, iters):
    from clair_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_native.py"),
         "--seed", "5", "--iters", str(iters), "--tier", tier],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, (r.returncode, r.stdout[-2000:], r.stderr[-2000:])
    assert "DONE" in r.stdout
