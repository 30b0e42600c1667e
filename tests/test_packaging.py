"""Packaging smoke test (reference installs from bioconda, README.md:65-75).

Builds the wheel from pyproject.toml, installs it into a freshly created
venv, and exercises the ``clair-tpu`` console script plus the
build-on-first-use native story from the *installed* tree (no repo
checkout on sys.path).

Network-free by construction: ``--no-index`` everywhere, build isolation
off (setuptools comes from the host env), and third-party deps resolved
through a ``.pth`` shim pointing at the host interpreter's site-packages
(this harness's "system" python is itself a venv, so
``--system-site-packages`` alone does not see numpy/jax).
"""

import glob
import os
import site
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, timeout=600, **kw)


@pytest.mark.slow
def test_wheel_install_console_script(tmp_path):
    r = _run([
        sys.executable, "-m", "pip", "wheel", "--no-deps", "--no-index",
        "--no-build-isolation", "-w", str(tmp_path), REPO,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = glob.glob(str(tmp_path / "clair_tpu-*.whl"))
    assert len(wheels) == 1, wheels

    venv = tmp_path / "venv"
    r = _run([sys.executable, "-m", "venv", "--system-site-packages", str(venv)])
    assert r.returncode == 0, r.stderr[-2000:]
    vpy = str(venv / "bin" / "python")

    # Make the host env's third-party packages importable from the venv.
    vsp = subprocess.run(
        [vpy, "-c", "import site; print(site.getsitepackages()[0])"],
        capture_output=True, text=True, timeout=60,
    ).stdout.strip()
    host_sps = [p for p in site.getsitepackages() + sys.path
                if p.endswith("site-packages") and os.path.isdir(p)]
    (tmp_path / "shim").mkdir()
    with open(os.path.join(vsp, "_host_env.pth"), "w") as fh:
        fh.write("\n".join(dict.fromkeys(host_sps)) + "\n")

    r = _run([vpy, "-m", "pip", "install", "--no-deps", "--no-index", wheels[0]])
    assert r.returncode == 0, r.stderr[-2000:]

    # Console script exists and the calling surface answers --help.
    script = str(venv / "bin" / "clair-tpu")
    assert os.path.isfile(script) and os.access(script, os.X_OK)
    r = _run([script, "call_bam", "--help"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--bam_fn" in r.stdout and "--chkpnt_fn" in r.stdout

    # The installed package is the one imported (not the repo checkout),
    # and the native sources shipped as package data so build-on-first-use
    # has everything it needs.
    r = _run([vpy, "-c", (
        "import os, clair_tpu, clair_tpu.native as n;"
        "print(os.path.dirname(clair_tpu.__file__));"
        "print(sorted(f for f in os.listdir(os.path.dirname(n.__file__))"
        " if f.endswith(('.cpp', 'Makefile'))))"
    )], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert lines[0].startswith(str(venv)), lines
    assert "clair_native.cpp" in lines[-1] and "Makefile" in lines[-1], lines
