"""bench.py watchdog: a stage that wedges mid-run must still produce an
artifact line.

The start-of-run reachability probe only proves the remote accelerator
link was up at t=0; the observed failure mode is a link that wedges hours
into a session, hanging the next device op unkillably in-process. The
watchdog emits the JSON artifact composed from the stages that DID
complete and hard-exits 0 so the driver records the line instead of
timing out with nothing.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_emits_partial_artifact_and_exits_zero():
    code = """
import sys, time
sys.path.insert(0, %r)
import bench

def finish(wedged=None):
    import json
    print(json.dumps({"metric": "partial", "wedged_mid_run": wedged}))

wd = bench._Watchdog(finish)
wd.enter("device_forward_f32", 0.1)
time.sleep(30)
print("UNREACHABLE: watchdog did not fire")
sys.exit(3)
""" % (REPO,)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert '"wedged_mid_run": "device_forward_f32"' in r.stdout
    assert "UNREACHABLE" not in r.stdout
    assert "exceeded its watchdog budget" in r.stderr


def test_watchdog_clear_disarms():
    code = """
import sys, time
sys.path.insert(0, %r)
import bench

wd = bench._Watchdog(lambda wedged=None: print("FIRED"))
wd.enter("stage", 0.1)
wd.clear()
time.sleep(7)
print("SURVIVED")
""" % (REPO,)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "SURVIVED" in r.stdout
    assert "FIRED" not in r.stdout
