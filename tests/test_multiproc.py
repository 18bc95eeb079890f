"""Real multi-process execution (round-5 verdict item 5): the DP + DD
production flows across a process boundary via jax.distributed + gloo —
the executable counterpart of the reference's MPI stack
(ref: ProcessManager.cpp:45 MPI_Init_thread, :206 MPI_Allreduce)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dp_and_dd():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)   # workers set their own platform
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_run.py"),
         "--port", "19837"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    rec = json.loads(open(os.path.join(REPO, "MULTIPROC_r05.json")).read())
    assert rec["procs"] == 2 and rec["devices"] == 8
    assert rec["psum_over_procs"] == 36.0
    assert rec["rel_diff_dp_sed"] < 1e-6
    assert rec["rel_diff_dd_sed"] < 1e-5
    assert rec["ok"]
