"""Native fault-tolerant executor: build, run, timeout, retry, aggregate."""

import sys

from mbd_tpu.utils import launcher


def test_launcher_runs_and_aggregates():
    res = launcher.run_tasks(
        [sys.executable, "-c",
         "import json; print(json.dumps({'seed': {task}, 'rew': 1.0}))"],
        tasks=["0", "1", "2"], timeout_sec=30, retries=0, jobs=2)
    assert len(res) == 3
    assert all(r["result"]["rew"] == 1.0 for r in res)
    assert sorted(r["result"]["seed"] for r in res) == [0, 1, 2]


def test_launcher_times_out_and_reports_failure():
    res = launcher.run_tasks(
        [sys.executable, "-c", "import time; time.sleep({task})"],
        tasks=["60"], timeout_sec=1, retries=0)
    assert len(res) == 1
    assert res[0].get("failed") is True


def test_launcher_retries_flaky_worker(tmp_path):
    marker = tmp_path / "flaky"
    code = (
        "import json, os, sys\n"
        f"m = {str(repr(str(marker)))}\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close(); sys.exit(1)\n"
        "print(json.dumps({'ok': True}))\n")
    res = launcher.run_tasks([sys.executable, "-c", code], tasks=["x"],
                             timeout_sec=30, retries=1)
    assert res[0]["result"]["ok"] is True
    assert res[0]["attempts"] == 2
