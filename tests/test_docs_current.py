"""The published tables must never drift from the committed evidence.

README.md's results section and docs/CROSSSIM.md's reachability table are
generated from docs/RESULTS*.json by tools/readme_tables.py and
tools/crosssim_tables.py. These tests run the generators in --check mode:
editing a JSON (or the table by hand) without regenerating fails CI.
Subprocess-isolated — the generators are pure-JSON and never touch jax.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _check(tool):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", tool), "--check"],
        capture_output=True, text=True, timeout=60)


def test_readme_tables_current():
    r = _check("readme_tables.py")
    assert r.returncode == 0, r.stdout + r.stderr


def test_crosssim_table_current():
    r = _check("crosssim_tables.py")
    assert r.returncode == 0, r.stdout + r.stderr


def test_demo_table_current():
    r = _check("demo_tables.py")
    assert r.returncode == 0, r.stdout + r.stderr


def _last_commit_time(*paths):
    r = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--"] + list(paths),
        capture_output=True, text=True, timeout=30, cwd=ROOT)
    out = r.stdout.strip()
    return int(out) if out else 0


def test_perf_claims_not_older_than_engine():
    """README/PARITY/EVIDENCE cite live bench numbers from
    docs/BENCH_LIVE_*.json. Twice (r03, r04) an engine refactor landed
    AFTER the round's TPU measurement and broke the very kernel the docs
    still advertised. Fail when the newest committed engine change
    (mbd_tpu/sim, mbd_tpu/ops, mbd_tpu/rollout) postdates the newest
    committed bench record: re-run bench.py on the chip and commit the
    fresh JSON alongside (or in a commit after) any engine change."""
    t_engine = _last_commit_time(
        "mbd_tpu/sim", "mbd_tpu/ops", "mbd_tpu/rollout")
    t_bench = _last_commit_time("docs/BENCH_LIVE_r*.json")
    if t_engine == 0 and t_bench == 0:
        return  # not a git checkout (tarball install) — nothing to assert
    assert t_bench >= t_engine, (
        "the committed engine is NEWER than the newest committed bench "
        "record (docs/BENCH_LIVE_r*.json): the README's perf claims are "
        "unverified against the current kernel. Re-run `python bench.py` "
        "on TPU and commit its JSON (this exact staleness shipped broken "
        "kernels in rounds 3 and 4).")
