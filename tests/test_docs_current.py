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
