"""Python wrapper for the native fault-tolerant experiment executor
(native/launcher — C++). Used for multi-seed / multi-temp sweeps where each
run is an isolated subprocess: a TPU-runtime fault or hang costs one retry,
not the sweep.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Dict, List, Sequence

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                           "launcher")
_BINARY = os.path.join(_NATIVE_DIR, "build", "mbd_launcher")


def ensure_built() -> str:
    if not os.path.exists(_BINARY):
        subprocess.run(["make", "-C", _NATIVE_DIR, "build/mbd_launcher"],
                       check=True, capture_output=True)
    return _BINARY


def run_tasks(cmd_template: Sequence[str], tasks: Sequence[str],
              timeout_sec: int = 3600, retries: int = 1,
              jobs: int = 1) -> List[Dict]:
    """Run ``cmd_template`` (with ``{task}`` placeholders) once per task.

    Each worker process must print one JSON line on success. Returns the
    parsed aggregate records (``failed: true`` entries for tasks that
    exhausted retries).
    """
    binary = ensure_built()
    cmd = [binary, "--timeout", str(timeout_sec), "--retries", str(retries),
           "--jobs", str(jobs), "--"] + list(cmd_template)
    # stderr must NOT be captured: workers inherit it through the native
    # launcher, and it carries the only diagnostics when a task fails
    # (round-5 lesson: a crashed humanoidrun worker left zero trace because
    # capture_output swallowed it). Inheriting streams it to the caller's
    # stderr / whatever log the caller redirected to.
    proc = subprocess.run(cmd, input="\n".join(tasks) + "\n",
                          stdout=subprocess.PIPE, stderr=None, text=True)
    out = []
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            out.append(json.loads(line))
    return out
