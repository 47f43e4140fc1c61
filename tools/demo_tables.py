"""Regenerate docs/DEMO_CONDITIONING.md's ±demo table from docs/RESULTS.json.

Same AUTOGEN discipline as tools/readme_tables.py: the analysis doc's
numbers are spliced from the committed acceptance-harness JSON, never
hand-edited, and tests/test_docs_current.py fails CI on drift.

Usage: python tools/demo_tables.py [--check]
"""
import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(ROOT, "docs", "DEMO_CONDITIONING.md")
BEGIN = "<!-- BEGIN AUTOGEN:demo (python tools/demo_tables.py) -->"
END = "<!-- END AUTOGEN:demo -->"

PAIRS = [("humanoidtrack", "jog demo"),
         ("humanoidtrack_walk", "walk demo"),
         ("car2d", "S-curve demo")]


def _pm(m, s, d=2):
    return f"{m:.{d}f} ± {s:.{d}f}"


def table():
    with open(os.path.join(ROOT, "docs", "RESULTS.json")) as f:
        res = json.load(f)
    lines = [
        "| task | reward (no demo) | reward (+demo) | tracking logpd "
        "(no demo) | tracking logpd (+demo) | note |",
        "|---|---|---|---|---|---|",
    ]
    for base, label in PAIRS:
        off, on = res.get(base), res.get(base + "+demo")
        if off is None or on is None:
            lines.append(f"| {base} ({label}) | — | — | — | — | not yet "
                         "measured |")
            continue
        notes = []
        if off.get("stale_pre_pgs_fix") or on.get("stale_pre_pgs_fix"):
            notes.append("measured pre contact-solver fix; re-measure "
                         "pending")
        eng = on.get("engine")
        if eng and eng not in ("default", "pallas", "vmap"):
            notes.append(f"{eng} engine")
        nd = off.get("n_diverged", 0) + on.get("n_diverged", 0)
        if nd:
            notes.append(f"{nd} diverged seed(s)")
        lines.append(
            f"| {base} ({label}) "
            f"| {_pm(off['rew_mean'], off['rew_std'])} "
            f"| {_pm(on['rew_mean'], on['rew_std'])} "
            f"| {_pm(off['xref_logpd_mean'], off['xref_logpd_std'])} "
            f"| {_pm(on['xref_logpd_mean'], on['xref_logpd_std'])} "
            f"| {'; '.join(notes)} |")
    lines.append("")
    lines.append("(8 seeds each, recommended configs — the reference "
                 "acceptance protocol; `xref_logpd` is the demo-tracking "
                 "log-density of the FINAL plan, scored for demo-capable "
                 "envs whether or not demo fusion was on, so the contrast "
                 "is like-for-like.)")
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    args = p.parse_args()
    with open(DOC) as f:
        doc = f.read()
    block = f"{BEGIN}\n{table()}\n{END}"
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                 doc, flags=re.S)
    if args.check:
        if new != doc:
            print("docs/DEMO_CONDITIONING.md is out of date — run "
                  "python tools/demo_tables.py")
            sys.exit(1)
        return
    if new != doc:
        with open(DOC, "w") as f:
            f.write(new)
        print("docs/DEMO_CONDITIONING.md updated")
    else:
        print("docs/DEMO_CONDITIONING.md already current")


if __name__ == "__main__":
    main()
