"""Regenerate docs/CROSSSIM.md's reachability table from the JSONs.

Same no-drift discipline as tools/readme_tables.py: the table comparing
MBD-on-our-engine (docs/RESULTS.json) against MBD-on-MuJoCo
(docs/RESULTS_MBD_ON_MUJOCO.json, the independent-engine planner) is
generated from the committed evidence, spliced between AUTOGEN markers.
Zero-control floors are MuJoCo rollouts of the null plan — engine-
independent, taken from the crosssim records.

Usage: python tools/crosssim_tables.py [--check]
"""
import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN AUTOGEN:reachability (python tools/crosssim_tables.py) -->"
END = "<!-- END AUTOGEN:reachability -->"

ENVS = ["hopper", "walker2d", "halfcheetah", "ant", "humanoidstandup",
        "humanoidrun", "pushT", "cartpole"]


def _load(name):
    path = os.path.join(ROOT, "docs", name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _ours_cell(row):
    if not row:
        return "_not measured_"
    cell = f"{row['rew_mean']:.2f} ± {row['rew_std']:.2f}"
    if row.get("stale_pre_pgs_fix"):
        cell += " †"
    return cell


def _mj_cell(rec):
    """One MBD-on-MuJoCo record: either a single run or {runs: [...]}."""
    if not rec:
        return None
    if "runs" in rec:
        ok = [r for r in rec["runs"] if not r.get("failed")]
        if not ok:
            return None
        n = ok[0]["Nsample"]
        if "reward_mean" in rec:
            return (f"{rec['reward_mean']:.2f} ± {rec['reward_std']:.2f} "
                    f"(N={n}, {len(ok)} seeds)")
        return None
    return f"{rec['reward_mbd_on_mujoco']:.2f} (N={rec['Nsample']}, 1 seed)"


def _floor(env, cross8, cross1):
    rec = cross8.get(env)
    if rec and rec.get("per_seed"):
        return rec["per_seed"][0].get("reward_mujoco_zero_ctrl")
    rec = cross1.get(env)
    if isinstance(rec, dict):
        return rec.get("reward_mujoco_zero_ctrl")
    return None


def render():
    results = _load("RESULTS.json")
    mj = _load("RESULTS_MBD_ON_MUJOCO.json")
    cross8 = _load("RESULTS_CROSSSIM_8SEED.json")
    cross1 = _load("RESULTS_CROSSSIM.json")
    lines = [
        BEGIN,
        "",
        "| env | MBD on our engine (full batch, docs/RESULTS.json) | "
        "MBD on MuJoCo (small batch) | MuJoCo zero-ctrl floor |",
        "|---|---|---|---|",
    ]
    any_stale = False
    for env in ENVS:
        row = results.get(env) or {}
        any_stale |= bool(row.get("stale_pre_pgs_fix"))
        budget_keys = sorted(
            (k for k in mj if re.fullmatch(re.escape(env) + r"_N\d+", k)),
            key=lambda k: int(k.rsplit("_N", 1)[1]))
        cells = [c for c in ([_mj_cell(mj.get(env))]
                             + [_mj_cell(mj[k]) for k in budget_keys]) if c]
        mj_cell = "; ".join(cells) if cells else "_not measured_"
        fl = _floor(env, cross8, cross1)
        fl_cell = f"{fl:.2f}" if fl is not None else "—"
        lines.append(f"| {env} | {_ours_cell(row)} | {mj_cell} | {fl_cell} |")
    lines.append("")
    if any_stale:
        lines.append("† pre-PGS-fix measurement, re-measure pending "
                     "(TPU outage).")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    path = os.path.join(ROOT, "docs", "CROSSSIM.md")
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        print(f"CROSSSIM.md lacks the markers; paste:\n\n{render()}")
        sys.exit(1)
    new = pat.sub(lambda _: render(), text)
    if args.check:
        if new != text:
            print("CROSSSIM.md reachability table is STALE")
            sys.exit(1)
        print("CROSSSIM.md reachability table is current")
        return
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        print("CROSSSIM.md reachability table regenerated")
    else:
        print("CROSSSIM.md already current")


if __name__ == "__main__":
    main()
