"""Regenerate README.md's measured-results tables from docs/RESULTS*.json.

The README's numbers must never drift from the committed evidence: every
table in the "Measured results" section is generated from the JSON files
that the measurement tools write (tools/run_results.py, run_baselines.py,
rl/train.py, run_bbo.py), spliced between AUTOGEN markers.  Divergence
flags recorded by the engine (cf. reference acceptance harness
mbd/scripts/run_mbd.py:17-39) are surfaced, never hidden: a row with
flagged seeds shows the clean-seed aggregate and says how many were
dropped.

Usage: python tools/readme_tables.py [--check]
  --check: exit 1 if README.md is out of date (for CI), don't rewrite.
"""
import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN AUTOGEN:results (python tools/readme_tables.py) -->"
END = "<!-- END AUTOGEN:results -->"

MAIN_ENVS = ["hopper", "walker2d", "halfcheetah", "ant", "humanoidrun",
             "humanoidstandup", "pushT", "cartpole"]
DEMO_PAIRS = [("humanoidtrack", "humanoidtrack+demo"),
              ("humanoidtrack_walk", "humanoidtrack_walk+demo"),
              ("car2d", "car2d+demo")]


def _load(name):
    path = os.path.join(ROOT, "docs", name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _pm(mean, std):
    return f"{mean:.2f} ± {std:.2f}"


def _backend_tag(rec):
    """Rows are measured on the TPU chip unless the evidence says
    otherwise (CPU re-measures while the TPU tunnel was down record
    backend='cpu'); reward semantics are backend-independent, wall times
    are not, so the provenance is surfaced. Engine provenance is surfaced
    the same way: rows pinned to a non-default engine (e.g. the XLA-fused
    path to skip the Pallas kernel's one-off Mosaic compile in sweeps)
    say so — the engines are parity-tested, wall times differ."""
    b = rec.get("backend")
    parts = []
    if b and b != "tpu":
        parts.append(f"measured on {b.upper()}")
    e = rec.get("engine")
    if e and e not in ("default", "pallas", "vmap"):
        parts.append(f"{e} engine")
    return "; ".join(parts)


def _row_reward(row):
    """Honest reward cell: clean aggregate + flag note when seeds diverged."""
    notes = [n for n in (
        "measured pre contact-solver fix; re-measure pending"
        if row.get("stale_pre_pgs_fix") else "",
        _backend_tag(row)) if n]
    stale = "; ".join(notes)
    nd = row.get("n_diverged", 0)
    n = row.get("n_seeds", 0)
    if not nd:
        return _pm(row["rew_mean"], row["rew_std"]), stale
    if row.get("rew_mean_clean") is None:
        return "— (all seeds diverged)", f"{nd}/{n} seeds diverged"
    note = f"{nd}/{n} diverged seed{'s' if nd > 1 else ''} excluded"
    return (_pm(row["rew_mean_clean"], row["rew_std_clean"]),
            f"{note}; {stale}" if stale else note)


def main_table(results):
    lines = ["| env | final reward (clean seeds, mean ± std) | seeds | flags |",
             "|---|---|---|---|"]
    for env in MAIN_ENVS:
        row = results.get(env)
        if not row or row.get("failed"):
            lines.append(f"| {env} | _not measured_ | | |")
            continue
        cell, note = _row_reward(row)
        mark = " †" if env == "cartpole" else ""
        lines.append(f"| {env} | {cell}{mark} | {row['n_seeds']} |"
                     f" {note or 'all clean'} |")
    return "\n".join(lines)


def demo_table(results):
    lines = ["| env | no demo: reward / xref logpd |"
             " + demo: reward / xref logpd | logpd lift |",
             "|---|---|---|---|"]
    for base, demo in DEMO_PAIRS:
        rb, rd = results.get(base), results.get(demo)
        if not rb or not rd or rb.get("failed") or rd.get("failed"):
            lines.append(f"| {base} | _not measured_ | | |")
            continue
        cb, nb = _row_reward(rb)
        cd, nd = _row_reward(rd)
        def lp(row):
            if "xref_logpd_mean" not in row:
                return "n/a"
            return _pm(row["xref_logpd_mean"], row["xref_logpd_std"])
        lift = ""
        if "xref_logpd_mean" in rb and "xref_logpd_mean" in rd:
            lift = f"{rd['xref_logpd_mean'] - rb['xref_logpd_mean']:+.2f}"
        fb = f" ({nb})" if nb else ""
        fd = f" ({nd})" if nd else ""
        lines.append(f"| {base} | {cb} / {lp(rb)}{fb} | {cd} / {lp(rd)}{fd} |"
                     f" {lift} |")
    return "\n".join(lines)


def _stale_tag(rec):
    notes = []
    if rec.get("stale_pre_pgs_fix"):
        notes.append(rec.get(
            "stale_note",
            "pre contact-solver-fix measurement; re-measure pending"))
    b = _backend_tag(rec)
    if b:
        notes.append(b)
    return f" _({'; '.join(notes)})_" if notes else ""


def _baseline_cell(row):
    if row is None or row.get("failed"):
        return "—"
    nd = row.get("n_diverged", 0)
    if row.get("rew_mean") is None:
        return "— (all seeds diverged)"
    cell = _pm(row["rew_mean"], row["rew_std"])
    if nd:
        cell += f" ({nd} div. excl.)"
    return cell


def baselines_table(bl, results):
    if not bl:
        return "_baselines not measured_"
    # legacy single-env format → env-keyed
    if "baselines" in bl and "env" in bl:
        bl = {bl["env"]: {k: v for k, v in bl.items() if k != "env"}}
    lines = ["| env | **MBD (ours)** | MPPI | CEM | CMA-ES |",
             "|---|---|---|---|---|"]
    backends = set()
    stale = False
    for env_name, rec in bl.items():
        mbd_row = results.get(env_name)
        mbd_cell = "—"
        if mbd_row:
            c, _ = _row_reward(mbd_row)
            mbd_cell = f"**{c}**"
        cells = []
        for name in ["mppi", "cem", "cma-es"]:
            row = rec.get("baselines", {}).get(name)
            cells.append(_baseline_cell(row))
            if row and row.get("backend"):
                backends.add(row["backend"])
        stale = stale or bool(rec.get("stale_pre_pgs_fix"))
        n = next((rec["baselines"][m].get("n_seeds")
                  for m in ["mppi", "cem", "cma-es"]
                  if rec.get("baselines", {}).get(m, {}).get("n_seeds")),
                 "?")
        lines.append(f"| {env_name} ({n} seeds) | {mbd_cell} | "
                     + " | ".join(cells) + " |")
    tag = (" _(measured pre contact-solver fix; re-measure pending)_"
           if stale else "")
    if not tag and backends - {"tpu"}:
        tag = f" _(measured on {'/'.join(sorted(backends)).upper()})_"
    all_failed = [e for e, rec in bl.items()
                  if rec.get("baselines") and all(
                      not (isinstance(v, dict) and v.get("rew_mean")
                           is not None)
                      for v in rec["baselines"].values())]
    if all_failed:
        tag += ("\n\n(— rows: the fused-engine `path_integral` refine "
                "program for " + "/".join(all_failed) + " exceeded the "
                "sweep's per-task XLA-compile budget on TPU — a compile "
                "pathology of those envs' refine loops, not a capability "
                "gap: `run_mbd --algo path_integral` runs them fine at "
                "interactive scale.)")
    return "\n".join(lines) + tag


def temp_line(temp):
    if not temp:
        return "_temperature sweep not measured_"
    outs = []
    for env, rec in temp.items():
        n = len(next(iter(rec["sweep"].values()))["rewards"])
        best = rec["best_temp"]
        outs.append(f"{env}: best temp_sample **{best}** "
                    f"(reward {rec['best_reward']:.2f}, {n} seeds/temp, "
                    f"{len(rec['sweep'])} temps){_stale_tag(rec)}")
    return "; ".join(outs)


def rl_table(rl, results):
    if not rl:
        return "_RL baselines not measured_"
    lines = ["| env | RL algo / budget | episode-return curve |"
             " RL eval (8×50-step mean reward) | MBD (same eval) |",
             "|---|---|---|---|---|"]
    for env, rec in rl.items():
        curve = rec.get("learning_curve", [])
        span = (f"{curve[0]['eval_reward']:.0f} → "
                f"{max(c['eval_reward'] for c in curve):.0f}"
                if curve else "n/a")
        ev = rec.get("eval_mean")
        evs = rec.get("eval_std", 0.0)
        evcell = _pm(ev, evs) if ev is not None else "n/a"
        mbd_row = results.get(env)
        mcell, _ = _row_reward(mbd_row) if mbd_row else ("n/a", "")
        steps = rec.get("num_timesteps", 0) / 1e6
        scale = rec.get("scale", 1.0)
        budget = f"{rec['algo'].upper()}, {steps:.1f}M steps"
        if scale != 1.0:
            budget += f" ({scale:g}× ref budget)"
        lines.append(f"| {env} | {budget}{_stale_tag(rec)} | {span} |"
                     f" {evcell} | **{mcell}** |")
    return "\n".join(lines)


def render():
    results = _load("RESULTS.json") or {}
    section = [
        BEGIN,
        "",
        "MBD with recommended per-env configs, 8-seed harness (the "
        "reference protocol, run_mbd.py:20), one TPU v5e chip unless a "
        "row says otherwise "
        "(`docs/RESULTS.json`, per-seed rewards + engine divergence flags "
        "inside). Rows with flagged seeds report the clean-seed mean — a "
        "flagged rollout's reward is not an earned number:",
        "",
        main_table(results),
        "",
        "Demo-conditioned diffusion — the reference's flagship capability "
        "(mbd_planner.py:117-125) — with the no-demo ablation at identical "
        "configs; \"logpd lift\" is how much demo fusion improves tracking "
        "log-density (when and why fusion helps, incl. the reference's "
        "double-standardization quirk: "
        "[`docs/DEMO_CONDITIONING.md`](docs/DEMO_CONDITIONING.md)):",
        "",
        demo_table(results),
        "",
        "MBD vs zeroth-order baselines, same rollout engine and "
        "sample budget per env (`docs/RESULTS_BASELINES.json`):",
        "",
        baselines_table(_load("RESULTS_BASELINES.json"), results),
        "",
        "Temperature sweep (`docs/RESULTS_TEMP.json`): "
        + temp_line(_load("RESULTS_TEMP.json")),
        "",
        "RL baselines (`docs/RESULTS_RL.json`; eval protocol = the "
        "reference's 8 reset seeds × 50 steps mean step reward, "
        "train_brax.py:206-225; curve column is episode return during "
        "training — different units by construction):",
        "",
        rl_table(_load("RESULTS_RL.json"), results),
        "",
        END,
    ]
    return "\n".join(section)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        print(f"README.md lacks the markers; paste this block:\n\n{render()}")
        sys.exit(1)
    new = pat.sub(lambda _: render(), text)
    if args.check:
        if new != text:
            print("README.md results tables are STALE "
                  "(run python tools/readme_tables.py)")
            sys.exit(1)
        print("README.md results tables are current")
        return
    if new != text:
        with open(readme, "w") as f:
            f.write(new)
        print("README.md results tables regenerated")
    else:
        print("README.md already current")


if __name__ == "__main__":
    main()
