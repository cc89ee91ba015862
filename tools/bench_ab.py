#!/usr/bin/env python3
"""Same-box A/B bench: old commit vs the current working tree.

The box this project benches on drifts 10-25% between days/reboots
(SCALING.md), so a round-over-round diff of two committed artifacts
conflates code moves with box-regime moves. This tool produces the
paired comparison SCALING.md used to assemble by hand: it re-runs the
PREVIOUS committed artifact's commit in a throwaway git worktree on
the CURRENT box, runs the current tree the same way, and prints a
paired delta table -- same box, same protocol, minutes apart.

Usage:
    python3 tools/bench_ab.py [--old <commit>] [--sf-dir DIR]
                              [--cpus N] [--runs N] [--no-require-idle]
                              [--out ab_report.md] [--top N]

Defaults: --old = the commit that last touched bench_full.json (the
previous committed capture); sf0.1; 32 cpus; 3 runs; idle required
(both captures refuse on a loaded box, the committed-artifact
convention). Old runs first, then new -- both on the sbt basis (bare
java deoptimizes under 150 codegen'd queries; see memory/SCALING.md).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, cwd=REPO, env=None, check=True):
    return subprocess.run(args, cwd=cwd, env=env, check=check,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)


def last_artifact_commit():
    # skip commits whose tree is HEAD's own: right after committing a
    # round's capture, `git log -1 -- bench_full.json` IS HEAD, and a
    # HEAD-vs-HEAD A/B prints an all-zero "no regression" table
    head = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    r = sh(["git", "log", "-8", "--format=%H", "--", "bench_full.json"])
    commits = [c for c in r.stdout.split() if c and c != head]
    if not commits:
        sys.exit("no non-HEAD commit touching bench_full.json found; pass --old")
    return commits[0]


def wait_idle(timeout_s=600, threshold=0.6):
    """Sleep until 1-min load drops below threshold. 0.6, not the
    guard's own 1.0: sbt's startup JVMs add ~0.3-0.5 of 1-min load
    between this check and Bench reading /proc/loadavg, and a capture
    refused at 1.09 wastes a whole compile+wait cycle (observed)."""
    import time
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
        if load < threshold:
            return load
        print(f"[ab] waiting for idle box (load {load:.2f}) ...", flush=True)
        time.sleep(20)
    return load


def reject_floor_probe(art, where):
    """A floor-probe capture (SPARK_GRAFT_BENCH_FLOOR=1) is
    shape-identical to a real artifact but measures the one-stage
    harness floor, not the operators — diffed against a real capture
    it reads as a ~7x speedup. Refuse it everywhere this tooling
    ingests an artifact."""
    if art.get("methodology", {}).get("floor_probe"):
        sys.exit(f"[ab] {where}: artifact is a FLOOR PROBE "
                 "(methodology.floor_probe=true) — it measures the harness "
                 "floor, not the queries, and cannot be A/B'd or committed "
                 "as bench_full.json. Re-capture without SPARK_GRAFT_BENCH_FLOOR.")


def run_bench(tree, out_path, sf_dir, cpus, runs, require_idle, label):
    env = dict(os.environ)
    # an inherited floor flag would silently turn BOTH captures into
    # floor probes (reject_floor_probe would then catch it; strip the
    # cause, not just the symptom)
    env.pop("SPARK_GRAFT_BENCH_FLOOR", None)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_RUNS": str(runs),
        "SPARK_GRAFT_BENCH_OUT": out_path,
    })
    if require_idle:
        env["SPARK_GRAFT_BENCH_REQUIRE_IDLE"] = "1"
    # compile separately so the compile's own load spike settles
    # before the bench's idle guard reads /proc/loadavg
    print(f"[ab] {label}: compiling in {tree} ...", flush=True)
    c = subprocess.run(["sbt", "-batch", "compile"], cwd=tree, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    if c.returncode != 0:
        sys.exit(f"[ab] {label} compile FAILED:\n" +
                 "\n".join(c.stdout.splitlines()[-15:]))
    for attempt in range(3):
        if require_idle:
            wait_idle()
        print(f"[ab] {label}: sbt runMain graft.Bench in {tree} ...", flush=True)
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=tree,
                           env=env, stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True)
        if r.returncode == 0:
            # Bench catches its own artifact-write IOException and
            # exits 0 — surface that as a message, not a traceback
            try:
                with open(out_path) as f:
                    art = json.loads(f.read())
                reject_floor_probe(art, label)
                return art
            except OSError as e:
                sys.exit(f"[ab] {label}: bench exited 0 but wrote no artifact "
                         f"at {out_path} ({e}) — check its stderr for "
                         "'[bench] could not write'")
        tail = "\n".join(r.stdout.splitlines()[-15:])
        # the guard can still race load from this script's own sbt
        # startup — re-wait and retry rather than wasting the compile
        if "REFUSING capture" in r.stdout and attempt < 2:
            print(f"[ab] {label}: capture refused (loaded box), retrying ...",
                  flush=True)
            continue
        sys.exit(f"[ab] {label} bench FAILED (exit {r.returncode}):\n{tail}")


def closing_control_md(a):
    """SCALING.md closing-control table, generated from an anchored
    artifact's own fields (r13 verdict ask #3: the committed capture
    must adjudicate itself — no prose archaeology)."""
    lines = [
        "**Closing control (generated from bench_full.json anchor fields):**",
        "",
        "| capture | at | min-total (s) | per-run totals |",
        "|---|---|---|---|",
        f"| old {a['anchor_commit'][:9]} | {a['anchor_captured_at']} | "
        f"{a['anchor_total']:.2f} | "
        f"{', '.join(f'{t:.2f}' for t in a.get('anchor_runs', []))} |",
        f"| new {a.get('head_commit', a.get('anchor_head', 'HEAD'))[:9]} | {a['captured_at']} | "
        f"{a['value']:.2f} | "
        f"{', '.join(f'{t:.2f}' for t in [r['total'] for r in a.get('runs', [])])} |",
        "",
        f"Paired delta: {a['paired_delta_pct']:+.1f}% — same box, same protocol, "
        "minutes apart; anything a round-over-round artifact diff reports beyond "
        "this is box regime, not code.",
    ]
    return "\n".join(lines)


def fmt_row(name, old, new):
    d = new - old
    pct = (d / old * 100.0) if old > 0 else float("nan")
    return f"| {name} | {old:.3f} | {new:.3f} | {d:+.3f} | {pct:+.1f}% |"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", default=None,
                    help="commit to A/B against (default: last commit touching bench_full.json)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-require-idle", action="store_true")
    ap.add_argument("--out", default=None, help="also write the report to this file")
    ap.add_argument("--top", type=int, default=15, help="per-query moves to show")
    ap.add_argument("--emit-anchored", default=None, metavar="PATH",
                    help="write the NEW capture to PATH augmented with its own "
                         "drift anchor (anchor_commit, anchor_total, "
                         "paired_delta_pct, anchor_runs, timestamps) — the "
                         "self-adjudicating committed bench_full.json; also "
                         "prints the SCALING.md closing-control table")
    args = ap.parse_args()

    old_commit = args.old or last_artifact_commit()
    old_commit = sh(["git", "rev-parse", old_commit]).stdout.strip()
    head = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    dirty = bool(sh(["git", "status", "--porcelain"]).stdout.strip())
    old_tree = sh(["git", "rev-parse", f"{old_commit}^{{tree}}"]).stdout.strip()
    head_tree = sh(["git", "rev-parse", "HEAD^{tree}"]).stdout.strip()
    if old_tree == head_tree and not dirty:
        print("[ab] WARNING: old commit's tree is identical to HEAD's and the "
              "working tree is clean — this A/B measures box noise only",
              flush=True)
    require_idle = not args.no_require_idle

    import datetime

    def now():
        return datetime.datetime.now().strftime("%Y-%m-%d %H:%M")

    tmp = tempfile.mkdtemp(prefix="graft-ab-")
    wt = os.path.join(tmp, "old")
    sh(["git", "worktree", "add", "--detach", wt, old_commit])
    try:
        old = run_bench(wt, os.path.join(tmp, "old.json"), args.sf_dir,
                        args.cpus, args.runs, require_idle,
                        f"OLD {old_commit[:9]}")
        t_old = now()
        new = run_bench(REPO, os.path.join(tmp, "new.json"), args.sf_dir,
                        args.cpus, args.runs, require_idle,
                        f"NEW {head[:9]}{'+dirty' if dirty else ''}")
        t_new = now()
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)

    lines = []
    lines.append(f"# Same-box bench A/B — {old_commit[:9]} vs "
                 f"{head[:9]}{' (+uncommitted)' if dirty else ''}")
    lines.append("")
    oe, ne = old.get("capture_env", {}), new.get("capture_env", {})
    lines.append(f"Box: old load_avg {oe.get('load_avg')} loaded={oe.get('loaded')}; "
                 f"new load_avg {ne.get('load_avg')} loaded={ne.get('loaded')}. "
                 f"Protocol: {args.runs} runs, min-total, sf={args.sf_dir}, "
                 f"cpus={args.cpus}, idle {'REQUIRED' if require_idle else 'not required'}.")
    lines.append("")
    lines.append("| | old (s) | new (s) | delta | % |")
    lines.append("|---|---|---|---|---|")
    lines.append(fmt_row("**total**", old["value"], new["value"]))
    o_runs = [r["total"] for r in old.get("runs", [])]
    n_runs = [r["total"] for r in new.get("runs", [])]
    lines.append("")
    lines.append(f"Per-run totals — old: {', '.join(f'{t:.2f}' for t in o_runs)}; "
                 f"new: {', '.join(f'{t:.2f}' for t in n_runs)}. "
                 "(All runs shifting together = box regime; one query moving in "
                 "every run = code.)")
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq), key=lambda k: -abs(nq[k] - oq[k]))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    lines.append("")
    lines.append(f"## Largest per-query moves (top {args.top} of {len(shared)} shared)")
    lines.append("")
    lines.append("| query | old (s) | new (s) | delta | % |")
    lines.append("|---|---|---|---|---|")
    for k in shared[: args.top]:
        lines.append(fmt_row(k, oq[k], nq[k]))
    if only_old:
        lines.append("")
        lines.append(f"Only in old: {', '.join(only_old)}")
    if only_new:
        lines.append("")
        lines.append(f"Only in new: {', '.join(only_new)} "
                     f"(sum {sum(nq[k] for k in only_new):.3f} s — excluded from total delta? "
                     "No: totals above include them; the shared-query delta is "
                     f"{sum(nq[k] for k in shared) - sum(oq[k] for k in shared):+.3f} s.)")
    errs = [(k, "old", v) for k, v in sorted(old.get("errors", {}).items())] + \
           [(k, "new", v) for k, v in sorted(new.get("errors", {}).items())]
    if errs:
        lines.append("")
        lines.append("## Errors")
        for k, side, v in errs:
            lines.append(f"- {k} ({side}) — {v}")
    report = "\n".join(lines) + "\n"
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"[ab] report written to {args.out}")
    if args.emit_anchored:
        anchored = dict(new)
        anchored["anchor_commit"] = old_commit
        anchored["anchor_total"] = old["value"]
        anchored["paired_delta_pct"] = round(
            (new["value"] - old["value"]) / old["value"] * 100.0, 2)
        anchored["anchor_runs"] = [r["total"] for r in old.get("runs", [])]
        anchored["anchor_captured_at"] = t_old
        anchored["captured_at"] = t_new
        # head_commit, NOT anchor_head (r14 advisor): the anchor_*
        # prefix is reserved for the OLD capture's fields — the prior
        # name invited reading the new head as the anchor commit
        anchored["head_commit"] = head + ("+dirty" if dirty else "")
        with open(args.emit_anchored, "w") as f:
            json.dump(anchored, f)
        print(f"[ab] anchored capture written to {args.emit_anchored}\n")
        print(closing_control_md(anchored))
    print(f"[ab] raw artifacts: {tmp}/old.json {tmp}/new.json")


if __name__ == "__main__":
    main()
