#!/usr/bin/env python3
"""Interleaved subset A/B: alternating old-tree / new-tree bench
processes, the decision protocol OPTIMIZATION_r15/r16 use.

Why not bench_ab.py: that tool runs old once then new once, so a slow
box-regime drift between the two captures reads as a code delta. This
one alternates N pairs of short subset captures (old,new,new,old,...)
so every regime phase samples both sides, and reports paired deltas
plus an untouched CONTROL query whose |delta| bounds the capture's
noise.

Usage:
    python3 tools/bench_interleave.py --old <commit> \
        --only q_degree_hist,q_shingle_jaccard --control q_shingle_jaccard \
        [--pairs 4] [--runs 3] [--cpus 32] [--sf-dir /root/testdata/sf0.1] \
        [--out report.md]

The old side runs in a throwaway worktree at --old; the new side is
the current working tree (committed or dirty). Order alternates per
pair. Per side and query the summary gives min and median over the
pair processes' own min-of-runs values.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, cwd=REPO, check=True):
    return subprocess.run(args, cwd=cwd, check=check, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)


def wait_idle(timeout_s=600, threshold=0.8):
    import time
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
        if load < threshold:
            return load
        print(f"[iab] waiting for idle box (load {load:.2f}) ...", flush=True)
        time.sleep(15)
    return load


def compile_tree(tree, label):
    print(f"[iab] compiling {label} in {tree} ...", flush=True)
    c = sh(["sbt", "-batch", "compile"], cwd=tree, check=False)
    if c.returncode != 0:
        sys.exit(f"[iab] {label} compile FAILED:\n" +
                 "\n".join(c.stdout.splitlines()[-15:]))


def bench_once(tree, label, args, out_path):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_BENCH_FLOOR", None)
    env.update({
        "SPARK_GRAFT_SF_DIR": args.sf_dir,
        "SPARK_GRAFT_CPUS": str(args.cpus),
        "SPARK_GRAFT_RUNS": str(args.runs),
        "SPARK_GRAFT_ONLY": args.only,
        "SPARK_GRAFT_BENCH_OUT": out_path,
    })
    wait_idle()
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=tree,
                       env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
    if r.returncode != 0:
        sys.exit(f"[iab] {label} bench FAILED:\n" +
                 "\n".join(r.stdout.splitlines()[-15:]))
    with open(out_path) as f:
        art = json.loads(f.read())
    if art.get("methodology", {}).get("floor_probe"):
        sys.exit(f"[iab] {label}: artifact is a floor probe; unset "
                 "SPARK_GRAFT_BENCH_FLOOR")
    if art.get("n_errors", 0) > 0:
        sys.exit(f"[iab] {label}: query errors in capture: {art.get('errors')}")
    return art["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="commit for the OLD side")
    ap.add_argument("--only", required=True,
                    help="comma list of queries (include the control)")
    ap.add_argument("--control", default=None,
                    help="untouched query whose delta bounds capture noise")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    old_commit = sh(["git", "rev-parse", args.old]).stdout.strip()
    head = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    dirty = bool(sh(["git", "status", "--porcelain"]).stdout.strip())

    tmp = tempfile.mkdtemp(prefix="graft-iab-")
    wt = os.path.join(tmp, "old")
    sh(["git", "worktree", "add", "--detach", wt, old_commit])
    queries = [q.strip() for q in args.only.split(",") if q.strip()]
    samples = {"old": {q: [] for q in queries}, "new": {q: [] for q in queries}}
    try:
        compile_tree(wt, f"OLD {old_commit[:9]}")
        compile_tree(REPO, f"NEW {head[:9]}{'+dirty' if dirty else ''}")
        for p in range(args.pairs):
            order = [("old", wt), ("new", REPO)] if p % 2 == 0 \
                else [("new", REPO), ("old", wt)]
            for side, tree in order:
                out = os.path.join(tmp, f"{side}_{p}.json")
                qmap = bench_once(tree, f"pair {p + 1}/{args.pairs} {side}",
                                  args, out)
                for q in queries:
                    if q in qmap:
                        samples[side][q].append(qmap[q])
                print(f"[iab] pair {p + 1} {side}: " +
                      " ".join(f"{q}={qmap.get(q, float('nan')):.3f}"
                               for q in queries), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)

    lines = [f"# Interleaved A/B — {old_commit[:9]} vs "
             f"{head[:9]}{' (+uncommitted)' if dirty else ''}",
             "",
             f"Protocol: {args.pairs} pairs, order-alternating, "
             f"SPARK_GRAFT_RUNS={args.runs} per process, min-of-runs per "
             f"process, sf={args.sf_dir}, cpus={args.cpus}."
             + (f" Control: {args.control}." if args.control else ""),
             "",
             "| query | old min | new min | Δmin | old med | new med | Δmed |",
             "|---|---|---|---|---|---|---|"]
    for q in queries:
        o, n = samples["old"][q], samples["new"][q]
        if not o or not n:
            lines.append(f"| {q} | (missing) | | | | | |")
            continue
        om, nm = min(o), min(n)
        od, nd = statistics.median(o), statistics.median(n)
        tag = " (control)" if q == args.control else ""
        lines.append(
            f"| {q}{tag} | {om:.3f} | {nm:.3f} | {(nm - om) / om * 100:+.1f}% "
            f"| {od:.3f} | {nd:.3f} | {(nd - od) / od * 100:+.1f}% |")
    lines.append("")
    lines.append("Per-process samples (min-of-runs):")
    for side in ("old", "new"):
        for q in queries:
            vals = ", ".join(f"{v:.3f}" for v in samples[side][q])
            lines.append(f"- {side} {q}: [{vals}]")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
