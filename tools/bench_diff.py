#!/usr/bin/env python3
"""Diff two graft.Bench per-query artifacts (bench/last_run.json schema).

The one-line stdout JSON the driver captures is a LOG TAIL and has
truncated mid-map two rounds running; the bench now persists its own
complete artifact per run (and rotates the previous one to
last_run_prev.json), so every regression is adjudicable from the repo
alone. This tool renders the round-over-round comparison for COVERAGE.

Usage: python3 tools/bench_diff.py [PREV] [CURR] [--threshold X]
  defaults: PREV=bench/last_run_prev.json CURR=bench/last_run.json
  threshold: only report queries whose median moved by more than X×
             (default 1.5) AND by more than 0.2 s absolute.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    raw = sys.argv[1:]
    args = []
    thr = 1.5
    i = 0
    while i < len(raw):
        a = raw[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(raw):
                    sys.exit("--threshold needs a value")
                thr = float(raw[i + 1])
                i += 1  # consume the value, it is not a positional path
        else:
            args.append(a)
        i += 1
    prev_path = args[0] if len(args) > 0 else "bench/last_run_prev.json"
    curr_path = args[1] if len(args) > 1 else "bench/last_run.json"
    prev, curr = load(prev_path), load(curr_path)
    pq = {k: v["median_sec"] for k, v in prev["queries"].items()
          if "error" not in v}
    cq = {k: v["median_sec"] for k, v in curr["queries"].items()
          if "error" not in v}
    shared = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    def fingerprint(tag, art):
        """Surface the machine-load fingerprint (round-13: the artifact
        self-labels contended runs so a q242-style phantom regression is
        adjudicable without re-running). Absent in pre-r13 artifacts."""
        if "loadavg_start" not in art:
            return
        wall = art.get("wall_sec", 0.0)
        total = art.get("total_sec", 0.0)
        cpus = art.get("host_cpus", 0)
        if "contended" in art:
            # the run labelled itself (graft.tools.BenchStats, one
            # definition) — trust the artifact
            contended = art["contended"]
        else:
            # pre-field artifact: re-derive with the same formula.
            # each query executed reps + warmup times but is counted
            # once in total_sec
            runs = max(art.get("reps", 1) + art.get("warmup", 0), 1)
            try:
                load1 = float(str(art["loadavg_start"]).split()[0])
            except (ValueError, IndexError):
                load1 = 0.0
            contended = (total > 30 and wall > 3 * runs * total) or \
                (cpus and load1 > cpus)
        flag = "  ** CONTENDED RUN **" if contended else ""
        print(f"  {tag} fingerprint: wall={wall}s queries={total}s "
              f"loadavg_start={art['loadavg_start']} "
              f"loadavg_end={art.get('loadavg_end', '?')} "
              f"host_cpus={cpus} "
              f"remeasured={art.get('n_remeasured', 0)}{flag}")

    print(f"prev: {prev_path} total={prev['total_sec']}s "
          f"n={prev['n_queries']} sf={prev['sf']}")
    fingerprint("prev", prev)
    print(f"curr: {curr_path} total={curr['total_sec']}s "
          f"n={curr['n_queries']} sf={curr['sf']}")
    fingerprint("curr", curr)
    remeasured = sorted(k for k, v in curr["queries"].items()
                        if v.get("remeasured"))
    if remeasured:
        print(f"remeasured this run ({len(remeasured)}): "
              f"{', '.join(remeasured)}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    moved = []
    for k in shared:
        a, b = pq[k], cq[k]
        ratio = b / a if a > 0 else float("inf")
        if (ratio > thr or ratio < 1 / thr) and abs(b - a) > 0.2:
            moved.append((ratio, k, a, b))
    if not moved:
        print(f"no per-query move beyond {thr}x and 0.2s "
              f"({len(shared)} shared queries)")
        return
    print(f"moved beyond {thr}x and 0.2s ({len(moved)}/{len(shared)}):")
    for ratio, k, a, b in sorted(moved, key=lambda t: -t[0]):
        arrow = "SLOWER" if ratio > 1 else "faster"
        print(f"  {k}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x {arrow})")


if __name__ == "__main__":
    main()
