#!/usr/bin/env python3
"""Benchmark regression comparator.

Reference parity: scripts/rocalution-bench-regression.py (percentage-
tolerance comparison between two benchmark JSON outputs). This repo's
bench harness (bench.py) prints one JSON line with a headline metric and
a ``detail`` dict of per-op numbers; the driver stores them as
BENCH_r{N}.json. This tool diffs two such files (or the last two in the
repo) and exits nonzero when any watched metric regresses by more than
the tolerance.

Metric direction is inferred from the name: throughput-like metrics
(*_gbps, *_gflops) regress when they DROP; cost-like metrics (*_ms,
*_iters) regress when they RISE. Unknown suffixes are reported but never
fail the run.

Usage:
  python scripts/bench_regression.py OLD.json NEW.json [--tol 10]
  python scripts/bench_regression.py            # last two BENCH_r*.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

HIGHER_IS_BETTER = ("_gbps", "_gflops", "_bandwidth", "efficiency")
LOWER_IS_BETTER = ("_ms", "_iters", "_us", "_s")


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # Accept (a) the bare bench JSON line, (b) the driver's BENCH_rN.json
    # wrapper (whole-file JSON with the bench output under "parsed"),
    # (c) a log with the JSON line embedded somewhere.
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "metric" in doc:
                return doc
            inner = doc.get("parsed")
            if isinstance(inner, dict):
                return inner
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise ValueError(f"{path}: no JSON object found")


def flatten(doc: dict) -> dict:
    out = {}
    if "metric" in doc and "value" in doc:
        out[str(doc["metric"])] = float(doc["value"])
    for k, v in (doc.get("detail") or {}).items():
        if isinstance(v, (int, float)):
            out[str(k)] = float(v)
    return out


def direction(name: str) -> int:
    """+1 higher-is-better, -1 lower-is-better, 0 informational.

    Cost suffixes are checked FIRST and by endswith only, so a cost metric
    whose name merely contains a throughput word (e.g. 'amg_efficiency_ms')
    classifies as lower-is-better."""
    for suf in LOWER_IS_BETTER:
        if name.endswith(suf):
            return -1
    for suf in HIGHER_IS_BETTER:
        if name.endswith(suf) or suf in name:
            return 1
    return 0


def compare(old: dict, new: dict, tol_pct: float):
    regressions, report = [], []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if a == 0:
            continue
        change = (b - a) / abs(a) * 100.0
        d = direction(name)
        bad = d != 0 and (-d * change) > tol_pct
        report.append((name, a, b, change, bad))
        if bad:
            regressions.append(name)
    return regressions, report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", help="baseline bench JSON")
    ap.add_argument("new", nargs="?", help="candidate bench JSON")
    ap.add_argument("--tol", type=float, default=10.0,
                    help="allowed regression, percent (default 10)")
    args = ap.parse_args(argv)

    old_path, new_path = args.old, args.new
    if old_path is None or new_path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        runs = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
        if len(runs) < 2:
            print("need two BENCH_r*.json files or explicit paths",
                  file=sys.stderr)
            return 2
        old_path, new_path = runs[-2], runs[-1]

    old = flatten(load(old_path))
    new = flatten(load(new_path))
    if not old or not new:
        print(f"FAIL: no metrics parsed from "
              f"{old_path if not old else new_path} — nothing compared",
              file=sys.stderr)
        return 2
    if not set(old) & set(new):
        print("FAIL: metric sets are disjoint — nothing compared",
              file=sys.stderr)
        return 2
    regressions, report = compare(old, new, args.tol)

    print(f"comparing {old_path} -> {new_path}  (tol {args.tol}%)")
    for name, a, b, change, bad in report:
        flag = " REGRESSION" if bad else ""
        print(f"  {name:32s} {a:12.3f} -> {b:12.3f}  {change:+8.1f}%{flag}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("  dropped metrics:", ", ".join(only_old))
    if only_new:
        print("  new metrics:", ", ".join(only_new))

    if regressions:
        print(f"FAIL: {len(regressions)} metric(s) regressed > {args.tol}%: "
              + ", ".join(regressions))
        return 1
    print("OK: no regressions beyond tolerance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
