"""Bench regression gate: diff two bench JSON records per query and fail
loudly on regressions (VERDICT r2 'Next round' #5 — round 2 silently
recorded a 123× dedup regression; this makes that impossible to miss).

Usage:
  python tools/bench_gate.py BENCH_r02.json /tmp/bench_new.json [--max-ratio 1.5]

Prints a per-query table of old/new seconds and the ratio, then exits 1 if
any query regressed by more than --max-ratio (default 1.5×).  Queries only
present on one side are listed but never fail the gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        rec = json.load(f)
    # driver-recorded BENCH_r*.json wraps the bench line under "parsed"
    if "queries" not in rec and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    q = dict(rec.get("queries", {}))
    if "value" in rec and "er_flagship" not in q:
        q["er_flagship"] = rec["value"]
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def gate(old: dict[str, float], new: dict[str, float], max_ratio: float):
    rows = []
    failures = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None or o == 0:
            rows.append((name, o, n, None, "only-one-side" if (o is None) != (n is None) else ""))
            continue
        ratio = n / o
        flag = ""
        if ratio > max_ratio:
            flag = f"REGRESSION >{max_ratio}x"
            failures.append(name)
        elif ratio < 1 / max_ratio:
            flag = "improved"
        rows.append((name, o, n, ratio, flag))
    return rows, failures


def format_rows(rows) -> str:
    w = max(len(r[0]) for r in rows) if rows else 10
    lines = [f"{'query'.ljust(w)}  {'old_s':>9}  {'new_s':>9}  {'ratio':>7}  note"]
    for name, o, n, ratio, flag in rows:
        os_ = f"{o:.2f}" if o is not None else "-"
        ns_ = f"{n:.2f}" if n is not None else "-"
        rs_ = f"{ratio:.2f}x" if ratio is not None else "-"
        lines.append(f"{name.ljust(w)}  {os_:>9}  {ns_:>9}  {rs_:>7}  {flag}")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--max-ratio", type=float, default=1.5)
    args = p.parse_args(argv)
    rows, failures = gate(load_queries(args.old), load_queries(args.new),
                          args.max_ratio)
    print(format_rows(rows))
    if failures:
        print(f"\nGATE FAILED: {len(failures)} quer{'y' if len(failures)==1 else 'ies'} "
              f"regressed >{args.max_ratio}x vs {args.old}: {', '.join(failures)}")
        return 1
    print(f"\ngate ok: no query regressed >{args.max_ratio}x vs {args.old}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
