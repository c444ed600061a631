"""Diff two bench JSON outputs (bench.py lines or driver BENCH_r*.json).

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.15]

Accepts either the raw one-line bench.py output or the driver's wrapper
({"parsed": {...}}); prints per-query deltas sorted by regression size
and flags moves beyond the threshold (the ±30% single-run host noise
makes small deltas meaningless — compare interleaved medians only).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        delta = (b - a) / a if a else 0.0
        flag = ""
        if abs(delta) >= args.threshold:
            flag = "REGRESSED" if delta > 0 else "improved"
        rows.append((-(b - a if a else 0), name, a, b, flag))
    rows.sort()
    print(f"{'query':36} {'old':>8} {'new':>8} {'delta':>8}")
    for _, name, a, b, flag in rows:
        if a is None or b is None:
            print(f"{name:36} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8} {'':>8} {flag}")
        else:
            print(f"{name:36} {a:8.2f} {b:8.2f} {100*(b-a)/a:+7.1f}% {flag}")
    if "value" in old and "value" in new and old["value"]:
        t0, t1 = old["value"], new["value"]
        print(f"\nthroughput: {t0:,.0f} -> {t1:,.0f} URLs/s "
              f"({100*(t1-t0)/t0:+.1f}%)")
    if "total_query_sec" in old and "total_query_sec" in new:
        print(f"total_query_sec: {old['total_query_sec']} -> "
              f"{new['total_query_sec']}")


if __name__ == "__main__":
    main()
