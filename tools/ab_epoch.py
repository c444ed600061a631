"""Interleaved A/B per-tick epoch-cost comparison between two library trees.

Runs ``tools/epoch_profile.py`` from tree A and tree B alternately
(A,B,A,B,... — each rep a fresh subprocess/JVM) and reports the per-tick
BEST across reps for each side. Interleaving is the whole point: this VM
shares a physical host and single runs swing ±30% from co-tenant steal, so
only paired same-session runs support a claim that one build is faster.

    python tools/ab_epoch.py --base /tmp/ab_base --reps 3 -- --ticks 6

Tree A ("base") is typically a ``git archive <rev>`` export; tree B is this
repo. Everything after ``--`` is passed through to epoch_profile.py.
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TICK_RE = re.compile(r"^tick (\d+): ([\d.]+)s")


def run_one(tree: str, extra: list[str]) -> dict[int, float]:
    prof = os.path.join(tree, "tools", "epoch_profile.py")
    env = dict(os.environ, PYTHONPATH=tree)
    out = subprocess.run(
        [sys.executable, prof, *extra],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    ticks: dict[int, float] = {}
    for line in out.stdout.splitlines():
        m = TICK_RE.match(line.strip())
        if m:
            ticks[int(m.group(1))] = float(m.group(2))
    if not ticks:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit(f"no ticks parsed from {prof}")
    return ticks


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True, help="tree A (e.g. a git archive export)")
    ap.add_argument("--head", default=REPO, help="tree B (default: this repo)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--base-args", default="",
                    help="extra epoch_profile args for the base side only")
    ap.add_argument("--head-args", default="",
                    help="extra epoch_profile args for the head side only")
    ap.add_argument("extra", nargs="*", help="args after -- go to epoch_profile.py")
    args = ap.parse_args()
    side_extra = {
        "base": args.extra + args.base_args.split(),
        "head": args.extra + args.head_args.split(),
    }

    runs: dict[str, list[dict[int, float]]] = {"base": [], "head": []}
    for rep in range(args.reps):
        for name, tree in (("base", args.base), ("head", args.head)):
            ticks = run_one(tree, side_extra[name])
            runs[name].append(ticks)
            print(f"rep {rep} {name}: " + " ".join(
                f"t{k}={v:.2f}" for k, v in sorted(ticks.items())
            ), flush=True)

    common = sorted(
        set.intersection(*(set(t) for side in runs.values() for t in side))
    )
    print("\nper-tick best-of-%d (seconds):" % args.reps)
    print(f"{'tick':>4} {'base':>8} {'head':>8} {'delta':>8}")
    b_tot = h_tot = 0.0
    for k in common:
        b = min(t[k] for t in runs["base"])
        h = min(t[k] for t in runs["head"])
        b_tot += b
        h_tot += h
        print(f"{k:>4} {b:>8.2f} {h:>8.2f} {h - b:>+8.2f}")
    # steady-state = all ticks after the first (tick 0 pays JVM/codegen
    # warm-up inside the subprocess)
    sb = statistics.mean(min(t[k] for t in runs["base"]) for k in common[1:])
    sh = statistics.mean(min(t[k] for t in runs["head"]) for k in common[1:])
    print(f"\nsteady-state mean (ticks>0): base={sb:.2f}s head={sh:.2f}s "
          f"({(sh - sb) / sb * 100:+.1f}%)")


if __name__ == "__main__":
    main()
