#!/usr/bin/env python3
"""Render the conservative (per-query max over N runs) baseline table for
BASELINE.md from Bench JSON lines. Usage:
    python3 tools/make_baseline_section.py run1.json run2.json [...]
"""
import json
import sys


def load(path):
    text = open(path).read()
    return json.loads(text[text.index("{"):])


def main():
    runs = [load(p) for p in sys.argv[1:]]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    mx = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]
                and r["queries"][n] >= 0]
        if vals:
            mx[n] = max(vals)
    totals = ", ".join(f"{r['value']:.1f} s" for r in runs)
    print(f"**Total: {sum(mx.values()):.1f} s for all {len(mx)} queries** — "
          f"CONSERVATIVE: per-query MAX over {len(runs)} runs (totals {totals}).")
    print()
    print("| Query | sec |")
    print("|---|---|")
    for n in sorted(mx):
        print(f"| {n} | {mx[n]:.2f} |")


if __name__ == "__main__":
    main()
