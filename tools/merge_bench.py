#!/usr/bin/env python3
"""Merge N full-Bench JSON lines into the per-query min-of-N record.

The committed BENCHLOCAL_r{N}.json is a quiet-host min-of-N: each query's
best of the runs, summed. This codifies the merge the rounds have been
doing by hand, so the recipe is reproducible:

    for i in 1 2 3; do
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        sbt -batch 'runMain graft.Bench' 2>/dev/null \
        | grep -o '{"metric".*}' > /tmp/bench_run$i.json
    done
    python3 tools/merge_bench.py /tmp/bench_run*.json \
        -o BENCHLOCAL_rNN.json -n "min-of-3 on <tree description>"

Prints the total, the worst anchor ratios (vs BASELINE_ANCHOR.json when
present) and any query over the 2x gate. Remember to delete the
BENCHLOCAL_r*_rerun*.json sidecars the individual full runs auto-land.
"""
import argparse
import json
import math
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="full-Bench JSON files (>= 2)")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("-n", "--note", default="")
    ap.add_argument("--anchor", default="BASELINE_ANCHOR.json")
    ap.add_argument("--allow-empty-anchor", action="store_true",
                    help="exit 0 even when the anchor file shares no "
                         "queries with the merged runs (default: exit 3 so "
                         "a mis-pointed anchor fails loudly in scripts)")
    args = ap.parse_args()

    runs = [json.load(open(p)) for p in args.runs]
    if len(runs) < 2:
        print("need >= 2 runs for a min-of-N", file=sys.stderr)
        return 2
    names = sorted(runs[0]["queries"])
    for i, r in enumerate(runs):
        if sorted(r["queries"]) != names:
            print(f"run {args.runs[i]} has a different query set", file=sys.stderr)
            return 2
    failed = sorted(n for n in names
                    if any(r["queries"][n] < 0 for r in runs))
    if failed:
        print(f"FAILED queries in at least one run: {failed}", file=sys.stderr)
        return 2
    mins = {n: min(r["queries"][n] for r in runs) for n in names}
    total = round(sum(mins.values()), 3)
    # drain-family host-floor calibration (round 17): carry the min across
    # runs (the quiet floor) plus the per-run list, so drain-family entries
    # in this record can be normalized against other records' floors
    calibs = [r["calib_drain_sec"] for r in runs
              if isinstance(r.get("calib_drain_sec"), (int, float))
              and r["calib_drain_sec"] > 0]
    out = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": {n: round(v, 3) for n, v in mins.items()},
        "sf": runs[0].get("sf", ""),
        **({"calib_drain_sec": min(calibs),
            "calib_drain_sec_runs": calibs} if calibs else {}),
        "note": args.note or (
            "min-of-%d (run totals %s)" % (
                len(runs),
                "/".join("%.1f" % r["value"] for r in runs))),
    }
    json.dump(out, open(args.out, "w"))
    print(f"wrote {args.out}: total {total} (runs "
          + ", ".join("%.1f" % r["value"] for r in runs) + ")")

    if os.path.exists(args.anchor):
        aq = json.load(open(args.anchor))
        aq = aq.get("queries", aq)
        common = [n for n in names if n in aq and aq[n] > 0]
        if not common:
            # the record was still written; the distinct exit code exists so
            # scripted runs notice a mis-pointed anchor instead of treating
            # "no ratio computed" as success (round-17 advice)
            print("anchor: no overlapping queries with anchor file "
                  f"{args.anchor} — skipping ratio/geomean report",
                  file=sys.stderr)
            if args.allow_empty_anchor:
                return 0
            print("(pass --allow-empty-anchor to make this non-fatal)",
                  file=sys.stderr)
            return 3
        geo = math.exp(sum(math.log(mins[n] / aq[n]) for n in common)
                       / len(common))
        # ratio over the COMMON query set on both sides: summing all-run
        # `total` against an anchor sum restricted to `common` inflates the
        # ratio whenever the anchor file is missing queries
        absent = sum(1 for n in names if n not in aq)
        nonpos = sum(1 for n in names if n in aq and aq[n] <= 0)
        notes = ([f"{absent} absent from anchor excluded"] if absent else []) \
            + ([f"{nonpos} with non-positive anchor excluded"] if nonpos
               else [])
        print(f"anchor: total ratio "
              f"{sum(mins[n] for n in common) / sum(aq[n] for n in common):.3f}"
              f" ({len(common)} queries"
              + ("".join(", " + x for x in notes))
              + f"), per-query geomean {geo:.3f}")
        over = [n for n in common if mins[n] > 2 * aq[n]]
        print(f"over 2x gate: {over or 'none'}")
        worst = sorted(((mins[n] / aq[n], n) for n in common),
                       reverse=True)[:5]
        print("worst ratios: "
              + ", ".join(f"{n} {r:.2f}x" for r, n in worst))
    return 0


if __name__ == "__main__":
    sys.exit(main())
