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

# The RocksDB/micro-batch drain family: queries whose wall time is
# dominated by a HOST-BOOT-DEPENDENT fixed floor (r16 settlement — the
# family floats ~1.4x between boots by one common factor while CPU-bound
# queries reproduce exactly). Their anchor ratios are reported both raw
# and normalized by the calib_drain_sec floor stamps, so a cold-boot
# floor can't masquerade as a code regression. Must match the
# drainCalibFamily set in src/main/scala/graft/Bench.scala.
DRAIN_FAMILY = (
    "q_doc_pipeline", "q_session_window", "q_state_inspect",
    "q_stateful_indicators", "q_stream_dedup", "q_stream_join",
    "q_stream_outer_join", "q_stream_session", "q_stream_static",
    "q_stream_tumbling", "q_tws_sessions", "q_tws_totals")

EPILOG = """\
exit codes:
  0  merged record written (and anchor report printed when an anchor
     file with overlapping queries exists)
  2  bad input: fewer than 2 runs, mismatched query sets, or a failed
     (-1) query in any run — nothing written
  3  record WAS written, but the anchor file shares no queries with the
     merged runs (mis-pointed anchor; round-17 change — was exit 0).
     Pass --allow-empty-anchor to restore exit 0 for that case.
"""


def main() -> int:
    ap = argparse.ArgumentParser(
        epilog=EPILOG, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("runs", nargs="+", help="full-Bench JSON files (>= 2)")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("-n", "--note", default="")
    ap.add_argument("--anchor", default="BASELINE_ANCHOR.json")
    ap.add_argument("--allow-empty-anchor", action="store_true",
                    help="exit 0 even when the anchor file shares no "
                         "queries with the merged runs (default: exit 3 so "
                         "a mis-pointed anchor fails loudly in scripts)")
    ap.add_argument("--anchor-calib", type=float, default=None,
                    help="drain-floor stamp (seconds) for the ANCHOR "
                         "session, overriding the anchor file's "
                         "calib_drain_sec; used to print drain-family "
                         "ratios calib-normalized alongside raw")
    args = ap.parse_args()

    # a duplicated run file is never an intentional min-of-N input: the
    # "min" degenerates to fewer effective runs and (post-dedup by key)
    # calib_drain_sec_runs entries silently collapse (ADVICE r18).
    # Identity is (st_dev, st_ino) when the file exists — realpath alone
    # misses hardlinks / bind mounts to the same inode (ADVICE r19);
    # realpath remains the fallback key for not-yet-existing paths and
    # the reported spelling either way.
    def file_key(p):
        try:
            st = os.stat(p)
            return (st.st_dev, st.st_ino)
        except OSError:
            return os.path.realpath(p)
    keys_ = [file_key(p) for p in args.runs]
    if len(set(keys_)) != len(keys_):
        dupes = sorted({os.path.realpath(p)
                        for p, k in zip(args.runs, keys_)
                        if keys_.count(k) > 1})
        print(f"duplicate run files (same path or same file): {dupes}",
              file=sys.stderr)
        return 2
    # 0 is falsy and a negative floor yields nonsense normalized ratios;
    # both must fail loudly, not fall into the raw-only branch (ADVICE r18)
    if args.anchor_calib is not None and not args.anchor_calib > 0:
        print(f"--anchor-calib must be a positive drain-floor in seconds, "
              f"got {args.anchor_calib}", file=sys.stderr)
        return 2

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
    # runs (the quiet floor) plus the per-run values keyed by run filename
    # (round-18, r17 advice: a plain list lost which run a value came from
    # whenever some runs lacked the field), so drain-family entries in this
    # record can be normalized against other records' floors. bool is
    # excluded explicitly — in Python True is an int, so a malformed
    # calib_drain_sec:true would otherwise be carried as 1.0.
    def valid_calib(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool) \
            and v > 0
    # keys: basenames when unique (the readable common case), full paths
    # as passed otherwise — two runs named run.json in different dirs must
    # not silently collapse to one calib entry
    basenames = [os.path.basename(p) for p in args.runs]
    keys = basenames if len(set(basenames)) == len(basenames) else args.runs
    calibs = {k: r["calib_drain_sec"]
              for k, r in zip(keys, runs)
              if valid_calib(r.get("calib_drain_sec"))}
    # host-posture stamps (round 20, r19 verdict ask #4): each run's
    # start/finish 1-min loadavg, carried per run so a future triage can
    # tell "started loaded" from "got loaded" without shell archaeology.
    # "?" is Bench's off-Linux marker — nothing to carry.
    loads = {}
    for k, r in zip(keys, runs):
        entry = {f[len("loadavg_"):]: r[f]
                 for f in ("loadavg_start", "loadavg_finish")
                 if isinstance(r.get(f), str) and r[f] not in ("", "?")}
        if entry:
            loads[k] = entry
    out = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": {n: round(v, 3) for n, v in mins.items()},
        "sf": runs[0].get("sf", ""),
        **({"calib_drain_sec": min(calibs.values()),
            "calib_drain_sec_runs": calibs} if calibs else {}),
        **({"loadavg_runs": loads} if loads else {}),
        "note": args.note or (
            "min-of-%d (run totals %s)" % (
                len(runs),
                "/".join("%.1f" % r["value"] for r in runs))),
    }
    json.dump(out, open(args.out, "w"))
    print(f"wrote {args.out}: total {total} (runs "
          + ", ".join("%.1f" % r["value"] for r in runs) + ")")

    if os.path.exists(args.anchor):
        adoc = json.load(open(args.anchor))
        aq = adoc.get("queries", adoc)
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
        # Drain-family triage (round-18, per the r17 verdict): the family's
        # wall time floats with a host-boot-dependent floor, so its raw
        # anchor ratio (what the driver's 2x gate sees) is printed NEXT TO
        # the calib-normalized ratio raw * (anchor_floor / record_floor).
        # A family entry whose raw ratio moved but whose normalized ratio
        # held is the host floor moving, not a code/plan change.
        fam = [n for n in DRAIN_FAMILY if n in common]
        rec_calib = out.get("calib_drain_sec")
        anc_calib = args.anchor_calib
        if anc_calib is None and valid_calib(adoc.get("calib_drain_sec")):
            anc_calib = adoc["calib_drain_sec"]
        if fam and rec_calib and anc_calib:
            scale = anc_calib / rec_calib
            print(f"drain family (floor calib: record {rec_calib:.3f} s, "
                  f"anchor {anc_calib:.3f} s, scale {scale:.2f}):")
            for n in fam:
                raw = mins[n] / aq[n]
                print(f"  {n:<24} raw {raw:.2f}x  calib-norm "
                      f"{raw * scale:.2f}x")
            floor_only = [n for n in fam if mins[n] > 2 * aq[n]
                          and mins[n] / aq[n] * scale <= 2]
            if floor_only:
                print("over 2x raw but under 2x calib-normalized (host "
                      f"floor, not code): {floor_only}")
        elif fam:
            missing = [w for w, c in
                       [("record", rec_calib), ("anchor", anc_calib)]
                       if not c]
            print("drain family: raw ratios only — no calib stamp on "
                  + "/".join(missing)
                  + " (pass --anchor-calib to supply the anchor floor)")
            for n in fam:
                print(f"  {n:<24} raw {mins[n] / aq[n]:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
