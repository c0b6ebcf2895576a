#!/usr/bin/env python3
"""Self-test for tools/merge_bench.py — run `python3 tools/test_merge_bench.py`.

Codifies the round-17 contract additions so a future edit can't silently
regress them: calib_drain_sec carry (min + per-run list), the distinct
exit code 3 for a disjoint anchor (round-17 advice: exit 0 let scripted
runs treat 'no ratio computed' as success), --allow-empty-anchor, and the
pre-existing failure modes (single run, mismatched query sets, failed
queries).
"""
import json
import os
import subprocess
import sys
import tempfile

TOOL = os.path.join(os.path.dirname(__file__), "merge_bench.py")


def run(*args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True)


def main() -> int:
    failures = []

    def check(name, cond, detail=""):
        status = "ok" if cond else "FAIL"
        print(f"  {status}  {name}" + (f"  ({detail})" if detail and not cond else ""))
        if not cond:
            failures.append(name)

    with tempfile.TemporaryDirectory() as d:
        r1 = {"metric": "total", "value": 3.0, "unit": "sec",
              "queries": {"q_a": 1.0, "q_b": 2.0}, "sf": "x",
              "calib_drain_sec": 1.5}
        r2 = {"metric": "total", "value": 2.5, "unit": "sec",
              "queries": {"q_a": 0.9, "q_b": 1.6}, "sf": "x",
              "calib_drain_sec": 1.2}
        for i, r in enumerate([r1, r2]):
            json.dump(r, open(f"{d}/r{i}.json", "w"))
        out = f"{d}/out.json"

        # --- min-of-N merge + calib carry -------------------------------
        anchor = f"{d}/anchor.json"
        json.dump({"queries": {"q_a": 1.0, "q_b": 2.0}}, open(anchor, "w"))
        p = run(f"{d}/r0.json", f"{d}/r1.json", "-o", out, "--anchor", anchor)
        check("overlapping anchor exits 0", p.returncode == 0, p.stderr)
        rec = json.load(open(out))
        check("per-query min", rec["queries"] == {"q_a": 0.9, "q_b": 1.6})
        check("total is sum of mins", rec["value"] == 2.5)
        check("calib min carried", rec.get("calib_drain_sec") == 1.2)
        check("calib runs keyed by filename",
              rec.get("calib_drain_sec_runs") == {"r0.json": 1.5,
                                                  "r1.json": 1.2})

        # --- loadavg carry (round 20, r19 verdict ask #4) ----------------
        l1 = dict(r1, loadavg_start="3.70", loadavg_finish="1.10")
        l2 = dict(r2, loadavg_start="?")  # off-Linux marker, no finish
        json.dump(l1, open(f"{d}/l1.json", "w"))
        json.dump(l2, open(f"{d}/l2.json", "w"))
        p = run(f"{d}/l1.json", f"{d}/l2.json", "-o", out, "--anchor", anchor)
        check("loadavg merge exits 0", p.returncode == 0, p.stderr)
        rec = json.load(open(out))
        check("loadavg carried per run, '?' dropped",
              rec.get("loadavg_runs") ==
              {"l1.json": {"start": "3.70", "finish": "1.10"}},
              str(rec.get("loadavg_runs")))
        p = run(f"{d}/r0.json", f"{d}/r1.json", "-o", out, "--anchor", anchor)
        rec = json.load(open(out))
        check("no loadavg field when no run has one",
              "loadavg_runs" not in rec)

        # --- calib absent / invalid: no field, not a crash --------------
        r3 = dict(r1); r3.pop("calib_drain_sec")
        r4 = dict(r2); r4["calib_drain_sec"] = -1.0  # failed-calibration marker
        json.dump(r3, open(f"{d}/r3.json", "w"))
        json.dump(r4, open(f"{d}/r4.json", "w"))
        p = run(f"{d}/r3.json", f"{d}/r4.json", "-o", out, "--anchor", anchor)
        check("calib-less merge exits 0", p.returncode == 0, p.stderr)
        rec = json.load(open(out))
        check("no calib field when none valid",
              "calib_drain_sec" not in rec and
              "calib_drain_sec_runs" not in rec)

        # --- calib booleans rejected (True is an int in Python) ---------
        r7 = dict(r1); r7["calib_drain_sec"] = True
        json.dump(r7, open(f"{d}/r7.json", "w"))
        p = run(f"{d}/r7.json", f"{d}/r1.json", "-o", out, "--anchor", anchor)
        check("bool calib merge exits 0", p.returncode == 0, p.stderr)
        rec = json.load(open(out))
        check("bool calib excluded", rec.get("calib_drain_sec") == 1.2)
        check("bool calib not in run map",
              rec.get("calib_drain_sec_runs") == {"r1.json": 1.2})

        # --- colliding basenames fall back to full paths -----------------
        os.makedirs(f"{d}/sub")
        json.dump(r2, open(f"{d}/sub/r0.json", "w"))
        p = run(f"{d}/r0.json", f"{d}/sub/r0.json", "-o", out,
                "--anchor", anchor)
        check("colliding-basename merge exits 0", p.returncode == 0, p.stderr)
        rec = json.load(open(out))
        check("colliding basenames keyed by full path",
              rec.get("calib_drain_sec_runs") ==
              {f"{d}/r0.json": 1.5, f"{d}/sub/r0.json": 1.2},
              str(rec.get("calib_drain_sec_runs")))

        # --- drain-family raw + calib-normalized report ------------------
        d1 = {"metric": "total", "value": 3.1, "unit": "sec",
              "queries": {"q_stream_dedup": 2.1, "q_a": 1.0}, "sf": "x",
              "calib_drain_sec": 1.5}
        d2 = dict(d1, value=3.0,
                  queries={"q_stream_dedup": 2.1, "q_a": 0.9},
                  calib_drain_sec=1.4)
        json.dump(d1, open(f"{d}/d1.json", "w"))
        json.dump(d2, open(f"{d}/d2.json", "w"))
        danchor = f"{d}/danchor.json"
        json.dump({"queries": {"q_stream_dedup": 1.0, "q_a": 1.0},
                   "calib_drain_sec": 0.7}, open(danchor, "w"))
        p = run(f"{d}/d1.json", f"{d}/d2.json", "-o", out,
                "--anchor", danchor)
        check("drain report exits 0", p.returncode == 0, p.stderr)
        check("drain raw ratio printed", "raw 2.10x" in p.stdout, p.stdout)
        check("drain normalized ratio printed (0.7/1.4 scale)",
              "calib-norm 1.05x" in p.stdout, p.stdout)
        check("over-2x-raw-under-2x-norm flagged as host floor",
              "host floor" in p.stdout and "q_stream_dedup" in
              p.stdout.split("host floor")[-1], p.stdout)
        # anchor without a calib stamp: raw-only column + loud note,
        # recoverable via --anchor-calib
        json.dump({"queries": {"q_stream_dedup": 1.0, "q_a": 1.0}},
                  open(danchor, "w"))
        p = run(f"{d}/d1.json", f"{d}/d2.json", "-o", out,
                "--anchor", danchor)
        check("calib-less anchor prints raw-only drain column",
              "raw ratios only" in p.stdout and "raw 2.10x" in p.stdout,
              p.stdout)
        p = run(f"{d}/d1.json", f"{d}/d2.json", "-o", out,
                "--anchor", danchor, "--anchor-calib", "0.7")
        check("--anchor-calib restores normalized column",
              "calib-norm 1.05x" in p.stdout, p.stdout)

        # --- disjoint anchor: loud by default, opt-out flag -------------
        json.dump({"queries": {"q_zzz": 1.0}}, open(anchor, "w"))
        p = run(f"{d}/r0.json", f"{d}/r1.json", "-o", out, "--anchor", anchor)
        check("disjoint anchor exits 3", p.returncode == 3, str(p.returncode))
        check("record still written on disjoint anchor",
              json.load(open(out))["value"] == 2.5)
        p = run(f"{d}/r0.json", f"{d}/r1.json", "-o", out, "--anchor", anchor,
                "--allow-empty-anchor")
        check("--allow-empty-anchor exits 0", p.returncode == 0, p.stderr)

        # --- missing anchor file: not an error (dev hosts) --------------
        p = run(f"{d}/r0.json", f"{d}/r1.json", "-o", out,
                "--anchor", f"{d}/nope.json")
        check("absent anchor file exits 0", p.returncode == 0, p.stderr)

        # --- duplicate run inputs rejected (ADVICE r18) -------------------
        p = run(f"{d}/r0.json", f"{d}/r0.json", "-o", f"{d}/dup.json")
        check("duplicated run path exits 2", p.returncode == 2,
              str(p.returncode))
        check("duplicate rejection writes nothing",
              not os.path.exists(f"{d}/dup.json"))
        rel0 = os.path.relpath(f"{d}/r0.json")
        p = run(f"{d}/r0.json", rel0, "-o", f"{d}/dup.json")
        check("two spellings of one file exit 2", p.returncode == 2,
              str(p.returncode))
        # hardlinks share an inode but not a realpath (ADVICE r19): the
        # degenerate min-of-N must still be rejected
        try:
            os.link(f"{d}/r0.json", f"{d}/r0_hardlink.json")
            p = run(f"{d}/r0.json", f"{d}/r0_hardlink.json",
                    "-o", f"{d}/dup.json")
            check("hardlinked duplicate exits 2", p.returncode == 2,
                  str(p.returncode))
            check("hardlink rejection writes nothing",
                  not os.path.exists(f"{d}/dup.json"))
        except OSError as e:
            print(f"  skip hardlinked duplicate (os.link unsupported: {e})")

        # --- non-positive --anchor-calib rejected (ADVICE r18) ------------
        p = run(f"{d}/d1.json", f"{d}/d2.json", "-o", f"{d}/dup.json",
                "--anchor", danchor, "--anchor-calib", "0")
        check("--anchor-calib 0 exits 2", p.returncode == 2,
              str(p.returncode))
        p = run(f"{d}/d1.json", f"{d}/d2.json", "-o", f"{d}/dup.json",
                "--anchor", danchor, "--anchor-calib", "-0.7")
        check("negative --anchor-calib exits 2", p.returncode == 2,
              str(p.returncode))
        check("rejected --anchor-calib writes nothing",
              not os.path.exists(f"{d}/dup.json"))

        # --- pre-existing failure modes ----------------------------------
        p = run(f"{d}/r0.json", "-o", out)
        check("single run exits 2", p.returncode == 2, str(p.returncode))
        r5 = dict(r1); r5["queries"] = {"q_a": 1.0}
        json.dump(r5, open(f"{d}/r5.json", "w"))
        p = run(f"{d}/r0.json", f"{d}/r5.json", "-o", out)
        check("mismatched query sets exit 2", p.returncode == 2,
              str(p.returncode))
        r6 = dict(r1); r6["queries"] = {"q_a": -1.0, "q_b": 2.0}
        json.dump(r6, open(f"{d}/r6.json", "w"))
        p = run(f"{d}/r0.json", f"{d}/r6.json", "-o", out)
        check("failed query (-1) exits 2", p.returncode == 2,
              str(p.returncode))

    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all merge_bench self-tests passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
