#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with a view
per parquet table in <sfDir>, and compares: columns sorted by name, rows
sorted, values stringified (floats via repr of float64). Reports per query.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(round(v, 9)))
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return [colnames[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Optional: --only q_a,q_b restricts the compare to named queries
    # (seconds instead of ~15 min when iterating on a new query).
    only = None
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = set(sys.argv[4].split(","))
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    dirs = [d for d in sorted(os.listdir(out_dir))
            if os.path.isdir(os.path.join(out_dir, d))
            and (only is None or d in only)]
    for name in dirs:
        try:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            t = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(
                os.path.join(out_dir, name))
            spark_cols = t.column_names
            spark_rows = [tuple(r.values()) for r in t.to_pylist()]
            if name not in oracles:
                results[name] = f"ROWS_ONLY rows={len(spark_rows)}" + \
                    (" EMPTY!" if len(spark_rows) == 0 else "")
                continue
            # The driver materializes the oracle via fetchdf(): DuckDB
            # HUGEINT (any uncast SUM over an integer column) and DECIMAL
            # become float64 there and hash-mismatch Spark's BIGINT/exact
            # output even when values are equal. Flag those types hard —
            # fetchall() below would hide them (Python ints compare fine).
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            hot = [(r[0], r[1]) for r in desc
                   if "HUGEINT" in r[1].upper() or "DECIMAL" in r[1].upper()]
            if hot:
                results[name] = f"DRIVER_DTYPE_RISK {hot} — CAST to BIGINT/DOUBLE/VARCHAR in oracle"
                continue
            cur = con.execute(oracles[name])
            ora_cols = [d[0] for d in cur.description]
            ora_rows = cur.fetchall()
            sc, sr = normalize(spark_rows, spark_cols)
            oc, orr = normalize(ora_rows, ora_cols)
            if sc != oc:
                results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
            elif len(sr) != len(orr):
                results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(orr)}"
            elif sr != orr:
                bad = next(i for i in range(len(sr)) if sr[i] != orr[i])
                results[name] = (f"VALUE_MISMATCH at sorted-row {bad}:\n"
                                 f"    spark : {sr[bad][:300]}\n"
                                 f"    oracle: {orr[bad][:300]}")
            else:
                results[name] = f"OK rows={len(sr)}"
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name in sorted(results):
        print(f"{name:28s} {results[name]}")
    print(f"\n{n_ok}/{len(results)} OK "
          f"({sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only)")
    missing = [k for k in oracles if k not in results
               and (only is None or k in only)]
    if missing:
        print("oracle with no result dir:", missing)


if __name__ == "__main__":
    main()
