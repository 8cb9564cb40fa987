#!/usr/bin/env python3
"""Local self-check harness mimicking the driver's t2 correctness gate.

Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [only]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sf tables, and compares: columns sorted by name, exact value equality
row by row. Exit code 0 iff every oracled query matches.

Optional `only` is a comma-separated subset of oracle names (each may
be prefixed with `-` to EXCLUDE instead — an all-minus list), so a
long sf0.1 sweep can be split around the quadratic oracles and run in
parallel slices. `DUCKDB_THREADS=n` bounds DuckDB's thread pool for a
slice that must coexist with timing probes.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # the driver hashes the pandas materialization, where an int-typed
    # Spark column vs a float-typed oracle column (e.g. DuckDB HUGEINT
    # from sum(BIGINT)) mismatches even when the values are equal —
    # treat cross-type numeric equality as a failure here too
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) != isinstance(b, float):
            return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    import os
    threads = os.environ.get("DUCKDB_THREADS")
    con = duckdb.connect(
        config={"threads": int(threads)} if threads else {})
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only is not None:
        includes = {n for n in only if not n.startswith("-")}
        excludes = {n[1:] for n in only if n.startswith("-")}
        oracles = {
            n: s for n, s in oracles.items()
            if (n in includes if includes else n not in excludes)
        }
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            )
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        wc, wr = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        # the driver compares pandas materializations, where type family
        # matters: DuckDB HUGEINT (from sum(BIGINT)) lands as float64 and
        # hash-mismatches Spark's int64 even with equal values. Compare
        # declared type families so that class of bug fails locally too.
        def family(t):
            t = t.upper()
            if "HUGEINT" in t:
                return "float"  # pandas materializes int128 as float64
            if any(x in t for x in ("INT", "BIGINT")):
                return "int"
            if any(x in t for x in ("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
                return "float"
            return "other"
        gtypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall()}
        wtypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        tbad = [c for c in gc if family(gtypes.get(c, "")) != family(wtypes.get(c, ""))]
        if tbad:
            print(f"FAIL {name}: type family mismatch on {[(c, gtypes.get(c), wtypes.get(c)) for c in tbad]}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, wr)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i}\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
