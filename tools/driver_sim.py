"""Simulate the driver's verify pass against __spark_entry__.

Creates a PLAIN SparkSession (no engine-specific config — exactly what the
driver would do), runs entry() and every queries() entry at the given sf,
and compares each against oracle_sql() via DuckDB with order-insensitive
value comparison. Prints one line per query + a summary.

Usage: python tools/driver_sim.py [sf_dir] [query1,query2,...]

The optional second argument restricts the pass to a comma-separated
subset of query names (entry() still smoke-runs) — the fast loop while
iterating on one query.
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    df = entry_mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n > 0

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        only = {n.strip() for n in sys.argv[2].split(",") if n.strip()}
        unknown = only - set(queries)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        queries = {n: f for n, f in queries.items() if n in only}
    failures = []
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                rel = con.execute(oracles[name])
                d_cols = [d[0] for d in rel.description]
                d_rows = rel.fetchall()
                sc, sr = canonical(s_cols, s_rows)
                dc, dr = canonical(d_cols, d_rows)
                if sc != dc:
                    failures.append(name)
                    print(f"FAIL  {name}: cols {sc} vs {dc}")
                elif sr != dr:
                    failures.append(name)
                    diff = next((a, b) for a, b in zip(sr, dr) if a != b) if len(sr) == len(dr) else ("rowcount", (len(sr), len(dr)))
                    print(f"FAIL  {name}: rows {len(sr)} vs {len(dr)}; first diff {diff}")
                else:
                    print(f"MATCH {name}: {len(sr)} rows  [{time.time()-t0:.1f}s]")
            else:
                print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)  [{time.time()-t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
