"""Simulate the driver's verify pass against __spark_entry__.

Creates a PLAIN SparkSession (no engine-specific config — exactly what the
driver would do), runs entry() and every queries() entry at the given sf,
and compares each against oracle_sql() via DuckDB.

HIGH-FIDELITY CANON (round 4): the real driver materializes both sides as
pandas frames (Spark via ``toPandas()``, DuckDB via ``.df()``), sorts the
frame by all columns with ``sort_values`` and hashes a dtype-sensitive
stringification. That pipeline has three failure modes that value-level
``repr`` comparison (the pre-r4 sim) cannot see — all three cost a
certification row in round 3:

- ARRAY output columns: ``sort_values`` factorizes through a pandas
  hash table → ``TypeError: unhashable type: 'list'`` (Spark side) /
  ndarray (DuckDB side). The query CRASHES certification.
- DECIMAL output columns: Spark fetches ``decimal.Decimal`` objects,
  DuckDB converts to (lossy!) float64 → stringify never matches.
- DuckDB HUGEINT (bare integer ``sum()``): float64 on the DuckDB side vs
  int64 on the Spark side → "5.0" vs "5".

This sim reproduces exactly those modes: pandas fetch on both sides, a
real ``sort_values`` over all columns (so list/ndarray columns crash here
the way they crash the driver), and a per-cell stringify that is
dtype-sensitive for int-vs-float-vs-Decimal while normalizing the one
representation difference the driver demonstrably tolerates (DATE columns
— DuckDB's ``.df()`` yields midnight Timestamps where Spark yields
``datetime.date``; driver-signed DATE queries prove both canonicalize to
the same string, so midnight timestamps print as bare dates).

Usage: python tools/driver_sim.py [sf_dir] [query1,query2,...]

The optional second argument restricts the pass to a comma-separated
subset of query names (entry() still smoke-runs) — the fast loop while
iterating on one query.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def cell(v) -> str:
    """Dtype-sensitive stringify of one pandas cell.

    int64 prints "5", float64 prints repr ("5.0") — so a HUGEINT oracle
    (float64) against a BIGINT Spark column (int64) mismatches, as it
    does under the driver. Decimal objects get a type-marked prefix so
    they can never match an int/float from the other engine.
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, decimal.Decimal):
        return f"DECIMAL({v})"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """The driver's canon: sorted columns, sort_values over all of them
    (CRASHES on list/ndarray cells — intentionally, for fidelity), then
    per-cell dtype-sensitive strings."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(cols):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    stringified = [pdf[c].map(cell).tolist() for c in cols]
    return cols, list(zip(*stringified)) if stringified else []


def first_diff(sr, dr):
    if len(sr) != len(dr):
        return ("rowcount", (len(sr), len(dr)))
    return next(((a, b) for a, b in zip(sr, dr) if a != b), None)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    # The REAL driver's gate (sf0.01) runs on the default heap and so
    # does this sim. Full-catalog sweeps at judge-extra scales (sf0.1)
    # can exhaust the default 1g driver heap ~250 queries in; export
    # SPARK_GRAFT_SIM_DRIVER_MEM=4g for those — per-query results are
    # heap-independent, this only affects session stamina.
    mem = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # Bounded oracle working set: DuckDB's default limit (80% of RAM)
    # lets one operator balloon exactly when the shared host is under an
    # external memory squeeze — observed as transient 8KB-malloc
    # failures mid-sweep (never value mismatches). The oracles need a
    # few GB at most even at sf0.1.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    df = entry_mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n > 0

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        only = {q.strip() for q in sys.argv[2].split(",") if q.strip()}
        unknown = only - set(queries)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        queries = {q: f for q, f in queries.items() if q in only}
    failures = []
    record: dict[str, dict] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            if name in oracles:
                dpdf = con.execute(oracles[name]).df()
                sc, sr = canon_frame(spdf)
                dc, dr = canon_frame(dpdf)
                record[name] = {
                    "status": "MATCH",
                    "rows": len(sr),
                    "secs": round(time.time() - t0, 1),
                }
                if sc != dc:
                    failures.append(name)
                    record[name]["status"] = "FAIL"
                    print(f"FAIL  {name}: cols {sc} vs {dc}")
                elif sr != dr:
                    failures.append(name)
                    record[name]["status"] = "FAIL"
                    print(
                        f"FAIL  {name}: rows {len(sr)} vs {len(dr)};"
                        f" first diff {first_diff(sr, dr)}"
                    )
                else:
                    print(f"MATCH {name}: {len(sr)} rows  [{time.time()-t0:.1f}s]")
            else:
                # Rows-only queries register defer=True and never occupy
                # a certification-window slot, so their (legitimately
                # non-SQL-shaped) outputs skip the canon.
                record[name] = {
                    "status": "ROWS",
                    "rows": len(spdf),
                    "secs": round(time.time() - t0, 1),
                }
                print(
                    f"ROWS  {name}: {len(spdf)} rows (no oracle)"
                    f"  [{time.time()-t0:.1f}s]"
                )
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            record[name] = {
                "status": "ERROR",
                "error": f"{type(exc).__name__}: {exc}"[:300],
                "secs": round(time.time() - t0, 1),
            }
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
        finally:
            # Long-session stamina: a 340+-query pass through ONE plain
            # (1g-driver-heap) session accumulates cached relations and
            # torn-down-but-unreclaimed broadcast blocks; at sf0.1 that
            # pressure has killed the JVM ~250 queries in (every later
            # query then reports ConnectionRefused). Dropping the cache
            # between queries changes no per-query semantics — the real
            # driver's gate runs each query against a fresh-enough
            # session at sf0.01 — and keeps the full-catalog sf0.1
            # sweep stable.
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001  # JVM already gone
                pass
    print(f"\n{len(queries) - len(failures)}/{len(queries)} ok; failures: {failures}")
    # Whole-sweep artifact (SIMSWEEP_r*.json): per-query status + wall
    # so staleness/coverage claims ride a recorded full-catalog pass,
    # not per-window extrapolation.
    out = os.environ.get("SPARK_GRAFT_SIM_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(queries),
                    "n_ok": len(queries) - len(failures),
                    "failures": failures,
                    "results": record,
                },
                f,
                indent=0,
                sort_keys=True,
            )
        print(f"wrote {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
