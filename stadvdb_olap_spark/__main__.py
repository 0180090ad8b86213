"""Command-line entry point: run any catalog query from a shell.

    python -m stadvdb_olap_spark list [pattern]
    python -m stadvdb_olap_spark run <query> [--sf-dir DIR] [--limit N] [--json]
    python -m stadvdb_olap_spark explain <query> [--sf-dir DIR]
    python -m stadvdb_olap_spark pipeline [--sf-dir DIR] [--out DIR]
    python -m stadvdb_olap_spark curate [--sf-dir DIR] [--out DIR]

`run` prints the result as a table (or JSON lines with --json); `explain`
prints the formatted physical plan — the same artifact PLANS.md records;
`pipeline` executes the reference-parity dim→fact build (app.py);
`curate` executes the 7-stage training-corpus curation DAG
(curation_app.py) and prints the per-stage report. The reference's own
entry point is `python app.py` (reference app.py:1-26); this is its
engine-wide generalization.
"""

from __future__ import annotations

import argparse
import sys


def _registry():
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

    _ensure_loaded()
    return REGISTRY


def _session():
    from stadvdb_olap_spark.session import get_session

    return get_session(app_name="stadvdb-olap-cli")


def cmd_list(args) -> int:
    reg = _registry()
    names = sorted(n for n in reg if args.pattern.lower() in n.lower())
    for n in names:
        spec = reg[n]
        kind = "oracle" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())[:70]
        print(f"{n:42s} [{kind}] {doc}")
    print(f"{len(names)} queries")
    return 0


def cmd_run(args) -> int:
    reg = _registry()
    if args.query not in reg:
        print(f"unknown query {args.query!r}; try: python -m "
              f"stadvdb_olap_spark list", file=sys.stderr)
        return 2
    spark = _session()
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.limit:
        df = df.limit(args.limit)
    if args.json:
        for line in df.toJSON().collect():
            print(line)
    else:
        df.show(args.limit or 20, truncate=False)
    return 0


def cmd_explain(args) -> int:
    reg = _registry()
    if args.query not in reg:
        print(f"unknown query {args.query!r}", file=sys.stderr)
        return 2
    spark = _session()
    reg[args.query].fn(spark, args.sf_dir).explain("formatted")
    return 0


def cmd_pipeline(args) -> int:
    from stadvdb_olap_spark.app import run_pipeline

    spark = _session()
    run_pipeline(spark, args.sf_dir, args.out)
    return 0


def cmd_curate(args) -> int:
    import json

    from stadvdb_olap_spark.curation_app import run_curation_pipeline

    spark = _session()
    report = run_curation_pipeline(spark, args.sf_dir, args.out)
    print(json.dumps(report))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="stadvdb_olap_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list", help="list catalog queries")
    pl.add_argument("pattern", nargs="?", default="")
    pl.set_defaults(fn=cmd_list)

    default_sf = "/root/testdata/sf0.01"
    pr = sub.add_parser("run", help="run a catalog query")
    pr.add_argument("query")
    pr.add_argument("--sf-dir", default=default_sf)
    pr.add_argument("--limit", type=int, default=0)
    pr.add_argument("--json", action="store_true")
    pr.set_defaults(fn=cmd_run)

    pe = sub.add_parser("explain", help="print the physical plan")
    pe.add_argument("query")
    pe.add_argument("--sf-dir", default=default_sf)
    pe.set_defaults(fn=cmd_explain)

    pp = sub.add_parser("pipeline", help="run the dim->fact build")
    pp.add_argument("--sf-dir", default=default_sf)
    pp.add_argument("--out", default="/tmp/stadvdb_olap_warehouse")
    pp.set_defaults(fn=cmd_pipeline)

    pc = sub.add_parser("curate", help="run the corpus-curation DAG")
    pc.add_argument("--sf-dir", default=default_sf)
    pc.add_argument("--out", default="/tmp/stadvdb_olap_corpus")
    pc.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
