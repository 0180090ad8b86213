"""Parquet table catalog over the driver fixtures.

Reference counterpart: runtime schema reflection + streamed JDBC scans
(``/root/reference/ETL/user_ETL.py:63-81``). In Spark the scan IS the
declarative source: ``spark.read.parquet`` gives schema discovery, column
pruning, predicate pushdown and partitioned parallel reads for free — no
chunk loop, no ``BATCH_SIZE``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Per-session DataFrame cache: constructing a parquet scan costs a footer
# read + file listing + analysis (~0.1-0.15 s of DRIVER wall per call,
# measured at sf0.1), and every catalog query re-loads its tables. A
# DataFrame is an immutable plan, so reusing one is semantically free. The
# cache dict lives as an attribute ON the session object itself: the cached
# DataFrames reference their session, so any module-level mapping — even a
# weak-keyed one — would pin session and plans for process lifetime; as a
# session attribute the whole cycle (session -> dict -> plans -> session)
# is ordinary gc-collectable garbage once the session is dropped. NOTE the
# scan's file LISTING is pinned at first load — the fixture dirs are
# immutable by contract (the driver generates them once), and anything that
# overwrites its own output reads via spark.read directly, never through
# this catalog.
_CACHE_ATTR = "_stadvdb_olap_table_plan_cache"


def load_table(
    spark: SparkSession, sf_dir: str, name: str, use_cache: bool = True
) -> DataFrame:
    """Load one fixture table. Columns are pruned lazily by Catalyst, so
    callers should just ``.select`` what they need and let pushdown work."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if use_cache:
        per_session = getattr(spark, _CACHE_ATTR, None)
        if per_session is None:
            per_session = {}
            setattr(spark, _CACHE_ATTR, per_session)
        cached = per_session.get(path)
        if cached is not None:
            return cached
        df = load_table(spark, sf_dir, name, use_cache=False)
        per_session[path] = df
        return df
    if name == "events":
        # events.ts has varied across fixture generations: parquet
        # TIMESTAMP(NANOS) (which Spark's reader rejects — read the raw
        # int64 nanos and floor to micros, matching DuckDB/Arrow ns->us
        # truncation) or TIMESTAMP_NTZ at micro precision. Normalize both
        # to the session-local TIMESTAMP type so every downstream plan
        # (unix_micros, windowing, stream sessionize) sees one dtype; the
        # session timezone is pinned UTC, so the NTZ cast is value-exact.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition to the cluster's parallelism when the scan yields fewer
    partitions (e.g. one small parquet file). Worth one tiny shuffle for
    CPU-bound per-row stages (minhash, simhash, embedding math) that would
    otherwise run on a single core; a no-op decision on real multi-file
    datasets whose scans already parallelize.

    With ``keys`` (a high-cardinality, evenly distributed column set — a
    row id / business key) the exchange HASH-partitions on them, which
    skips the local pre-sort every round-robin repartition pays
    (``spark.sql.execution.sortBeforeRepartition``, on since SPARK-23207
    so retried tasks reproduce their row-to-partition assignment). The
    hash assignment is a pure row function, so it is retry-deterministic
    WITHOUT the sort — measured at sf0.1 the keyed form cuts the exchange
    stage ~2x on the 600k-row fixture. Without ``keys`` the round-robin
    form (sort included) is kept: correct for any input, and the sort is
    negligible on the small frames that use it."""
    sc = df.sparkSession.sparkContext
    # The partition probe converts the plan to an RDD (one py4j
    # round-trip + a javaToPython plan per call — pure driver wall, guide
    # §1/§5). A DataFrame is an immutable plan, so its scan split count
    # is a constant: memoize it ON the df object and pay the conversion
    # once per distinct plan per session.
    n_parts = getattr(df, "_stadvdb_scan_num_partitions", None)
    if n_parts is None:
        n_parts = df.rdd.getNumPartitions()
        df._stadvdb_scan_num_partitions = n_parts
    if n_parts < sc.defaultParallelism:
        if keys:
            return df.repartition(sc.defaultParallelism, *keys)
        return df.repartition(sc.defaultParallelism)
    return df


#: Natural spread keys per fixture table: unique-ish, evenly distributed
#: row identifiers (lineitem's pair is ~unique by construction; the dirty
#: duplicates are a handful of rows — no hot key).
SPREAD_KEYS = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """``load_table`` + keyed ``spread`` on the table's natural key — the
    standard way catalog queries widen a single-file fixture scan without
    paying the round-robin pre-sort.

    Explicit ``keys`` override the natural key: pass a high-cardinality
    column the query ALREADY reads so the exchange adds no extra scan
    columns or shuffle bytes (e.g. q1 spreads lineitem on
    l_extendedprice instead of the otherwise-unused orderkey pair —
    measured ~0.1 s at sf0.1); a key the downstream joins or groups on
    additionally lets the widening exchange satisfy that operator's
    clustering requirement outright.

    The spread result is memoized per (path, keys) alongside the base
    plan cache: repartition() is an eagerly analyzed DataFrame op
    (~5-8 ms of py4j driver wall), and the ~200 catalog call sites
    re-request the same handful of (table, keys) combinations."""
    df = load_table(spark, sf_dir, name)
    k = tuple(keys or SPREAD_KEYS[name])
    per_session = getattr(spark, _CACHE_ATTR, None)
    if per_session is None:  # load_table(use_cache=True) always sets it
        return spread(df, *k)
    skey = ("spread", os.path.join(sf_dir, f"{name}.parquet"), k)
    got = per_session.get(skey)
    if got is None:
        got = spread(df, *k)
        per_session[skey] = got
    return got


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV source with an EXPLICIT schema — never schema inference, which
    costs a full extra pass over 100 TB and can mistype columns on dirty
    data. Malformed rows go to PERMISSIVE nulls by default; pass
    mode='FAILFAST' to surface them."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    **options: str,
) -> DataFrame:
    """JSON-lines source with an explicit schema (same inference-avoidance
    rationale as CSV). Nested fields come back as structs/arrays ready for
    dot-path projection; unknown keys are pruned at parse, so the scan
    reads only the declared shape."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def load_orc(
    spark: SparkSession,
    path: str,
    schema=None,
    **options: str,
) -> DataFrame:
    """ORC source (the other columnar format Spark reads natively —
    predicate pushdown, column pruning, and vectorized decode all work
    exactly as for parquet). Schema is optional since ORC files embed
    theirs, but passing one pins reader expectations the same way the
    CSV/JSONL loaders do."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def load_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw text source — the front door of a pretraining corpus pipeline.

    Line mode (default) yields one row per line in a ``value`` string
    column and splits large files across tasks; ``whole_file=True`` yields
    one row per file (document-per-file corpora) at the cost of
    file-granular parallelism — prefer line/JSONL layouts at 100 TB so a
    single giant file cannot serialize a stage. ``line_sep`` overrides the
    newline delimiter for record-separated corpora.
    """
    return spark.read.text(path, wholetext=whole_file, lineSep=line_sep)


def load_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary-file source for multimodal ingestion: one row per file with
    (path, modificationTime, length, content) — ``content`` is the opaque
    payload column the multimodal operators (operators/multimodal.py)
    decode executor-side via Arrow-batched mapInPandas. ``glob`` filters
    by pattern (e.g. ``*.jpg``). Parallelism is per-file; at 100 TB pack
    small media into larger containers (tar/parquet binary columns)
    rather than millions of tiny files — the listing itself becomes the
    bottleneck otherwise (binaryFile caps at
    ``spark.sql.sources.binaryFile.maxLength`` ~2 GiB per file)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
