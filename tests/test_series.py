"""Sequence/series statistics: third-implementation references and
determinism-device checks.

The parity suite already certifies Spark == DuckDB for every
series_queries oracle; these tests add an INDEPENDENT plain-Python
implementation (catching a formula both SQL twins could share wrongly),
pin the tie behavior of the ``_quantized`` device that the oracle hash
depends on, and pin plan shapes.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _orders_rows():
    return duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()


def test_gini_matches_python_reference(spark):
    """gini_customer_revenue == a from-scratch Python Gini over the same
    quantized per-customer revenues (rank formula on sorted values)."""
    from stadvdb_olap_spark.plans.series_queries import gini_customer_revenue

    rows = _orders_rows()
    rev: dict[int, float] = {}
    for ck, tp in rows:
        # same money_sum convention: exact decimal sum then round to 2
        rev[ck] = rev.get(ck, 0.0) + tp
    # money_sum uses decimal; float summation here can drift the last
    # cent, but quantization to 2^-12 buckets absorbs < half-quantum
    # drift, so the bucket ids agree.
    xs = sorted(
        float(round((round(v, 2)) * 2.0 ** -12)) for v in rev.values()
    )
    n = len(xs)
    sx = sum(xs)
    skx = sum((i + 1) * x for i, x in enumerate(xs))
    want = 2.0 * skx / (n * sx) - (n + 1) / n

    got = gini_customer_revenue(spark, SF_DIR).collect()[0]
    assert got["n_customers"] == n
    assert got["gini"] == pytest.approx(want, rel=1e-9)
    assert 0.0 <= got["gini"] <= 1.0


def test_weighted_median_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        weighted_median_price_by_flag,
    )

    rows = duckdb.sql(
        f"""SELECT l_returnflag, l_extendedprice, CAST(l_quantity AS BIGINT),
                   l_orderkey, l_linenumber
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()
    by_flag: dict[str, list] = {}
    for flag, price, qty, ok, ln in rows:
        by_flag.setdefault(flag, []).append((price, ok, ln, qty))
    want = {}
    for flag, items in by_flag.items():
        items.sort()
        total = sum(q for *_, q in items)
        cum = 0
        for price, _, _, q in items:
            cum += q
            if 2 * cum >= total:
                want[flag] = (price, total)
                break
    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_weight"])
        for r in weighted_median_price_by_flag(spark, SF_DIR).collect()
    }
    assert got == want


def test_quantized_tie_rounding_matches_duckdb(spark):
    """The _quantized device must round .5 ties identically in both
    engines (ties-away via round(double)); direct double→decimal casts
    do NOT (Spark HALF_UP vs DuckDB half-even — the observed sf0.1
    divergence this device exists to kill). Values: odd multiples of
    128 hit exact .5 after a 2^-8 prescale."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.plans.series_queries import (
        _quantized,
        _quantized_sql,
    )

    vals = [128.0 * k for k in (1, 3, 5, 7, 9)] + [127.99, 128.01, -384.0]
    sdf = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = [
        r[0]
        for r in sdf.select(_quantized("v", 2.0 ** -8)).collect()
    ]
    duck = [
        r[0]
        for v in vals
        for r in duckdb.sql(
            f"SELECT {_quantized_sql(str(v), 2.0 ** -8)}"
        ).fetchall()
    ]
    assert got == duck
    # and the ties really are ties: 128 * 2^-8 = 0.5 → away-from-zero → 1
    assert got[0] == 1 and got[-1] == -2


def test_interpolation_invariants(spark):
    """Observed hours pass through untouched; the grid is dense from the
    first to the last observation; interpolated values sit within the
    bracketing observations' range."""
    from stadvdb_olap_spark.plans.series_queries import (
        interpolate_hourly_signup_value,
    )

    rows = sorted(
        interpolate_hourly_signup_value(spark, SF_DIR).collect(),
        key=lambda r: r["h"],
    )
    hours = [r["h"] for r in rows]
    assert len(hours) == len(set(hours))
    span = (hours[-1] - hours[0]).total_seconds() / 3600
    assert len(hours) == int(span) + 1  # dense grid, no missing hour
    assert rows[0]["observed"] and rows[-1]["observed"]  # endpoints anchor
    # every gap value lies between its bracketing observations
    obs_idx = [i for i, r in enumerate(rows) if r["observed"]]
    for a, b in zip(obs_idx, obs_idx[1:]):
        lo = min(rows[a]["value_interp"], rows[b]["value_interp"])
        hi = max(rows[a]["value_interp"], rows[b]["value_interp"])
        for i in range(a + 1, b):
            assert lo <= rows[i]["value_interp"] <= hi
        # and strict linearity: second differences vanish inside a gap
        if b - a >= 3:
            vals = [rows[i]["value_interp"] for i in range(a, b + 1)]
            d2 = [vals[i + 2] - 2 * vals[i + 1] + vals[i] for i in range(len(vals) - 2)]
            assert all(abs(x) < 1e-6 * max(1.0, abs(vals[0])) for x in d2[1:-1])


def test_markov_probs_are_row_normalized(spark):
    from stadvdb_olap_spark.plans.series_queries import markov_event_transitions

    rows = markov_event_transitions(spark, SF_DIR).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
    assert by_from and all(
        math.isclose(p, 1.0, rel_tol=1e-12) for p in by_from.values()
    )


def test_corr_matrix_plan_single_pass(spark):
    """ONE scan, one aggregate, no join: all 15 moments come from a
    single pass and the 6-row long form explodes a literal array."""
    from stadvdb_olap_spark.plans.series_queries import corr_matrix_lineitem

    plan = corr_matrix_lineitem(spark, SF_DIR)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body
    # formatted output names each node in the tree AND a detail header,
    # so ONE logical scan appears exactly twice
    import re as _re

    assert len(_re.findall(r"^\(\d+\) Scan parquet", body, _re.M)) == 1
    assert "Union" not in body
    # values in [-1, 1]
    for r in corr_matrix_lineitem(spark, SF_DIR).collect():
        assert -1.0 <= r["r"] <= 1.0


def test_weighted_median_exchanges_only_on_group_key(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        weighted_median_price_by_flag,
    )

    plan = weighted_median_price_by_flag(
        spark, SF_DIR
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    body = plan.split("== Physical Plan ==")[-1]
    # no single-partition exchange: everything partitions on l_returnflag
    assert "SinglePartition" not in body


def test_rcte_clusters_agree_with_iterative_operator(spark):
    """Spark 4 recursive-CTE components == the iterative min-label
    operator on the same verified-pair graph (two independent Spark
    implementations, beyond the shared DuckDB oracle)."""
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rcte = {
        (r["doc_id"], r["canonical_id"])
        for r in REGISTRY["rcte_min_label_clusters"].fn(spark, SF_DIR).collect()
    }
    iterative = {
        (r["doc_id"], r["canonical_id"])
        for r in REGISTRY["dedup_clusters_canonical"].fn(spark, SF_DIR).collect()
    }
    assert rcte == iterative and rcte


def _python_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference BPE trainer (Sennrich-style) on a word->count dict."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n
                )
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    """Distributed BPE == the pure-Python reference on a real corpus
    slice: same merges, same order, same pair counts."""
    from collections import Counter

    from stadvdb_olap_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cats eat the fish"),
            (3, "low lower lowest low low"),
            (4, "newer newest new new new"),
        ],
        ["doc_id", "text"],
    )
    wc = Counter(
        w
        for _, t in docs.collect()
        for w in t.lower().split()
    )
    want = _python_bpe(wc, 12)
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(spark, docs, 12).orderBy("rank").collect()
    ]
    assert got == want and len(got) > 5


def test_bpe_pair_frontier_predicts_next_merge(spark):
    """The certified training STEP equals the iterative trainer: after
    applying the first K learned merges, pair_frontier_after's top row
    is exactly the merge bpe_train learns at rank K (argmax + tiebreak
    included), and its count matches — for every prefix K."""
    from stadvdb_olap_spark.operators.bpe import bpe_train, pair_frontier_after

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cats eat the fish"),
            (3, "low lower lowest low low"),
            (4, "newer newest new new new"),
        ],
        ["doc_id", "text"],
    )
    learned = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(spark, docs, 6).orderBy("rank").collect()
    ]
    assert len(learned) == 6
    for k in (0, 2, 5):
        prefix = [(a, b) for a, b, _ in learned[:k]]
        top = pair_frontier_after(docs, prefix, top=1).collect()[0]
        assert (top["left_sym"], top["right_sym"], top["pair_cnt"]) == learned[k]


def test_bpe_encode_roundtrip(spark):
    """Encoding with the learned merges reproduces each word's final
    symbol sequence; concatenating tokens restores the text."""
    from stadvdb_olap_spark.operators.bpe import END, bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "banana bandana banana"), (2, "ban ban banana")],
        ["doc_id", "text"],
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(spark, docs, 8).orderBy("rank").collect()
    ]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    joined = "".join(enc[1]).replace(END, " ").strip()
    assert joined == "banana bandana banana"
    # compression happened: fewer tokens than characters
    assert len(enc[1]) < len("banana bandana banana")


def test_survival_curve_invariants(spark):
    """S(w) is non-increasing from 1.0, and matches the direct KM
    product computed in Python from the per-user spans."""
    from stadvdb_olap_spark.plans.series_queries import survival_weekly_users

    rows = sorted(
        survival_weekly_users(spark, SF_DIR).collect(), key=lambda r: r["week"]
    )
    surv = [r["survival"] for r in rows]
    assert all(a >= b - 1e-15 for a, b in zip(surv, surv[1:]))
    assert surv[0] <= 1.0 and surv[-1] >= 0.0

    spans = duckdb.sql(f"""
        SELECT date_diff('week', date_trunc('week', min(ts)),
                         date_trunc('week', max(ts))) AS wk
        FROM '{SF_DIR}/events.parquet' GROUP BY user_id
    """).fetchall()
    wks = [r[0] for r in spans]
    h = max(wks)
    s = 1.0
    want = []
    for w in range(h + 1):
        n_risk = sum(1 for v in wks if v >= w)
        d = sum(1 for v in wks if v == w) if w < h else 0
        s *= 1 - d / n_risk
        want.append(s)
    got = [r["survival"] for r in rows]
    assert got == pytest.approx(want, rel=1e-12)


def test_ratio_exact_matches_sql_twin(spark):
    """compat.ratio_exact == its SQL twin == python floor math, including
    the x.56375-style tie cases ROUND(double) gets wrong."""
    from stadvdb_olap_spark.plans.compat import ratio_exact, ratio_exact_sql

    cases = [(255805251, 8), (100, 3), (999999999, 7), (1, 1), (0, 5)]
    sdf = spark.createDataFrame(cases, ["cents", "n"])
    got = [
        r[0]
        for r in sdf.select(
            ratio_exact(sdf["cents"], sdf["n"])
        ).collect()
    ]
    duck_vals = [
        duckdb.sql(
            f"SELECT {ratio_exact_sql(str(c), str(n))}"
        ).fetchall()[0][0]
        for c, n in cases
    ]
    want = [(c * 10_000 // n) / 1e6 for c, n in cases]
    assert got == duck_vals == want


def test_ratio_exact_guard_rejects_wrapping_inputs(spark):
    """The 2^53 exactness guard must fire on the INPUT: this cents value
    makes cents*10_000 wrap past 2^63 to a harmless-looking 8384, so a
    post-multiply |product| < 2^53 check would silently return a wrong
    'exact' ratio."""
    from stadvdb_olap_spark.plans.compat import ratio_exact

    big = 2**64 // 10_000 + 1  # cents*10_000 == 2^64 + 8384 -> wraps to 8384
    assert (big * 10_000) % 2**64 < 2**53
    bad = spark.createDataFrame([(big, 3)], ["cents", "n"])
    with pytest.raises(Exception, match="ratio_exact"):
        bad.select(ratio_exact(bad["cents"], bad["n"])).collect()


def test_sweepline_concurrency_matches_python_reference(spark):
    """max_concurrent_sessions_hourly == a direct Python sweep over the
    same 30-minute-gap sessions (third implementation beyond the SQL
    twins)."""
    from stadvdb_olap_spark.plans.series_queries import (
        max_concurrent_sessions_hourly,
    )

    rows = duckdb.sql(f"""
        SELECT user_id, ts FROM '{SF_DIR}/events.parquet'
        ORDER BY user_id, ts
    """).fetchall()
    # sessionize per user with the 30-min gap rule
    sessions = []
    cur_user, start, last = None, None, None
    for uid, ts in rows:
        if uid != cur_user or (ts - last).total_seconds() > 1800:
            if cur_user is not None:
                sessions.append((start, last))
            cur_user, start = uid, ts
        last = ts
    sessions.append((start, last))
    # sweep: -1 boundaries sort before +1 at equal instants
    bounds = sorted(
        [(s, 1) for s, e in sessions] + [(e, -1) for s, e in sessions],
        key=lambda p: (p[0], p[1]),
    )
    cur = 0
    per_hour: dict = {}
    for t, d in bounds:
        cur += d
        h = t.replace(minute=0, second=0, microsecond=0)
        per_hour[h] = max(per_hour.get(h, 0), cur)
    got = {
        r["hour"]: r["max_concurrent"]
        for r in max_concurrent_sessions_hourly(spark, SF_DIR).collect()
    }
    assert got == per_hour


def test_exact_median_even_n_bucket_boundary(spark, tmp_path):
    """Round-2 advisor repro: with prices 500/900/1100/1500 the lower-median
    rank (2) is the LAST row of bucket 0 — a fractional (n+1)/2 bucket test
    rejects bucket 0 and the query returns empty. The integer-rank bucket
    filter must return 900.0. Also pin the odd-n and all-one-bucket cases."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stadvdb_olap_spark.plans.series_queries import (
        scalable_exact_median_price,
    )

    def li_dir(name, prices):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": list(range(1, len(prices) + 1)),
                    "l_linenumber": [1] * len(prices),
                    "l_extendedprice": [float(p) for p in prices],
                }
            ),
            str(d / "lineitem.parquet"),
        )
        return str(d)

    # even n, lower median ends bucket 0 (prices < 1000 are bucket 0)
    got = scalable_exact_median_price(
        spark, li_dir("even_boundary", [500, 900, 1100, 1500])
    ).collect()
    assert [(r["median_price"], r["n_rows"]) for r in got] == [(900.0, 4)]

    # odd n spanning buckets
    got = scalable_exact_median_price(
        spark, li_dir("odd", [100, 2500, 7700])
    ).collect()
    assert [(r["median_price"], r["n_rows"]) for r in got] == [(2500.0, 3)]

    # everything in one bucket
    got = scalable_exact_median_price(
        spark, li_dir("one_bucket", [10, 20, 30, 40])
    ).collect()
    assert [(r["median_price"], r["n_rows"]) for r in got] == [(20.0, 4)]


def test_hampel_edge_windows_never_flagged(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        hampel_outliers_daily_revenue,
    )

    rows = hampel_outliers_daily_revenue(spark, SF_DIR).orderBy("d").collect()
    assert len(rows) >= 7
    # the first/last 3 days lack a full centered window: no median, no flag
    for r in rows[:3] + rows[-3:]:
        assert r.rolling_med is None and r.is_outlier is False
    # interior rows always carry the order statistics
    for r in rows[3:-3]:
        assert r.rolling_med is not None and r.rolling_mad is not None


def test_episode_triples_total_matches_session_lengths(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        episode_triples_sessions,
    )
    from stadvdb_olap_spark.plans.analytics_queries import (
        events_sessionize_30m,
    )
    from pyspark.sql import functions as F

    total = (
        episode_triples_sessions(spark, SF_DIR)
        .agg(F.sum("n").alias("s"))
        .collect()[0]
        .s
    )
    # every session of length L contributes max(L-2, 0) triples
    sess_sizes = (
        events_sessionize_30m(spark, SF_DIR)
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("L"))
        .agg(
            F.sum(F.greatest(F.col("L") - 2, F.lit(0))).alias("expect")
        )
        .collect()[0]
        .expect
    )
    assert total == sess_sizes


def test_poisson_bootstrap_weights_bounded_and_centered(spark):
    # Re-derive the per-(replicate, order) weights exactly as the query
    # does and check the draw behaves like Poisson(1): support 0..7 and
    # mean within 2% of 1 over all replicates.
    import duckdb

    from stadvdb_olap_spark.plans.sampling_queries import _POIS_T

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    hex4 = (
        "((strpos('0123456789abcdef', h[1:1]) - 1) * 4096"
        " + (strpos('0123456789abcdef', h[2:2]) - 1) * 256"
        " + (strpos('0123456789abcdef', h[3:3]) - 1) * 16"
        " + (strpos('0123456789abcdef', h[4:4]) - 1))"
    )
    w = " + ".join(f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POIS_T)
    stats = con.sql(
        f"""
        WITH u AS (
            SELECT {hex4} AS u FROM (
                SELECT md5('boot' || CAST(b AS VARCHAR) || ':'
                           || CAST(o_orderkey AS VARCHAR)) AS h
                FROM orders CROSS JOIN (SELECT unnest(range(32)) AS b))
        )
        SELECT MIN({w}), MAX({w}), AVG({w}) FROM u
        """
    ).fetchone()
    assert stats[0] >= 0 and stats[1] <= 7
    assert abs(stats[2] - 1.0) < 0.02


def test_mase_seasonal_beats_naive_on_weekly_series(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        mase_seasonal_naive_daily_revenue,
    )

    row = mase_seasonal_naive_daily_revenue(spark, SF_DIR).collect()[0]
    assert row.n_scored > 0
    assert row.mae_naive1 > 0 and row.mae_seasonal7 > 0
    # MASE is the ratio of the two published MAEs
    assert math.isclose(
        row.mase, row.mae_seasonal7 / row.mae_naive1, rel_tol=1e-12
    )


def test_conformal_interval_coverage_at_least_nominal(spark):
    from stadvdb_olap_spark.plans.sampling_queries import (
        conformal_interval_order_totals,
    )

    rows = conformal_interval_order_totals(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # split-conformal guarantees >= ceil(0.9(n+1))/(n+1) coverage
        assert r.coverage >= 0.9
        assert r.lo <= r.pred <= r.hi


def test_zonemap_clustered_layout_skips_unclustered_does_not(spark):
    from stadvdb_olap_spark.plans.scale_queries import (
        zonemap_prune_layouts_orders,
    )

    rows = {
        r.layout: r for r in zonemap_prune_layouts_orders(spark, SF_DIR).collect()
    }
    assert rows["by_key"].n_rows_total == rows["by_date"].n_rows_total
    # the point of the audit: clustering turns zone maps on
    assert rows["by_key"].skip_frac < 0.05
    assert rows["by_date"].skip_frac > 0.5


def test_join_cardinality_audit_matches_executed_join(spark):
    from stadvdb_olap_spark.plans.scale_queries import (
        join_cardinality_audit_lineitem,
    )
    from stadvdb_olap_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    audit = join_cardinality_audit_lineitem(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    actual = li.join(
        li.withColumnRenamed("l_partkey", "p2"),
        F.col("l_partkey") == F.col("p2"),
    ).count()
    assert audit.exact_join_rows == actual
    assert audit.skew_multiplier >= 1.0  # Cauchy-Schwarz: sum n^2 >= N^2/ndv


def test_mann_whitney_statistic_matches_scipy_free_reference(spark):
    # Python re-derivation (no scipy in this env): average-rank U on
    # the same subset must equal the engine's doubled-rank formulation.
    from stadvdb_olap_spark.plans.series_queries import (
        mann_whitney_value_click_purchase,
    )
    import duckdb

    got = mann_whitney_value_click_purchase(spark, SF_DIR).collect()[0]
    rows = duckdb.sql(
        f"""SELECT event_type, value
            FROM '{SF_DIR}/events.parquet'
            WHERE event_type IN ('click', 'purchase')"""
    ).fetchall()
    vals = sorted((v, t) for t, v in rows)
    # average ranks with ties
    from collections import defaultdict

    positions = defaultdict(list)
    for i, (v, _t) in enumerate(vals, 1):
        positions[v].append(i)
    r1 = 0.0
    n1 = n2 = 0
    for i, (v, t) in enumerate(vals, 1):
        avg = sum(positions[v]) / len(positions[v])
        if t == "click":
            r1 += avg
            n1 += 1
        else:
            n2 += 1
    u1 = r1 - n1 * (n1 + 1) / 2
    assert got.n_click == n1 and got.n_purchase == n2
    assert math.isclose(got.u_stat, u1, rel_tol=1e-12)
    assert -1.0 <= got.rank_biserial <= 1.0


def test_purchase_streaks_islands_by_hand(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        purchase_streaks_customers,
    )
    import duckdb

    got = {
        r.o_custkey: r
        for r in purchase_streaks_customers(spark, SF_DIR).collect()
    }
    months = duckdb.sql(
        f"""SELECT DISTINCT o_custkey,
                   year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
            FROM '{SF_DIR}/orders.parquet' ORDER BY 1, 2"""
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for c, m in months:
        per[c].append(m)
    for c, ms in per.items():
        streaks = []
        run = 1
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                run += 1
            else:
                streaks.append(run)
                run = 1
        streaks.append(run)
        if max(streaks) >= 2:
            assert got[c].max_streak_months == max(streaks)
            assert got[c].n_streaks == len(streaks)
            assert got[c].active_months == sum(streaks)
        else:
            assert c not in got


def test_shapley_attribution_efficiency_axiom(spark):
    # Shapley efficiency: credits sum to v(grand coalition) - v(empty).
    from stadvdb_olap_spark.plans.series_queries import (
        _CHANNELS,
        shapley_attribution_channels,
    )
    import duckdb

    got = shapley_attribution_channels(spark, SF_DIR).collect()[0]
    total_credit = sum(got[f"shapley_{c}"] for c in _CHANNELS)
    # recompute v(111) and v(000) directly
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    from stadvdb_olap_spark.plans.series_queries import _shapley_oracle

    # pull the per-session CTE out of the oracle by re-running it and
    # checking efficiency against its own subset rates
    import re

    sql = _shapley_oracle()
    inner = sql[: sql.rindex("SELECT")] + "SELECT * FROM v"
    v = con.sql(inner).df().iloc[0]
    assert abs(total_credit - (v["v_111"] - v["v_000"])) < 1e-12


def test_theil_sen_and_mann_kendall_agree_with_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        mann_kendall_trend_daily_revenue,
        theil_sen_trend_daily_revenue,
    )
    import duckdb

    daily = duckdb.sql(
        f"""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS BIGINT) AS cents
            FROM '{SF_DIR}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    ys = [r[0] for r in daily]
    n = len(ys)
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ts_row = theil_sen_trend_daily_revenue(spark, SF_DIR).collect()[0]
    assert ts_row.n_days == n
    assert ts_row.slope_per_day == slopes[(len(slopes) + 1) // 2 - 1] / 100
    s_stat = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    mk_row = mann_kendall_trend_daily_revenue(spark, SF_DIR).collect()[0]
    assert mk_row.s_stat == s_stat
    assert -1.0 <= mk_row.kendall_tau <= 1.0


def test_recsys_eval_metric_invariants(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        recsys_eval_covisit_topk,
    )

    r = recsys_eval_covisit_topk(spark, SF_DIR).collect()[0]
    assert r.n_customers > 0
    assert 0.0 <= r.precision_at_10 <= 1.0
    assert 0.0 <= r.recall_at_10 <= 1.0
    assert 0.0 <= r.mean_ndcg <= 1.0
    assert r.precision_at_10 == r.total_hits / (10 * r.n_customers)


def test_hampel_flags_match_python_recheck(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        hampel_outliers_daily_revenue,
    )

    rows = hampel_outliers_daily_revenue(spark, SF_DIR).orderBy("d").collect()
    cents = [round(r.revenue * 100) for r in rows]
    for i, r in enumerate(rows):
        if i < 3 or i >= len(rows) - 3:
            continue
        window = sorted(cents[i - 3 : i + 4])
        med = window[3]
        mad = sorted(abs(x - med) for x in cents[i - 3 : i + 4])[3]
        expected = 10000 * abs(cents[i] - med) > 44478 * mad
        assert r.is_outlier == expected


def test_littles_law_holds_and_did_cells_complete(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        littles_law_audit_sessions,
    )
    from stadvdb_olap_spark.plans.feature_queries import (
        diff_in_diff_event_value,
    )

    ll = littles_law_audit_sessions(spark, SF_DIR).collect()[0]
    assert ll.littles_law_holds is True
    assert ll.l_direct == ll.l_sweep
    assert ll.lambda_per_hour > 0 and ll.w_mean_minutes >= 0
    did = diff_in_diff_event_value(spark, SF_DIR).collect()[0]
    for c in ("t_pre", "t_post", "c_pre", "c_post"):
        assert did[c] is not None
    assert did.did_estimate == (did.t_post - did.t_pre) - (
        did.c_post - did.c_pre
    )


def test_holt_winters_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_M,
        holt_winters_forecast_daily_revenue,
    )
    import duckdb

    ys = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                           AS DOUBLE) AS revenue
                FROM '{SF_DIR}/orders.parquet'
                GROUP BY date_trunc('day', o_orderdate)
                ORDER BY date_trunc('day', o_orderdate)"""
        ).fetchall()
    ]
    a, b, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M
    l, tr, s = ys[0], 0.0, [0.0] * m
    for t, y in enumerate(ys[1:], start=1):
        j = t % m
        newl = a * (y - s[j]) + (1 - a) * (l + tr)
        newb = b * (newl - l) + (1 - b) * tr
        s[j] = g * (y - newl) + (1 - g) * s[j]
        l, tr = newl, newb
    rows = (
        holt_winters_forecast_daily_revenue(spark, SF_DIR)
        .orderBy("horizon_days")
        .collect()
    )
    n = len(ys)
    assert rows[0].n_days == n
    for r in rows:
        h = r.horizon_days
        assert r.level == l and r.trend == tr
        assert r.seasonal == s[(n - 1 + h) % m]
        assert r.forecast == l + h * tr + s[(n - 1 + h) % m]


def test_croston_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        _CROSTON_ALPHA,
        _CROSTON_QMIN,
        croston_intermittent_demand,
    )
    import duckdb

    rows = duckdb.sql(
        f"""SELECT CAST(l_shipdate AS DATE) AS d,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_quantity >= {_CROSTON_QMIN}
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    a = _CROSTON_ALPHA
    z = float(rows[0][1])
    p = 1.0
    prev = rows[0][0].toordinal()
    for d, q in rows[1:]:
        day = d.toordinal()
        z = a * float(q) + (1 - a) * z
        p = a * (day - prev) + (1 - a) * p
        prev = day
    got = croston_intermittent_demand(spark, SF_DIR).collect()[0]
    assert got.n_demand_days == len(rows)
    assert got.demand_level == z
    assert got.mean_interval_days == p
    assert got.forecast_per_day == z / p


def test_windowed_trend_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        _TREND_WINDOW_DAYS,
        mann_kendall_windowed_trend_daily_revenue,
        theil_sen_windowed_trend_daily_revenue,
    )

    daily = duckdb.sql(
        f"""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS BIGINT) AS cents
            FROM '{SF_DIR}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    ys = [r[0] for r in daily]
    n = len(ys)
    w = _TREND_WINDOW_DAYS
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, min(i + w, n - 1) + 1)
    ]
    slopes = sorted((ys[j] - ys[i]) / (j - i) for i, j in pairs)
    ts = theil_sen_windowed_trend_daily_revenue(spark, SF_DIR).collect()[0]
    assert ts.n_days == n
    assert ts.n_pairs == len(pairs)
    assert ts.slope_per_day == slopes[(len(slopes) + 1) // 2 - 1] / 100
    # bounded-lag pair set is a strict subset of the full O(n^2) set
    assert ts.n_pairs < n * (n - 1) // 2

    s_stat = sum((ys[j] > ys[i]) - (ys[j] < ys[i]) for i, j in pairs)
    mk = mann_kendall_windowed_trend_daily_revenue(spark, SF_DIR).collect()[0]
    assert mk.s_stat == s_stat
    assert mk.n_pairs == len(pairs)
    assert -1.0 <= mk.tau_windowed <= 1.0


def test_stratified_ate_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        stratified_ate_priority_value,
    )

    rows = duckdb.sql(
        f"""SELECT c_mktsegment,
                   year(CAST(o_orderdate AS DATE)),
                   CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/customer.parquet' c
              ON o_custkey = c_custkey"""
    ).fetchall()
    strata: dict = {}
    for seg, y, tr, cents in rows:
        st = strata.setdefault((seg, y), [0, 0, 0, 0])  # n1, n0, s1, s0
        if tr:
            st[0] += 1
            st[2] += cents
        else:
            st[1] += 1
            st[3] += cents
    used = {k: v for k, v in strata.items() if v[0] > 0 and v[1] > 0}
    n_total = sum(v[0] + v[1] for v in used.values())
    n1t = sum(v[0] for v in used.values())
    n0t = sum(v[1] for v in used.values())
    ate_ref = (
        sum(
            ((v[0] + v[1]) / n_total) * (v[2] / v[0] - v[3] / v[1])
            for v in used.values()
        )
        / 100
    )
    naive_ref = (
        sum(v[2] for v in used.values()) / n1t
        - sum(v[3] for v in used.values()) / n0t
    ) / 100
    got = stratified_ate_priority_value(spark, SF_DIR).collect()[0]
    assert got.n_strata == len(used)
    assert got.n_treated == n1t and got.n_control == n0t
    # reference sums in arbitrary order -> approx; the EXACT cross-engine
    # equality is the parity suite's job (sorted-fold canon)
    assert got.ate == pytest.approx(ate_ref, rel=1e-9)
    assert got.naive_diff == pytest.approx(naive_ref, rel=1e-9)
    # the adjusted estimate must differ from naive only through the
    # stratum reweighting; both live on the same cents scale
    assert abs(got.att - got.ate) < abs(got.naive_diff) + 1e-6


def test_position_attribution_conserves_value(spark):
    """Every attributed conversion's credits sum to exactly vmicro*1000
    (integer conservation — the property float-weighted attribution
    can only approximate)."""
    from stadvdb_olap_spark.plans.series_queries import (
        position_attribution_channels,
    )

    total_credit = sum(
        int(r.credit_units)
        for r in position_attribution_channels(spark, SF_DIR).collect()
    )
    want = duckdb.sql(
        f"""WITH conv AS (
              SELECT event_id, user_id, ts,
                     CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                       AS vmicro
              FROM '{SF_DIR}/events.parquet' WHERE event_type = 'purchase'
            )
            SELECT COALESCE(SUM(vmicro), 0) * 1000 FROM conv c
            WHERE EXISTS (
              SELECT 1 FROM '{SF_DIR}/events.parquet' t
              WHERE t.event_type IN ('view', 'click', 'signup')
                AND t.user_id = c.user_id
                AND t.ts < c.ts AND t.ts >= c.ts - INTERVAL 1 DAY
            )"""
    ).fetchone()[0]
    assert total_credit == int(want)
