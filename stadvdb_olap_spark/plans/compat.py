"""Cross-engine determinism conventions for the DuckDB-oracle comparison.

The driver hashes result VALUES order-insensitively, so any float that can
differ in the last ulp between Spark and DuckDB (different summation order,
different intermediate precision) would flip the hash. Conventions used by
every catalog query:

- **Money/measure sums**: cast each addend to DECIMAL(18,6) (exact, same
  double->decimal rounding in both engines since binary doubles never sit on
  a decimal tie), SUM exactly in decimal, ROUND(..,2), cast to DOUBLE. The
  result is a deterministic function of the input multiset — no float
  summation-order sensitivity at all.
- **Averages/ratios**: exact decimal SUM -> DOUBLE, divide by COUNT in IEEE
  double (identical in both engines), then ROUND to a fixed scale.
- **Scalar float expressions** (per-row arithmetic): plain IEEE double ops
  are bit-identical across engines; no rounding needed.

Both sides of every convention are provided: a Spark Column builder and the
matching DuckDB SQL fragment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum rounded to ``scale``, as DOUBLE."""
    return F.round(F.sum(dec(col)), scale).cast("double")


def money_sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def mean_round(col: Column | str, scale: int = 4) -> Column:
    """Deterministic AVG: exact decimal sum -> double, / count, round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c)).cast("double") / F.count(c), scale
    ).cast("double")


def mean_round_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS DOUBLE)"
    )


def ratio_exact(cents: Column, denom: Column, micro: int = 10_000) -> Column:
    """Exact-integer ratio: floor-divide money CENTS (a BIGINT column)
    by ``denom`` in micro-units, then convert the exact integer to
    DOUBLE. Use when a quotient can land on a true decimal tie:
    ``ROUND(double, n)`` itself is engine-divergent there (Spark rounds
    the double's shortest decimal repr via BigDecimal.valueOf, DuckDB
    rounds the value — observed diverging at cum/8 = x.56375 in
    cohort_ltv_weekly). Output = value truncated to 1/(100·micro)
    dollars.

    EXACTNESS BOUND: |cents·micro| must stay below 2^53 — above it the
    BIGINT multiple's long→double conversion rounds and the "exact"
    quotient can be off by one micro-unit. At micro=10_000 that is
    ~$9.2e9 in summed cents, far above any per-group money sum in the
    fixtures, and it is ENFORCED: out-of-range inputs raise at run time
    instead of silently drifting."""
    a = cents * F.lit(micro)
    # exact floor division on longs: subtract the exact modulo first, so
    # the double division divides an exact multiple (Column `/` is FLOAT
    # division in Spark — flooring it directly can be off by one when
    # the true quotient sits just below an integer)
    q = (a - a % denom) / denom
    # Guard the INPUT, not the product: in non-ANSI Spark the long
    # multiplication itself wraps silently at 2^63, so a post-multiply
    # check could see a wrapped value back under 2^53 and wave it
    # through. |cents| < 2^53 // micro implies |cents*micro| < 2^53 with
    # no multiplication to wrap.
    guarded = F.when(F.abs(cents) < F.lit(2**53 // micro), q).otherwise(
        F.raise_error(
            F.lit(
                "ratio_exact: |cents*micro| >= 2^53 — long->double would "
                "round; lower micro or pre-aggregate in decimal"
            )
        )
    )
    return guarded.cast("double") / F.lit(float(100 * micro))


def ratio_exact_sql(cents: str, denom: str, micro: int = 10_000) -> str:
    """DuckDB-dialect twin of :func:`ratio_exact` (oracle side ONLY:
    ``//`` is DuckDB integer floor-division; Spark SQL would spell it
    ``DIV``). Same |cents·micro| < 2^53 bound applies — DuckDB's
    BIGINT→DOUBLE cast rounds identically above it."""
    return (
        f"CAST(CAST(({cents}) AS BIGINT) * {micro} // ({denom}) AS DOUBLE)"
        f" / {float(100 * micro)!r}"
    )
