"""Spatial (2D range) joins via grid-cell bucketing.

The distributed shape for "find every pair of points within radius r":
bucket the plane into r-sized cells, equi-join on cell ids, and verify
the exact distance only inside colliding neighborhoods — the same
block-then-verify discipline as the LSH dedup and interval-overlap
joins. All-pairs comparison never happens: a point's candidates live in
its own cell and the 8 neighbors, so the shuffle key is the cell id and
the join degree is bounded by local point density, not corpus size.

Everything is integer-exact (integer coordinates, squared-distance
comparison against r² — no sqrt, no float), so results are
hash-certifiable cross-engine and independent of partitioning.

At 100 TB: the cell assignment is a narrow projection; the candidate
join is one hash shuffle on (cell_x, cell_y) with a 9x explode of ONE
side only. Hot cells (skewed density) respond to the standard salting /
AQE skew-join treatments because the key is a plain column. Cell size
trades replication against candidate-verify cost exactly like LSH band
width; r-sized cells guarantee the 3x3 neighborhood covers the radius.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Self-join: all pairs (id_a < id_b) with squared Euclidean
    distance <= radius² over integer coordinates.

    Returns (id_a, id_b, dist_sq). Exactness: coordinates and the
    squared distance stay BIGINT end-to-end; no pair within the radius
    can be missed because a neighbor within distance r is at most one
    r-sized cell away in each axis, and the probe side enumerates that
    full 3x3 neighborhood. Each surviving pair is emitted exactly once
    (the build side keeps its single true cell, so one exploded probe
    cell matches)."""
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")

    def cell(name: str) -> Column:
        # exact BIGINT floor division: DIV truncates toward zero, so a
        # negative remainder shifts down one cell. A double-division
        # floor would lose ULPs for |coord| > 2^53 and misbucket —
        # this keeps the integer-exact guarantee over the full BIGINT
        # domain.
        return F.expr(
            f"CAST(({name} DIV {radius})"
            f" - (CASE WHEN {name} % {radius} < 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        )

    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    )
    build = base.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        cell("px").alias("cx"),
        cell("py").alias("cy"),
    )
    probe = (
        base.select(
            F.col("pid").alias("id_a"),
            F.col("px").alias("xa"),
            F.col("py").alias("ya"),
            F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (cell("xa") + F.col("dx")).alias("cx"),
            F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            "cx",
            (cell("ya") + F.col("dy")).alias("cy"),
        )
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, ["cx", "cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dist_sq.cast("long").alias("dist_sq"),
        )
        .where(F.col("dist_sq") <= radius * radius)
    )
