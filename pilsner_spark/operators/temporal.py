"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval range join.

Both are classic event/time-series operators (kdb+ ``aj``, pandas
``merge_asof``, DuckDB ``ASOF JOIN``) that a naive Spark formulation
executes catastrophically: an inequality join compiles to
BroadcastNestedLoopJoin (O(n*m) comparisons) or a per-left-row sort-merge
re-scan. The implementations here use the two standard scalable
re-formulations:

* ``asof_join`` — the UNION trick: tag left and right rows, union them,
  and let ONE per-key window (ordered by time, right-before-left at equal
  timestamps) carry the latest right payload forward via
  ``last(ignorenulls=True)``. Exactly one shuffle on the join key; the
  window is per-key, never global. Per-key skew bounds the task (a hot
  user's events sort in one task) — at transcript scale keys are
  users/conversations with bounded event counts; for truly unbounded keys
  pre-split by a coarse time range and stitch the boundary, which this
  module documents rather than hides.
* ``range_join_buckets`` — time-bucket quantization: explode each
  interval to the fixed-width buckets it covers and equi-join points on
  (key, bucket) with a residual bounds filter — the inequality join
  becomes a hash join whose fan-out is interval_length / bucket_width
  (choose the width near the median interval length). This is the same
  rewrite Databricks' range-join optimization and every streams system
  perform.

Reference anchor: pgolo/pilsner has no temporal operators; these come
from the driver brief's custom-operator mandate (as-of / range joins are
its named examples).
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_buckets"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, List[str]],
    ts_col: str = "ts",
    value_cols: Optional[List[str]] = None,
    tiebreak_col: Optional[str] = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` within the same ``on`` key (backward as-of;
    the forward direction is the mirror image with a reversed ordering).

    Ties: a right row AT the left row's timestamp qualifies; among right
    rows sharing a timestamp the one with the greatest ``tiebreak_col``
    wins (deterministic — required for the DuckDB oracle; defaults to the
    first value column). Left rows with no prior right row keep nulls.

    Returns all left columns plus ``<ts_col><suffix>`` and
    ``<c><suffix>`` for each right value column.

    Physical shape: ONE shuffle (the per-key window sort over the unioned
    stream); no join node at all, so nothing nested-loops and the right
    side is never re-scanned per left row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [ts_col]]
    if tiebreak_col is None:
        tiebreak_col = value_cols[0]
    lpay = [c for c in left.columns if c not in keys]

    sel_left = (
        [F.col(k) for k in keys]
        + [F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"), F.lit(None).cast("double").alias("_tb")]
        + [F.col(c).alias(f"_l_{c}") for c in lpay]
        + [F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in [ts_col] + value_cols]
    )
    sel_right = (
        [F.col(k) for k in keys]
        + [
            F.col(ts_col).alias("_ts"),
            F.lit(0).alias("_side"),
            F.col(tiebreak_col).cast("double").alias("_tb"),
        ]
        + [F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in lpay]
        + [F.col(c).alias(f"_r_{c}") for c in [ts_col] + value_cols]
    )
    combined = left.select(*sel_left).unionByName(right.select(*sel_right))
    # rights sort before lefts at equal _ts (side 0 < 1) so "<=" holds;
    # among rights, _tb orders so last() picks the max-tiebreak row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined.select(
        *keys,
        "_side",
        *[F.col(f"_l_{c}") for c in lpay],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in [ts_col] + value_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        *keys,
        *[F.col(f"_l_{c}").alias(c) for c in lpay],
        *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in [ts_col] + value_cols],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    on: Union[str, List[str]],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 600,
    point_prefix: str = "p_",
    interval_prefix: str = "i_",
) -> DataFrame:
    """Point-in-interval join (``start <= ts <= end`` within the ``on``
    key) as an EQUI-join: time quantizes into ``bucket_seconds`` buckets,
    each interval explodes to every bucket it covers, each point lives in
    exactly one bucket, and the join runs on (key, bucket) with the exact
    bounds as a residual filter — no BroadcastNestedLoopJoin, no O(n*m).

    Fan-out is ceil(interval_len / bucket) + 1 rows per interval: pick
    ``bucket_seconds`` near the median interval length so the explode
    stays small while buckets stay selective. Each qualifying (point,
    interval) pair matches exactly once (the point's single bucket), so
    no dedup pass is needed.

    Returns key columns + point columns prefixed ``point_prefix`` +
    interval columns prefixed ``interval_prefix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w_us = int(bucket_seconds) * 1_000_000
    p_cols = [c for c in points.columns if c not in keys]
    i_cols = [c for c in intervals.columns if c not in keys]
    # cast covers TIMESTAMP_NTZ parquet columns (unix_micros wants LTZ)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))
    p = points.select(
        *keys,
        *[F.col(c).alias(f"{point_prefix}{c}") for c in p_cols],
        F.floor(us(ts_col) / w_us).alias("_bk"),
    )
    i = intervals.select(
        *keys,
        *[F.col(c).alias(f"{interval_prefix}{c}") for c in i_cols],
        F.explode(
            F.sequence(F.floor(us(start_col) / w_us), F.floor(us(end_col) / w_us))
        ).alias("_bk"),
    )
    return (
        p.join(i, keys + ["_bk"])
        .filter(
            (F.col(f"{point_prefix}{ts_col}") >= F.col(f"{interval_prefix}{start_col}"))
            & (F.col(f"{point_prefix}{ts_col}") <= F.col(f"{interval_prefix}{end_col}"))
        )
        .drop("_bk")
    )
