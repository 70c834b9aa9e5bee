"""Distributed as-of (backward) join.

Spark has no built-in as-of join; the classic scalable formulation is
union-then-window: tag both sides, union them, and for every left row take
the latest right values at-or-before its timestamp with
``last(..., ignorenulls=True)`` over a (key, time)-ordered running window.
One shuffle on the key, one sort per partition — no range-blowup join, no
per-key collect, so it scales to arbitrarily large sides (this is the same
strategy pandas ``merge_asof`` uses, distributed).

Right-side rows sort *before* left-side rows at equal timestamps, giving
inclusive (``left.ts >= right.ts``) semantics — the same as DuckDB's
``ASOF JOIN``, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row of
    the same ``by`` key with ``right_on`` ≤ ``left_on`` (nulls if none —
    left-join semantics).

    ``value_cols`` must not collide with left column names (alias on the
    right side first).
    """
    left_cols = left.columns
    collisions = set(value_cols) & set(left_cols)
    if collisions:
        raise ValueError(f"value_cols collide with left columns: {collisions}")

    l_tagged = left.select(
        F.col(by).alias("_k"),
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        F.col(by).alias("_k"),
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    equal_keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lookback: str,
    lookahead: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: pair each left row with the right rows of the
    same key whose ``right_ts`` lies in
    ``[left_ts - lookback, left_ts + lookahead)``.

    The equality keys carry the shuffle; the time bounds are a residual
    predicate evaluated inside each key's partition, so state per key is
    bounded by that key's rows.  Column names must be disjoint between the
    two sides (pre-alias the right side).

    Works unchanged on streams: with ``withWatermark`` on both sides the
    bounded time condition lets Spark expire join state once the watermark
    passes ``left_ts + lookback`` — the standard scalable shape for
    stream-stream correlation.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both sides have: {overlap}")
    cond = None
    for lk, rk in equal_keys:
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    lo = right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lookback}")
    hi = right[right_ts] < left[left_ts] + F.expr(f"INTERVAL {lookahead}")
    cond = (cond & lo & hi) if cond is not None else (lo & hi)
    return left.join(right, cond, how)
