"""Skew-mitigation primitives: salted aggregation and salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default in
``session.get_spark``) handles most runtime skew; these explicit forms are
for the cases AQE can't restructure:

- **salted_aggregate** — a two-stage aggregate for *hot grouping keys*
  (e.g. counting 10¹² events over 5 event types): stage 1 aggregates on
  ``(key, salt)`` so the hot key's rows spread over ``salt_buckets``
  reducers, stage 2 re-aggregates the per-salt partials.  Spark's own
  partial aggregation usually makes this unnecessary — but when the
  per-key state is large (``collect_list``/distinct-ish accumulators) the
  final single-reducer-per-key hash agg is the bottleneck, and pre-salting
  is the standard fix.
- **salted_join** — an equi-join where the big side is skewed on the join
  key and the small side is too large to broadcast: the big side picks a
  deterministic salt per row, the small side is replicated ``salt_buckets``
  times, and the join keys on ``(key, salt)`` — the hot key's rows land on
  ``salt_buckets`` different reducers instead of one.

Both produce results identical to the unsalted form (checked by oracle /
tests); salting is purely a physical-distribution rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: partial-aggregate function → re-aggregate function
_REAGG = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation over skewed ``keys``.

    ``aggs`` maps output column → (function, input column) with function in
    {count, sum, min, max} (the algebraic set that re-aggregates cleanly;
    ``count`` re-aggregates as ``sum``).  ``count`` ignores its input
    column.  Exact-decimal inputs keep sums order-independent.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_REAGG)
    if unknown:
        raise ValueError(f"unsupported agg functions: {unknown}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                (F.count("*") if fn == "count" else getattr(F, fn)(F.col(col)))
                .alias(f"_p_{out}")
                for out, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, _REAGG[fn])(F.col(f"_p_{out}")).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (big, skewed) side salted and the right
    (small, un-broadcastable) side replicated ``salt_buckets`` times.

    Supports ``inner`` and ``left`` joins (the replicate-right rewrite is
    not sound for right/full outer).  Output columns = left ∪ right minus
    the duplicated join keys, same as ``left.join(right, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins only")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")),
    )
    return l.join(r, on + ["_salt"], how).drop("_salt")


def key_skew_profile(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Key-distribution skew diagnostics per group — the report read
    BEFORE choosing a join/aggregate strategy at scale: a top-key share
    near 1e6 (micro-units) or a Gini near 1 says "salt this key or let
    AQE split it"; a flat profile says the plain hash shuffle is fine.

    Scale shape is the value-histogram trick from functions/stats.py
    applied to COUNTS-OF-COUNTS: per-key counts (one map-side-combined
    shuffle, |keys| rows) collapse into the (group, count, n_keys)
    histogram (bounded by the count-value domain, NOT the key count),
    and the Gini index comes from a prefix sum over THOSE rows — keys
    with equal count occupy a contiguous rank run [s+1, s+m], so their
    rank-weighted mass is ``c·(m·s + m(m+1)/2)`` in closed form and the
    classic ``2·Σ rank·c − (K+1)·N`` numerator needs no per-key sort
    anywhere.  All mass sums are exact BIGINTs (int64-safe while
    ``keys·rows`` per group < 2^63); the two report ratios divide as
    DOUBLE at the edge (IEEE-deterministic; a diagnostic needs 15
    significant digits, not 38).

    Output: (group, n_rows, n_keys, max_count, top1_share6, gini6)."""
    kc = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("k"))
        .groupBy("g", "k")
        .agg(F.count("*").alias("c"))
    )
    hist = kc.groupBy("g", "c").agg(F.count("*").alias("m"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn("s", F.coalesce(F.sum("m").over(w), F.lit(0)))
    prof = ranked.groupBy("g").agg(
        F.sum(F.col("c") * F.col("m")).alias("n_rows"),
        F.sum("m").alias("n_keys"),
        F.max("c").alias("max_count"),
        F.sum(
            F.col("c")
            * (
                F.col("m") * F.col("s")
                + F.expr("m * (m + 1) div 2")
            )
        ).alias("t"),
    )
    gnum = (
        F.lit(2) * F.col("t")
        - (F.col("n_keys") + F.lit(1)) * F.col("n_rows")
    )
    return prof.select(
        F.col("g").alias(group_col),
        "n_rows",
        "n_keys",
        "max_count",
        F.round(
            F.col("max_count").cast("double")
            * F.lit(1000000.0)
            / F.col("n_rows").cast("double")
        )
        .cast("long")
        .alias("top1_share6"),
        F.round(
            gnum.cast("double")
            * F.lit(1000000.0)
            / (
                F.col("n_keys").cast("double")
                * F.col("n_rows").cast("double")
            )
        )
        .cast("long")
        .alias("gini6"),
    )
