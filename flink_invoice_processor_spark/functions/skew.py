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
