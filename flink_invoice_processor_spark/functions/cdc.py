"""Change-data-capture MERGE apply: fold a batch of keyed change rows
(insert / update / delete) into a base snapshot in one batch plan.

This is the warehouse MERGE INTO (Delta/Iceberg upsert) semantics the
reference's retry-queue DML sink performs row-at-a-time against MySQL
(`REF/sink/InvoiceRetrySink.java:33-42` — CREATE/UPDATE/DELETE by key);
here the same contract is expressed set-oriented so a 100 TB snapshot
folds a change batch with ONE key-partitioned anti join plus a union:

- the anti join shuffles both sides on the natural key (or neither, if
  base and changes are bucketed on it — see tests/test_bucketing.py);
- updated/inserted payloads never touch the base scan;
- the output is a full new snapshot; at scale the write side would be
  partition-overwrite on the touched partitions only (the matview
  pattern, streaming/matview.py), which composes with this plan as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Change-row operations: delete, update (payload replaces the base
#: row), insert (payload is a new row).
CDC_OPS = ("D", "U", "I")


def apply_changes(
    base: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """New snapshot from ``base`` + one batch of change rows.

    ``changes`` carries an ``op`` column ('D'/'U'/'I') plus the full
    payload (base's columns) for 'U' and 'I' rows.  Contract: at most
    one change row per key per batch (the last-writer-wins collapse of
    a CDC stream into per-key batch deltas happens upstream — e.g. a
    max_by(ts) aggregate); duplicate keys in one batch are undefined,
    matching MERGE INTO.  Output adds ``src``:
    'kept' (untouched base row), 'updated', 'inserted'.
    """
    # lazy op-domain guard: an unknown op would be silently dropped by
    # both branch filters, so a 1-row bad-op count is asserted on BOTH
    # branches (a guard on one branch alone depends on that branch being
    # non-empty — or on Catalyst pushing the predicate across the join —
    # to ever evaluate).  Remaining corner: if base AND the valid
    # changes are BOTH empty the whole plan has no rows and no lazy
    # expression can fire — but then nothing was silently produced
    # either; callers needing an eager check can validate the batch
    # themselves before calling.
    n_bad = F.broadcast(
        changes.where(~F.col("op").isin(*CDC_OPS)).agg(
            F.count("*").alias("_n_bad")
        )
    )
    guard = F.assert_true(
        F.col("_n_bad") == 0,
        F.lit("apply_changes: op must be one of D/U/I"),
    ).isNull()
    touched = changes.where(F.col("op").isin("U", "D")).select(keys)
    kept = (
        base.join(touched, keys, "left_anti")
        .crossJoin(n_bad)
        .where(guard)
        .select(*base.columns, F.lit("kept").alias("src"))
    )
    replaced = (
        changes.where(F.col("op").isin("U", "I"))
        .crossJoin(n_bad)
        .where(guard)
        .select(
            *base.columns,
            F.when(F.col("op") == "U", "updated")
            .otherwise("inserted")
            .alias("src"),
        )
    )
    return kept.unionByName(replaced)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshot versions of a keyed table —
    the data-versioning audit run after any MERGE/backfill: what did the
    new load actually add, remove, and change?  (The inverse question of
    ``apply_changes``: given two snapshots, recover the change batch.)

    Classification per key: present only in ``new`` → 'added'; only in
    ``old`` → 'removed'; present in both with any compare column
    differing (null-safely: NULL vs value counts as a change, NULL vs
    NULL does not) → 'changed' with the differing column names
    comma-joined in ``changed_cols``; identical rows are dropped, so the
    output is churn-sized, not snapshot-sized.

    Scale shape: ONE key-partitioned full-outer join (co-location-free
    if both snapshots are bucketed on the key, same as apply_changes);
    the per-column null-safe comparisons are row-local projections.
    Output: keys + (change_type, changed_cols).
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    # concat_ws drops null elements, so each non-differing column simply
    # vanishes from the joined name list (identical semantics in DuckDB)
    diff_names = F.concat_ws(
        ",",
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        ),
    )
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(diff_names != F.lit(""), F.lit("changed"))
    )
    return (
        j.select(
            *keys,
            change_type.alias("change_type"),
            F.when(change_type == "changed", diff_names)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
        .where(F.col("change_type").isNotNull())
    )
