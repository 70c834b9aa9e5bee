"""Declarative data-quality constraint checking (Deequ-style).

A production ingest at 100 TB gates every batch on constraint checks —
completeness, uniqueness, ranges, reference integrity — and the naive
implementation (one job per check) re-scans the table per constraint.
This engine compiles a declared check suite into ONE aggregation pass:
every non-uniqueness check is a conditional count in the same agg, and
uniqueness folds in as count-minus-approx-free exact distinct (its own
hash-agg on the checked column, the unavoidable shuffle).  The output is
a small (check, column, violations, status) report — the shape you'd
alert on.

Checks are plain data (name + SQL condition), so the suite serializes,
diffs, and replays — and the DuckDB oracle recomputes the identical
conditional counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``violation_cond`` is a SQL boolean expression
    counting a row as a violation when true.  ``distinct_col`` switches
    the check to uniqueness mode (violations = n_rows - n_distinct)."""

    name: str
    column: str
    violation_cond: str | None = None
    distinct_col: str | None = None


def not_null(column: str) -> Check:
    return Check(f"not_null({column})", column, f"{column} IS NULL")


def in_range(column: str, lo, hi) -> Check:
    return Check(
        f"range({column})",
        column,
        f"{column} IS NULL OR {column} < {lo} OR {column} > {hi}",
    )


def _sq(v: str) -> str:
    """SQL single-quote a string value (embedded quotes doubled)."""
    return "'" + v.replace("'", "''") + "'"


def accepted_values(column: str, values: list) -> Check:
    quoted = ", ".join(
        _sq(v) if isinstance(v, str) else str(v) for v in values
    )
    return Check(
        f"accepted_values({column})",
        column,
        f"{column} IS NULL OR {column} NOT IN ({quoted})",
    )


def unique(column: str) -> Check:
    return Check(f"unique({column})", column, distinct_col=column)


def matches(column: str, regex: str) -> Check:
    return Check(
        f"matches({column})",
        column,
        f"{column} IS NULL OR NOT regexp_like({column}, {_sq(regex)})",
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate a check suite in one conditional-aggregate pass (plus one
    distinct-agg per uniqueness check).  Output rows:
    (check_name, column, n_rows, violations, status) with status
    'pass'/'fail' — deterministic, ordered by check_name via the caller's
    sort if needed."""
    if not checks:
        raise ValueError(
            "run_checks: empty check suite (declare at least one Check)"
        )
    conds = [c for c in checks if c.violation_cond is not None]
    uniqs = [c for c in checks if c.distinct_col is not None]

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(conds):
        aggs.append(
            F.sum(
                F.when(F.expr(c.violation_cond), 1).otherwise(0)
            ).alias(f"_v{i}")
        )
    for i, c in enumerate(uniqs):
        aggs.append(F.count_distinct(F.col(c.distinct_col)).alias(f"_d{i}"))
    row = df.agg(*aggs)

    reports = []
    for i, c in enumerate(conds):
        reports.append(
            row.select(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").cast("long").alias("violations"),
            )
        )
    for i, c in enumerate(uniqs):
        reports.append(
            row.select(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_d{i}")).cast("long").alias(
                    "violations"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name",
        "column",
        "n_rows",
        "violations",
        F.when(F.col("violations") == 0, "pass")
        .otherwise("fail")
        .alias("status"),
    )


def referential_integrity(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Orphan check: child keys with no parent (left anti join — at scale
    Spark picks broadcast or shuffle side automatically; the report is
    one row).  Output: (check_name, column, n_rows, violations, status).
    """
    n = child.agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    orphans = (
        child.select(F.col(child_col).alias("_k"))
        .join(
            parent.select(F.col(parent_col).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return (
        n.crossJoin(orphans)
        .select(
            F.lit(f"ref_integrity({child_col})").alias("check_name"),
            F.lit(child_col).alias("column"),
            "n_rows",
            F.col("violations").cast("long").alias("violations"),
            F.when(F.col("violations") == 0, "pass")
            .otherwise("fail")
            .alias("status"),
        )
    )


def gated_writer(
    checks: list[Check],
    good_path: str,
    quarantine_path: str,
    max_violation_frac: float = 0.0,
):
    """``foreachBatch`` function gating every micro-batch on a DQ suite.

    The production ingest pattern: evaluate the declared checks on each
    micro-batch (one aggregation pass — :func:`run_checks`); if the
    worst check's violation fraction exceeds ``max_violation_frac`` the
    WHOLE batch goes to the quarantine table with its check report,
    otherwise to the good table.  Either way the batch lands exactly once
    as observed by readers (see the replay note below) and the stream
    never stalls on bad data — the reference
    engine's retry/dead-letter philosophy
    (`REF/source/InvoiceRetrySource.java:44-99`) applied to batch
    admission instead of per-record errors.

    Every write targets a ``batch_id=N`` partition directory with
    overwrite mode, so a REPLAYED epoch (foreachBatch offers
    at-least-once invocation) rewrites its own partition
    deterministically instead of appending duplicates — replay-idempotent
    like the sketch rollups.  Reports land the same way under
    ``<good_path>/_dq_reports`` (an underscore path, so table readers of
    the good directory skip it), with ``batch_id`` carried by the
    partition directory.

    Replay idempotence assumes a stable batch_id↔data mapping — ONE
    checkpoint lineage per (good_path, quarantine_path) pair, the same
    contract ``cms_rollup_writer`` documents.  Against the id-REUSE case
    (a fresh checkpoint restarting ids at 0 over existing tables, where
    batch N's verdict may flip between lineages) the writer also deletes
    the SIBLING table's ``batch_id=N`` partition before writing: a batch
    can land in the good table or quarantine, never both.
    """

    def process(batch_df, batch_id: int) -> None:
        import os

        report = run_checks(batch_df, checks)
        rows = report.collect()  # tiny: one row per check
        n = max((r.n_rows for r in rows), default=0)
        worst = max((r.violations for r in rows), default=0)
        bad = n > 0 and worst > max_violation_frac * n
        target = quarantine_path if bad else good_path
        sibling = good_path if bad else quarantine_path
        part = f"batch_id={batch_id}"
        spark = batch_df.sparkSession
        # drop the other lineage's copy of this batch_id first (Hadoop FS,
        # so the path scheme — local, HDFS, s3a — doesn't matter)
        sib = spark._jvm.org.apache.hadoop.fs.Path(
            os.path.join(sibling, part)
        )
        fs = sib.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(sib):
            fs.delete(sib, True)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(target, part)
        )
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(good_path, "_dq_reports", part)
        )

    return process
