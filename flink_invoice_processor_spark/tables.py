"""Test-table loaders for /root/testdata/sf*/ (see TESTDATA.md).

``load_table`` normalizes physical-type quirks so every downstream operator
sees clean Spark types — notably ``events.ts``, whose physical layout has
varied across testdata generations (INT64 TIMESTAMP(NANOS), then
``timestamp[us]`` with no timezone).  Whatever the layout, ``ts`` leaves
here as TIMESTAMP_NTZ — the same naive-UTC wall clock DuckDB reads — via
timezone-independent conversions only (the driver's plain harness session
sets no timezone, so session-tz-dependent casts are forbidden on this
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet's physical layout for ts has changed across testdata
    # generations (INT64 TIMESTAMP(NANOS), then timestamp[us] with no tz);
    # without this conf a plain SparkSession (e.g. the driver's harness,
    # which does NOT go through our session factory) throws
    # PARQUET_TYPE_ILLEGAL on the nanos layout before the plan runs.
    # The conf is runtime-settable, so set it here at the only read site.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Canonicalize ts to TIMESTAMP_NTZ no matter which physical layout
        # this testdata generation uses.  NTZ is the right target: it is what
        # DuckDB sees for timestamp[us] (naive UTC wall clock), and every
        # conversion below is timezone-INDEPENDENT — the driver's plain
        # session does not set a session timezone, so any cast that consults
        # the session tz would silently change results between harnesses.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-as-long layout: integer division (float division of
            # ns-epoch longs ~1e18 loses precision beyond double's 53-bit
            # mantissa); timestampadd on an NTZ literal stays tz-free.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif ts_type == "timestamp":
            # tz-aware read (a session with NTZ inference disabled): project
            # the instant onto the UTC wall clock — same rows as the NTZ read.
            df = df.withColumn("ts", F.expr("convert_timezone('UTC', ts)"))
        # ts_type == "timestamp_ntz": already canonical, pass through
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed table.

    Bucketing pre-shuffles the data ONCE at write time: two tables bucketed
    on the same column with the same bucket count join with NO Exchange on
    either side (verified in tests via the physical plan), and a
    ``groupBy(bucket_col)`` needs no shuffle either.  This is the standard
    way to amortize the shuffle of a repeatedly-joined 100 TB fact table —
    pay it once at ingest, never at query time.
    """
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 5_000_000,
) -> None:
    """Persist ``df`` as a directory-partitioned parquet dataset.

    Directory partitioning is the other half of the ingest-time layout
    story (bucketing handles join keys; this handles range predicates):
    a date/hour-partitioned 100 TB event table turns every time-bounded
    query into a scan of only the matching directories — the planner
    resolves ``PartitionFilters`` against directory names without opening
    a single file footer.  ``maxRecordsPerFile`` bounds file size so a
    skewed partition becomes many splittable files, not one giant one.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    max_records_per_file: int = 5_000_000,
    row_group_size: int | None = None,
) -> None:
    """Persist parquet with rows sorted on ``sort_cols`` WITHIN each task
    partition (no global sort — no extra shuffle beyond what the caller
    already has).

    Sorting makes parquet row-group min/max statistics disjoint along the
    sort column, so any selective predicate on it skips whole row groups
    at scan time without reading a page — the single-column complement to
    directory partitioning (which handles coarse ranges) and bucketing
    (which handles join keys).  At 100 TB this is the difference between
    "point lookup touches every row group" and "touches one per file".
    """
    writer = (
        df.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if row_group_size is not None:
        # per-write row-group sizing (hadoop confs are fixed at session
        # start; the writer option applies to this write only)
        writer = writer.option("parquet.block.size", row_group_size)
    writer.parquet(path)


def zorder_value(c1, c2, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer columns —
    the multi-dimensional clustering key for :func:`write_sorted`.

    Sorting on one column makes its row-group stats disjoint but leaves
    the other column's spans full-domain; sorting on the Morton code gives
    BOTH columns locality (each row group covers a rectangle of the 2-D
    space), so selective predicates on either dimension skip row groups.
    This is the layout trick behind Delta/Iceberg Z-ORDER, as a plain
    column expression: ``write_sorted(df.withColumn("z", zorder_value(
    F.col("a"), F.col("b"))), path, ["z"])``.

    Columns must fit in ``bits`` bits (truncate/bucket upstream if not);
    the interleave is ~``2*bits`` codegen'd shift/mask ops per row."""
    z = F.lit(0).cast("long")
    a = c1.cast("long")
    b = c2.cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return z


def hilbert_value(c1, c2, bits: int = 16):
    """Hilbert-curve index of two non-negative integer columns — the
    stronger multi-dimensional clustering key: unlike the Morton code
    (:func:`zorder_value`), every unit step along the Hilbert curve is a
    unit step in the 2-D grid, so consecutive key ranges map to compact
    squares with no Z-shaped jumps — row groups cover tighter rectangles
    and range predicates on either dimension skip more of them (the
    reason Delta Lake added HILBERT alongside ZORDER).

    The classic xy→d walk (Hamilton's compact-Hilbert form: per level,
    quadrant digit ``(3·rx) XOR ry`` then reflect/transpose the frame)
    is loop-carried state, which would blow up as a nested-CASE column
    tree (each level references x and y three times → 3^bits nodes).
    Expressed instead as ONE Catalyst higher-order ``aggregate`` over
    the per-level bit weights with a (x, y, d) struct accumulator, it
    evaluates iteratively per row inside whole-stage codegen — linear
    expression size, no shuffle, no UDF.

    Columns must fit in ``bits`` bits; d < 4^bits (2^32 for bits=16).
    The reflection uses the FULL grid bound n-1 (the canonical
    Wikipedia walk), which keeps x and y inside [0, n) at every level —
    the s-bounded variant goes negative once x exceeds the current s,
    and negative intermediates break any quotient-based bit test (the
    SQL oracle's ``(x // s) % 2``)."""
    n_minus_1 = F.lit((1 << bits) - 1).cast("long")
    levels = F.array(*[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)])
    init = F.struct(
        c1.cast("long").alias("x"),
        c2.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        rx = (
            F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        ry = (
            F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        d2 = acc["d"] + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        nx = F.when(
            ry == 0,
            F.when(rx == 1, n_minus_1 - acc["y"]).otherwise(acc["y"]),
        ).otherwise(acc["x"])
        ny = F.when(
            ry == 0,
            F.when(rx == 1, n_minus_1 - acc["x"]).otherwise(acc["x"]),
        ).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(levels, init, step, lambda acc: acc["d"])
