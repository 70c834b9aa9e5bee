"""Streaming vector-QA rollup: merged per-batch moment partials must
equal the batch partials of everything seen, covariance / dim-stats
served from the stored table must match the batch operators over all
raw vectors, and a replayed epoch must be fenced (SUM-merge is not
idempotent)."""

from __future__ import annotations

import json
import time

from flink_invoice_processor_spark.functions import similarity as SIM
from flink_invoice_processor_spark.streaming.sketch_rollup import (
    read_vector_stats_table,
    vector_stats_rollup_writer,
)

SCHEMA = "vec_id LONG, embedding ARRAY<DOUBLE>"


def _vecs(seed: int, n: int, d: int = 3):
    # deterministic fake embeddings without numpy: LCG in [-0.5, 0.5)
    state, out = seed, []
    for i in range(n):
        row = []
        for _ in range(d):
            state = (state * 1103515245 + 12345) % (1 << 31)
            row.append(state / (1 << 31) - 0.5)
        out.append({"vec_id": seed * 1000 + i, "embedding": row})
    return out


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _all_df(spark, batches):
    rows = [(r["vec_id"], r["embedding"]) for b in batches for r in b]
    return spark.createDataFrame(rows, SCHEMA)


def test_rollup_equals_batch_operators(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "vecstats"
    batches = [_vecs(1, 30), _vecs(2, 20), _vecs(3, 1)]
    for k, b in enumerate(batches):
        _write(src, f"{k}.jsonl", b)
        time.sleep(0.01)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(vector_stats_rollup_writer(str(table)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = read_vector_stats_table(spark, str(table))
    everything = _all_df(spark, batches)

    # partials merge to exactly the batch partials of the union
    batch_part = SIM.vector_stat_partials(everything)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, batch_part.collect())
    )

    # served covariance / dim-stats == batch operators on all raw rows
    assert sorted(
        map(tuple, SIM.covariance_from_partials(stored).collect())
    ) == sorted(map(tuple, SIM.covariance_matrix(everything).collect()))
    assert sorted(
        map(tuple, SIM.dim_stats_from_partials(stored).collect())
    ) == sorted(map(tuple, SIM.dim_stats(everything).collect()))


def test_replayed_epoch_is_fenced(spark, tmp_path):
    table = tmp_path / "vecstats"
    writer = vector_stats_rollup_writer(str(table))
    b0 = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in _vecs(7, 10)], SCHEMA
    )
    writer(b0, 0)
    before = sorted(map(tuple, read_vector_stats_table(spark, str(table)).collect()))
    writer(b0, 0)  # at-least-once replay of an already-merged epoch
    after = sorted(map(tuple, read_vector_stats_table(spark, str(table)).collect()))
    assert after == before

    # the NEXT batch id still merges
    b1 = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in _vecs(8, 5)], SCHEMA
    )
    writer(b1, 1)
    n_total = (
        read_vector_stats_table(spark, str(table))
        .where("i = 0 and j = 0")
        .first()["n"]
    )
    assert n_total == 15


def test_drift_served_from_maintained_bin_histograms(spark, tmp_path):
    """The drift monitor is streaming-servable: maintain each snapshot's
    (dim, bin) counts with the histogram rollup (key=dim, val=bin), then
    run the TVD tail over the stored tables — equals the batch
    distribution_drift over the raw vectors."""
    from pyspark.sql import functions as F

    from flink_invoice_processor_spark.streaming.sketch_rollup import (
        histogram_rollup_writer,
        read_histogram_table,
    )

    side_a = _vecs(41, 30, d=2) + _vecs(42, 25, d=2)
    side_b = _vecs(43, 20, d=2)

    def binned(df):
        ex = df.select(F.posexplode("embedding").alias("dim", "_x"))
        return ex.select(
            "dim",
            F.least(
                F.greatest(
                    F.expr(
                        "(CAST(round(CAST(_x AS DOUBLE) * 1000000, 0)"
                        " AS BIGINT) + 600000) div 100000"
                    ),
                    F.lit(0),
                ),
                F.lit(11),
            ).alias("bin"),
        )

    tables = {}
    for name, batches in (("a", [side_a[:30], side_a[30:]]), ("b", [side_b])):
        path = str(tmp_path / f"hist_{name}")
        w = histogram_rollup_writer(F.col("dim"), F.col("bin"), path)
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(
                [(r["vec_id"], r["embedding"]) for r in rows], SCHEMA
            )
            w(binned(df), i)
        tables[name] = read_histogram_table(spark, path)

    # TVD tail over the MAINTAINED tables (same grid/smoothing algebra)
    ca = tables["a"].selectExpr("CAST(k AS INT) AS dim", "CAST(val AS INT) AS bin", "cnt AS _ca")
    cb = tables["b"].selectExpr("CAST(k AS INT) AS dim", "CAST(val AS INT) AS bin", "cnt AS _cb")
    grid = (
        ca.select("dim").union(cb.select("dim")).distinct()
        .select("dim", F.explode(F.sequence(F.lit(0), F.lit(11))).alias("bin"))
    )
    cells = (
        grid.join(ca, ["dim", "bin"], "left")
        .join(cb, ["dim", "bin"], "left")
        .select(
            "dim", "bin",
            F.coalesce("_ca", F.lit(0)).alias("_ca"),
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
        )
    )
    pd_ = cells.groupBy("dim").agg(
        F.sum("_ca").alias("n_a"), F.sum("_cb").alias("n_b")
    )
    served = {
        r.dim: (r.n_a, r.n_b, r.tvd6)
        for r in cells.join(pd_, "dim")
        .select(
            "dim", "n_a", "n_b",
            F.expr(
                "abs((_ca + 1) * 1000000 div (n_a + 12)"
                " - (_cb + 1) * 1000000 div (n_b + 12))"
            ).alias("_d6"),
        )
        .groupBy("dim", "n_a", "n_b")
        .agg(F.expr("sum(_d6) div 2").alias("tvd6"))
        .collect()
    }

    from flink_invoice_processor_spark.functions import similarity as SIM

    a_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in side_a], SCHEMA
    )
    b_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in side_b], SCHEMA
    )
    batch = {
        r.dim: (r.n_a, r.n_b, r.tvd6)
        for r in SIM.distribution_drift(a_df, b_df).collect()
    }
    assert served == batch
