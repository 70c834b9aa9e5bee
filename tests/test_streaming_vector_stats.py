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
    """The drift monitor is streaming-servable: each snapshot's
    (dim, bin) histogram is maintained by streaming/drift_job.py (the
    binned_counts/drift_from_bin_counts halves of the batch operator),
    and the report over the stored tables equals the batch
    distribution_drift over the raw vectors."""
    from flink_invoice_processor_spark.functions import similarity as SIM
    from flink_invoice_processor_spark.streaming.drift_job import (
        drift_histogram_writer,
        drift_report,
        read_drift_table,
    )

    side_a = _vecs(41, 30, d=2) + _vecs(42, 25, d=2)
    side_b = _vecs(43, 20, d=2)

    paths = {}
    for name, batches in (("a", [side_a[:30], side_a[30:]]), ("b", [side_b])):
        path = str(tmp_path / f"hist_{name}")
        w = drift_histogram_writer(path)
        for i, rows in enumerate(batches):
            w(
                spark.createDataFrame(
                    [(r["vec_id"], r["embedding"]) for r in rows], SCHEMA
                ),
                i,
            )
        paths[name] = path

    served = sorted(
        map(tuple, drift_report(spark, paths["a"], paths["b"]).collect())
    )
    a_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in side_a], SCHEMA
    )
    b_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in side_b], SCHEMA
    )
    batch = sorted(
        map(tuple, SIM.distribution_drift(a_df, b_df).collect())
    )
    assert served == batch

    # stored state is model-sized and a replayed epoch is fenced
    stored = read_drift_table(spark, paths["a"])
    assert stored.count() <= 2 * 12
    before = sorted(map(tuple, stored.collect()))
    drift_histogram_writer(paths["a"])(a_df, 1)  # replay of batch id 1
    after = sorted(
        map(tuple, read_drift_table(spark, paths["a"]).collect())
    )
    assert after == before


def test_drift_monitor_end_to_end_stream(spark, tmp_path):
    """Checkpointed Structured Streaming end to end: vectors arrive as
    files, the drift histogram accrues via foreachBatch, and the served
    report equals the batch operator."""
    import json as _json

    from flink_invoice_processor_spark.functions import similarity as SIM
    from flink_invoice_processor_spark.streaming.drift_job import (
        drift_histogram_writer,
        drift_report,
    )

    src = tmp_path / "in"
    rows = _vecs(51, 25, d=2)
    _write(src, "a.jsonl", rows[:10])
    _write(src, "b.jsonl", rows[10:])

    cur = str(tmp_path / "cur")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(drift_histogram_writer(cur))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    base = str(tmp_path / "base")
    baseline_rows = _vecs(52, 40, d=2)
    drift_histogram_writer(base)(
        spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in baseline_rows], SCHEMA
        ),
        0,
    )
    served = sorted(
        map(tuple, drift_report(spark, base, cur).collect())
    )
    batch = sorted(
        map(
            tuple,
            SIM.distribution_drift(
                spark.createDataFrame(
                    [(r["vec_id"], r["embedding"]) for r in baseline_rows],
                    SCHEMA,
                ),
                spark.createDataFrame(
                    [(r["vec_id"], r["embedding"]) for r in rows], SCHEMA
                ),
            ).collect(),
        )
    )
    assert served == batch
