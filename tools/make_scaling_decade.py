"""Synthesize a 10x-sf0.1 ("sf1-equivalent") documents + events dataset
for the extra scaling decade of the three worst-scaling families
(substring search, heavy hitters, PageRank — SCALING_r05.json).

The driver's testdata is read-only and tops out at sf0.1, so the decade
point is derived from it deterministically (md5 decisions, no RNG state):

- ``documents``: each sf0.1 doc yields 10 replicas.  Replica 0 is the
  original; replicas 1-9 substitute ~half their tokens (per-position md5
  coin) with hash-derived pseudo-words shared within the replica (so
  Zipf-ish repetition survives).  This grows the corpus 10x WITHOUT
  making replicas near-duplicates of each other — straight duplication
  would hand SimHash/LSH families quadratic intra-group pair blowups
  that say nothing about honest 10x growth.
- ``events``: 10 replicas with offset event ids and user ids (cardinality
  grows 10x, per-key activity stays flat — "more users", the realistic
  growth mode) and minute-shifted timestamps so no row duplicates.
- ``customer``/``orders``/``lineitem``: 10 replicas with consistently
  offset keys (custkey/orderkey shifted per replica, so every join
  relationship survives inside its replica) and minute-jittered dates —
  the relational decade for scan-agg and multi-join families.
- ``embeddings``: 10 replicas with offset vec_ids and per-component
  hash-derived jitter (±0.01) so replicas are geometrically DISTINCT —
  exact duplicates would hand the near-dup/SemDeDup families quadratic
  intra-replica pair blowups that say nothing about honest growth.

Usage: python tools/make_scaling_decade.py [out_dir]  (default
/tmp/sfbig_r6; skips generation for tables whose parquet already exists)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig_r6"
    src = "/root/testdata/sf0.1"
    tables = ("documents", "events", "customer", "orders", "lineitem",
              "embeddings")
    missing = [
        t for t in tables
        if not os.path.exists(os.path.join(out, f"{t}.parquet"))
    ]
    # static dimension tables copied verbatim: supplier/nation/region/part
    # are the broadcast side of every join that touches them, so the decade
    # point measures fact-table growth (the realistic mode — dimensions
    # grow far slower than facts) without leaving q2/q20/q21-style
    # families unrunnable at the decade dir
    import shutil

    for t in ("supplier", "nation", "region", "part"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.makedirs(out, exist_ok=True)
            shutil.copy(os.path.join(src, f"{t}.parquet"), dst)
    if not missing:
        print(f"{out}: already generated")
        return

    from pyspark.sql import functions as F

    from flink_invoice_processor_spark.session import get_spark

    spark = get_spark("make_scaling_decade")
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r")

    def write(df, name):
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    if "customer" in missing:
        c = spark.read.parquet(f"{src}/customer.parquet")
        write(
            c.select("*", reps).select(
                (F.col("c_custkey") + F.col("r") * 1_000_000).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
            ),
            "customer",
        )
    if "orders" in missing:
        o = spark.read.parquet(f"{src}/orders.parquet")
        write(
            o.select("*", reps).select(
                (F.col("o_orderkey") + F.col("r") * 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + F.col("r") * 1_000_000).alias("o_custkey"),
                "o_orderstatus", "o_totalprice",
                (F.col("o_orderdate") + F.make_interval(mins=F.col("r"))).alias("o_orderdate"),
                "o_orderpriority",
            ),
            "orders",
        )
    if "lineitem" in missing:
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        write(
            li.select("*", reps).select(
                (F.col("l_orderkey") + F.col("r") * 100_000_000).alias("l_orderkey"),
                "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                "l_linestatus",
                (F.col("l_shipdate") + F.make_interval(mins=F.col("r"))).alias("l_shipdate"),
            ),
            "lineitem",
        )
    if "embeddings" in missing:
        em = spark.read.parquet(f"{src}/embeddings.parquet")
        jitter = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.col("r"), j), F.lit(2001)
                    )
                    - 1000
                ).cast("double")
                / 100000.0
            ).cast("float"),
        )
        write(
            em.select("*", reps).select(
                (F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
                F.when(F.col("r") == 0, F.col("embedding"))
                .otherwise(jitter).alias("embedding"),
                "label",
            ),
            "embeddings",
        )

    if "documents" not in missing:
        docs = None
    else:
        docs = spark.read.parquet(f"{src}/documents.parquet")
    d = docs.select("doc_id", "text", "lang", "source", reps) if docs is not None else None
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # per-position md5 coin: keep the token or swap in a replica-scoped
    # pseudo-word (same (token, r) -> same word, preserving repetition)
    sub = F.transform(
        toks,
        lambda t, i: F.when(
            (F.col("r") == 0)
            | (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                                          F.col("r").cast("string"),
                                          i.cast("string"), t)),
                        1, 8,
                    ), 16, 10,
                ).cast("long") % 2 == 0
            ),
            t,
        ).otherwise(
            F.concat(
                F.lit("w"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", t, F.col("r").cast("string"))),
                            1, 8,
                        ), 16, 10,
                    ).cast("long") % 20000
                ).cast("string"),
            )
        ),
    )
    new_text = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.col("text")
    ).otherwise(F.concat_ws(" ", sub))
    if d is not None:
        (
            d.select(
                (F.col("r") * 10_000_000 + F.col("doc_id")).alias("doc_id"),
                new_text.alias("text"),
                "lang",
                "source",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )

    if "events" in missing:
        ev = spark.read.parquet(f"{src}/events.parquet")
        (
            ev.select("event_id", "ts", "user_id", "event_type", "value",
                      "props", reps)
            .select(
                (F.col("r") * 100_000_000 + F.col("event_id")).alias("event_id"),
                (F.col("ts") + F.make_interval(mins=F.col("r"))).alias("ts"),
                (F.col("user_id") + F.col("r") * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/events.parquet")
        )
    for t in tables:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{out}/{t}.parquet: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
