"""Text retrieval scoring: BM25 over a documents table.

The inverted-index shape, distributed: term frequencies are one token
explode + hash aggregate, document frequencies one more aggregate over it,
corpus stats a 1-row broadcast.  Every input to the scalar BM25 formula is
an exact integer (tf, df, dl, N, sum_dl), so both engines evaluate the
same IEEE expression on identical operands — the established float
discipline (per-row doubles: identical expression shape; rounding only at
the edge).

Scale: the explode is linear and map-side combined; scoring joins key on
the term (Zipf-skewed, but only the QUERY's terms survive the semi filter,
so the join input is |terms| × docs-containing-term); ranking is a
per-term window.  Nothing global except the 1-row stats broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens

K1 = 1.2
B = 0.75


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query term by BM25.

    Output: (term, rank, doc_id, tf, dl, score) with rank 1..k by
    (4-decimal-rounded score DESC, doc_id ASC).  ``terms`` must be
    lowercase."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    tok_rows = df.select("doc_id", F.explode(toks).alias("tok"))
    dl = tok_rows.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        tok_rows.where(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (
                    F.col("tf")
                    * (K1 + 1)
                    / (
                        F.col("tf")
                        + K1
                        * (
                            1
                            - B
                            + B * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
                        )
                    )
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("tok").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("tok").alias("term"), "rank", "doc_id", "tf",
            "dl", "score",
        )
    )
