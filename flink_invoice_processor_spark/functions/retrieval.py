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


def trigram_postings(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, tri) character-trigram postings over lowercased
    text — the inverted index for substring search.  One linear map per
    document (``substr`` over a sequence of start offsets, then
    ``array_distinct``); at 100 TB you write this once, partitioned/
    bucketed by ``tri``, and searches never rescan the corpus."""
    # lower() ONCE in a projection: referencing the expression inside the
    # transform lambda would inline (and re-evaluate) it per trigram
    # position — O(len^2) per document, measured 2x on the whole search
    low = F.col("_low")
    # guard docs shorter than 3 chars BEFORE building the sequence:
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty, which
    # would emit the short text itself as junk non-trigram postings
    tris = F.when(
        F.length(low) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2),
            lambda i: F.substr(low, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", F.lower(F.col(text_col)).alias("_low"))
        .select("doc_id", F.explode(F.array_distinct(tris)).alias("tri"))
    )


def substring_search(
    df: DataFrame, query: str, text_col: str = "text"
) -> DataFrame:
    """Find every document containing the literal ``query`` WITHOUT a full
    corpus scan: candidate docs must hold ALL of the query's trigrams
    (an inverted-index semi-search — the postings filter `tri IN (...)`
    touches only the query's posting lists), then only candidates are
    verified against the raw text.  Occurrence count is computed by exact
    length arithmetic (``(len(t) - len(replace(t, q))) / len(q)``), not a
    regex, so both engines count identically with no escaping concerns.

    Output: (doc_id, n_occurrences ≥ 1).  At scale the candidate set is
    |docs containing the rarest trigram| — the verification join is a
    doc_id equi-join, never a scan."""
    q = query.lower()
    if len(q) < 3:
        raise ValueError("substring_search needs a query of >= 3 chars")
    q_tris = sorted({q[i:i + 3] for i in range(len(q) - 2)})
    cand = (
        trigram_postings(df, text_col)
        .where(F.col("tri").isin(q_tris))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nt"))
        .where(F.col("_nt") == len(q_tris))
        .select("doc_id")
    )
    low = F.lower(F.col(text_col))
    n_occ = (
        (F.length(low) - F.length(F.replace(low, F.lit(q), F.lit(""))))
        / F.lit(len(q))
    ).cast("long")
    return (
        df.join(cand, "doc_id")
        .select("doc_id", n_occ.alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )
