"""Corpus-curation operators for large-scale training-data pipelines:
context-window chunking, deterministic stratified sampling, repetition
statistics (Gopher-style quality signals), PII redaction, and TF-IDF top
terms.

Design rules shared with the rest of ``functions/``:

- everything is native column expressions or plain joins/aggregations — no
  Python UDFs, so the operators run at scan speed inside whole-stage
  codegen and scale by partitioning alone;
- every nondeterministic choice is removed: sampling buckets are
  md5-derived from the key (re-runnable, resumable — at 100 TB a sampling
  job WILL be retried, and random() would resample survivors), ranking
  ties break on the term, ratios are emitted as exact integer
  numerator/denominator pairs so DuckDB oracles hash-match bit-for-bit;
- chunking emits one output row per (doc, window) via a sequence explode —
  the row count is ceil(n_tokens / stride) per doc, linear in corpus size,
  and never materializes per-token rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens


def _md5_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the column's string
    form — identical in DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        % buckets
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the standard prep
    step that turns documents into training sequences bounded by a context
    window.  Chunk ``k`` covers tokens ``[k*stride, k*stride + chunk_size)``
    (1-based slice internally); chunks start while ``k*stride < n_tokens``,
    so tails shorter than ``chunk_size`` are kept and empty docs emit
    nothing.

    Output: (doc_id, chunk_id, n_tokens, chunk_text).  Linear work and
    output ~``n/stride`` rows per doc; no shuffle at all — chunking is a
    pure map, so at 100 TB it runs at parquet scan speed and the downstream
    writer controls partitioning.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(stride))).cast("long")
    exploded = (
        df.select("doc_id", toks.alias("_toks"), n_chunks.alias("_nc"))
        .where(F.col("_nc") > 0)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)).alias(
                "chunk_id"
            ),
        )
    )
    sl = F.slice(
        F.col("_toks"), (F.col("chunk_id") * stride + 1).cast("int"), chunk_size
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(sl).cast("long").alias("n_tokens"),
        F.concat_ws(" ", sl).alias("chunk_text"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
    key_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5 bucket
    (0-99, derived from the key) is below the stratum's percentage rate.

    This is how a 100 TB curation pipeline samples: hash-gated by key, so
    the sample is reproducible across retries and machines, composable
    (rate 20 then 50 ≡ rate 10 with independent salts), and needs no
    shuffle — it's a filter pushed against the scan.  ``rates`` maps
    stratum value → percent kept (0-100); unlisted strata get
    ``default_rate``.
    """
    rate = F.lit(default_rate)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    bucket = _md5_bucket(F.col(key_col))
    return df.withColumn("sample_bucket", bucket).where(
        F.col("sample_bucket") < rate
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals, emitted as exact integers
    (numerators and denominators; downstream computes the ratios):

    - ``n_tokens``, ``total_word_chars`` → mean word length;
    - ``n_2grams``, ``n_distinct_2grams`` → duplicate-2-gram fraction
      (high ⇒ boilerplate/repetition);
    - ``top_tok_count`` → most-frequent-token fraction (high ⇒ degenerate
      repetition).

    Array-side stats are a pure map; the mode count is one explode +
    two-level aggregation keyed on doc_id (map-side combined, no skew —
    doc_id is unique)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    t = F.col("_toks")
    big = 1 << 30
    grams2 = F.zip_with(
        t,
        F.slice(t, 2, big),
        lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
    )
    arr_stats = df.select("doc_id", toks.alias("_toks")).select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_word_chars"),
        F.size(F.filter(grams2, lambda g: g.isNotNull())).cast("long").alias(
            "n_2grams"
        ),
        F.size(F.array_distinct(F.filter(grams2, lambda g: g.isNotNull())))
        .cast("long")
        .alias("n_distinct_2grams"),
    )
    top = (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("_tf"))
        .groupBy("doc_id")
        .agg(F.max("_tf").alias("top_tok_count"))
    )
    return arr_stats.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "total_word_chars",
        "n_2grams",
        "n_distinct_2grams",
        F.coalesce(F.col("top_tok_count"), F.lit(0)).cast("long").alias(
            "top_tok_count"
        ),
    )


#: Redaction patterns — deliberately a portable regex subset (no lookarounds,
#: no shorthand classes) so Java (Spark) and RE2-style (DuckDB) engines
#: match identically.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+1-555-0[0-9]{3}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace e-mail addresses and (toy NANP test-range)
    phone numbers with typed placeholder tags, and report match counts.

    Output: (doc_id, n_emails, n_phones, redacted_md5, redacted_len) — the
    md5 pins the exact redacted text without shipping it.  Pure map; the
    regexes run inside codegen, so this is scan-speed at any scale."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE)).cast("long")
    n_phones = F.regexp_count(text, F.lit(PHONE_RE)).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by an integer TF-IDF score:
    ``score = tf * 1_000_000 div doc_freq`` (integer division — no
    logarithm, so the ranking is exactly reproducible across engines).

    Two aggregations and one join, all keyed on uniform hashable columns:
    term frequency groups on (doc_id, tok); document frequency groups on
    tok (vocabulary-sized — Zipf-skewed counts are fine because the
    aggregation is map-side combined; the join output stays bounded by the
    corpus token count).  Ties break on the term string.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    tf = (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("tok").agg(F.count("*").alias("doc_freq"))
    scored = tf.join(docfreq, "tok").select(
        "doc_id",
        "tok",
        F.expr("tf * 1000000 div doc_freq").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "score")
    )
