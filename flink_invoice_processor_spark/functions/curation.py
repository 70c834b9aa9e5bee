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
    return _md5_bucket_expr(col) % buckets


def _md5_bucket_expr(col: Column) -> Column:
    """The raw 60-bit md5 integer behind :func:`_md5_bucket` (no modulo)
    — for callers whose modulus is data-dependent (e.g. corpus size)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


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


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation set (the standard guard against
    test-set leakage into training corpora; n=5..13 in published
    pipelines).

    Output: one row per training doc — (doc_id, n_grams,
    n_contaminated, is_contaminated), where ``n_grams`` counts the doc's
    distinct n-grams and ``n_contaminated`` how many of them appear
    anywhere in the eval set.

    Scale shape: the eval side (benchmarks are tiny relative to a 100 TB
    corpus) collapses to a DISTINCT set of 63-bit n-gram hashes and is
    **broadcast**, so the training side — the big one — is a shingle
    explode feeding a broadcast-hash semi-join plus one doc_id-keyed
    aggregation (map-side combined, unique key, no skew).  Nothing big
    ever shuffles on the n-gram.
    """
    from .dedup import _md5_int63, shingles

    ev = (
        shingles(eval_df, n=n, text_col=text_col)
        .select(_md5_int63(F.col("shingle")).alias("gh"))
        .distinct()
    )
    tr = shingles(train, n=n, text_col=text_col).select(
        "doc_id", _md5_int63(F.col("shingle")).alias("gh")
    )
    per_doc = tr.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        tr.join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("_hits"))
    )
    return per_doc.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_contaminated"),
        (F.coalesce(F.col("_hits"), F.lit(0)) > 0).alias("is_contaminated"),
    )


def pack_sequences(
    df: DataFrame, seq_len: int = 128, text_col: str = "text"
) -> DataFrame:
    """GPT-style sequence packing layout: concatenate every document's
    tokens (plus one end-of-document separator each) in doc_id order into
    one virtual token stream, then cut the stream into fixed ``seq_len``
    training sequences.  Emits, per non-empty document, its exact placement:
    (doc_id, n_tokens, token_offset, first_seq, last_seq, n_seqs) — enough
    for a writer to materialize any sequence range independently.

    The global token offset is an exact prefix sum over a total order —
    the textbook distributed formulation, NOT a single-partition window:

    1. ``repartitionByRange(doc_id)`` so partition i holds a contiguous
       doc_id range (pinned via ``localCheckpoint`` — range partitioning
       samples, and the two consumers below must see the SAME layout);
    2. per-partition prefix sums via a window PARTITIONED by the physical
       partition id (parallel across partitions);
    3. per-partition totals (one tiny row per partition) cumsum'd into
       partition start offsets — the only serial step touches ≤ P rows —
       then **broadcast** back.

    At 100 TB this is one range shuffle + one broadcast join; no stage ever
    funnels the data through a single task, which a naive
    ``Window.orderBy(doc_id)`` with no partitionBy would."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    counts = df.select("doc_id", F.size(toks).cast("long").alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    ranged = (
        counts.repartitionByRange("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = ranged.withColumn(
        "_local_prefix",
        F.coalesce(
            F.sum(F.col("n_tokens") + 1).over(w_local), F.lit(0).cast("long")
        ),
    )
    part_sums = ranged.groupBy("_pid").agg(
        F.sum(F.col("n_tokens") + 1).alias("_psum")
    )
    w_part = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    part_offsets = part_sums.select(
        "_pid",
        F.coalesce(F.sum("_psum").over(w_part), F.lit(0).cast("long")).alias(
            "_part_offset"
        ),
    )
    offset = (F.col("_part_offset") + F.col("_local_prefix")).alias("token_offset")
    first = F.floor(F.col("token_offset") / seq_len).cast("long")
    last = F.floor((F.col("token_offset") + F.col("n_tokens")) / seq_len).cast("long")
    return (
        with_local.join(F.broadcast(part_offsets), "_pid")
        .select("doc_id", "n_tokens", offset)
        .select(
            "doc_id",
            "n_tokens",
            "token_offset",
            first.alias("first_seq"),
            last.alias("last_seq"),
            (last - first + 1).alias("n_seqs"),
        )
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


def tfidf_blocked_pairs(top: DataFrame, max_block_df: int = 100) -> DataFrame:
    """Candidate-pair integer dot products over a (doc_id, tok, score)
    top-terms table (the output shape of :func:`tfidf_top_terms`).

    Pairs must share a top term; similarity is the exact integer dot
    product of the shared-term scores.  The per-doc top-k bound caps one
    SIDE of the self-join, but NOT the join group: a hub term sitting in
    d documents' top lists contributes d^2/2 candidate pairs (measured
    3.7M pairs from 15k top-term rows on the sf0.1 corpus).  So — same
    discipline as ``dedup.jaccard_pairs``' stop-shingle guard — terms
    whose block exceeds ``max_block_df`` documents are dropped from the
    blocking entirely, bounding the pair count at
    ``sum(min(df, cap)^2)``.  The kept-term table after the cut is at
    most ``k * n_docs`` rows, so the filter side broadcasts.

    Output: (doc_id_a < doc_id_b, dot, n_shared_terms).
    """
    top = top.select("doc_id", "tok", "score")
    blockdf = top.groupBy("tok").agg(F.count("*").alias("block_df"))
    top = (
        top.join(
            F.broadcast(blockdf.where(F.col("block_df") <= max_block_df)),
            "tok",
            "inner",
        )
        .drop("block_df")
    )
    a, b = top.alias("a"), top.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(
            F.sum(F.col("a.score") * F.col("b.score")).alias("dot"),
            F.count("*").alias("n_shared_terms"),
        )
    )


def feature_hashing(
    df: DataFrame, n_buckets: int = 32, text_col: str = "text"
) -> DataFrame:
    """The hashing trick: map tokens into ``n_buckets`` hashed feature
    buckets and count per (doc, bucket) — the fixed-width featurization
    that needs no vocabulary pass.  Output is the sparse form
    (doc_id, bucket, n): rows = nonzeros, so wide-but-sparse documents
    stay cheap.  One explode + one map-side-combined aggregate on
    (doc_id, bucket); md5-derived bucket ids keep the layout engine-exact.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    return (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .select("doc_id", (_md5_bucket(F.col("tok"), n_buckets)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )


def distributed_row_number(
    df: DataFrame, order_cols: list[Column], out_col: str = "rn"
) -> DataFrame:
    """Global 1-based row numbers over a total order WITHOUT the classic
    scale bug (``Window.orderBy`` with no partitionBy funnels every row
    through one task).  Same two-phase shape as sequence packing:

    1. ``repartitionByRange`` on the order columns (partition i holds a
       contiguous slice of the order; pinned via ``localCheckpoint``);
    2. per-partition local ranks via a window PARTITIONED by the physical
       partition id;
    3. per-partition row counts (≤ P rows) cumsum'd into start offsets and
       broadcast back.

    ``order_cols`` must be a total order (add a unique tie-break column),
    otherwise numbering within ties is partition-dependent.

    Row numbering IS the inclusive prefix sum of 1 — this delegates to
    :func:`distributed_prefix_sum` so the subtle two-phase machinery
    lives in exactly one place."""
    return distributed_prefix_sum(
        df, order_cols, F.lit(1), out_col=out_col
    ).drop("_w")


def bigram_familiarity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count-based fluency/novelty signal per document: how common are the
    document's bigrams in the whole corpus?  The integer cousin of LM
    perplexity scoring (no log, so both engines agree bit-for-bit) — low
    ``sum_pair_freq`` with high ``n_singleton`` marks gibberish or
    boilerplate-mangled text; the inverse marks heavily duplicated text.

    Output: (doc_id, n_bigrams, sum_pair_freq, n_singleton) where
    ``sum_pair_freq`` sums the corpus frequency of every bigram occurrence
    and ``n_singleton`` counts occurrences whose bigram exists nowhere
    else.  Two hash aggregates (per-doc-pair, then corpus-pair) and one
    equi-join on the pair key — Zipf skew is absorbed by the per-document
    pre-aggregation, and the join output is bounded by |distinct (doc,
    pair)|, never tokens x docs.  Empty/1-token docs emit (0, 0, 0)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    t = F.col("_toks")
    big = 1 << 30
    grams = F.zip_with(
        t,
        F.slice(t, 2, big),
        lambda a, b: F.when(
            b.isNotNull(), F.concat_ws("\x01", a, b)
        ),
    )
    doc_pairs = (
        df.select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            F.explode_outer(F.filter(grams, lambda g: g.isNotNull())).alias(
                "pair"
            ),
        )
        .groupBy("doc_id", "pair")
        .agg(F.count(F.col("pair")).alias("n_in_doc"))
    )
    corpus = (
        doc_pairs.where(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(F.sum("n_in_doc").alias("n_corpus"))
    )
    return (
        doc_pairs.join(corpus, "pair", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n_in_doc").alias("n_bigrams"),
            F.coalesce(
                F.sum(F.col("n_in_doc") * F.col("n_corpus")), F.lit(0)
            ).alias("sum_pair_freq"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("n_corpus") == F.col("n_in_doc"))
                        & (F.col("n_in_doc") == 1),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_singleton"),
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.col("sum_pair_freq").cast("long").alias("sum_pair_freq"),
            F.col("n_singleton").cast("long").alias("n_singleton"),
        )
    )


def domain_mix_weights(
    df: DataFrame, total_budget: int = 1000, source_col: str = "source"
) -> DataFrame:
    """Temperature-sampled domain mixing (alpha = 0.5): per source, the
    sampling weight ``sqrt(n_docs)`` and the document allocation out of
    ``total_budget`` — the standard recipe for flattening a source
    distribution when composing a training mix (raw proportions overweight
    crawl-scale domains; uniform ignores size entirely; sqrt sits between).

    alpha = 0.5 specifically because IEEE sqrt is correctly rounded —
    Spark and DuckDB produce the SAME double for the same bigint, so
    ``floor(sqrt(n) * 1e6)`` is engine-exact (a pow(n, alpha) for general
    alpha is not guaranteed identical across libm implementations).

    Output: (source, n_docs, weight_1e6, alloc_docs) where ``alloc_docs =
    total_budget * w // sum(w)``, capped at ``n_docs``.  One hash aggregate
    over |sources| keys + a 1-row broadcast of the weight sum — nothing
    scales with corpus size except the first aggregate's scan."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    w6 = F.floor(F.sqrt(F.col("n_docs")) * 1000000).cast("long")
    weighted = counts.select(source_col, "n_docs", w6.alias("weight_1e6"))
    tot = weighted.agg(F.sum("weight_1e6").alias("_sum_w"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "weight_1e6",
            F.least(
                F.col("n_docs"),
                F.expr(f"{int(total_budget)} * weight_1e6 div _sum_w"),
            ).cast("long").alias("alloc_docs"),
        )
    )


def materialize_mix(
    df: DataFrame,
    total_budget: int = 1000,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """MATERIALIZE the temperature-sampled training mix that
    :func:`domain_mix_weights` only allocates: per source, select exactly
    ``alloc_docs`` documents by deterministic md5 rank — the actual
    document list a mix job hands to training, reproducible under
    retries (same hash order every run, no RNG state).

    Output: (id_col, source_col, mix_rank) — selected docs only,
    ``mix_rank`` 1..alloc within each source.

    Scale shape: the allocation table is |sources| rows (broadcast);
    ranking is a window PARTITIONED BY source — a keyed window, never
    global.  A single source bigger than one executor's sort budget is
    the standard keyed-window caveat: pre-filter with a sampled md5
    threshold per source (keep ~2× alloc by hash range, then rank) to
    bound the sorted set; the hash ranking makes the two-step refinement
    exact."""
    alloc = domain_mix_weights(df, total_budget, source_col).select(
        source_col, "alloc_docs"
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.select(id_col, source_col)
        .withColumn("mix_rank", F.row_number().over(w))
        .join(F.broadcast(alloc), source_col)
        .where(F.col("mix_rank") <= F.col("alloc_docs"))
        .select(id_col, source_col, "mix_rank")
    )


def length_bucket_batches(
    df: DataFrame,
    bucket_width: int = 64,
    batch_size: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batch assignment: group documents into token-length
    buckets of ``bucket_width`` and deal each bucket into batches of
    ``batch_size`` docs in doc_id order — the layout that minimizes pad
    waste when batching variable-length sequences for training (batch
    members share a bucket, so max-len padding is bounded by the bucket
    width).

    Output: (doc_id, n_tokens, bucket, batch_in_bucket).  One shuffle on
    the bucket key; the within-bucket numbering is a window per bucket.
    At 100 TB a single bucket can exceed one task's memory — then deal
    within (bucket, md5-salt) sub-partitions instead (same output
    contract, batches just interleave), or use ``distributed_row_number``
    per bucket; the plain window is the readable default."""
    # tokens() already yields an empty array for empty/whitespace-only text
    n = F.size(tokens(F.col(text_col))).cast("long")
    base = df.select("doc_id", n.alias("n_tokens")).withColumn(
        "bucket", F.expr(f"n_tokens div {int(bucket_width)}")
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "bucket",
        # truncating integer div (rn0 >= 0), matching the oracle's `//`
        F.expr(
            f"(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) "
            f"div {int(batch_size)}"
        ).cast("long").alias("batch_in_bucket"),
    )


def boilerplate_strip(
    df: DataFrame,
    passage_words: int = 4,
    min_df: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Repeated-passage (boilerplate) removal, Dolma/CCNet paragraph-dedup
    style over synthetic fixed-width passages.

    Documents are cut into consecutive non-overlapping ``passage_words``-
    token passages; a passage whose exact lowercase text appears in
    ``>= min_df`` distinct documents is boilerplate and is stripped from
    every document.  Output: (doc_id, n_passages, n_removed, clean_text)
    with clean_text the surviving passages rejoined in order.

    Scale shape: passage explode (linear) → hash-aggregate document
    frequency on the passage text (uniform md5-like shuffle key, no
    all-pairs) → one equi-join back → per-doc re-assembly aggregate.  The
    boilerplate side of the join is df-filtered and tiny relative to the
    corpus; nothing is quadratic.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    w = passage_words
    n_pass = F.ceil(F.size(toks) / w).cast("long")
    passages = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_pass - 1),
            lambda i: F.array_join(F.slice(toks, i * w + 1, w), " "),
        )
    )
    p = df.select(
        "doc_id", F.posexplode(passages).alias("pidx", "ptext")
    )
    boiler = (
        p.groupBy("ptext")
        .agg(F.countDistinct("doc_id").alias("pdf"))
        .where(F.col("pdf") >= min_df)
        .select("ptext", F.lit(True).alias("_is_b"))
    )
    flagged = p.join(boiler, "ptext", "left").select(
        "doc_id", "pidx", "ptext",
        F.coalesce(F.col("_is_b"), F.lit(False)).alias("_is_b"),
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_passages"),
        F.sum(F.col("_is_b").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_is_b"), F.struct("pidx", "ptext"))
                    )
                ),
                lambda x: x["ptext"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return df.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 8192,
    text_col: str = "text",
    exact_mode: str = "int64",
) -> DataFrame:
    """DSIR-inspired importance weights from hashed-bigram features.

    Data Selection via Importance Resampling (Xie et al. 2023) scores raw
    documents by how target-like their hashed n-gram distribution is.
    This implementation keeps the feature pipeline (hashed bigrams →
    bucket counts in the target subset vs the whole corpus) and scores
    each document with exact integer likelihood-ratio features:
    ``ratio6(bucket) = (tgt_cnt+1) * (T_raw + n_buckets) * 1e6
    div ((raw_cnt+1) * (T_tgt + n_buckets))`` — the add-1-smoothed
    P_target(bucket) / P_raw(bucket) with both counts normalized by their
    distribution totals, in fixed-point so the sum is deterministic under
    any aggregation order (the float log that DSIR sums is replaced by
    the ratio itself, which DuckDB oracles hash-match; per-bucket the
    ranking it induces is monotone-equivalent).

    Output: (doc_id, n_bigrams, imp_sum, imp_avg) where imp_avg =
    round(imp_sum / (n_bigrams * 1e6), 6) — an average target-likeness
    ratio, > 1.0 meaning more target-like than corpus-average.

    Scale shape: the bucket table is <= n_buckets rows — broadcast back;
    two linear scans, one hash-agg each, no skew (md5 buckets).

    ``exact_mode`` picks the fixed-point width (same contract as
    ``pmi_bigrams``):

    - ``"int64"`` (default): ``(tgt_cnt+1) * (T_raw+n_buckets) * 1e6``
      fits int64 up to ~3e8 corpus bigrams per job.  Exceeding the bound
      can NEVER silently wrap: a division-only ``assert_true`` guard
      fails the job loudly at any ANSI setting and names the fix.
    - ``"decimal"``: the wide path — identical expression in
      DECIMAL(38,0), cast back to BIGINT; plan unchanged.  Carries its
      own loud guard on the bigram total (~9.2e12) because the QUOTIENT
      is still a 1e-6-unit int64 ratio.
    """
    if exact_mode not in ("int64", "decimal"):
        raise ValueError(f"exact_mode must be int64|decimal, got {exact_mode!r}")
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = df.select("doc_id", target_filter.alias("_tgt"), toks.alias("_toks"))
    bigrams = F.when(
        F.size("_toks") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(F.col("_toks"), 1, F.size("_toks") - 1),
            F.slice(F.col("_toks"), 2, F.size("_toks") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    from .dedup import _md5_int63

    bg = base.select(
        "doc_id", "_tgt", F.explode(bigrams).alias("bigram")
    ).withColumn("bucket", _md5_int63(F.col("bigram")) % n_buckets)
    buckets = bg.groupBy("bucket").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(F.col("_tgt").cast("long")).alias("tgt_cnt"),
    )
    # distribution totals derive from the bucket table (no extra corpus
    # scan); the lookup is a broadcast hash JOIN, not a single-row map —
    # Spark MapType element_at scans the entries array linearly, which
    # is O(n_buckets) per probe once the feature space is actually full
    totals = buckets.agg(
        F.sum("raw_cnt").alias("t_raw"), F.sum("tgt_cnt").alias("t_tgt")
    )
    if exact_mode == "decimal":
        from .text import _MAXL

        ratio6 = F.expr(
            f"CAST(CAST(tgt_cnt + 1 AS DECIMAL(38,0)) * (t_raw + {n_buckets})"
            f" * 1000000 DIV (CAST(raw_cnt + 1 AS DECIMAL(38,0))"
            f" * (t_tgt + {n_buckets})) AS BIGINT)"
        )
        # Spark's DIV returns LONG: the QUOTIENT must fit int64 even in
        # decimal mode (under ansi=off an overflow would be a silent
        # NULL).  ratio6 <= (t_raw + n_buckets) * 1e6 always (tgt_cnt <=
        # raw_cnt), so guarding the bigram total guards the quotient
        guard = F.assert_true(
            F.col("t_raw") + n_buckets <= _MAXL // 1_000_000,
            F.lit(
                "dsir_weights[decimal]: the 1e-6-unit ratio itself would"
                " overflow int64 on this corpus — shard and merge bucket"
                " counts"
            ),
        ).isNull()
    else:
        from .text import _MAXL

        # divisions only — proves both int64 products fit before they run
        guard = F.assert_true(
            (
                F.col("tgt_cnt") + 1
                <= F.expr(f"({_MAXL} DIV 1000000) DIV (t_raw + {n_buckets})")
            )
            & (
                F.col("raw_cnt") + 1
                <= F.expr(f"{_MAXL} DIV (t_tgt + {n_buckets})")
            ),
            F.lit(
                "dsir_weights: int64 fixed-point would overflow on this"
                " corpus — use exact_mode='decimal' (or shard and merge"
                " bucket counts)"
            ),
        ).isNull()
        ratio6 = F.expr(
            f"(tgt_cnt + 1) * (t_raw + {n_buckets}) * 1000000"
            f" DIV ((raw_cnt + 1) * (t_tgt + {n_buckets}))"
        )
    scored = (
        bg.join(F.broadcast(buckets), "bucket")
        .crossJoin(F.broadcast(totals))
        .where(guard)
        .select("doc_id", ratio6.alias("_r6"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("_r6").alias("imp_sum")
    )
    imp_avg = F.round(
        F.col("imp_sum") / (F.col("n_bigrams") * 1000000.0), 6
    )
    return df.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("imp_sum", F.lit(0)).alias("imp_sum"),
        F.coalesce(imp_avg, F.lit(0.0)).alias("imp_avg"),
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    weight: Column,
    out_col: str = "cum_w",
) -> DataFrame:
    """Global inclusive prefix sum of ``weight`` over a total order,
    same two-phase shape as :func:`distributed_row_number` (range
    partition → per-partition window → <= P-row offset cumsum broadcast
    back) — never a single-partition window over row data.

    ``order_cols`` must be a total order; the weight column is emitted
    as ``_w`` alongside ``out_col``.  ``_w``/``_pid``/``_local``/``_off``
    are reserved: an input that already carries one would be silently
    clobbered by the ``withColumn`` below (``_w`` is even part of the
    public output contract), so collide loudly instead."""
    reserved = {"_w", "_pid", "_local", "_off"} & set(df.columns)
    if reserved:
        raise ValueError(
            "distributed_prefix_sum reserves column(s) "
            f"{sorted(reserved)}; rename them on the input DataFrame"
        )
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_w", weight.cast("long"))
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_local", F.sum("_w").over(w_local))
    part_sums = ranged.groupBy("_pid").agg(F.sum("_w").alias("_ps"))
    w_part = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_sums.select(
        "_pid",
        F.coalesce(F.sum("_ps").over(w_part), F.lit(0).cast("long")).alias(
            "_off"
        ),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def pps_systematic_sample(
    df: DataFrame,
    weight: Column,
    n_samples: int = 100,
    order_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: walk the
    cumulative-weight line in strides of ``total_w div n_samples`` and
    keep each unit whose weight interval crosses a stride boundary —
    inclusion probability proportional to weight, ~n_samples units, one
    pass, fully deterministic (stride start pinned at 0 instead of a
    random offset: at 100 TB a sampling job WILL be retried, and a
    random start would resample survivors; vary ``order_col`` to redraw).

    Units heavier than the stride cross multiple boundaries but are
    emitted once (certainty units, standard PPS behavior).  Output:
    (order_col, w, cum_w) for selected units.

    Scale shape: the prefix sum is the two-phase distributed kind; the
    stride is a 1-row broadcast; selection is a pure filter.
    """
    # project to (order, weight) BEFORE the prefix sum: its range
    # repartition + localCheckpoint materializes every input column, and
    # at corpus scale checkpointing full rows (text included) to rank a
    # 2-column line is pure waste
    slim = df.select(F.col(order_col), weight.cast("long").alias("_w0"))
    cum = distributed_prefix_sum(
        slim, [F.col(order_col)], F.col("_w0"), out_col="cum_w"
    ).drop("_w0")
    # the grand total is the max inclusive prefix — read it from the
    # (checkpointed, 2-column) cum frame instead of re-scanning the corpus
    totals = cum.agg(F.max("cum_w").alias("total_w"))
    stride = F.greatest(F.expr(f"total_w DIV {n_samples}"), F.lit(1))
    return (
        cum.crossJoin(F.broadcast(totals))
        .withColumn("_stride", stride)
        .where(
            F.expr("cum_w DIV _stride") > F.expr("(cum_w - _w) DIV _stride")
        )
        .select(order_col, F.col("_w").alias("w"), "cum_w")
    )


def contrastive_negative_pairs(
    df: DataFrame, k: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic negative-pair sampling for contrastive training
    (in-batch negatives pre-materialized): each anchor document draws
    ``k`` pseudo-random partners from the whole corpus, reproducibly.

    The naive shapes both fail at 100 TB: a cross join is quadratic, and
    ``rand()``-keyed sampling resamples on every task retry.  Instead the
    corpus gets a dense 1..n index (two-phase
    :func:`distributed_row_number` — never a global window), and draw j
    of each anchor targets index ``md5('neg:' || id || ':' || j) % n + 1``
    — one uniform equi-join on the index, n a 1-row broadcast.  Salted
    md5 (the engine-parity recipe, :func:`_md5_bucket`) decorrelates the
    draws from every other hash-gated decision and makes them stable
    across retries, machines, and input order.

    Self-draws (a hash landing on its own anchor, ~k/n of rows) are
    DROPPED, not redrawn: per-anchor negative counts are "up to k" —
    redrawing would need data-dependent iteration for a ~1/n event.
    Collisions between draws of one anchor are kept (sampling WITH
    replacement, the standard contrastive setup).

    PRECONDITION: ``id_col`` must be unique.  The dense 1..n index, the
    self-draw exclusion, and parity with the oracle's
    ``ROW_NUMBER() OVER (ORDER BY id)`` (whose tie numbering is
    partition-order-dependent) all assume one row per id.  A duplicated
    id fails LOUDLY via an ``assert_true`` folded into the 1-row total
    aggregate — zero per-row cost — instead of silently producing
    nondeterministic pairs.

    Output: (anchor_id, j, neg_id) with j in [0, k).
    """
    idx = distributed_row_number(
        df.select(F.col(id_col)), [F.col(id_col)], out_col="_rn"
    )
    # count(id_col), not count(*): both sides then ignore NULL ids, so
    # the guard fires on genuine duplicates only (a lone NULL id is not
    # a duplicate — its draws drop out via NULL concat as before)
    uniq_guard = F.assert_true(
        F.count(F.col(id_col)) == F.count_distinct(F.col(id_col)),
        F.lit(
            "contrastive_negative_pairs: duplicate values in id_col — "
            "the dense 1..n index and reproducible draw resolution "
            "require a unique id per row"
        ),
    )
    # the guard is NULL when the precondition holds; adding it to _n
    # keeps the check alive through column pruning without changing _n
    total = idx.agg(
        (F.max("_rn") + F.coalesce(uniq_guard.cast("long"), F.lit(0))).alias(
            "_n"
        )
    )
    anchors = (
        idx.select(
            F.col(id_col).alias("anchor_id"), F.col("_rn").alias("_self_rn")
        )
        .select(
            "anchor_id",
            "_self_rn",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "anchor_id",
            "j",
            "_self_rn",
            (
                _md5_bucket_expr(
                    F.concat(
                        F.lit("neg:"),
                        F.col("anchor_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                )
                % F.col("_n")
                + 1
            ).alias("_tgt_rn"),
        )
    )
    return (
        anchors.where(F.col("_tgt_rn") != F.col("_self_rn"))
        .join(idx.withColumnRenamed("_rn", "_tgt_rn"), "_tgt_rn")
        .select(
            "anchor_id", "j", F.col(id_col).alias("neg_id")
        )
    )


def leakage_safe_split(
    clusters: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Train/val/test assignment at NEAR-DUP-CLUSTER granularity: every
    document in a connected near-duplicate cluster lands in the same
    split, so a test document can never have a near-copy in train — the
    leakage mode a plain per-document split is blind to (and the reason
    decontamination pipelines split AFTER clustering, not before).

    Input: (doc_id, cluster_id) from :func:`dedup.dup_clusters` (or any
    grouping).  The split keys on md5 of the salted CLUSTER id (stable
    across retries; the salt decorrelates it from the kfold/sampling
    hashes), thresholded at ``train_pct`` / ``train_pct + val_pct`` of
    100 buckets.  Pure map over the clusters table — the expensive part
    (clustering) is upstream and shared; this stays a zero-shuffle
    labeling.

    Output: (doc_id, cluster_id, split) with split in
    {'train', 'val', 'test'}.
    """
    bucket = _md5_bucket(
        F.concat(F.lit("split:"), F.col("cluster_id").cast("string")),
        buckets=100,
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def domain_term_lift(
    df: DataFrame,
    top_k: int = 5,
    min_count: int = 20,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain distinguishing terms — the class-based TF-IDF shape
    (c-TF-IDF, BERTopic): treat each ``group_col`` value as one class
    and rank its terms by frequency LIFT, the integer-exact substitute
    for the IEEE ``log``-scaled idf (engine log rounding differs;
    ratios don't):

        lift = P(term | class) / P(term | corpus)
             = (tf_tc / T_c) / (tf_t / T)

    emitted in 1e-6 fixed point via STAGED truncating division —
    ``(tf_tc * 1e6 DIV tf_t) * T DIV T_c`` — so every intermediate is
    provably <= 1e6 * T and a division-only ``assert_true`` guard on
    the corpus total fails loudly (at any ANSI setting) before int64
    could wrap, the pmi_bigrams contract.  lift > 1e6 means the term is
    over-represented in the domain; the famous c-TF-IDF use is naming
    what a data source actually contains before weighting it in a mix.

    Plan shape: one (group, token) hash-aggregate over the token explode
    (map-side combined), a vocabulary-sized token-marginal aggregate
    joined back ON the token, a |domains|-sized total broadcast, and a
    per-domain top-k window over (domain x vocabulary) AGGREGATE rows —
    never corpus rows.  Ties break lexicographically on the term.

    Output: (``group_col``, tok, n_tok, lift6, rank), ``top_k`` rows
    per domain among terms with ``n_tok >= min_count``.
    """
    from .text import _MAXL

    toks = df.select(
        F.col(group_col),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("tok"),
    )
    tf = toks.groupBy(group_col, "tok").agg(F.count("*").alias("n_tok"))
    class_totals = tf.groupBy(group_col).agg(F.sum("n_tok").alias("t_class"))
    term_totals = tf.groupBy("tok").agg(F.sum("n_tok").alias("t_term"))
    totals = tf.agg(F.sum("n_tok").alias("t_all"))
    scored = (
        tf.where(F.col("n_tok") >= min_count)
        .join(term_totals, "tok")
        .join(F.broadcast(class_totals), group_col)
        .crossJoin(F.broadcast(totals))
        # first factor <= 1e6 (n_tok <= t_term), so the product is bounded
        # by 1e6 * t_all: guarding the corpus total guards the product
        .where(
            F.assert_true(
                F.col("t_all") <= _MAXL // 1_000_000,
                F.lit(
                    "domain_term_lift: 1e-6 fixed-point lift would overflow"
                    " int64 on this corpus — shard the token counts and"
                    " merge, or reduce precision"
                ),
            ).isNull()
        )
        .select(
            group_col,
            "tok",
            "n_tok",
            F.expr("(n_tok * 1000000 DIV t_term) * t_all DIV t_class").alias(
                "lift6"
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("lift6").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(group_col, "tok", "n_tok", "lift6", "rank")
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 500,
    n: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source out-of-vocabulary rate against the corpus top-``vocab_size``
    word-``n``-gram vocabulary — the tokenizer-coverage report run before
    committing a vocabulary: which corpus slices a size-capped vocab
    serves worst (their text will fragment into the most fallback pieces).

    The vocabulary is the top-``vocab_size`` n-grams by total occurrence
    under the (count DESC, gram ASC) total order — ranked by
    :func:`distributed_row_number`, so the global cut needs no
    single-partition sort and is deterministic at the boundary.  The
    ≤``vocab_size``-row vocabulary is broadcast against the n-gram explode
    (no shuffle of the corpus side), and per-source totals are one
    map-side-combinable aggregate.  Output: (source, n_grams, n_oov,
    oov_rate rounded to 4 decimals).
    """
    from .dedup import gram_array

    toks = F.transform(tokens(F.col(text_col)), F.lower)
    grams = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(gram_array(toks, n)).alias("gram"),
        )
        .where(F.col("gram").isNotNull() & (F.col("gram") != ""))
    )
    gc = grams.groupBy("gram").agg(F.count("*").alias("n"))
    vocab = (
        distributed_row_number(
            gc, [F.col("n").desc(), F.col("gram").asc()], out_col="_rank"
        )
        .where(F.col("_rank") <= vocab_size)
        .select("gram")
    )
    flagged = grams.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))), "gram", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "source",
            "n_grams",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_grams"), 4).alias("oov_rate"),
        )
    )


def adaptive_quality_cut(
    df: DataFrame,
    pct: int = 75,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Adaptive per-source quality gate: keep each source's top documents
    by classifier score, with the cut threshold computed EXACTLY per
    source instead of one global constant — the curation move that stops
    a single low-quality-but-huge source from flooding the mix while a
    small clean source is clipped by a threshold tuned for the big one
    (per-domain percentile filtering, the CCNet bucketing idea applied
    as a hard gate).

    The score is the integer fixed-point of the hashed-bag linear
    classifier (functions/text.py:quality_classifier), shifted
    nonnegative so the truncating division is sign-free in every engine:
    ``score6 = (feat_sum + n_toks*QC_CENTER) * 1e6 div (n_toks*QC_MOD)``
    ∈ [0, ~1e6]; empty documents score 0.  The per-source threshold is
    the exact ``pct``-th percentile of that score, computed the
    scale-safe way (functions/stats.py): a (source, score6) VALUE
    HISTOGRAM — one map-side-combined shuffle bounded by the score
    domain (≤1e6 rows per source), never the row count — and rank
    selection ``thr6 = MIN(score6 WHERE cum >= ceil(pct*n/100))``.
    Kept = ``score6 >= thr6`` (ties at the threshold survive, so the cut
    is deterministic without a tiebreaker ordering).

    Scale shape: one token explode into a doc-keyed aggregate, one
    doc-keyed join back (zero-token docs re-enter with score 0), the
    histogram aggregate, and a tiny per-source threshold table broadcast
    back — the corpus is never shuffled on anything but doc_id.  The
    window runs over HISTOGRAM rows partitioned by source.  A
    division-only assert fails loudly if a document's token count would
    overflow the int64 fixed-point product (n_toks > 9e6).

    Output: (source, doc_id, score6, thr6) for kept documents only.
    """
    scored = classifier_score6(df, text_col=text_col, source_col=source_col)
    hist = scored.groupBy("source", F.col("score6").alias("val")).agg(
        F.count("*").alias("cnt")
    )
    thr = threshold_from_histogram(hist, pct=pct)
    return apply_quality_gate(scored, thr)


def apply_quality_gate(scored: DataFrame, thr: DataFrame) -> DataFrame:
    """Admit ``scored`` (source, doc_id, score6) rows at or above their
    source's ``thr6`` — THE single admission predicate and output
    projection, shared by the batch gate above and the streaming serve
    path (``streaming/curation_job.adaptive_survivors``) so a change to
    the tie semantics or columns can never drift the two apart."""
    return (
        scored.join(F.broadcast(thr), "source")
        .where(F.col("score6") >= F.col("thr6"))
        .select("source", "doc_id", "score6", "thr6")
    )


def classifier_score6(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, doc_id, score6): the nonnegative integer fixed-point of
    the hashed-bag linear classifier — ``score6 = (feat_sum +
    n_toks*QC_CENTER) * 1e6 div (n_toks*QC_MOD)`` ∈ [0, ~1e6], empty
    documents 0.  THE single scoring definition: the batch gate
    (:func:`adaptive_quality_cut`), the quantile calibrator
    (:func:`quantile_normalize_scores`), and the streaming curation
    job's maintained histogram (``streaming/curation_job.py``) all call
    this, so their scores agree by construction.  Fails loudly on
    documents whose token count would overflow the int64 fixed-point
    product (n_toks > 9e6)."""
    from .text import QC_CENTER, QC_MOD, quality_classifier

    return (
        df.select(F.col(source_col).alias("source"), "doc_id")
        .join(quality_classifier(df, text_col), "doc_id")
        .withColumn(
            "_ok",
            F.assert_true(
                F.col("n_toks") <= F.lit(9_000_000),
                F.lit(
                    "classifier_score6: score6 int64 arithmetic is only"
                    " proven to 9e6 tokens per document — chunk longer"
                    " documents first (chunk_documents)"
                ),
            ),
        )
        .where(F.col("_ok").isNull())
        .select(
            "source",
            "doc_id",
            F.when(F.col("n_toks") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    f"((feat_sum + n_toks * {QC_CENTER}) * 1000000)"
                    f" div (n_toks * {QC_MOD})"
                )
            )
            .alias("score6"),
        )
    )


def threshold_from_histogram(hist: DataFrame, pct: int = 75) -> DataFrame:
    """(source, thr6) from a (source, val, cnt) VALUE HISTOGRAM: the
    exact ``pct``-th-percentile rank selection ``thr6 = MIN(val WHERE
    cum >= ceil(pct*n/100))``.  THE single threshold definition — the
    batch gate computes its histogram inline, the streaming job serves
    the SAME selection from the maintained histogram rollup
    (``streaming/sketch_rollup.histogram_rollup_writer``), so the two
    gates agree bit for bit over identical ingested data.  The window
    runs over histogram rows (bounded by the score domain), never the
    corpus."""
    w = Window.partitionBy("source").orderBy("val")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    return (
        cum.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {int(pct)} + 99) div 100"),
                    F.col("val"),
                )
            ).alias("thr6")
        )
    )


def quantile_normalize_scores(
    df: DataFrame,
    pct_scale: int = 1_000_000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source score CALIBRATION: replace each document's raw
    classifier score with its exact within-source quantile — the move
    that makes scores comparable across heterogeneous sources before a
    single global cut (a web crawl and a code dump score on different
    raw scales; their 90th percentiles mean the same thing).

    ``q6 = cum * pct_scale div n`` where ``cum`` counts the source's
    documents with score ≤ mine — the empirical CDF in integer fixed
    point, exact and engine-agnostic.  Rides the same (source, score6)
    VALUE HISTOGRAM as :func:`adaptive_quality_cut` (shuffle bounded by
    the score domain, never row count); each document joins its
    histogram row by (source, score6) — a broadcast of the model-sized
    histogram.

    Output: (source, doc_id, score6, q6); ties share one quantile (the
    CDF at their common value).
    """
    scored = classifier_score6(df, text_col=text_col, source_col=source_col)
    hist = scored.groupBy("source", F.col("score6").alias("val")).agg(
        F.count("*").alias("cnt")
    )
    lookup = quantile_lookup_from_histogram(hist, pct_scale=pct_scale)
    return apply_quantile_lookup(scored, lookup)


def apply_quantile_lookup(scored: DataFrame, lookup: DataFrame) -> DataFrame:
    """Attach each scored row's within-source quantile — THE single
    calibration join and projection, shared by the batch normalizer
    above and the streaming serve path
    (``streaming/curation_job.calibrated_scores``)."""
    return scored.join(
        F.broadcast(lookup), ["source", "score6"]
    ).select("source", "doc_id", "score6", "q6")


def quantile_lookup_from_histogram(
    hist: DataFrame, pct_scale: int = 1_000_000
) -> DataFrame:
    """(source, score6, q6) from a (source, val, cnt) VALUE HISTOGRAM:
    the empirical CDF ``q6 = cum * pct_scale div n`` in integer fixed
    point.  THE single calibration definition — the batch normalizer
    computes its histogram inline, the streaming curation job serves the
    SAME lookup from the maintained histogram rollup
    (``streaming/curation_job.calibrated_scores``), so the two calibrate
    identically over identical ingested data.  Windows run over
    histogram rows (bounded by the score domain), never the corpus."""
    w = Window.partitionBy("source").orderBy("val")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    return cum.join(F.broadcast(tot), "source").select(
        "source",
        F.col("val").alias("score6"),
        F.expr(f"cum * {int(pct_scale)} div n").alias("q6"),
    )


def compaction_bins(
    docs: DataFrame,
    target_tokens: int = 512,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """File-compaction planner: assign each document to an output-file
    bin of ~``target_tokens`` tokens, per source, in deterministic
    ``id_col`` order — the small-files compaction step every large
    ingest needs (a 100 TB corpus written by thousands of streaming
    micro-batches is millions of kilobyte files; readers want
    row-group-sized ones).  ``bin_id = exclusive_prefix(n_tokens) div
    target`` within the source, so bins are contiguous in document
    order (stable across retries — pure function of the table) and
    fill at >= target on AVERAGE: the first b bins of a source always
    hold >= b·target tokens together (an individual bin undershoots
    only by however much its predecessor's last document overshot the
    boundary — documents are never split).

    Scale shape: ONE global two-phase prefix sum over
    (source, doc_id) — :func:`distributed_prefix_sum` range-partitions
    the total order, so work never concentrates on the SOURCE
    cardinality the way a ``Window.partitionBy(source)`` would (a
    handful of giant sequential partitions at corpus scale); the
    per-source rebase is a |sources|-row broadcast join.

    Output: (``source_col``, ``id_col``, n_tokens, bin_id).
    """
    from pyspark.sql import functions as F

    from .text import tokens

    base = docs.select(
        F.col(source_col),
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    cum = distributed_prefix_sum(
        base,
        [F.col(source_col), F.col(id_col)],
        F.col("n_tokens"),
        out_col="_cum",
    )
    # rebase the GLOBAL inclusive prefix to a per-source EXCLUSIVE one:
    # subtract the row's own weight (inclusive -> exclusive) and the
    # source's starting offset (min over the source of the exclusive
    # prefix — a |sources|-row aggregate, broadcast back)
    ex = cum.withColumn("_ex", F.col("_cum") - F.col("_w"))
    starts = ex.groupBy(source_col).agg(F.min("_ex").alias("_src0"))
    return (
        ex.join(F.broadcast(starts), source_col)
        .select(
            source_col,
            id_col,
            "n_tokens",
            F.expr(f"(_ex - _src0) DIV {int(target_tokens)}")
            .cast("long")
            .alias("bin_id"),
        )
    )


def file_skipping_report(
    df: DataFrame,
    file_expr,
    stat_cols: list[str],
    predicates: dict[str, tuple[str, int, int]],
) -> DataFrame:
    """Data-skipping planner over per-file min/max column statistics —
    the manifest-pruning decision Iceberg/Delta make before a scan ever
    touches parquet, surfaced as a queryable report: for each file
    (``file_expr`` assigns rows to their file), the exact min/max of
    each ``stat_cols`` entry plus, for every named predicate
    ``{name: (col, lo, hi)}``, whether the file can be SKIPPED for the
    range query ``lo <= col <= hi`` (skip ⇔ max < lo OR min > hi —
    stats disjoint from the range; the file cannot contain a match).

    Use it to audit a layout: a sorted/Z-ordered/Hilbert-ordered table
    shows most files skippable for selective ranges, a shuffled one
    shows none — the measurable difference between the
    :mod:`..tables` layout writers.  One map-side-combined aggregate,
    output bounded by the file count; nothing rescans rows.

    Output: (file_id, n_rows, <c>_min/<c>_max per stat col,
    skip_<name> per predicate).

    Decade-scale evidence (SCALING_r10): steady 0.17 → 0.43 s (2.46×)
    at a 0.25 s delta — one file-keyed min/max aggregate whose output
    is |files| rows; at these absolutes the reading is fixed per-query
    overhead plus a scan that grew 10×, and the aggregate state stays
    file-count-bounded at any corpus size."""
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    stats = df.withColumn("file_id", file_expr.cast("long")).groupBy(
        "file_id"
    ).agg(*aggs)
    for name, (c, lo, hi) in predicates.items():
        stats = stats.withColumn(
            f"skip_{name}",
            (F.col(f"{c}_max") < F.lit(lo)) | (F.col(f"{c}_min") > F.lit(hi)),
        )
    return stats


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the normalization every web-crawl
    corpus runs before URL-level dedup and frontier scheduling
    (CommonCrawl / Nutch discipline).  Rules, in order:

    - scheme and host lowercased; a leading ``www.`` stripped from the
      host;
    - default ports dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept;
    - the fragment (``#...``) dropped — it never reaches the server;
    - tracking query parameters dropped (``utm_*``, ``fbclid``,
      ``gclid``, ``ref``);
    - surviving query parameters sorted bytewise by their full
      ``name=value`` text (parameter order is almost never significant;
      sorting makes ``?a=1&b=2`` and ``?b=2&a=1`` collide);
    - trailing slashes stripped from the path (the root path
      canonicalizes to no path at all).

    Entirely regexp/array expressions — a PURE MAP with no shuffle, so
    canonicalization runs at scan speed at any corpus size, and the
    DuckDB oracle replays every rule with the same regexps.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"#.*$",
        "",
    )
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path_q = F.substring(rest, F.length(hostport) + 1, 1 << 30)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(F.regexp_extract(path_q, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
        )
    )
    sorted_q = F.concat_ws("&", params)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )


def url_dedup_report(
    df: DataFrame, url_col: str = "url", min_docs: int = 2
) -> DataFrame:
    """URL-level dedup report over :func:`canonical_url`: group the
    corpus by canonical URL and report every canonical address that
    multiple documents claim — the crawl-dedup pass that runs BEFORE
    any content hashing (a fetch you can skip is cheaper than a fetch
    you deduplicate).

    Scale shape: the canonicalization is a pure map; the report is ONE
    hash aggregate on the canonical string with map-side combine.
    Output: (canonical_url, n_urls, n_docs, canonical_doc_id) where
    ``n_urls`` counts distinct RAW spellings."""
    return (
        df.select("doc_id", F.col(url_col).alias("_u"))
        .select("doc_id", "_u", canonical_url(F.col("_u")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.countDistinct("_u").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select("canonical_url", "n_urls", "n_docs", "canonical_doc_id")
    )
