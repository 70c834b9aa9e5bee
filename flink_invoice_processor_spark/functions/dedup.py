"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:

- **exact**: one hash-aggregate on ``md5(normalized_text)`` — the shuffle
  key is a 128-bit digest, uniformly distributed, no skew.
- **n-gram Jaccard**: shingle-explode → self-equi-join on shingle →
  per-pair intersection counts.  The join key (shingle) is the classic
  skew hazard, so ``max_shingle_doc_freq`` drops stop-shingles before the
  join (a shingle appearing in half the corpus contributes O(n²) pairs and
  no discriminative signal).  At 100 TB you ALWAYS set this.
- **MinHash/LSH**: signatures are k column-wise min-aggregates over the
  shingle explode (map-side partial aggregation — no row blowup), banding
  turns O(n²) comparison into equi-join on band hash.
- **SimHash**: 32-bit bitwise-majority over token hashes via a
  32-way sequence explode + sum aggregate; near-dup candidates block on
  8-bit bands (4 blocks) then filter on Hamming distance ≤ 3.

Every hash is md5-derived (``conv(substr(md5(x),1,15),16,10)`` →
non-negative int63) so DuckDB oracles reproduce results exactly.  For
pure-Spark deployments ``xxhash64`` is the faster drop-in; the md5 default
keeps the correctness gate honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens

#: When True (default) the pair functions persist their shared explode,
#: eagerly ``localCheckpoint`` the (small) pair output, and release the
#: explode before returning — leak-free for long-lived sessions.  Set to
#: False (tools/plan_audit.py does) to get the fully LAZY plan instead:
#: a checkpointed result presents as a bare scan of a materialized RDD,
#: which would blind physical-plan audits to everything upstream.
MATERIALIZE_PAIRS = True


def _finish_pairs(out: DataFrame, cached: DataFrame) -> DataFrame:
    """Shared epilogue for the pair generators: materialize the pair
    output and release the big cached intermediate (see MATERIALIZE_PAIRS)."""
    if not MATERIALIZE_PAIRS:
        return out
    out = out.localCheckpoint()
    cached.unpersist()
    return out


def _md5_int63(col: Column) -> Column:
    """Portable deterministic 63-bit hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_coeff(j: int) -> tuple[int, int]:
    """Deterministic affine coefficients for MinHash family member j
    (Knuth multiplicative-hash constants, odd multiplier, 31-bit range)."""
    a = (2654435761 * (j + 1) + 1) % 2147483647
    b = (40503 * (j + 7)) % 2147483647
    return a, b


def normalize_text(text: Column) -> Column:
    return F.concat_ws(" ", F.transform(tokens(text), F.lower))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized content hash.  Returns one row per distinct
    content: canonical (min) doc_id and the duplicate count."""
    return (
        df.select(F.col("doc_id"), F.md5(normalize_text(F.col(text_col))).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_docs"),
        )
        .select("canonical_doc_id", "n_docs", F.col("h").alias("content_md5"))
    )


def gram_array(t: Column, n: int) -> Column:
    """Word n-gram array from a token-array column, in document order
    (duplicates kept — callers wanting SET semantics apply
    ``array_distinct``).

    Built by zipping n-1 shifted copies of the token array — O(tokens) per
    document.  (The obvious ``transform(sequence(...), i -> slice(toks, i,
    n))`` is O(tokens²): ``slice`` inside the lambda copies per index;
    measured 8.2 s vs 0.9 s over sf0.1 documents.)  The final zip guards on
    the last shifted element so partial tail shingles become null (drop
    them after the explode).
    """
    big = 1 << 30  # slice length "to the end"
    if n == 1:
        return t
    acc = t
    for shift in range(1, n):
        shifted = F.slice(t, shift + 1, big)
        if shift < n - 1:
            acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
        else:
            acc = F.zip_with(
                acc,
                shifted,
                lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
            )
    return acc


def shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).
    See :func:`gram_array` for the O(tokens) construction."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    tok_df = df.select("doc_id", toks.alias("_toks"))
    sh = gram_array(F.col("_toks"), n)
    return (
        tok_df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.col("shingle").isNotNull() & (F.col("shingle") != ""))
        .select("doc_id", "shingle")
    )


def duplicate_spans(
    df: DataFrame,
    span_tokens: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    key_on_digest: bool = False,
) -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-dedup family of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): every ``span_tokens``-token window of every document,
    aggregated corpus-wide; spans appearing in at least ``min_docs``
    DISTINCT documents are the memorization-prone duplicated text that
    span-level dedup cuts (where document-level MinHash/SimHash sees two
    long documents sharing one boilerplate paragraph as unrelated).

    Output: (span, n_docs, n_occurrences), duplicated spans only.

    Scale shape: the window explode is linear in corpus tokens (each
    token starts at most one span) and the aggregate is a plain hash-agg
    with map-side combine.  The default GROUP BY key is the span text
    itself (what the DuckDB oracle replays, registered as
    ``duplicate_spans_docs``); ``key_on_digest=True`` is the 100 TB
    mode — group on ``md5(span)`` and carry ``min(span)`` alongside:
    same plan, fixed 32-byte shuffle keys instead of whole span strings,
    and the digest doubles as the span id a removal pass joins on.
    ``min`` over a digest-equality group is the one span value (md5
    collisions aside), so the two modes return identical rows —
    pinned in ``tests/test_curation.py``.  Zipf skew is
    absorbed by the partial aggregation (a boilerplate span repeated a
    billion times is ONE row per map partition before the shuffle)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    spans = F.expr(
        f"transform(sequence(1, size(_toks) - {span_tokens - 1}),"
        f" i -> concat_ws(' ', slice(_toks, i, {span_tokens})))"
    )
    exploded = (
        df.select("doc_id", toks.alias("_toks"))
        .where(F.size("_toks") >= span_tokens)
        .select("doc_id", F.explode(spans).alias("span"))
    )
    if key_on_digest:
        return (
            exploded.select("doc_id", "span", F.md5("span").alias("span_h"))
            .groupBy("span_h")
            .agg(
                F.min("span").alias("span"),
                F.count_distinct("doc_id").alias("n_docs"),
                F.count("*").alias("n_occurrences"),
            )
            .where(F.col("n_docs") >= min_docs)
            .select("span", "n_docs", "n_occurrences")
        )
    return (
        exploded.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _shingle_intersections(
    df: DataFrame,
    n: int,
    text_col: str,
    max_shingle_doc_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of the exact shingle-overlap pair generators: the
    shingle explode, the optional stop-shingle cut, the self-equi-join on
    the shingle hash, and the per-pair intersection counts joined with both
    documents' set sizes.  Returns ``(base, sh)`` where ``base`` has
    (doc_id_a < doc_id_b, n_inter, n_a, n_b) and ``sh`` is the (possibly
    persisted) explode the caller must hand to :func:`_finish_pairs`."""
    # join on a 63-bit hash of the shingle, not the string: ~4× less shuffle
    # volume, and the oracle applies the identical md5-derived hash
    sh = shingles(df, n, text_col).select(
        "doc_id", _md5_int63(F.col("shingle")).alias("shingle_h")
    )
    if max_shingle_doc_freq is not None:
        freq = sh.groupBy("shingle_h").agg(F.count("*").alias("_df"))
        sh = (
            sh.join(F.broadcast(freq.where(F.col("_df") <= max_shingle_doc_freq)),
                    "shingle_h", "inner")
            .drop("_df")
        )
    # three downstream consumers (both join sides + sizes): materialize the
    # explode once instead of recomputing the tokenize/shingle/hash pipeline
    if MATERIALIZE_PAIRS:
        sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle_h") == F.col("b.shingle_h"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "doc_id_a").join(sb, "doc_id_b"), sh


def shingle_intersection_base(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """The finished (doc_id_a < doc_id_b, n_inter, n_a, n_b) candidate
    table both exact-overlap scorers read — exposed so a suite runner
    can build it ONCE and hand it to :func:`jaccard_pairs` and
    :func:`containment_pairs` via their ``base=`` parameter (the
    tfidf_top_terms suite-cache pattern): the shingle explode, cap, and
    self-join are identical for both; only the scoring denominator
    differs.  Standalone callers never need this — each scorer builds
    its own base when ``base`` is omitted."""
    base, sh = _shingle_intersections(df, n, text_col, max_shingle_doc_freq)
    return _finish_pairs(base, sh)


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_doc_freq: int | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    ``J(a,b) = |S_a ∩ S_b| / (|S_a| + |S_b| - |S_a ∩ S_b|)`` computed from a
    shingle self-join; returns (doc_id_a < doc_id_b, jaccard) above the
    threshold.  ``max_shingle_doc_freq`` prunes stop-shingles pre-join
    (mandatory at scale; see module docstring).  A suite runner can pass
    a shared :func:`shingle_intersection_base` as ``base``; the scorer is
    then a pure projection of it (n/text_col/cap are ignored — the base
    carries them).
    """
    def score(b: DataFrame) -> DataFrame:
        return b.select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        ).where(F.col("jaccard") >= threshold)

    if base is not None:
        return score(base)
    base_df, sh = _shingle_intersections(df, n, text_col, max_shingle_doc_freq)
    # the (small) pair output is materialized so the (large) persisted
    # shingle explode can be released NOW instead of leaking its cache
    # handle into the caller's session; checkpoint blocks free with the
    # DataFrame (ContextCleaner), no manual handle survives the call
    return _finish_pairs(score(base_df), sh)


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_shingle_doc_freq: int | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by exact n-gram set CONTAINMENT.

    ``C(a,b) = |S_a ∩ S_b| / min(|S_a|, |S_b|)`` — the smaller document's
    coverage by the shared shingles.  Catches the containment cases Jaccard
    structurally misses: a short document quoted whole inside a much longer
    one has J ≈ |S_short|/|S_long| (tiny) but C = 1.  Same blocked shingle
    self-join as :func:`jaccard_pairs` (and the same mandatory-at-scale
    ``max_shingle_doc_freq`` stop-shingle cut); only the denominator
    differs.  Returns (doc_id_a < doc_id_b, n_inter, containment ≥
    threshold, rounded to 4 decimals).  A suite runner can pass a shared
    :func:`shingle_intersection_base` as ``base`` (see
    :func:`jaccard_pairs`).
    """

    def score(b: DataFrame) -> DataFrame:
        return b.select(
            "doc_id_a",
            "doc_id_b",
            "n_inter",
            F.round(
                F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")), 4
            ).alias("containment"),
        ).where(F.col("containment") >= threshold)

    if base is not None:
        return score(base)
    base_df, sh = _shingle_intersections(df, n, text_col, max_shingle_doc_freq)
    return _finish_pairs(score(base_df), sh)


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise cross-SOURCE n-gram overlap — the contamination matrix a
    training-mix design needs before weighting sources: how much of each
    corpus slice is literally shared with every other slice.

    Per source the distinct shingle set is aggregated (map-side-combinable
    distinct on (source, shingle_h)), then a self-equi-join on the shingle
    hash counts shared shingles per source pair, and both Jaccard and
    containment are reported.  Scale: per-shingle join fan-out is bounded
    by ``n_sources²`` (sources are few by construction — this is the rare
    self-join that needs no frequency cap because the key's multiplicity
    per side is at most the source count), and the distinct aggregate
    shuffles (source, hash) pairs, not text.
    Output: (source_a < source_b, n_shared, jaccard, containment).
    """
    # reuse the per-row distinct shingle explode with the source as the id,
    # then collapse to distinct per SOURCE (many docs share shingles)
    rel = df.select(F.col(source_col).alias("doc_id"), F.col(text_col))
    sh = (
        shingles(rel, n, text_col)
        .select(
            F.col("doc_id").alias("source"),
            _md5_int63(F.col("shingle")).alias("shingle_h"),
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle_h") == F.col("b.shingle_h"))
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b")), 4
            ).alias("containment"),
        )
    )


def novelty_rate(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Per-document shingle NOVELTY: the fraction of a document's distinct
    word-``n``-gram shingles whose FIRST corpus appearance (minimum
    ``doc_id`` — ingestion order) is this document.  The curation report
    behind "is the tail of this crawl still contributing new content, or
    only re-crawling what we already have?" — a collapsing novelty rate
    over doc_id is the signal to stop ingesting a source.

    Scale shape: one distinct shingle explode hashed to int63 feeding TWO
    map-side-combinable aggregates — per-doc shingle counts, and
    ``min(doc_id)`` per shingle whose doc-keyed regroup counts each
    document's firsts — then one doc-keyed join of the two doc-sized
    results.  The exploded table is never JOINED back on the shingle key
    (the previous shape; its per-key fan-out was each shingle's document
    frequency and its shuffle carried the whole explode a second time —
    a strictly larger plan for the same two numbers).  Documents with no
    shingles (< ``n`` tokens) are absent from the report, exactly as
    they are absent from every shingle-based dedup path.

    Output: (doc_id, n_sh, n_novel, novelty_rate rounded to 4 decimals).
    """
    sh = shingles(df, n, text_col).select(
        "doc_id", _md5_int63(F.col("shingle")).alias("shingle_h")
    )
    if MATERIALIZE_PAIRS:
        sh = sh.persist()  # the two aggregates both read it
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    n_novel = (
        sh.groupBy("shingle_h")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").alias("n_novel"))
    )
    out = (
        n_sh.join(n_novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_sh"), 4
            ).alias("novelty_rate"),
        )
    )
    return _finish_pairs(out, sh)


def stop_shingles(
    df: DataFrame, n: int = 3, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """The corpus's most document-frequent ``n``-gram shingles with their
    document-frequency ratios — the audit report FOR the
    ``max_shingle_doc_freq`` stop-shingle cap every pair generator in this
    module mandates at scale: before picking the cap, look at what it will
    drop (boilerplate, template headers, stop-phrase runs) and how much of
    the corpus each candidate covers.

    ``df_ratio_6`` is the 1e-6 fixed point of df/n_docs computed by
    integer division (``df * 1e6 DIV n_docs``) — engine-exact, no IEEE
    rounding.  Ranking is (df DESC, shingle ASC) through the two-phase
    distributed row_number (no single-partition sort of the shingle
    vocabulary); the 1-row corpus-size aggregate broadcasts.

    Output: (shingle, df, df_ratio_6, rank ≤ ``top_k``).
    """
    from .curation import distributed_row_number

    sh = shingles(df, n, text_col)
    n_docs = sh.select("doc_id").distinct().agg(
        F.count("*").alias("n_docs")
    )
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = distributed_row_number(
        freq, [F.col("df").desc(), F.col("shingle").asc()], out_col="rank"
    ).where(F.col("rank") <= top_k)
    return (
        ranked.crossJoin(F.broadcast(n_docs))
        .select(
            "shingle",
            "df",
            F.expr("CAST(df * 1000000 DIV n_docs AS BIGINT)").alias(
                "df_ratio_6"
            ),
            "rank",
        )
    )


def minhash_signatures(
    df: DataFrame, k: int = 16, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """k-permutation MinHash signatures from n-gram shingles.

    One md5 per shingle gives a 31-bit base hash; the k-member hash family
    is the affine ``h_j = (a_j * base + b_j) mod (2^31 - 1)`` (products stay
    under 2^62, so no bigint overflow under ANSI mode).  Signature component
    j is the min over the document's shingles — k parallel min-aggregates
    over one shingle explode (map-side combine, no k× row blowup).  This is
    ~k× cheaper than hashing ``j:shingle`` k times and exactly reproducible
    in SQL.  Documents with no shingles are dropped.
    """
    sh = shingles(df, n, text_col)
    base = _md5_int63(F.col("shingle")) % F.lit(2147483648)
    hashed = sh.select(
        "doc_id",
        *[
            ((F.lit(minhash_coeff(j)[0]) * base + F.lit(minhash_coeff(j)[1]))
             % F.lit(2147483647)).alias(f"h{j}")
            for j in range(k)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{j}").alias(f"mh{j}") for j in range(k)]
    )


def band_rows(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """LSH band rows (doc_id, band_id, band_hash): the k-component
    MinHash signature split into ``bands`` bands of ``k/bands``
    components, each band md5-hashed.  One pass: explode an array of
    (band_id, band_hash) structs instead of a bands-way union (which
    would recompute the signature aggregation per branch per consumer).
    Shared by :func:`minhash_lsh_pairs` (self-join) and the persisted
    LSH store (``functions/lsh_index.py``) so the streaming and batch
    paths can never drift."""
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    sig = minhash_signatures(df, k, n, text_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col(f"mh{b * r + i}").cast("string") for i in range(r)],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.select("doc_id", F.explode(band_structs).alias("bb"))
        .select("doc_id", F.col("bb.band_id").alias("band_id"),
                F.col("bb.band_hash").alias("band_hash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: split the k-component signature into ``bands``
    bands of ``k/bands`` rows each; documents sharing any band hash are
    candidates.  Equi-join on (band_id, band_hash) — O(n²) only within a
    bucket, which is the whole point of LSH.

    Returns distinct (doc_id_a < doc_id_b, n_shared_bands).  Feed the pairs
    to ``jaccard_pairs``-style verification for the precision pass.
    """
    assert k % bands == 0, "k must divide into equal bands"
    banded = band_rows(df, k=k, bands=bands, n=n, text_col=text_col)
    if MATERIALIZE_PAIRS:
        banded = banded.persist()  # both self-join sides read it

    a = banded.alias("a")
    b = banded.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
        # small pair output materialized so the banded explode's cache
        # handle doesn't leak into the caller's session (see jaccard_pairs)
    )
    return _finish_pairs(out, banded)


def lsh_verified_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Two-stage near-duplicate detection: MinHash-LSH RECALL stage →
    exact n-gram-Jaccard PRECISION stage — the production dedup pipeline
    shape (RefinedWeb / SlimPajama style: banding over-generates, so
    every candidate is verified on its true shingle sets before a
    document is dropped).

    Stage 1 (``candidates`` or :func:`minhash_lsh_pairs`): banded
    signature equi-join, O(n²) only within a bucket.  Stage 2: exact
    Jaccard restricted to the candidate pairs — the shingle explode is
    LEFT-SEMI-pruned to documents that appear in a candidate first
    (the near-dup population, typically a few percent of the corpus),
    then the intersection is ONE equi-join chain keyed on the candidate
    doc ids: cand ⨝ shingles(a) ⨝ shingles(b on the same shingle hash).
    Work is Σ|shingles(a)| over candidates — bounded by the recall
    stage, never corpus², and immune to hub-shingle skew because the
    join keys are doc ids, not shingles.  Compare :func:`jaccard_pairs`,
    which self-joins the full corpus ON the shingle and needs the
    stop-shingle cap instead.

    Returns (doc_id_a < doc_id_b, n_shared_bands, jaccard) for
    candidates whose exact Jaccard clears ``threshold`` — the pairs the
    recall stage promised and the precision stage confirmed.
    """
    cand = (
        candidates
        if candidates is not None
        else minhash_lsh_pairs(df, k=k, bands=bands, n=n, text_col=text_col)
    ).select("doc_id_a", "doc_id_b", "n_shared_bands")
    members = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .union(cand.select(F.col("doc_id_b")))
        .distinct()
    )
    sh = (
        shingles(df, n, text_col)
        .join(members, "doc_id", "left_semi")
        .select("doc_id", _md5_int63(F.col("shingle")).alias("shingle_h"))
    )
    if MATERIALIZE_PAIRS:
        sh = sh.persist()  # sizes + both intersection probes read it
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(
            sh.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("shingle_h").alias("_h"),
            ),
            "doc_id_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("shingle_h").alias("_h"),
            ),
            ["doc_id_b", "_h"],
        )
        .groupBy("doc_id_a", "doc_id_b", "n_shared_bands")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared_bands",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return _finish_pairs(out, sh)


def minhash_calibration(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """MinHash ESTIMATOR calibration on the LSH candidate set: for every
    banded candidate pair, the signature-estimated Jaccard (matching
    components / k) next to the EXACT shingle-set Jaccard, with the
    absolute error — the measurement that justifies (or indicts) a chosen
    (k, bands) configuration before a dedup threshold is trusted at scale.
    Zero-intersection candidates (pure LSH false positives) are KEPT with
    exact 0 — they are the precision story; an inner join that silently
    dropped them would make every configuration look good.

    Scale shape: candidates and signatures are the already-audited LSH
    artifacts; the exact side is the same candidate-keyed intersection as
    :func:`lsh_verified_pairs` (work bounded by the recall stage, immune
    to hub-shingle skew), re-entered through a LEFT join on the pair key
    to preserve the zero-intersection rows.  Estimates are exact k-ths
    (k ≤ 64 divides 1e4), so rounding is engine-stable.

    Output: (doc_id_a < doc_id_b, n_shared_bands, n_matching,
    est_jaccard, exact_jaccard, abs_err — all rounded to 4 decimals).
    """
    cand = (
        candidates
        if candidates is not None
        else minhash_lsh_pairs(df, k=k, bands=bands, n=n, text_col=text_col)
    ).select("doc_id_a", "doc_id_b", "n_shared_bands")
    sig = minhash_signatures(df, k, n, text_col)
    sa_sig = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(k)],
    )
    sb_sig = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(k)],
    )
    est = (
        cand.join(sa_sig, "doc_id_a")
        .join(sb_sig, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared_bands",
            sum(
                F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
                for j in range(k)
            ).alias("n_matching"),
        )
    )
    members = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .union(cand.select(F.col("doc_id_b")))
        .distinct()
    )
    sh = (
        shingles(df, n, text_col)
        .join(members, "doc_id", "left_semi")
        .select("doc_id", _md5_int63(F.col("shingle")).alias("shingle_h"))
    )
    if MATERIALIZE_PAIRS:
        sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingle_h").alias("_h")),
            "doc_id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingle_h").alias("_h")),
            ["doc_id_b", "_h"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    ni = F.coalesce(F.col("n_inter"), F.lit(0))
    est_j = F.round(F.col("n_matching") / F.lit(k), 4)
    exact_j = F.round(ni / (F.col("n_a") + F.col("n_b") - ni), 4)
    out = (
        est.join(inter, ["doc_id_a", "doc_id_b"], "left")
        .join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared_bands",
            "n_matching",
            est_j.alias("est_jaccard"),
            exact_j.alias("exact_jaccard"),
            F.round(F.abs(est_j - exact_j), 4).alias("abs_err"),
        )
    )
    return _finish_pairs(out, sh)


def dup_clusters(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs — the step
    that turns pairwise dup evidence into dedup decisions (keep one
    canonical document per cluster).

    ``nodes``: one ``doc_id`` per document (singletons become their own
    cluster).  ``pairs``: (doc_id_a, doc_id_b) edges from any candidate
    generator (MinHash-LSH, SimHash bands, embedding LSH).  Returns
    (doc_id, cluster_id, cluster_size, is_canonical) where ``cluster_id``
    is the component's minimum doc_id.

    Algorithm: iterative min-label propagation with pointer doubling —
    each round every node takes the min of its own label, its neighbors'
    labels, and its label's label (the doubling step compresses chains
    by half per round, so convergence is O(log diameter), not
    O(diameter)).  Near-dup graphs are unions of small dense cliques
    (diameter ~2-3), so this terminates in a handful of rounds;
    ``max_iter`` is a guard, not a budget.  The driver loop only ever
    sees a scalar changed-count — no data is collected.

    Scale shape (the parts that matter at 100 TB):

    - **Propagation runs over edge-ENDPOINT nodes only.**  A node with
      no candidate pair can never change its label, so the per-round
      frames are sized by the near-dup population (typically a few
      percent of the corpus), not |V|; singletons are appended once at
      the end as their own size-1 clusters.  Before this, every round
      shuffled all |V| labels to relabel the tiny dup fraction.
    - **One aggregation per round, zero bookkeeping joins.**  The old
      label rides through the min-aggregate as a side column, so the
      convergence check is a filter-count on the just-checkpointed
      result instead of a per-round labels⨝new_labels join (which
      doubled each round's shuffle work).
    - **Edges are pre-partitioned on the probe key** (``src``) once at
      build, and each round's output is hash-partitioned on ``doc_id``
      by the aggregate and pinned there by ``localCheckpoint`` — the
      next round's neighbor join and doubling join both reuse it.
    - ``localCheckpoint`` per round cuts lineage so plans don't grow
      (the classic iterative-DataFrame trap).
    """
    edges = (
        pairs.select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
        )
        .distinct()
        .repartition(F.col("src"))
        .persist()
    )
    # only nodes that appear in an edge can ever be relabeled
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    changed = -1
    try:
        for _ in range(max_iter):
            prop = edges.join(
                labels.withColumnRenamed("doc_id", "src"), "src"
            ).select(F.col("dst").alias("doc_id"), "label")
            # pointer doubling (label-of-label): same fixed point (the
            # component min), one extra equi-join per round
            shortcut = (
                labels.alias("a")
                .join(
                    labels.alias("b"),
                    F.col("a.label") == F.col("b.doc_id"),
                )
                .select(F.col("a.doc_id").alias("doc_id"), F.col("b.label"))
            )
            # the labels leg carries its current label a second time as
            # `old`; after the min-aggregate, label != old IS the change
            # indicator — no join needed to detect convergence
            new_labels = (
                labels.select("doc_id", "label", F.col("label").alias("old"))
                .unionByName(prop.withColumn("old", F.lit(None).cast("long")))
                .unionByName(shortcut.withColumn("old", F.lit(None).cast("long")))
                .groupBy("doc_id")
                .agg(F.min("label").alias("label"), F.max("old").alias("old"))
                .localCheckpoint()
            )
            changed = new_labels.where(F.col("label") != F.col("old")).count()
            labels = new_labels.drop("old")
            if changed == 0:
                break
    finally:
        edges.unpersist()
    if changed != 0:
        # silently returning intermediate labels would report one true
        # component as several clusters and let duplicates survive dedup
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); the pair graph has "
            "a longer diameter than expected — raise max_iter or switch to "
            "large-star/small-star alternation"
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("label")).alias("is_canonical"),
    )
    singletons = (
        nodes.select("doc_id")
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.lit(True).alias("is_canonical"),
        )
    )
    return clustered.unionByName(singletons)


def dedup_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    quality_col: str = "n_chars",
) -> DataFrame:
    """Survivor selection — the step that turns a near-dup clustering into
    the actual dedup OUTPUT: per cluster keep exactly one document, chosen
    by quality (highest ``quality_col``, ties broken by lowest ``doc_id``
    so the choice is total and retry-reproducible), and emit the full
    keep/drop mapping so dropped documents remain attributable.

    ``clusters`` is :func:`dup_clusters` output (doc_id, cluster_id,
    cluster_size, ...).  Note the survivor is NOT ``is_canonical``: the
    cluster label is the structural minimum doc_id, while the survivor is
    a quality decision — conflating them silently keeps the oldest
    duplicate instead of the best one.

    Scale shape: one equi-join on doc_id to attach the quality signal,
    then ONE map-side-combinable ``max_by``-style aggregate per cluster
    (``max(struct(quality, -doc_id))`` — no window, no per-cluster sort),
    and an equi-join of the ≤|clusters|-row survivor table back on
    cluster_id.  Skew bound: a cluster's aggregate state is one struct
    regardless of cluster size.

    Output: (doc_id, cluster_id, cluster_size, keep_id, is_kept).
    """
    j = clusters.select("doc_id", "cluster_id", "cluster_size").join(
        docs.select("doc_id", F.col(quality_col).alias("_q")), "doc_id"
    )
    keep = j.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("_q"), (-F.col("doc_id")).alias("_nid"))).alias(
            "_best"
        )
    ).select("cluster_id", (-F.col("_best._nid")).cast("long").alias("keep_id"))
    return (
        j.join(keep, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "keep_id",
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
        )
    )


def simhash(df: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """SimHash signatures: per document, bit i of the signature is the
    majority vote of bit i across the md5-derived hashes of its (lowercased)
    tokens.

    Votes are ``bits`` parallel sum-aggregates over the token rows (one
    shuffle keyed on doc_id, map-side combined).  The obvious alternative —
    exploding a (token × bit) row per vote — multiplies the shuffle by
    ``bits`` (32×); measured 2.3× slower end-to-end on the sf0.1 pairs
    query."""
    toks = df.select(
        "doc_id", F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("tok")
    )
    hashed = toks.select("doc_id", _md5_int63(F.col("tok")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")).alias(f"_v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(
            F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    text_col: str = "text",
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: block on 8-bit bands (a pair within
    Hamming distance d < bands must share ≥ one band — pigeonhole), then
    filter on exact Hamming distance via ``bit_count(a XOR b)``.

    ``sig`` optionally supplies a precomputed :func:`simhash` signature
    table (doc_id, simhash) so suite passes that build pair sets at
    several thresholds share the one corpus-scan signature aggregate —
    the dominant cost of the pipeline (measured sf0.1: signature 1.84 s
    of the 2.09 s tight build).  The signature table is one row per
    document (linear), so sharing it is scale-safe; sharing the PAIR
    set across thresholds is not — deriving the tight set by filtering
    the loose (<=16) artifact holds the near-full quadratic candidate
    set in the distinct's hash-agg state (the hamming<=3 predicate can
    no longer be pushed below the distinct) and OOMs one node's heap at
    10x sf0.1, re-measured round 13 (the round-6 finding on the <=16
    graph, rediscovered the hard way).

    Caller contract for ``sig`` (r13 ADVICE): it MUST be ``simhash(df,
    bits, text_col)`` for the SAME df and the SAME bits as this call —
    a signature built at a different width would silently band and
    hamming-compare wrong (any width fits the one LONG column, so the
    schema cannot carry the check).  The schema half is guarded below;
    the bits/df half is the documented contract."""
    if sig is None:
        sig = simhash(df, bits, text_col)
    elif not {"doc_id", "simhash"}.issubset(sig.columns):
        raise ValueError(
            "simhash_pairs: sig must be a simhash() signature table with "
            f"columns (doc_id, simhash); got {sig.columns}"
        )
    n_bands = 4
    width = bits // n_bands
    # one pass: explode (band_id, band_val) structs instead of a bands-way
    # union (which recomputes the signature aggregation per branch per join
    # side); persist because both self-join sides read it
    bands = F.array(
        *[
            F.struct(
                F.lit(bnd).alias("band_id"),
                F.shiftright(F.col("simhash"), bnd * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_val"),
            )
            for bnd in range(n_bands)
        ]
    )
    band_rows = (
        sig.select("doc_id", "simhash", F.explode(bands).alias("bb"))
        .select(
            "doc_id",
            "simhash",
            F.col("bb.band_id").alias("band_id"),
            F.col("bb.band_val").alias("band_val"),
        )
    )
    if MATERIALIZE_PAIRS:
        band_rows = band_rows.persist()

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    out = (
        cand.select(
            "doc_id_a",
            "doc_id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        # small pair output materialized so the band-rows cache handle
        # doesn't leak into the caller's session (see jaccard_pairs)
    )
    return _finish_pairs(out, band_rows)


def fuzzy_pairs(
    df: DataFrame,
    max_distance: int = 5,
    prefix_tokens: int = 12,
    max_block_doc_freq: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Edit-distance near-duplicate pairs over a normalized token prefix,
    with first-token blocking: candidate pairs must share their first
    token (equi-join — never an all-pairs comparison), pass a cheap
    length-difference filter (|len(a)-len(b)| > d implies distance > d),
    and only then pay the O(len²) levenshtein residual.

    Catches the small-edit near-dups that set-based methods miss (MinHash
    sees heavily-shared shingles only; one typo in a short title is
    invisible to it but is distance 1 here).

    ``max_block_doc_freq`` is the stop-block guard, same contract as
    ``max_shingle_doc_freq`` in :func:`jaccard_pairs`: a first token
    shared by half the corpus ("the") makes the block join quadratic at
    scale — ALWAYS cap it at 100 TB; dropped blocks trade recall on the
    most boilerplate prefixes for a bounded join.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = (
        df.select(
            "doc_id",
            F.concat_ws(" ", F.slice(toks, 1, prefix_tokens)).alias("pfx"),
            F.element_at(toks, 1).alias("blk"),
        )
        .where(F.length(F.trim(F.col(text_col))) > 0)
    )
    if max_block_doc_freq is not None:
        keep = (
            base.groupBy("blk")
            .agg(F.count("*").alias("_bf"))
            .where(F.col("_bf") <= max_block_doc_freq)
            .select("blk")
        )
        base = base.join(F.broadcast(keep), "blk")
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.length(F.col("a.pfx")) - F.length(F.col("b.pfx")))
                <= max_distance
            ),
        )
        # compute the quadratic residual ONCE: filter and project on the
        # same column (separate Filter/Project operators do not share the
        # subexpression across codegen stages)
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).cast("long"),
        )
        .where(F.col("edit_distance") <= max_distance)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            "edit_distance",
        )
    )


def fuzzy_contamination(pairs: DataFrame, eval_ids: DataFrame) -> DataFrame:
    """Fuzzy eval-set contamination report: training documents with a
    VERIFIED near-duplicate in the eval set — the fuzzy complement of
    exact n-gram decontamination (``curation.decontaminate``), and the
    production pre-training step that keeps benchmark paraphrases out of
    the training mix (exact-match filters miss reworded eval items;
    near-dup pairs catch them).

    ``pairs`` is any verified pair table (doc_id_a < doc_id_b, ...,
    jaccard) — in production :func:`lsh_verified_pairs`, so recall comes
    from LSH banding and precision from exact Jaccard.  ``eval_ids`` is
    the single-column eval membership table.  A pair flags the TRAINING
    side only when exactly its other side is eval (eval–eval pairs are
    internal to the benchmark; train–train pairs are ordinary dedup).

    Scale shape: two broadcast membership joins on the (small, deduped
    here — duplicate membership rows would multiply the join fan-out)
    eval id table, then ONE conditional projection over the exactly-one-
    side-eval rows — a union of two filtered branches would execute the
    whole upstream pair pipeline once per branch (ReuseExchange dedupes
    exchanges, not post-shuffle work).  Pair-table-sized; nothing
    corpus-sized shuffles again.

    Output: (doc_id, eval_doc_id, jaccard) — one row per contaminated
    training doc × matching eval doc.
    """
    key = eval_ids.columns[0]
    ev = eval_ids.select(F.col(key).alias("_eid")).distinct()
    ea = ev.select(F.col("_eid").alias("doc_id_a")).withColumn(
        "_ae", F.lit(True)
    )
    eb = ev.select(F.col("_eid").alias("doc_id_b")).withColumn(
        "_be", F.lit(True)
    )
    j = (
        pairs.join(F.broadcast(ea), "doc_id_a", "left")
        .join(F.broadcast(eb), "doc_id_b", "left")
        .select(
            "doc_id_a",
            "doc_id_b",
            "jaccard",
            F.coalesce(F.col("_ae"), F.lit(False)).alias("_ae"),
            F.coalesce(F.col("_be"), F.lit(False)).alias("_be"),
        )
    )
    return j.where(F.col("_ae") != F.col("_be")).select(
        F.when(F.col("_be"), F.col("doc_id_a"))
        .otherwise(F.col("doc_id_b"))
        .alias("doc_id"),
        F.when(F.col("_be"), F.col("doc_id_b"))
        .otherwise(F.col("doc_id_a"))
        .alias("eval_doc_id"),
        "jaccard",
    )


def cluster_weighted_sample(
    clusters: DataFrame, rate_scale: int = 1000
) -> DataFrame:
    """Dedup-AWARE sampling ("soft dedup"): keep each document with
    probability 1/cluster_size via a deterministic integer hash gate —
    in expectation ONE representative per near-dup cluster survives,
    so heavily duplicated content stops being over-represented in the
    sample WITHOUT the hard drop of survivor selection (duplicates
    still appear, proportionally to their cluster count rather than
    their copy count — the soft-dedup weighting some data mixes prefer
    over hard dedup).  Singletons (cluster_size 1) always survive.

    The gate is ``md5_int63(doc_id) % (cluster_size * rate_scale) <
    rate_scale`` — retry-safe (pure function of the doc id), exactly
    mirrorable in SQL, and unbiased across clusters to ~1/rate_scale.

    Scale shape: one pure-map filter over the clustering table (itself
    the blocked connected-components output) — no new shuffle.

    Output: (doc_id, cluster_id, cluster_size) for kept documents.
    """
    gate = _md5_int63(F.col("doc_id").cast("string")) % (
        F.col("cluster_size") * F.lit(int(rate_scale))
    )
    return clusters.where(gate < F.lit(int(rate_scale))).select(
        "doc_id", "cluster_id", "cluster_size"
    )


def content_defined_chunks(
    df: DataFrame,
    window: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (the Rabin/Gear CDC discipline of
    storage dedup, at token granularity): cut AFTER token ``i`` whenever
    ``hash(token_i) % window == 0``, so chunk boundaries are decided by
    CONTENT, not position.  This is the property fixed-size chunking
    (:func:`~..curation.chunk_documents`) and fixed-length spans
    (:func:`duplicate_spans`) both lack: inserting one token near the
    top of a document shifts every downstream fixed window, but CDC
    boundaries re-synchronize at the next content cut, so shared
    passages keep producing identical chunks.  Expected chunk length is
    ``window`` tokens (geometric).

    The hash is md5-derived (first 8 hex digits as an integer) so the
    DuckDB oracle reproduces every boundary bit-exactly; a pure-Spark
    deployment would swap in ``xxhash64``.

    Scale shape: a PURE MAP — boundary positions, chunk bounds, and
    chunk slices are all higher-order array expressions on the token
    array (each token is hashed once and copied into exactly one chunk,
    so per-doc work is O(tokens)), followed by one ``posexplode``.  No
    shuffle at all: at 100 TB chunking runs at parquet-scan speed and
    the downstream consumer controls partitioning.

    Output: (doc_id, chunk_id, n_tokens, chunk) — ``chunk_id`` is the
    0-based position of the chunk in the document.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = df.select("doc_id", toks.alias("_toks")).where(F.size("_toks") > 0)
    cuts = F.expr(
        "filter(sequence(1, size(_toks)), i -> "
        " cast(conv(substring(md5(element_at(_toks, i)), 1, 8), 16, 10)"
        f"      as bigint) % {int(window)} = 0)"
    )
    # bounds k = (cuts[k-1], cuts[k]) with sentinels 0 and n; only the
    # LAST bound can be empty (when the final token is itself a cut), so
    # filtering before the posexplode cannot shift earlier chunk ids
    bounds = F.expr(
        "filter(zip_with(concat(array(0), _cuts),"
        "                concat(_cuts, array(size(_toks))),"
        "                (s, e) -> named_struct('s', s, 'e', e)),"
        "       x -> x.e > x.s)"
    )
    ex = base.select("doc_id", "_toks", cuts.alias("_cuts")).select(
        "doc_id", "_toks", F.posexplode(bounds).alias("chunk_id", "_b")
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("_b.e") - F.col("_b.s")).cast("long").alias("n_tokens"),
        F.concat_ws(
            " ", F.expr("slice(_toks, _b.s + 1, _b.e - _b.s)")
        ).alias("chunk"),
    )


def cdc_chunk_duplicates(
    df: DataFrame,
    window: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    key_on_digest: bool = False,
) -> DataFrame:
    """Cross-document duplicate CHUNKS under content-defined chunking —
    the storage-dedup view of corpus redundancy: which variable-length,
    boundary-stable passages appear in ≥ ``min_docs`` distinct
    documents?  Complements :func:`duplicate_spans` (every fixed
    8-token window) with insertion-robust chunks: an edited copy of a
    document still shares every chunk outside the edited one.

    Scale shape: the pure-map chunk explode of
    :func:`content_defined_chunks` plus ONE hash aggregate with
    map-side combine.  ``key_on_digest=True`` is the 100 TB mode
    (mirrors :func:`duplicate_spans`): group on ``md5(chunk)`` and
    carry ``min(chunk)`` alongside — fixed 32-byte shuffle keys instead
    of whole chunk strings, identical rows either way (collisions
    aside).

    Output: (chunk, n_tokens, n_docs, n_occurrences), duplicated chunks
    only."""
    chunks = content_defined_chunks(df, window, text_col)
    if key_on_digest:
        agg = (
            chunks.select(
                "doc_id", "n_tokens", "chunk", F.md5("chunk").alias("_h")
            )
            .groupBy("_h")
            .agg(
                F.min("chunk").alias("chunk"),
                F.min("n_tokens").alias("n_tokens"),
                F.countDistinct("doc_id").alias("n_docs"),
                F.count("*").alias("n_occurrences"),
            )
        )
    else:
        agg = chunks.groupBy("chunk").agg(
            F.min("n_tokens").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
    return agg.where(F.col("n_docs") >= min_docs).select(
        "chunk", "n_tokens", "n_docs", "n_occurrences"
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    w: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    key_len: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Sorted-Neighborhood Method (SNM) near-duplicate detection — the
    classic record-linkage blocking discipline (Hernández & Stolfo
    1995) as the third candidate generator beside MinHash-LSH banding
    and SimHash Hamming blocks: sort the corpus on a normalized sort
    key (first ``key_len`` characters of the lowercased, whitespace-
    collapsed text), slide a window of ``w`` neighbors, and emit every
    in-window pair as a candidate.  Candidates are verified on exact
    n-gram Jaccard before anything is called a duplicate (the
    :func:`lsh_verified_pairs` precision discipline).

    Near-identical documents sort adjacently on their shared prefix, so
    SNM finds prefix-stable near-dups in O(n·w) candidates with ZERO
    tuning of hash families — the trade-off is blindness to documents
    whose difference is in the first ``key_len`` characters (LSH's
    complementary strength; production pipelines run both and union).

    Scale shape: the global sort is the TWO-PHASE
    :func:`~.curation.distributed_row_number` (range-partitioned local
    ranks + broadcast offsets — never a single-task window).  In-window
    pairing is an equi-join on ``floor(rank/w)`` buckets with each row
    probing its own and its predecessor bucket (every pair at rank
    distance ≤ ``w`` shares one of the two keys exactly once), so the
    candidate join is bounded by w·n rows, never n².  Verification is
    the candidate-keyed shingle intersection of
    :func:`lsh_verified_pairs` — work is Σ|shingles| over candidate
    members only.

    Output: (doc_id_a < doc_id_b, rank_distance, jaccard ≥ threshold).
    """
    from .curation import distributed_row_number

    key = F.substring(
        F.concat_ws(" ", F.transform(tokens(F.col(text_col)), F.lower)),
        1,
        int(key_len),
    )
    keyed = df.select("doc_id", key.alias("_key")).where(F.col("_key") != "")
    ranked = distributed_row_number(
        keyed, [F.col("_key"), F.col("doc_id")], out_col="rn"
    ).select("doc_id", "rn")
    # each row carries its own bucket; the probe side ALSO probes the
    # previous bucket, so a pair at rank distance <= w (which must lie in
    # the same or adjacent buckets of width w) is generated exactly once
    lhs = ranked.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("rn").alias("rn_a"),
        F.floor((F.col("rn") - 1) / w).alias("_bkt"),
    )
    rhs = ranked.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("rn").alias("rn_b"),
        F.explode(
            F.array(
                F.floor((F.col("rn") - 1) / w),
                F.floor((F.col("rn") - 1) / w) - 1,
            )
        ).alias("_bkt"),
    )
    cand = (
        lhs.join(rhs, "_bkt")
        .where(
            (F.col("rn_b") > F.col("rn_a"))
            & (F.col("rn_b") - F.col("rn_a") <= w)
        )
        .select(
            F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
            F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
            (F.col("rn_b") - F.col("rn_a")).alias("rank_distance"),
        )
    )
    members = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .union(cand.select(F.col("doc_id_b")))
        .distinct()
    )
    sh = (
        shingles(df, n, text_col)
        .join(members, "doc_id", "left_semi")
        .select("doc_id", _md5_int63(F.col("shingle")).alias("shingle_h"))
    )
    if MATERIALIZE_PAIRS:
        sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingle_h").alias("_h")),
            "doc_id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingle_h").alias("_h")),
            ["doc_id_b", "_h"],
        )
        .groupBy("doc_id_a", "doc_id_b", "rank_distance")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "rank_distance",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return _finish_pairs(out, sh)


def lsh_blocking_audit(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    verified: DataFrame | None = None,
) -> DataFrame:
    """Blocking-quality audit of the MinHash-LSH banding scheme — the
    record-linkage metrics (reduction ratio, candidate precision,
    bucket-size profile) a dedup pipeline checks before trusting a
    band/row configuration at corpus scale: too few bands and recall
    dies quietly; too many and a hot bucket quietly turns the candidate
    join quadratic.  One row:

    - ``n_docs`` — documents with at least one shingle (the blocked
      population);
    - ``n_buckets`` / ``n_colliding_buckets`` / ``max_bucket`` — the
      (band, band_hash) bucket profile; ``max_bucket`` is THE skew
      number: candidate work is Σ|bucket|², so one hot bucket dominates;
    - ``candidates_raw`` — Σ c·(c−1)/2 over buckets (pair slots
      including cross-band repeats: the join's true row count);
    - ``candidates_distinct`` — distinct candidate pairs (stage-2
      verification input);
    - ``n_verified`` — pairs passing exact Jaccard ≥ ``threshold``;
    - ``reduction6`` — 1e6 · (1 − candidates_distinct / all-pairs),
      the fraction of the n² work the blocking avoided;
    - ``precision6`` — 1e6 · verified/candidates (NULL with no
      candidates).

    All counts aggregate to 1-row frames joined by broadcast — the
    report never shuffles corpus-sized data past the bucket histogram.
    Pass ``candidates``/``verified`` to reuse suite- or store-cached
    stages (the two-stage pipeline's own outputs); each defaults to
    recomputing via :func:`minhash_lsh_pairs` /
    :func:`lsh_verified_pairs`."""
    banded = band_rows(df, k=k, bands=bands, n=n, text_col=text_col)
    if candidates is None:
        candidates = minhash_lsh_pairs(
            df, k=k, bands=bands, n=n, text_col=text_col
        )
    if verified is None:
        verified = lsh_verified_pairs(
            df, k=k, bands=bands, n=n, threshold=threshold,
            text_col=text_col, candidates=candidates,
        )
    buckets = banded.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("c")
    )
    bucket_stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias(
            "n_colliding_buckets"
        ),
        F.max("c").alias("max_bucket"),
        F.sum(F.expr("c * (c - 1) div 2")).alias("candidates_raw"),
    )
    n_docs = banded.select("doc_id").distinct().agg(
        F.count("*").alias("n_docs")
    )
    cand_n = candidates.agg(F.count("*").alias("candidates_distinct"))
    ver_n = verified.agg(F.count("*").alias("n_verified"))
    return (
        bucket_stats.crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(cand_n))
        .crossJoin(F.broadcast(ver_n))
        .select(
            "n_docs",
            "n_buckets",
            "n_colliding_buckets",
            "max_bucket",
            "candidates_raw",
            "candidates_distinct",
            "n_verified",
            F.expr(
                "1000000 - candidates_distinct * 1000000"
                " div (n_docs * (n_docs - 1) div 2)"
            ).alias("reduction6"),
            F.when(
                F.col("candidates_distinct") > 0,
                F.expr("n_verified * 1000000 div candidates_distinct"),
            ).alias("precision6"),
        )
    )

