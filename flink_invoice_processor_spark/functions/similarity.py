"""Embedding similarity search over an ``array<float>`` column.

Two paths, same contract:

- ``cosine_topk`` — brute-force exact top-k.  The query side is small by
  definition, so it broadcast-joins against the corpus: no shuffle of the
  big side, embarrassingly parallel over corpus partitions, O(|Q|·|C|·d)
  flops inside whole-stage codegen (``aggregate``/``zip_with`` — no Python).
  This is the *correctness baseline* and perfectly serviceable up to ~10⁶
  corpus rows per query batch.
- ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH.  Each vector
  gets a ``n_planes``-bit signature (sign of the dot product with
  deterministic md5-seeded pseudo-random hyperplanes); candidates share the
  whole signature bucket; exact cosine re-ranks within the bucket.  Recall
  is tunable with ``n_planes``/``n_tables``; the bucket join replaces the
  all-pairs product — at 100 TB this is the difference between a job and a
  no-op.

Scores are computed in double precision and rounded to 4 decimals, and
ranking uses (rounded score DESC, vec_id ASC), so results are deterministic
and reproducible by the DuckDB oracle (``list_dot_product`` arithmetic over
the same cast-to-double vectors).

Kernel choice: the pair-scoring hot path is an Arrow-vectorized pandas_udf
(``pair_cosine``) — one numpy ``einsum`` per batch.  The pure-Catalyst
alternatives were measured on the sf0.1 LSH pair set (128k pairs × 64 dims,
local[32]): higher-order ``aggregate``/``zip_with`` lambdas are interpreted
per element (5.6 s), a 64-term unrolled ``element_at`` sum still ~6 s, the
numpy batch kernel 0.8 s with bit-identical rounded scores.  Vector math is
the one place where "stay JVM-side" loses to Arrow batching.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from . import suite_cache


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, in double.

    Pure-Catalyst (interpreted HOF) form — fine for a handful of rows or
    inside other column expressions; use :func:`pair_cosine` on pair-heavy
    paths."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


_PAIR_COSINE = None


def pair_cosine(va: Column, vb: Column) -> Column:
    """4-decimal-rounded cosine of two fixed-dim vector columns, one numpy
    einsum per Arrow batch.  Same formula shape as :func:`cosine` /
    the oracles' ``list_dot_product`` expression (dot / (‖a‖·‖b‖) in
    float64) — verified score-identical to the HOF path on the full sf0.1
    pair set.  The udf object is built lazily: ``pandas_udf`` needs an
    active SparkSession, which must not be required at import time."""
    global _PAIR_COSINE
    if _PAIR_COSINE is None:

        @pandas_udf("double")
        def _pc(a: pd.Series, b: pd.Series) -> pd.Series:
            import numpy as np

            A = np.stack(a.values).astype(np.float64)
            B = np.stack(b.values).astype(np.float64)
            dots = np.einsum("ij,ij->i", A, B)
            na = np.sqrt(np.einsum("ij,ij->i", A, A))
            nb = np.sqrt(np.einsum("ij,ij->i", B, B))
            return pd.Series(np.round(dots / (na * nb), 4))

        _PAIR_COSINE = _pc
    return _PAIR_COSINE(va, vb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, score, rank), rank 1..k by
    (score DESC, neighbor_id ASC) on the 4-decimal-rounded score.
    """
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        pair_cosine(F.col("_qv"), F.col("_cv")).alias("score"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def plane_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived so signatures are stable across runs and engines.  Computed
    driver-side with hashlib (bit-identical to the SQL ``md5``) and inlined
    as a literal — an in-plan ``md5``/``conv`` per component built a
    256+-node expression tree whose optimization/codegen dominated runtime
    (6.8 s for 2,000 rows; literals + ``zip_with`` take ~0.3 s)."""
    import hashlib

    h = int(hashlib.md5(f"plane{plane}_dim{dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def lsh_signature(vec: Column, dims: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p).

    The dot product folds left-to-right from 0.0 — the same IEEE addition
    order as the explicit-sum SQL oracle, so near-zero dots can't diverge
    the sign between engines."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(plane_value(p, d)) for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(vd, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0)
        )
    return sig


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus to the nearest
    of ``n_cells`` centroids, probe only the query's ``nprobe`` closest
    cells, exact-rank inside them.

    Centroids are the ``n_cells`` lowest-id corpus vectors (train-free,
    deterministic — the integration point for real k-means centroids is the
    ``cent`` DataFrame).  Assignment is a broadcast cross-join against the
    tiny centroid set (no shuffle of the corpus); the probe→cell join is the
    only shuffle, keyed on cell id.  At 100 TB this is the classic ANN
    layout: ~n/n_cells of the corpus scanned per query instead of all of it.
    All ranking uses (4-decimal-rounded score DESC, id ASC), so the result
    is exactly reproducible by the SQL oracle.
    """
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    cent = (
        corpus.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("_cent"))
    )

    def assign(df: DataFrame, out_id: str, keep_vec: str, rank_cap: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias(keep_vec)
        ).crossJoin(F.broadcast(cent)).select(
            out_id,
            keep_vec,
            "cent_id",
            pair_cosine(F.col(keep_vec), F.col("_cent")).alias("_cscore"),
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("_cscore").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= rank_cap)
            .select(out_id, keep_vec, "cent_id")
        )

    cells = assign(corpus, "neighbor_id", "_cv", 1)
    probes = assign(queries, "query_id", "_qv", nprobe)
    cand = (
        probes.join(cells, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("_qv"), F.col("_cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def neardup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact all-pairs baseline.

    Output: (vec_id_a, vec_id_b, score) with a < b and 4-decimal-rounded
    cosine ≥ threshold.  O(n²·d) — the correctness oracle for
    :func:`neardup_pairs_lsh`; at 100 TB use the LSH-blocked variant (the
    all-pairs product on 10⁹ vectors is not a job anyone runs).
    """
    nn = emb.where(F.col(vec_col).isNotNull())
    a = nn.select(F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("_va"))
    b = nn.select(F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            pair_cosine(F.col("_va"), F.col("_vb")).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def neardup_pairs_lsh(
    emb: DataFrame,
    dims: int,
    threshold: float = 0.4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked scale path.

    Candidate pairs must share the full ``n_planes``-bit random-hyperplane
    signature; exact cosine then filters on the threshold, so every returned
    pair is a true ≥-threshold pair (precision 1, recall < 1 — the standard
    ANN trade).  The self-join keys on the signature: a shuffle-hash join on
    ~2^n_planes buckets instead of an all-pairs product.  Signatures are
    md5-derived and deterministic, so the result is exactly reproducible by
    a SQL oracle with the same literal hyperplanes.
    """
    sig = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col), dims, n_planes).alias("_sig"),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            pair_cosine(F.col("a._v"), F.col("b._v")).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


#: key-space offset between blocking levels — level i's keys live in
#: [i * _LEVEL_OFFSET, i * _LEVEL_OFFSET + 2^planes_i), so ladders up to
#: 48 planes can never collide across levels.
_LEVEL_OFFSET = 1 << 48


def density_ladder(n: int, max_bucket: int, n_planes: int = 4,
                   step: int = 6, cap: int = 46) -> tuple[int, ...]:
    """Derive a blocking-level ladder from the corpus size: starting at
    ``n_planes``, add ``step`` planes per level until the top level has at
    least ``n / max_bucket`` buckets (expected bucket size <= max_bucket),
    with at least two levels so oversized coarse buckets always have an
    escape.  Pure integer rule — deterministic across engines and
    mirrorable in SQL (no IEEE log2)."""
    if n_planes >= cap:
        raise ValueError(
            f"density_ladder: n_planes={n_planes} leaves no room for a"
            f" second level under cap={cap} — a cascade needs >= 2 levels"
        )
    levels = [n_planes]
    while (
        len(levels) < 2 or (1 << levels[-1]) * max_bucket < n
    ) and levels[-1] < cap:
        levels.append(min(levels[-1] + step, cap))
    return tuple(levels)


def density_outliers(
    emb: DataFrame,
    dims: int,
    threshold: float = 0.3,
    n_planes: int = 4,
    min_neighbors: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    fine_planes: int = 10,
    levels: tuple[int, ...] | str | None = None,
) -> DataFrame:
    """Embedding-density outliers: vectors with fewer than ``min_neighbors``
    cosine-≥-threshold neighbors inside their LSH signature bucket — the
    low-density points a curation pipeline drops (or audits) before
    training, and the inverse of near-dup detection: instead of flagging
    what has TOO MANY close neighbors, flag what has none.

    Neighbor counting runs both directions of the same signature-blocked
    join :func:`neardup_pairs_lsh` uses (``!=`` instead of ``<``), so each
    vector counts all of its in-bucket neighbors; vectors whose bucket
    yields no qualifying neighbor at all re-enter via a left join with a
    coalesced zero — those zero-neighbor rows are the strongest outliers
    and a join that dropped them would silently miss the whole point.

    Scale — CASCADING adaptive blocking (``max_bucket`` + ``levels``):
    with a fixed plane count the bucket count is fixed, so bucket
    population grows linearly with the corpus and the in-bucket product
    grows QUADRATICALLY (measured: 4-plane steady ratio 6.8× at 4×
    vectors, then a 5.77× decade BUILD ratio for the two-level variant,
    SCALING_r07).  With ``max_bucket`` set, any bucket larger than it
    re-blocks on the next level's signature, recursively down the
    ``levels`` ladder — all levels share ONE md5 plane family, so a
    level-``L`` signature is just the low ``L`` bits of the top-level
    signature (one signature computed per row, levels derived by modulo)
    and each level's buckets subdivide the previous level's.  Every
    non-final bucket used for neighbor counting is therefore <=
    ``max_bucket`` BY CONSTRUCTION — the in-bucket pair product is
    linear in the corpus, not quadratic, however skewed the data —
    and only the final level can exceed the cap (exact-duplicate
    clusters, which no hyperplane family can split).  The level decision
    is a deterministic CASE over per-level bucket censuses (tiny
    broadcast aggregates), mirrored exactly by the SQL oracle.

    ``levels``: explicit plane-count ladder (strictly increasing, first
    entry = ``n_planes``); ``"auto"`` derives it from ``nn.count()`` via
    :func:`density_ladder` — no human knob at any corpus size (one extra
    count action at build).  ``None`` keeps the legacy two-level
    ``(n_planes, fine_planes)`` ladder.  ``max_bucket=None`` keeps the
    single-level legacy behavior.
    Output: (vec_id, n_neighbors < min_neighbors).
    """
    nn = emb.where(F.col(vec_col).isNotNull())
    if levels is not None and max_bucket is None:
        raise ValueError(
            "density_outliers: levels without max_bucket would silently"
            " degrade to single-level blocking (the quadratic hazard the"
            " cascade exists to prevent) — pass max_bucket, or drop levels"
        )
    if max_bucket is not None and levels is None and fine_planes <= n_planes:
        # fine == n would map to levels=(n, n) below and fail the
        # strictly-increasing ladder check with a 'levels'-worded error
        # about a parameter the caller never passed — reject the
        # degenerate legacy config in its own vocabulary instead (at
        # equal widths the re-block is a no-op: oversized buckets stay
        # oversized, which is the quadratic hazard the cascade prevents)
        raise ValueError(
            "density_outliers: fine_planes must be > n_planes (fine"
            " buckets must strictly subdivide coarse buckets — at equal"
            " widths the re-block cannot shrink an oversized bucket);"
            f" got n_planes={n_planes}, fine_planes={fine_planes}"
        )
    if max_bucket is None:
        sig = nn.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_v"),
            lsh_signature(F.col(vec_col), dims, n_planes).alias("_sig"),
        )
    else:
        if levels == "auto":
            levels = density_ladder(nn.count(), max_bucket, n_planes)
        elif levels is None:
            levels = (n_planes, fine_planes)
        levels = tuple(levels)
        if len(levels) < 2:
            raise ValueError(
                "density_outliers: a cascade needs at least 2 levels"
                f" (oversized buckets must have an escape); got {levels}"
            )
        if levels[0] != n_planes or any(
            b <= a for a, b in zip(levels, levels[1:])
        ):
            raise ValueError(
                "density_outliers: levels must be strictly increasing and"
                f" start at n_planes={n_planes}; got {levels}"
            )
        if levels[-1] >= 48:
            raise ValueError(
                f"density_outliers: top level {levels[-1]} >= 48 planes"
                " collides with the level-key offset"
            )
        # ONE top-level signature per row; level-L signature = low L bits
        df = nn.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_v"),
            lsh_signature(F.col(vec_col), dims, levels[-1]).alias("_st"),
        )
        for i, pl in enumerate(levels):
            df = df.withColumn(
                f"_s{i}",
                F.col("_st") % F.lit(1 << pl) if pl < levels[-1]
                else F.col("_st"),
            )
        # ONE corpus aggregate over the second-to-last level's signature
        # (<= 2^levels[-2] rows); every non-final level's census derives
        # from it by modulo re-grouping (lower levels ARE its low bits),
        # and the escalated-bucket filters run inside the model-sized
        # table — naive per-level censuses re-scan the corpus L-1 times
        second = len(levels) - 2
        # model-sized, materialized ONCE when several censuses derive
        # from it: each census below feeds its own broadcast exchange,
        # and without the checkpoint every one of those broadcasts would
        # re-run the corpus scan this aggregate reads (measured 3
        # redundant corpus scans at 3 levels); a 2-level ladder has a
        # single census, so the scan happens once either way and the
        # checkpoint job would be pure overhead
        base_cnt = df.groupBy(F.col(f"_s{second}").alias("_sb")).agg(
            F.count("*").alias("_cb")
        )
        if len(levels) > 2:
            base_cnt = base_cnt.localCheckpoint()
        esc = base_cnt  # buckets escalated into level i
        for i in range(len(levels) - 1):
            ci = esc.groupBy(
                (F.col("_sb") % F.lit(1 << levels[i])).alias(f"_s{i}")
            ).agg(F.sum("_cb").alias(f"_cn{i}"))
            df = df.join(F.broadcast(ci), f"_s{i}", "left")
            if i < second:
                # a bucket escalates past level i iff its level-i census
                # exceeds the cap (whole buckets escalate together)
                esc = (
                    esc.withColumn(
                        f"_s{i}", F.col("_sb") % F.lit(1 << levels[i])
                    )
                    .join(
                        ci.where(F.col(f"_cn{i}") > max_bucket).select(
                            f"_s{i}"
                        ),
                        f"_s{i}",
                        "left_semi",
                    )
                    .drop(f"_s{i}")
                )
        # first level whose bucket fits the cap wins; the final level is
        # the unconditional fallback
        key = None
        for i in range(len(levels) - 1):
            arm = F.lit(i * _LEVEL_OFFSET) + F.col(f"_s{i}")
            cond = F.col(f"_cn{i}") <= max_bucket
            key = F.when(cond, arm) if key is None else key.when(cond, arm)
        last = len(levels) - 1
        fallback = F.lit(last * _LEVEL_OFFSET) + F.col(f"_s{last}")
        key = fallback if key is None else key.otherwise(fallback)
        sig = df.select("vec_id", "_v", key.alias("_sig"))
    a = sig.alias("a")
    b = sig.alias("b")
    neigh = (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .where(pair_cosine(F.col("a._v"), F.col("b._v")) >= threshold)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.count("*").alias("n_neighbors"))
    )
    return (
        nn.select(F.col(id_col).alias("vec_id"))
        .join(neigh, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
        )
        .where(F.col("n_neighbors") < min_neighbors)
    )


def dim_stats(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION statistics of an embedding column — the QA report run
    before trusting a vector table at scale: a dimension whose variance is
    ~0 is dead weight in every distance computation (and a symptom of a
    truncated or mis-exported model head), and per-dimension mean offsets
    reveal an un-centered export.  Everything is computed in 1e-6
    fixed-point integers so both engines agree bit-for-bit: values are
    rounded per row to micro-units, summed in DECIMAL(38,0), and the
    mean/variance divisions are truncating integer DIV (the chi2/PMI wide
    idiom — no IEEE accumulation-order dependence, which a float SUM over
    a shuffled dataset cannot promise).

    Scale shape: one posexplode (rows × dims) into ONE map-side-combinable
    aggregate keyed by dimension — dims keys, no skew (every key has
    exactly n rows); output is dims rows.  BOTH bounds fail LOUDLY: the
    1e12-vector count bound via a division-only assert on the dims-row
    aggregate, and the value-magnitude bound via the same per-element
    |q| <= 3e9 assert :func:`vector_stat_partials` uses — the two paths
    are pytest-pinned identical and must FAIL identically too (the
    micro-quantization cast saturates and the DECIMAL square would
    otherwise silently diverge from the oracle's HUGEINT for
    |value| > ~3000).

    Output: (dim, n_vals, mean_micro, var_e12, min_micro, max_micro,
    is_dead) — ``var_e12`` is the population variance in 1e-12 units;
    ``is_dead`` marks min == max.
    """
    ex = (
        emb.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(vec_col).alias("dim", "_v"))
        .select(
            "dim",
            F.expr(
                "CAST(round(CAST(_v AS DOUBLE) * 1000000, 0) AS BIGINT)"
            ).alias("_vi"),
        )
        .where(
            F.assert_true(
                # range check, NOT abs(): the non-ANSI double->long cast
                # saturates extreme values to Long.MIN_VALUE, whose abs()
                # overflows back to itself (negative) and would slip an
                # abs()-based bound
                (F.col("_vi") >= F.lit(-3_000_000_000))
                & (F.col("_vi") <= F.lit(3_000_000_000)),
                F.lit(
                    "dim_stats: quantized magnitude exceeds the int64"
                    " pair-product range (|value| > 3000) or an array"
                    " element is NULL (both trip this guard: a NULL"
                    " range predicate is not-true to assert_true) —"
                    " normalize the vectors first (standardize) and"
                    " repair null elements; bound shared with"
                    " vector_stat_partials so the batch and maintained"
                    " paths fail identically"
                ),
            ).isNull()
        )
    )
    agg = ex.groupBy("dim").agg(
        F.count("*").alias("n_vals"),
        F.sum(F.expr("CAST(_vi AS DECIMAL(38,0))")).alias("_s"),
        F.sum(F.expr("CAST(_vi AS DECIMAL(19,0)) * _vi")).alias("_ss"),
        F.min("_vi").alias("min_micro"),
        F.max("_vi").alias("max_micro"),
    )
    guarded = agg.where(
        F.assert_true(
            F.col("n_vals") <= F.lit(1_000_000_000_000),
            F.lit(
                "dim_stats: DECIMAL(38,0) variance arithmetic is only proven"
                " to 1e12 vectors per job — shard the table and merge the"
                " (n, sum, sumsq) partials, which are exactly mergeable"
            ),
        ).isNull()
    )
    return guarded.select(
        "dim",
        "n_vals",
        F.expr("CAST(_s DIV n_vals AS BIGINT)").alias("mean_micro"),
        F.expr(
            "CAST((CAST(n_vals AS DECIMAL(38,0)) * _ss - _s * _s)"
            " DIV (CAST(n_vals AS DECIMAL(38,0)) * n_vals) AS BIGINT)"
        ).alias("var_e12"),
        "min_micro",
        "max_micro",
        (F.col("min_micro") == F.col("max_micro")).alias("is_dead"),
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates must share the LSH signature bucket,
    exact cosine re-ranks inside the bucket.  Vectors in sparse buckets may
    return fewer than k neighbors — the standard ANN recall trade."""
    c = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col), dims, n_planes).alias("_sig"),
    )
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_signature(F.col(vec_col), dims, n_planes).alias("_sig"),
    )
    scored = (
        c.join(F.broadcast(q), "_sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("_qv"), F.col("_cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _int_points(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(vec_id, v6): the embedding in floor-1e6 integer units."""
    v6 = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1000000).cast("long"),
    )
    return emb.select(F.col(id_col).alias("vec_id"), v6.alias("v6"))


def _int_dist() -> Column:
    """Exact integer squared L2 between columns ``v6`` and ``c6``."""
    return F.aggregate(
        F.zip_with("v6", "c6", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _train_centroids(pts: DataFrame, k: int, iters: int) -> DataFrame:
    """Lloyd iterations over integer points (see :func:`kmeans_integer` for
    the full layout discussion).  Returns (cid, c6), localCheckpointed."""
    cents = pts.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v6").alias("c6")
    )
    for _ in range(iters):
        scored = pts.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cid", _int_dist().alias("d")
        )
        assign = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d").alias("d"))
        )
        cells = (
            assign.join(pts, "vec_id")
            .select("cid", F.posexplode("v6").alias("pos", "x6"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(x6) div count(*)").alias("m6"))
        )
        new_cents = cells.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m6"))),
                lambda s: s["m6"],
            ).alias("c6")
        )
        # empty clusters keep their previous centroid
        cents = (
            cents.alias("o")
            .join(new_cents.alias("n"), "cid", "left")
            .select("cid", F.coalesce(F.col("n.c6"), F.col("o.c6")).alias("c6"))
            .localCheckpoint()
        )
    return cents


def kmeans_integer(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize: bool = True,
) -> DataFrame:
    """Distributed Lloyd's k-means with fully integer arithmetic — every
    distance, assignment, and centroid update is exact in floor-1e6 units,
    so the result is bit-identical at any parallelism AND reproducible by
    a single-node SQL engine (the DuckDB oracle unrolls the same
    iterations).  Floating-point k-means can't be oracle-checked: partial
    sums reorder under parallelism and ties flip.

    Layout per iteration (the standard distributed k-means shape):

    - centroids are k arrays — always BROADCAST; the points side never
      shuffles for assignment (a map-side zip_with + fold per candidate
      centroid, n x k rows of O(dim) work);
    - assignment = min over (distance, cid) structs — deterministic
      tie-break on the lower centroid id;
    - update = explode assigned points to (cid, pos) cells and hash-
      aggregate integer means: k x dim cells regardless of corpus size.
      Empty clusters keep their previous centroid (guarded re-join).

    Init: the k lowest ``id_col`` vectors (deterministic, matching the
    oracle).  Returns (vec_id, cid, dist) final assignments.
    """
    pts = _int_points(emb, vec_col, id_col).persist()
    cents = _train_centroids(pts, k, iters)
    # final assignment against the last centroids
    final = (
        pts.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", _int_dist().alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d").alias("dist"))
    )
    if materialize:
        # materialize (eager localCheckpoint) BEFORE releasing the points
        # cache; unpersisting under a still-lazy result would silently
        # recompute the whole points projection on the caller's first action
        final = final.localCheckpoint()
        pts.unpersist()
    # materialize=False keeps `final` lazy for plan inspection/composition;
    # the points cache stays alive and is released with the session
    return final


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN with LEARNED centroids: train integer-exact k-means
    (:func:`_train_centroids`) on the corpus, coarse-quantize corpus and
    queries to the trained cells by exact integer L2, probe ``nprobe``
    cells per query, exact-cosine-rank within them — "train the index,
    then search it", end to end deterministic (integer training + integer
    assignment + rounded-cosine re-rank), so the whole composition is
    reproducible by a single SQL oracle.

    Same scale layout as :func:`ivf_cosine_topk` (broadcast centroids for
    assignment, the probe→cell equi-join is the only data shuffle) with
    k-means cells instead of arbitrary seed vectors — learned cells track
    the data distribution, so cell populations are balanced and recall
    per probe is higher."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    pts = _int_points(corpus, vec_col, id_col).persist()
    cents = _train_centroids(pts, n_cells, iters)

    def assign(df: DataFrame, out_id: str, rank_cap: int) -> DataFrame:
        scored = (
            _int_points(df, vec_col, id_col)
            .withColumnRenamed("vec_id", out_id)
            .crossJoin(F.broadcast(cents))
            .select(out_id, "cid", _int_dist().alias("d"))
        )
        w = Window.partitionBy(out_id).orderBy(F.col("d").asc(), F.col("cid").asc())
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= rank_cap)
            .select(out_id, "cid")
        )

    cells = assign(corpus, "neighbor_id", 1)
    probes = assign(queries, "query_id", nprobe)
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cand = (
        probes.join(cells, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(qvec, "query_id")
        .join(cvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("_qv"), F.col("_cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .localCheckpoint()
    )
    pts.unpersist()
    return out


def _sub_points(pts: DataFrame, m: int, d: int) -> DataFrame:
    """(vec_id, s, w6): each integer vector split into its ``m`` subspace
    slices — one explode, slicing happens once per (vector, subspace), not
    once per (vector, subspace, centroid)."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(F.col("v6"), s * d + 1, d).alias("w6"),
            )
            for s in range(m)
        ]
    )
    return pts.select("vec_id", F.explode(slices).alias("_sw")).select(
        "vec_id", F.col("_sw.s").alias("s"), F.col("_sw.w6").alias("w6")
    )


def _sub_l2() -> Column:
    """Exact integer squared L2 between subspace columns ``w6`` and ``c6``
    (a function, not a module constant: Column exprs need a live session)."""
    return F.aggregate(
        F.zip_with("w6", "c6", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _train_subspace_centroids(
    sub_pts: DataFrame, ksub: int, iters: int, init_stride: int = 1
) -> DataFrame:
    """Per-subspace Lloyd's k-means, all ``m`` subspaces trained
    SIMULTANEOUSLY: the cluster key is (s, cid), so one assignment join +
    one update aggregate per iteration trains every sub-codebook — m× fewer
    passes than looping :func:`_train_centroids` per subspace.  Same
    integer-exact arithmetic (floor-1e6 units, ``sum div count`` means,
    (distance, cid) struct-min tie-breaks, empty-cluster guard), so the
    DuckDB oracle unrolls identical iterations.  Init: subspace slices of
    the ``ksub`` lowest-id vectors.  Returns (s, cid, c6), materialized via
    the iteration ``localCheckpoint``.  At 100 TB you train on a sample
    (codebooks need ~1e5 points, not the corpus) and keep the full-corpus
    scan only for the final encode — pass the sampled slice table plus its
    stride as ``init_stride`` so the init picks the ``ksub`` lowest SAMPLED
    ids (contiguous-id contract: ids 0, stride, 2*stride, ...), normalized
    to cluster ids 0..ksub-1 (``vec_id div stride``) so the PQ digit radix
    is unchanged."""
    cents = sub_pts.where(F.col("vec_id") < ksub * init_stride).select(
        "s",
        F.expr(f"vec_id div {int(init_stride)}").alias("cid"),
        F.col("w6").alias("c6"),
    )
    for _ in range(iters):
        scored = sub_pts.join(F.broadcast(cents), "s").select(
            "vec_id", "s", "cid", _sub_l2().alias("dd")
        )
        assign = (
            scored.groupBy("vec_id", "s")
            .agg(F.min(F.struct("dd", "cid")).alias("m"))
            .select("vec_id", "s", F.col("m.cid").alias("cid"))
        )
        cells = (
            assign.join(sub_pts, ["vec_id", "s"])
            .select("s", "cid", F.posexplode("w6").alias("pos", "x6"))
            .groupBy("s", "cid", "pos")
            .agg(F.expr("sum(x6) div count(*)").alias("m6"))
        )
        new_cents = cells.groupBy("s", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m6"))),
                lambda st: st["m6"],
            ).alias("c6")
        )
        cents = (
            cents.alias("o")
            .join(new_cents.alias("n"), ["s", "cid"], "left")
            .select("s", "cid", F.coalesce(F.col("n.c6"), F.col("o.c6")).alias("c6"))
            .localCheckpoint()
        )
    return cents


def _pq_codebook(
    corpus: DataFrame,
    m: int,
    ksub: int,
    id_col: str,
    vec_col: str,
    iters: int = 2,
    train_sample_mod: int | None = None,
    cache_token: tuple | None = None,
):
    """Shared PQ codebook derivation — the ONE place the sub-centroid
    recipe lives, so codes and ADQ lookup tables can never desynchronize.
    Codebooks are LEARNED: per-subspace integer k-means
    (:func:`_train_subspace_centroids`, ``iters`` Lloyd iterations from the
    deterministic lowest-id-slice init).  Returns (pts, d, cents) where
    ``cents`` is the trained (s, cid, c6) sub-codebook, materialized (tiny:
    m·ksub rows) so downstream code/LUT builds never re-run training.

    ``train_sample_mod``: the 100 TB path — train the codebooks on the
    deterministic ``vec_id % mod == 0`` sample (codebooks need ~1e5
    points; only the final encode needs the full corpus scan).  The sample
    is id-derived, not random(), so training is re-runnable/resumable and
    the whole pipeline stays SQL-reproducible.

    ``cache_token``: suite-cache dataset token (see
    :mod:`.suite_cache`) — lets a suite runner share the trained
    (d, cents) across the PQ-family queries of one pass; no effect unless
    the runner enabled the cache."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    pts = _int_points(corpus, vec_col, id_col)

    def _train():
        first = pts.select(F.size("v6").alias("d")).limit(1).first()
        if first is None:
            raise ValueError("pq: corpus has no non-null vectors")
        dim = first["d"]
        if dim % m != 0:
            raise ValueError(f"pq: vector dim {dim} is not divisible by m={m}")
        d = dim // m
        sub_pts = _sub_points(pts, m, d).persist()
        if train_sample_mod is not None:
            train_pts = sub_pts.where(F.col("vec_id") % train_sample_mod == 0)
            cents = _train_subspace_centroids(
                train_pts, ksub, iters, init_stride=train_sample_mod
            )
        else:
            cents = _train_subspace_centroids(sub_pts, ksub, iters)
        # cents is materialized by the training localCheckpoint; the
        # persisted training input can be released — the final encode
        # re-derives sub points lazily in a single corpus scan
        sub_pts.unpersist()
        return d, cents

    key = (
        (cache_token, "pq_cents", m, ksub, iters, train_sample_mod)
        if cache_token is not None
        else None
    )
    d, cents = suite_cache.memo(key, _train)
    return pts, d, cents


def _encode(
    pts: DataFrame, d: int, cents: DataFrame, m: int, ksub: int
) -> DataFrame:
    """Encode integer points against a trained sub-codebook: ONE corpus
    scan (the subspace explode), ONE broadcast join against the m·ksub-row
    codebook, and ONE aggregate — the m argmins are m null-skipping
    conditional min-structs in a single groupBy, not m passes."""
    scored = _sub_points(pts, m, d).join(F.broadcast(cents), "s").select(
        "vec_id", "s", "cid", _sub_l2().alias("dd")
    )
    mins = scored.groupBy("vec_id").agg(
        *[
            F.min(
                F.when(F.col("s") == s, F.struct(F.col("dd"), F.col("cid")))
            ).alias(f"mm{s}")
            for s in range(m)
        ]
    )
    code = F.lit(0).cast("long")
    for s in range(m):
        code = code + F.col(f"mm{s}.cid") * (ksub ** s)
    return mins.select("vec_id", code.alias("pq_code"))


def pq_codes(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    cache_token: tuple | None = None,
) -> DataFrame:
    """Product-quantization codes: split each vector into ``m`` subvectors,
    quantize every subvector to the nearest of ``ksub`` LEARNED
    sub-centroids by exact integer L2, and pack the ``m`` sub-cell ids into
    one integer code (``sum cid_s * ksub^s``).  PQ is the memory side of
    large-scale vector search: a 64-dim float vector compresses to
    ``m * log2(ksub)`` bits (here 24), and asymmetric distance scans run
    over codes, not floats."""
    pts, d, cents = _pq_codebook(
        emb, m, ksub, id_col, vec_col, iters, cache_token=cache_token
    )
    key = (
        (cache_token, "pq_codes", m, ksub, iters, None)
        if cache_token is not None
        else None
    )
    return suite_cache.memo_df(key, lambda: _encode(pts, d, cents, m, ksub))


def _adq_lut(
    queries: DataFrame, cents: DataFrame, m: int, d: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """Per-query ADQ lookup table: (query_id, s, cid, dd) — the exact
    integer L2 between each query's subspace slice and every trained
    sub-centroid; |Q|·m·ksub rows.  Materialized (localCheckpoint): the
    tiny LUT feeds m broadcast joins — without it each join would re-run
    the query-side slice × codebook scoring."""
    qpts = _int_points(queries.where(F.col(vec_col).isNotNull()), vec_col, id_col)
    return (
        _sub_points(qpts, m, d)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cents), "s")
        .select("query_id", "s", "cid", _sub_l2().alias("dd"))
        .localCheckpoint()
    )


def _adq_score(cand: DataFrame, lut: DataFrame, m: int, ksub: int):
    """Add the asymmetric PQ distance to ``cand`` (query_id, …, pq_code):
    m broadcast LUT joins keyed on (query_id, code digit s) — shuffle-free,
    the compressed-domain scan never touches the original floats.  Returns
    (cand_with_joins, adq_dist_column)."""
    total = F.lit(0).cast("long")
    for s in range(m):
        cid_s = F.expr(f"pq_code div {ksub ** s}") % ksub
        lut_s = lut.where(F.col("s") == s).select(
            F.col("query_id").alias(f"_q{s}"),
            F.col("cid").alias(f"_cid{s}"),
            F.col("dd").alias(f"_d{s}"),
        )
        cand = cand.join(
            F.broadcast(lut_s),
            (F.col("query_id") == F.col(f"_q{s}"))
            & (cid_s == F.col(f"_cid{s}")),
        )
        total = total + F.col(f"_d{s}")
    return cand, total


def pq_adq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 8,
    ksub: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    cache_token: tuple | None = None,
    queries_token: tuple | None = None,
) -> DataFrame:
    """Asymmetric-distance PQ search: rank the COMPRESSED corpus against
    full-precision queries.  Per query, precompute the tiny lookup table
    of (subspace, sub-centroid) → integer distance (``m * ksub`` entries);
    a corpus vector's distance is then m table lookups keyed by the digits
    of its PQ code — the scan never touches the original floats.

    This is the EXACT-ADQ baseline: a deliberate full compressed-domain
    scan (every code × every query, via a broadcast nested-loop on the
    tiny query side — no shuffle explosion, but still O(|corpus|·|Q|)
    work).  It exists to gate the compression itself.  **At scale, do not
    serve from this shape** — :func:`ivf_pq_topk` is the serving path: its
    coarse cells prune the scan to ``nprobe/n_cells`` of the corpus, and
    it shares this exact codebook/LUT recipe so its pruned results are
    verifiable against this baseline.  All distances are exact integers
    (floor-1e6 units), so ranking (adq_dist ASC, vec_id ASC) is
    engine-exact."""
    pts, d, cents = _pq_codebook(
        corpus, m, ksub, id_col, vec_col, iters, cache_token=cache_token
    )
    codes_key = (
        (cache_token, "pq_codes", m, ksub, iters, None)
        if cache_token is not None
        else None
    )
    codes = suite_cache.memo_df(
        codes_key, lambda: _encode(pts, d, cents, m, ksub)
    )

    def build_scored() -> DataFrame:
        lut = _adq_lut(queries, cents, m, d, id_col, vec_col)
        cand = codes.crossJoin(
            F.broadcast(lut.select("query_id").distinct())
        )
        cand, total = _adq_score(cand, lut, m, ksub)
        return cand.where(F.col("query_id") != F.col("vec_id")).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            total.alias("adq_dist"),
        )

    # The pre-top-k scored table depends on the QUERY SET as well as the
    # codebook, so it is only suite-cache-shareable when the caller
    # identifies the queries via ``queries_token`` (pq_rerank_topk and
    # the standalone ADQ query scan identical codes against identical
    # queries — sharing the |corpus|x|Q| scan halves the family's cost).
    scored_key = (
        (cache_token, "pq_adq_scored", m, ksub, iters, queries_token)
        if cache_token is not None and queries_token is not None
        else None
    )
    scored = suite_cache.memo_df(scored_key, build_scored)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adq_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adq_dist", "rank")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 8,
    ksub: int = 8,
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    cache_token: tuple | None = None,
    queries_token: tuple | None = None,
) -> DataFrame:
    """Two-stage ANN serving: a compressed-domain ADQ shortlist (top
    ``shortlist`` codes per query, :func:`pq_adq_topk`) followed by an
    EXACT integer-L2 re-rank of only those candidates — the standard
    production vector-search shape (FAISS's `IndexRefineFlat`): the PQ
    scan bounds the work, the re-rank restores full precision on
    |Q|·shortlist rows, and quantization error can no longer reorder the
    final top-k within the shortlist.

    Scale shape: the shortlist (|Q|·C rows) BROADCASTS into one equi-join
    against the full-precision corpus points (the only corpus-sized
    input; no shuffle of the corpus), the per-query vectors are a second
    broadcast, and the final ranking is a per-query window over ≤C rows.
    Output: (query_id, neighbor_id, exact_dist, rank), rank 1..k by
    (exact_dist ASC, neighbor_id ASC) — engine-exact integers."""
    short = pq_adq_topk(
        corpus, queries, m=m, ksub=ksub, k=shortlist,
        id_col=id_col, vec_col=vec_col, iters=iters,
        cache_token=cache_token, queries_token=queries_token,
    ).select("query_id", "neighbor_id")
    cpts = _int_points(corpus, vec_col, id_col).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qpts = _int_points(queries, vec_col, id_col).select(
        F.col("vec_id").alias("query_id"), F.col("v6").alias("c6")
    )
    rer = (
        cpts.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qpts), "query_id")
        .select("query_id", "neighbor_id", _int_dist().alias("exact_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "exact_dist", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    coarse_iters: int = 2,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_iters: int = 2,
    pq_train_sample_mod: int | None = None,
    cache_token: tuple | None = None,
) -> DataFrame:
    """IVF+PQ — the billion-scale serving composition: a LEARNED coarse
    quantizer (integer k-means, :func:`_train_centroids`) prunes the search
    to ``nprobe`` cells per query, then asymmetric PQ distance ranks only
    the codes inside the probed cells.  :func:`pq_adq_topk` scans every
    code per query; here the coarse index cuts that to ~``nprobe/n_cells``
    of the corpus — at 10⁹ vectors this is the difference between a scan
    and a lookup (IVFADC layout; distances are over raw-vector PQ codes,
    not residuals, which keeps every distance integer-exact and the whole
    train→encode→search composition reproducible by one SQL oracle).

    Shuffle budget: coarse training (bounded, tiny state) + ONE probe→cell
    equi-join keyed on cell id + ONE neighbor_id-keyed join attaching codes
    (co-partitionable with the cell assignment at scale); the LUT and
    codebook joins are all broadcast.  Ranking (adq_dist ASC, id ASC) is
    engine-exact."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    pts = _int_points(corpus, vec_col, id_col).persist()
    coarse = suite_cache.memo(
        (cache_token, "coarse_cents", n_cells, coarse_iters)
        if cache_token is not None
        else None,
        lambda: _train_centroids(pts, n_cells, coarse_iters),
    )

    def assign(df: DataFrame, out_id: str, rank_cap: int) -> DataFrame:
        scored = (
            _int_points(df, vec_col, id_col)
            .withColumnRenamed("vec_id", out_id)
            .crossJoin(F.broadcast(coarse))
            .select(out_id, "cid", _int_dist().alias("d"))
        )
        w = Window.partitionBy(out_id).orderBy(F.col("d").asc(), F.col("cid").asc())
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= rank_cap)
            .select(out_id, "cid")
        )

    cells = assign(corpus, "neighbor_id", 1)
    probes = assign(queries, "query_id", nprobe)
    _, d, cents = _pq_codebook(
        corpus, m, ksub, id_col, vec_col, pq_iters,
        train_sample_mod=pq_train_sample_mod, cache_token=cache_token,
    )
    codes = suite_cache.memo_df(
        (cache_token, "pq_codes", m, ksub, pq_iters, pq_train_sample_mod)
        if cache_token is not None
        else None,
        lambda: _encode(pts, d, cents, m, ksub),
    )
    lut = _adq_lut(queries, cents, m, d, id_col, vec_col)
    # inverted list entries carry their PQ code; the probe join is the only
    # big shuffle, and its output is (query, candidate-code) pairs
    coded_cells = cells.join(
        codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    cand = (
        probes.join(coded_cells, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "pq_code")
    )
    cand, total = _adq_score(cand, lut, m, ksub)
    scored = cand.select("query_id", "neighbor_id", total.alias("adq_dist"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adq_dist").asc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adq_dist", "rank")
        .localCheckpoint()
    )
    pts.unpersist()
    return out


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster-then-prune.

    The SemDeDup recipe (Abbas et al. 2023): k-means-cluster the
    embeddings, compare pairs only WITHIN a cluster, and drop every
    vector that has a ≥-threshold cosine neighbor with a smaller id in
    its cluster (deterministic one-pass keep rule: the lowest-id member
    of each near-duplicate neighborhood survives; a vector is judged
    against all lower-id cluster-mates whether or not those were
    themselves dropped — the standard cheap variant, no iterative
    chasing).

    Assumes embeddings are unit-normalized (the standard contract for
    sentence/image encoders): for unit vectors, integer-L2 clustering
    orders identically to cosine, so cluster-mates are cosine neighbors.
    Pre-normalize upstream if the encoder does not.

    Scale shape: clustering is integer-exact distributed Lloyd's
    (:func:`kmeans_integer` — broadcast centroids, no point shuffle);
    the pair comparison is an equi-join on cid, turning the corpus-wide
    O(n²) into Σ O(|cluster|²) — with n_clusters sized so clusters fit
    comfortably (1000-executor deployments use n_clusters ~ 10⁴-10⁵ for
    10⁹ vectors, exactly as the paper does).  Within-cluster recall is
    the SemDeDup trade: near-dup pairs split across cluster boundaries
    are missed.

    Output: (<id_col>, cid, n_lower_neighbors, kept_flag).
    """
    nn = emb.where(F.col(vec_col).isNotNull())
    # `assignments` lets a suite runner share one trained clustering with
    # other consumers (e.g. the standalone kmeans query) — semantics are
    # identical because training is deterministic.  Contract: columns
    # (<id_col>, cid).  kmeans_integer always names its id output
    # 'vec_id' whatever id_col it read, so normalize both sources.
    if assignments is not None:
        assigns = assignments.select(
            F.col(id_col).alias("vec_id"), "cid"
        )
    else:
        assigns = kmeans_integer(
            nn, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col
        ).select("vec_id", "cid")
    pts = nn.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    sided = pts.join(assigns, "vec_id")
    a = sided.select(
        F.col("vec_id").alias("va"), F.col("_v").alias("_va"), "cid"
    )
    b = sided.select(
        F.col("vec_id").alias("vb"), F.col("_v").alias("_vb"), "cid"
    )
    pairs = (
        a.join(b, "cid")
        .where(F.col("va") < F.col("vb"))
        .select(
            "vb", pair_cosine(F.col("_va"), F.col("_vb")).alias("score")
        )
        .where(F.col("score") >= threshold)
    )
    lower = pairs.groupBy("vb").agg(F.count("*").alias("n_lower"))
    return (
        assigns.join(lower, assigns["vec_id"] == lower["vb"], "left")
        .select(
            F.col("vec_id").alias(id_col),
            "cid",
            F.coalesce("n_lower", F.lit(0)).alias("n_lower_neighbors"),
            F.when(F.col("vb").isNull(), 1).otherwise(0).alias("kept_flag"),
        )
    )


def covariance_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact d×d population covariance of an embedding column in 1e-6
    fixed point — the other half of the vector-table QA report
    (``dim_stats`` is its diagonal): off-diagonal structure reveals
    redundant / linearly-dependent dimensions, and it is the input to
    any PCA / whitening decision (``pca_project`` eigendecomposes this
    very output driver-side, the BPE-merge-table pattern: the d×d matrix
    is the MODEL, not data).

    Same exactness contract as ``dim_stats``: values quantized per row
    to micro-units, pair products summed in DECIMAL(38,0), covariance
    emitted as truncating-DIV integers (``cov_e12`` in 1e-12 units;
    ``cov(i,i) == dim_stats.var_e12`` by construction) — no IEEE
    accumulation-order dependence, DuckDB-checkable bit for bit.

    Scale shape: the upper-triangle pair products are generated per ROW
    by a nested ``transform`` over the quantized array — no self-join,
    no shuffle of the corpus — into ONE map-side-combined aggregate
    keyed by (i, j): d(d+1)/2 keys, every key exactly n rows, shuffle
    bounded by d² per partition.  Per-dimension sums ride a second scan
    (d keys) and broadcast-join back; at 100 TB both scans read one
    parquet column.  The d(d+1)/2 output rows are model-sized.
    Intermediates are proven under 1e38 for n ≤ 1e12 vectors of
    O(1)-magnitude values; the bound fails LOUDLY via a division-only
    assert on the d²-row aggregate.

    Output: (i, j, n_vecs, cov_e12) for j >= i.

    Built as ``covariance_from_partials(vector_stat_partials(emb))`` —
    ONE definition of the moment algebra shared with the streaming
    rollup (streaming/sketch_rollup.vector_stats_rollup_writer), so
    batch and maintained answers agree by construction.
    """
    return covariance_from_partials(vector_stat_partials(emb, vec_col))


def vector_stat_partials(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """The mergeable moment partials behind ``covariance_matrix`` /
    ``dim_stats``: one row per upper-triangle (i, j) pair carrying
    ``(n, sp = Σ q_i·q_j)``, with the diagonal rows additionally
    carrying that dimension's ``(s = Σ q_i, mn, mx)``.

    MERGE LAW: group by (i, j) and take (SUM n, SUM sp, SUM s, MIN mn,
    MAX mx) — partials over disjoint shards (or micro-batches) merge to
    exactly the partials over the union, which is what makes the
    streaming rollup's answers equal the batch operator's bit for bit.

    Scale shape: per-row nested-transform pair expansion (no self-join,
    no corpus shuffle) into ONE map-side-combined (i, j)-keyed
    aggregate; diagonal extras ride a second scan of the same parquet
    column and join the d diagonal keys.
    """
    q = emb.where(F.col(vec_col).isNotNull()).select(
        F.expr(
            f"transform({vec_col}, v ->"
            " CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("_q")
    )
    # per-row magnitude guard BEFORE the pair expansion: x*y is computed
    # in BIGINT (one multiply per pair, the hot path), which wraps
    # silently past |q| ~ 3.03e9 (values of magnitude ~3037) under
    # ansi=off — the repo's overflow convention requires the bound to
    # fail LOUDLY, as dim_stats' DECIMAL squares and the HUGEINT oracle
    # never wrap and the engines would silently diverge
    q = q.where(
        F.assert_true(
            # range check, NOT abs(): the non-ANSI double->long cast
            # saturates extreme values to Long.MIN_VALUE, whose abs()
            # overflows back to itself (negative) and would slip an
            # abs()-based bound
            F.expr(
                "forall(_q, x ->"
                " x BETWEEN -3000000000 AND 3000000000)"
            ),
            F.lit(
                "vector_stat_partials: quantized magnitude exceeds the"
                " int64 pair-product range (|value| > 3000) or an array"
                " element is NULL (a NULL forall is not-true to"
                " assert_true) — normalize the vectors first"
                " (standardize), repair null elements, or widen the"
                " products to DECIMAL"
            ),
        ).isNull()
    )
    pairs = q.select(
        F.explode(
            F.expr(
                "flatten(transform(_q, (x, i) ->"
                " transform(slice(_q, i + 1, size(_q) - i), (y, j) ->"
                " struct(i AS i, CAST(i + j AS INT) AS j, x * y AS p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    prods = pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(p AS DECIMAL(38,0))")).alias("sp"),
    )
    dims = (
        q.select(F.posexplode("_q").alias("dim", "_v"))
        .groupBy("dim")
        .agg(
            F.sum(F.expr("CAST(_v AS DECIMAL(38,0))")).alias("s"),
            F.min("_v").alias("mn"),
            F.max("_v").alias("mx"),
        )
        .select(
            F.col("dim").alias("i"), F.col("dim").alias("j"),
            "s", "mn", "mx",
        )
    )
    return prods.join(F.broadcast(dims), ["i", "j"], "left")


def covariance_from_partials(part: DataFrame) -> DataFrame:
    """(i, j, n_vecs, cov_e12) from a (merged) partials table — the
    serving half of ``covariance_matrix``, shared by the batch operator
    and readers of the streaming rollup's stored table."""
    guarded = part.where(
        F.assert_true(
            F.col("n") <= F.lit(1_000_000_000_000),
            F.lit(
                "covariance_matrix: DECIMAL(38,0) arithmetic is only proven"
                " to 1e12 vectors per job — shard the table and merge the"
                " (n, sp, s, mn, mx) partials, which are exactly mergeable"
            ),
        ).isNull()
    )
    diag = part.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"), F.col("s").alias("_ds")
    )
    return (
        guarded.join(
            F.broadcast(diag.select(F.col("dim").alias("i"),
                                    F.col("_ds").alias("_si"))), "i"
        )
        .join(
            F.broadcast(diag.select(F.col("dim").alias("j"),
                                    F.col("_ds").alias("_sj"))), "j"
        )
        .select(
            "i",
            "j",
            F.col("n").alias("n_vecs"),
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * sp - _si * _sj)"
                " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
            ).alias("cov_e12"),
        )
    )


def dim_stats_from_partials(part: DataFrame) -> DataFrame:
    """``dim_stats``-shaped output (dim, n_vals, mean_micro, var_e12,
    min_micro, max_micro, is_dead) read off a (merged) partials table's
    diagonal rows — pytest-pinned identical to the batch ``dim_stats``."""
    return part.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"),
        F.col("n").alias("n_vals"),
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_micro"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sp - s * s)"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("var_e12"),
        F.col("mn").alias("min_micro"),
        F.col("mx").alias("max_micro"),
        (F.col("mn") == F.col("mx")).alias("is_dead"),
    )


def pca_project(
    emb: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project vectors onto their top-``k`` principal components.

    Two-phase, the distributed-PCA shape that never materializes an
    n×d matrix anywhere: (1) the d×d fixed-point covariance
    (``covariance_matrix``) and per-dimension means (``dim_stats``) are
    aggregated distributed and collected — d(d+1)/2 + d rows, the MODEL
    (same legal collect as the BPE merge table); the driver
    eigendecomposes the d×d matrix with numpy (symmetric ``eigh``,
    deterministic; component sign fixed so each eigenvector's
    largest-|entry| coordinate is positive).  (2) the k×d component
    matrix is inlined as literal arrays and every vector is projected
    JVM-side — centered dot products via ``zip_with``/``aggregate``
    inside whole-stage codegen, one scan, zero shuffles, no Python in
    the per-row path.

    Scores are double-precision projections of the CENTERED vector
    (``(x - mean) · v``) rounded to 4 decimals.  Not oracle-checkable
    (eigendecomposition has no ANSI-SQL form) — verified in pytest
    against a pure-numpy PCA of the same quantized data
    (tests/test_round9_operators.py::TestPcaProject).

    Output: (``id_col``, pc0 .. pc{k-1}).
    """
    import numpy as np

    # ONE partials build serves both the covariance and the means (the
    # diagonal rows carry s and n) — checkpointed so the two serve-side
    # collects read the d(d+1)/2-row table instead of re-scanning the
    # corpus twice
    part = vector_stat_partials(emb, vec_col).localCheckpoint()
    cov_rows = covariance_from_partials(part).collect()
    stat_rows = (
        dim_stats_from_partials(part).select("dim", "mean_micro").collect()
    )
    if not cov_rows:
        raise ValueError(
            "pca_project: no non-null vectors in the input — nothing to"
            " decompose"
        )
    d = max(r["j"] for r in cov_rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"pca_project: k must be in [1, {d}], got {k}")
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov_e12"] * 1e-12
    mean = np.zeros(d)
    for r in stat_rows:
        mean[r["dim"]] = r["mean_micro"] * 1e-6
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k].T  # (k, d), descending variance
    for c in range(k):
        if comps[c, np.abs(comps[c]).argmax()] < 0:
            comps[c] = -comps[c]

    # centered projection (x - m) . v == x . v - m . v, and m . v is a
    # driver constant — so the per-row lambda stays a plain dot product
    out_cols = []
    for c in range(k):
        w = ", ".join(f"CAST({comps[c, t]!r} AS DOUBLE)" for t in range(d))
        offset = float(np.dot(mean, comps[c]))
        out_cols.append(
            F.round(
                F.expr(
                    f"aggregate(zip_with({vec_col}, array({w}), (x, w) ->"
                    " CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE),"
                    " (a, b) -> a + b)"
                )
                - F.lit(offset),
                4,
            ).alias(f"pc{c}")
        )
    return emb.where(F.col(vec_col).isNotNull()).select(id_col, *out_cols)


def standardize(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension z-score normalization (whitening without rotation)
    — the feature-scaling pass run before distance-based training/ANN so
    no dimension dominates by unit choice.  Means/variances come from
    ``dim_stats``'s engine-exact fixed-point contract; the z-score
    itself is per-row double arithmetic in ONE fixed expression shape
    (IEEE ops are bit-stable, rounded to 4 decimals at the edge — the
    repo-wide oracle rule), so DuckDB reproduces every value.
    Dead dimensions (zero variance) emit 0.0 instead of dividing by
    zero.

    Scale shape: the d-row stats table broadcast-joins the posexploded
    vectors — one corpus scan, zero corpus shuffles.  Output is
    (id, dim, z4), rows × dims.
    """
    stats = dim_stats(emb, vec_col).select("dim", "mean_micro", "var_e12")
    ex = emb.where(F.col(vec_col).isNotNull()).select(
        id_col, F.posexplode(vec_col).alias("dim", "_x")
    )
    # the trailing `+ 0.0` canonicalizes IEEE negative zero (a value just
    # under 0 rounds to -0.0, whose repr differs from 0.0 between
    # engines; -0.0 + 0.0 == +0.0 by IEEE-754) — mirrored in the oracle
    z = F.when(F.col("var_e12") <= 0, F.lit(0.0)).otherwise(
        F.round(
            (
                F.expr("CAST(_x AS DOUBLE)")
                - F.expr("CAST(mean_micro AS DOUBLE) * 1.0E-6")
            )
            / F.expr("sqrt(CAST(var_e12 AS DOUBLE) * 1.0E-12)"),
            4,
        )
        + F.lit(0.0)
    )
    return ex.join(F.broadcast(stats), "dim").select(
        id_col, "dim", z.alias("z4")
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    n_bins: int = 12,
    lo_micro: int = -600_000,
    bin_micro: int = 100_000,
    tvd_threshold6: int = 100_000,
) -> DataFrame:
    """Per-dimension distribution DRIFT between two vector snapshots —
    the monitoring report run before trusting this week's embedding
    export against last week's (a re-trained or silently re-scaled
    model head shows up here long before retrieval quality tanks).

    Metric: total variation distance over a FIXED micro-unit binning,
    ``tvd6 = Σ_bins |pa6 - pb6| div 2`` with add-one smoothing
    (``p6 = (cnt + 1) * 1e6 div (n + n_bins)``) — deliberately TVD and
    not PSI/KL: the log-based scores need IEEE ``ln``, whose last-ulp
    behavior differs between JVM and C libm (the reason the TF-IDF
    family replaced log-idf with staged division), while TVD stays in
    exact integer arithmetic end to end, so both engines agree bit for
    bit.  Every (dim, bin) cell of the full grid participates —
    including bins observed on neither side, whose smoothed
    probabilities still differ when the snapshot sizes do.

    Scale shape: each snapshot is one posexplode into a (dim, bin)-keyed
    map-side-combined aggregate (d·n_bins keys); the two count tables
    left-join the d·n_bins-row grid (model-sized) — the corpora are
    never joined or shuffled against each other.

    Output: (dim, n_a, n_b, tvd6, drifted) — one row per dimension.

    Built as ``drift_from_bin_counts(binned_counts(a), binned_counts(b))``
    — ONE definition of the binning and the TVD algebra, shared with the
    streaming monitor (streaming/drift_job.py), so batch and maintained
    answers agree by construction.
    """
    return drift_from_bin_counts(
        binned_counts(a, vec_col, n_bins, lo_micro, bin_micro),
        binned_counts(b, vec_col, n_bins, lo_micro, bin_micro),
        n_bins=n_bins,
        tvd_threshold6=tvd_threshold6,
    )


def binned_counts(
    side: DataFrame,
    vec_col: str = "embedding",
    n_bins: int = 12,
    lo_micro: int = -600_000,
    bin_micro: int = 100_000,
) -> DataFrame:
    """A snapshot's (dim, bin, cnt) micro-unit bin histogram — the
    mergeable half of the drift monitor (counts merge by SUM per
    (dim, bin), exactly what the streaming writer maintains).  One
    posexplode into one map-side-combined aggregate, d·n_bins keys."""
    ex = side.where(F.col(vec_col).isNotNull()).select(
        F.posexplode(vec_col).alias("dim", "_x")
    )
    bin_ = F.least(
        F.greatest(
            F.expr(
                f"(CAST(round(CAST(_x AS DOUBLE) * 1000000, 0) AS BIGINT)"
                f" - {lo_micro}) div {bin_micro}"
            ),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    return (
        ex.select("dim", bin_.cast("int").alias("bin"))
        .groupBy("dim", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def drift_from_bin_counts(
    counts_a: DataFrame,
    counts_b: DataFrame,
    n_bins: int = 12,
    tvd_threshold6: int = 100_000,
) -> DataFrame:
    """The TVD drift report from two (dim, bin, cnt) histograms — the
    serving half of ``distribution_drift``, shared by the batch operator
    and readers of the streaming monitor's stored tables."""
    hi = n_bins - 1
    ca = counts_a.select("dim", "bin", F.col("cnt").alias("_ca"))
    cb = counts_b.select("dim", "bin", F.col("cnt").alias("_cb"))
    dims = ca.select("dim").union(cb.select("dim")).distinct()
    grid = dims.select(
        "dim",
        F.explode(F.sequence(F.lit(0), F.lit(hi))).alias("bin"),
    )
    cells = (
        grid.join(ca, ["dim", "bin"], "left")
        .join(cb, ["dim", "bin"], "left")
        .select(
            "dim",
            "bin",
            F.coalesce("_ca", F.lit(0)).alias("_ca"),
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
        )
    )
    per_dim = cells.groupBy("dim").agg(
        F.sum("_ca").alias("n_a"), F.sum("_cb").alias("n_b")
    )
    scored = cells.join(F.broadcast(per_dim), "dim").select(
        "dim",
        "n_a",
        "n_b",
        F.expr(
            f"abs((_ca + 1) * 1000000 div (n_a + {n_bins})"
            f" - (_cb + 1) * 1000000 div (n_b + {n_bins}))"
        ).alias("_d6"),
    )
    return (
        scored.groupBy("dim", "n_a", "n_b")
        .agg(F.expr("sum(_d6) div 2").alias("tvd6"))
        .select(
            "dim",
            "n_a",
            "n_b",
            "tvd6",
            (F.col("tvd6") > F.lit(tvd_threshold6)).alias("drifted"),
        )
    )


def matryoshka_fidelity(
    emb: DataFrame,
    ks: tuple[int, ...] = (8, 16, 32),
    vec_col: str = "embedding",
) -> DataFrame:
    """Truncation-fidelity report for an embedding column: for each
    candidate prefix length ``k``, what fraction of every vector's
    squared norm the first ``k`` dimensions carry — the QA run before
    adopting Matryoshka-style dimension truncation (serving a 16-dim
    prefix of a 64-dim model), where a LOW tail minimum means some
    vectors lose most of their signal even when the mean looks fine.

    Integer-exact end to end (the chi2/PMI wide idiom): values quantize
    to 1e-6 micro-units per row, squared norms accumulate in
    DECIMAL(38,0), and ``frac6 = (1e6 * ssq_prefix) div ssq_total`` is a
    truncating division both engines compute identically — no IEEE
    sqrt/cosine whose last ulp could differ.  Per-element magnitude
    bound |q| <= 3e9 shared with :func:`vector_stat_partials` (fails
    loudly, identically).  Zero vectors carry no direction and are
    excluded (documented, mirrored in the oracle).

    Scale shape: ONE corpus scan — per-row arithmetic into a
    len(ks)-row explode and a map-side-combined aggregate keyed by k
    (len(ks) keys); output is len(ks) rows.

    Output: (k_dims, n_vecs, mean_frac6, min_frac6).
    """
    ssq = (
        "aggregate({0}, CAST(0 AS DECIMAL(38,0)),"
        " (a, x) -> a + CAST(x AS DECIMAL(19,0)) * x)"
    )
    q = emb.where(F.col(vec_col).isNotNull()).select(
        F.expr(
            f"transform({vec_col}, x ->"
            " CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("_q")
    )
    q = q.where(
        F.assert_true(
            # range check, NOT abs(): the non-ANSI double->long cast
            # saturates extreme values to Long.MIN_VALUE, whose abs()
            # overflows back to itself (negative) and would slip an
            # abs()-based bound
            F.expr(
                "forall(_q, x ->"
                " x BETWEEN -3000000000 AND 3000000000)"
            ),
            F.lit(
                "matryoshka_fidelity: quantized magnitude exceeds the"
                " int64 square range (|value| > 3000) — normalize the"
                " vectors first (standardize)"
            ),
        ).isNull()
    )
    per_k = (
        q.select(
            F.expr(ssq.format("_q")).alias("_st"),
            *[
                F.expr(ssq.format(f"slice(_q, 1, {int(k)})")).alias(f"_s{k}")
                for k in ks
            ],
        )
        .where(F.col("_st") > 0)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(k)).cast("long").alias("k_dims"),
                            F.expr(
                                f"CAST((CAST(1000000 AS DECIMAL(38,0))"
                                f" * _s{k}) DIV _st AS BIGINT)"
                            ).alias("frac6"),
                        )
                        for k in ks
                    ]
                )
            ).alias("e")
        )
        .select("e.k_dims", "e.frac6")
    )
    return (
        per_k.groupBy("k_dims")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr("CAST(SUM(frac6) DIV COUNT(*) AS BIGINT)").alias(
                "mean_frac6"
            ),
            F.min("frac6").alias("min_frac6"),
        )
        .orderBy("k_dims")
    )


def jl_sign_matrix(in_dims: int, out_dims: int) -> list[list[int]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix: entry (j, i)
    is the low bit of ``md5("jl:{j}:{i}")`` mapped to ±1 — a
    COMPILE-TIME constant (no RNG seed to ship, no broadcast variable:
    the matrix folds into the projection expression as literals, and
    the SQL oracle regenerates the identical literals from the same
    md5).  Sign matrices satisfy the JL lemma with the same distortion
    bounds as Gaussians (Achlioptas 2003, database-friendly random
    projections) and keep the arithmetic INTEGER-exact."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"jl:{j}:{i}".encode()).digest()[0] & 1 else -1
            for i in range(in_dims)
        ]
        for j in range(out_dims)
    ]


def jl_project(
    emb: DataFrame,
    in_dims: int,
    out_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-sign (JL) projection of an embedding column to
    ``out_dims`` dimensions, in 1e-6 micro-units:
    ``y_j = Σ_i sign(j,i) · q_i`` — the cheap dimensionality reduction
    run BEFORE an ANN index at 100 TB (a 4× narrower vector quarters
    every downstream shuffle/scan byte count while the JL lemma bounds
    pairwise-distance distortion).

    Scale shape: a PURE MAP — one projection expression per output
    dimension with the sign matrix folded in as literals (no broadcast
    join, no shuffle, no UDF); whole-stage codegen sees one fused
    projection.  Per-element magnitude guard |q| <= 3e9 shared with
    :func:`vector_stat_partials` (sums then bound by in_dims·3e9,
    int64-safe to in_dims ~3e9).

    Output: (``id_col``, proj array<bigint>) — micro-unit components.
    """
    signs = jl_sign_matrix(in_dims, out_dims)
    q = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x ->"
            " CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("_q"),
    )
    q = q.where(
        F.assert_true(
            F.expr(
                "forall(_q, x -> x BETWEEN -3000000000 AND 3000000000)"
            ),
            F.lit(
                "jl_project: quantized magnitude exceeds the int64 sum"
                " range (|value| > 3000) — normalize the vectors first"
                " (standardize)"
            ),
        ).isNull()
    )
    ys = [
        ("0" + "".join(
            f" {'+' if s > 0 else '-'} _q[{i}]" for i, s in enumerate(row)
        ))
        for row in signs
    ]
    return q.select(
        id_col,
        F.expr("array(" + ", ".join(ys) + ")").alias("proj"),
    )


def jl_norm_distortion(
    emb: DataFrame,
    in_dims: int,
    out_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector JL distortion report: how much of each vector's
    squared norm the ``out_dims``-dim sign projection preserves —
    ``ratio6 = (1e6 · ‖y‖²) div (out_dims · ‖q‖²)`` in 1e-6 fixed
    point (the JL estimator E[‖y‖²/out_dims] = ‖q‖², so a healthy
    report clusters around 1e6; heavy tails mean the target dimension
    is too small for this corpus).  The QA run before adopting the
    projection for an ANN index.

    Integer-exact end to end (the matryoshka idiom): micro-unit
    components, squares in DECIMAL(38,0), one truncating division at
    the edge — both engines agree bit for bit.  Zero vectors are
    excluded (no norm to preserve).

    Scale shape: ONE corpus scan, per-row arithmetic only — the
    projection is a literal-folded map (:func:`jl_project`) and both
    squared norms reduce within the row; no shuffle at any size.

    Output: (``id_col``, ratio6).
    """
    signs = jl_sign_matrix(in_dims, out_dims)
    q = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x ->"
            " CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("_q"),
    )
    q = q.where(
        F.assert_true(
            F.expr(
                "forall(_q, x -> x BETWEEN -3000000000 AND 3000000000)"
            ),
            F.lit(
                "jl_norm_distortion: quantized magnitude exceeds the"
                " int64 sum range (|value| > 3000) — normalize the"
                " vectors first (standardize)"
            ),
        ).isNull()
    )
    ys = [
        ("0" + "".join(
            f" {'+' if s > 0 else '-'} _q[{i}]" for i, s in enumerate(row)
        ))
        for row in signs
    ]
    proj_sq = " + ".join(
        f"CAST(CAST(_y{j} AS DECIMAL(19,0)) * _y{j} AS DECIMAL(38,0))"
        for j in range(out_dims)
    )
    orig_sq = (
        "aggregate(_q, CAST(0 AS DECIMAL(38,0)),"
        " (a, x) -> a + CAST(x AS DECIMAL(19,0)) * x)"
    )
    rows = q.select(
        id_col,
        *[F.expr(y).alias(f"_y{j}") for j, y in enumerate(ys)],
        F.expr(orig_sq).alias("_st"),
    )
    return rows.where(F.col("_st") > 0).select(
        id_col,
        F.expr(
            f"CAST((1000000 * ({proj_sq})) DIV ({out_dims} * _st)"
            " AS BIGINT)"
        ).alias("ratio6"),
    )
