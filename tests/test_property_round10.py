"""Property-based checks of the round-10 part-3/part-5 operators against
pure-Python models: hypothesis generates small corpora / URL-ish
strings, a reference model computes the exact expected values, one Spark
job per example compares bit for bit.  Pins the semantics the DuckDB
oracles only sample at one dataset."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import dedup as DD

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["ada", "bo", "cyr", "dee", "eph", "fay", "gil", "hob"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30)
_corpus = st.lists(_doc, min_size=1, max_size=5)


# --------------------------------------------------------------------------
# content_defined_chunks == the pure-Python CDC model (boundary rule,
# chunk partition, ids)
# --------------------------------------------------------------------------

def _py_chunks(toks: list[str], window: int) -> list[tuple[int, int, str]]:
    cuts = [
        i + 1
        for i, t in enumerate(toks)
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % window == 0
    ]
    bounds = list(zip([0] + cuts, cuts + [len(toks)]))
    out = []
    for cid, (s, e) in enumerate(b for b in bounds if b[1] > b[0]):
        out.append((cid, e - s, " ".join(toks[s:e])))
    return out


@given(corpus=_corpus, window=st.sampled_from([2, 4, 8]))
@settings(**_SETTINGS)
def test_cdc_chunks_match_python_model(spark, corpus, window):
    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id: long, text: string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk)
        for r in DD.content_defined_chunks(df, window=window).collect()
    )
    want = sorted(
        (i, cid, n, ch)
        for i, doc in enumerate(corpus)
        for cid, n, ch in _py_chunks(doc, window)
    )
    assert got == want


# --------------------------------------------------------------------------
# sorted_neighborhood_pairs candidate set == brute-force rank-window
# pairs (threshold 0 disables the Jaccard cut so the BLOCKING is pinned)
# --------------------------------------------------------------------------

@given(
    keys=st.lists(
        st.sampled_from(["aa", "ab", "ba", "bb", "ca"]),
        min_size=2,
        max_size=10,
    ),
    w=st.sampled_from([1, 2, 3, 5]),
)
@settings(**_SETTINGS)
def test_snm_candidates_match_bruteforce_rank_window(spark, keys, w):
    # one distinct doc per row; text = key + unique tail so every doc
    # has non-empty shingles and a deterministic sort key
    rows = [
        (i, f"{k} tail{i} pad pad pad pad") for i, k in enumerate(keys)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.doc_id_a, r.doc_id_b, r.rank_distance)
        for r in DD.sorted_neighborhood_pairs(
            df, w=w, n=3, threshold=0.0, key_len=24
        ).collect()
    }
    order = sorted(
        range(len(keys)),
        key=lambda i: (" ".join(rows[i][1].split())[:24], i),
    )
    want = set()
    for pa in range(len(order)):
        for pb in range(pa + 1, min(pa + w + 1, len(order))):
            a, b = order[pa], order[pb]
            want.add((min(a, b), max(a, b), pb - pa))
    assert {(a, b, d) for a, b, d in got} == want


# --------------------------------------------------------------------------
# canonical_url: idempotence + collision-invariance under the messiness
# transforms it is defined to erase
# --------------------------------------------------------------------------

_hosts = st.sampled_from(["ex.com", "Ex.COM", "www.ex.com", "WWW.Ex.Com"])
_paths = st.sampled_from(["", "/", "/a", "/a/", "/A/b"])
_tracking = st.sampled_from(["", "utm_source=x", "fbclid=1", "gclid=2"])
_params = st.lists(
    st.sampled_from(["a=1", "b=2", "c=3"]), max_size=3, unique=True
)


@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=_hosts,
    path=_paths,
    params=_params,
    tracking=_tracking,
    frag=st.sampled_from(["", "#x", "#frag"]),
)
@settings(**_SETTINGS)
def test_canonical_url_idempotent_and_order_invariant(
    spark, scheme, host, path, params, tracking, frag
):
    default_port = ":80" if scheme.lower() == "http" else ":443"
    qs = [p for p in params + ([tracking] if tracking else [])]
    variant_a = (
        f"{scheme}://{host}{default_port}{path}"
        + ("?" + "&".join(qs) if qs else "")
        + frag
    )
    variant_b = (
        f"{scheme.lower()}://{host.lower()}{path}"
        + ("?" + "&".join(reversed(qs)) if qs else "")
    )
    df = spark.createDataFrame(
        [(variant_a,), (variant_b,)], "url string"
    )
    canon = [
        r.c
        for r in df.select(CUR.canonical_url(F.col("url")).alias("c")).collect()
    ]
    # the two spellings differ only in erased messiness -> same canonical
    assert canon[0] == canon[1]
    # idempotence: canonicalizing the canonical form changes nothing
    df2 = spark.createDataFrame([(c,) for c in canon], "url string")
    again = [
        r.c
        for r in df2.select(CUR.canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert again == canon
