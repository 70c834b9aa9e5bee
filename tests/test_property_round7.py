"""Property-based checks of the round-7 operators against pure-Python
models: hypothesis generates small corpora/graphs/images, a reference
model computes the exact expected result, one Spark job per example
compares.  Pins the semantics the DuckDB oracles only sample at one
dataset."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import multimodal as MM

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["aa", "ab", "ba", "cc", "x"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


# --------------------------------------------------------------------------
# dup_clusters == union-find connected components (after the round-7
# endpoint-only rewrite: singletons appended, not propagated)
# --------------------------------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=0,
    max_size=12,
)


def _py_components(n_nodes: int, edges: list[tuple[int, int]]):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        cid = min(members)
        for v in members:
            out[v] = (cid, len(members), v == cid)
    return out


@given(edges=_edges)
@settings(**_SETTINGS)
def test_dup_clusters_equals_union_find(spark, edges):
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id: long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "doc_id_a: long, doc_id_b: long",
    )
    if not edges:
        pairs = pairs.where("doc_id_a <> doc_id_a")  # empty edge set
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in DD.dup_clusters(nodes, pairs).collect()
    }
    assert got == _py_components(n, edges)


# --------------------------------------------------------------------------
# lsh_verified_pairs stage 2 == exact set-Jaccard over 3-gram shingles
# --------------------------------------------------------------------------


def _py_shingles(text: str):
    toks = [t.lower() for t in text.split()]
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


@given(texts=_texts)
@settings(**_SETTINGS)
def test_lsh_verified_jaccard_matches_set_model(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string"
    )
    cand = spark.createDataFrame(
        [(a, b, 1) for a in range(len(texts)) for b in range(len(texts))
         if a < b],
        "doc_id_a: long, doc_id_b: long, n_shared_bands: long",
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in DD.lsh_verified_pairs(
            docs, threshold=0.0, candidates=cand
        ).collect()
    }
    expected = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
            if sa and sb and sa & sb:
                expected[(a, b)] = round(len(sa & sb) / len(sa | sb), 4)
    assert got == expected


# --------------------------------------------------------------------------
# domain_term_lift == the staged integer division model
# --------------------------------------------------------------------------

_corpora = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(
            " ".join
        ),
    ),
    min_size=2,
    max_size=10,
)


@given(rows=_corpora)
@settings(**_SETTINGS)
def test_domain_term_lift_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id: long, source: string, text: string",
    )
    got = {
        (r.source, r.tok): (r.n_tok, r.lift6)
        for r in CUR.domain_term_lift(df, top_k=100, min_count=1).collect()
    }
    tf: dict[tuple[str, str], int] = {}
    for s, t in rows:
        for w in t.lower().split():
            tf[(s, w)] = tf.get((s, w), 0) + 1
    t_class: dict[str, int] = {}
    t_term: dict[str, int] = {}
    for (s, w), n in tf.items():
        t_class[s] = t_class.get(s, 0) + n
        t_term[w] = t_term.get(w, 0) + n
    t_all = sum(tf.values())
    expected = {
        k: (n, (n * 1_000_000 // t_term[k[1]]) * t_all // t_class[k[0]])
        for k, n in tf.items()
    }
    assert got == expected


# --------------------------------------------------------------------------
# PNG decode round-trips arbitrary images under every filter assignment
# --------------------------------------------------------------------------


@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    rgba=st.booleans(),
)
@settings(max_examples=12, deadline=None)
def test_png_roundtrip_random_images(seed, w, h, rgba):
    from tests.test_multimodal_real import png_bytes

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 4 if rgba else 3), dtype=np.uint8)
    filters = list(rng.integers(0, 5, size=h))
    got = MM._decode_rgb(png_bytes(img, filters=[int(f) for f in filters]))
    assert np.array_equal(got, img[:, :, :3])
