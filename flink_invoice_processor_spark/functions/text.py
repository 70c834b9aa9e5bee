"""Text analysis operators over a documents table.

All expressions are JVM-native (whole-stage-codegen'd) and written with a
portable subset of SQL semantics so the DuckDB oracles in
``__spark_entry__.py`` compute the identical values:

- tokenization = split on ``\\s+`` after trim (same in both engines);
- punctuation counting via regexp_replace-and-length-diff (avoids
  regexp_count dialect differences);
- fingerprints via md5 (identical in both engines).

No UDFs anywhere — at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Minimal per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately tiny and frozen: they are part of the operator's
#: contract (the DuckDB oracle embeds the same lists).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "be", "this", "are", "or"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por",
           "con", "no", "para", "los", "las", "se", "del", "al", "como", "su"],
    "de": ["der", "die", "das", "und", "zu", "in", "den", "von", "ist",
           "mit", "nicht", "ein", "eine", "auf", "für", "im", "dem", "des",
           "sich", "auch"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "du",
           "que", "est", "pour", "qui", "dans", "par", "sur", "au", "plus",
           "pas"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate: ceil(chars/4)
    bounded below by the word count — the standard cheap proxy when the real
    tokenizer can't ship with the engine."""
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    return df.select(
        "doc_id",
        n_words.alias("n_tokens"),
        F.greatest(
            n_words, F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("int")
        ).alias("n_subword_est"),
    )


def quality_columns(text_col: str = "text") -> list:
    """Quality-score output columns as standalone expressions — composable
    into a single projection with other per-doc feature families (one scan
    instead of scan-per-family + doc_id joins; see ``corpus_curation``)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_chars = F.length(text)
    n_toks = F.size(toks)
    stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    n_alnum_sp = F.length(F.regexp_replace(text, r"[^a-zA-Z0-9 ]", ""))

    avg_word_len = n_chars / F.greatest(n_toks, F.lit(1))
    punct_ratio = (n_chars - n_alnum_sp) / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_toks, F.lit(1))

    len_component = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(avg_word_len - F.lit(6.0)) / F.lit(6.0)
    )
    punct_component = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * F.lit(5.0))
    stop_component = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) / F.lit(0.4)
    )
    score = (
        len_component * F.lit(0.3)
        + punct_component * F.lit(0.3)
        + stop_component * F.lit(0.4)
    )
    return [
        n_toks.alias("n_tokens"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    ]


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length / punctuation / stopword-ratio
    components combined into [0, 1].  The arithmetic is deliberately simple
    (abs/least/greatest only) so the oracle reproduces it exactly."""
    return df.select("doc_id", *quality_columns(text_col))


def language_columns(text_col: str = "text") -> list:
    """Language-ID output columns as standalone expressions (see
    ``quality_columns`` for why)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    hits = {}
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    best = F.greatest(*hits.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(hits):  # alphabetical tie-break
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return [
        pred.alias("pred_lang"),
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(hits)],
    ]


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: the language whose stopword list matches
    the most tokens wins; ties break alphabetically; zero hits → 'und'."""
    return df.select("doc_id", *language_columns(text_col))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) plus a 64-bit prefix fingerprint of the first 8 tokens
    (cheap near-head clustering key)."""
    norm = F.concat_ws(" ", F.transform(tokens(F.col(text_col)), F.lower))
    head = F.concat_ws(" ", F.slice(F.transform(tokens(F.col(text_col)), F.lower), 1, 8))
    return df.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.conv(F.substring(F.md5(head), 1, 15), 16, 10).cast("long").alias(
            "head_fp64"
        ),
    )
