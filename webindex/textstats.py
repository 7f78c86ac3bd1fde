"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

These generalize the reference's deterministic per-row text normalization
(reference: src/nmr_FAIR_DOs/utils.py:281-340 checkTextIsSimilar — lowercase +
rule-chain normalization; utils.py:130-167 base64 ids) into the text-curation
ops a training-data pipeline runs over every document. All JVM-side built-ins
(whole-stage codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webindex.dedup import tokens_col

# Tiny deterministic stopword lists per language (top function words).
# Real pipelines broadcast a fasttext-style model; the heuristic here is the
# reference-style rule chain: score(lang) = |tokens ∩ stopwords(lang)|,
# argmax with deterministic tie-break by lang code.
# Stopword lists per language (ASCII-only: the shared oracle tokenizer is
# [a-z0-9]+, so accented forms would never match either side). A real
# pipeline swaps in a broadcast fasttext-style model; the heuristic's Spark
# shape (pure column exprs, no UDF) is what scales.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "dans", "qui", "pour"],
    "it": ["il", "la", "di", "che", "e", "in", "un", "per", "con", "del"],
    "pt": ["os", "as", "um", "uma", "para", "com", "por", "mais", "como", "mas"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet"],
    "sv": ["och", "att", "det", "som", "den", "med", "var", "han", "hon", "men"],
}

_EN_STOP = STOPWORDS["en"]


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens) — whitespace/punct token counts."""
    toks = tokens_col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score in [0,1]:
      len_score      saturating doc length (n_tokens / 100, capped at 1)
      diversity      unique/total token ratio
      alpha_ratio    alnum chars / all chars
      stopword_ratio EN stopword fraction (prose-likeness signal)
    score = 0.4*len + 0.3*diversity + 0.2*alpha + 0.1*min(1, 5*stopword)."""
    # NULL text = empty document, not "maximally long": F.least skips NULL
    # operands, so an unguarded NULL/100 would give len_score 1.0 and NULL
    # n_tokens/quality
    docs = docs.withColumn("__qs_text", F.coalesce(F.col(text_col), F.lit("")))
    text_col = "__qs_text"
    toks = tokens_col(text_col)
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    text = F.col(text_col)
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).cast("double")
    total_chars = F.greatest(F.length(text).cast("double"), F.lit(1.0))
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    len_score = F.least(n / 100.0, F.lit(1.0))
    diversity = F.when(n > 0, uniq / n).otherwise(0.0)
    alpha_ratio = alnum / total_chars
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(0.0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("int").alias("n_tokens"),
        F.round(len_score, 6).alias("len_score"),
        F.round(diversity, 6).alias("diversity"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.4 * len_score
            + 0.3 * diversity
            + 0.2 * alpha_ratio
            + 0.1 * F.least(5.0 * stop_ratio, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_hits) — stopword-overlap language heuristic;
    'und' when no list matches. Deterministic tie-break: lang code asc."""
    toks = F.array_distinct(tokens_col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, arr)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max_by (hits desc, lang asc): pick max hits, then min lang among winners
    all_arr = F.array(*scores)
    max_hits = F.array_max(F.transform(all_arr, lambda s: s["hits"]))
    winners = F.filter(all_arr, lambda s: s["hits"] == max_hits)
    pred = F.when(max_hits > 0, F.array_min(F.transform(winners, lambda s: s["lang"]))).otherwise(
        F.lit("und")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        max_hits.alias("lang_hits"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every k-gram
    of the token stream, slide a window of `window` consecutive k-gram
    hashes, keep each window's minimum — the standard rolling-hash document
    fingerprint for plagiarism/near-dup detection, guaranteeing a shared
    fingerprint for any match of length >= window + k - 1 tokens.

    Spark-first: the "rolling" update is replaced by independent per-k-gram
    hashing inside `transform` (vectorized JVM expressions, whole-stage
    codegen; identical output, embarrassingly parallel — the sequential
    rolling recurrence is a single-core optimization that doesn't survive
    distribution). md5 is the k-gram hash so any engine reproduces it.
    Output: (doc_id, fp) — one row per distinct selected fingerprint. Docs
    shorter than k tokens emit no rows."""
    empty = F.array().cast("array<string>")
    # Each intermediate is its own projection: referencing a big expression
    # tree (regexp tokenize, the grams transform) from inside ANOTHER
    # lambda would duplicate and re-evaluate it per element — measured
    # O(n_tokens^2) blowup (47s for 500 docs) when written as one nested
    # expression. Staged aliases keep every stage evaluated once per row
    # (Catalyst's CollapseProject refuses to inline non-cheap expressions
    # referenced multiple times).
    # NB: Spark's sequence(1, 0) produces DESCENDING [1, 0], not empty —
    # every sequence() is guarded by its count predicate.
    d = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_toks"))
    n_grams = F.size(F.col("_toks")) - (k - 1)
    d = d.select(
        "doc_id",
        F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, k))),
            ),
        ).otherwise(empty).alias("_grams"),
    )
    n_windows = F.size(F.col("_grams")) - (window - 1)
    d = d.select(
        "doc_id",
        "_grams",
        F.when(
            n_windows >= 1,
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(F.col("_grams"), j, window)),
            ),
        ).otherwise(empty).alias("_mins"),
    )
    # short docs (>=k tokens but < window k-grams): keep the global min so
    # every doc with at least one k-gram is fingerprinted
    fps = F.when(F.size(F.col("_mins")) >= 1, F.array_distinct(F.col("_mins"))).otherwise(
        F.when(
            F.size(F.col("_grams")) >= 1, F.array(F.array_min(F.col("_grams")))
        ).otherwise(empty)
    )
    # explode_outer, NOT explode: for a plain explode the optimizer's
    # InferFiltersFromGenerate injects `size(fps) > 0` and inlines the WHOLE
    # winnowing pipeline into that filter — nested lambdas then re-evaluate
    # the grams stage per window element (measured 45s for 500 docs vs 4.5s
    # this way). The null rows explode_outer keeps are dropped by a cheap
    # post-filter on the exploded column.
    return (
        d.select("doc_id", fps.alias("fps"))
        .select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) content fingerprint: md5 over canonical token stream —
    the reference's normalize-then-compare (utils.py:281-340) as a stored
    fingerprint column. Engine-portable (md5)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", tokens_col(text_col))).alias("fp"),
    )
