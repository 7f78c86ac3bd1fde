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


def train_char_ngram_model(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 2,
    top_grams: int = 200,
) -> DataFrame:
    """Fit a multinomial-Naive-Bayes character-n-gram language model —
    the DISTRIBUTED training half of the pluggable lang-ID hook (the
    fastText/CLD-class model stand-in lang_id's docstring promises; same
    shape: per-class n-gram log-probabilities). Deterministic contract
    (mirrored exactly by the model-scoring oracle SQL and lang_id_model):

      canon(doc)   = tokens joined by ' ' (the shared analyzer — no
                     whitespace/punctuation dialect between engine/oracle)
      c(lang, g)   = occurrences of char n-gram g in lang's canon texts
      kept(lang)   = top `top_grams` grams by (c desc, g asc)
      G            = union of kept grams across langs, V = |G|
      w(lang, g∈G) = round(ln((c(lang, g) + 1) / (tot(lang) + V)), 6),
                     tot(lang) = Σ_{g∈G} c(lang, g)   (add-one smoothing;
                     the round-6 makes the parameter table hash-stable
                     across libm implementations — JVM StrictMath vs
                     DuckDB ln differ in the last ulp)

    Output: one DENSE row per (lang, gram ∈ G) — langs × V rows, DRIVER-
    SCALE BY CONSTRUCTION (the model is the reduction; at any corpus size
    the parameter table stays ≤ |langs|·top_grams·n_langs rows), ready to
    broadcast into lang_id_model. Training itself is two shuffles of
    (lang, gram) longs: one count aggregate, one top-k window per lang —
    both map-side combined, corpus-scale-safe."""
    canon = F.concat_ws(" ", tokens_col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(canon) - (n - 1), F.lit(0))),
        lambda i: canon.substr(i, F.lit(n)),
    )
    counts = (
        docs.filter(F.col(label_col).isNotNull() & (F.length(canon) >= n))
        .select(F.col(label_col).alias("lang"), F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    kept = counts.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= top_grams
    )
    union_g = kept.select("gram").distinct()
    langs = counts.select("lang").distinct()
    dense = (
        langs.crossJoin(union_g)  # langs × V — model-scale, not data-scale
        .join(counts, ["lang", "gram"], "left")
        .select("lang", "gram", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    v = union_g.count()
    tot = dense.groupBy("lang").agg(F.sum("c").alias("tot"))
    return (
        dense.join(tot, "lang")
        .select(
            "lang",
            "gram",
            F.round(
                F.log((F.col("c") + 1) / (F.col("tot") + F.lit(float(v)))), 6
            ).alias("logp"),
        )
    )


def lang_id_model(
    docs: DataFrame,
    model: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(doc_id, pred_lang) — language ID under a BROADCAST parameter table:
    `model` is (lang, gram, logp) rows from train_char_ngram_model (or any
    externally-trained drop-in with the same schema — this is the hook a
    real fastText/CLD substitute plugs into). score(doc, lang) = Σ over
    the doc's canon n-gram OCCURRENCES that are in the model vocabulary of
    logp(lang, gram), ROUNDED to 6 decimals (so the argmax is stable under
    summation-order float drift between engine and oracle); argmax, ties
    lang asc; docs with no in-vocabulary gram -> 'und'.

    Scale shape: the parameter table is model-scale (langs × V — see the
    trainer), collected once and closed over into ONE Arrow-batched
    mapInPandas pass; no shuffle, no join — the inference cost is one
    linear scan of the corpus regardless of model origin. Inside each
    batch the work is pure numpy: the canon text is ASCII by construction
    ([a-z0-9 ] from the shared tokenizer), so each char n-gram packs into
    an int64 byte-code; windows are matched to the vocabulary with one
    searchsorted, counted with one add.at, and scored with one (docs × V)
    @ (V × langs) matmul — no per-row Python."""
    import numpy as np
    import pandas as pd

    rows = model.collect() if isinstance(model, DataFrame) else list(model)
    langs = sorted({r["lang"] for r in rows})
    grams = sorted({r["gram"] for r in rows})
    g_ix = {g: i for i, g in enumerate(grams)}
    l_ix = {l: j for j, l in enumerate(langs)}
    W = np.zeros((len(grams), len(langs)), dtype=np.float64)
    for r in rows:
        W[g_ix[r["gram"]], l_ix[r["lang"]]] = float(r["logp"])
    lang_arr = np.array(langs)

    def _pack(b: bytes) -> int:
        code = 0
        for ch in b:
            code = (code << 8) | ch
        return code

    # sorted int64 codes of the vocabulary + their column index in W
    vocab_codes = np.array(sorted(_pack(g.encode("ascii")) for g in grams), dtype=np.int64)
    vocab_cols = np.array(
        [g_ix[g] for g in sorted(grams, key=lambda g: _pack(g.encode("ascii")))],
        dtype=np.int64,
    )

    def score(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = pdf["_canon"].fillna("").to_list()
            nb = len(ids)
            # one buffer: docs joined by NUL (never in canon, so window
            # codes spanning a boundary can't collide with vocab codes)
            buf = np.frombuffer(("\x00".join(texts)).encode("ascii"), dtype=np.uint8)
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            starts = np.zeros(nb, dtype=np.int64)
            if nb > 1:
                starts[1:] = np.cumsum(lens[:-1] + 1)
            cnt = np.zeros((nb, len(grams)), dtype=np.float64)
            n_win = len(buf) - n + 1
            if n_win > 0:
                codes = np.zeros(n_win, dtype=np.int64)
                for k in range(n):
                    codes = (codes << 8) | buf[k : k + n_win].astype(np.int64)
                pos = np.searchsorted(vocab_codes, codes)
                pos_c = np.minimum(pos, len(vocab_codes) - 1)
                hit = vocab_codes[pos_c] == codes
                # doc index of each window start (separators resolve to the
                # preceding doc, but their codes never hit the vocab)
                doc_of = np.searchsorted(starts, np.arange(n_win), side="right") - 1
                np.add.at(cnt, (doc_of[hit], vocab_cols[pos_c[hit]]), 1.0)
            scores = np.round(cnt @ W, 6)  # (docs, langs)
            seen = cnt.sum(axis=1) > 0
            pred = lang_arr[np.argmax(scores, axis=1)]  # first max = lang asc
            pred = np.where(seen, pred, "und")
            yield pd.DataFrame({"doc_id": ids, "pred_lang": pred})

    canon = F.concat_ws(" ", tokens_col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"), canon.alias("_canon")
    ).mapInPandas(score, schema="doc_id long, pred_lang string")


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
