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


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the repetition-removal half of
    the quality filter a training-data pipeline runs over every document).
    Deterministic contract, mirrored exactly by the oracle SQL:

      top_bigram_frac  chars in the most frequent word 2-gram:
                       count(top) * (len('w1 w2') - 1) / Σ len(token);
                       top by (count desc, bigram asc); 0.0 when < 2 tokens
      dup_5gram_frac   fraction of word-5-gram occurrences that are
                       repeats: (n_5grams - n_distinct) / n_5grams;
                       0.0 when < 5 tokens
      max_token_run    longest run of one token repeated consecutively
                       (0 for empty docs)

    Scale shape: ZERO shuffle — every signal is a single-pass fold inside
    the row (whole-stage codegen). The bigram mode is computed by sorting
    the row's bigram array and folding run lengths (O(m log m) per doc,
    never the O(m²) explode+groupBy that would shuffle (doc, bigram) pairs
    corpus-wide). Each stage is its own projection (see
    winnow_fingerprints' CollapseProject note)."""
    empty = F.array().cast("array<string>")
    d = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    # staged: bigrams ('w1 w2'), sorted; 5-grams
    d = d.select(
        "doc_id",
        "_toks",
        F.when(
            n >= 2,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("_toks"), i),
                        F.element_at(F.col("_toks"), i + 1),
                    ),
                )
            ),
        ).otherwise(empty).alias("_big"),
        F.when(
            n >= 5,
            F.transform(
                F.sequence(F.lit(1), n - 4),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, 5)),
            ),
        ).otherwise(empty).alias("_g5"),
    )
    # fold the SORTED bigram array: track current run + best (count, gram).
    # Strict > keeps the FIRST (= ascending-smallest) gram at equal count.
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bc"),
        F.lit("").alias("bg"),
    )

    def step(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = new_run > acc["bc"]
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(acc["bc"]).alias("bc"),
            F.when(better, x).otherwise(acc["bg"]).alias("bg"),
        )

    best = F.aggregate(F.col("_big"), zero, step)
    tok_chars = F.aggregate(
        F.col("_toks"), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    # consecutive-run fold over the raw token stream
    rzero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("mx")
    )

    def rstep(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["mx"], new_run).alias("mx"),
        )

    runs = F.aggregate(F.col("_toks"), rzero, rstep)
    n5 = F.size(F.col("_g5"))
    return d.select(
        "doc_id",
        F.round(
            F.when(
                (best["bc"] > 0) & (tok_chars > 0),
                best["bc"] * (F.length(best["bg"]) - 1) / tok_chars,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.when(
                n5 > 0,
                (n5 - F.size(F.array_distinct(F.col("_g5")))).cast("double") / n5,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_5gram_frac"),
        # NULL text -> NULL token array -> NULL fold result; that's an empty
        # doc (0-run), not an unknown
        F.coalesce(runs["mx"], F.lit(0)).cast("long").alias("max_token_run"),
    )


# PII patterns shared by engine and oracle (Java regex ∩ RE2 syntax — no
# backreferences, no lookaround, so DuckDB's RE2 and the JVM agree).
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]?\d{0,4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, clean_text) — count + redact the
    classic PII surface a pre-training pipeline scrubs: emails, phone-like
    digit groups, IPv4 literals. Replacement tokens are <EMAIL>/<IP>/
    <PHONE>, applied in THAT fixed order — each pattern runs on the
    previous pass's redacted text, and IPv4 must precede phone because the
    looser phone shape (ddd[-.]ddd…) would otherwise eat the front of a
    dotted quad ('192.168.0' out of '192.168.0.1').

    All JVM-side regexp_count/regexp_replace — zero Python, zero shuffle;
    the patterns live in PII_PATTERNS so the oracle SQL is generated from
    the same strings (RE2-compatible subset: both engines parse them
    identically)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_email = F.regexp_count(text, F.lit(PII_PATTERNS["email"]))
    t1 = F.regexp_replace(text, PII_PATTERNS["email"], "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_PATTERNS["ipv4"]))
    t2 = F.regexp_replace(t1, PII_PATTERNS["ipv4"], "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PATTERNS["phone"]))
    t3 = F.regexp_replace(t2, PII_PATTERNS["phone"], "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_email.cast("long").alias("n_email"),
        n_phone.cast("long").alias("n_phone"),
        n_ip.cast("long").alias("n_ipv4"),
        t3.alias("clean_text"),
    )


def source_stats(
    docs: DataFrame,
    blocklist: list[str] | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source curation rollup — the domain-level view a corpus curator
    cuts on before document-level filters: (source, n_docs, total_tokens,
    avg_nchars, n_langs, blocked). One map-side-combined groupBy on the
    source key; the blocklist is a LITERAL broadcast membership test
    (array_contains over a driver-known list — the Spark analogue of
    joining a broadcast domain-blocklist dim), so no second shuffle."""
    blocked = (
        F.array_contains(F.array(*[F.lit(s) for s in blocklist]), F.col("source"))
        if blocklist
        else F.lit(False)
    )
    toks = tokens_col(text_col)
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).cast("long").alias("total_tokens"),
            F.round(F.avg(F.length(F.coalesce(F.col(text_col), F.lit("")))), 6).alias(
                "avg_nchars"
            ),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .withColumn("blocked", blocked)
    )


def char_ngram_logprob(
    docs: DataFrame,
    model: DataFrame | list,
    lang: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """CCNet-style model-perplexity quality signal (Wenzek et al. 2020
    filter corpora by LM perplexity; the char-n-gram model here is the
    sandbox stand-in for their KenLM): score every doc under the TARGET
    language's n-gram distribution from train_char_ngram_model.

      n_scored  in-vocabulary gram occurrences
      avg_logp  round(Σ logp / n_scored, 6)  (NULL when n_scored = 0)
      pseudo_ppl round(exp(-avg_logp), 6)    (NULL when n_scored = 0) —
                 lower = more target-language-like; the CCNet cut point

    Same scale shape as lang_id_model: the parameter column for `lang` is
    collected once (V floats), inference is one Arrow pass with byte-coded
    gram counting and a single dot product per doc — no shuffle, no
    join."""
    import math

    import numpy as np
    import pandas as pd

    rows = model.collect() if isinstance(model, DataFrame) else list(model)
    rows = [r for r in rows if r["lang"] == lang]
    if not rows:
        raise ValueError(f"model has no rows for lang {lang!r}")
    grams = sorted(r["gram"] for r in rows)
    logp_of = {r["gram"]: float(r["logp"]) for r in rows}

    def _pack(b: bytes) -> int:
        code = 0
        for ch in b:
            code = (code << 8) | ch
        return code

    order = sorted(range(len(grams)), key=lambda i: _pack(grams[i].encode("ascii")))
    vocab_codes = np.array(
        [_pack(grams[i].encode("ascii")) for i in order], dtype=np.int64
    )
    w = np.array([logp_of[grams[i]] for i in order], dtype=np.float64)

    def score(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = pdf["_canon"].fillna("").to_list()
            nb = len(ids)
            buf = np.frombuffer(("\x00".join(texts)).encode("ascii"), dtype=np.uint8)
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            starts = np.zeros(nb, dtype=np.int64)
            if nb > 1:
                starts[1:] = np.cumsum(lens[:-1] + 1)
            tot = np.zeros(nb, dtype=np.float64)
            cnt = np.zeros(nb, dtype=np.float64)
            n_win = len(buf) - n + 1
            if n_win > 0:
                codes = np.zeros(n_win, dtype=np.int64)
                for k in range(n):
                    codes = (codes << 8) | buf[k : k + n_win].astype(np.int64)
                pos = np.searchsorted(vocab_codes, codes)
                pos_c = np.minimum(pos, len(vocab_codes) - 1)
                hit = vocab_codes[pos_c] == codes
                doc_of = np.searchsorted(starts, np.arange(n_win), side="right") - 1
                np.add.at(tot, doc_of[hit], w[pos_c[hit]])
                np.add.at(cnt, doc_of[hit], 1.0)
            scored = cnt > 0
            avg = np.where(scored, np.round(tot / np.maximum(cnt, 1.0), 6), np.nan)
            ppl = np.where(scored, np.round(np.exp(-avg), 6), np.nan)
            out = pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_scored": cnt.astype(np.int64),
                    "avg_logp": avg,
                    "pseudo_ppl": ppl,
                }
            )
            out.loc[~scored, ["avg_logp", "pseudo_ppl"]] = None
            yield out

    canon = F.concat_ws(" ", tokens_col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"), canon.alias("_canon")
    ).mapInPandas(
        score, schema="doc_id long, n_scored long, avg_logp double, pseudo_ppl double"
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs over
# the lowercased text — the GPT-2-family pre-split shape, reduced to the
# RE2 ∩ Java-regex subset so engine and oracle agree byte-for-byte
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def subtoken_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_subtokens, n_ws_tokens, subtoken_ratio) — token counting
    under a BPE-ish pre-tokenizer (BPE_SPLIT_PATTERN: letter/digit/punct
    runs, the GPT-2 pre-split shape) next to the whitespace count; the
    ratio (round-6; 0.0 for empty docs) approximates tokens-per-word, the
    usual budget estimator for LLM training data. Pure JVM regexp — zero
    shuffle, zero Python."""
    text = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    sub = F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))
    ws = F.size(F.split(F.trim(text), r"\s+"))
    ws = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(ws)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        sub.cast("long").alias("n_subtokens"),
        ws.cast("long").alias("n_ws_tokens"),
        F.round(
            F.when(ws > 0, sub.cast("double") / ws).otherwise(F.lit(0.0)), 6
        ).alias("subtoken_ratio"),
    )


def sample_mix(
    docs: DataFrame,
    weights: dict[str, float],
    salt: str = "mix",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic data-mixing sampler — the per-source rate sampling a
    pretraining pipeline uses to hit a target corpus mixture: keep a doc
    from source s iff frac(md5(salt || ':' || doc_id)) < weights[s]
    (sources absent from `weights` are dropped; weight 1.0 keeps all).
    frac() is the first 8 md5 hex digits as a 32-bit uniform — md5 keeps
    the decision engine-portable (any system, incl. the oracle, replays
    the exact same keep set; a seeded rand() would not survive an engine
    swap or a repartition).

    One scan, zero shuffle, zero Python; changing the salt re-draws the
    sample without touching the data (epoch-level remixing)."""
    if not weights:
        return docs.filter(F.lit(False))
    u = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double") / float(1 << 32)
    )
    rate = None
    for s in sorted(weights):
        cond = F.when(F.col(source_col) == s, F.lit(float(weights[s])))
        rate = cond if rate is None else rate.when(F.col(source_col) == s, F.lit(float(weights[s])))
    rate = rate.otherwise(F.lit(0.0))
    return docs.filter(u < rate)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Sequence packing for pretraining: assign docs to fixed-token-budget
    blocks, GPT-style concatenate-then-chunk — (doc_id, shard, n_tokens,
    bin_id, bin_pos). Deterministic contract: docs concatenate in doc_id
    order WITHIN their shard into one virtual token stream; bin_id =
    floor(start_offset / budget) is the fixed-size block holding the
    doc's FIRST token, bin_pos the offset inside that block. Docs may
    straddle block boundaries — exactly how causal-LM packing cuts a
    concatenated stream into context windows (the cross-doc attention
    mask is the trainer's concern, not the packer's).

    Scale shape: real pipelines pack within shards, never globally — a
    global doc order would serialize the corpus through one task. The
    window is partitionBy(shard) orderBy(doc_id): one shuffle on the
    shard key, cumsum inside each shard partition; shard count is the
    parallelism (the caller picks shards accordingly — source, crawl
    snapshot, bucket)."""
    from pyspark.sql import Window

    toks = tokens_col(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("bin_id"),
        (start - F.floor(start / budget) * budget).cast("long").alias("bin_pos"),
    )
