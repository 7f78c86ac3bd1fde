"""Dedup + textstats + simsearch + multimodal operator tests (training-data
pipeline ops; correctness on planted duplicates / known vectors)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today"),          # near dup
        (3, "completely different content about spark and indexes here"),
        (4, "The QUICK brown fox jumps over the lazy dog today!!"),        # canon dup of 0
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from webindex.dedup import exact_dedup

    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    assert out[0] == 3  # docs 0,1,4 canonicalize identically
    assert out[2] == 1 and out[3] == 1 and out[5] == 1


def test_minhash_lsh_finds_near_dups(docs):
    from webindex.dedup import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(docs, n_hashes=16)
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs, n_bands=8).collect()}
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    assert (0, 2) in pairs  # near dup shares most shingles
    assert (3, 5) not in pairs


def test_ngram_jaccard_exact_values(docs):
    from webindex.dedup import ngram_jaccard_pairs

    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3, verify_all_pairs=True).collect()
    }
    assert got[(0, 1)] == 1.0 and got[(0, 4)] == 1.0
    # doc0 vs doc2: 8 shingles each; 'dog'/'cat' appears in the last 2
    # shingles -> intersection 6, union 10
    assert abs(got[(0, 2)] - 6 / 10) < 1e-9
    assert (3, 5) not in got


def test_lsh_path_matches_allpairs_on_dups(docs):
    from webindex.dedup import ngram_jaccard_pairs

    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, 0.9, verify_all_pairs=True).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, 0.9, verify_all_pairs=False).collect()
    }
    assert exact == lsh  # at jaccard>=0.9 LSH with 8 bands can't miss


def test_simhash(docs, spark):
    from webindex.dedup import simhash64, simhash_near_pairs

    fps = simhash64(docs)
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1] == vals[4]  # identical canon text -> same fp
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(fps, 16).collect()}
    assert pairs[(0, 1)] == 0
    # the 16-bit-chunk blocking guarantees recall for hamming <= 3
    # (pigeonhole over 4 chunks): craft a pair differing in exactly 2 bits
    crafted = spark.createDataFrame(
        [(100, 0x0123456789ABCDEF), (101, 0x0123456789ABCDEF ^ 0b101)],
        "doc_id long, simhash long",
    )
    got = simhash_near_pairs(crafted, 3).collect()
    assert len(got) == 1 and got[0]["hamming"] == 2


def test_token_count_quality_langid_fingerprint(docs):
    from webindex.textstats import fingerprint, lang_id, quality_score, token_count

    tc = {r["doc_id"]: (r["n_tokens"], r["n_unique_tokens"]) for r in token_count(docs).collect()}
    assert tc[0] == (10, 9)  # 'the' twice
    assert tc[5] == (3, 3)

    qs = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0 < qs[0]["quality"] <= 1
    assert qs[0]["diversity"] == 0.9

    li = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert li[0] == "en"

    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[4]
    assert fp[0] != fp[2]


def test_lang_id_heuristic_langs(spark):
    from webindex.textstats import lang_id

    rows = [
        (0, "der hund und die katze ist nicht von hier"),
        (1, "el perro y la casa de que en un lugar"),
        (2, "le chien et la maison dans les rues qui est"),
        (3, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[0] == "de" and got[1] == "es" and got[2] == "fr" and got[3] == "und"


def test_lang_ngram_model_train_and_score(spark):
    """Trained NB char-bigram model: (a) parameter table honors the
    documented contract (dense langs × V, add-one smoothing, round-6 logp);
    (b) inference recovers the training language on held-in text; (c) no
    in-vocab gram -> 'und'; (d) empty/NULL text -> 'und'."""
    import math

    from webindex.textstats import lang_id_model, train_char_ngram_model

    rows = [
        (0, "aaab aaab aaab aaab", "aa"),
        (1, "aaba aaba aaba aaba", "aa"),
        (2, "zzzy zzzy zzzy zzzy", "zz"),
        (3, "zyzz zyzz zyzz zyzz", "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = train_char_ngram_model(df, n=2, top_grams=3)
    rows_m = model.collect()
    langs = {r["lang"] for r in rows_m}
    vocab = {r["gram"] for r in rows_m}
    assert langs == {"aa", "zz"}
    # dense: every (lang, gram) pair present
    assert len(rows_m) == len(langs) * len(vocab)
    # contract spot-check: recompute one weight by hand
    by = {(r["lang"], r["gram"]): r["logp"] for r in rows_m}
    # count c('aa', g) over canon 'aaab aaab aaab aaab' + 'aaba aaba aaba aaba'
    def count_bigrams(texts):
        c = {}
        for t in texts:
            for i in range(len(t) - 1):
                g = t[i : i + 2]
                c[g] = c.get(g, 0) + 1
        return c

    c_aa = count_bigrams(["aaab aaab aaab aaab", "aaba aaba aaba aaba"])
    tot_aa = sum(v for g, v in c_aa.items() if g in vocab)
    v = len(vocab)
    for g in vocab:
        want = round(math.log((c_aa.get(g, 0) + 1) / (tot_aa + v)), 6)
        assert by[("aa", g)] == pytest.approx(want, abs=1e-9)

    test = spark.createDataFrame(
        [(10, "aaab aaba"), (11, "zzzy zyzz"), (12, "qqqq"), (13, None), (14, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id_model(test, model, n=2).collect()}
    assert got[10] == "aa" and got[11] == "zz"
    assert got[12] == "und"  # 'qq' never in either top-3 vocab
    assert got[13] == "und" and got[14] == "und"


def test_lang_ngram_model_tie_breaks_lang_asc(spark):
    """Symmetric corpora make every score tie; the argmax must pick the
    ascending-first language on BOTH the vectorized engine path and the
    oracle contract."""
    from webindex.textstats import lang_id_model, train_char_ngram_model

    rows = [(0, "abab abab", "l2"), (1, "abab abab", "l1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = train_char_ngram_model(df, n=2, top_grams=5)
    got = lang_id_model(
        spark.createDataFrame([(5, "abab")], "doc_id long, text string"), model
    ).collect()
    assert got[0]["pred_lang"] == "l1"


def test_repetition_stats_contract(spark):
    """Gopher-style signals: hand-computed fractions, tie-break bigram asc,
    consecutive-run fold, and the empty/short-doc zero cases."""
    from webindex.textstats import repetition_stats

    rows = [
        # 'a b a b a' -> bigrams: 'a b'x2, 'b a'x2 -> tie -> 'a b' (asc);
        # frac = 2 * 3-1=... len('a b')-1 = 2 chars; tok_chars = 5
        (0, "a b a b a"),
        # run of 4 'x'; 5-grams: 'x x x x x' dup? tokens: x x x x y ->
        # one 5-gram only -> dup frac 0; max run 4
        (1, "x x x x y"),
        # 6 identical tokens: 5-grams 'z z z z z' x2 -> dup frac 0.5
        (2, "z z z z z z"),
        (3, ""),  # empty
        (4, None),  # null
        (5, "solo"),  # 1 token: no bigrams, no 5-grams, run 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["top_bigram_frac"] == pytest.approx(2 * 2 / 5, abs=1e-6)
    assert got[0]["max_token_run"] == 1
    assert got[1]["max_token_run"] == 4
    assert got[1]["dup_5gram_frac"] == 0.0
    assert got[2]["dup_5gram_frac"] == pytest.approx(0.5, abs=1e-6)
    assert got[2]["max_token_run"] == 6
    for d in (3, 4):
        assert got[d]["top_bigram_frac"] == 0.0
        assert got[d]["dup_5gram_frac"] == 0.0
        assert got[d]["max_token_run"] == 0
    assert got[5]["top_bigram_frac"] == 0.0 and got[5]["max_token_run"] == 1


def test_pii_scrub_counts_and_order(spark):
    from webindex.textstats import pii_scrub

    rows = [
        (0, "mail me at jo.doe+x@site.example or call 555-123-4567"),
        (1, "server at 192.168.0.1 and 10.0.0.7"),
        (2, "no pii here"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert "<EMAIL>" in got[0]["clean_text"] and "<PHONE>" in got[0]["clean_text"]
    assert "jo.doe" not in got[0]["clean_text"]
    assert got[1]["n_ipv4"] == 2 and got[1]["clean_text"].count("<IP>") == 2
    assert got[2]["n_email"] == got[2]["n_phone"] == got[2]["n_ipv4"] == 0
    assert got[3]["clean_text"] == ""


def test_source_stats_blocklist(spark):
    from webindex.textstats import source_stats

    rows = [
        (0, "one two", "en", "good.example"),
        (1, "three", "de", "good.example"),
        (2, "four five six", "en", "spam.example"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["source"]: r for r in source_stats(df, blocklist=["spam.example"]).collect()}
    assert got["good.example"]["n_docs"] == 2
    assert got["good.example"]["total_tokens"] == 3
    assert got["good.example"]["n_langs"] == 2
    assert not got["good.example"]["blocked"]
    assert got["spam.example"]["blocked"]


def test_cosine_topk_and_lsh(spark):
    from webindex.simsearch import cosine_topk_bruteforce, cosine_topk_lsh

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        noise = rng.standard_normal(16) * (0.01 if i < 5 else 2.0)
        v = base + noise
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in base]

    top = cosine_topk_bruteforce(df, q, k=5).collect()
    assert {r["vec_id"] for r in top} == {0, 1, 2, 3, 4}
    assert all(r["cos"] > 0.99 for r in top)
    scores = [r["cos"] for r in top]
    assert scores == sorted(scores, reverse=True)

    # numpy cross-check of the exact cosine value
    v0 = np.array(rows[top[0]["vec_id"]][1])
    expect = float(v0 @ base / (np.linalg.norm(v0) * np.linalg.norm(base)))
    assert abs(top[0]["cos"] - expect) < 1e-9

    # LSH with generous probing finds the same neighbors here
    lsh = cosine_topk_lsh(df, q, k=5, n_planes=4, probe_hamming=1)
    assert {r["vec_id"] for r in lsh.collect()} >= {0, 1, 2}


def test_embedding_near_pairs(spark):
    from webindex.simsearch import all_pairs_above

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]) for r in all_pairs_above(df, 0.99).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_multimodal_plumbing(spark):
    from webindex.multimodal import decode_image, extract_features, synth_media_df

    media = synth_media_df(spark, n=24)
    feats = extract_features(media, n_features=8, fake=True).collect()
    assert len(feats) == 24
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["features"]) == 8 for r in feats)
    assert by_id[0]["n_bytes"] == 64
    # deterministic: same payload -> same sha1 + features on re-run
    feats2 = {r["media_id"]: r for r in extract_features(media, 8, fake=True).collect()}
    assert feats2[0]["sha1"] == by_id[0]["sha1"]
    assert feats2[0]["features"] == by_id[0]["features"]
    # compressed formats stay an explicit stub (raw BMP/PPM decode is real)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG not decodable here", fake=False)


def test_multimodal_real_bmp_decode(spark):
    """Round 4: decode_image is REAL for numpy-decodable rasters. Constant-
    color BMP fixtures must yield exact closed-form channel means through
    the full Spark mapInPandas path, and the codec must round-trip
    arbitrary images in both supported formats."""
    import numpy as np

    from webindex.multimodal import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        image_channel_stats,
        synth_bmp_media_df,
    )

    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (5, 3), (8, 8), (6, 7)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    stats = {
        r["media_id"]: r
        for r in image_channel_stats(synth_bmp_media_df(spark, n=30)).collect()
    }
    assert len(stats) == 30
    for i in range(30):
        r = stats[i]
        assert (r["width"], r["height"]) == (8, 8)
        assert (r["r_mean"], r["g_mean"], r["b_mean"]) == (
            float(7 * i % 256),
            float(13 * i % 256),
            float(29 * i % 256),
        ), i


def test_edge_hardening_nulls_and_degenerate_inputs(spark):
    """Round-4 review edges: zero-norm / NULL embeddings in near-dup LSH,
    radius-0 simhash blocking, NULL text quality, NULL media payloads, and
    sub-shingle docs excluded from LSH banding."""
    from webindex.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_pairs,
    )
    from webindex.multimodal import image_channel_stats
    from webindex.simsearch import all_pairs_above
    from webindex.textstats import quality_score

    # zero-norm + NULL embeddings: no crash, no bogus pairs
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]), (4, None)],
        "vec_id long, embedding array<double>",
    )
    assert all_pairs_above(emb, 0.5).collect() == []

    # max_hamming=0: exact-fingerprint blocking works (width-64 chunk)
    fps = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9)], "doc_id long, simhash long"
    )
    got = [(r["a"], r["b"]) for r in simhash_near_pairs(fps, 0).collect()]
    assert got == [(1, 2)]

    # NULL text scores as an empty doc, never as maximal length
    q = quality_score(
        spark.createDataFrame([(1, None), (2, "real text here")],
                              "doc_id long, text string")
    ).collect()
    null_row = next(r for r in q if r["doc_id"] == 1)
    assert null_row["n_tokens"] == 0 and null_row["len_score"] == 0.0
    assert null_row["quality"] is not None

    # NULL payload rows are skipped, not crashed on
    m = spark.createDataFrame(
        [(1, "image", None, None)],
        "media_id long, kind string, payload binary, meta string",
    )
    assert image_channel_stats(m).collect() == []

    # sub-shingle docs (all-NULL signatures) never flood LSH buckets
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "three four"), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, n_hashes=4, shingle=3)
    assert lsh_candidate_pairs(sigs, n_bands=2, max_bucket=100).collect() == []


def test_dup_span_stats_planted(spark):
    """Exact-substring duplication: a 5-token span planted in two docs is
    flagged in both; a doc repeating its own span counts too; unique docs
    and sub-k docs report zero."""
    from webindex.dedup import dup_span_stats

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"intro {shared} tail one two"),
        (1, f"other lead {shared} closing words"),
        (2, "completely unique content nothing repeated here at all today"),
        (3, f"{shared} {shared}"),  # intra-doc repeat
        (4, "tiny doc"),  # < k tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(df, k=5).collect()}
    assert got[0]["n_dup_grams"] >= 1 and got[1]["n_dup_grams"] >= 1
    assert got[2]["n_dup_grams"] == 0 and got[2]["n_grams"] > 0
    assert got[3]["n_dup_grams"] >= 2  # the repeated span dups against itself
    assert got[4]["n_grams"] == 0 and got[4]["dup_frac"] == 0.0
    # frac contract: doc 0 has 8 tokens -> 4 grams... recompute exactly
    for d in (0, 1, 2, 3):
        r = got[d]
        assert r["dup_frac"] == pytest.approx(
            r["n_dup_grams"] / r["n_grams"], abs=1e-6
        )


def test_char_ngram_logprob_and_subtokens(spark):
    """Perplexity filter: target-language text scores lower pseudo-ppl than
    off-language text under a model trained on both; no-vocab docs -> NULL.
    Subtoken counter: hand-counted BPE-ish runs."""
    import math

    from webindex.textstats import (
        char_ngram_logprob,
        subtoken_count,
        train_char_ngram_model,
    )

    rows = [
        (0, "aaab aaab aaab aaab", "aa"),
        (1, "aaba aaba aaba aaba", "aa"),
        (2, "zzzy zzzy zzzy zzzy", "zz"),
        (3, "zyzz zyzz zyzz zyzz", "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = train_char_ngram_model(df, n=2, top_grams=3)
    test = spark.createDataFrame(
        [(10, "aaab aaab"), (11, "zzzy zzzy"), (12, "qqqq"), (13, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_ngram_logprob(test, model, "aa").collect()}
    assert got[10]["pseudo_ppl"] < got[11]["pseudo_ppl"]  # aa-like beats zz-like
    assert got[12]["n_scored"] == 0 and got[12]["pseudo_ppl"] is None
    assert got[13]["pseudo_ppl"] is None
    # contract: ppl = exp(-round(avg,6)) rounded
    r = got[10]
    assert r["pseudo_ppl"] == pytest.approx(round(math.exp(-r["avg_logp"]), 6), abs=1e-6)
    with pytest.raises(ValueError, match="no rows"):
        char_ngram_logprob(test, model, "xx")

    st = spark.createDataFrame(
        [(0, "Hello, world! v2.0"), (1, ""), (2, None), (3, "plain words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in subtoken_count(st).collect()}
    # hello | , | world | ! | v | 2 | . | 0  -> 8 runs; ws tokens 3
    assert got[0]["n_subtokens"] == 8 and got[0]["n_ws_tokens"] == 3
    assert got[0]["subtoken_ratio"] == pytest.approx(8 / 3, abs=1e-6)
    assert got[1]["n_subtokens"] == 0 and got[1]["n_ws_tokens"] == 0
    assert got[2]["subtoken_ratio"] == 0.0
    assert got[3]["n_subtokens"] == 3 and got[3]["n_ws_tokens"] == 3


def test_sample_mix_and_pack_sequences(spark):
    import hashlib

    from webindex.textstats import pack_sequences, sample_mix

    rows = [(i, "tok " * (i % 7 + 1), "s" + str(i % 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {r["doc_id"] for r in sample_mix(df, {"s0": 0.5, "s1": 0.0}).collect()}
    # replay the contract in python
    want = set()
    for i, _, src in rows:
        u = int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16) / 2**32
        if src == "s0" and u < 0.5:
            want.add(i)
    assert kept == want and 0 < len(kept) < 100
    # weight 1.0 keeps everything from that source; empty weights -> nothing
    assert len(sample_mix(df, {"s0": 1.0}).collect()) == 100
    assert sample_mix(df, {}).collect() == []
    # a different salt re-draws
    kept2 = {r["doc_id"] for r in sample_mix(df, {"s0": 0.5}, salt="epoch2").collect()}
    assert kept2 != kept

    got = {r["doc_id"]: r for r in pack_sequences(df, budget=10).collect()}
    # replay: concatenate per shard in doc_id order, chunk at 10
    for shard in ("s0", "s1"):
        start = 0
        for i, text, src in rows:
            if src != shard:
                continue
            n = i % 7 + 1
            r = got[i]
            assert (r["shard"], r["n_tokens"]) == (shard, n)
            assert r["bin_id"] == start // 10 and r["bin_pos"] == start % 10, i
            start += n
