"""Single-process reference oracle: tokenize -> postings -> BM25 -> top-k.

Pure Python/numpy/pandas, no Spark. This implements the published
Lucene/ES-default semantics the reference relies on by creating a mapping-less
index (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173) and
reading relevance-ordered hits (elasticsearch.py:280-286). It is "the
reference engine" for rank-identity tests (SURVEY.md §5.1): the Spark engine
must produce identical top-k doc_ids and scores within 1e-6.

Shares textproc with the Spark path => byte-identical analysis by
construction. Determinism rules identical to bm25.py: float64, per-doc sum in
term-ascending order, ties -> doc_id asc.
"""

from __future__ import annotations

from collections import Counter

from webindex.bm25 import BM25Config, DEFAULT
from webindex.textproc import tokenize


class OracleIndex:
    def __init__(self, docs: dict[int, str], conf: BM25Config = DEFAULT):
        """docs: {doc_id: text} (already-extracted text)."""
        self.conf = conf
        self.doc_lens: dict[int, int] = {}
        # postings[term] = sorted list of (doc_id, tf)
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self._toks: dict[int, list[str]] = {}  # phrase-oracle token streams
        for doc_id in sorted(docs):
            toks = tokenize(docs[doc_id])
            self._toks[doc_id] = toks
            self.doc_lens[doc_id] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
        self.n_docs = len(docs)
        total = float(sum(self.doc_lens.values()))
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def idf(self, term: str) -> float:
        return self.conf.idf(self.df(term), self.n_docs)

    def score_all(self, query: str) -> dict[int, float]:
        """Exhaustive BM25 scores for all matching docs.

        Per-doc contributions are accumulated in term-ascending order
        (duplicate query terms count once — Lucene multi_match dedups terms
        per field; matches our engine)."""
        terms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist:
                contrib = idf * self.conf.impact(tf, self.doc_lens[doc_id], self.avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        return scores

    def topk(self, query: str, k: int) -> list[tuple[int, float]]:
        scores = self.score_all(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def topk_match(
        self, query: str, k: int, minimum_should_match: int = 1
    ) -> list[tuple[int, float]]:
        """ES match with minimum_should_match: only docs containing at least
        msm distinct query terms rank; scores unchanged (sum over present
        terms). operator="and" is msm = the query's distinct-term count —
        including terms absent from the corpus (a required clause that can
        never match ⇒ empty result), which the CALLER expresses by passing
        that count."""
        terms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        counts: dict[int, int] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist:
                contrib = idf * self.conf.impact(tf, self.doc_lens[doc_id], self.avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
                counts[doc_id] = counts.get(doc_id, 0) + 1
        ranked = sorted(
            ((d, s) for d, s in scores.items() if counts[d] >= minimum_should_match),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return ranked[:k]

    def topk_prefix(
        self, prefix: str, k: int, max_expansions: int | None = 1024
    ) -> list[tuple[int, float]]:
        """Constant-score prefix query: docs containing any term starting
        with `prefix` score 1.0, order doc_id asc. Mirrors query.topk_prefix
        (default cap = query.MAX_CLAUSE_COUNT)."""
        terms = [t for t in self.postings if t.startswith(prefix)]
        if max_expansions is not None:
            terms = sorted(terms, key=lambda t: (-self.df(t), t))[:max_expansions]
        docs = sorted({d for t in terms for d, _ in self.postings[t]})
        return [(d, 1.0) for d in docs[:k]]

    def topk_wildcard(
        self, pattern: str, k: int, max_expansions: int | None = 1024
    ) -> list[tuple[int, float]]:
        """Constant-score wildcard: ONLY * and ? are wild (the engine maps
        the pattern 1:1 onto SQL LIKE, so brackets etc. are literal — NOT
        fnmatch character classes). Mirrors webindex.query.topk_wildcard
        (default cap = query.MAX_CLAUSE_COUNT)."""
        import re

        rx = re.compile(
            "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in pattern
            )
            + r"\Z"
        )
        terms = [t for t in self.postings if rx.match(t)]
        if max_expansions is not None:
            terms = sorted(terms, key=lambda t: (-self.df(t), t))[:max_expansions]
        docs = sorted({d for t in terms for d, _ in self.postings[t]})
        return [(d, 1.0) for d in docs[:k]]

    @staticmethod
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def topk_fuzzy(
        self, word: str, k: int, fuzziness: int = 1, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Fuzzy query: expansion within Levenshtein `fuzziness` (capped by
        df desc, term asc), dis_max BM25 over matched expansions. Mirrors
        webindex.query.topk_fuzzy."""
        terms = [t for t in self.postings if self._lev(t, word) <= fuzziness]
        terms = sorted(terms, key=lambda t: (-self.df(t), t))[:max_expansions]
        scores: dict[int, float] = {}
        for t in terms:
            idf = self.idf(t)
            for doc_id, tf in self.postings[t]:
                c = idf * self.conf.impact(tf, self.doc_lens[doc_id], self.avgdl)
                if c > scores.get(doc_id, -1.0):
                    scores[doc_id] = c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def more_like_this(
        self,
        like: str,
        k: int,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
    ) -> list[tuple[int, float]]:
        """MLT: tf/df-filtered candidates, top max_query_terms by tf·idf
        (tie term asc), then the plain BM25 disjunction. Mirrors
        webindex.query.more_like_this."""
        tf = Counter(tokenize(like))
        cand = [
            t
            for t, c in tf.items()
            if c >= min_term_freq and self.df(t) >= min_doc_freq
        ]
        picked = sorted(cand, key=lambda t: (-tf[t] * self.idf(t), t))[
            :max_query_terms
        ]
        if not picked:
            return []
        return self.topk(" ".join(picked), k)

    def topk_phrase_prefix(
        self, phrase: str, k: int, max_expansions: int = 50, slop: int = 0
    ) -> list[tuple[int, float]]:
        """match_phrase_prefix: dis_max over the last-term expansions'
        exact-phrase scores, evaluated EXHAUSTIVELY per expansion (no
        top-k union shortcut — the naive cross-check for the engine's
        union argument). Mirrors webindex.query.topk_phrase_prefix."""
        toks = tokenize(phrase)
        if not toks:
            return []
        *fixed, last = toks
        terms = [t for t in self.postings if t.startswith(last)]
        terms = sorted(terms, key=lambda t: (-self.df(t), t))[:max_expansions]
        scores: dict[int, float] = {}
        for t in terms:
            q = " ".join(fixed + [t])
            res = (
                self.topk_phrase(q, self.n_docs)
                if slop == 0
                else self.topk_phrase_slop(q, slop, self.n_docs)
            )
            for d, s in res:
                if s > scores.get(d, -1.0):
                    scores[d] = s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def topk_after(
        self, query: str, k: int, after: tuple[float, int]
    ) -> list[tuple[int, float]]:
        """search_after: the k results strictly after cursor (score, doc_id)
        in (score desc, doc_id asc) order. Mirrors webindex.query.topk_after."""
        s_a, d_a = after
        ranked = sorted(self.score_all(query).items(), key=lambda kv: (-kv[1], kv[0]))
        return [
            (d, s) for d, s in ranked if s < s_a or (s == s_a and d > d_a)
        ][:k]

    def topk_bool(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        filter_: str = "",
        k: int = 10,
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """Lucene BooleanQuery semantics, naively from the token streams:
        must/filter_ required (filter_ unscored), should optional+scored with
        minimum_should_match (default 0 with a required clause, else 1),
        must_not excludes. Absent must/filter term -> empty; docs matching
        only filter clauses score 0.0. Mirrors webindex.query.topk_bool."""
        must_t, should_t = set(tokenize(must)), set(tokenize(should))
        not_t, filt_t = set(tokenize(must_not)), set(tokenize(filter_))
        if not_t and not (must_t | should_t | filt_t):
            # must_not-only = ES pure filter context: match_all minus the
            # excluded docs, score 0.0 (mirrors query.topk_bool)
            excl = {
                d for d, toks in self._toks.items() if set(toks) & not_t
            }
            return [(d, 0.0) for d in sorted(self._toks) if d not in excl][:k]
        if (must_t | filt_t) & not_t:
            return []
        should_t -= not_t
        required = must_t | filt_t
        scored = sorted(must_t | should_t)
        if any(self.df(t) == 0 for t in required):
            return []
        msm = minimum_should_match
        if msm is None:
            msm = 0 if required else 1
        present_should = {t for t in should_t if self.df(t)}
        if msm > len(present_should):
            return []
        if not required and not any(self.df(t) for t in scored):
            return []
        hits: list[tuple[int, float]] = []
        for doc_id, toks in self._toks.items():
            tokset = set(toks)
            if not required <= tokset:
                continue
            if tokset & not_t:
                continue
            if msm > 0 and len(tokset & present_should) < msm:
                continue
            if not required and not (tokset & set(scored)):
                continue
            cnt = Counter(toks)
            score = 0.0
            for t in scored:  # term-ascending summation order
                if t in tokset and self.df(t):
                    score += self.idf(t) * self.conf.impact(
                        cnt[t], self.doc_lens[doc_id], self.avgdl
                    )
            hits.append((doc_id, score))
        hits.sort(key=lambda kv: (-kv[1], kv[0]))
        return hits[:k]

    def highlight_topk(
        self, query: str, k: int = 10
    ) -> list[tuple[int, float, str, int]]:
        """(doc_id, score, hl_term, hl_pos): top-k hits with the rarest
        (min df, tie term-asc) present query term and its first token
        position. Mirrors webindex.query.highlight_topk."""
        out = []
        for doc_id, score in self.topk(query, k):
            toks = self._toks[doc_id]
            present = [
                t for t in sorted(set(tokenize(query))) if self.df(t) and t in toks
            ]
            term = min(present, key=lambda t: (self.df(t), t))
            out.append((doc_id, score, term, toks.index(term)))
        return out

    def topk_phrase_slop(
        self, phrase: str, slop: int, k: int
    ) -> list[tuple[int, float]]:
        """Sloppy match_phrase: the naive per-anchor evaluation of the
        closest-assignment semantics (webindex.query._phrase_chunk_match):
        each occurrence of the first slot's term anchors a candidate match
        at adjusted position a0; every other slot i independently picks the
        occurrence minimizing (|pos-i - a0|, pos-i); match iff the chosen
        adjusted positions span <= slop; sloppy_tf = Σ 1/(1+span). Anchors
        accumulate in ascending-position order (the engine's bincount
        order) so floats match bit-for-bit."""
        terms = tokenize(phrase)
        if not terms or any(t not in self.postings for t in set(terms)):
            return []
        sum_idf = sum(self.idf(t) for t in terms)
        n = len(terms)
        scores: dict[int, float] = {}
        for doc_id, toks in self._toks.items():
            posmap: dict[str, list[int]] = {}
            for p, t in enumerate(toks):
                posmap.setdefault(t, []).append(p)
            if any(t not in posmap for t in terms):
                continue
            if n == 1:
                ptf = float(len(posmap[terms[0]]))
            else:
                ptf = 0.0
                for a0 in posmap[terms[0]]:
                    chosen = [a0]
                    for i in range(1, n):
                        cands = [p - i for p in posmap[terms[i]]]
                        chosen.append(min(cands, key=lambda a: (abs(a - a0), a)))
                    d = max(chosen) - min(chosen)
                    if d <= slop:
                        ptf += 1.0 / (1 + d)
            if ptf > 0.0:
                scores[doc_id] = sum_idf * self.conf.impact(
                    ptf, self.doc_lens[doc_id], self.avgdl
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def topk_phrase(self, phrase: str, k: int) -> list[tuple[int, float]]:
        """match_phrase (slop=0), Lucene PhraseQuery-under-BM25 semantics:
        a doc matches iff the phrase's tokens occur consecutively; tf = the
        phrase frequency, idf = Σ idf(term) over the phrase's terms with
        duplicates counted, length norm as usual. Naive token-window scan —
        this IS the oracle, O(n_docs * dl) is fine at fixture scale."""
        terms = tokenize(phrase)
        if not terms or any(t not in self.postings for t in set(terms)):
            return []
        sum_idf = sum(self.idf(t) for t in terms)
        n = len(terms)
        scores: dict[int, float] = {}
        for doc_id, toks in self._toks.items():
            ptf = sum(
                1 for i in range(len(toks) - n + 1) if toks[i : i + n] == terms
            )
            if ptf:
                scores[doc_id] = sum_idf * self.conf.impact(
                    ptf, self.doc_lens[doc_id], self.avgdl
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
