"""BM25 configuration + scoring math.

The reference's ranking semantics are Lucene BM25 defaults because it creates
its Elasticsearch index with no mapping (reference:
src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173) and queries it with
multi_match best_fields (elasticsearch.py:250-262):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    k1 = 1.2, b = 0.75

Determinism rules (must match tests/oracle.py exactly):
  * all math in float64,
  * per-doc score = sum of per-term contributions in TERM-ASCENDING order
    (fixes float summation order across any partitioning),
  * ties broken by doc_id ascending.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75
    block_size: int = 128
    # Store doc_lens as 1-byte Lucene-style norm codes (codec.dl_quantize)
    # instead of exact varints. Lucene/ES itself quantizes norms this way;
    # default False keeps exact lengths so results hash-match the DuckDB/
    # pure-Python oracles bit-for-bit. An index must be queried with the
    # same flag it was built with (persisted by build_index's conf sidecar).
    quantize_norms: bool = False

    def idf(self, df: int, n_docs: int) -> float:
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def impact(self, tf: float, dl: float, avgdl: float) -> float:
        return tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl))

    def score_one(self, tf: float, df: int, dl: float, n_docs: int, avgdl: float) -> float:
        return self.idf(df, n_docs) * self.impact(tf, dl, avgdl)


DEFAULT = BM25Config()

# SQL fragment for idf, reused by __spark_entry__ oracle SQL and Spark exprs.
IDF_SQL = "ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
IMPACT_SQL = "({tf} / ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl})))"
