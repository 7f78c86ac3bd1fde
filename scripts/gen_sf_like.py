"""Generate an sf1.0-SHAPED measurement dataset (documents + embeddings).

The driver's own sf1.0 tables are generated outside this repo; for local
measurement beyond the committed /root/testdata/sf0.1 we synthesize a dir
with the same schemas and the same statistical shape, 10x the rows:

  documents: 50k rows, ~30-word near-uniform vocabulary, doc length
             Uniform(10,100), 5 cyclic langs, 20 sources, ~5%% of docs
             carry the rare 'dup' token, ~0.3%% exact-duplicate pairs
  embeddings: 20k rows, dim=64, unit-norm gaussian, labels 0..9

Deterministic (seed=42). Usage:
    python scripts/gen_sf_like.py /tmp/sf1.0like [n_docs] [n_vecs]

This is a measurement harness only — bench numbers from this dir are
cited as "sf1.0-shaped" in OPTIMIZATION_r06.md, never as driver numbers.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "table", "customer", "vector", "join",
    "shuffle", "merge", "index", "block", "range",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0like"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    import os

    rng = np.random.default_rng(42)
    texts = []
    for i in range(n_docs):
        ln = int(rng.integers(10, 101))
        toks = list(rng.choice(VOCAB, size=ln))
        if rng.random() < 0.05:
            toks[int(rng.integers(0, ln))] = "dup"
        texts.append(" ".join(toks))
    # ~0.3% exact-duplicate pairs: doc 2j+1 copies doc 2j for a few j
    for j in range(0, int(n_docs * 0.003) * 2, 2):
        texts[j + 1] = texts[j]
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                [["en", "de", "es", "fr", "zh"][i % 5] for i in range(n_docs)]
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    M = rng.standard_normal((n_vecs, 64))
    M = (M / np.linalg.norm(M, axis=1, keepdims=True)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array([row for row in M.tolist()],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(n_vecs)], type=pa.int32()),
        }
    )
    os.makedirs(f"{out}/documents.parquet", exist_ok=True)
    os.makedirs(f"{out}/embeddings.parquet", exist_ok=True)
    pq.write_table(docs, f"{out}/documents.parquet/part-0.parquet")
    pq.write_table(emb, f"{out}/embeddings.parquet/part-0.parquet")
    print(f"wrote {n_docs} docs / {n_vecs} vecs to {out}")


if __name__ == "__main__":
    main()
