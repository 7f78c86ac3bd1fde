"""webindex — a PySpark-native inverted-index build + BM25 top-k query engine.

Re-implements, Spark-first and from scratch, the full-text index + query
capability that the reference (kit-data-manager/nmr_FAIR-DOs) delegates to
Elasticsearch (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173
creates a mapping-less index => Lucene BM25 defaults, standard analyzer), plus
the reference's pipeline operators (dedup-merge, lookup joins, time-window
filters) and the large-scale training-data ops a 100 TB corpus needs
(near-dup detection, similarity search, text quality analysis).

Layout (SURVEY.md §7):
  schema.py    canonical StructTypes for pages / doc_stats / term_stats /
               postings / lineage
  textproc.py  extract_text + tokenize — ONE implementation shared by the
               pytest oracle and the Spark Arrow UDFs (byte-identity)
  codec.py     delta-gap + varint posting blocks, per-block max-impact
  bm25.py      BM25 config + scoring math (k1=1.2, b=0.75 Lucene defaults)
  build.py     SPIMI-style distributed index build (mapInPandas local runs ->
               salted term_hash shuffle -> sort-merge -> compressed blocks)
  query.py     top-k query path: exhaustive + block-max WAND (bounded θ-seed,
               batched query logs with per-query pruning) + the ES read
               surface: match/bool/phrase families, multi_match
               (best/most/cross_fields, bool_prefix), term-level queries,
               rescore, simple_query_string, synonyms, suggesters,
               pagination, highlighting, explain
  aggs.py      ES aggregations (terms/histogram/range/date_histogram/
               composite/top_hits, stats/percentiles/cardinality,
               significant_terms+sampler) over the shared match kernels
  streaming.py incremental ingest + tiered compaction (latest-crawl-wins,
               single-doc upsert)
  checkpoint.py lineage table (real byte metrics) + resumable build
  io.py        table-format seam: parquet today, Iceberg via one env switch
  fsutil.py    Hadoop FS helpers (works on local/HDFS/S3A alike)
  pagesgen.py  deterministic synthetic `pages` corpus (FIXTURES.md §1)
  dedup.py     exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
  simsearch.py brute-force + LSH-bucketed cosine top-k over embeddings,
               filtered kNN, RRF hybrid search (BM25 x kNN fusion)
  textstats.py language-id, quality, token counts, md5 + winnowing prints
  mapping.py   SPDX license resolver (6-rule chain over broadcast dim table)
  records.py   map-typed record flatten (dotted keys) + broadcast renames
  multimodal.py binary payload plumbing (Arrow batches; decode stubbed here)
  functions.py scalar function library (base64, datetime chain, url norm, …)
  relations.py retry/quarantine lookup joins, bidirectional edges
"""

__version__ = "0.1.0"
