"""Map-typed record model: dotted-key flattening + display-name renames.

The reference's document is a PID record  map<string, array<entry>>
(reference: src/nmr_FAIR_DOs/domain/pid_record.py:28-39 — attribute key ->
list of PIDRecordEntry values); its Elasticsearch indexer flattens that map
into dotted/suffixed field names (src/nmr_FAIR_DOs/connectors/
elasticsearch.py:94-113), and attribute keys are renamed to human-readable
names via the data-type registry (src/nmr_FAIR_DOs/domain/dataType.py:29-65
— a cached key->name mapping, i.e. a broadcast dimension).

Spark-first: the record column is a real MapType(String, Array(Struct));
flattening is explode + posexplode (pure JVM generators, no UDF), and the
rename is a broadcast equi-join on the key's head segment — unmapped keys
keep their raw name, mirroring the registry fallback."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flatten_map_record(
    df: DataFrame, id_col: str, map_col: str, value_field: str = "value"
) -> DataFrame:
    """map<string, array<struct>> -> (id, flat_key, value) rows with dotted
    keys  'attr.N'  (N = position in the attribute's entry list). Generator
    expressions only — scales as a narrow per-row transform, no shuffle."""
    e = df.select(F.col(id_col), F.explode(F.col(map_col)).alias("_key", "_entries"))
    p = e.select(
        F.col(id_col),
        "_key",
        F.posexplode("_entries").alias("_idx", "_entry"),
    )
    return p.select(
        F.col(id_col),
        F.concat_ws(".", F.col("_key"), F.col("_idx").cast("string")).alias("flat_key"),
        F.col(f"_entry.{value_field}").alias("value"),
    )


def rename_flat_keys(
    flat: DataFrame, mapping: DataFrame, key_col: str = "flat_key"
) -> DataFrame:
    """Rename the head segment of dotted keys via a broadcast mapping table
    (raw_key, display_name); keys without a mapping keep their raw head.
    Output replaces `key_col` with the renamed dotted key."""
    head = F.substring_index(F.col(key_col), ".", 1)
    tail = F.expr(f"substring({key_col}, length(substring_index({key_col}, '.', 1)) + 2)")
    withparts = flat.withColumn("_head", head).withColumn("_tail", tail)
    joined = withparts.join(
        F.broadcast(mapping), withparts["_head"] == mapping["raw_key"], "left"
    )
    renamed = F.concat_ws(
        ".", F.coalesce(F.col("display_name"), F.col("_head")), F.col("_tail")
    )
    return joined.withColumn(key_col, renamed).drop(
        "_head", "_tail", "raw_key", "display_name"
    )
