"""Relationship resolution: the reference's lookup-cascade + retry join as
declarative two-pass joins with a quarantine channel.

Reference semantics (src/nmr_FAIR_DOs/lib.py:120-274 addRelationship):
  probe targets by primary key (PID), then by alternate key
  (digitalObjectLocation); misses are parked in `future_entries`
  (lib.py:249-261) and retried once after the batch (lib.py:343-371);
  final leftovers land in the error channel (lib.py:359-371). A success
  callback writes the reverse edge (lib.py:163-169).

Spark-first: the cost-ordered in-memory cascade collapses into set-oriented
joins — pass 1 equi-join on the primary key, pass 2 joins the leftovers on
the alternate key (this IS the "retry": in a batch engine the second pass
runs after the build barrier, exactly like draining future_entries), and
whatever still misses is returned as the quarantine DataFrame instead of a
global mutable error list. Reverse edges are a union with the reversed
projection (J3) — no callbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_with_retry(
    updates: DataFrame,
    targets: DataFrame,
    primary_key: tuple[str, str],
    alternate_key: tuple[str, str],
    target_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Two-pass lookup join.

    updates:    rows carrying (primary_key[0], alternate_key[0], payload...)
    targets:    rows carrying (primary_key[1], alternate_key[1], target_cols)
    returns:    (resolved, quarantine) — resolved has updates' columns plus
                target_cols and a 'resolved_by' marker ('primary'|'alternate');
                quarantine is the untouched unresolved updates (the
                reference's error-file analogue, lib.py:387-390).
    """
    upk, tpk = primary_key
    uak, tak = alternate_key

    t_primary = targets.select(
        F.col(tpk).alias("__tkey"), *[F.col(c) for c in target_cols]
    )
    pass1 = updates.join(t_primary, updates[upk] == t_primary["__tkey"], "left")
    hit1 = pass1.filter(F.col("__tkey").isNotNull()).drop("__tkey").withColumn(
        "resolved_by", F.lit("primary")
    )
    miss1 = pass1.filter(F.col("__tkey").isNull()).select(updates.columns)

    # pass 2 — the "future_entries" drain: retry misses on the alternate key
    t_alt = targets.select(
        F.col(tak).alias("__tkey"), *[F.col(c) for c in target_cols]
    )
    pass2 = miss1.join(t_alt, miss1[uak] == t_alt["__tkey"], "left")
    hit2 = pass2.filter(F.col("__tkey").isNotNull()).drop("__tkey").withColumn(
        "resolved_by", F.lit("alternate")
    )
    quarantine = pass2.filter(F.col("__tkey").isNull()).select(updates.columns)

    return hit1.unionByName(hit2), quarantine


def bidirectional_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """J3 — reverse-edge creation as a union with the flipped projection
    (reference writes the back-edge via onSuccess callbacks,
    chemotion.py:616-646 / nmrxiv.py:929-959; declarative here)."""
    fwd = edges.select(F.col(src), F.col(dst), F.lit("forward").alias("direction"))
    rev = edges.select(
        F.col(dst).alias(src), F.col(src).alias(dst), F.lit("reverse").alias("direction")
    )
    return fwd.unionByName(rev)
