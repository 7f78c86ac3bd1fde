"""SPDX 6-rule mapping-table resolution + map-typed record flattening."""

import pytest
from pyspark.sql import functions as F

from webindex.mapping import resolve_spdx, spdx_canon, spdx_license_table
from webindex.records import flatten_map_record, rename_flat_keys


@pytest.fixture(scope="module")
def licenses(spark):
    return spdx_license_table(spark)


def _resolve_one(spark, licenses, s):
    df = spark.createDataFrame([(1, s)], "id long, lic string")
    r = resolve_spdx(df, "lic", licenses).collect()[0]
    return r["spdx_url"], r["spdx_rule"]


def test_rule_hits_per_class(spark, licenses):
    cases = {
        # reference-URL equality (rule 1)
        "https://spdx.org/licenses/Apache-2.0.html": ("Apache-2.0", 1),
        # substring of details (rule 2) — fires before the id rule, like the
        # reference's elif chain ('mit' IS a substring of .../MIT.json)
        "MIT": ("MIT", 2),
        "gpl-2.0-only": ("GPL-2.0-only", 2),
        # seeAlso similarity with legalcode + trailing-slash noise (rule 4)
        "https://creativecommons.org/licenses/by/4.0/legalcode": ("CC-BY-4.0", 4),
        "https://opensource.org/license/mit/": ("MIT", 4),
        # name similarity with spaces/quotes (rule 5)
        'BSD 3-Clause "New" or "Revised" License': ("BSD-3-Clause", 5),
        "Mozilla Public License 2.0": ("MPL-2.0", 5),
        # referenceNumber (rule 6)
        "7": ("CC-BY-4.0", 6),
    }
    for inp, (lid, rule) in cases.items():
        url, got_rule = _resolve_one(spark, licenses, inp)
        assert url == f"https://spdx.org/licenses/{lid}.json", inp
        assert got_rule == rule, inp


def test_fallback_returns_input(spark, licenses):
    url, rule = _resolve_one(spark, licenses, "not-a-real-license")
    assert url == "not-a-real-license"
    assert rule is None


def test_first_license_in_list_order_wins(spark):
    # two licenses both match by name-canon; position decides (the reference
    # iterates the list and returns the FIRST hit, utils.py:240-274)
    lic = spdx_license_table(
        spark,
        seed=[
            (0, "AAA-1.0", "Same Name", [], 1),
            (1, "BBB-1.0", "Same Name", [], 2),
        ],
    )
    url, rule = _resolve_one(spark, lic, "same name")
    assert url == "https://spdx.org/licenses/AAA-1.0.json"
    assert rule == 5


def test_canon_normalization(spark):
    df = spark.createDataFrame(
        [("https://www.Example.org/LICENSES/foo.html/",)], "s string"
    )
    got = df.select(spdx_canon(F.col("s")).alias("c")).collect()[0]["c"]
    # lower, https/www stripped, .html stripped (all occurrences),
    # licenses->license, one trailing slash removed
    assert got == "example.org/license/foo"


def test_resolution_is_broadcast_not_fact_side(spark, licenses):
    # physical plan: the big table sees one broadcast hash join, and no
    # cartesian product touches it (rules run on distinct strings only)
    df = spark.range(1000).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("MIT"), F.lit("Apache-2.0"), F.lit("nope")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("lic"),
    )
    plan = resolve_spdx(df, "lic", licenses)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: two docs sharing a run of >= window+k-1 tokens
    share at least one fingerprint; disjoint docs share none; docs shorter
    than k tokens emit no rows; >=k but < k+window-1 emit their global min."""
    from webindex.textstats import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = k+window-1
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} trailing bits"),
            (2, f"{shared} totally different ending tokens now"),
            (3, "completely unrelated content about weather patterns today ok"),
            (4, "too few"),            # < k tokens -> no fingerprints
            (5, "one two three four five six"),  # 2 k-grams < window -> global min
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, window=4)
    by_doc: dict[int, set] = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc
    assert len(by_doc[5]) == 1


def test_flatten_and_rename(spark):
    df = spark.createDataFrame(
        [(7, {"a": [("x",), ("y",)], "b": [("z",)]})],
        "id long, rec map<string, array<struct<value string>>>",
    )
    flat = flatten_map_record(df, "id", "rec")
    got = {(r["flat_key"], r["value"]) for r in flat.collect()}
    assert got == {("a.0", "x"), ("a.1", "y"), ("b.0", "z")}

    mapping = spark.createDataFrame(
        [("a", "alpha")], "raw_key string, display_name string"
    )
    renamed = rename_flat_keys(flat, mapping)
    got = {(r["flat_key"], r["value"]) for r in renamed.collect()}
    # mapped head renamed, unmapped 'b' kept as-is
    assert got == {("alpha.0", "x"), ("alpha.1", "y"), ("b.0", "z")}
