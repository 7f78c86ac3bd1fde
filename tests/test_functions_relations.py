"""F-group scalar functions + J-group relationship resolution tests."""

import pytest
from pyspark.sql import functions as F


def test_base64_roundtrip(spark):
    from webindex.functions import decode_base64, encode_base64

    df = spark.createDataFrame(
        [("hello world",), ("ümlaut ünïcode",), ("x" * 200,)], "s string"
    )
    out = df.select(
        "s", encode_base64("s").alias("b64"), decode_base64(encode_base64("s")).alias("rt")
    ).collect()
    import base64

    for r in out:
        assert r["rt"] == r["s"]
        assert r["b64"] == base64.b64encode(r["s"].encode()).decode()


def test_parse_datetime_fallback_chain(spark):
    from webindex.functions import parse_datetime

    df = spark.createDataFrame(
        [
            ("2024-03-01 10:20:30",),
            ("2024-03-01T10:20:30",),
            ("2024-03-01",),
            ("2024-03-01T10:20:30.123456",),
            ("not a date",),
            (None,),
        ],
        "s string",
    )
    got = [
        r["p"] and r["p"].isoformat()
        for r in df.select(parse_datetime("s").alias("p")).collect()
    ]
    assert got[0] == "2024-03-01T10:20:30"
    assert got[1] == "2024-03-01T10:20:30"
    assert got[2] == "2024-03-01T00:00:00"
    assert got[3] == "2024-03-01T10:20:30.123456"
    assert got[4] is None and got[5] is None  # quarantine-bound, no raise


def test_normalize_url(spark):
    from webindex.functions import normalize_url

    cases = [
        ("HTTPS://www.Example.com/Licenses/foo.HTML", "example.com/license/foo"),
        ("http://creativecommons.org/licenses/by/4.0/legalcode", "creativecommons.org/license/by/4.0"),
        ("  spaced out.json ", "spacedout"),
        ("plain/path/", "plain/path"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "s string")
    got = [r["n"] for r in df.select(normalize_url("s").alias("n")).collect()]
    assert got == [c[1] for c in cases]


def test_resolve_with_retry(spark):
    from webindex.relations import resolve_with_retry

    targets = spark.createDataFrame(
        [(1, "alpha", 100), (2, "beta", 200), (3, "gamma", 300)],
        "pid long, location string, payload int",
    )
    updates = spark.createDataFrame(
        [
            (10, 1, "nope"),      # resolves by primary
            (11, -1, "beta"),     # resolves by alternate (the retry pass)
            (12, -1, "missing"),  # quarantine
        ],
        "uid long, presumed_pid long, presumed_loc string",
    )
    resolved, quarantine = resolve_with_retry(
        updates, targets,
        primary_key=("presumed_pid", "pid"),
        alternate_key=("presumed_loc", "location"),
        target_cols=["payload"],
    )
    res = {r["uid"]: (r["payload"], r["resolved_by"]) for r in resolved.collect()}
    assert res == {10: (100, "primary"), 11: (200, "alternate")}
    q = [r["uid"] for r in quarantine.collect()]
    assert q == [12]


def test_bidirectional_edges(spark):
    from webindex.relations import bidirectional_edges

    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    out = {(r["src"], r["dst"], r["direction"]) for r in bidirectional_edges(edges).collect()}
    assert out == {
        (1, 2, "forward"), (3, 4, "forward"),
        (2, 1, "reverse"), (4, 3, "reverse"),
    }


def test_flatten_map_keys_and_json(spark):
    from webindex.functions import flatten_map_keys, to_json_str, try_parse_json

    df = spark.createDataFrame([({"a": "1", "b": "2"},)], "m map<string,string>")
    flat = df.select(flatten_map_keys("m", "parent").alias("m")).collect()[0]["m"]
    assert flat == {"parent.a": "1", "parent.b": "2"}

    j = spark.createDataFrame([('{"x": 5}',)], "s string")
    parsed = j.select(try_parse_json("s", "x int").alias("p")).collect()[0]["p"]
    assert parsed["x"] == 5
    back = j.select(to_json_str(try_parse_json("s", "x int")).alias("o")).collect()[0]["o"]
    assert back == '{"x":5}'
