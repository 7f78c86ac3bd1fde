"""Seeded broadcast mapping tables: the SPDX license resolver (F5/J5).

The reference resolves free-form license strings (names, URLs, SPDX ids,
reference numbers) against the fetched SPDX license list with a 6-rule match
chain (reference: src/nmr_FAIR_DOs/utils.py:214-278 parseSPDXLicenseURL) and
a text-similarity normalizer (utils.py:281-340 checkTextIsSimilar), caching
hits per input string. The Spark-first re-expression:

  * the license list is a SMALL dimension table -> F.broadcast join;
  * the per-string cache becomes "resolve DISTINCT strings, then broadcast
    the resolution back onto the fact rows" — at 100 TB the distinct license
    strings are thousands while the rows are billions, so the 6-rule chain
    runs on the tiny side and the big table sees one broadcast equi-join;
  * the reference iterates licenses in LIST ORDER and returns the first one
    where any rule fires -> winner = min(position) over matching licenses.

Rules, in the reference's elif order (per license):
  1  input == reference-URL          (case-insensitive equality)
  2  input substring-of details-URL  (case-insensitive)
  3  input == licenseId              (case-insensitive equality)
  4  canon(input) == canon(any seeAlso URL)
  5  canon(input) == canon(name)
  6  input == str(referenceNumber)

canon() is checkTextIsSimilar's normalization: lower; strip spaces,
http(s)://, www., 'legalcode', the extensions .json/.html/.txt/.md/.xml/.rdf
(ALL occurrences, like str.replace); 'licenses'->'license'; one trailing '/'.
Unmatched inputs fall back to the input string itself (utils.py:276-278).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SPDX_BASE_URL = "https://spdx.org/licenses"

# Deterministic seed of the SPDX license list (public spdx.org data; in
# production this table is loaded from licenses.json — the reference fetches
# it per run, utils.py:236-239). position = list order; reference_number is
# the SPDX referenceNumber analogue.
SPDX_SEED = [
    # (position, license_id, name, see_also, reference_number)
    (0, "MIT", "MIT License", ["https://opensource.org/license/mit/"], 1),
    (1, "Apache-2.0", "Apache License 2.0",
     ["https://www.apache.org/licenses/LICENSE-2.0",
      "https://opensource.org/licenses/Apache-2.0"], 2),
    (2, "GPL-3.0-only", "GNU General Public License v3.0 only",
     ["https://www.gnu.org/licenses/gpl-3.0-standalone.html"], 3),
    (3, "GPL-2.0-only", "GNU General Public License v2.0 only",
     ["https://www.gnu.org/licenses/old-licenses/gpl-2.0-standalone.html"], 4),
    (4, "BSD-3-Clause", "BSD 3-Clause \"New\" or \"Revised\" License",
     ["https://opensource.org/licenses/BSD-3-Clause"], 5),
    (5, "BSD-2-Clause", "BSD 2-Clause \"Simplified\" License",
     ["https://opensource.org/licenses/BSD-2-Clause"], 6),
    (6, "CC-BY-4.0", "Creative Commons Attribution 4.0 International",
     ["https://creativecommons.org/licenses/by/4.0/legalcode"], 7),
    (7, "CC-BY-SA-4.0", "Creative Commons Attribution Share Alike 4.0 International",
     ["https://creativecommons.org/licenses/by-sa/4.0/legalcode"], 8),
    (8, "CC0-1.0", "Creative Commons Zero v1.0 Universal",
     ["https://creativecommons.org/publicdomain/zero/1.0/legalcode"], 9),
    (9, "LGPL-3.0-only", "GNU Lesser General Public License v3.0 only",
     ["https://www.gnu.org/licenses/lgpl-3.0-standalone.html"], 10),
    (10, "MPL-2.0", "Mozilla Public License 2.0",
     ["https://www.mozilla.org/MPL/2.0/"], 11),
    (11, "EPL-2.0", "Eclipse Public License 2.0",
     ["https://www.eclipse.org/legal/epl-2.0"], 12),
]

# canon(): str.replace patterns in the reference's exact order
_CANON_STRIP = [
    " ", "https://", "http://", "www.", "legalcode",
    ".json", ".html", ".txt", ".md", ".xml", ".rdf",
]


def spdx_canon(col: F.Column) -> F.Column:
    """checkTextIsSimilar's normalization as a column expression."""
    out = F.lower(col)
    for pat in _CANON_STRIP:
        out = F.replace(out, F.lit(pat), F.lit(""))
    out = F.replace(out, F.lit("licenses"), F.lit("license"))
    return F.regexp_replace(out, "/$", "")


def spdx_license_table(spark: SparkSession, seed=None) -> DataFrame:
    """The license dimension table. reference/details URLs are derived from
    the id exactly like spdx.org lays them out (utils.py:241 builds
    '{base}/{licenseId}.json')."""
    rows = [
        (
            pos,
            lid,
            f"{SPDX_BASE_URL}/{lid}.html",   # 'reference' field
            f"{SPDX_BASE_URL}/{lid}.json",   # 'details' field
            name,
            see_also,
            refno,
        )
        for (pos, lid, name, see_also, refno) in (seed or SPDX_SEED)
    ]
    return spark.createDataFrame(
        rows,
        "position int, license_id string, reference string, details string, "
        "name string, see_also array<string>, reference_number int",
    )


def _match_rule(inp: F.Column, lic_prefix: str = "") -> F.Column:
    """First matching rule number (1-6) for (input, license) or NULL."""
    p = lic_prefix
    li = F.lower(inp)
    canon_in = spdx_canon(inp)
    return (
        F.when(li == F.lower(F.col(f"{p}reference")), 1)
        .when(F.contains(F.lower(F.col(f"{p}details")), li), 2)
        .when(li == F.lower(F.col(f"{p}license_id")), 3)
        .when(
            F.exists(F.col(f"{p}see_also"), lambda x: spdx_canon(x) == canon_in), 4
        )
        .when(spdx_canon(F.col(f"{p}name")) == canon_in, 5)
        .when(inp == F.col(f"{p}reference_number").cast("string"), 6)
    )


def resolve_spdx(
    df: DataFrame,
    input_col: str,
    licenses: DataFrame,
    *,
    out_col: str = "spdx_url",
) -> DataFrame:
    """Resolve a license-string column to its SPDX URL via the 6-rule chain.

    Adds `out_col` (the '{base}/{id}.json' URL, or the raw input when no
    license matches) plus `spdx_rule` (1-6, NULL on fallback). Physical plan:
    distinct-strings x broadcast(licenses) on the tiny side, then ONE
    broadcast equi-join onto `df` — no rule evaluation on the fact table."""
    vals = df.select(F.col(input_col).alias("_in")).distinct()
    m = (
        vals.crossJoin(F.broadcast(licenses))
        .withColumn("_rule", _match_rule(F.col("_in")))
        .filter(F.col("_rule").isNotNull())
    )
    w = Window.partitionBy("_in").orderBy(F.asc("position"))
    mapping = (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "_in",
            F.concat(
                F.lit(f"{SPDX_BASE_URL}/"), F.col("license_id"), F.lit(".json")
            ).alias("_url"),
            F.col("_rule").alias("spdx_rule"),
        )
    )
    joined = df.join(
        F.broadcast(mapping), df[input_col] == mapping["_in"], "left"
    ).drop("_in")
    return joined.withColumn(
        out_col, F.coalesce(F.col("_url"), F.col(input_col))
    ).drop("_url")
