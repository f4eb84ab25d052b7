"""Schema.org JSON-LD extraction from HTML — the third metadata
channel next to <meta> tags (functions/biblio.py, htmlstats.py) and
TEI/GROBID hooks.

The reference's html_metadata.py mines citation_* / DC / prism meta
tags; modern publishers increasingly ship the same bibliographic
record as a <script type="application/ld+json"> ScholarlyArticle /
NewsArticle block instead (Google Scholar's other ingestion path).
A crawl that only reads meta tags loses those pages' metadata; this
pass recovers it with engine-native JSON path evaluation — Spark's
get_json_object / DuckDB's json_extract_string — no Python crossing.

Shape-tolerance the schema.org wild west requires (handled by
coalesce over both forms, identically in both engines):
- author as object {"name": X} vs array [{"name": X}, ...];
- issn at $.isPartOf.issn (the spec'd place) vs top-level $.issn.

Malformed JSON (tag soup truncation) yields NULL fields: Spark's
get_json_object is null-on-invalid natively; the oracle twin guards
with json_valid() to match (DuckDB's extractor throws otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JSONLD_PAT = r'(?s)<script type="application/ld\+json">(.*?)</script>'


def extract_jsonld(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per JSON-LD block: (doc_id, idx, jtype, headline,
    date_published, author_name, issn) — NULLs where the block lacks
    the field or is malformed."""
    blocks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_PAT), F.lit(1))
        ).alias("idx0", "j"),
    )
    j = F.col("j")
    return blocks.select(
        "doc_id",
        (F.col("idx0") + 1).cast("int").alias("idx"),
        F.get_json_object(j, "$.@type").alias("jtype"),
        F.get_json_object(j, "$.headline").alias("headline"),
        F.get_json_object(j, "$.datePublished").alias("date_published"),
        F.coalesce(
            F.get_json_object(j, "$.author.name"),
            F.get_json_object(j, "$.author[0].name"),
        ).alias("author_name"),
        F.coalesce(
            F.get_json_object(j, "$.isPartOf.issn"),
            F.get_json_object(j, "$.issn"),
        ).alias("issn"),
    )


def jsonld_oracle_sql(pages_sql: str) -> str:
    """DuckDB twin over a (doc_id, html) relation. Paths spelled in
    DuckDB syntax ($."@type" for the @-key) with json_valid() guards
    replicating Spark's null-on-invalid."""

    def g(path: str) -> str:
        return (
            f"CASE WHEN json_valid(j) "
            f"THEN json_extract_string(j::JSON, '{path}') END"
        )

    return f"""
WITH _jl_pages AS (SELECT doc_id, html FROM ({pages_sql})),
_jl_blockz AS (
  SELECT doc_id, UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id,
               regexp_extract_all(html,
                 '(?s)<script type="application/ld\\+json">(.*?)</script>', 1) AS arr
        FROM _jl_pages)
),
_jl_blocks AS (
  SELECT doc_id, CAST(z[2] AS INT) AS idx, z[1] AS j FROM _jl_blockz
)
SELECT doc_id, idx,
       {g('$."@type"')} AS jtype,
       {g('$.headline')} AS headline,
       {g('$.datePublished')} AS date_published,
       COALESCE({g('$.author.name')}, {g('$.author[0].name')}) AS author_name,
       COALESCE({g('$.isPartOf.issn')}, {g('$.issn')}) AS issn
FROM _jl_blocks
""".strip()
