"""Structured-block extraction from HTML: tables and code blocks.

Training-data pipelines treat <table> and <pre>/<code> content as
first-class modalities — tables feed structured-reasoning data, code
blocks feed code corpora, and BOTH are exactly what generic text
extraction mangles (the reference's html.py / html_ingest.py extract
running prose and drop table/code structure on the floor; trafilatura
has dedicated table handling for the same reason). This pass runs
before/alongside boilerplate_strip so the structured blocks are
captured with their geometry intact, then the remaining prose goes
down the normal quality lanes.

Scale shape: one codegen'd regexp_extract_all per kind over the html
column + posexplode — the html bytes never shuffle (block rows carry
only geometry counts and an md5 of the linearized content). Per-block
stats are per-row expressions, no grouping at all until the caller
aggregates.

Parsing honesty: this is regex block-scoping (non-greedy (?s) spans),
not an HTML5 tree builder — nested tables inside table cells scope to
the INNER close tag, the documented failure mode shared by every
regex extractor. The deterministic-subset tradeoff is the same one
functions/extract_text.py documents for prose: both engines (Java
regex, RE2) evaluate this pattern subset identically, which is what
makes the DuckDB oracle a true twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TABLE_PAT = r"(?s)<table[^>]*>.*?</table>"
PRE_PAT = r"(?s)<pre[^>]*>.*?</pre>"
_TAG_PAT = r"<[^>]+>"
_WS_PAT = r"\s+"
LANG_CLASS_PAT = r"language-([a-z0-9]+)"


def _linearized_md5(block):
    """md5 of the tag-stripped, whitespace-normalized block content."""
    txt = F.regexp_replace(block, _TAG_PAT, " ")
    txt = F.trim(F.regexp_replace(txt, _WS_PAT, " "))
    return F.md5(txt)


def html_tables(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per <table> block: (doc_id, idx, n_rows, n_cells,
    is_data_table, content_md5). idx is the 1-based block position in
    the document. is_data_table is the layout-vs-data heuristic every
    table-corpus builder applies first: >=2 rows and >=2 cells/row on
    average (single-row / single-column tables are layout scaffolding)."""
    blocks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_PAT), F.lit(0))
        ).alias("idx0", "block"),
    )
    n_rows = F.regexp_count(F.col("block"), F.lit(r"<tr[ >]")).cast("int")
    n_cells = F.regexp_count(F.col("block"), F.lit(r"<t[dh][ >]")).cast("int")
    return blocks.select(
        "doc_id",
        (F.col("idx0") + 1).cast("int").alias("idx"),
        n_rows.alias("n_rows"),
        n_cells.alias("n_cells"),
        ((n_rows >= 2) & (n_cells >= n_rows * 2)).alias("is_data_table"),
        _linearized_md5(F.col("block")).alias("content_md5"),
    )


def code_blocks(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per <pre> block: (doc_id, idx, n_lines, n_chars,
    lang_hint, content_md5). lang_hint resolution order mirrors what
    code-corpus builders do: explicit class="language-X" wins, then
    cheap content fingerprints, else 'unknown'."""
    blocks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(PRE_PAT), F.lit(0))
        ).alias("idx0", "block"),
    )
    b = F.col("block")
    cls_lang = F.regexp_extract(b, LANG_CLASS_PAT, 1)
    lang = (
        F.when(cls_lang != "", cls_lang)
        .when(b.contains("#include"), F.lit("c"))
        .when(b.contains("def ") | b.contains("import "), F.lit("python"))
        .when(b.contains("function ") | b.contains("=>"), F.lit("javascript"))
        .otherwise(F.lit("unknown"))
    )
    txt = F.regexp_replace(b, _TAG_PAT, "")
    return blocks.select(
        "doc_id",
        (F.col("idx0") + 1).cast("int").alias("idx"),
        (F.regexp_count(txt, F.lit(r"\n")) + 1).cast("int").alias("n_lines"),
        F.length(txt).cast("int").alias("n_chars"),
        lang.alias("lang_hint"),
        _linearized_md5(b).alias("content_md5"),
    )


def blocks_oracle_sql(pages_sql: str) -> str:
    """DuckDB twin of html_tables UNION code_blocks over a
    (doc_id, html) relation, unified into one schema (kind column,
    NULLs for the other kind's fields) — list_zip ordinality replays
    posexplode's 1-based idx."""
    return f"""
WITH _hb_pages AS (SELECT doc_id, html FROM ({pages_sql})),
_hb_tblz AS (
  SELECT doc_id,
         UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id,
               regexp_extract_all(html, '(?s)<table[^>]*>.*?</table>') AS arr
        FROM _hb_pages)
),
_hb_tbl AS (
  SELECT doc_id, CAST(z[2] AS INT) AS idx, z[1] AS block FROM _hb_tblz
),
_hb_tbl_stats AS (
  SELECT doc_id, idx,
         CAST(len(regexp_extract_all(block, '<tr[ >]')) AS INT) AS n_rows,
         CAST(len(regexp_extract_all(block, '<t[dh][ >]')) AS INT) AS n_cells,
         md5(trim(regexp_replace(regexp_replace(block, '<[^>]+>', ' ', 'g'),
                                 '\\s+', ' ', 'g'))) AS content_md5
  FROM _hb_tbl
),
_hb_prez AS (
  SELECT doc_id,
         UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id,
               regexp_extract_all(html, '(?s)<pre[^>]*>.*?</pre>') AS arr
        FROM _hb_pages)
),
_hb_pre AS (
  SELECT doc_id, CAST(z[2] AS INT) AS idx, z[1] AS block FROM _hb_prez
),
_hb_pre_stats AS (
  SELECT doc_id, idx,
         CAST(len(regexp_extract_all(regexp_replace(block, '<[^>]+>', '', 'g'),
                                     '\\n')) + 1 AS INT) AS n_lines,
         CAST(strlen(regexp_replace(block, '<[^>]+>', '', 'g')) AS INT) AS n_chars,
         CASE
           WHEN regexp_extract(block, 'language-([a-z0-9]+)', 1) <> ''
             THEN regexp_extract(block, 'language-([a-z0-9]+)', 1)
           WHEN contains(block, '#include') THEN 'c'
           WHEN contains(block, 'def ') OR contains(block, 'import ')
             THEN 'python'
           WHEN contains(block, 'function ') OR contains(block, '=>')
             THEN 'javascript'
           ELSE 'unknown'
         END AS lang_hint,
         md5(trim(regexp_replace(regexp_replace(block, '<[^>]+>', ' ', 'g'),
                                 '\\s+', ' ', 'g'))) AS content_md5
  FROM _hb_pre
)
SELECT doc_id, 'table' AS kind, idx, n_rows, n_cells,
       (n_rows >= 2 AND n_cells >= n_rows * 2) AS is_data_table,
       CAST(NULL AS INT) AS n_lines, CAST(NULL AS INT) AS n_chars,
       CAST(NULL AS VARCHAR) AS lang_hint, content_md5
FROM _hb_tbl_stats
UNION ALL
SELECT doc_id, 'code' AS kind, idx, CAST(NULL AS INT) AS n_rows,
       CAST(NULL AS INT) AS n_cells, CAST(NULL AS BOOLEAN) AS is_data_table,
       n_lines, n_chars, lang_hint, content_md5
FROM _hb_pre_stats
""".strip()


TR_PAT = r"(?s)<tr[^>]*>(.*?)</tr>"
CELL_PAT = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def table_markdown_rows(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Markdown-linearized table content, one output row per <tr>:
    (doc_id, idx, row_idx, n_cells, md_row) where md_row is the
    '| a | b |' pipe form — the canonical training-data rendering of
    HTML tables (what markdown-converting curation pipelines emit).
    Cell text is tag-stripped and whitespace-normalized; pipes inside
    cells are escaped so the row stays parseable. Two explode levels
    (tables, then rows), all codegen."""
    tables = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_PAT), F.lit(0))
        ).alias("tidx0", "tbl"),
    )
    rows = tables.select(
        "doc_id",
        (F.col("tidx0") + 1).cast("int").alias("idx"),
        F.posexplode(
            F.regexp_extract_all(F.col("tbl"), F.lit(TR_PAT), F.lit(1))
        ).alias("ridx0", "tr"),
    )
    cells = F.regexp_extract_all(F.col("tr"), F.lit(CELL_PAT), F.lit(1))
    clean = F.transform(
        cells,
        lambda c: F.regexp_replace(
            F.trim(F.regexp_replace(F.regexp_replace(c, _TAG_PAT, " "), _WS_PAT, " ")),
            r"\|", "\\\\|",
        ),
    )
    return rows.select(
        "doc_id", "idx",
        (F.col("ridx0") + 1).cast("int").alias("row_idx"),
        F.size(clean).cast("int").alias("n_cells"),
        F.concat(F.lit("| "), F.array_join(clean, " | "), F.lit(" |")).alias("md_row"),
    )


def table_markdown_oracle_sql(pages_sql: str) -> str:
    """DuckDB twin of table_markdown_rows (nested list_zip ordinality
    for the two posexplode levels)."""
    return f"""
WITH _tm_pages AS (SELECT doc_id, html FROM ({pages_sql})),
_tm_tblz AS (
  SELECT doc_id, UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id,
               regexp_extract_all(html, '(?s)<table[^>]*>.*?</table>') AS arr
        FROM _tm_pages)
),
_tm_tbl AS (SELECT doc_id, CAST(z[2] AS INT) AS idx, z[1] AS tbl FROM _tm_tblz),
_tm_rowz AS (
  SELECT doc_id, idx, UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id, idx,
               regexp_extract_all(tbl, '(?s)<tr[^>]*>(.*?)</tr>', 1) AS arr
        FROM _tm_tbl)
),
_tm_rows AS (
  SELECT doc_id, idx, CAST(z[2] AS INT) AS row_idx, z[1] AS tr FROM _tm_rowz
),
_tm_cells AS (
  SELECT doc_id, idx, row_idx,
         list_transform(
           regexp_extract_all(tr, '(?s)<t[dh][^>]*>(.*?)</t[dh]>', 1),
           c -> regexp_replace(
                  trim(regexp_replace(regexp_replace(c, '<[^>]+>', ' ', 'g'),
                                      '\\s+', ' ', 'g')),
                  '\\|', '\\\\|', 'g')
         ) AS cells
  FROM _tm_rows
)
SELECT doc_id, idx, row_idx,
       CAST(len(cells) AS INT) AS n_cells,
       '| ' || array_to_string(cells, ' | ') || ' |' AS md_row
FROM _tm_cells
""".strip()
