"""TextRank keyword extraction (Mihalcea & Tarau 2004) — per-document
PageRank over the word co-occurrence graph, in exact integer
fixed-point arithmetic with a fixed, unrolled iteration count.

Why per-doc graph PageRank when tfidf_keywords already exists: TF-IDF
ranks words by corpus-contrast, TextRank by intra-document centrality
— the two disagree exactly on documents whose salient words are
globally common ("bank" in a finance corpus), and keyword-driven
corpus curation (topic sampling, anchor generation) wants both
signals. The reference has no keyword stage; this is a §2.10
beyond-reference training-data operator.

Determinism discipline (same as linkgraph.host_pagerank's fixed-point
PageRank): ranks are integers in units of 1/TR_SCALE, damping is the
rational 17/20, every division is floor `div` — so the ranking is
bit-identical across engines/partitionings, and the DuckDB twin
(textrank_oracle_sql) replays it verbatim. Two iterations from the
uniform init are unrolled as plain joins (no driver loop, no scalar
collects — unlike host PageRank there is no dangling mass: the graph
is undirected, so every ranked node has out-edges by construction).

Scale shape: tokenize+filter is codegen; the only per-doc window is
the lead() adjacency build, bounded by document length (the same
shape span_dedupe/winnow use); edges aggregate with map-side combine
on (doc_id, src, dst); both rank iterations are equi-joins keyed
(doc_id, word) — nothing global, no skew beyond document length,
embarrassingly partitionable by doc_id at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import EN_STOPWORDS, tokens_col

TR_SCALE = 1_000_000
TR_NUM = 17  # damping 17/20 = 0.85
TR_DEN = 20
TR_BASE = (TR_SCALE * (TR_DEN - TR_NUM)) // TR_DEN  # (1-d) term


def _cooc_edges(
    df: DataFrame, id_col: str, text_col: str, min_len: int,
    exclude: tuple[str, ...],
) -> DataFrame:
    """Undirected (emitted both ways) adjacency over the
    stopword-filtered token sequence, weighted by co-occurrence count:
    (doc_id, src, dst, w)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col)))).alias("p", "w"),
    )
    kept = toks.filter(
        (F.length("w") >= min_len) & ~F.col("w").isin(*exclude)
    )
    nxt = F.lead("w").over(Window.partitionBy("doc_id").orderBy("p"))
    bi = kept.select("doc_id", F.col("w").alias("a"), nxt.alias("b")).filter(
        F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    both = bi.select("doc_id", F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        bi.select("doc_id", F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return both.groupBy("doc_id", "src", "dst").agg(
        F.count("*").cast("long").alias("w")
    )


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    min_len: int = 3,
    exclude: tuple[str, ...] = EN_STOPWORDS,
) -> DataFrame:
    """Top-k keywords per document by 2-iteration fixed-point
    TextRank: (doc_id, word, rank_micro, rk). Deterministic tie-break
    rank desc, word asc."""
    e = _cooc_edges(df, id_col, text_col, min_len, exclude)
    outw = e.groupBy("doc_id", "src").agg(F.sum("w").cast("long").alias("outw"))
    ew = e.join(outw, on=["doc_id", "src"])

    # iteration 1 from uniform r0 = TR_SCALE
    r1 = ew.groupBy("doc_id", F.col("dst").alias("word")).agg(
        (F.lit(TR_BASE) + F.sum(
            F.expr(f"(CAST({TR_SCALE} AS BIGINT) * {TR_NUM} * w) div ({TR_DEN} * outw)")
        )).cast("long").alias("r1")
    )
    # iteration 2: pull r1 of the SOURCE along each edge
    r2 = (
        ew.join(
            r1.select("doc_id", F.col("word").alias("src"), "r1"),
            on=["doc_id", "src"],
        )
        .groupBy("doc_id", F.col("dst").alias("word"))
        .agg(
            (F.lit(TR_BASE) + F.sum(
                F.expr(f"(r1 * CAST({TR_NUM} AS BIGINT) * w) div ({TR_DEN} * outw)")
            )).cast("long").alias("rank_micro")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("rank_micro").desc(), F.col("word").asc()
    )
    return (
        r2.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "word", "rank_micro", "rk")
    )


def textrank_oracle_sql(
    docs_sql: str,
    top_k: int = 3,
    min_len: int = 3,
    exclude: tuple[str, ...] = EN_STOPWORDS,
) -> str:
    """DuckDB twin: same tokenization, same integer fixed-point
    two-iteration unroll, same tie-break."""
    stop = ", ".join("'" + s + "'" for s in exclude)
    return f"""
WITH _tr_docs AS (SELECT doc_id, text FROM ({docs_sql})),
_tr_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _tr_docs
),
_tr_pos AS (
  SELECT doc_id, UNNEST(range(1, len(toks) + 1)) AS p, toks
  FROM _tr_tok WHERE len(toks) >= 1
),
_tr_kept AS (
  SELECT doc_id, p, toks[p] AS w FROM _tr_pos
  WHERE strlen(toks[p]) >= {min_len} AND toks[p] NOT IN ({stop})
),
_tr_seq AS (
  SELECT doc_id, w, lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS nxt
  FROM _tr_kept
),
_tr_bi AS (
  SELECT doc_id, w AS a, nxt AS b FROM _tr_seq
  WHERE nxt IS NOT NULL AND w <> nxt
),
_tr_e AS (
  SELECT doc_id, src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
    SELECT doc_id, a AS src, b AS dst FROM _tr_bi
    UNION ALL
    SELECT doc_id, b AS src, a AS dst FROM _tr_bi
  ) GROUP BY doc_id, src, dst
),
_tr_outw AS (
  SELECT doc_id, src, CAST(SUM(w) AS BIGINT) AS outw
  FROM _tr_e GROUP BY doc_id, src
),
_tr_ew AS (
  SELECT e.doc_id, e.src, e.dst, e.w, o.outw
  FROM _tr_e e JOIN _tr_outw o ON e.doc_id = o.doc_id AND e.src = o.src
),
_tr_r1 AS (
  SELECT doc_id, dst AS word,
         CAST({TR_BASE} + SUM((CAST({TR_SCALE} AS BIGINT) * {TR_NUM} * w)
                              // ({TR_DEN} * outw)) AS BIGINT) AS r1
  FROM _tr_ew GROUP BY doc_id, dst
),
_tr_r2 AS (
  SELECT ew.doc_id, ew.dst AS word,
         CAST({TR_BASE} + SUM((r.r1 * CAST({TR_NUM} AS BIGINT) * ew.w)
                              // ({TR_DEN} * ew.outw)) AS BIGINT) AS rank_micro
  FROM _tr_ew ew
  JOIN _tr_r1 r ON r.doc_id = ew.doc_id AND r.word = ew.src
  GROUP BY ew.doc_id, ew.dst
)
SELECT doc_id, word, rank_micro, CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY rank_micro DESC, word ASC
  ) AS rk
  FROM _tr_r2
)
WHERE rk <= {top_k}
""".strip()
