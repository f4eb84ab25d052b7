"""Content-defined chunking (CDC) dedupe: split every document at
content-determined boundaries and dedupe/attribute at chunk
granularity — the byte-level counterpart of paragraph_dedupe for
corpora where duplication is not line-aligned (boilerplate injected
mid-sentence, templated pages with shifted offsets). Because
boundaries depend only on a local window of the content, an insertion
near the head of a page shifts every byte after it yet leaves all
downstream chunk boundaries — and therefore the chunk hashes — intact
(the shift-resilience property fixed-size blocking lacks; LBFS/
FastCDC lineage).

Boundary rule (deterministic, engine-portable): position p (1-based,
p >= window) is a cut iff the first 16 bits of md5(text[p-window+1 ..
p]) ≡ 0 (mod divisor) — expected chunk length ≈ divisor chars. No
min/max clamp: the rule stays a pure function of the window so the
DuckDB twin replays it bit-for-bit.

Scale shape: the per-document work is a narrow Catalyst projection
(array of window hashes → boundary positions → chunk slices — single
-level higher-order functions only, no Python crossing, no explode of
per-character rows), followed by ONE shuffle keyed md5(chunk) with
map-side partial aggregation. A boilerplate chunk shared by 90% of
documents lands as count partials, never a materialized group — the
hot-key discipline of the other dedupe ops holds by construction.
A production variant would swap the per-position md5 for a gear/
rolling hash inside mapInPandas (O(bytes) instead of O(bytes·window)
hashing); the Catalyst form keeps the whole operator JVM-side and
oracle-exact, and window=16 keeps the constant small.

Reference analog: sandcrawler dedupes at whole-file SHA-1 granularity
(grobid/ingest file_meta); chunk-level identity is what that becomes
when the unit of reuse is smaller than the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """Per-document content-defined chunks: (doc_id, chunk_seq,
    chunk_md5, chunk_len). Documents shorter than `window` form a
    single chunk; empty documents yield no rows."""
    k, d = int(window), int(divisor)
    bpos = F.expr(
        f"""filter(
          CASE WHEN length({text_col}) >= {k}
               THEN transform(sequence({k}, length({text_col})),
                    p -> CASE WHEN p < length({text_col})
                               AND CAST(conv(substring(md5(substring({text_col}, p - {k} + 1, {k})), 1, 4), 16, 10) AS INT) % {d} = 0
                              THEN p END)
               ELSE CAST(array() AS ARRAY<INT>) END,
          x -> x IS NOT NULL)"""
    )
    b = F.concat(
        F.array(F.lit(0)),
        bpos.cast("array<int>"),
        F.array(F.length(F.col(text_col)).cast("int")),
    )
    chunks = F.expr(
        f"""transform(sequence(1, size(_b) - 1),
             i -> substring({text_col}, element_at(_b, i) + 1,
                            element_at(_b, i + 1) - element_at(_b, i)))"""
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col), b.alias("_b"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_seq", "chunk"))
        .filter(F.col("chunk") != "")
        .select(
            "doc_id",
            (F.col("chunk_seq") + 1).cast("long").alias("chunk_seq"),
            F.md5(F.col("chunk")).alias("chunk_md5"),
            F.length("chunk").cast("long").alias("chunk_len"),
        )
    )


def cdc_dedupe_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
    min_occurrences: int = 2,
) -> DataFrame:
    """Chunk-level duplication report: for every chunk content seen at
    least `min_occurrences` times, (chunk_md5, chunk_len,
    n_occurrences, n_docs, first_doc) — first_doc is the minimal
    (doc_id, chunk_seq) owner, the canonical attribution the
    paragraph/span dedupe ops also emit. One md5-keyed shuffle."""
    ch = cdc_chunks(df, id_col=id_col, text_col=text_col, window=window, divisor=divisor)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.min("chunk_len").alias("chunk_len"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_seq")).getField("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )
