"""Per-stratum corpus diagnostics: the dataset-card numbers a
training-data team reads before mixing sources.

Two families in one cheap pass:
  - n-gram diversity (distinct trigrams / total trigrams, ppm):
    collapses for template farms and self-repeating SEO text long
    before perplexity filters notice — the corpus-level cousin of the
    per-doc Gopher repetition gates;
  - tokenizer fertility (bytes per whitespace token, micro-units):
    scripts and boilerplate-encoding differences show up as per-source
    byte cost, the number that decides real token budgets.

Scale shape (100 TB): trigram totals per stratum are pure count aggs
with map-side partials; the DISTINCT trigram count shuffles on
(stratum, gram) — the same key family as paragraph dedupe, bounded by
corpus vocabulary per stratum, no windows, no collects. Byte/token
sums are one codegen pass.

Determinism: counts are exact longs; the two ratios are integer
fixed-point floor divisions (ppm / micro), replayed verbatim by the
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col
from sandcrawler_spark.operators.lm import _trigrams_col


def corpus_diagnostics(
    df: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-`key_col` stratum: (key, n_docs, n_tokens, n_trigrams,
    distinct_trigrams, trigram_diversity_ppm, bytes_per_token_micro).

    trigram_diversity_ppm = distinct*1e6 div total (0 for stratums
    with no trigram); bytes_per_token_micro = utf8_bytes*1e6 div
    tokens (0 when tokenless).
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(text_col).alias("_t"),
        F.octet_length(text_col).cast("long").alias("_bytes"),
        F.size(tokens_col(F.lower(F.col(text_col)))).cast("long").alias("_ntok"),
    )
    per_key = base.groupBy("key").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.sum("_bytes").cast("long").alias("_tot_bytes"),
    )
    grams = base.select("key", F.explode(_trigrams_col(F.col("_t"))).alias("g"))
    gram_stats = grams.groupBy("key").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.countDistinct("g").cast("long").alias("distinct_trigrams"),
    )
    out = per_key.join(gram_stats, "key", "left").select(
        F.col("key").alias(key_col),
        "n_docs",
        "n_tokens",
        F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce("distinct_trigrams", F.lit(0)).cast("long").alias(
            "distinct_trigrams"
        ),
        F.col("_tot_bytes").alias("_tot_bytes"),
    )
    return out.select(
        key_col,
        "n_docs",
        "n_tokens",
        "n_trigrams",
        "distinct_trigrams",
        F.when(
            F.col("n_trigrams") > 0,
            F.expr("(distinct_trigrams * CAST(1000000 AS BIGINT)) div n_trigrams"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("trigram_diversity_ppm"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(_tot_bytes * CAST(1000000 AS BIGINT)) div n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_per_token_micro"),
    )


# Mersenne prime 2^61 - 1: the modulus keeps the running checksum in
# int64 while the exact sum rides DECIMAL(38,0)/HUGEINT intermediates
_MANIFEST_MOD = 2305843009213693951


def corpus_manifest(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum dataset-version receipt: (key, n_docs, n_bytes,
    manifest_hash) where manifest_hash is an ORDER-INDEPENDENT content
    checksum — the sum of per-row 60-bit md5(id:md5(text)) digests mod
    2^61-1. Two corpus builds (different partitioning, different run
    order, resumed jobs) produce identical manifests iff they hold the
    same (id, text) multiset; any silent drop, duplicate, or mutation
    moves the hash. This is the receipt a 100 TB pipeline publishes
    per shard so downstream consumers can verify what they trained on
    without re-reading the data.

    Scale shape: one map-side hash projection + one stratum agg
    (map-side partial sums merge like any counter). Determinism: the
    row digest is integer, the sum is exact (38-digit decimal — no
    wraparound until ~10^20 rows), the final mod is one floor op;
    the DuckDB twin replays with HUGEINT.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":"), F.md5(F.col(text_col))
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rows = df.select(
        F.col(key_col).alias("key"),
        F.octet_length(text_col).cast("long").alias("_b"),
        h.alias("_h"),
    )
    return (
        rows.groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_b").cast("long").alias("n_bytes"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("_hs"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_docs",
            "n_bytes",
            F.expr(f"CAST(_hs % {_MANIFEST_MOD} AS BIGINT)").alias("manifest_hash"),
        )
    )


def borda_fuse(
    df: DataFrame,
    signal_cols: list[str],
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Rank-fusion of heterogeneous quality signals (Borda count):
    each signal contributes the document's GLOBAL rank under that
    signal, and the fused score is the rank sum — the
    scale-free way to combine a stopword-ratio quality score, an LM
    perplexity, and a repetition fraction without inventing weights
    for incomparable units (rank normalization is the standard fix;
    Aslam & Montague SIGIR'01 for the IR pedigree).

    Scale shape: a global rank is a global sort — done as one
    range-shuffle per signal through global_cumsum (rank = running
    count of 1 over the signal's total order), NEVER a single-task
    Window over the whole corpus. k signals = k range shuffles + one
    id-keyed join-up. Ties break by id, so the fusion is
    deterministic and the DuckDB twin (plain ROW_NUMBER, fine at
    oracle scale) matches rank for rank.

    Returns (id_col, <signal>_rank per signal, borda) with rank 1 =
    best (descending=True means larger signal values are better).
    """
    from sandcrawler_spark.operators.cumsum import global_cumsum

    fused = None
    for s in signal_cols:
        order = [F.col(s).desc() if descending else F.col(s).asc(), F.col(id_col).asc()]
        ranked = global_cumsum(
            df.select(id_col, s).withColumn("_one", F.lit(1).cast("long")),
            order,
            "_one",
            out_col=f"{s}_rank",
        ).select(id_col, f"{s}_rank")
        fused = ranked if fused is None else fused.join(ranked, id_col)
    borda = None
    for s in signal_cols:
        c = F.col(f"{s}_rank")
        borda = c if borda is None else borda + c
    return fused.withColumn("borda", borda.cast("long"))


def shannon_diversity(
    df: DataFrame,
    key_col: str = "source",
    group_col: str = "lang",
) -> DataFrame:
    """Per-`group_col` Shannon entropy of the `key_col` mix in integer
    micro-nats — the source-diversity number a dataset card reports
    (a stratum whose tokens all come from one template farm scores ~0;
    ln(n_keys) is the uniform ceiling, shipped alongside so the reader
    sees evenness = entropy/ceiling without float math here).

      H = ln(N) - (Σ_k cnt_k · ln(cnt_k)) / N        (plug-in MLE)

    computed as round(1e6·ln(N)) - (Σ cnt·round(1e6·ln(cnt))) div N —
    one ln per (group,key) row on identical inputs in both engines
    (the lm.py micro-nat discipline), everything after integer.

    Scale shape: one (group, key) count shuffle with map-side partials
    + one group-keyed aggregate; output is group-cardinality.
    """
    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).agg(F.count("*").cast("long").alias("cnt"))
    return (
        counts.select(
            "grp",
            "cnt",
            (F.col("cnt") * F.round(F.log(F.col("cnt").cast("double")) * 1_000_000).cast("long"))
            .cast("long")
            .alias("_wln"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_docs"),
            F.sum("_wln").cast("long").alias("_swln"),
        )
        .select(
            "grp",
            "n_keys",
            "n_docs",
            F.expr(
                "CAST(CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"
                " - _swln div n_docs AS BIGINT)"
            ).alias("entropy_micronat"),
            F.expr(
                "CAST(round(ln(CAST(n_keys AS DOUBLE)) * 1000000) AS BIGINT)"
            ).alias("ceiling_micronat"),
        )
    )
