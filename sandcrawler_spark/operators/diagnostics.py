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

from pyspark.sql import DataFrame, Window
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


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cap: int = 256,
    high_micronat: int = 4_500_000,
) -> DataFrame:
    """Per-document character-level Shannon entropy over the first
    `cap` characters — the classic cheap binary/compressed-content
    detector a fetch pipeline runs before handing bytes to an
    extractor (reference analog: sandcrawler gates on mimetype, but
    mislabeled gzip/PDF bodies still reach the HTML path; entropy
    catches them content-wise). Natural text plateaus ~4.2 nats;
    compressed/random streams approach ln(alphabet) and land above
    `high_micronat` -> flagged `high_entropy`.

    Same plug-in MLE + integer micro-nat discipline as
    shannon_diversity: H = ln(L) - (Σ_c cnt_c·round(1e6·ln cnt_c))/L,
    one ln per (doc, char) count row, floor division after — exact
    across engines and partitionings.

    Scale shape: the explode is HARD-CAPPED at `cap` chars/doc (a
    bounded 256x row blowup, not O(doc length)); one (doc, char)
    count shuffle with map-side partials + one doc-keyed aggregate.
    Empty docs are reported with entropy 0, not dropped.
    """
    head = F.substring(F.col(text_col), 1, cap)
    chars = (
        docs.select(F.col(id_col).alias("doc_id"), head.alias("_h"))
        .where(F.length("_h") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, length(_h)), i -> substring(_h, i, 1))")
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    ent = (
        chars.select(
            "doc_id",
            "cnt",
            (F.col("cnt") * F.round(F.log(F.col("cnt").cast("double")) * 1_000_000).cast("long"))
            .cast("long")
            .alias("_wln"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum("cnt").cast("long").alias("n_chars"),
            F.sum("_wln").cast("long").alias("_swln"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct",
            F.expr(
                "CAST(CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000) AS BIGINT)"
                " - _swln div n_chars AS BIGINT)"
            ).alias("entropy_micronat"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("entropy_micronat", F.lit(0)).cast("long").alias("entropy_micronat"),
        )
        .withColumn("high_entropy", F.col("entropy_micronat") >= F.lit(high_micronat))
    )


def token_drift(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Token-distribution drift between two crawl halves per stratum —
    the generalized Jensen–Shannon divergence with sample-size weights
    (equivalently: the mutual information I(token; side) between a
    token draw and which half it came from), in integer micro-nats.
    A template-stable stratum drifts ~0; a stratum whose vocabulary
    turned over between snapshots scores high — the dataset-drift
    number a continuous-crawl corpus card reports next to
    source_diversity.

      JSD_π = H(pooled) - (N_a·H(a) + N_b·H(b)) / N

    with every entropy the same plug-in micro-nat form as
    shannon_diversity (count·round(1e6·ln count) sums, floor div) —
    all-integer after the per-count ln rounding, engine-exact.
    Sides: doc_id parity (even = side a, odd = side b), the
    deterministic stand-in for consecutive snapshot halves.

    Scale shape: one (group, side, token) count shuffle with map-side
    partials, then group-level sums; no window, no all-pairs. Output
    is group-cardinality.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.when((F.col(id_col) % 2) == 0, F.lit("a")).otherwise(F.lit("b")).alias("side"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("grp", "side", "tok").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wln = lambda c: (  # noqa: E731
        F.col(c) * F.round(F.log(F.col(c).cast("double")) * 1_000_000).cast("long")
    ).cast("long")
    # per (grp, tok): pooled count across sides; per (grp, side): totals
    pooled = (
        counts.groupBy("grp", "tok")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select("grp", wln("cnt").alias("_wln"), "cnt")
        .groupBy("grp")
        .agg(F.sum("_wln").cast("long").alias("_pwln"))
    )
    sides = (
        counts.select("grp", "side", "cnt", wln("cnt").alias("_wln"))
        .groupBy("grp", "side")
        .agg(
            F.sum("cnt").cast("long").alias("n_side"),
            F.sum("_wln").cast("long").alias("_swln"),
        )
    )
    lnm = lambda c: F.expr(  # noqa: E731
        f"CAST(round(ln(CAST({c} AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    # H_side in micro-nats, then the weighted average via exact
    # integer sums: Σ_side (n_side · H_side) = Σ n·ln n - Σ Σ wln
    per_side = sides.select(
        "grp",
        "n_side",
        (F.col("n_side") * lnm("n_side") - F.col("_swln")).cast("long").alias("_nh"),
    )
    agg = (
        per_side.groupBy("grp")
        .agg(
            F.sum("n_side").cast("long").alias("n_tokens"),
            F.sum("_nh").cast("long").alias("_sum_nh"),
        )
        .join(pooled, "grp")
    )
    return agg.select(
        "grp",
        "n_tokens",
        F.expr(
            "CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"
            " - _pwln div n_tokens AS BIGINT)"
        ).alias("pooled_entropy_micronat"),
        F.expr("CAST(_sum_nh div n_tokens AS BIGINT)").alias("mean_side_entropy_micronat"),
        F.expr(
            "CAST((CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"
            " - _pwln div n_tokens) - _sum_nh div n_tokens AS BIGINT)"
        ).alias("jsd_micronat"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """Zipf rank–frequency fit over the corpus vocabulary: OLS slope
    of ln(freq) on ln(rank) for the top_k tokens, the one-number
    language-health diagnostic (natural text slopes ~ -1; template
    farms and boilerplate-heavy crawls flatten the head and steepen
    the tail — Zipf deviation is a standard crawl-corpus QA check
    alongside degree_distribution's power-law test).

    Integer discipline: x = round(1000·ln rank), y = round(1000·ln
    freq) (milli-nats — chosen so every OLS moment, including the r²
    numerator num², stays within DECIMAL(38,0)); then

      slope_milli = (1000·(nΣxy − ΣxΣy)) div (nΣxx − (Σx)²)
      r2_ppm      = (1e6·num²) div (den_x · den_y)

    floor-divided on DECIMAL(38,0) intermediates, quotients small
    enough for the BIGINT `div` result. Engine-exact (DuckDB replays
    with HUGEINT).

    Scale shape: one token-count shuffle with map-side partials, then
    TakeOrdered(top_k) — no global sort, no window over the full
    vocabulary; ranks are assigned on the k-row survivor set. Output
    is a single row.
    """
    counts = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(top_k)
    )
    ranked = counts.select(
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("tok")))
        .cast("long")
        .alias("rank"),
        "cnt",
    ).select(
        F.expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000) AS BIGINT)").alias("x"),
        F.expr("CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000) AS BIGINT)").alias("y"),
    )
    moms = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    return moms.select(
        "n",
        F.expr(
            f"CAST((1000 * ({d('n')} * {d('sxy')} - {d('sx')} * {d('sy')}))"
            f" div ({d('n')} * {d('sxx')} - {d('sx')} * {d('sx')}) AS BIGINT)"
        ).alias("slope_milli"),
        F.expr(
            f"CAST((1000000 * ({d('n')} * {d('sxy')} - {d('sx')} * {d('sy')})"
            f" * ({d('n')} * {d('sxy')} - {d('sx')} * {d('sy')}))"
            f" div (({d('n')} * {d('sxx')} - {d('sx')} * {d('sx')})"
            f" * ({d('n')} * {d('syy')} - {d('sy')} * {d('sy')})) AS BIGINT)"
        ).alias("r2_ppm"),
    )


WILSON_Z = 1.96  # 95% two-sided normal quantile, the published default


def wilson_domain_rollup(
    df: DataFrame,
    domain_col: str = "registered_domain",
    pass_col: str = "passed",
    z: float = WILSON_Z,
    min_docs: int = 1,
) -> DataFrame:
    """Domain-level quality triage: roll a per-document pass/fail gate
    up to registered-domain granularity and score each domain with the
    WILSON LOWER BOUND (Wilson 1927) of its pass rate — the standard
    fix for the small-sample trap where a domain with 1/1 passing
    docs outranks one with 180/200: the lower confidence bound
    penalizes thin evidence, so curation lists (RefinedWeb-style
    domain allow/deny decisions) sort by it rather than the raw rate.

      lb = (p + z^2/2n - z*sqrt((p(1-p) + z^2/4n)/n)) / (1 + z^2/n)

    Determinism: counts are exact longs; the bound is the identical
    left-to-right IEEE expression in both engines (sqrt and each
    +-*/ are correctly rounded on identical inputs), then fixed to
    integer ppm. Returns (domain, n_docs, n_pass, pass_ppm,
    wilson_lb_ppm), domains with >= min_docs docs.

    Scale shape: one domain-keyed count aggregate with map-side
    partials — domain cardinality output, no windows, no doc payload
    past the first projection."""
    agg = (
        df.select(F.col(domain_col).alias("domain"), F.col(pass_col).cast("long").alias("_p"))
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_p").cast("long").alias("n_pass"),
        )
        .filter(F.col("n_docs") >= int(min_docs))
    )
    n = F.col("n_docs")
    phat = F.col("n_pass") / n
    z2 = z * z
    num = (
        phat
        + F.lit(z2) / (2 * n)
        - F.lit(z) * F.sqrt((phat * (1 - phat) + F.lit(z2) / (4 * n)) / n)
    )
    den = F.lit(1) + F.lit(z2) / n
    return agg.select(
        "domain",
        "n_docs",
        "n_pass",
        F.round(F.col("n_pass") * 1000000 / n).cast("long").alias("pass_ppm"),
        F.round(num / den * 1000000).cast("long").alias("wilson_lb_ppm"),
    )


def wilson_rollup_oracle_sql(docs_sql: str, z: float = WILSON_Z, min_docs: int = 1) -> str:
    """DuckDB twin over a (domain, passed) relation: identical
    aggregation and the identical left-to-right Wilson expression."""
    z2 = z * z
    return f"""
WITH _w_docs AS ({docs_sql}),
_w_agg AS (
  SELECT domain,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
  FROM _w_docs GROUP BY domain
  HAVING COUNT(*) >= {int(min_docs)}
)
SELECT domain, n_docs, n_pass,
       CAST(round(n_pass * 1000000 / CAST(n_docs AS DOUBLE)) AS BIGINT) AS pass_ppm,
       CAST(round(
         ((CAST(n_pass AS DOUBLE) / n_docs) + {z2!r} / (2 * n_docs)
          - {z!r} * sqrt((((CAST(n_pass AS DOUBLE) / n_docs) * (1 - (CAST(n_pass AS DOUBLE) / n_docs))
                           + {z2!r} / (4 * n_docs)) / n_docs))
         ) / (1 + {z2!r} / n_docs) * 1000000
       ) AS BIGINT) AS wilson_lb_ppm
FROM _w_agg
""".strip()
