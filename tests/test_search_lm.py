"""Retrieval (inverted index + BM25) and n-gram LM perplexity scoring,
plus the bucketed co-located join layout."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------

def test_build_postings_tf_and_df(spark):
    from sandcrawler_spark.operators.search import build_postings

    df = spark.createDataFrame(
        [
            (1, "spark shuffle spark join"),
            (2, "join order join"),
            (3, "spark"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r.term, r.doc_id): r for r in build_postings(df).collect()}
    assert rows[("spark", 1)].tf == 2 and rows[("spark", 1)].first_pos == 0
    assert rows[("join", 2)].tf == 2 and rows[("join", 2)].first_pos == 0
    assert rows[("join", 1)].tf == 1 and rows[("join", 1)].first_pos == 3
    # doc_freq is corpus-wide per term
    assert rows[("spark", 1)].doc_freq == 2 and rows[("spark", 3)].doc_freq == 2
    assert rows[("order", 2)].doc_freq == 1
    # min_doc_freq prunes hapax terms
    pruned = {r.term for r in build_postings(df, min_doc_freq=2).collect()}
    assert pruned == {"spark", "join"}


def test_bm25_ranks_tf_over_length(spark):
    from sandcrawler_spark.operators.search import BM25_B, BM25_K1, bm25_topk

    df = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),          # high tf for 'cat'
            (2, "cat filler filler filler filler filler filler filler"),
            (3, "dog dog"),
            (4, "nothing relevant here"),
        ],
        ["doc_id", "text"],
    )
    got = bm25_topk(df, ["cat"], k=3).collect()
    assert [r.doc_id for r in got] == [1, 2]  # doc 4/3 never hit
    assert got[0].rank == 1 and got[1].rank == 2
    assert got[0].score_micro > got[1].score_micro

    # exact replay of the doc-1 score in python
    n_docs, df_cat, tf1, dl1 = 4, 2, 3, 4
    avgdl = (4 + 8 + 2 + 3) / n_docs
    idf = math.log((n_docs - df_cat + 0.5) / (df_cat + 0.5) + 1.0)
    denom = tf1 + BM25_K1 * (1 - BM25_B + BM25_B * dl1 / avgdl)
    want = round(idf * tf1 * (BM25_K1 + 1) / denom * 1_000_000)
    assert got[0].score_micro == want


def test_bm25_accepts_terms_dataframe_and_multi_term(spark):
    from sandcrawler_spark.operators.search import bm25_topk, top_terms

    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha"),
            (2, "beta gamma"),
            (3, "alpha delta delta"),
        ],
        ["doc_id", "text"],
    )
    qt = top_terms(df, n=2)  # alpha(4) beta(3)
    assert {r.term for r in qt.collect()} == {"alpha", "beta"}
    got = {r.doc_id: r for r in bm25_topk(df, qt, k=10).collect()}
    assert got[1].n_terms_hit == 2  # doc 1 hits both terms
    assert got[2].n_terms_hit == 1 and got[3].n_terms_hit == 1
    assert got[1].score_micro > got[2].score_micro


def test_bm25_duckdb_twin_parity(spark, tmp_path):
    import duckdb

    from sandcrawler_spark.operators.search import bm25_oracle_sql, bm25_topk

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 7).cast("string"),
            F.lit(" w"), (F.col("id") % 3).cast("string"),
            F.lit(" w"), (F.col("id") % 5).cast("string"),
            F.lit(" filler"),
        ).alias("text"),
    )
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    terms = ["w1", "w2"]
    got = {
        (r.doc_id, r.rank): (r.n_terms_hit, r.score_micro)
        for r in bm25_topk(spark.read.parquet(p), terms, k=10).collect()
    }
    sql = bm25_oracle_sql(
        f"SELECT doc_id, text FROM '{p}/*.parquet'",
        "SELECT 'w1' AS term UNION ALL SELECT 'w2'",
        k=10,
    )
    want = {
        (r[0], r[3]): (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------

def test_lm_score_known_value(spark):
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], ["doc_id", "text"]
    )
    bi, uni, vocab = train_bigram_lm(df)
    got = {r.doc_id: r for r in lm_score_docs(df, bi, uni, vocab).collect()}
    # corpus: unigrams a:3 b:3 c:1 (V=3); bigrams 'a b':3, 'b a':1
    p_ab = (3 + 1) / (3 + 3)  # (c12+k)/(c1+kV)
    p_ba = (1 + 1) / (3 + 3)
    m_ab = round(math.log(p_ab) * 1_000_000)
    m_ba = round(math.log(p_ba) * 1_000_000)
    assert got[1].n_bigrams == 3 and got[1].logprob_micronat == 2 * m_ab + m_ba
    assert got[2].n_bigrams == 1 and got[2].logprob_micronat == m_ab
    assert got[3].n_bigrams == 0 and got[3].logprob_micronat == 0


def test_lm_flags_gibberish_below_fluent(spark):
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm

    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    gibber = [(100, "dog the over quick lazy fox brown jumps the")]
    df = spark.createDataFrame(fluent + gibber, ["doc_id", "text"])
    bi, uni, vocab = train_bigram_lm(df)
    got = {r.doc_id: r for r in lm_score_docs(df, bi, uni, vocab).collect()}
    per_bg_fluent = got[0].logprob_micronat / got[0].n_bigrams
    per_bg_gibber = got[100].logprob_micronat / got[100].n_bigrams
    assert per_bg_gibber < per_bg_fluent  # less probable per bigram


def test_lm_duckdb_twin_parity(spark, tmp_path):
    import duckdb

    from sandcrawler_spark.operators.lm import (
        lm_oracle_sql,
        lm_score_docs,
        train_bigram_lm,
    )

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("t"), (F.col("id") % 5).cast("string"),
            F.lit(" t"), ((F.col("id") + 1) % 5).cast("string"),
            F.lit(" t"), ((F.col("id") * 3) % 7).cast("string"),
            F.when(F.col("id") % 4 == 0, F.lit(" end")).otherwise(F.lit("")),
        ).alias("text"),
    )
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    sdf = spark.read.parquet(p)
    bi, uni, vocab = train_bigram_lm(sdf)
    got = {
        r.doc_id: (r.n_bigrams, r.logprob_micronat)
        for r in lm_score_docs(sdf, bi, uni, vocab).collect()
    }
    sql = lm_oracle_sql(f"SELECT doc_id, text FROM '{p}/*.parquet'")
    want = {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------

def test_bucketed_join_elides_exchange(spark, tmp_path):
    from sandcrawler_spark.plans.bucketed import (
        bucketed_join,
        executed_plan_string,
        write_bucketed,
    )

    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(left, "bkt_left", str(tmp_path / "l"), "k", n_buckets=8)
    write_bucketed(right, "bkt_right", str(tmp_path / "r"), "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # small fixture would broadcast (which also disables the bucketed
    # scan); at the sizes bucketing exists for, SMJ is the planner's
    # own choice — force it here
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bkt_left", "bkt_right", on="k")
        plan = executed_plan_string(j)
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert "SortMergeJoin" in plan
        # values match the plain (shuffled) join
        plain = left.join(right, on="k")
        assert j.exceptAll(plain).isEmpty() and plain.exceptAll(j).isEmpty()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


# ---------------------------------------------------------------------------
# BPE vocabulary learning
# ---------------------------------------------------------------------------

def test_bpe_learn_known_merges(spark):
    from sandcrawler_spark.operators.bpe import bpe_learn, bpe_segment

    # corpus: 'aaab' x3, 'ab' x2
    df = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], ["doc_id", "text"]
    )
    got = [(r.round, r.a, r.b, r.pair_count) for r in bpe_learn(df, k=3).collect()]
    # r1: (a,a) 6 beats (a,b) 5; r2: (a,b) 5; r3: (aa,ab) 3
    assert got == [(1, "a", "a", 6), (2, "a", "b", 5), (3, "aa", "ab", 3)]

    seg = {r.word: r.units for r in bpe_segment(
        df, [("a", "a"), ("a", "b"), ("aa", "ab")]
    ).collect()}
    assert seg["aaab"] == ["aaab"] and seg["ab"] == ["ab"]


def test_bpe_greedy_run_semantics(spark):
    from sandcrawler_spark.operators.bpe import bpe_learn

    # 'aaaa': (a,a) counts all 3 adjacent pairs; the merge pass takes
    # positions 1 and 3 of the run (greedy, non-overlapping)
    df = spark.createDataFrame([(1, "aaaa aaaa cc")], ["doc_id", "text"])
    got = [(r.round, r.a, r.b, r.pair_count) for r in bpe_learn(df, k=2).collect()]
    assert got[0] == (1, "a", "a", 6)
    # after merging: 'aaaa' -> [aa, aa]; next best pair is (aa, aa) 2 (beats (c,c) 1)
    assert got[1] == (2, "aa", "aa", 2)


def test_bpe_duckdb_twin_parity(spark, tmp_path):
    import duckdb

    from sandcrawler_spark.operators.bpe import bpe_learn, bpe_oracle_sql

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tok"), (F.col("id") % 6).cast("string"),
            F.lit(" tok"), ((F.col("id") + 2) % 6).cast("string"),
            F.lit(" word"), ((F.col("id") * 7) % 4).cast("string"),
        ).alias("text"),
    )
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    got = [
        (r.round, r.a, r.b, r.pair_count)
        for r in bpe_learn(spark.read.parquet(p), k=5).collect()
    ]
    sql = bpe_oracle_sql(f"SELECT text FROM '{p}/*.parquet'", k=5)
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------

def test_phrase_search_exact_contiguity(spark):
    from sandcrawler_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the quick brown dog"),
            (2, "quick brown things everywhere"),
            (3, "brown quick inverted order"),
            (4, "the quick red brown fox"),  # not contiguous
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in phrase_search(df, ["quick", "brown"]).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_hits == 2 and got[1].first_hit == 1
    assert got[2].n_hits == 1 and got[2].first_hit == 0

    # three-term phrase, repeated term inside the phrase
    got3 = {r.doc_id: r for r in phrase_search(df, ["the", "quick", "brown"]).collect()}
    assert set(got3) == {1} and got3[1].n_hits == 2


def test_phrase_search_repeated_word_phrase(spark):
    from sandcrawler_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [(1, "buffalo buffalo buffalo end"), (2, "one buffalo only")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in phrase_search(df, ["buffalo", "buffalo"]).collect()}
    assert set(got) == {1}
    assert got[1].n_hits == 2 and got[1].first_hit == 0  # overlapping starts 0,1


def test_new_ops_partitioning_invariance(spark):
    """Integer-scaled scoring makes results independent of physical
    layout: every operator must return identical rows for the same
    input under a different partitioning."""
    from sandcrawler_spark.operators.bpe import bpe_learn
    from sandcrawler_spark.operators.dedupe import span_dedupe
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm
    from sandcrawler_spark.operators.search import bm25_topk

    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha w"), (F.col("id") % 9).cast("string"),
            F.lit(" beta w"), ((F.col("id") + 3) % 9).cast("string"),
            F.lit(" gamma tail"), (F.col("id") % 4).cast("string"),
        ).alias("text"),
    )
    variants = [docs, docs.repartition(13), docs.repartition(1)]

    def rows(df, fn):
        return sorted(tuple(r) for r in fn(df).collect())

    for fn in (
        lambda d: bm25_topk(d, ["alpha", "beta"], k=10),
        lambda d: span_dedupe(d, n=3),
        lambda d: bpe_learn(d, k=3),
        lambda d: (lambda t: lm_score_docs(d, *t))(train_bigram_lm(d)),
    ):
        base = rows(variants[0], fn)
        for v in variants[1:]:
            assert rows(v, fn) == base


def test_build_postings_plan_has_no_window(spark):
    """VERDICT r3 item 3: doc_freq must come from an aggregate joined
    back on term, never Window.partitionBy(term) — a stopword's
    posting list is ~the whole corpus in one window buffer at scale."""
    from sandcrawler_spark.operators.search import build_postings

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], ["doc_id", "text"]
    )
    out = build_postings(df)
    out.collect()  # executed plan (AQE finalizes stages on execution)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM
# ---------------------------------------------------------------------------


def test_stupid_backoff_known_value(spark):
    from sandcrawler_spark.operators.lm import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "b c a")], ["doc_id", "text"]
    )
    tri, bi, uni, totals = train_stupid_backoff(docs)
    got = {
        r.doc_id: (r.n_trigrams, r.sb_micronat)
        for r in stupid_backoff_scores(docs, tri, bi, uni, totals).collect()
    }
    # doc 1 = "a b c": trigram (a,b,c) seen once; context bigram (a,b)
    # count 2 -> S = 1/2
    assert got[1] == (1, round(math.log(1 / 2) * 1e6))
    # doc 2 = "a b d": S = c123(a,b,d)/c12(a,b) = 1/2 as well
    assert got[2] == (1, round(math.log(1 / 2) * 1e6))
    # doc 3 = "b c a": c123(b,c,a)=1, c12(b,c)=2 -> 1/2
    assert got[3] == (1, round(math.log(1 / 2) * 1e6))


def test_stupid_backoff_backoff_branches(spark):
    from sandcrawler_spark.operators.lm import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "b c a")], ["doc_id", "text"]
    )
    tri, bi, uni, totals = train_stupid_backoff(train)
    # N = 9 tokens: a:3 b:3 c:2 d:1
    score_docs = spark.createDataFrame(
        [
            (10, "d b c"),   # trigram unseen, bigram (b,c) seen (c23=2, c2=3)
            (11, "d d a"),   # trigram+bigram unseen, unigram a seen (c3=3)
            (12, "a a zz"),  # OOV w3 -> floor branch
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.sb_micronat
        for r in stupid_backoff_scores(score_docs, tri, bi, uni, totals).collect()
    }
    assert got[10] == round(math.log(0.4 * (2 / 3)) * 1e6)
    assert got[11] == round(math.log(0.4 * 0.4 * (3 / 9)) * 1e6)
    assert got[12] == round(math.log(0.4 * 0.4 * (1.0 / 9)) * 1e6)


def test_stupid_backoff_short_docs_zero(spark):
    from sandcrawler_spark.operators.lm import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    tri, bi, uni, totals = train_stupid_backoff(docs)
    got = {
        r.doc_id: (r.n_trigrams, r.sb_micronat)
        for r in stupid_backoff_scores(docs, tri, bi, uni, totals).collect()
    }
    assert got[1][0] == 2
    assert got[2] == (0, 0) and got[3] == (0, 0)


def test_sb_duckdb_twin_parity(spark, tmp_path):
    import duckdb

    from sandcrawler_spark.operators.lm import (
        sb_oracle_sql,
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    rows = [
        (i, " ".join("w%d" % ((i * j) % 11) for j in range(1, 3 + i % 7)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    tri, bi, uni, totals = train_stupid_backoff(docs)
    got = {
        r.doc_id: (r.n_trigrams, r.sb_micronat)
        for r in stupid_backoff_scores(docs, tri, bi, uni, totals).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(sb_oracle_sql("SELECT doc_id, text FROM documents")).fetchall()
    }
    assert got == exp
