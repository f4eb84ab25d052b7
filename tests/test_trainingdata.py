"""Training-data pipeline ops: dedupe family (exact / MinHash-LSH /
SimHash / n-gram Jaccard), embedding similarity search, text analysis,
multimodal plumbing — over the driver testdata documents/embeddings
tables when present, else synthetic frames.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sandcrawler_spark.multimodal import extract_media_meta
from sandcrawler_spark.operators.dedupe import (
    exact_dedupe,
    lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from sandcrawler_spark.operators.score import self_group_works, slug_join_score
from sandcrawler_spark.operators.similarity import ann_lsh, brute_topk, knn_join

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    p = os.path.join(SF_DIR, "documents.parquet")
    if os.path.exists(p):
        return spark.read.parquet(p)
    rows = [(i, f"doc text number {i} common words here", "en", "synth", 30) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


@pytest.fixture(scope="module")
def embeddings(spark):
    p = os.path.join(SF_DIR, "embeddings.parquet")
    if os.path.exists(p):
        return spark.read.parquet(p)
    import math

    rows = [(i, [math.sin(i * j + 1) for j in range(8)], f"l{i % 3}") for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")


def test_exact_dedupe_groups_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "The same   text here."),
            (2, "the same text HERE"),  # same after normalization
            (3, "different text entirely"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_dups for r in exact_dedupe(df).collect()}
    assert out == {1: 2, 3: 1}


def test_lsh_finds_near_dups_and_subset_of_verify(spark, documents):
    docs = documents.limit(80).select("doc_id", "text")
    # plant a near-duplicate pair
    base = docs.orderBy("doc_id").first()
    dup = spark.createDataFrame(
        [(999_999, base.text + " tiny suffix change")], ["doc_id", "text"]
    )
    all_docs = docs.union(dup)
    cands = lsh_candidates(all_docs, k=16, bands=8)  # 8 bands of 2 -> high recall
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (base.doc_id, 999_999) in pairs
    # verify stage: jaccard on candidates only, threshold filters
    verified = ngram_jaccard_pairs(all_docs, threshold=0.5, candidates=cands)
    vp = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert (base.doc_id, 999_999) in vp
    assert all(0.5 <= j <= 1.0 for j in vp.values())
    # block-then-verify is a subset of exhaustive verify
    exhaustive = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(all_docs, threshold=0.5).collect()
    }
    assert set(vp).issubset(set(exhaustive))
    for k, v in vp.items():
        assert exhaustive[k] == v


def test_lsh_band_cap_bounds_degenerate_buckets(spark):
    # 60 identical boilerplate docs (one LSH bucket per band -> 60^2/2
    # join rows uncapped) + one genuine near-dup pair among distinct docs
    boiler = [(i, "cookie wall please enable javascript to continue reading") for i in range(60)]
    uniq = [
        (100, "a perfectly unique document about crawl frontiers and spark"),
        (101, "a perfectly unique document about crawl frontiers and sparks"),
        (102, "something else entirely different from the others here today"),
    ]
    df = spark.createDataFrame(boiler + uniq, ["doc_id", "text"])
    uncapped = lsh_candidates(df, k=16, bands=8)
    capped = lsh_candidates(df, k=16, bands=8, max_band_size=10)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 60 * 59 // 2  # degenerate blowup really happens
    # cap drops the degenerate buckets entirely...
    assert n_cap < 60 * 10
    # ...but keeps the real near-dup pair (its buckets are small)
    assert (100, 101) in {(r.id_a, r.id_b) for r in capped.collect()}
    # and capped candidates are a subset of uncapped
    assert capped.exceptAll(uncapped).count() == 0


def test_simhash_near_dup(spark):
    words = (
        "analysis corpus crawl data engine extraction frontier graph host index "
        "journal knowledge lattice metadata network ontology paper query research "
        "scholar text url vector web zettel archive batch capture dedupe entropy"
    ).split()
    base = " ".join(words)
    near = " ".join(words[:-1] + ["zzz"])  # hamming(base, near) == 1
    df = spark.createDataFrame(
        [
            (1, base),
            (2, near),
            (3, "completely unrelated words about something else entirely now"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(df, max_hamming=3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_brute_topk_and_knn(spark, embeddings):
    first = embeddings.orderBy("vec_id").first()
    q = [float(x) for x in first.embedding]
    top = brute_topk(embeddings, q, k=5).collect()
    assert len(top) == 5
    assert top[0].vec_id == first.vec_id  # self is its own nearest
    assert abs(top[0].cosine - 1.0) < 1e-4
    sims = [r.cosine for r in top]
    assert sims == sorted(sims, reverse=True)

    queries = spark.createDataFrame(
        [(int(first.vec_id), q)], "q_id long, q_vec array<double>"
    )
    knn = knn_join(queries, embeddings, k=5).collect()
    assert {r.vec_id for r in knn} == {r.vec_id for r in top}


def test_ann_lsh_recall_vs_brute(spark, embeddings):
    emb = embeddings.limit(300).persist()
    sample = emb.orderBy("vec_id").limit(5).collect()
    queries = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in sample],
        "q_id long, q_vec array<double>",
    )
    dim = len(sample[0].embedding)
    exact = knn_join(queries, emb, k=3)
    approx = ann_lsh(queries, emb, dim=dim, k=3, n_planes=4)
    ex = {(r.q_id, r.vec_id) for r in exact.collect()}
    ap = {(r.q_id, r.vec_id) for r in approx.collect()}
    # every query at least finds itself; recall over 5 queries >= 40%
    for r in sample:
        assert (r.vec_id, r.vec_id) in ap
    assert len(ex & ap) / len(ex) >= 0.4
    emb.unpersist()


def test_slug_join_and_self_group(spark):
    left = spark.createDataFrame(
        [
            (1, "Deep Learning for Web Crawling"),
            (2, "An Unrelated Treatise on Geology"),
        ],
        ["id", "title"],
    )
    right = spark.createDataFrame(
        [
            (10, "Deep learning for WEB crawling!"),  # same slug
            (11, "Another Thing Entirely Different"),
        ],
        ["id", "title"],
    )
    out = slug_join_score(left, right).collect()
    assert len(out) == 1
    assert (out[0].left_id, out[0].right_id) == (1, 10)
    assert out[0].score >= 800  # case edits count, like the reference

    both = spark.createDataFrame(
        [
            (1, "Deep Learning for Web Crawling"),
            (2, "Deep learning for WEB crawling!"),
            (3, "An Unrelated Treatise on Geology"),
        ],
        ["id", "title"],
    )
    grp = self_group_works(both, min_score=800).collect()
    assert len(grp) == 1 and (grp[0].id_a, grp[0].id_b) == (1, 2)


def test_textstats_on_documents(spark, documents):
    from sandcrawler_spark.functions.textstats import (
        lang_id_en_score_col,
        quality_score_col,
        word_count_col,
    )

    rows = (
        documents.limit(100)
        .select(
            "text",
            word_count_col(F.col("text")).alias("wc"),
            quality_score_col(F.col("text")).alias("q"),
            lang_id_en_score_col(F.col("text")).alias("en"),
        )
        .collect()
    )
    for r in rows:
        assert r.wc == len(r.text.split())
        assert 0.0 <= r.q <= 1.0
        assert 0.0 <= r.en <= 1.0


def test_multimodal_plumbing(spark):
    rows = [
        (1, b"\x89PNG\r\n" + bytes(range(64)), "image"),
        (2, None, "image"),
        (3, b"", "audio"),
        (4, b"RIFFxxxxWAVE" + b"\x00" * 32, "audio"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, media_type string")
    out = extract_media_meta(df, "content", "media_type").collect()
    assert len(out) == len(rows)  # exactly one row per input
    by_status = sorted(r.status for r in out)
    assert by_status.count("null-body") == 2
    ok = [r for r in out if r.status == "success-stub"]
    for r in ok:
        assert r.sha1hex and len(r.feature) == 8 and r.width >= 64
    # deterministic across runs
    out2 = extract_media_meta(df, "content", "media_type").collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))

    from sandcrawler_spark.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"x")


def test_simhash_max_hamming_guard(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        simhash_pairs(df, max_hamming=16)


def test_kmeans_centroids_deterministic_and_recall(spark, embeddings):
    """Trained IVF centroids: (a) bit-deterministic across runs (the
    sorted-fold mean contract the DuckDB twin relies on), (b) recall at
    the ann_recall query's parameters >= the untrained id-mod sample."""
    from sandcrawler_spark.operators.similarity import ivf_topk, kmeans_centroids, knn_join

    km1 = {r.cent_id: r.cent_vec for r in kmeans_centroids(embeddings, n_iters=2, centroid_mod=25).collect()}
    km2 = {r.cent_id: r.cent_vec for r in kmeans_centroids(embeddings, n_iters=2, centroid_mod=25).collect()}
    assert km1 == km2
    # centroids moved off the raw sample vectors
    raw = {r.vec_id: [float(x) for x in r.embedding]
           for r in embeddings.filter(F.col("vec_id") % 25 == 0).collect()}
    assert set(km1) <= set(raw)
    assert any(km1[c] != raw[c] for c in km1)

    sample = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {(r.q_id, r.vec_id) for r in knn_join(sample, embeddings, k=5).collect()}

    def recall(df):
        got = {(r.q_id, r.vec_id) for r in df.select("q_id", "vec_id").collect()}
        return len(got & truth) / len(truth)

    km = kmeans_centroids(embeddings, n_iters=2, centroid_mod=25)
    r_trained = recall(ivf_topk(sample, embeddings, k=5, centroid_mod=25, nprobe=2, centroids=km))
    r_idmod = recall(ivf_topk(sample, embeddings, k=5, centroid_mod=25, nprobe=2))
    assert r_trained >= r_idmod


def test_connected_components_chain_and_islands(spark):
    from sandcrawler_spark.operators.dedupe import connected_components

    # chain 1-2-3-4, pair 10-11, singleton 20 (no edges -> absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    labels = {r.id: r.label for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_olog_rounds(spark):
    """Adversarial 10^4-node path component: large-star/small-star must
    converge in O(log n) rounds (min-label propagation would need 10^4)."""
    from sandcrawler_spark.operators.dedupe import connected_components

    n = 10_000
    pairs = spark.range(n - 1).selectExpr("id as id_a", "id + 1 as id_b")
    stats = {}
    labels = connected_components(pairs, max_iter=25, stats=stats)
    assert stats["rounds"] <= 20  # ~log2(10^4) + slack, NOT O(n)
    agg = labels.groupBy("label").count().collect()
    assert len(agg) == 1 and agg[0].label == 0 and agg[0]["count"] == n


def test_connected_components_nonconvergence_raises(spark):
    from sandcrawler_spark.operators.dedupe import connected_components

    pairs = spark.range(63).selectExpr("id as id_a", "id + 1 as id_b")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_neardup_dedupe_end_to_end(spark, documents):
    from sandcrawler_spark.operators.dedupe import neardup_dedupe

    docs = documents.limit(40).select("doc_id", "text")
    base = docs.orderBy("doc_id").first()
    dups = spark.createDataFrame(
        [
            (999_001, base.text + " tiny suffix"),
            (999_002, base.text + " other tiny suffix"),
        ],
        ["doc_id", "text"],
    )
    all_docs = docs.union(dups)
    out = neardup_dedupe(all_docs, n_shingle=3, k=16, bands=8, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    # one row per input doc
    assert len(rows) == all_docs.count()
    # the planted dups cluster with the base and the base is representative
    assert rows[999_001].rep_id == base.doc_id
    assert rows[999_002].rep_id == base.doc_id
    assert rows[base.doc_id].is_rep and not rows[999_001].is_rep
    # survivors: exactly the representatives
    n_clusters = out.filter(F.col("is_rep")).count()
    assert n_clusters == len({r.rep_id for r in rows.values()})


def test_bpe_token_count(spark):
    from sandcrawler_spark.functions.textstats import bpe_token_count_col

    df = spark.createDataFrame(
        [(1, "I'll see 2 dogs!"), (2, ""), (3, "word"), (4, "a  b")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    # "I" + "'ll" + " see" + " 2" + " dogs" + "!"
    assert got[1] == 6
    assert got[2] == 0 and got[3] == 1
    # "a" + " " (unconsumed run) + " b" -> leftmost-first: " ?[A-Za-z]+" takes " b", leaving one space
    assert got[4] == 3


def test_winnow_fingerprints_near_dup_overlap(spark):
    from sandcrawler_spark.functions.textstats import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again today"
    edited = base.replace("lazy", "hazy")  # one local edit
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "completely different content with other words"), (4, "tiny")],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert 4 not in by_doc  # below k+w-1 chars -> no fingerprints
    # identical docs -> identical sets; local edit -> high overlap
    j12 = len(by_doc[1] & by_doc[2]) / len(by_doc[1] | by_doc[2])
    j13 = len(by_doc[1] & by_doc[3]) / len(by_doc[1] | by_doc[3])
    assert j12 > 0.5 and j13 < 0.1
    # deterministic
    again = {r.doc_id: r.fingerprint for r in winnow_fingerprints(df, k=5, w=4).collect()}
    assert set(fps.collect()) == set(winnow_fingerprints(df, k=5, w=4).collect())


def test_embedding_neardup_pairs(spark, embeddings):
    from sandcrawler_spark.operators.similarity import embedding_neardup_pairs

    e = embeddings.select("vec_id", "embedding")
    dups = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    aug = e.union(dups)
    dim = len(e.first().embedding)
    pairs = {(r.id_a, r.id_b): r.cosine for r in
             embedding_neardup_pairs(aug, dim=dim, threshold=0.95, n_planes=8).collect()}
    for i in range(5):
        assert (i, i + 5000) in pairs and pairs[(i, i + 5000)] == 1.0


def test_ivf_topk_recall_vs_brute(spark, embeddings):
    from sandcrawler_spark.operators.similarity import ivf_topk, knn_join

    e = embeddings.select("vec_id", "embedding")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    approx = ivf_topk(qs, e, k=5, centroid_mod=10, nprobe=3)
    exact = knn_join(qs, e, k=5)
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    b = {(r.q_id, r.vec_id) for r in exact.collect()}
    # each query returns itself (cosine 1.0) and decent overall recall
    for i in range(5):
        assert (i, i) in a
    assert len(a & b) / len(b) >= 0.4
    # deterministic across runs
    assert a == {(r.q_id, r.vec_id) for r in ivf_topk(qs, e, k=5, centroid_mod=10, nprobe=3).collect()}


def test_ann_lsh_multiprobe_recall(spark, embeddings):
    from sandcrawler_spark.operators.similarity import ann_lsh, knn_join

    e = embeddings.select("vec_id", "embedding")
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dim = len(e.first().embedding)
    exact = {(r.q_id, r.vec_id) for r in knn_join(qs, e, k=3).collect()}
    plain = {(r.q_id, r.vec_id) for r in ann_lsh(qs, e, dim=dim, k=3, n_planes=6).collect()}
    multi = {(r.q_id, r.vec_id) for r in
             ann_lsh(qs, e, dim=dim, k=3, n_planes=6, multiprobe=True).collect()}
    rec_plain = len(plain & exact) / len(exact)
    rec_multi = len(multi & exact) / len(exact)
    # probing 1-bit-away buckets can only widen the candidate set
    assert rec_multi >= rec_plain
    # every query still finds itself
    for i in range(8):
        assert (i, i) in multi


def test_span_dedupe_removes_copied_spans(spark):
    from sandcrawler_spark.operators.dedupe import span_dedupe

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                                   # first occurrence: kept whole
        (2, "intro words here " + base),             # copies the 10-token run
        (3, "totally different text with no overlap at all here now"),
        (4, "short doc"),                            # < n tokens: untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in span_dedupe(df, n=5).collect()}
    assert got[1].n_dropped == 0 and got[1].text_deduped == base
    # doc 2 keeps its own intro, loses the entire copied run
    assert got[2].text_deduped == "intro words here"
    assert got[2].n_dropped == 10
    assert got[3].n_dropped == 0
    assert got[4].n_dropped == 0 and got[4].text_deduped == "short doc"


def test_span_dedupe_overlapping_windows_merge(spark):
    from sandcrawler_spark.operators.dedupe import span_dedupe

    run = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, run), (2, "pre " + run + " post")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in span_dedupe(df, n=4).collect()}
    # all 12 copied tokens drop in one merged span; sentinels survive
    assert got[2].text_deduped == "pre post"
    assert got[2].n_dropped == 12


def test_knn_join_partial_topk_spreads_work(spark):
    """VERDICT r3 item 4: knn_join must not funnel all of a query's
    candidate rows into one task. Level-1 ranking is keyed on
    (q_id, scan partition) — visible in the executed plan — and the
    result is identical across input layouts."""
    import random

    random.seed(7)
    emb = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(400)],
        ["vec_id", "embedding"],
    )
    qs = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] + [0.5] * 7)], ["q_id", "q_vec"]
    )
    results = []
    for layout in (emb.coalesce(1), emb.repartition(13)):
        out = knn_join(qs, layout, k=5)
        results.append(sorted((r.q_id, r.vec_id, r.cosine) for r in out.collect()))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # two window stages; the first is co-keyed on the scan partition
        assert "_part" in plan
    assert results[0] == results[1]
    # exactness: per-query results equal the single-query brute force
    brute = {r.vec_id for r in brute_topk(emb, [1.0] * 8, k=5).collect()}
    got_q0 = {v for q, v, _ in results[0] if q == 0}
    assert got_q0 == brute


def test_weighted_sample_topk_properties(spark):
    # bias: heavy ids (w=1000) should dominate a k=50 draw over w=1
    from sandcrawler_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 1000 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample_topk(df, "w", k=50, id_col="doc_id").collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.doc_id < 100)
    assert heavy >= 40  # 100 heavy ids carry ~99% of total weight
    # deterministic: second run identical
    again = weighted_sample_topk(df, "w", k=50, id_col="doc_id").collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in again]
    # zero/negative weights never drawn
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 7)], ["doc_id", "w"])
    only = weighted_sample_topk(df2, "w", k=10, id_col="doc_id").collect()
    assert [r.doc_id for r in only] == [3]


def test_weighted_sample_per_key_matches_plain_window(spark):
    from pyspark.sql import Window

    from sandcrawler_spark.operators.sampling import (
        weighted_sample_per_key,
        weighted_sample_topk,
    )

    rows = [(i, "lang%d" % (i % 3), (i % 17) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "w"]).repartition(16)
    got = weighted_sample_per_key(df, "lang", "w", k=7, id_col="doc_id")
    # reference: same A-ES keys ranked with a plain per-key window
    keyed = weighted_sample_topk(df, "w", k=500, id_col="doc_id")  # all rows, keyed
    w = Window.partitionBy("lang").orderBy(F.desc("key_micro"), F.asc("doc_id"))
    ref = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .drop("_rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # exactly 7 per stratum
    counts = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"lang0": 7, "lang1": 7, "lang2": 7}


def test_weighted_sample_per_key_small_groups_exhaustive(spark):
    from sandcrawler_spark.operators.sampling import weighted_sample_per_key

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 1), (3, "b", 2), (4, "b", 0)], ["doc_id", "lang", "w"]
    )
    got = weighted_sample_per_key(df, "lang", "w", k=10, id_col="doc_id").collect()
    # zero-weight row 4 excluded; everything else kept (groups < k)
    assert sorted(r.doc_id for r in got) == [1, 2, 3]


class TestHostBoilerplate:
    def _df(self, spark):
        rows = []
        # host A: 5 docs, 'NAV' on all, 'PROMO' on 3/5 (60%), bodies unique
        for i in range(5):
            t = "NAV\n" + (f"PROMO\n" if i < 3 else "") + f"body A{i}\nmore A{i}"
            rows.append(("a.com", i, t))
        # host B: 2 docs (< min_docs) sharing 'NAV' — must NOT be mined
        for i in range(2):
            rows.append(("b.com", 100 + i, f"NAV\nbody B{i}"))
        return spark.createDataFrame(rows, "host string, doc_id long, text string")

    def test_mines_only_frequent_lines_on_eligible_hosts(self, spark):
        from sandcrawler_spark.operators.boilerplate import host_boilerplate_lines

        got = {
            (r.host, r.line): (r.n_docs, r.host_docs)
            for r in host_boilerplate_lines(self._df(spark), min_pct=50, min_docs=3).collect()
        }
        assert got == {("a.com", "NAV"): (5, 5), ("a.com", "PROMO"): (3, 5)}

    def test_strip_preserves_body_and_order(self, spark):
        from sandcrawler_spark.operators.boilerplate import (
            host_boilerplate_lines,
            strip_boilerplate,
        )

        df = self._df(spark)
        bp = host_boilerplate_lines(df, min_pct=50, min_docs=3)
        out = {r.doc_id: r for r in strip_boilerplate(df, bp).collect()}
        assert out[0].text == "body A0\nmore A0" and out[0].n_removed == 2
        assert out[4].text == "body A4\nmore A4" and out[4].n_removed == 1
        # ineligible host untouched
        assert out[100].text == "NAV\nbody B0" and out[100].n_removed == 0

    def test_all_boilerplate_doc_survives_empty(self, spark):
        from sandcrawler_spark.operators.boilerplate import strip_boilerplate

        df = spark.createDataFrame(
            [("a.com", 1, "NAV"), ("a.com", 2, "NAV\nreal")],
            "host string, doc_id long, text string",
        )
        bp = spark.createDataFrame([("a.com", "NAV")], "host string, line string")
        out = {r.doc_id: r for r in strip_boilerplate(df, bp).collect()}
        assert out[1].text == "" and out[1].n_removed == 1 and out[1].n_lines == 1
        assert out[2].text == "real"


class TestSemanticDedupe:
    def _vecs(self, spark):
        import math

        rows = []
        # two well-separated direction clusters + exact and near clones
        for i in range(30):
            ang = 0.02 * (i % 3)
            rows.append((i, [math.cos(ang), math.sin(ang), 0.0, 0.0]))
        for i in range(30, 60):
            ang = 0.02 * (i % 3)
            rows.append((i, [0.0, 0.0, math.cos(ang), math.sin(ang)]))
        # clones of 0 and 30 under new ids
        rows.append((1000, rows[0][1]))
        rows.append((1030, rows[30][1]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_clones_collapse_to_original(self, spark):
        from sandcrawler_spark.operators.similarity import semantic_dedupe

        out = {
            r.vec_id: r
            for r in semantic_dedupe(
                self._vecs(spark), eps=0.999, kmeans_iters=1, centroid_mod=30
            ).collect()
        }
        assert len(out) == 62
        assert out[1000].rep_id == out[0].rep_id and not out[1000].is_rep
        assert out[1030].rep_id == out[30].rep_id and not out[1030].is_rep
        # cross-cluster vectors never merge (orthogonal directions)
        reps_a = {out[i].rep_id for i in range(30)}
        reps_b = {out[i].rep_id for i in range(30, 60)}
        assert reps_a.isdisjoint(reps_b)

    def test_max_cell_excludes_mega_cluster_from_pairing(self, spark):
        from sandcrawler_spark.operators.similarity import semantic_dedupe

        out = semantic_dedupe(
            self._vecs(spark), eps=0.999, kmeans_iters=1, centroid_mod=30,
            max_cell=5,
        ).collect()
        # every cell exceeds 5 members -> no pairs -> everyone is own rep
        assert all(r.is_rep for r in out)


class TestLeakageSafeSplit:
    def test_groups_never_straddle_splits(self, spark):
        from sandcrawler_spark.operators.sampling import leakage_safe_split

        df = spark.createDataFrame(
            [(i, f"host{i % 40}") for i in range(400)], "doc_id long, host string"
        )
        out = leakage_safe_split(df, "host", val_ppm=200_000, test_ppm=200_000).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r.host, set()).add(r.split)
        assert all(len(s) == 1 for s in by_host.values())
        splits = {next(iter(s)) for s in by_host.values()}
        assert splits == {"train", "val", "test"}  # 40 hosts, 20%/20% cuts

    def test_deterministic_and_seed_sensitive(self, spark):
        from sandcrawler_spark.operators.sampling import leakage_safe_split

        df = spark.createDataFrame(
            [(i, f"g{i}") for i in range(300)], "doc_id long, g string"
        )
        a = {r.doc_id: r.split for r in leakage_safe_split(df, "g").collect()}
        b = {r.doc_id: r.split for r in leakage_safe_split(df, "g").collect()}
        c = {r.doc_id: r.split for r in leakage_safe_split(df, "g", seed="other").collect()}
        assert a == b
        assert a != c


class TestClusterBalancedSample:
    def test_flattens_dominant_cluster(self, spark):
        import math

        from sandcrawler_spark.operators.similarity import cluster_balanced_sample

        rows = []
        # dominant topic: 300 vectors in one direction; tail topic: 30
        for i in range(300):
            ang = 0.01 * (i % 5)
            rows.append((i, [math.cos(ang), math.sin(ang), 0.0, 0.0]))
        for i in range(300, 330):
            ang = 0.01 * (i % 5)
            rows.append((i, [0.0, 0.0, math.cos(ang), math.sin(ang)]))
        e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = cluster_balanced_sample(
            e, total_budget=60, alpha=0.5, kmeans_iters=1, centroid_mod=150
        )
        kept = out.filter("kept").groupBy("cent_id").count().collect()
        by_cell = {r.cent_id: r["count"] for r in kept}
        dom = max(by_cell.values())
        tail = min(by_cell.values())
        assert len(by_cell) == 2
        # alpha=0.5 compresses the 10:1 natural ratio to ~sqrt(10):1
        # (expected targets 46 vs 14): well under half the natural skew
        assert dom < 5 * tail
        # determinism: identical rerun
        again = cluster_balanced_sample(
            e, total_budget=60, alpha=0.5, kmeans_iters=1, centroid_mod=150
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


class TestCorpusDiagnostics:
    def test_template_farm_scores_low_diversity(self, spark):
        from sandcrawler_spark.operators.diagnostics import corpus_diagnostics

        rows = [("farm", i, "buy cheap pills now " * 25) for i in range(10)]
        rows += [("organic", i, " ".join(f"w{i}x{j}" for j in range(100))) for i in range(10)]
        df = spark.createDataFrame(rows, "source string, doc_id long, text string")
        got = {r.source: r for r in corpus_diagnostics(df).collect()}
        assert got["farm"].trigram_diversity_ppm < 10_000  # 4 distinct grams
        assert got["organic"].trigram_diversity_ppm == 1_000_000  # all unique
        assert got["farm"].n_docs == 10 and got["farm"].n_tokens == 1000

    def test_fertility_tracks_bytes_per_token(self, spark):
        from sandcrawler_spark.operators.diagnostics import corpus_diagnostics

        df = spark.createDataFrame(
            [("short", 1, "aa bb cc"), ("long", 2, "aaaaaaaaaa bbbbbbbbbb")],
            "source string, doc_id long, text string",
        )
        got = {r.source: r.bytes_per_token_micro for r in corpus_diagnostics(df).collect()}
        # 8 bytes / 3 tokens vs 21 bytes / 2 tokens
        assert got["short"] == (8 * 1_000_000) // 3
        assert got["long"] == (21 * 1_000_000) // 2

    def test_empty_text_stratum(self, spark):
        from sandcrawler_spark.operators.diagnostics import corpus_diagnostics

        df = spark.createDataFrame([("e", 1, "")], "source string, doc_id long, text string")
        r = corpus_diagnostics(df).collect()[0]
        assert (r.n_tokens, r.n_trigrams, r.trigram_diversity_ppm, r.bytes_per_token_micro) == (0, 0, 0, 0)


class TestDustApply:
    def test_mine_apply_roundtrip(self, spark):
        from sandcrawler_spark.operators.dust import apply_dust_rules, dust_rules

        # host with strong alias evidence: 3 base pages each captured
        # under ?utm and trailing-slash spellings (same content fp)
        rows = []
        for i in range(3):
            base = f"https://shop.example/p{i}"
            for u in (base, base + "?utm=x", base + "/"):
                rows.append((u, f"fp{i}"))
        # host with one-off (support 1 < min_support) evidence
        rows += [("https://rare.example/a", "fpr"), ("https://rare.example/a?z=1", "fpr")]
        caps = spark.createDataFrame(rows, "url string, fingerprint string")
        rules = dust_rules(caps, min_support=3)
        out = {
            r.url: r
            for r in apply_dust_rules(caps.select("url").distinct(), rules).collect()
        }
        assert out["https://shop.example/p1?utm=x"].canon_url == "https://shop.example/p1"
        assert out["https://shop.example/p2/"].canon_url == "https://shop.example/p2"
        assert out["https://shop.example/p0"].rewritten is False
        # under-supported host untouched
        assert out["https://rare.example/a?z=1"].rewritten is False

    def test_case_fold_never_applied(self, spark):
        from sandcrawler_spark.operators.dust import apply_dust_rules

        rules = spark.createDataFrame(
            [("x.example", "case_fold", 9, True)],
            "host string, rule string, support long, actionable boolean",
        )
        f = spark.createDataFrame([("https://x.example/PaGe",)], "url string")
        r = apply_dust_rules(f, rules).collect()[0]
        assert r.canon_url == "https://x.example/PaGe" and r.rewritten is False


class TestScriptProfile:
    def test_dominant_script_and_counts(self, spark):
        from sandcrawler_spark.functions.script import script_profile

        cyr = "\u041f\u0440\u0438\u0432\u0435\u0442"          # 6 Cyrillic letters
        han = "\u4e2d\u6587\u6587\u6863"                        # 4 Han chars
        df = spark.createDataFrame(
            [
                (1, "plain english text"),
                (2, cyr + " ok"),                 # 6 cyr vs 2 latin
                (3, han),
                (4, "1234 --- !!!"),              # letterless
                (5, "mix " + han + " of both"),   # 9 latin vs 4 han
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in script_profile(df).collect()}
        assert got[1].dominant_script == "latin" and got[1].latin_n == 16
        assert got[2].dominant_script == "cyrillic" and got[2].cyrillic_n == 6
        assert got[3].dominant_script == "han" and got[3].dominant_ppm == 1_000_000
        assert got[4].dominant_script == "none" and got[4].n_letters == 0
        assert got[5].dominant_script == "latin"
        assert got[5].dominant_ppm == (9 * 1_000_000) // 13

    def test_priority_tie_break(self, spark):
        from sandcrawler_spark.functions.script import script_profile

        # 2 latin vs 2 greek: tie resolves to the earlier priority
        df = spark.createDataFrame(
            [(1, "ab \u03b1\u03b2")], "doc_id long, text string"
        )
        r = script_profile(df).collect()[0]
        assert r.latin_n == 2 and r.greek_n == 2
        assert r.dominant_script == "latin"


class TestCorpusManifest:
    def test_order_and_partition_independent(self, spark):
        from sandcrawler_spark.operators.diagnostics import corpus_manifest

        rows = [("s", i, f"text number {i}") for i in range(100)]
        a = spark.createDataFrame(rows, "source string, doc_id long, text string")
        b = spark.createDataFrame(list(reversed(rows)), "source string, doc_id long, text string").repartition(17)
        ma = corpus_manifest(a).collect()[0]
        mb = corpus_manifest(b).collect()[0]
        assert (ma.n_docs, ma.n_bytes, ma.manifest_hash) == (mb.n_docs, mb.n_bytes, mb.manifest_hash)

    def test_any_mutation_moves_the_hash(self, spark):
        from sandcrawler_spark.operators.diagnostics import corpus_manifest

        rows = [("s", i, f"text number {i}") for i in range(50)]
        base = corpus_manifest(
            spark.createDataFrame(rows, "source string, doc_id long, text string")
        ).collect()[0].manifest_hash
        # drop one row / mutate one char / duplicate one row
        variants = [
            rows[:-1],
            rows[:-1] + [("s", 49, "text number 49!")],
            rows + [rows[0]],
        ]
        for v in variants:
            h = corpus_manifest(
                spark.createDataFrame(v, "source string, doc_id long, text string")
            ).collect()[0].manifest_hash
            assert h != base


class TestBordaFuse:
    def test_rank_sum_and_determinism(self, spark):
        from sandcrawler_spark.operators.diagnostics import borda_fuse

        df = spark.createDataFrame(
            [(1, 10, 5), (2, 20, 1), (3, 10, 9), (4, 1, 9)],
            "doc_id long, a long, b long",
        )
        got = {r.doc_id: r for r in borda_fuse(df, ["a", "b"]).collect()}
        # a ranks: 2 -> 1; ties 1,3 at 10 break by id -> 2,3; 4 -> 4
        assert [got[i].a_rank for i in (1, 2, 3, 4)] == [2, 1, 3, 4]
        # b ranks: 3,4 tie at 9 -> 1,2; 1 -> 3; 2 -> 4
        assert [got[i].b_rank for i in (1, 2, 3, 4)] == [3, 4, 1, 2]
        assert got[1].borda == 5 and got[2].borda == 5
        # partitioning invariance
        again = borda_fuse(df.repartition(7), ["a", "b"]).collect()
        assert sorted(map(tuple, again)) == sorted(
            map(tuple, borda_fuse(df, ["a", "b"]).collect())
        )


class TestLangProfile:
    def test_six_language_classification(self, spark):
        from sandcrawler_spark.functions.script import lang_profile

        df = spark.createDataFrame(
            [
                (1, "the cat sat of the mat and it was good for it is that"),
                (2, "der hund und die katze ist nicht ein tier mit auf sich"),
                (3, "le chat est dans les maisons que pour une qui pas"),
                (4, "el gato es una de las casas que por con para los"),
                (5, "de kat het huis een van en dat niet zijn voor met"),
                (6, "zz qq xx vv ww yy"),
                (7, ""),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.lang_pred for r in lang_profile(df).collect()}
        assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "nl", 6: "und", 7: "und"}

    def test_threshold_gates_weak_evidence(self, spark):
        from sandcrawler_spark.functions.script import lang_profile

        # one 'the' in 50 tokens = 20000 ppm < the 4% floor
        text = "the " + " ".join(f"w{i}" for i in range(49))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = lang_profile(df).collect()[0]
        assert r.en_ppm == 20_000 and r.lang_pred == "und"
