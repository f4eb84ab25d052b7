"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — pure Catalyst (zip_with +
aggregate), fully codegen'd, exact. Scale path: random-hyperplane LSH
bucketing — candidates meet in an equi-join on the bucket signature;
cosine verified only within buckets (IVF-style: probe multiple
signatures by flipping low-confidence bits would be the next step).

Planes are derived deterministically from a seed via md5 — no RNG at
query time, so results are stable across runs/parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a single query vector. The query is a
    literal array (constant-folded); one scan, one partial top-k per
    partition, tiny final sort — Catalyst's TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim_col(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for each query row (queries side small =>
    broadcast; the big side streams through one stage).

    Two-level top-k: a single Window.partitionBy(q_id) would put EVERY
    (embedding x query) row for one query into one task — with 10^9
    embeddings and 3 queries that is 3 tasks doing everything
    (VERDICT r3 item 4). Instead level 1 ranks within (q_id, scan
    partition) — P*Q balanced groups, each at most one scan
    partition's rows — and level 2 takes the exact global top-k over
    the surviving k*P rows per query. Correctness is unaffected: any
    row in the global top-k is in its own partition's top-k; ties
    break on id so the result is layout-independent."""
    from pyspark.sql import Window

    j = embeddings.join(F.broadcast(queries))
    sim = cosine_sim_col(F.col(vec_col), F.col(q_vec))
    scored = j.select(
        F.col(q_id),
        F.col(id_col),
        F.round(sim, 6).alias("cosine"),
        F.spark_partition_id().alias("_part"),
    )
    order = (F.desc("cosine"), F.asc(id_col))
    w1 = Window.partitionBy(q_id, "_part").orderBy(*order)
    partial = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_part")
    )
    w2 = Window.partitionBy(q_id).orderBy(*order)
    return (
        partial.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _seeded_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5(seed, plane, j)."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        j = 0
        while len(vals) < dim:
            d = hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()
            for off in range(0, 16, 4):
                vals.append(int.from_bytes(d[off : off + 4], "big") / 2**31 - 1.0)
            j += 1
        out[p] = vals[:dim]
    return out


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Signature string: one bit per hyperplane = sign(v · plane)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def kmeans_centroids(
    embeddings: DataFrame,
    n_iters: int = 2,
    centroid_mod: int = 50,
    max_cells: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seeded k-means for the IVF coarse quantizer:
    id-mod sample init, then `n_iters` Lloyd iterations. Returns
    (cent_id, cent_vec) — drop-in for ivf_topk(centroids=...), plan
    unchanged.

    Determinism contract (what makes the DuckDB twin hash-exact): the
    assignment uses ROUNDED cosine with cent_id tie-breaks, and the
    centroid update folds each cell's values in sorted-id order
    (array_sort(collect_list) + left fold) instead of a parallel
    avg() — floating addition is not associative, so an unordered mean
    is run-dependent. The ordered fold bounds memory by cell size; a
    production cluster that does not need bit-reproducible centroids
    swaps the fold for avg() with no plan change. Cells that lose all
    members simply drop out (standard Lloyd degeneracy; fine for a
    coarse quantizer).

    Scale cap: the seed stride is max(centroid_mod, ceil(n/max_cells))
    (operators/pq.py coarse_stride), so the centroid relation — which
    is BROADCAST on every assignment pass — never exceeds max_cells
    rows no matter how big the corpus is; centroid_mod alone would
    grow it linearly with n."""
    from pyspark.sql import Window

    from sandcrawler_spark.operators.pq import coarse_stride

    stride = coarse_stride(embeddings.count(), centroid_mod, max_cells)
    cents = embeddings.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).cast("array<double>").alias("cent_vec")
    )
    asg_w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cent_id"))
    for _ in range(n_iters):
        assigned = (
            embeddings.join(F.broadcast(cents))
            .withColumn("_csim", F.round(cosine_sim_col(F.col(vec_col), F.col("cent_vec")), 6))
            .withColumn("_rn", F.row_number().over(asg_w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cent_id")
        )
        ex = assigned.select(
            "cent_id", "_id", F.posexplode(F.col("_v")).alias("pos", "val")
        )
        dimsum = ex.groupBy("cent_id", "pos").agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_id"), F.col("val")))),
                    lambda s: s["val"].cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            F.count("*").alias("n"),
        )
        cents = (
            dimsum.withColumn("m", F.round(F.col("s") / F.col("n"), 6))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cent_vec")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_topk(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    centroid_mod: int = 50,
    max_cells: int = 4096,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer
    (centroids = the id-mod sample of the corpus itself — no training
    step, reproducible across runs) partitions vectors into cells by
    nearest-centroid; each query probes its `nprobe` nearest cells and
    ranks exact cosine only inside them.

    Scale shape: the centroid relation is CAPPED at max_cells rows
    (seed stride = max(centroid_mod, ceil(n/max_cells)) — pq.py
    coarse_stride), so the broadcast for both the assignment pass and
    the query probe is bounded at any corpus size; the only shuffle is
    the candidates equi-join on cent_id (raise centroid_mod to shrink
    cells below the cap, raise nprobe to recover recall). Pass
    centroids=kmeans_centroids(...) for trained cells — the plan is
    unchanged."""
    from pyspark.sql import Window

    from sandcrawler_spark.operators.pq import coarse_stride

    if centroids is not None:
        cents = centroids
    else:
        stride = coarse_stride(embeddings.count(), centroid_mod, max_cells)
        cents = embeddings.filter(F.col(id_col) % stride == 0).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    # assignment: nearest centroid per vector (rounded cosine + id
    # tiebreak so the cell layout is engine-reproducible)
    asg_w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cent_id"))
    assigned = (
        embeddings.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col(vec_col), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(asg_w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cent_id")
    )
    probe_w = Window.partitionBy(q_id).orderBy(F.desc("_csim"), F.asc("cent_id"))
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col(q_vec), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select(q_id, q_vec, "cent_id")
    )
    cand = probes.join(assigned, on="cent_id")
    top_w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select(
            q_id, id_col,
            F.round(cosine_sim_col(F.col(vec_col), F.col(q_vec)), 6).alias("cosine"),
        )
        .withColumn("_rn", F.row_number().over(top_w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b): hyperplane-LSH
    bucket SELF-join, exact cosine verified only within buckets — the
    same block-then-verify shape as MinHash-LSH text dedupe, so 10^9
    embeddings never meet an all-pairs join. Recall is controlled by
    n_planes (fewer planes = bigger buckets = higher recall); exact
    duplicates and positive scalings always share a bucket (signs are
    scale-invariant)."""
    planes = _seeded_planes(dim, n_planes, seed)
    e = embeddings.withColumn("_sig", lsh_bucket_col(F.col(vec_col), planes))
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_sig")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_sig")
    j = a.join(b, on="_sig").filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine_sim_col(F.col("_va"), F.col("_vb")), 6)
    return (
        j.select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _flip_bit(sig, i: int):
    """Signature string with bit i flipped ('0'<->'1')."""
    flipped = F.when(F.substring(sig, i + 1, 1) == "1", "0").otherwise("1")
    return F.concat(F.substring(sig, 1, i), flipped, F.substring(sig, i + 2, 10**6))


def ann_lsh(
    queries: DataFrame,
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = False,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH signature, exact cosine
    within buckets. The bucket join shuffles only (sig) keys, so 10^9
    vectors never meet a cross join.

    Recall knobs: fewer planes = bigger buckets; multiprobe=True
    additionally probes every 1-bit-flipped signature per query
    (n_planes+1 buckets per query instead of 1 — standard multi-probe
    LSH, catching neighbors that land one hyperplane away). Only the
    QUERY side fans out; the corpus is still hashed once."""
    from pyspark.sql import Window

    planes = _seeded_planes(dim, n_planes, seed)
    e = embeddings.withColumn("_sig", lsh_bucket_col(F.col(vec_col), planes))
    base_sig = lsh_bucket_col(F.col(q_vec), planes)
    if multiprobe:
        # materialize the base signature as a column FIRST: flipping
        # references the attribute, so the n_planes dot products run
        # once per query row, not once per probe variant
        qd0 = queries.withColumn("_sig0", base_sig)
        sig0 = F.col("_sig0")
        probe_sigs = F.array(sig0, *[_flip_bit(sig0, i) for i in range(n_planes)])
        qd = qd0.withColumn("_sig", F.explode(probe_sigs)).drop("_sig0")
    else:
        qd = queries.withColumn("_sig", base_sig)
    j = qd.join(e, on="_sig", how="inner")
    sim = cosine_sim_col(F.col(vec_col), F.col(q_vec))
    cand = j.select(F.col(q_id), F.col(id_col), F.round(sim, 6).alias("cosine"))
    if multiprobe:
        cand = cand.distinct()  # a vector can meet a query via several probes
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def assign_cells(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell assignment (broadcast centroids, rounded
    cosine, cent_id tie-break — the kmeans_centroids determinism
    contract). Returns (id_col, _v double-array, cent_id),
    checkpointed so downstream passes don't replay the join."""
    from pyspark.sql import Window

    asg_w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cent_id"))
    return (
        embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .join(F.broadcast(centroids))
        .withColumn("_csim", F.round(cosine_sim_col(F.col("_v"), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(asg_w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "_v", "cent_id")
        .localCheckpoint(eager=True)
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    total_budget: int,
    alpha: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    kmeans_iters: int = 2,
    centroid_mod: int = 50,
    seed: str = "d4:42",
) -> DataFrame:
    """Topic-balanced sampling over embedding clusters (the
    diversification half of D4, Tirumala et al. 2023: after SemDeDup,
    rebalance CLUSTER shares so over-represented topics — boilerplate
    genres, SEO farms — stop dominating the mixture): k-means cells
    play the stratum role and the count^alpha temperature rule sets
    per-cell keep rates, with the deterministic md5-uniform keep pass.

    Scale shape: assignment is one broadcast join (no shuffle), rates
    are one cell-count aggregate + 1-row broadcast, the keep pass is
    map-side — the corpus is never shuffled.

    Returns (id_col, cent_id, rate, u, kept) — one auditable row per
    input vector.
    """
    from sandcrawler_spark.operators.sampling import (
        deterministic_sample,
        temperature_sample_rates,
    )

    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_iters=kmeans_iters, centroid_mod=centroid_mod,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = assign_cells(embeddings, centroids, id_col, vec_col).select(
        id_col, "cent_id"
    )
    rates = temperature_sample_rates(assigned, "cent_id", total_budget, alpha)
    return deterministic_sample(
        assigned, rates, "cent_id", id_col=id_col, seed=seed
    ).select(id_col, "cent_id", "rate", "u", "kept")


def semantic_dedupe(
    embeddings: DataFrame,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    kmeans_iters: int = 2,
    centroid_mod: int = 50,
    max_cell: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv 2303.09540): semantic
    deduplication via embedding clusters — k-means partitions the
    corpus, pairwise cosine runs ONLY within a cluster, and documents
    whose similarity exceeds eps collapse to one representative. This
    is the dedup tier ABOVE MinHash/SimHash: paraphrases and
    re-writes share no shingles but land in the same embedding
    neighborhood.

    Shapes reused from this module: the deterministic
    kmeans_centroids quantizer (broadcast assignment, rounded cosine,
    cent_id tie-breaks) and the large-star/small-star connected
    components from operators/dedupe (rep = min id of the eps-graph
    component, exactly the neardup_dedupe convention).

    Scale shape: all-pairs NEVER runs globally — only inside a
    cluster (the SemDeDup paper's key trick; cells average
    corpus/n_centroids). A degenerate mega-cluster (near-identical
    spam corpus) would still blow up the within-cell self-join, so
    cells larger than max_cell are excluded from pairing and their
    members kept as-is (the lsh_candidates hot-band discipline;
    excluded cells are the caller's signal to re-train with more
    centroids). CC runs on the eps-graph, which is pair-count-sized.

    Returns (id_col, cent_id, rep_id, is_rep) for every input row.
    """
    from sandcrawler_spark.operators.dedupe import connected_components

    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_iters=kmeans_iters, centroid_mod=centroid_mod,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = assign_cells(embeddings, centroids, id_col, vec_col)
    small_cells = (
        assigned.groupBy("cent_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_cell)
        .select("cent_id")
    )
    pairable = assigned.join(F.broadcast(small_cells), "cent_id")
    a = pairable.select(
        "cent_id", F.col(id_col).alias("id_a"), F.col("_v").alias("_va")
    )
    b = pairable.select(
        "cent_id", F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")
    )
    pairs = (
        a.join(b, "cent_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", F.round(cosine_sim_col(F.col("_va"), F.col("_vb")), 6))
        .where(F.col("_cos") >= F.lit(eps))
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    return (
        assigned.join(comp, assigned[id_col] == comp["id"], "left")
        .select(
            assigned[id_col],
            "cent_id",
            F.coalesce(comp["label"], assigned[id_col]).cast("long").alias("rep_id"),
        )
        .withColumn("is_rep", F.col("rep_id") == F.col(id_col))
    )


def host_topic_affinity(
    embeddings: DataFrame,
    host_col: str = "host",
    vec_col: str = "embedding",
    seed: DataFrame | None = None,
    seed_vec_col: str = "embedding",
) -> DataFrame:
    """Focused-crawl relevance (Chakrabarti et al. WWW'99): score every
    HOST by the cosine between its mean content embedding and a topic
    seed vector, so the frontier can prefer on-topic sites instead of
    only well-linked ones — the topical axis PageRank/OPIC cannot see.

    Determinism at any parallelism: per-document values are micro-
    rounded to int64 FIRST, so the per-(host, dim) sums are EXACT
    integers (addition of longs commutes — no float-order hazard, the
    embedding_pca sums-identity discipline) and bounded state
    (hosts x dim rows, never docs). The single float sequence per host
    — dot/(|V| |Q|) from DECIMAL(38) products — happens once, in the
    same order in both engines, then rounds to 6dp. The seed side is
    ONE row (mean of the seed set, same integer sums), broadcast.

    Returns (host, n_docs, affinity) sorted-free; affinity in [-1, 1]
    rounded to 6dp. Sum products ride DECIMAL(38): a host with 10^8
    docs has |component| <= 10^14, and the dot term 10^14 * 10^8
    overflows int64 — decimal keeps it exact.
    """
    micro = lambda c: F.expr(f"CAST(round({c} * 1000000) AS BIGINT)")  # noqa: E731

    def _sums(df: DataFrame, group: list[str]) -> DataFrame:
        ex = df.select(
            *group, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_v")
        )
        return ex.groupBy(*group, "pos").agg(
            F.sum(micro("_v")).cast("long").alias("s"),
            F.count("*").cast("long").alias("n"),
        )

    if seed is None:
        raise ValueError("seed DataFrame of topic exemplar vectors is required")
    hv = _sums(embeddings.select(F.col(host_col).alias("host"), vec_col), ["host"])
    qv = (
        seed.select(F.posexplode(F.col(seed_vec_col).cast("array<double>")).alias("pos", "_v"))
        .groupBy("pos")
        .agg(F.sum(micro("_v")).cast("long").alias("q"))
    )
    j = hv.join(F.broadcast(qv), "pos")
    agg = j.groupBy("host").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * q")).alias("_dot"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s")).alias("_vv"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * q")).alias("_qq"),
    )
    return agg.select(
        "host",
        "n_docs",
        F.when(
            (F.col("_vv") == 0) | (F.col("_qq") == 0), F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_vv").cast("double"))
                    * F.sqrt(F.col("_qq").cast("double"))
                ),
                6,
            )
        )
        .alias("affinity"),
    )


def hard_negatives(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    lo: float = 0.30,
    hi: float = 0.95,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive-pair mining: per anchor the top-k most-similar
    corpus rows INSIDE a cosine band [lo, hi) — similar enough to be
    hard (above random-pair similarity), dissimilar enough not to be a
    positive/near-duplicate (below the dedup threshold). The standard
    negatives mined for training retrieval/embedding models (DPR/ANCE
    practice) — the curation op that sits between ANN search (takes
    the TOP, including positives) and semantic dedupe (REMOVES the
    top).

    Same scale shape as knn_join (broadcast anchors, two-level exact
    top-k — no single-task-per-query window), with the band filter
    applied BEFORE ranking so the level-1 state is only banded rows.
    Self-pairs (anchor drawn from the corpus) are excluded by id.
    Rounded-cosine compare + id tie-break keeps it layout-independent
    and oracle-exact.
    """
    from pyspark.sql import Window

    j = embeddings.join(F.broadcast(queries))
    sim = F.round(cosine_sim_col(F.col(vec_col), F.col(q_vec)), 6)
    scored = (
        j.select(
            F.col(q_id),
            F.col(id_col),
            sim.alias("cosine"),
            F.spark_partition_id().alias("_part"),
        )
        .filter((F.col("cosine") >= lo) & (F.col("cosine") < hi))
        .filter(F.col(q_id) != F.col(id_col))
    )
    order = (F.desc("cosine"), F.asc(id_col))
    w1 = Window.partitionBy(q_id, "_part").orderBy(*order)
    partial = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_part")
    )
    w2 = Window.partitionBy(q_id).orderBy(*order)
    return (
        partial.drop("_rn")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
