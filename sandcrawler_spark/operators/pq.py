"""Product quantization (PQ) for embedding compression + ADC search.

The third ANN tier next to hyperplane-LSH and IVF (similarity.py):
split each D-dim vector into `m` subspaces of D/m dims, k-means each
subspace independently, and store a vector as m small integer codes
(its nearest sub-centroid per subspace). A query then scans the CODE
table — m bytes per vector instead of 4*D — using asymmetric distance
computation (ADC): per query, a tiny (m x ksub) lookup table of
query-subvector -> centroid distances is precomputed, and the
approximate distance of any stored vector is m table lookups summed.

Scale shape (the reason PQ exists at 10^9+ vectors) — every piece of
trained state is CORPUS-SIZE-INDEPENDENT by construction:
  * ksub is FIXED (default 16 here, 256 in production FAISS-style
    setups) and training runs over a bounded deterministic sample
    (`vec_id % stride == 0` with stride = max(1, n // sample_cap)),
    so each Lloyd iteration exchanges <= sample_cap * m rows and the
    codebook is exactly m * ksub rows no matter how big the corpus is;
  * the codebook is carried as a BROADCAST RELATION joined on
    (sub, code) — never inlined as literal expressions — so the
    physical plan's size is constant in n (a literal codebook would
    also blow the JVM codegen method limit at ksub=256);
  * encoding = one explode + broadcast join + per-(id,sub) min
    aggregate (map-side combine keeps the shuffle at n*m tiny rows);
  * the ADC scan precomputes per-query LUT ARRAYS (m x ksub bigints,
    built by the same broadcast join), broadcasts the query side, and
    scores each stored vector with m `element_at` lookups via one
    zip_with/aggregate expression — narrow, constant plan size;
    top-k is the same two-level (partition-partial then k*P final)
    reduction as knn_join — no single-task window at any corpus size;
  * IVF-PQ coarse cells are CAPPED at `max_cells` (stride =
    max(centroid_mod, ceil(n / max_cells))), so the centroid broadcast
    stops growing once the corpus passes centroid_mod * max_cells.

Determinism contract (what the DuckDB twin replays byte-for-byte):
distances are squared L2 in INTEGER MICRO-UNITS (round(1e6 * d2) as
bigint) with dense-code (== cent_id order) tie-breaks, and the Lloyd
centroid update folds each cell in sorted-vec_id order (float addition
is not associative) and rounds means to 6 — the kmeans_centroids
discipline (similarity.py) applied per subspace. The training sample,
seeds (the ksub smallest sampled ids), and coarse stride are all pure
functions of (n, sample_cap, ksub), so the twin recomputes them from
COUNT(*) alone.

Reference anchor: the reference has no ANN/PQ (sandcrawler's joins are
exact key joins, e.g. scalding/.../ScoreJob.scala); this extends the
engine for the training-data-pipeline similarity family the brief
requires.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000  # fixed-point distance unit (1e-6 resolution)


def _sq_l2_micro(a, b):
    """round(1e6 * sum((a_i-b_i)^2)) as bigint — engine-exact ordering."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(d2 * MICRO).cast("long")


def _subvec(vec_col, sub: int, subdim: int):
    # F.slice start is 1-based
    return F.slice(vec_col, sub * subdim + 1, subdim)


def _explode_subvectors(df: DataFrame, dim: int, m: int, id_col: str, vec_col: str):
    """(id, sub, sv) — one row per subspace per vector. Narrow."""
    subdim = dim // m
    sub_structs = F.array(*[
        F.struct(F.lit(s).alias("sub"),
                 _subvec(F.col(vec_col).cast("array<double>"), s, subdim).alias("sv"))
        for s in range(m)
    ])
    return df.select(F.col(id_col), F.inline(sub_structs)).select(
        F.col(id_col), "sub", "sv"
    )


def train_stride(n: int, sample_cap: int) -> int:
    """The deterministic sample stride: every vec_id % stride == 0 row
    trains. Pure function of (n, sample_cap) so the DuckDB twin
    recomputes it from COUNT(*)."""
    return max(1, n // sample_cap)


def coarse_stride(n: int, centroid_mod: int, max_cells: int) -> int:
    """IVF cell stride with the cell-count cap: id-mod seeding keeps
    the classic centroid_mod behavior on small corpora, but once
    n / centroid_mod would exceed max_cells the stride grows so the
    centroid relation (and its broadcast) stays <= max_cells rows."""
    return max(centroid_mod, math.ceil(n / max_cells))


def pq_train(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    n_iters: int = 2,
    ksub: int = 16,
    sample_cap: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace deterministic k-means over a BOUNDED sample.
    Returns the codebook (sub, cent_id, code, cv) with cv of length
    dim/m and code = dense 0..ksub-1 index (cent_id-sorted per sub).

    Bounded discipline: the training set is the id-mod sample
    (stride = max(1, n // sample_cap), so <= ~2*sample_cap rows at any
    corpus size) and the seeds are the ksub smallest sampled ids
    (TakeOrdered over the sample — distributed partial top-k, never a
    full sort). All m subspaces train in ONE distributed pass per
    iteration: sample rows are exploded to (id, sub, subvec) and the
    assignment join carries `sub` in the key, so no per-subspace job
    submission — m is a column, not a loop. Per-iteration exchanged
    state is <= sample_cap * m rows; the codebook is exactly
    <= m * ksub rows independent of n.
    """
    from pyspark.sql import Window

    assert dim % m == 0, "dim must divide into m subspaces"
    n = embeddings.count()
    stride = train_stride(n, sample_cap)
    samp = embeddings.filter(F.col(id_col) % stride == 0)
    esub = _explode_subvectors(samp, dim, m, id_col, vec_col)
    seed_ids = samp.select(F.col(id_col)).orderBy(F.asc(id_col)).limit(ksub)
    cents = esub.join(F.broadcast(seed_ids), on=id_col).select(
        "sub", F.col(id_col).alias("cent_id"), F.col("sv").alias("cv")
    )
    asg_w = Window.partitionBy(id_col, "sub").orderBy(F.asc("_d"), F.asc("cent_id"))
    for _ in range(n_iters):
        assigned = (
            esub.join(F.broadcast(cents), on="sub")
            .withColumn("_d", _sq_l2_micro(F.col("sv"), F.col("cv")))
            .withColumn("_rn", F.row_number().over(asg_w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col).alias("_id"), "sub", F.col("sv").alias("_v"), "cent_id")
        )
        ex = assigned.select(
            "sub", "cent_id", "_id", F.posexplode(F.col("_v")).alias("pos", "val")
        )
        dimsum = ex.groupBy("sub", "cent_id", "pos").agg(
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
            dimsum.withColumn("mn", F.round(F.col("s") / F.col("n"), 6))
            .groupBy("sub", "cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    # dense code = position in cent_id order per subspace (window over
    # <= ksub rows per sub — bounded)
    code_w = Window.partitionBy("sub").orderBy(F.asc("cent_id"))
    return cents.withColumn(
        "code", (F.row_number().over(code_w) - 1).cast("int")
    ).select("sub", "cent_id", "code", "cv")


def collect_codebook(cents: DataFrame, m: int) -> list[list[tuple[int, list[float]]]]:
    """Driver-side codebook: per sub, [(cent_id, cv), ...] sorted by
    cent_id — the dense code of a centroid is its index in this list.
    Bounded by construction now (<= m * ksub rows, corpus-size
    independent), so collecting is legitimate driver-sized state; the
    encoder re-materializes it as a broadcast RELATION, never as
    literal expressions."""
    rows = cents.collect()
    book: list[list[tuple[int, list[float]]]] = [[] for _ in range(m)]
    for r in rows:
        book[r["sub"]].append((int(r["cent_id"]), [float(x) for x in r["cv"]]))
    for s in range(m):
        book[s].sort(key=lambda t: t[0])
    return book


def book_df(spark, book: list[list[tuple[int, list[float]]]]) -> DataFrame:
    """The codebook as a relation (sub, code, cv) — the broadcast-join
    side for encode/LUT. <= m * ksub rows."""
    rows = [
        (s, code, [float(x) for x in cv])
        for s, subl in enumerate(book)
        for code, (_cid, cv) in enumerate(subl)
    ]
    return spark.createDataFrame(rows, "sub int, code int, cv array<double>")


def pq_encode(
    embeddings: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) — codes[s] = dense index of the nearest
    sub-centroid in subspace s. The codebook rides a BROADCAST join on
    `sub` (plan size constant in both n and ksub); argmin per (id, sub)
    is min(struct(dist_micro, code)) — a hash aggregate with map-side
    combine, so the shuffle carries only n*m tiny (id, sub, code)
    rows; the final per-id pivot to the m-length code array is a
    second keyed aggregate over m-row groups. Struct-min ordering gives
    the cent_id tie-break because codes are cent_id-sorted."""
    m = len(book)
    bdf = book_df(embeddings.sparkSession, book)
    esub = _explode_subvectors(embeddings, dim, m, id_col, vec_col)
    best = (
        esub.join(F.broadcast(bdf), on="sub")
        .select(
            F.col(id_col), F.col("sub"),
            F.struct(
                _sq_l2_micro(F.col("sv"), F.col("cv")).alias("d"),
                F.col("code").alias("c"),
            ).alias("_cand"),
        )
        .groupBy(id_col, "sub")
        .agg(F.min("_cand")["c"].alias("c"))
    )
    return best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "c"))), lambda s: s["c"]
        ).alias("codes")
    )


def query_luts(
    queries: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """(q_id, _lut: array<array<bigint>>) — _lut[s][c] = micro-dist of
    the query's subvector s to codeword c. Built with the same
    broadcast codebook join (n_q * m * ksub rows total — query-sized),
    then pivoted to per-query LUT arrays so the ADC scan is m
    element_at lookups per stored vector."""
    m = len(book)
    bdf = book_df(queries.sparkSession, book)
    qsub = _explode_subvectors(queries, dim, m, q_id, q_vec)
    per_sub = (
        qsub.join(F.broadcast(bdf), on="sub")
        .select(
            F.col(q_id), F.col("sub"), F.col("code"),
            _sq_l2_micro(F.col("sv"), F.col("cv")).alias("d"),
        )
        .groupBy(q_id, "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "d"))), lambda s: s["d"]
            ).alias("lrow")
        )
    )
    return per_sub.groupBy(q_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "lrow"))), lambda s: s["lrow"]
        ).alias("_lut")
    )


def _adc_dist(codes_col, lut_col):
    """sum_s lut[s][codes[s]] — the m-lookup ADC distance as one
    zip_with/aggregate expression (constant plan size in m and ksub)."""
    return F.aggregate(
        F.zip_with(codes_col, lut_col, lambda c, lrow: F.element_at(lrow, c + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _two_level_topk(scored: DataFrame, k: int, q_id: str, id_col: str,
                    dist_col: str) -> DataFrame:
    from pyspark.sql import Window

    order = (F.asc(dist_col), F.asc(id_col))
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


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: per-query LUT arrays (query_luts)
    ride the broadcast side; every stored vector costs m lookups
    summed by one zip_with/aggregate. Two-level top-k keeps per-query
    work spread across scan partitions (knn_join shape)."""
    qd = query_luts(queries, book, dim, q_id=q_id, q_vec=q_vec)
    j = codes.join(F.broadcast(qd))
    scored = j.select(
        F.col(q_id), F.col(id_col),
        _adc_dist(F.col("codes"), F.col("_lut")).alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    return _two_level_topk(scored, k, q_id, id_col, "adist_micro")


def exact_l2_topk(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k (micro-units) — the truth side for PQ
    recall. Same two-level reduction."""
    j = embeddings.join(F.broadcast(queries))
    scored = j.select(
        F.col(q_id), F.col(id_col),
        _sq_l2_micro(F.col(vec_col), F.col(q_vec)).alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    return _two_level_topk(scored, k, q_id, id_col, "adist_micro")


def ivfpq_topk(
    queries: DataFrame,
    embeddings: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    k: int = 5,
    centroid_mod: int = 25,
    max_cells: int = 4096,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composite tier (Jégou et al. TPAMI'11, the production
    billion-scale layout): the IVF coarse quantizer routes a query to
    its `nprobe` nearest cells, and inside those cells distance is the
    ADC code scan — so per query the work is nprobe/ncells of the
    CODE table (m bytes/vector), not of the raw vectors, and not of
    the whole corpus. Vectors are PQ-encoded directly (no residual
    subtraction — the by_residual=false variant), which keeps the
    code table reusable by the flat ADC scan and the oracle replay
    exact.

    Coarse routing uses deterministic id-mod centroids with the cell
    CAP (stride = max(centroid_mod, ceil(n / max_cells)), so the
    centroid broadcast never exceeds max_cells rows) and the same
    rounded-cosine assignment as ivf_topk (similarity.py); ADC
    distances are integer micro-units with (adist, id) ordering.
    Two-level top-k per query.

    Scale shape: centroids broadcast twice (assignment + probe), ONE
    equi-join on cent_id between the probe set and the code table,
    no all-pairs anywhere; the codes table carries its cell id so
    repeated query batches reuse one encode+assign pass
    (localCheckpoint it at the call site for that).
    """
    from pyspark.sql import Window

    from sandcrawler_spark.operators.similarity import cosine_sim_col

    n = embeddings.count()
    stride = coarse_stride(n, centroid_mod, max_cells)
    cents = embeddings.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )
    asg_w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cent_id"))
    cells = (
        embeddings.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col(vec_col), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(asg_w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cent_id")
    )
    codes = pq_encode(embeddings, book, dim, id_col=id_col, vec_col=vec_col).join(
        cells, id_col
    )
    probe_w = Window.partitionBy(q_id).orderBy(F.desc("_csim"), F.asc("cent_id"))
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col(q_vec), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select(q_id, "cent_id")
    )
    qd = query_luts(queries, book, dim, q_id=q_id, q_vec=q_vec)
    probe_lut = probes.join(qd, on=q_id)  # nprobe rows per query
    j = codes.join(F.broadcast(probe_lut), on="cent_id")
    scored = j.select(
        F.col(q_id), F.col(id_col),
        _adc_dist(F.col("codes"), F.col("_lut")).alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    return _two_level_topk(scored, k, q_id, id_col, "adist_micro")


# ---------------------------------------------------------------------------
# SQ8: scalar quantization (per-dimension 8-bit), the third classic
# compression tier next to PQ/IVFPQ — 4x smaller than float32 with a
# trivially vectorizable distance. Distances here are SYMMETRIC in
# code space (both sides quantized): every term is an integer, so the
# DuckDB twin is exact by construction (no float-fold ordering to
# match). Scale shape: bounds = one explode + per-dim agg (dim rows);
# encode = pure codegen transform; search = broadcast the (tiny)
# query-code side over the code table with two-level top-k.
# ---------------------------------------------------------------------------

def sq_bounds(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) training pass, driver-collected
    (dim-sized — the codebook analog)."""
    ex = embeddings.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val")
    )
    rows = ex.groupBy("pos").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    ).collect()
    return [(r.lo, r.hi) for r in sorted(rows, key=lambda r: r.pos)]


def sq_encode_col(vec_col, bounds: list[tuple[float, float]]):
    """array<double> -> array<int> of 8-bit codes:
    code_d = clamp(floor(((x - lo_d) * 255.0) / (hi_d - lo_d)), 0, 255)
    (0 when the dimension is constant). The (x-lo)*255/rng operation
    ORDER is part of the contract — the oracle replays it verbatim."""
    los = F.array(*[F.lit(float(lo)) for lo, _ in bounds])
    rngs = F.array(*[F.lit(float(hi - lo)) for lo, hi in bounds])

    def _code(x, i):
        lo = F.element_at(los, i + 1)
        rng = F.element_at(rngs, i + 1)
        raw = F.floor(((x - lo) * F.lit(255.0)) / rng).cast("int")
        return F.when(rng == 0.0, F.lit(0)).otherwise(
            F.least(F.lit(255), F.greatest(F.lit(0), raw))
        )

    return F.transform(F.col(vec_col).cast("array<double>"), _code)


def sq_topk(
    queries: DataFrame,
    codes: DataFrame,
    bounds: list[tuple[float, float]],
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    code_col: str = "sq_codes",
) -> DataFrame:
    """Top-k by symmetric code-space L2: quantize the query with the
    same bounds, then dist = sum_d (qcode_d - code_d)^2 — all-integer.
    Two-level top-k (per scan partition, then k*P reduction) keeps
    per-query work spread across partitions (the knn_join fix shape)."""
    qd = queries.select(
        F.col(q_id), sq_encode_col(q_vec, bounds).alias("_qc")
    )
    j = codes.join(F.broadcast(qd))
    dist = F.aggregate(
        F.zip_with(F.col(code_col), F.col("_qc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = j.select(
        F.col(q_id),
        F.col(id_col),
        dist.cast("long").alias("sqdist_code"),
        F.spark_partition_id().alias("_part"),
    )
    return _two_level_topk(scored, k, q_id, id_col, "sqdist_code")


def sq_oracle_sql(n_q: int = 5, k: int = 5) -> str:
    """DuckDB twin of bounds -> encode -> symmetric-code top-k over
    the `embeddings` view: relational explode with per-dim bounds
    join, the same ((x-lo)*255.0)/rng floor/clamp, integer distance."""
    return f"""
WITH ex AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
b AS (SELECT pos, MIN(val) AS lo, MAX(val) AS hi FROM ex GROUP BY pos),
codes AS (
  SELECT e.vec_id, e.pos,
         CASE WHEN b.hi - b.lo = 0 THEN 0
              ELSE least(255, greatest(0,
                CAST(floor(((e.val - b.lo) * 255.0) / (b.hi - b.lo)) AS INT)))
         END AS c
  FROM ex e JOIN b USING (pos)
),
q AS (SELECT vec_id AS q_id, pos, c AS qc FROM codes WHERE vec_id < {n_q}),
d AS (
  SELECT q.q_id, c.vec_id,
         CAST(SUM(CAST((q.qc - c.c) * (q.qc - c.c) AS BIGINT)) AS BIGINT) AS sqdist_code
  FROM codes c JOIN q ON c.pos = q.pos
  GROUP BY q.q_id, c.vec_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id, sqdist_code
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sqdist_code ASC, vec_id ASC) AS rn
  FROM d
) WHERE rn <= {k}
""".strip()
