"""Product quantization (PQ) for embedding compression + ADC search.

The third ANN tier next to hyperplane-LSH and IVF (similarity.py):
split each D-dim vector into `m` subspaces of D/m dims, k-means each
subspace independently, and store a vector as m small integer codes
(its nearest sub-centroid per subspace). A query then scans the CODE
table — m bytes per vector instead of 4*D — using asymmetric distance
computation (ADC): per query, a tiny (m x ksub) lookup table of
query-subvector -> centroid distances is precomputed, and the
approximate distance of any stored vector is m table lookups summed.

Scale shape (the reason PQ exists at 10^9+ vectors):
  * training touches the corpus `n_iters` times but exchanges only
    centroid-sized state (subspace cells are corpus/centroid_mod rows);
  * the trained codebook is tiny (m * ksub * D/m doubles) -> collected
    once and folded into the ENCODE expression as literals, so
    encoding is a single narrow pass — zero shuffle, full codegen;
  * the ADC scan streams the code table once per query batch with the
    per-query LUT as a broadcast-joined literal array; top-k is the
    same two-level (partition-partial then k*P final) reduction as
    knn_join — no single-task window at any corpus size.

Determinism contract (what the DuckDB twin replays byte-for-byte):
distances are squared L2 in INTEGER MICRO-UNITS (round(1e6 * d2) as
bigint) with cent_id tie-breaks, and the Lloyd centroid update folds
each cell in sorted-vec_id order (float addition is not associative)
and rounds means to 6 — the kmeans_centroids discipline
(similarity.py) applied per subspace.

Reference anchor: the reference has no ANN/PQ (sandcrawler's joins are
exact key joins, e.g. scalding/.../ScoreJob.scala); this extends the
engine for the training-data-pipeline similarity family the brief
requires.
"""

from __future__ import annotations

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


def pq_train(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    n_iters: int = 2,
    centroid_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace deterministic k-means. Returns the codebook
    (sub, cent_id, cent_vec) with cent_vec of length dim/m.

    Init = the id-mod sample's subvectors (same seedless-reproducible
    init as ivf_topk). All m subspaces train in ONE distributed pass
    per iteration: rows are exploded to (id, sub, subvec) and the
    assignment join carries `sub` in the key, so no per-subspace job
    submission — m is a column, not a loop.
    """
    from pyspark.sql import Window

    assert dim % m == 0, "dim must divide into m subspaces"
    subdim = dim // m
    sub_structs = F.array(*[
        F.struct(F.lit(s).alias("sub"),
                 _subvec(F.col(vec_col).cast("array<double>"), s, subdim).alias("sv"))
        for s in range(m)
    ])
    esub = embeddings.select(
        F.col(id_col), F.inline(sub_structs)
    ).select(F.col(id_col), "sub", "sv")
    cents = esub.filter(F.col(id_col) % centroid_mod == 0).select(
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
    return cents.select("sub", "cent_id", "cv")


def collect_codebook(cents: DataFrame, m: int) -> list[list[tuple[int, list[float]]]]:
    """Driver-side codebook: per sub, [(cent_id, cv), ...] sorted by
    cent_id — the dense code of a centroid is its index in this list.
    Tiny by construction (m * ksub rows), so collecting is the point:
    the encoder folds it into literal expressions."""
    rows = cents.collect()
    book: list[list[tuple[int, list[float]]]] = [[] for _ in range(m)]
    for r in rows:
        book[r["sub"]].append((int(r["cent_id"]), [float(x) for x in r["cv"]]))
    for s in range(m):
        book[s].sort(key=lambda t: t[0])
    return book


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def pq_encode(
    embeddings: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) — codes[s] = dense index of the nearest
    sub-centroid in subspace s. Pure narrow expression (the codebook is
    literals): zero shuffle, whole-stage codegen, one corpus scan.
    Argmin = array_min over (dist_micro, dense_code) structs — struct
    ordering gives the cent_id tie-break because the book is
    cent_id-sorted."""
    m = len(book)
    subdim = dim // m
    v = F.col(vec_col).cast("array<double>")
    code_cols = []
    for s in range(m):
        sv = _subvec(v, s, subdim)
        cands = F.array(*[
            F.struct(
                _sq_l2_micro(sv, _lit_vec(cv)).alias("d"),
                F.lit(code).alias("c"),
            )
            for code, (_cid, cv) in enumerate(book[s])
        ])
        code_cols.append(F.array_min(cands)["c"])
    return embeddings.select(F.col(id_col), F.array(*code_cols).alias("codes"))


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
    """Asymmetric-distance top-k: per query, LUT[s][c] = micro-dist of
    the query's subvector s to centroid c (computed once per query row
    as a literal-codebook expression), then every stored vector costs
    m lookups: adist = sum_s LUT[s][codes[s]].

    The LUT columns ride the (small) query side of a broadcast join;
    the code table streams through in one stage. Two-level top-k keeps
    per-query work spread across scan partitions (knn_join shape)."""
    from pyspark.sql import Window

    m = len(book)
    subdim = dim // m
    qv = F.col(q_vec).cast("array<double>")
    lut_cols = [
        F.array(*[
            _sq_l2_micro(_subvec(qv, s, subdim), _lit_vec(cv))
            for (_cid, cv) in book[s]
        ]).alias(f"_lut{s}")
        for s in range(m)
    ]
    qd = queries.select(F.col(q_id), *lut_cols)
    j = codes.join(F.broadcast(qd))
    adist = None
    for s in range(m):
        term = F.element_at(F.col(f"_lut{s}"), F.element_at(F.col("codes"), s + 1) + 1)
        adist = term if adist is None else adist + term
    scored = j.select(
        F.col(q_id), F.col(id_col), adist.cast("long").alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    order = (F.asc("adist_micro"), F.asc(id_col))
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
    from pyspark.sql import Window

    j = embeddings.join(F.broadcast(queries))
    scored = j.select(
        F.col(q_id), F.col(id_col),
        _sq_l2_micro(F.col(vec_col), F.col(q_vec)).alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    order = (F.asc("adist_micro"), F.asc(id_col))
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


def ivfpq_topk(
    queries: DataFrame,
    embeddings: DataFrame,
    book: list[list[tuple[int, list[float]]]],
    dim: int,
    k: int = 5,
    centroid_mod: int = 25,
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

    Coarse routing uses the same deterministic id-mod centroids and
    rounded-cosine assignment as ivf_topk (similarity.py), so the cell
    layout is engine-reproducible; ADC distances are integer
    micro-units with (adist, id) ordering. Two-level top-k per query.

    Scale shape: centroids broadcast twice (assignment + probe), ONE
    equi-join on cent_id between the probe set and the code table,
    no all-pairs anywhere; the codes table carries its cell id so
    repeated query batches reuse one encode+assign pass
    (localCheckpoint it at the call site for that).
    """
    from pyspark.sql import Window

    from sandcrawler_spark.operators.similarity import cosine_sim_col

    m = len(book)
    subdim = dim // m
    cents = embeddings.filter(F.col(id_col) % centroid_mod == 0).select(
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
    qv = F.col(q_vec).cast("array<double>")
    lut_cols = [
        F.array(*[
            _sq_l2_micro(_subvec(qv, s, subdim), _lit_vec(cv))
            for (_cid, cv) in book[s]
        ]).alias(f"_lut{s}")
        for s in range(m)
    ]
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col(q_vec), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select(q_id, *lut_cols, "cent_id")
    )
    j = codes.join(F.broadcast(probes), on="cent_id")
    adist = None
    for s in range(m):
        term = F.element_at(F.col(f"_lut{s}"), F.element_at(F.col("codes"), s + 1) + 1)
        adist = term if adist is None else adist + term
    scored = j.select(
        F.col(q_id), F.col(id_col), adist.cast("long").alias("adist_micro"),
        F.spark_partition_id().alias("_part"),
    )
    order = (F.asc("adist_micro"), F.asc(id_col))
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
    from pyspark.sql import Window

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
    order = (F.asc("sqdist_code"), F.asc(id_col))
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
