"""Diversity-maximizing coreset selection: greedy k-center over
embeddings (farthest-point traversal).

Deduplication removes near-identical documents; the complementary
curation op PICKS a maximally diverse subset — seed sets for active
learning, eval-probe selection, centroid seeding (the 2-approximation
of the k-center objective, Gonzalez 1985 — public algorithm). The
reference's pipeline has no embedding ops (pre-dates them); this
extends its scoring/sampling stage family (SURVEY §2.10) the way
corpus_sample/temperature_mix extend its sampling.

Determinism contract (the repo's ANN discipline): cosine computed as
a left-fold F.aggregate (same FP op order as the DuckDB oracle's
list_reduce), rounded once to 6 digits; all comparisons on the
rounded value with vec_id ascending tie-breaks. Start = min vec_id;
each round selects the not-yet-selected point with the SMALLEST max
cosine to the selected set (i.e. the farthest point), carrying that
cosine out as far_cos (the coverage radius curve).

Scale shape at 100 TB: k driver rounds, each a NARROW map over the
corpus (greatest(running_ms, cos-to-newest-center) with the center
vector inlined as a literal — no join, no shuffle) followed by a
TakeOrdered(1) argmin; running state is localCheckpointed so the plan
stays flat. Driver holds only k ids — never data. O(k) passes is the
canonical distributed form of greedy k-center (scalable variants
batch it; k here is a small constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

from sandcrawler_spark.operators.similarity import cosine_sim_col

_OUT_SCHEMA = StructType(
    [
        StructField("sel_rank", IntegerType(), False),
        StructField("vec_id", LongType(), False),
        StructField("far_cos", DoubleType(), False),
    ]
)


def kcenter_select(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center: k rows (sel_rank, vec_id, far_cos); far_cos is
    the selected point's max cosine to all previously selected centers
    (-2.0 sentinel for the seed point, which has none)."""
    spark = embeddings.sparkSession
    cur = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.lit(-2.0).alias("ms"),
    ).localCheckpoint(eager=True)

    first = cur.orderBy("vec_id").select("vec_id", "v").first()
    if first is None:
        return spark.createDataFrame([], _OUT_SCHEMA)
    selected = [(1, int(first["vec_id"]), -2.0)]
    center_vec = list(first["v"])

    for rank in range(2, k + 1):
        lit_vec = F.array(*[F.lit(float(x)) for x in center_vec])
        cur = cur.withColumn(
            "ms",
            F.greatest("ms", F.round(cosine_sim_col(F.col("v"), lit_vec), 6)),
        ).localCheckpoint(eager=True)
        chosen = set(r[1] for r in selected)
        nxt = (
            cur.filter(~F.col("vec_id").isin(*chosen))
            .orderBy(F.col("ms").asc(), F.col("vec_id").asc())
            .select("vec_id", "ms", "v")
            .first()
        )
        if nxt is None:
            break
        selected.append((rank, int(nxt["vec_id"]), float(nxt["ms"])))
        center_vec = list(nxt["v"])

    return spark.createDataFrame(selected, _OUT_SCHEMA)
