"""Synthesize a larger scale factor from an existing testdata dir by
coherent replication: every table is unioned N times, with all join-key
columns shifted by rep * OFFSET so copy i only ever joins copy i — the
relational structure (fan-outs, selectivities, per-host group sizes)
is preserved while row counts scale by N.

Text/document content is salted per rep (a "rep<i>" token woven into
the text) so content-addressed operators (fingerprint/minhash/simhash
dedupe) don't see N exact copies of every document — the dup-class
distribution stays comparable to the source SF rather than exploding
by N^2 in the LSH self-join.

Usage:
    python tools/make_sf.py /root/testdata/sf0.1 /root/repo/benchdata/sf1.0 10

Used for the r4 sf1.0 bench leg (VERDICT item 10): the 10x data step
must hold the plans — no new shuffles, no memory cliffs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key columns to shift (per-rep disjoint id spaces keep joins coherent)
KEY_SUFFIXES = ("key",)
KEY_NAMES = {"event_id", "user_id", "doc_id", "vec_id"}
# tiny dimensions replicated as-is (their keys are the join targets of
# *_nationkey/_regionkey which we do NOT shift — see below)
STATIC_TABLES = {"region", "nation"}
STATIC_KEYS = {"n_nationkey", "n_regionkey", "r_regionkey",
               "c_nationkey", "s_nationkey"}
TEXT_COLS = {"documents": "text"}


def scale_dir(src: str, dst: str, n_reps: int) -> None:
    from pyspark.sql import functions as F

    from sandcrawler_spark.session import get_spark

    spark = get_spark("make_sf")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(sp):
            continue
        df = spark.read.parquet(sp)
        out_path = os.path.join(dst, f"{t}.parquet")
        if t in STATIC_TABLES:
            df.write.mode("overwrite").parquet(out_path)
            continue
        n_src = df.count()
        offset = 10 ** (len(str(n_src * 4)))  # clear of the source id space
        rep = F.explode(F.array(*[F.lit(i) for i in range(n_reps)])).alias("_rep")
        wide = df.select("*", rep)
        for c, dt in df.dtypes:
            if c in STATIC_KEYS:
                continue
            if dt == "bigint" and (c.endswith(KEY_SUFFIXES) or c in KEY_NAMES):
                wide = wide.withColumn(c, F.col(c) + F.col("_rep") * F.lit(offset))
        tc = TEXT_COLS.get(t)
        if tc is not None:
            # weave the rep marker into the text head so shingles differ
            wide = wide.withColumn(
                tc,
                F.concat(F.lit("rep"), F.col("_rep").cast("string"), F.lit(" "),
                         F.col(tc)),
            )
        (
            wide.drop("_rep")
            .repartition(max(4, n_reps * 2))
            .write.mode("overwrite")
            .parquet(out_path)
        )
        print(f"{t}: {n_src} -> {n_src * n_reps}")
    spark.stop()


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, n)
