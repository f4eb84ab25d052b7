"""Per-phase profile of the bench frontier round at one parallelism
level: times successive prefixes of the round's DAG so the difference
between prefixes isolates each phase's cost. Used to find non-scaling
(fixed) terms in the N->4N measurement.

Usage: python tools/profile_frontier.py <cpus> [widen] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    widen = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    import bench
    from sandcrawler_spark.functions.extract_text import extract_text_udf
    from sandcrawler_spark.operators.politeness import schedule_politeness
    from sandcrawler_spark.operators.seen import unseen_bloom_exact
    from sandcrawler_spark.session import get_spark

    spark = get_spark("profile_frontier", master=f"local[{cpus}]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    state = bench.frontier_setup(spark, sf_dir, widen=widen)
    frontier, seen, bloom, bloom_bc, robots, pages, n_pages = state

    def phases():
        out = {}
        t0 = time.time()
        unseen = unseen_bloom_exact(
            frontier, seen, bloom, "canon_url", 64, strategy="broadcast",
            materialize=True, bloom_bc=bloom_bc,
        )
        out["p1_seen_filter"] = time.time() - t0

        t0 = time.time()
        sched = schedule_politeness(
            unseen.withColumn("url", F.col("canon_url")), robots,
            hot_threshold=10_000, n_salts=16,
        )
        par = spark.sparkContext.defaultParallelism * 4
        small = sched.select("canon_url").repartition(par).localCheckpoint(eager=True)
        out["p2_politeness"] = time.time() - t0

        t0 = time.time()
        keyed = small.withColumn(
            "page_id", F.pmod(F.xxhash64("canon_url"), F.lit(n_pages))
        )
        fetched = keyed.join(F.broadcast(pages), on="page_id", how="inner")
        n = fetched.count()
        out["p3_fetch_join"] = time.time() - t0

        t0 = time.time()
        extracted = fetched.select(
            "canon_url",
            F.sha1(F.col("html")).alias("sha1hex"),
            extract_text_udf(F.col("html")).alias("_ex"),
        )
        extracted.agg(F.count("*"), F.sum("_ex.word_count")).collect()
        out["p4_fetch_extract_agg"] = time.time() - t0
        out["rows"] = n
        return out

    jsc = spark.sparkContext._jsc.sc()

    def persistent_ids():
        ids, it = set(), jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            ids.add(it.next()._1())
        return ids

    keep = persistent_ids()

    def clear():
        it = jsc.getPersistentRDDs().iterator()
        drop = []
        while it.hasNext():
            kv = it.next()
            if kv._1() not in keep:
                drop.append(kv._2())
        for rdd in drop:
            rdd.unpersist(False)

    for i in range(reps + 1):  # rep 0 = warm-up
        clear()
        t0 = time.time()
        p = phases()
        p["total"] = round(time.time() - t0, 2)
        tag = "warm" if i == 0 else f"rep{i}"
        print(
            f"[{tag}] cpus={cpus} widen={widen} "
            + " ".join(
                f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in p.items()
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
