"""Bucketed co-located join receipt: the pre-partitioning lever for
repeated big-big joins. A 100 TB frontier/capture-history join that
runs every crawl round should not pay its exchange every round —
bucket both tables by the join key ONCE at write time and every later
sort-merge join reads co-located buckets with NO Exchange on either
side.

This tool writes lineitem + orders bucketed by the join key into a
throwaway warehouse, joins them, and ASSERTS from the executed plan
that zero Exchange operators feed the join (vs 2 for the plain
parquet baseline), then times both. Artifact: BUCKETING_r4.json.

Usage: python tools/bucketing_demo.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    wh = tempfile.mkdtemp(prefix="bucket_wh_")
    from sandcrawler_spark.session import get_spark

    spark = get_spark(
        "bucketing_demo",
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            # force SMJ so the exchange count is the only difference
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus"
    )

    # baseline: plain parquet join (2 exchanges expected)
    t0 = time.time()
    base = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    base_plan = _executed_plan(base)
    base_wall = time.time() - t0
    base_exchanges = base_plan.count("Exchange")

    # bucketed: write both sides bucketed+sorted by the key, join the
    # TABLE reads — no exchange on either side
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (li.write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("li_b"))
    (o.write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("o_b"))

    lb, ob = spark.table("li_b"), spark.table("o_b")
    t0 = time.time()
    buck = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").count()
    buck_plan = _executed_plan(buck)
    buck_wall = time.time() - t0

    # the only exchange allowed is the one the final groupBy needs
    join_section = buck_plan.split("HashAggregate")[0]
    buck_join_exchanges = join_section.count("Exchange")

    ok = buck_join_exchanges == 0 and base_exchanges >= 2
    out = {
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "baseline_exchanges_total": base_exchanges,
        "bucketed_exchanges_before_join_output": buck_join_exchanges,
        "baseline_join_wall_s": round(base_wall, 2),
        "bucketed_join_wall_s": round(buck_wall, 2),
        "invariant_ok": ok,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BUCKETING_r4.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    shutil.rmtree(wh, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
