"""Mirror-host detection via shared content fingerprints.

Bharat & Broder (WWW'99) framed mirror detection as set similarity
between hosts over the content they serve: two hosts whose document
fingerprint sets overlap heavily are mirrors/CDN aliases, and a crawler
that detects them early stops paying fetch budget twice for the same
bytes (the reference dedupes at the URL/sha1 level only AFTER fetching
— `python/sandcrawler/ia.py` petabox dedupe; this operator lifts that
to the host level so the frontier can skip whole mirrored sites).

Scale shape: the pair generation is a self-equi-join on the
fingerprint key — never host×host all-pairs. The one skew cliff is a
boilerplate fingerprint present on thousands of hosts (its join group
is quadratic in its host count), so fingerprints on more than
`max_fp_hosts` hosts are excluded up front by the same hot-key
discipline as `lsh_candidates`' hot-band cap: one (fp) count agg +
anti-join, a deliberate, documented recall trade (a fp shared by >cap
hosts is boilerplate, not mirrored content). Host set sizes attach by
broadcast (host-cardinality table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_mirror_pairs(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    min_shared: int = 2,
    max_fp_hosts: int = 256,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, jaccard_ppm, cont_a_ppm,
    cont_b_ppm) for host pairs sharing >= min_shared distinct
    fingerprints. Jaccard = shared/(n_a+n_b-shared); containment is
    directional (a mirrored SUBSET — a host that also serves its own
    content — shows low Jaccard but high cont on the smaller side).
    Sizes n_a/n_b count a host's fingerprints BEFORE the hot-fp cap,
    so the cap only removes candidate pairs, never inflates scores.
    """
    hf = df.select(F.col(host_col).alias("host"), F.col(fp_col).alias("fp")).distinct()
    hf = hf.localCheckpoint(eager=True)  # read 3x: sizes, cap, join
    sizes = hf.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    hot = (
        hf.groupBy("fp")
        .agg(F.count("*").alias("_nh"))
        .filter(F.col("_nh") > max_fp_hosts)
        .select("fp")
    )
    cold = hf.join(hot, "fp", "left_anti")
    a = cold.select("fp", F.col("host").alias("host_a"))
    b = cold.select("fp", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(sa, "host_a")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.expr("CAST(shared * CAST(1000000 AS BIGINT) div (n_a + n_b - shared) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
            F.expr("CAST(shared * CAST(1000000 AS BIGINT) div n_a AS BIGINT)").alias(
                "cont_a_ppm"
            ),
            F.expr("CAST(shared * CAST(1000000 AS BIGINT) div n_b AS BIGINT)").alias(
                "cont_b_ppm"
            ),
        )
    )
