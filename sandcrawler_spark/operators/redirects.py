"""Redirect-chain resolution over a URL functional graph.

The reference resolves redirect chains one hop at a time inside the
fetch loop (reference python/sandcrawler/ia.py redirect handling, hop
caps in ingest.py) — correct for live fetching, but an index-side
question too: given the corpus's observed (src -> dst) redirect edges,
what does every URL ultimately resolve to, in how many hops, and which
URLs are stuck in redirect loops? That batch form is what dedupes a
CDX index by final landing URL and what seeds canonical-alias groups.

A redirect table is a FUNCTIONAL graph (each src has at most one
outgoing edge), so full transitive closure is pointer jumping:
maintain f^(2^i) and square it each round — O(log H) shuffles for hop
cap H instead of H sequential joins. Each round is two equi-joins on
the current pointer (the same key both relations are already hashed
on), localCheckpointed so the unrolled loop never builds a deep plan.

Cycle semantics: a src that has not reached a terminal node (a node
with no outgoing edge) within max_hops is reported with
final_url = NULL and n_hops = -1 — this covers both true loops and
chains longer than the cap, exactly like the reference's hop-cap
verdict ('redirect-loop') in its fetch path.

Scale shape at 100 TB: the pointer table has one row per redirecting
URL (a small fraction of the corpus); every round shuffles only that
table on one key; hop accumulation is integer addition carried through
the join — no window, no driver-side data, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every src to its terminal URL via pointer jumping.

    edges must be functional (one outgoing edge per src — enforce
    upstream with a latest-wins dedupe if observations repeat).
    Returns (src_url, final_url, n_hops): final_url NULL / n_hops -1
    when the chain does not terminate within max_hops (loop or
    over-long chain).
    """
    # f^1: node -> (next, jump-length)
    ptr = edges.select(
        F.col(src_col).alias("node"),
        F.col(dst_col).alias("nxt"),
        F.lit(1).cast("long").alias("jump"),
    ).localCheckpoint(eager=True)

    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops
    state = ptr.select(
        F.col("node").alias("src_url"),
        F.col("nxt").alias("cur"),
        F.col("jump").alias("hops"),
    )
    for _ in range(rounds):
        p = ptr.select(
            F.col("node").alias("p_node"),
            F.col("nxt").alias("p_nxt"),
            F.col("jump").alias("p_jump"),
        )
        # advance each src by the pointer table (terminal curs miss
        # the join and stay put — their hops stop accumulating)
        state = (
            state.join(p, state["cur"] == p["p_node"], "left")
            .select(
                "src_url",
                F.coalesce("p_nxt", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("p_jump", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        # square the pointer table: f^(2^i) o f^(2^i)
        p2 = ptr.select(
            F.col("node").alias("p_node"),
            F.col("nxt").alias("p_nxt"),
            F.col("jump").alias("p_jump"),
        )
        ptr = (
            ptr.join(p2, ptr["nxt"] == p2["p_node"], "left")
            .select(
                "node",
                F.coalesce("p_nxt", "nxt").alias("nxt"),
                (F.col("jump") + F.coalesce("p_jump", F.lit(0))).alias("jump"),
            )
            .localCheckpoint(eager=True)
        )

    # terminal test: cur still has an outgoing edge -> unterminated
    srcs = edges.select(F.col(src_col).alias("t_node")).distinct()
    out = state.join(srcs, state["cur"] == srcs["t_node"], "left")
    return out.select(
        "src_url",
        F.when(F.col("t_node").isNull(), F.col("cur")).alias("final_url"),
        F.when(F.col("t_node").isNull(), F.col("hops"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("n_hops"),
    )
