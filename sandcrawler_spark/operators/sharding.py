"""Crawler-fleet shard assignment by rendezvous (highest-random-weight)
hashing — how a 1000-executor crawl statically owns its hosts: every
host deterministically maps to the shard with the highest
md5(host ":" shard) weight, so (a) assignment needs no coordination
or lookup table, (b) any observer recomputes it from the key alone,
and (c) growing the fleet from N to N+1 shards moves ONLY the keys
whose new shard wins — ~1/(N+1) of them — instead of rehashing the
world (Thaler & Ravishankar, "Using Name-Based Mappings to Increase
Hit Rates", ToN 1998; the same property consistent hashing buys, with
exact minimal disruption and no ring metadata).

Per-host (not per-URL) sharding keeps politeness local: one shard
owns ALL of a host's URLs, so per-host rate limits and robots caches
never need cross-executor coordination — the same reason the
reference partitions its work queues by host.

Scale shape: pure codegen map (n_shards md5s per key, argmax via
array_max over (hash, shard) structs — no shuffle, no UDF); the
balance rollup is one tiny groupBy(shard).

Engine portability: md5 hex strings compare lexicographically the
same everywhere; the DuckDB oracle replays the argmax relationally
(unnest + row_number) over identical md5 values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rendezvous_shard_col(key: Column, n_shards: int) -> Column:
    """Winning shard id for a key: argmax_i md5(key || ':' || i).
    Ties (md5 collisions across shards of one key) are broken toward
    the larger shard id by the struct comparison order — deterministic
    either way."""
    pairs = F.array(
        *[
            F.struct(
                F.md5(F.concat(key, F.lit(f":{i}"))).alias("w"),
                F.lit(i).alias("shard"),
            )
            for i in range(n_shards)
        ]
    )
    return F.array_max(pairs)["shard"]


def assign_shards(
    df: DataFrame, key_col: str = "host", n_shards: int = 8, out_col: str = "shard"
) -> DataFrame:
    """df + out_col = rendezvous shard of key_col."""
    return df.withColumn(out_col, rendezvous_shard_col(F.col(key_col), n_shards))


def shard_balance(
    df: DataFrame, key_col: str = "host", n_shards: int = 8
) -> DataFrame:
    """Load report per shard over the DISTINCT keys: (shard, n_keys,
    n_rows). Balance quality is the caller's judgment; rendezvous over
    md5 is uniform in expectation with no coordination."""
    a = assign_shards(df, key_col, n_shards)
    return (
        a.groupBy("shard")
        .agg(
            F.countDistinct(key_col).cast("long").alias("n_keys"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .select("shard", "n_keys", "n_rows")
    )


def shard_cut(
    edges: DataFrame,
    n_shards: int = 8,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Partition-quality readout for rendezvous sharding: per shard,
    how many of its outgoing host-graph edges stay INTERNAL vs cross
    to another shard — the coordination-traffic estimate for a
    sharded crawler fleet (a discovered cross-shard link must be
    handed to the owning shard's frontier; RFC `sandcrawler-rfc.md`'s
    single-pipeline design never pays this, a 4N-executor fleet always
    does). Rendezvous hashing ignores topology, so cross_ppm ~
    (n_shards-1)/n_shards * 1e6 is the expected baseline; a
    community-aware assignment (host_lpa) should beat it — this query
    is the yardstick.

    Pure codegen shard columns on both endpoints (no shard table, no
    join — the rendezvous argmax is an expression), one distinct-edge
    shuffle, one shard-keyed agg.
    """
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    tagged = e.select(
        rendezvous_shard_col(F.col("_s"), n_shards).alias("shard"),
        (
            rendezvous_shard_col(F.col("_s"), n_shards)
            == rendezvous_shard_col(F.col("_d"), n_shards)
        ).alias("_internal"),
    )
    return (
        tagged.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum(F.col("_internal").cast("long")).cast("long").alias("n_internal"),
        )
        .select(
            "shard",
            "n_edges",
            "n_internal",
            (F.col("n_edges") - F.col("n_internal")).alias("n_cross"),
            F.expr(
                "CAST((n_edges - n_internal) * CAST(1000000 AS BIGINT) div n_edges AS BIGINT)"
            ).alias("cross_ppm"),
        )
    )


def community_shard_cut(
    edges: DataFrame,
    n_shards: int = 8,
    n_rounds: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """The topology-aware counterpart to `shard_cut`: hosts are
    sharded by their LPA COMMUNITY (md5 of the community label mod
    n_shards), so densely-linked host clusters land on one shard and
    their internal frontier hand-offs become free. Same output shape
    as shard_cut — run both and compare cross_ppm: rendezvous sits at
    the topology-blind (n-1)/n baseline, community sharding pays cross
    traffic only on inter-community edges (plus hash collisions of
    community labels). The trade is balance: a giant community can
    overload its shard — pair this readout with shard_balance before
    adopting.

    `edges` is the WEIGHTED host graph (host_graph output: src_host,
    dst_host, weight) — LPA votes by weight, exactly as
    host_communities. One LPA run (bounded rounds, min-struct argmax —
    skew-safe), one label join per endpoint, one shard agg.
    """
    from sandcrawler_spark.operators.linkgraph import host_lpa
    from sandcrawler_spark.operators.sketches import hll_hash

    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = host_lpa(edges, n_rounds=n_rounds).select(
        "host",
        F.pmod(hll_hash(F.col("community")), F.lit(int(n_shards)))
        .cast("int")
        .alias("shard"),
    )
    la = labels.select(F.col("host").alias("_s"), F.col("shard").alias("shard"))
    lb = labels.select(F.col("host").alias("_d"), F.col("shard").alias("_shard_d"))
    tagged = e.join(la, "_s").join(lb, "_d").select(
        "shard", (F.col("shard") == F.col("_shard_d")).alias("_internal")
    )
    return (
        tagged.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum(F.col("_internal").cast("long")).cast("long").alias("n_internal"),
        )
        .select(
            "shard",
            "n_edges",
            "n_internal",
            (F.col("n_edges") - F.col("n_internal")).alias("n_cross"),
            F.expr(
                "CAST((n_edges - n_internal) * CAST(1000000 AS BIGINT) div n_edges AS BIGINT)"
            ).alias("cross_ppm"),
        )
    )


def _ring_vnodes(n_shards: int, vnodes: int) -> list[tuple[str, int]]:
    """Sorted (position, shard) virtual-node points: pos =
    md5('ring:<shard>:<v>') — deterministic, no ring metadata service,
    recomputable by any observer (both engines get the SAME literal
    table from this one function)."""
    import hashlib

    pts = [
        (hashlib.md5(f"ring:{s}:{v}".encode()).hexdigest(), s)
        for s in range(n_shards)
        for v in range(vnodes)
    ]
    return sorted(pts)


def ring_shard_col(key: Column, n_shards: int, vnodes: int = 16) -> Column:
    """Consistent-hash ring owner of a key (Karger et al. 1997):
    the first virtual node clockwise from md5(key), wrapping to the
    ring's first point. The vnode table is a plan-time literal array
    (n_shards * vnodes structs) — pure codegen, no join, no shuffle.
    Tie order on equal positions is (pos, shard) — matched by the
    oracle's zero-padded string min."""
    pts = _ring_vnodes(n_shards, vnodes)
    arr = F.array(
        *[F.struct(F.lit(p).alias("pos"), F.lit(s).alias("shard")) for p, s in pts]
    )
    kh = F.md5(key)
    cand = F.filter(arr, lambda x: x["pos"] >= kh)
    owner = F.when(F.size(cand) > 0, F.array_min(cand)).otherwise(F.array_min(arr))
    return owner["shard"]


def mod_shard_col(key: Column, n_shards: int) -> Column:
    """Naive mod-hash shard: md5-prefix mod n — the strawman every
    reshard-churn comparison needs (moves ~n/(n+1) of all keys on
    grow, vs ~1/(n+1) for rendezvous/ring)."""
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return (h % n_shards).cast("int")


def reshard_churn(
    df: DataFrame,
    key_col: str = "host",
    n_from: int = 8,
    n_to: int = 9,
    vnodes: int = 16,
) -> DataFrame:
    """Fleet-growth churn report: how many keys change owner when the
    crawler fleet grows n_from -> n_to shards, per strategy
    (mod-hash / rendezvous / consistent-hash ring). The number every
    resharding decision hinges on: a moved host re-warms robots +
    politeness + seen caches on its new executor.

      (strategy, n_keys, n_moved, moved_ppm)

    mod-hash reshuffles ~n/(n+1) of the world; rendezvous moves the
    information-theoretic minimum (exactly the keys the new shard
    wins); the ring approximates the minimum with variance set by
    vnodes. Scale shape: pure codegen per-key maps (no shuffle), one
    count agg, a 3-row stack."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    flags = keys.select(
        (mod_shard_col(F.col("k"), n_from) != mod_shard_col(F.col("k"), n_to))
        .cast("long")
        .alias("_mod"),
        (
            rendezvous_shard_col(F.col("k"), n_from)
            != rendezvous_shard_col(F.col("k"), n_to)
        )
        .cast("long")
        .alias("_rdv"),
        (
            ring_shard_col(F.col("k"), n_from, vnodes)
            != ring_shard_col(F.col("k"), n_to, vnodes)
        )
        .cast("long")
        .alias("_ring"),
    )
    agg = flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_mod").cast("long").alias("m_mod"),
        F.sum("_rdv").cast("long").alias("m_rdv"),
        F.sum("_ring").cast("long").alias("m_ring"),
    )
    out = agg.selectExpr(
        "stack(3, 'mod', n, m_mod, 'rendezvous', n, m_rdv, 'ring', n, m_ring)"
        " AS (strategy, n_keys, n_moved)"
    )
    return out.select(
        "strategy",
        "n_keys",
        "n_moved",
        F.expr("CAST(1000000 AS BIGINT) * n_moved div n_keys").alias("moved_ppm"),
    )


def reshard_oracle_sql(
    keys_sql: str, n_from: int = 8, n_to: int = 9, vnodes: int = 16
) -> str:
    """DuckDB twin of reshard_churn over a (k) key relation: same md5
    maps, same literal vnode tables (generated by the same
    _ring_vnodes call), ring ownership replayed as a zero-padded
    string MIN with the plan-time global-minimum fallback."""

    def ring_cte(name: str, n: int) -> str:
        pts = _ring_vnodes(n, vnodes)
        vals = ", ".join(f"('{p}', {s})" for p, s in pts)
        fallback = f"'{pts[0][0]}:{pts[0][1]:04d}'"
        return f"""
{name}v(pos, shard) AS (VALUES {vals}),
{name} AS (
  SELECT k, CAST(CAST(substr(COALESCE(
           MIN(CASE WHEN v.pos >= md5(k) THEN v.pos || ':' || lpad(CAST(v.shard AS VARCHAR), 4, '0') END),
           {fallback}), 34) AS INT) AS INT) AS shard
  FROM ks CROSS JOIN {name}v v
  GROUP BY k
)"""

    def rdv_cte(name: str, n: int) -> str:
        return f"""
{name} AS (
  SELECT k, shard FROM (
    SELECT k, CAST(t.i AS INT) AS shard,
           ROW_NUMBER() OVER (PARTITION BY k
             ORDER BY md5(k || ':' || CAST(t.i AS VARCHAR)) DESC, t.i DESC) AS rn
    FROM ks CROSS JOIN range(0, {n}) t(i)
  ) WHERE rn = 1
)"""

    return f"""
WITH ks AS (SELECT k FROM ({keys_sql})),
modc AS (
  SELECT k,
         CAST(CAST('0x' || substr(md5(k), 1, 15) AS UBIGINT) % {n_from} AS INT) AS s_b,
         CAST(CAST('0x' || substr(md5(k), 1, 15) AS UBIGINT) % {n_to} AS INT) AS s_a
  FROM ks
),
{rdv_cte("rdvb", n_from)},
{rdv_cte("rdva", n_to)},
{ring_cte("ringb", n_from)},
{ring_cte("ringa", n_to)},
moved AS (
  SELECT 'mod' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN s_b <> s_a THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM modc
  UNION ALL
  SELECT 'rendezvous', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN b.shard <> a.shard THEN 1 ELSE 0 END) AS BIGINT)
  FROM rdvb b JOIN rdva a USING (k)
  UNION ALL
  SELECT 'ring', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN b.shard <> a.shard THEN 1 ELSE 0 END) AS BIGINT)
  FROM ringb b JOIN ringa a USING (k)
)
SELECT strategy, n_keys, n_moved,
       CAST(CAST(1000000 AS BIGINT) * n_moved // n_keys AS BIGINT) AS moved_ppm
FROM moved
""".strip()


def ring_balance(
    df: DataFrame,
    key_col: str = "host",
    n_shards: int = 8,
    vnode_counts: tuple[int, ...] = (4, 32),
) -> DataFrame:
    """Load-balance readout for the consistent-hash ring's one knob:
    per-shard distinct-key counts at each virtual-node count, with
    rendezvous as the optimal-balance reference row set. Few vnodes =
    cheap lookups but lumpy arcs (some shards own 2-3x their share);
    more vnodes smooth the arcs toward the rendezvous baseline — this
    is the table that picks the knob. Pure codegen maps + one count
    agg per strategy."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    parts = [
        keys.select(
            F.lit(f"ring_v{v}").alias("strategy"),
            ring_shard_col(F.col("k"), n_shards, v).alias("shard"),
        )
        for v in vnode_counts
    ]
    parts.append(
        keys.select(
            F.lit("rendezvous").alias("strategy"),
            rendezvous_shard_col(F.col("k"), n_shards).alias("shard"),
        )
    )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("strategy", "shard").agg(
        F.count("*").cast("long").alias("n_keys")
    )


def ring_balance_oracle_sql(
    keys_sql: str, n_shards: int = 8, vnode_counts: tuple[int, ...] = (4, 32)
) -> str:
    """DuckDB twin of ring_balance (same literal vnode tables, same
    zero-padded string-min ring ownership, same rendezvous argmax)."""
    blocks = []
    for v in vnode_counts:
        pts = _ring_vnodes(n_shards, v)
        vals = ", ".join(f"('{p}', {s})" for p, s in pts)
        fallback = f"'{pts[0][0]}:{pts[0][1]:04d}'"
        blocks.append(f"""
SELECT 'ring_v{v}' AS strategy, shard, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT k, CAST(substr(COALESCE(
           MIN(CASE WHEN v.pos >= md5(k) THEN v.pos || ':' || lpad(CAST(v.shard AS VARCHAR), 4, '0') END),
           {fallback}), 34) AS INT) AS shard
  FROM ks CROSS JOIN (VALUES {vals}) v(pos, shard)
  GROUP BY k
) GROUP BY shard""")
    blocks.append(f"""
SELECT 'rendezvous' AS strategy, shard, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT k, shard FROM (
    SELECT k, CAST(t.i AS INT) AS shard,
           ROW_NUMBER() OVER (PARTITION BY k
             ORDER BY md5(k || ':' || CAST(t.i AS VARCHAR)) DESC, t.i DESC) AS rn
    FROM ks CROSS JOIN range(0, {n_shards}) t(i)
  ) WHERE rn = 1
) GROUP BY shard""")
    u = "\nUNION ALL\n".join(blocks)
    return f"""
WITH ks AS (SELECT k FROM ({keys_sql}))
{u}
""".strip()
