"""HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", ICDMW 2013): neighborhood functions and
harmonic centrality for EVERY node of a web-scale graph at once, by
iterating HLL ball sketches along edges instead of running |V| BFS
traversals.

State per node is one HLL register table (<= 2^p rows), so the whole
computation is |V| * 2^p small rows; one iteration = one edge join +
one (node, bucket) max-aggregate — both map-side combinable, no
per-node window, no frontier explosion. This is the published
algorithm that computed distance distributions on the full Facebook
graph; at our 10^10-host design point each iteration is a single
shuffle of ~|V| * 2^p rows.

Everything reuses the deterministic md5-HLL from operators/sketches.py
(exact integer harmonic register sums; the only doubles are one final
division per estimate and the fixed-order centrality fold), so the
DuckDB oracle replays estimates bit-for-bit — same contract as
hll_host_cardinality.

Direction: `in`-balls grow along edge direction (u -> v puts u into
v's ball), so ball_t(v) estimates |{u : d(u, v) <= t}| and the
harmonic sum H(v) = sum_t (|B_t| - |B_{t-1}|) / t is the classic
harmonic centrality of v (how easily the rest of the web reaches v —
the crawl-priority signal). `out` reverses the propagation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.operators.sketches import RHO_CAP, _alpha, hll_partials


def _lc_table(m: int) -> list[float]:
    """Linear-counting estimates by zero-register count (index z-1 for
    z in 1..m): round(m * ln(m / z), 2). Precomputed CONSTANTS embedded
    verbatim in both the Spark plan and the DuckDB oracle, so the two
    engines never each evaluate ln() — balls are small for most hosts
    (a leaf site reaches a handful of hosts in 3 hops), exactly the
    range where the raw HLL estimator is biased to ~alpha*m and the
    standard small-range correction (Flajolet et al. 2007) is the
    estimator of record."""
    return [round(m * math.log(m / z), 2) for z in range(1, m + 1)]


def _corrected_estimate(partials: DataFrame, t: int, p: int) -> DataFrame:
    """Per-host ball estimate with small-range correction: linear
    counting when zeros > 0 and the raw estimate <= 2.5m, raw harmonic
    HLL otherwise — the branch condition is computed with identical
    double arithmetic in both engines."""
    m = 1 << p
    est_const = _alpha(m) * m * m * float(1 << RHO_CAP)
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - mreg AS INT))")
    agg = partials.groupBy("host").agg(
        F.count("*").alias("_used"), F.sum(pow2).alias("_s")
    )
    s_total = F.col("_s") + (F.lit(m) - F.col("_used")) * F.lit(1 << RHO_CAP).cast("long")
    raw = F.lit(est_const) / s_total
    zeros = (F.lit(m) - F.col("_used")).cast("int")
    lc = F.element_at(
        F.array(*[F.lit(v) for v in _lc_table(m)]), F.greatest(zeros, F.lit(1))
    )
    est = F.when((zeros > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(F.round(raw, 2))
    return agg.select("host", est.alias(f"ball_{t}"))


def hyperball(
    host_edges: DataFrame,
    n_iter: int = 3,
    p: int = 8,
    direction: str = "in",
) -> DataFrame:
    """(host, ball_0..ball_<n_iter>, harmonic_micro) — ball_t is the
    HLL estimate of the t-hop ball around each host; harmonic_micro is
    the centrality fold over the ball growth in integer micro-units
    (sum_t (cents_t - cents_{t-1}) * 1e6 div (100 * t), with cents_t =
    round(ball_t * 100): all-integer arithmetic, because a float fold
    over 2dp-rounded estimates lands on .xx5 ties that Spark and
    DuckDB round apart). host_edges: (src_host, dst_host[, weight])."""
    if direction == "in":
        e = host_edges.select(
            F.col("src_host").alias("_from"), F.col("dst_host").alias("_to")
        )
    elif direction == "out":
        e = host_edges.select(
            F.col("dst_host").alias("_from"), F.col("src_host").alias("_to")
        )
    else:
        raise ValueError(f"direction must be in|out, got {direction!r}")
    e = e.distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_from").alias("host"))
        .unionByName(e.select(F.col("_to").alias("host")))
        .distinct()
    )
    parts = hll_partials(
        nodes.select("host", F.col("host").alias("_member")), "_member", ["host"], p
    ).localCheckpoint(eager=True)

    out = _corrected_estimate(parts, 0, p)
    for t in range(1, n_iter + 1):
        prop = e.join(parts, parts["host"] == e["_from"]).select(
            F.col("_to").alias("host"), "bkt", "mreg"
        )
        parts = (
            parts.unionByName(prop)
            .groupBy("host", "bkt")
            .agg(F.max("mreg").alias("mreg"))
            .localCheckpoint(eager=True)
        )
        out = out.join(_corrected_estimate(parts, t, p), on="host")
    harmonic = None
    for t in range(1, n_iter + 1):
        term = F.expr(
            f"(CAST(round(ball_{t} * 100) AS BIGINT) - "
            f"CAST(round(ball_{t - 1} * 100) AS BIGINT)) * 1000000 div {100 * t}"
        )
        harmonic = term if harmonic is None else harmonic + term
    return out.withColumn("harmonic_micro", harmonic.cast("long"))


def distance_profile(
    host_edges: DataFrame,
    n_iter: int = 3,
    p: int = 8,
    direction: str = "in",
    pct: int = 90,
) -> DataFrame:
    """Neighborhood-function readout of the HyperBall sketches: the
    graph-wide distance distribution N(t) = sum over hosts of
    |ball_t(host)| and the EFFECTIVE DIAMETER — the smallest t at
    which N(t) covers `pct`% of all reachable pairs found by hop
    n_iter (Palmer/ANF KDD'02; Boldi-Vigna HyperBall §5 — the '90%'
    web-graph diameter numbers in Broder'00 are exactly this readout).
    A crawl sample whose effective diameter collapses to 1-2 is
    hub-dominated; one that keeps growing past n_iter was cut off too
    early.

    All arithmetic on the 2dp-rounded ball estimates in integer cents
    (the hyperball harmonic discipline): N_t_cents is an exact BIGINT
    sum, the coverage fraction is ppm floor-division, and the flag
    compares N_t * 100 >= N_max * pct — no float at any boundary.

    Output: one row per hop t (0..n_iter) with (t, pairs_cents,
    frac_ppm, is_effective_diameter). Scale: everything after the
    hyperball run is a |V|-row aggregate to ONE row, then a constant
    n_iter+1-row explode.
    """
    hb = hyperball(host_edges, n_iter=n_iter, p=p, direction=direction)
    totals = hb.agg(
        *[
            F.sum(F.expr(f"CAST(round(ball_{t} * 100) AS BIGINT)"))
            .cast("long")
            .alias(f"_n{t}")
            for t in range(n_iter + 1)
        ]
    )
    # effective diameter: first t whose cumulative cents reach pct% of
    # the deepest ball's total
    d_eff = "CASE"
    for t in range(n_iter + 1):
        d_eff += f" WHEN _n{t} * 100 >= _n{n_iter} * {int(pct)} THEN {t}"
    d_eff += f" ELSE {n_iter} END"
    rows = totals.select(
        F.expr(d_eff).cast("int").alias("_deff"),
        F.col(f"_n{n_iter}").alias("_nmax"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("int").alias("t"),
                        F.col(f"_n{t}").alias("pairs_cents"),
                    )
                    for t in range(n_iter + 1)
                ]
            )
        ).alias("_e"),
    )
    return rows.select(
        F.col("_e.t").alias("t"),
        F.col("_e.pairs_cents").alias("pairs_cents"),
        F.expr(
            "CASE WHEN _nmax = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(_e.pairs_cents * CAST(1000000 AS BIGINT) div _nmax AS BIGINT) END"
        ).alias("frac_ppm"),
        (F.col("_e.t") == F.col("_deff")).alias("is_effective_diameter"),
    )
