"""Link-graph frontier prioritization: outlink extraction -> BFS
link-depth -> host PageRank -> priority blend.

Role parity / gap being closed: the reference's ingest requests carry
a link-depth / priority notion (sandcrawler-db `ingest_request`
priority lanes, /root/reference/python/sandcrawler/db.py and
kafka/topics.md interactive-vs-bulk split) but the reference computes
depth implicitly while hop-crawling one URL at a time
(ingest.py hop loop). At 10^10-URL frontier scale the same signals
have to come from a BATCH link graph: extract outlinks from every
captured page, BFS from the seed list to get min link-depth, rank
hosts by link mass, and blend (request priority, link depth, host
rank, recrawl staleness) into the frontier ordering. Each stage below
is a deterministic DataFrame op with a DuckDB-replayable twin.

Scale notes (100 TB):
  - `extract_outlinks` is pure Catalyst (decode + regexp_extract_all +
    explode + string resolution) — whole-stage codegen, no Python, no
    shuffle; scans stay column-pruned to (url, html).
  - `link_depth_bfs` is the standard iterative frontier-expansion:
    per round one equi-join on dst + min-agg, localCheckpoint keeps
    the plan flat; rounds are bounded by max_depth (crawl hop budgets
    are small constants: the reference caps redirect/hop chains too).
    Join is shuffle-on-url; AQE handles the skewed mega-host keys.
  - `host_pagerank` contracts the URL graph to hosts first (one
    groupBy), so the iterated part runs on the ~10^8-row host graph,
    not the 10^13-row URL graph. Fixed damping/iterations keep it
    deterministic; sums are rounded before any cross-engine compare.
  - `blend_priority` ranks hosts globally via global_cumsum's range
    shuffle (never an un-partitioned window), broadcasts the pctl
    table back, and is otherwise narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]+)"'
# full anchor element: group 1 = href, group 2 = visible text (no
# nested markup — the synthetic corpus and the reference's fulltext
# candidates are flat <a>text</a>; nested-tag anchors resolve through
# the biblio fulltext patterns instead)
ANCHOR_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def _resolve_dst(href, scheme, scheme_host):
    """RFC 3986 subset shared by outlink/anchor extraction: absolute
    kept, protocol-relative + root-relative resolved, rest dropped
    (NULL)."""
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(scheme_host, href))
        .otherwise(F.lit(None))
    )


def extract_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url) edges from raw HTML bytes, all JVM-side.

    Resolution rules (deterministic subset of RFC 3986 — the cases a
    synthetic/clean corpus produces; full resolution lives in the
    fetch hop loop's clean_url):
      - absolute http(s) URLs kept as-is;
      - protocol-relative ('//host/...') resolved with the source's
        scheme;
      - root-relative (leading '/') resolved against the source's
        scheme://host;
      - anything else (fragments, javascript:, mailto:, dot-relative)
        dropped.

    Full RFC 3986 §5.2 resolution (merge + remove_dot_segments) lives
    in functions/urlresolve.py `resolve_url`; the `outlink_resolved`
    driver query measures what it recovers beyond this subset (r4
    session 16). This extractor keeps the subset deliberately: its
    oracle twin and every downstream graph query are specified
    against these exact rules.
    """
    doc = F.decode(F.col(html_col), "UTF-8")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    raw = pages.select(
        F.col(url_col).alias("src_url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        F.explode(F.regexp_extract_all(doc, F.lit(HREF_RE), F.lit(1))).alias("_href"),
    )
    dst = _resolve_dst(F.col("_href"), F.col("_sc"), F.col("_sh"))
    return (
        raw.select("src_url", dst.alias("dst_url"))
        .where(F.col("dst_url").isNotNull())
        .distinct()
    )


def extract_anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url, anchor_text) triples — the outlink edge set
    WITH the linking page's visible anchor string, the classic
    search/crawl relevance signal (anchor text describes the TARGET
    better than the target's own page; Brin & Page 1998 §2.2).

    All JVM-side codegen: two regexp_extract_all passes over the same
    ANCHOR_RE (group 1 = href, group 2 = text — equal-length arrays by
    construction) zipped, exploded once, then the shared RFC 3986
    resolution subset. No Python crossing, no shuffle."""
    doc = F.decode(F.col(html_col), "UTF-8")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    pairs = F.arrays_zip(
        F.regexp_extract_all(doc, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(doc, F.lit(ANCHOR_RE), F.lit(2)).alias("text"),
    )
    raw = pages.select(
        F.col(url_col).alias("src_url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        F.explode(pairs).alias("_a"),
    )
    dst = _resolve_dst(F.col("_a.href"), F.col("_sc"), F.col("_sh"))
    return raw.select(
        "src_url", dst.alias("dst_url"), F.col("_a.text").alias("anchor_text")
    ).where(F.col("dst_url").isNotNull())


def anchor_summary(anchors: DataFrame) -> DataFrame:
    """Per-target anchor-text profile: (dst_url, n_anchors, n_texts,
    top_text) where top_text is the most frequent anchor string
    pointing at the target (ties broken lexicographically — stable on
    any engine).

    Scale shape: groupBy (dst_url, anchor_text) with map-side partial
    aggregation, then ONE aggregate per dst_url taking
    min(struct(-cnt, text)) — no per-key window, so a mega-target
    (every page links "home") still reduces tree-style instead of
    materializing its full anchor list in one task."""
    per_text = anchors.groupBy("dst_url", "anchor_text").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return per_text.groupBy("dst_url").agg(
        F.sum("cnt").cast("long").alias("n_anchors"),
        F.count("*").cast("long").alias("n_texts"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("anchor_text").alias("t")))[
            "t"
        ].alias("top_text"),
    )


def link_depth_bfs(
    seeds: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    max_depth: int = 4,
) -> DataFrame:
    """Min-hop link depth from the seed set, bounded by max_depth.

    Iterative frontier expansion: depth d nodes join edges on src,
    newly reached dsts get depth d+1 unless already labeled (left-anti
    against the accumulated label set). One equi-join + one anti-join
    per round, each round's frontier localCheckpointed so the unrolled
    plan never deepens. Returns (url, depth) for every reached node —
    the crawl-budget analog of the reference's per-request hop count
    (ingest.py bounds hops the same way, one URL at a time)."""
    e = edges.select(
        F.col("src_url").alias("_s"), F.col("dst_url").alias("_d")
    ).distinct()
    labeled = (
        seeds.select(F.col(url_col).alias("url"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = labeled
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["_s"], "inner")
            .select(F.col("_d").alias("url"))
            .distinct()
            .join(labeled.select("url"), on="url", how="left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        labeled = labeled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return labeled


def host_graph(edges: DataFrame) -> DataFrame:
    """Contract URL edges to weighted host edges (self-loops dropped).
    The one groupBy that takes the iterated stages from URL scale to
    host scale."""
    host = lambda c: F.regexp_extract(F.col(c), r"^https?://([^/]+)", 1)  # noqa: E731
    return (
        edges.select(host("src_url").alias("src_host"), host("dst_url").alias("dst_host"))
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


PR_SCALE = 1_000_000_000_000  # fixed-point rank unit (1e-12 resolution)


def host_pagerank(
    host_edges: DataFrame,
    damping_num: int = 17,
    damping_den: int = 20,
    n_iter: int = 5,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank over the host graph — FIXED-POINT integer
    arithmetic, fixed iterations.

    rank is carried as an integer in units of 1/PR_SCALE; damping is
    the rational damping_num/damping_den (default 17/20 = 0.85):

      r'(v) = (PR_SCALE*(den-num)) div (den*N)
              + Σ_{u→v} (r(u) * num * w_uv) div (den * outw_u)
              + (num * Σ_{dangling u} r(u)) div (den * N)

    Why integers: float PageRank is summation-order dependent, so two
    engines (or two runs with different partitioning) produce ranks
    that differ in the last ulps — enough to SWAP crawl order between
    near-tied hosts, which breaks the north rule's "identical crawl
    ordering" requirement. Floor-divided integer arithmetic is exactly
    reproducible on any engine (the DuckDB oracle replays it verbatim)
    at a cost of < N*1e-12 leaked rank mass per iteration. Overflow
    headroom: r <= PR_SCALE (1e12), * num (17) * w_uv — safe for edge
    weights up to ~5e5; contract multi-edges before calling at scales
    beyond that (weights only enter as the w/outw fraction).

    Per iteration: one equi-join of ranks onto the edge list + one
    sum-agg by dst + one dangling-mass scalar agg; ranks are one row
    per host (the small side — broadcast-able at any corpus scale).

    init_ranks: warm-start ranks (host, rank) — the incremental-update
    path for a continuous crawl (see incremental_pagerank). Hosts not
    in init_ranks start at the uniform prior.
    """
    # materialize the (small, host-contracted) edge table once: nodes,
    # out_w and e below each scan it, and without this every scan
    # replays the caller's full lineage (URL-edge extraction from HTML)
    host_edges = host_edges.localCheckpoint(eager=True)
    nodes = (
        host_edges.select(F.col("src_host").alias("host"))
        .unionByName(host_edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # out_w is re-read by every iteration's dangling-mass anti-join:
    # checkpoint it (one row per linking host) or each iteration
    # re-derives the whole edge list from its upstream lineage — at
    # sf0.1 that re-extraction was the entire cost of the loop
    out_w = (
        host_edges.groupBy("src_host")
        .agg(F.sum("weight").alias("outw"))
        .localCheckpoint(eager=True)
    )
    e = (
        host_edges.join(out_w, on="src_host")
        .select("src_host", "dst_host", "weight", "outw")
        .localCheckpoint(eager=True)
    )
    base = (PR_SCALE * (damping_den - damping_num)) // (damping_den * n)
    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(PR_SCALE // n).cast("long"))
    else:
        # warm start (incremental update): hosts already ranked keep
        # their rank; hosts new to the graph start at the uniform prior
        ranks = (
            nodes.join(init_ranks.select("host", F.col("rank").alias("_r0")),
                       on="host", how="left")
            .select(
                "host",
                F.coalesce("_r0", F.lit(PR_SCALE // n)).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    for _ in range(n_iter):
        dangling = (
            ranks.join(out_w, ranks["host"] == out_w["src_host"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )
        dang_term = (damping_num * int(dangling)) // (damping_den * n)
        contrib = (
            e.join(ranks, e["src_host"] == ranks["host"], "inner")
            .select(
                F.col("dst_host").alias("host"),
                F.expr(
                    f"(rank * CAST({damping_num} AS BIGINT) * weight) div "
                    f"(CAST({damping_den} AS BIGINT) * outw)"
                ).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, on="host", how="left")
            .select(
                "host",
                (
                    F.lit(base) + F.coalesce(F.col("c"), F.lit(0)) + F.lit(dang_term)
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def trust_rank(
    host_edges: DataFrame,
    trusted_hosts: DataFrame,
    damping_num: int = 17,
    damping_den: int = 20,
    n_iter: int = 5,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank personalized to a curated trust seed set — teleport mass
    (the base term AND the dangling redistribution) flows ONLY to
    trusted hosts, so rank can reach a host only through link paths
    from the seeds. Spam farms that fabricate internal link mass get
    ~zero trust; the frontier can then demote link-heavy but
    trust-isolated hosts (the anti-spam counterpart of host_pagerank
    for crawl prioritization).

    Same integer fixed-point discipline as host_pagerank (PR_SCALE
    units, floor division, rational damping): bit-identical across
    engines and partitionings, DuckDB-replayable. Per iteration: one
    edge-join + dst-sum + a scalar dangling agg; the trusted set is a
    broadcast-sized relation by construction (curated seeds).

      r'(v) = [v in T] * ( (SCALE*(den-num)) div (den*|T|)
                           + (num * dangling_mass) div (den*|T|) )
              + sum_{u->v} (r(u)*num*w_uv) div (den*outw_u)

    init: SCALE div |T| on trusted hosts, 0 elsewhere.
    """
    host_edges = host_edges.localCheckpoint(eager=True)
    nodes = (
        host_edges.select(F.col("src_host").alias("host"))
        .unionByName(host_edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tr = (
        nodes.join(
            trusted_hosts.select("host").distinct(), on="host", how="left_semi"
        )
        .localCheckpoint(eager=True)
    )
    nt = tr.count()
    if nt == 0:
        raise ValueError("trust_rank: no trusted host appears in the graph")
    # checkpointed for the same reason as host_pagerank: the
    # per-iteration dangling anti-join must not replay edge extraction
    out_w = (
        host_edges.groupBy("src_host")
        .agg(F.sum("weight").alias("outw"))
        .localCheckpoint(eager=True)
    )
    e = (
        host_edges.join(out_w, on="src_host")
        .select("src_host", "dst_host", "weight", "outw")
        .localCheckpoint(eager=True)
    )
    t_flag = tr.withColumn("_t", F.lit(1))
    base = (PR_SCALE * (damping_den - damping_num)) // (damping_den * nt)
    ranks = (
        nodes.join(t_flag, on="host", how="left")
        .select(
            "host",
            F.when(F.col("_t") == 1, F.lit(PR_SCALE // nt))
            .otherwise(F.lit(0)).cast("long").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        dangling = (
            ranks.join(out_w, ranks["host"] == out_w["src_host"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )
        dang_term = (damping_num * int(dangling)) // (damping_den * nt)
        contrib = (
            e.join(ranks, e["src_host"] == ranks["host"], "inner")
            .select(
                F.col("dst_host").alias("host"),
                F.expr(
                    f"(rank * CAST({damping_num} AS BIGINT) * weight) div "
                    f"(CAST({damping_den} AS BIGINT) * outw)"
                ).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, on="host", how="left")
            .join(t_flag, on="host", how="left")
            .select(
                "host",
                (
                    F.when(F.col("_t") == 1, F.lit(base) + F.lit(dang_term))
                    .otherwise(F.lit(0))
                    + F.coalesce(F.col("c"), F.lit(0))
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def host_lpa(host_edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """Synchronous weighted label propagation over the host graph —
    community detection for crawl sharding and spam-cluster triage
    (Raghavan et al. 2007). Deterministic variant: every host starts
    labeled with itself; each round it adopts the neighbor label with
    the highest incident edge weight (tiebreak: label ascending) over
    the SYMMETRIZED graph. Bounded synchronous rounds (no convergence
    test — a driver-side count per round would serialize the loop),
    deterministic replayable by the unrolled SQL twin.

    Scale shape: per round, one fact-sized shuffle (votes groupBy) and
    one label-sized argmax AGGREGATE — min(struct(-score, label)), not
    a per-host window, so a celebrity host with 10^7 neighbor labels
    never lands in a single task. State is localCheckpointed per round
    to keep plans flat (the host_pagerank discipline).

    Returns (host, community) — community = final label.
    """
    sym = (
        host_edges.select("src_host", "dst_host", "weight")
        .unionAll(
            host_edges.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
                "weight",
            )
        )
        .groupBy("src_host", "dst_host")
        .agg(F.sum("weight").cast("long").alias("weight"))
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("src_host").alias("host")).distinct().withColumn(
        "label", F.col("host")
    )
    for _ in range(n_rounds):
        votes = (
            sym.join(labels, sym["dst_host"] == labels["host"])
            .groupBy("src_host", "label")
            .agg(F.sum("weight").cast("long").alias("score"))
        )
        labels = (
            votes.groupBy("src_host")
            .agg(F.min(F.struct((-F.col("score")).alias("ns"), F.col("label").alias("l"))).alias("w"))
            .select(F.col("src_host").alias("host"), F.col("w.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels.select("host", F.col("label").alias("community"))


def reciprocal_link_stats(host_edges: DataFrame) -> DataFrame:
    """Link-farm signal per host: how much of its out-neighborhood
    links straight back. Organic sites cite without being cited back;
    link-exchange farms show near-1.0 reciprocity (a standard web-spam
    feature alongside TrustRank). Returns
    (host, n_out, n_reciprocal, reciprocal_ppm) with the ratio in
    integer parts-per-million (floor div — engine-exact).

    Scale shape: one distinct-edge self-join on the (src,dst) pair key
    (equi-join, shuffle both sides on the same key) + one host-keyed
    count agg. Host-graph sized, never URL-graph sized."""
    e = host_edges.select("src_host", "dst_host").distinct()
    rev = e.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    rec = e.join(rev, on=["src_host", "dst_host"], how="left_semi")
    n_out = e.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("n_out")
    )
    n_rec = rec.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("n_reciprocal")
    )
    return (
        n_out.join(n_rec, on="host", how="left")
        .select(
            "host",
            "n_out",
            F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
            F.expr(
                "CAST((coalesce(n_reciprocal, 0) * CAST(1000000 AS BIGINT)) "
                "div n_out AS BIGINT)"
            ).alias("reciprocal_ppm"),
        )
    )


def incremental_pagerank(
    host_edges: DataFrame,
    prev_ranks: DataFrame,
    n_iter: int = 2,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Incremental PageRank for a CONTINUOUS crawl: when a round adds
    new edges/hosts, update ranks by warm-starting the fixed-point
    iteration from the previous round's ranks over the UPDATED graph,
    instead of recomputing from the uniform prior. The per-iteration
    contraction is unchanged, so a warm start needs far fewer
    iterations to be as close to the fixed point as a cold run — at
    10^8 hosts each avoided iteration is an edge-table join + shuffle.

    Exactly as deterministic as host_pagerank (same integer
    fixed-point arithmetic; the DuckDB oracle replays the two-phase
    computation CTE-for-CTE). New hosts enter at the uniform prior;
    total mass re-normalizes through the damping leak within the first
    iterations, same as the cold path."""
    return host_pagerank(
        host_edges,
        damping_num=damping_num,
        damping_den=damping_den,
        n_iter=n_iter,
        init_ranks=prev_ranks,
    )


def blend_priority(
    frontier: DataFrame,
    depths: DataFrame,
    host_ranks: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
    max_depth: int = 4,
) -> DataFrame:
    """Blend (request priority, link depth, host rank) into one integer
    crawl score — the north-star priority triple materialized:

      score = priority*10_000 + (max_depth+1 - depth)*1_000 + host_pctl

    where host_pctl is the host's PageRank percentile (0-100, computed
    on the rounded rank so it is engine-stable). Unreached URLs get
    depth max_depth+1 (score contribution 0). Integer arithmetic end
    to end — no float compare risk. host_ranks is per-host: the
    percentile rank is a GLOBAL total order over that table, computed
    via global_cumsum's range-shuffle machinery rather than an
    un-partitioned Window.orderBy — at 10^8 hosts the window would
    pull the whole rank table into one task. (rank, host) is tie-free
    (host is the PK), so rank() == row_number() == the cumsum of 1s.
    The resulting pctl table is broadcast back onto the frontier;
    depths join is url-keyed shuffle."""
    from sandcrawler_spark.operators.cumsum import global_cumsum

    n_hosts = host_ranks.count()
    rn = global_cumsum(
        host_ranks.select("host", "rank").withColumn("_one", F.lit(1).cast("long")),
        ["rank", "host"],
        "_one",
        out_col="_rn",
    )
    pctl = rn.select(
        F.col("host").alias("_h"),
        ((F.col("_rn") - 1) * 100 / F.lit(max(n_hosts - 1, 1)))
        .cast("int")
        .alias("host_pctl"),
    )
    d = depths.select(F.col("url").alias("_u"), "depth")
    out = (
        frontier.join(d, frontier[url_col] == d["_u"], "left")
        .drop("_u")
        .join(F.broadcast(pctl), frontier[host_col] == pctl["_h"], "left")
        .drop("_h")
    )
    depth_eff = F.coalesce(F.col("depth"), F.lit(max_depth + 1))
    score = (
        F.col(priority_col) * 10_000
        + (F.lit(max_depth + 1) - depth_eff) * 1_000
        + F.coalesce(F.col("host_pctl"), F.lit(0))
    )
    return out.select(
        F.col(url_col),
        F.col(host_col),
        F.col(priority_col),
        depth_eff.alias("link_depth"),
        F.coalesce(F.col("host_pctl"), F.lit(0)).alias("host_pctl"),
        score.alias("crawl_score"),
    )


def backlink_features(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Reverse-graph features per target URL — the frontier-priority
    signals the forward pass cannot see: (dst_url, n_inlinks,
    n_ref_hosts, top_referrer). n_ref_hosts (distinct referring
    hosts) is the spam-resistant variant of raw in-degree (one
    link-farm host inflates n_inlinks but not n_ref_hosts);
    top_referrer = lexicographic min source, a stable exemplar.
    One shuffle keyed by the target; distinct-host counting rides
    the same aggregation."""
    src_host = F.regexp_extract(F.col(src_col), r"^[a-z]+://([^/]+)", 1)
    return (
        edges.select(
            F.col(dst_col).alias("dst_url"),
            F.col(src_col).alias("_src"),
            src_host.alias("_src_host"),
        )
        .groupBy("dst_url")
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.countDistinct("_src_host").cast("long").alias("n_ref_hosts"),
            F.min("_src").alias("top_referrer"),
        )
    )


def host_triangles(host_edges: DataFrame) -> DataFrame:
    """Per-host triangle count + local clustering coefficient on the
    undirected distinct host graph — the classic link-farm /
    community-density signal next to reciprocal_link_stats: organic
    hub neighborhoods are sparse (low clustering), paid link cliques
    are near-complete (clustering -> 1).

    Algorithm: degree-ordered edge-iterator ("forward" algorithm,
    Schank & Wagner 2005) — orient every undirected edge from the
    lower-(degree, host) endpoint to the higher, join oriented edges
    sharing a source to enumerate each wedge once, and close the
    wedge against the oriented edge set. Each triangle is produced
    exactly once (at its lowest-rank corner).

    Scale shape (the reason this survives 10^8 hosts / 10^10 edges):
    after orientation every out-neighborhood is O(sqrt(m)) — the
    wedge join's per-key fan-out is bounded even at celebrity hosts,
    whereas the naive undirected wedge join explodes quadratically on
    hubs. Three equi-joins + two host-keyed aggs, all shuffle-keyed;
    the degree table is host-count-sized and broadcasts.

    Returns (host, degree, triangles, wedges, clustering_ppm) with
    clustering_ppm = 1e6 * triangles // wedges (floor div,
    engine-exact), wedges = degree*(degree-1)/2.
    """
    und = (
        host_edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .unionAll(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    # orient a--b from lower (degree, host) to higher; degree table is
    # tiny (one row per host) -> broadcast both attach joins
    withdeg = (
        und.join(F.broadcast(deg.withColumnRenamed("host", "a")
                              .withColumnRenamed("degree", "da")), "a")
        .join(F.broadcast(deg.withColumnRenamed("host", "b")
                           .withColumnRenamed("degree", "db")), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = e1.join(e2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"], "left_semi")
    per_host = (
        tris.select(F.col("u").alias("host"))
        .unionAll(tris.select(F.col("v1").alias("host")))
        .unionAll(tris.select(F.col("v2").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        deg.join(per_host, "host", "left")
        .select(
            "host",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.expr("CAST((degree * (degree - 1)) div 2 AS BIGINT)").alias("wedges"),
        )
        .withColumn(
            "clustering_ppm",
            F.when(
                F.col("wedges") > 0,
                F.expr("CAST((triangles * CAST(1000000 AS BIGINT)) div wedges AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )


# rel=canonical declaration, both attribute orders; rel value may be
# bare, single- or double-quoted, href double- or single-quoted
_CANON_REL_FIRST = (
    r"""<link[^>]*rel=["']?canonical["']?[^>]*href=["']([^"']+)["']"""
)
_CANON_HREF_FIRST = (
    r"""<link[^>]*href=["']([^"']+)["'][^>]*rel=["']?canonical["']?"""
)


def extract_canonical(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, canonical_url, is_self) — one row per page that declares
    a <link rel="canonical">: the page's OWN statement of its
    duplicate-cluster representative. The crawl-side complement of
    DUST rule mining (operators/dust.py learns aliases from observed
    duplicate content; this reads the aliases sites declare), and an
    alias edge the frontier can apply before fetching.

    Extraction is pure codegen (decode + two regexp_extracts covering
    both attribute orders, rel-first precedence when both appear);
    href resolution reuses the outlink RFC-3986 subset (absolute /
    protocol-relative / root-relative; other forms dropped).
    is_self marks pages that are their own canonical — the non-self
    rows are the actionable alias set. Zero shuffle: one narrow
    projection over the page scan.
    """
    doc = F.decode(F.col(html_col), "UTF-8")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    href = F.coalesce(
        F.nullif(F.regexp_extract(doc, _CANON_REL_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(doc, _CANON_HREF_FIRST, 1), F.lit("")),
    )
    raw = pages.select(
        F.col(url_col).alias("url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        href.alias("_href"),
    ).where(F.col("_href").isNotNull())
    canon = _resolve_dst(F.col("_href"), F.col("_sc"), F.col("_sh"))
    return (
        raw.select("url", canon.alias("canonical_url"))
        .where(F.col("canonical_url").isNotNull())
        .withColumn("is_self", F.col("canonical_url") == F.col("url"))
    )


HITS_SCALE = 1_000_000_000  # fixed-point hub/authority unit (1e-9)


def host_hits(host_edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM'99) on the weighted
    host graph — the directory-page / content-page split PageRank
    can't express: a hub that links to every good paper index scores
    high as a HUB while earning no authority, and the frontier can
    treat the two roles differently (fetch hubs for discovery,
    authorities for content).

    Fixed-point integer arithmetic, fixed iterations, like
    host_pagerank — but HITS needs per-iteration NORMALIZATION (the
    power iteration diverges unnormalized), and the classic L2 norm
    is float. Instead each half-step divides every contribution by a
    driver-collected integer scale factor s = max(1, T div HITS_SCALE)
    where T is the exact total contribution mass (collected as a
    38-digit decimal so the sum itself cannot overflow):

      auth'(v) = Σ_{u→v} (hub(u)  * w_uv) div s_a
      hub'(u)  = Σ_{u→v} (auth'(v)* w_uv) div s_h

    Floor division per EDGE keeps every per-row product within int64
    (hub ≤ ~2·HITS_SCALE after normalization; headroom for edge
    weights to ~10^9) and is replayed term-for-term by the DuckDB
    twin (HUGEINT scalar totals, BIGINT row math). Scores are
    relative — the ~SCALE-sum normalization preserves ranking
    exactly, which is all HITS semantics promise.

    Per iteration: two rank-onto-edges equi-joins + two dst/src
    sum-aggs + two scalar aggs; rank tables are one row per host
    (broadcast-able at any corpus scale). Same localCheckpoint
    discipline as host_pagerank — each iteration's output is
    materialized so the plan stays flat.

    Returns (host, hub, authority) int64 fixed-point scores.
    """
    host_edges = host_edges.localCheckpoint(eager=True)
    nodes = (
        host_edges.select(F.col("src_host").alias("host"))
        .unionByName(host_edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    e = host_edges.select("src_host", "dst_host", "weight").localCheckpoint(eager=True)

    def _half_step(ranks: DataFrame, rank_col: str, join_on: str, agg_to: str, out_col: str) -> DataFrame:
        """One normalized propagation: ranks[rank_col] flows along
        edges joined on join_on, aggregated per agg_to host."""
        contrib = e.join(ranks, e[join_on] == ranks["host"], "inner").select(
            F.col(agg_to).alias("_to"),
            (F.col(rank_col) * F.col("weight")).alias("_c"),
        )
        total = int(
            contrib.agg(
                F.coalesce(
                    F.sum(F.col("_c").cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                )
            ).collect()[0][0]
        )
        s = max(1, total // HITS_SCALE)
        summed = (
            contrib.select("_to", F.expr(f"_c div CAST({s} AS BIGINT)").alias("_c"))
            .groupBy("_to")
            .agg(F.sum("_c").alias("_c"))
        )
        return (
            nodes.join(summed, nodes["host"] == summed["_to"], "left")
            .select(
                nodes["host"],
                F.coalesce("_c", F.lit(0)).cast("long").alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    hub = nodes.withColumn("hub", F.lit(HITS_SCALE // max(n, 1)).cast("long"))
    auth = None
    for _ in range(n_iter):
        auth = _half_step(hub, "hub", "src_host", "dst_host", "authority")
        hub = _half_step(auth, "authority", "dst_host", "src_host", "hub")
    return hub.join(auth, "host").select("host", "hub", "authority")


def host_kcore(host_edges: DataFrame, k: int = 3, max_rounds: int = 8) -> DataFrame:
    """k-core of the undirected host graph (Seidman 1983): the maximal
    subgraph where every member keeps >= k neighbors INSIDE the
    subgraph. Dense cores that survive aggressive peeling are the
    classic link-farm / paid-network signal — organic sites lose their
    low-degree periphery and fall out, cliques don't — and the core is
    a natural "crawl deeper here" allowlist for hub-rich neighborhoods
    (complements host_triangles, which scores local density but not
    mutual reinforcement).

    Algorithm: synchronous peeling — drop every node with in-core
    degree < k, recompute, repeat. Each round is one semi-join of the
    edge list against the surviving node set + one degree agg; rounds
    cap at max_rounds with an early stop at the fixed point (peeling
    is monotone, so stopping early at the fixed point equals running
    all rounds — the DuckDB twin always unrolls max_rounds and must
    agree). Peel depth beyond max_rounds (a >max_rounds-long chain of
    cascading removals) leaves extra near-core nodes in — acceptable
    for a ranking signal, documented here; raise max_rounds for exact
    cores on deep-chain graphs.

    Scale shape: node set shrinks monotonically; per round the edge
    list is filtered by two broadcast-able semi-joins (the survivor
    table is host-count-sized) and one count agg. localCheckpoint per
    round keeps the plan flat (the host_pagerank discipline).

    Returns (host, core_degree) for members of the k-core, with
    core_degree the degree inside the core at the fixed point.
    """
    und = (
        host_edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    cur = (
        und.select(F.col("a").alias("host"))
        .unionByName(und.select(F.col("b").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cur = cur.count()
    deg = None
    for _ in range(max_rounds):
        live = (
            sym.join(cur.withColumnRenamed("host", "a"), "a", "left_semi")
            .join(cur.withColumnRenamed("host", "b"), "b", "left_semi")
        )
        deg = (
            live.groupBy(F.col("a").alias("host"))
            .agg(F.count("*").cast("long").alias("core_degree"))
            .filter(F.col("core_degree") >= F.lit(k))
            .localCheckpoint(eager=True)
        )
        n_next = deg.count()
        cur = deg.select("host")
        if n_next == n_cur:
            break
        n_cur = n_next
    return deg if deg is not None else cur.withColumn(
        "core_degree", F.lit(0).cast("long")
    )


def community_modularity(
    host_edges: DataFrame,
    labels: DataFrame,
    host_col: str = "host",
    label_col: str = "community",
) -> DataFrame:
    """Newman modularity of a host labeling, per community, in integer
    micro-units — the quality score that tells you whether host_lpa's
    (or any) partition found real structure: Q near 0 means the
    labeling explains nothing beyond degree, strongly positive
    communities are denser inside than chance, NEGATIVE contributions
    flag groupings a spam classifier should distrust.

      Q = Σ_c [ in2_c / M2  -  (tot_c / M2)^2 ]

    over the symmetrized weighted graph (A_uv = w(u→v) + w(v→u), the
    host_lpa convention), where M2 = Σ_uv A_uv = 2m, in2_c counts
    intra-community weight twice, tot_c sums member degrees.

    Determinism: both terms are floor divisions with DECIMAL(38,0)
    intermediates — tot_c^2 * 1e6 needs ≤ 38 digits, giving headroom
    to total graph weight ~1e15 (beyond any real host graph); the
    quotients are ≤ 1e6 so the BIGINT result of `div` never
    overflows. The DuckDB twin replays with HUGEINT.

    Scale shape: one symmetrize shuffle, two label attach joins (the
    label table is host-sized, broadcast-able), two label-keyed aggs;
    no windows, no driver loop beyond one scalar total.

    Returns (community, n_hosts, in_weight2, tot_degree,
    q_contrib_micro); SUM(q_contrib_micro) ~= Q * 1e6 (per-community
    flooring loses < n_communities micro-units).
    """
    sym = (
        host_edges.select("src_host", "dst_host", "weight")
        .unionAll(
            host_edges.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
                "weight",
            )
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.sum("weight").cast("long").alias("weight"))
        .localCheckpoint(eager=True)
    )
    m2 = int(
        sym.agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("long")).collect()[0][0]
    )
    lab = labels.select(F.col(host_col).alias("_h"), F.col(label_col).alias("_l"))
    deg = sym.groupBy("src_host").agg(F.sum("weight").cast("long").alias("_deg"))
    tot = (
        deg.join(lab, deg["src_host"] == lab["_h"])
        .groupBy("_l")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("_deg").cast("long").alias("tot_degree"),
        )
    )
    in2 = (
        sym.join(lab.withColumnRenamed("_h", "src_host").withColumnRenamed("_l", "_ls"), "src_host")
        .join(lab.withColumnRenamed("_h", "dst_host").withColumnRenamed("_l", "_ld"), "dst_host")
        .where(F.col("_ls") == F.col("_ld"))
        .groupBy(F.col("_ls").alias("_l"))
        .agg(F.sum("weight").cast("long").alias("in_weight2"))
    )
    return (
        tot.join(in2, "_l", "left")
        .select(
            F.col("_l").alias(label_col),
            "n_hosts",
            F.coalesce("in_weight2", F.lit(0)).cast("long").alias("in_weight2"),
            "tot_degree",
        )
        .withColumn(
            "q_contrib_micro",
            F.expr(
                f"(CAST(in_weight2 AS DECIMAL(38,0)) * 1000000) div CAST({max(m2,1)} AS DECIMAL(38,0))"
                f" - (CAST(tot_degree AS DECIMAL(38,0)) * CAST(tot_degree AS DECIMAL(38,0)) * 1000000)"
                f" div CAST({max(m2,1) * max(m2,1)} AS DECIMAL(38,0))"
            ).cast("long"),
        )
    )


def host_coupling(
    host_edges: DataFrame,
    min_common: int = 2,
    max_in_degree: int = 1000,
) -> DataFrame:
    """Bibliographic coupling between hosts (Kessler 1963, applied to
    the web graph): two hosts that LINK TO many of the same targets
    are topically related even if they never link each other — the
    similarity signal behind related-site discovery and seed-list
    expansion, orthogonal to triangles (mutual density) and k-core
    (peel resistance).

    coupling_ppm = |out(a) ∩ out(b)| * 1e6 div |out(a) ∪ out(b)| —
    integer Jaccard over distinct out-neighbor sets.

    Scale shape: the shared-target wedge join fans out quadratically
    on a celebrity TARGET (everyone links to the same CDN host), and
    such targets carry no topical signal — targets with in-degree >
    max_in_degree are excluded before pairing (the standard
    co-citation cap; same discipline as lsh_candidates' hot bands).
    After the cap, per-target fan-out is bounded, and the pair agg is
    keyed (a, b). Out-degrees attach via two broadcast joins of the
    host-sized degree table.

    Returns (host_a, host_b, common, coupling_ppm) for pairs sharing
    >= min_common targets.
    """
    e = (
        host_edges.select("src_host", "dst_host")
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dst_deg = e.groupBy("dst_host").agg(F.count("*").alias("_in"))
    informative = dst_deg.filter(F.col("_in") <= max_in_degree).select("dst_host")
    ee = e.join(F.broadcast(informative), "dst_host")
    # degrees over the SAME capped universe the intersection uses, so
    # the Jaccard is internally consistent
    out_deg = ee.groupBy("src_host").agg(F.count("*").cast("long").alias("_out"))
    a = ee.select(F.col("src_host").alias("host_a"), "dst_host")
    b = ee.select(F.col("src_host").alias("host_b"), "dst_host")
    pairs = (
        a.join(b, "dst_host")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("common"))
        .filter(F.col("common") >= F.lit(min_common))
    )
    return (
        pairs.join(
            F.broadcast(out_deg.withColumnRenamed("src_host", "host_a")
                        .withColumnRenamed("_out", "_oa")), "host_a"
        )
        .join(
            F.broadcast(out_deg.withColumnRenamed("src_host", "host_b")
                        .withColumnRenamed("_out", "_ob")), "host_b"
        )
        .select(
            "host_a", "host_b", "common",
            F.expr(
                "CAST((common * CAST(1000000 AS BIGINT)) div (_oa + _ob - common) AS BIGINT)"
            ).alias("coupling_ppm"),
        )
    )


def spam_mass(pagerank: DataFrame, trustrank: DataFrame, spam_ppm: int = 700_000) -> DataFrame:
    """Spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Link Spam
    Detection Based on Mass Estimation"): the fraction of a host's
    PageRank that does NOT come from the trusted core — relative mass
    m(h) = (PR(h) - TR(h)) / PR(h). Hosts whose rank is almost
    entirely self-manufactured (link farms) have mass ~1; hosts
    reachable from the trust seeds have mass ~0. The crawl loop uses
    it to demote high-PR-but-untrusted hosts the plain rank blend
    would over-crawl (reference analog: sandcrawler's blocklist is a
    manual version of this signal).

    Integer discipline: both inputs are PR_SCALE fixed-point ranks
    from host_pagerank / trust_rank; mass is reported in ppm with the
    untrusted excess clamped at 0 (a trusted host whose TR exceeds its
    PR has no spam mass, not negative mass — and the clamp keeps every
    division operand non-negative so Spark's truncating `div` and
    DuckDB's flooring `//` agree). PR's teleport base term guarantees
    rank > 0 for every host, so the divide is total.

    Scale shape: one broadcast-or-shuffle equi-join on host between two
    host-cardinality relations — trivially cluster-safe.
    """
    pr = pagerank.select(F.col("host"), F.col("rank").alias("pr_rank"))
    tr = trustrank.select(F.col("host"), F.col("rank").alias("trust_rank"))
    return (
        pr.join(tr, on="host", how="left")
        .select(
            "host",
            "pr_rank",
            F.coalesce(F.col("trust_rank"), F.lit(0)).cast("long").alias("trust_rank"),
        )
        .select(
            "host",
            "pr_rank",
            "trust_rank",
            F.expr(
                "CAST((greatest(CAST(0 AS BIGINT), pr_rank - trust_rank)"
                " * CAST(1000000 AS BIGINT)) div pr_rank AS BIGINT)"
            ).alias("spam_mass_ppm"),
        )
        .withColumn("is_spam", F.col("spam_mass_ppm") >= F.lit(spam_ppm))
    )


def bowtie_classes(host_edges: DataFrame, max_rounds: int = 8) -> DataFrame:
    """Bow-tie decomposition of the directed host graph (Broder et
    al., "Graph structure in the Web", WWW 2000): pick the
    highest-degree host as the pivot of the giant strongly-connected
    core, compute its bounded forward-reach set F and backward-reach
    set B, and classify every host as

      CORE  — in F ∩ B (the pivot's SCC, reachable both ways)
      IN    — in B only (can reach the core but not vice versa)
      OUT   — in F only (reachable from the core, no path back)
      OTHER — in neither (tendrils / disconnected components)

    The classic macro-structure report for a crawl corpus: a crawl
    seeded inside CORE covers CORE+OUT; IN mass is only reachable via
    external seeds — exactly the signal seed-selection needs.

    Determinism: pivot = max (in+out) weighted degree, ties broken by
    min host string. Reach is bounded at max_rounds BFS rounds on both
    sides (the oracle unrolls the same bound); for the host-contracted
    graph the diameter is far below the bound, so the bounded reach IS
    the reach.

    Scale shape: per round one equi-join frontier×edges + one
    left-anti against the accumulated reach set, every round
    localCheckpointed so the plan stays flat — the link_depth_bfs
    discipline. Reach sets are host-cardinality (≪ URL scale).
    """
    e = host_edges.select("src_host", "dst_host").localCheckpoint(eager=True)
    deg = (
        e.select(F.col("src_host").alias("host"))
        .unionByName(e.select(F.col("dst_host").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("_deg"))
        .localCheckpoint(eager=True)
    )
    pivot_row = (
        deg.orderBy(F.col("_deg").desc(), F.col("host").asc()).limit(1).collect()
    )
    if not pivot_row:
        return deg.select("host", F.lit("OTHER").alias("cls"))
    pivot = pivot_row[0]["host"]
    spark = host_edges.sparkSession

    def _reach(edges: DataFrame, src: str, dst: str) -> DataFrame:
        reached = spark.createDataFrame([(pivot,)], ["host"]).localCheckpoint(eager=True)
        frontier = reached
        for _ in range(max_rounds):
            nxt = (
                frontier.join(edges, frontier["host"] == edges[src], "inner")
                .select(F.col(dst).alias("host"))
                .distinct()
                .join(reached, on="host", how="left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return reached

    fwd = _reach(e, "src_host", "dst_host").withColumn("_f", F.lit(1))
    bwd = _reach(e, "dst_host", "src_host").withColumn("_b", F.lit(1))
    return (
        deg.select("host")
        .join(F.broadcast(fwd), on="host", how="left")
        .join(F.broadcast(bwd), on="host", how="left")
        .select(
            "host",
            F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(), "CORE")
            .when(F.col("_b").isNotNull(), "IN")
            .when(F.col("_f").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("cls"),
        )
    )


def seed_cover(host_edges: DataFrame, k: int = 4) -> DataFrame:
    """Greedy maximum-coverage seed selection: pick k source hosts
    whose out-link targets jointly cover the most of the reachable
    host space — the classic (1-1/e)-approximate seed list for a
    fresh crawl (maximum coverage is NP-hard; greedy is the standard
    answer, cf. the k-max-cover treatment in Hochbaum's survey).
    Round r picks the host with the most still-uncovered distinct
    targets (ties: min host), then marks its targets covered.

    Returns (round, host, gain, covered_total): gain = newly covered
    targets, covered_total = cumulative covered distinct targets.

    Determinism: pure max/min tiebreaks; bounded k rounds.

    Scale shape: per round one left-anti of the edge set against the
    covered set (host-cardinality, broadcastable), one groupBy(src)
    count, and a TakeOrdered(1) — no window over the full edge list.
    The covered set is localCheckpointed per round so the driver-
    bounded loop keeps a flat plan (link_depth_bfs discipline).
    """
    spark = host_edges.sparkSession
    e = (
        host_edges.select("src_host", "dst_host")
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = spark.createDataFrame([], "dst_host string").localCheckpoint(eager=True)
    out_rows: list[tuple[int, str, int, int]] = []
    n_covered = 0
    for r in range(1, k + 1):
        cand = (
            e.join(F.broadcast(covered), on="dst_host", how="left_anti")
            .groupBy("src_host")
            .agg(F.count("*").cast("long").alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("src_host").asc())
            .limit(1)
            .collect()
        )
        if not cand:
            break
        host, gain = cand[0]["src_host"], int(cand[0]["gain"])
        picked = spark.createDataFrame([(host,)], ["src_host"])
        newly = (
            e.join(F.broadcast(picked), on="src_host")
            .select("dst_host")
            .join(F.broadcast(covered), on="dst_host", how="left_anti")
            .distinct()
        )
        covered = covered.unionByName(newly).localCheckpoint(eager=True)
        n_covered += gain
        out_rows.append((r, host, gain, n_covered))
    return spark.createDataFrame(
        out_rows, "round int, host string, gain bigint, covered_total bigint"
    )


def degree_distribution(host_edges: DataFrame) -> DataFrame:
    """Log-binned in/out-degree distribution of the host graph — the
    power-law diagnostic every web-graph paper opens with (Broder et
    al. 2000 §3): a healthy crawl shows a straight log-log tail; a
    bulge of same-degree hosts is a template-farm / trap signature.

    Bin = floor(log2(degree)), computed as length of the binary
    string minus one (pure integer/string — no float log2, whose
    value at exact powers of two is the kind of cross-engine edge
    this repo bans). Returns (direction, bin, bin_lo, n_hosts) with
    bin_lo = 2^bin.

    Scale shape: two host-keyed degree aggregates (distinct-neighbor
    counts over the already-contracted host graph) + a ~60-row bin
    aggregate. Host-graph sized throughout.
    """
    def _side(src: str, label: str) -> DataFrame:
        deg = (
            host_edges.groupBy(F.col(src).alias("host"))
            .agg(F.count("*").cast("long").alias("deg"))
        )
        return deg.select(
            F.lit(label).alias("direction"),
            F.expr("CAST(length(conv(CAST(deg AS STRING), 10, 2)) - 1 AS INT)").alias("bin"),
        )
    return (
        _side("src_host", "out")
        .unionByName(_side("dst_host", "in"))
        .groupBy("direction", "bin")
        .agg(F.count("*").cast("long").alias("n_hosts"))
        .select(
            "direction",
            "bin",
            F.expr("CAST(1 AS BIGINT) << bin").alias("bin_lo"),
            "n_hosts",
        )
    )


def opic_scores(host_edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003), the page-importance measure designed FOR
    crawlers: unlike PageRank it needs no convergence phase, so a
    frontier can rank hosts mid-crawl from whatever cash/history has
    accumulated so far. This is the batch-synchronous variant: every
    host starts with an equal share of the total cash; each round a
    host spends ALL its cash — along its weighted out-edges if it has
    any, uniformly to every host if it is dangling (the virtual-root
    shortcut from §4 of the paper) — and banks what it spent into its
    history. Importance after k rounds is (history + cash) over the
    total, reported in ppm.

    Integer discipline (same rationale as host_pagerank): cash is
    carried in PR_SCALE fixed-point units with floor division, so the
    crawl ordering induced by the scores is bit-identical across
    engines and partitionings; the DuckDB oracle replays every round
    verbatim. Floor residue leaks < outdeg * 1e-12 cash per host per
    round — it only ever shrinks totals, never reorders ties.

    Overflow headroom: cash <= PR_SCALE (1e12) total, history <=
    n_iter * PR_SCALE; the final ppm multiply peaks ~ (n_iter+1) *
    1e12 * 1e6 < 2^63. cash*weight is bounded exactly as in
    host_pagerank (weights to ~5e5).

    Per round: one equi-join of the host-cardinality cash table onto
    the contracted edge list + one dst-sum + one scalar dangling agg —
    the identical shuffle shape proven out by host_pagerank; the loop
    is driver-bounded at n_iter.

    Returns (host, cash, history, importance_ppm).

    Reference analog: sandcrawler ranks recrawl candidates by static
    priority lanes (pig/filter-cdx-paper-pdfs.pig); OPIC is the
    adaptive importance signal a continuous crawl would blend in.
    """
    host_edges = host_edges.localCheckpoint(eager=True)
    nodes = (
        host_edges.select(F.col("src_host").alias("host"))
        .unionByName(host_edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_w = (
        host_edges.groupBy("src_host")
        .agg(F.sum("weight").alias("outw"))
        .localCheckpoint(eager=True)
    )
    e = (
        host_edges.join(out_w, on="src_host")
        .select("src_host", "dst_host", "weight", "outw")
        .localCheckpoint(eager=True)
    )
    state = nodes.select(
        "host",
        F.lit(PR_SCALE // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        dangling = (
            state.join(out_w, state["host"] == out_w["src_host"], "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )
        dang_term = int(dangling) // n
        inflow = (
            e.join(state, e["src_host"] == state["host"], "inner")
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(cash * weight) div outw").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        state = (
            state.join(inflow, on="host", how="left")
            .select(
                "host",
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(dang_term))
                .cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    total = state.agg(
        F.sum(F.col("cash") + F.col("hist")).cast("long")
    ).collect()[0][0]
    return state.select(
        "host",
        "cash",
        F.col("hist").alias("history"),
        F.expr(
            f"CAST(((cash + hist) * CAST(1000000 AS BIGINT)) div CAST({int(total)} AS BIGINT) AS BIGINT)"
        ).alias("importance_ppm"),
    )


def adamic_adar(
    host_edges: DataFrame,
    min_common: int = 2,
    max_degree: int = 1000,
) -> DataFrame:
    """Adamic–Adar link prediction over the undirected host graph
    (Adamic & Adar, "Friends and neighbors on the Web", 2003): two
    UNLINKED hosts sharing many low-degree neighbors are likely
    related — the seed-expansion / related-site signal complementary
    to host_coupling (shared out-targets) because it scores pairs the
    graph does NOT yet connect, down-weighting promiscuous neighbors:

      AA(a,b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z))

    Integer discipline: each neighbor contributes
    1e12 div round(1e6·ln(deg_z)) micro-units — ln is taken once per
    neighbor host on an integer degree (identical input in both
    engines, the lm.py micro-nat rounding), everything after is
    integer. deg_z >= 2 for any shared neighbor, so the divisor is
    never zero. Sum peaks at deg_cap * (1e12/693147) ~ 1.4e9 — no
    overflow risk.

    Scale shape: the wedge join through z fans out quadratically on a
    celebrity neighbor (every host "shares" a CDN), and such neighbors
    carry ~zero AA weight anyway (1/ln(deg) -> 0) — intermediates with
    deg > max_degree are dropped before pairing, the same hot-key cap
    as host_coupling / lsh_candidates. Existing edges are removed with
    one anti-join on the normalized pair key.

    Returns (host_a, host_b, common, aa_micro) for non-adjacent pairs
    with >= min_common shared neighbors.
    """
    und = (
        host_edges.select("src_host", "dst_host")
        .unionByName(
            host_edges.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
            )
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # und is symmetric: deg = out-neighbor count
    deg = und.groupBy(F.col("src_host").alias("z")).agg(
        F.count("*").cast("long").alias("deg")
    )
    # deg-1 hosts can never be a SHARED neighbor; drop them before the
    # weight expr so ln(1)=0 never reaches the divisor
    w = deg.filter((F.col("deg") >= 2) & (F.col("deg") <= max_degree)).select(
        "z",
        F.expr(
            "CAST(1000000000000 AS BIGINT) div "
            "CAST(round(ln(CAST(deg AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("w_micro"),
    )
    adj = und.select(F.col("src_host").alias("z_src"), F.col("dst_host"))
    # wedges x1 - z - x2 through capped intermediates only
    zx = (
        und.select(F.col("src_host").alias("z"), F.col("dst_host").alias("x"))
        .join(F.broadcast(w), "z")
    )
    a = zx.select("z", F.col("x").alias("host_a"), "w_micro")
    b = zx.select("z", F.col("x").alias("host_b"))
    pairs = (
        a.join(b, "z")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(
            F.count("*").cast("long").alias("common"),
            F.sum("w_micro").cast("long").alias("aa_micro"),
        )
        .filter(F.col("common") >= F.lit(min_common))
    )
    existing = und.where(F.col("src_host") < F.col("dst_host")).select(
        F.col("src_host").alias("host_a"), F.col("dst_host").alias("host_b")
    )
    return pairs.join(existing, ["host_a", "host_b"], "left_anti")


def salsa_scores(host_edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """SALSA (Lempel & Moran, WWW'00) hub/authority scores on the
    unweighted host-graph support, via the closed form instead of
    power iteration.

    SALSA replaces HITS's mutual reinforcement with two independent
    random walks on the bipartite hub/authority graph, each step
    normalized by degree. Its known closed form (the reason Twitter's
    WTF system could run it at scale): the stationary authority
    weight of node j is

        a(j) = (|C_j ∩ A| / |A|) * (d_in(j) / D_{C_j})

    where A is the set of authority-side nodes, C_j the connected
    component of j in the bipartite support graph, and D_C the total
    in-degree inside C — i.e. *within* a component authority mass is
    proportional to in-degree, and components split mass by their
    authority-node share. Hubs are symmetric with out-degree.

    So the whole computation is: one distinct-edge projection, one
    connected-components run on the bipartite graph ("H:src"/"A:dst"
    node namespaces — the same large-star/small-star O(log d)
    machinery the dedupe CC uses, operators/dedupe.py), two degree
    aggs, two per-component sums, and exact integer ppm division
    (decimal(38) products so |C| * d_in * 1e6 cannot overflow before
    the div). No per-iteration normalization, no float anywhere —
    unlike host_hits, whose power iteration needs driver-collected
    scale factors per half-step.

    Returns (host, d_out, d_in, hub_ppm, authority_ppm); hosts on one
    side only get 0 on the other. Rankings equal exact SALSA; the ppm
    floor-division is the only quantization.
    """
    from sandcrawler_spark.operators.dedupe import connected_components

    e = (
        host_edges.select("src_host", "dst_host")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bip = e.select(
        F.concat(F.lit("H:"), "src_host").alias("id_a"),
        F.concat(F.lit("A:"), "dst_host").alias("id_b"),
    )
    labels = connected_components(bip, max_iter=max_iter).localCheckpoint(eager=True)

    def _side(deg_on: str, prefix: str, deg_name: str, ppm_name: str) -> DataFrame:
        deg = e.groupBy(F.col(deg_on).alias("host")).agg(
            F.count("*").cast("long").alias(deg_name)
        )
        lab = labels.filter(F.col("id").startswith(prefix)).select(
            F.expr("substring(id, 3)").alias("host"), "label"
        )
        d = deg.join(lab, "host")
        n_side = d.count()
        comp = d.groupBy("label").agg(
            F.count("*").cast("long").alias("_n_comp"),
            F.sum(deg_name).cast("long").alias("_d_comp"),
        )
        return (
            d.join(comp, "label")
            .select(
                "host",
                F.col(deg_name),
                F.expr(
                    f"CAST(CAST(_n_comp AS DECIMAL(38,0)) * {deg_name} * 1000000 "
                    f"div (CAST({n_side} AS DECIMAL(38,0)) * _d_comp) AS BIGINT)"
                ).alias(ppm_name),
            )
        )

    hubs = _side("src_host", "H:", "d_out", "hub_ppm")
    auths = _side("dst_host", "A:", "d_in", "authority_ppm")
    return (
        hubs.join(auths, "host", "full_outer")
        .select(
            "host",
            F.coalesce("d_out", F.lit(0)).cast("long").alias("d_out"),
            F.coalesce("d_in", F.lit(0)).cast("long").alias("d_in"),
            F.coalesce("hub_ppm", F.lit(0)).cast("long").alias("hub_ppm"),
            F.coalesce("authority_ppm", F.lit(0)).cast("long").alias("authority_ppm"),
        )
    )


def degree_assortativity(host_edges: DataFrame) -> DataFrame:
    """Degree assortativity of the undirected host-graph support
    (Newman, PRL'02): the Pearson correlation of the degrees at the
    two ends of every edge. The web is famously *disassortative*
    (hubs link to leaves), and a crawl frontier whose sampled
    subgraph flips that sign is a biased-frontier smell — this is the
    one-row QA receipt next to degree_distribution's histogram.

    Exact-integer trick: on the symmetrized edge-end list both
    marginals are identical, so Pearson's denominator
    sqrt(var_x)*sqrt(var_y) collapses to plain var — no square root,
    and r = (m*Sjk - Sj^2) / (m*Sj2 - Sj^2) is a ratio of exact
    int64-derived decimal(38) products. The ppm result uses
    sign-split truncating division (both engines truncate toward
    zero; splitting the sign makes that explicit).

    One distinct-edge shuffle, one degree agg (broadcast-joined
    back), one scalar agg: nothing here accumulates per-key state, so
    a celebrity host costs only its degree row. Returns a single row
    (m_ends, sum_deg, sum_prod, sum_sq, r_micro); r_micro = 0 for
    degenerate (regular or empty) graphs.
    """
    und = (
        host_edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .unionByName(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ends = (
        und.join(F.broadcast(deg.withColumnRenamed("host", "a").withColumnRenamed("deg", "j")), "a")
        .join(F.broadcast(deg.withColumnRenamed("host", "b").withColumnRenamed("deg", "k")), "b")
        .select("j", "k")
    )
    sym = ends.unionByName(ends.select(F.col("k").alias("j"), F.col("j").alias("k")))
    agg = sym.agg(
        F.count("*").cast("long").alias("m_ends"),
        F.sum("j").cast("long").alias("sum_deg"),
        F.sum(F.expr("j * k")).cast("long").alias("sum_prod"),
        F.sum(F.expr("j * j")).cast("long").alias("sum_sq"),
    )
    num = (
        "CAST(m_ends AS DECIMAL(38,0)) * sum_prod "
        "- CAST(sum_deg AS DECIMAL(38,0)) * sum_deg"
    )
    den = (
        "CAST(m_ends AS DECIMAL(38,0)) * sum_sq "
        "- CAST(sum_deg AS DECIMAL(38,0)) * sum_deg"
    )
    return agg.select(
        "m_ends",
        "sum_deg",
        "sum_prod",
        "sum_sq",
        F.expr(
            f"CAST(CASE WHEN ({den}) = 0 THEN 0 "
            f"WHEN ({num}) < 0 THEN -((-({num}) * 1000000) div ({den})) "
            f"ELSE (({num}) * 1000000) div ({den}) END AS BIGINT)"
        ).alias("r_micro"),
    )


# one <link ...> tag; lang + href pulled from the SAME tag afterwards,
# so attribute order inside the tag doesn't matter
_LINK_TAG = r"<link\b[^>]*>"
_HREFLANG_ATTR = r"""hreflang=["']?([A-Za-z0-9-]+)"""
_HREF_ATTR = r"""href=["']([^"']+)["']"""


def extract_hreflang(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, hreflang, alt_url, is_default) — one row per declared
    language alternate: <link rel="alternate" hreflang="xx" href=...>.
    hreflang clusters are the web's own DOCUMENT ALIGNMENT layer — a
    multilingual corpus builder gets translation-pair candidates
    (bitext mining seeds) and per-language variant routing for free,
    where near-dup detection would wrongly merge and language-ID can
    only bucket. is_default marks hreflang="x-default".

    Extraction is pure codegen: regexp_extract_all pulls whole <link>
    tags, an array filter keeps rel=alternate tags carrying both
    attributes, and lang/href are extracted per tag — so attribute
    ORDER inside the tag is free, unlike the two-pattern canonical
    approach. href resolution reuses the outlink RFC-3986 subset.
    Zero shuffle: one narrow projection over the page scan.
    """
    doc = F.decode(F.col(html_col), "UTF-8")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    tags = F.filter(
        F.regexp_extract_all(doc, F.lit(_LINK_TAG), F.lit(0)),
        lambda t: t.rlike(r"""rel=["']?alternate""")
        & t.rlike(_HREFLANG_ATTR)
        & t.rlike(_HREF_ATTR),
    )
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, _HREFLANG_ATTR, 1)).alias("hreflang"),
            F.regexp_extract(t, _HREF_ATTR, 1).alias("href"),
        ),
    )
    raw = pages.select(
        F.col(url_col).alias("url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        F.explode(pairs).alias("_p"),
    )
    alt = _resolve_dst(F.col("_p.href"), F.col("_sc"), F.col("_sh"))
    return (
        raw.select(
            "url",
            F.col("_p.hreflang").alias("hreflang"),
            alt.alias("alt_url"),
        )
        .where(F.col("alt_url").isNotNull())
        .withColumn("is_default", F.col("hreflang") == F.lit("x-default"))
    )


def hreflang_pairs(alternates: DataFrame) -> DataFrame:
    """Aligned translation-pair candidates from the hreflang table:
    within each declaring page's alternate set, every ordered pair of
    DIFFERENT non-default languages — (url_a, lang_a, url_b, lang_b)
    with lang_a < lang_b, deduped across declaring pages (each member
    of a cluster re-declares the same set, so the same pair surfaces
    |cluster| times).

    Scale shape: the self-join key is the declaring page URL — fan-out
    is bounded by languages-per-page (tens at most, a site's locale
    count), never corpus-sized; the dedupe is one distinct on the pair.
    """
    base = alternates.filter(~F.col("is_default"))
    a = base.select(
        "url", F.col("hreflang").alias("lang_a"), F.col("alt_url").alias("url_a")
    )
    b = base.select(
        "url", F.col("hreflang").alias("lang_b"), F.col("alt_url").alias("url_b")
    )
    return (
        a.join(b, "url")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .select("lang_a", "url_a", "lang_b", "url_b")
        .distinct()
    )


_META_TAG = r"<meta\b[^>]*>"
# content="5; url=/new" | content='0;URL=http://x' — delay, then the
# target after the (case-insensitive) url= key, quotes optional
_REFRESH_DELAY = r"""content=["']?\s*(\d+)"""
_REFRESH_URL = r"""[Uu][Rr][Ll]\s*=\s*["']?([^"'>\s]+)"""


def extract_meta_refresh(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, delay_sec, target_url) — one row per page carrying a
    <meta http-equiv="refresh" content="N;url=..."> client-side
    redirect: the third redirect channel after HTTP 3xx and
    rel=canonical, and the one soft-alias/parked-domain farms favor
    (the reference's hop loop follows only HTTP redirects,
    python/sandcrawler/ia.py; pages that 200-then-meta-refresh leak
    into the corpus as empty shells unless caught here).

    Same codegen shape as extract_hreflang: regexp_extract_all over
    <meta> tags, an array filter for http-equiv=refresh (any case,
    either attribute order), delay + target pulled from the SAME tag,
    RFC-3986-subset href resolution. delay_sec is exact integer; a
    page with several refresh tags contributes its first (document
    order, the browser rule). Zero shuffle.
    """
    doc = F.decode(F.col(html_col), "UTF-8")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    tags = F.filter(
        F.regexp_extract_all(doc, F.lit(_META_TAG), F.lit(0)),
        lambda t: t.rlike(r"""(?i)http-equiv=["']?refresh""")
        & t.rlike(_REFRESH_URL),
    )
    first = F.get(tags, 0)  # NULL on no-refresh pages (element_at throws under ANSI)
    raw = pages.select(
        F.col(url_col).alias("url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        first.alias("_t"),
    ).where(F.col("_t").isNotNull())
    target = _resolve_dst(
        F.regexp_extract(F.col("_t"), _REFRESH_URL, 1), F.col("_sc"), F.col("_sh")
    )
    return (
        raw.select(
            "url",
            F.coalesce(
                F.nullif(F.regexp_extract(F.col("_t"), _REFRESH_DELAY, 1), F.lit("")),
                F.lit("0"),
            )
            .cast("long")
            .alias("delay_sec"),
            target.alias("target_url"),
        )
        .where(F.col("target_url").isNotNull())
    )


def host_moves(
    redirects: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    min_count: int = 5,
    share_ppm: int = 800_000,
) -> DataFrame:
    """Site-migration detection from observed redirects: a host whose
    redirecting URLs overwhelmingly land on ONE other host has moved —
    the frontier should rewrite its queued URLs and the seen set
    should alias its history (the reference re-discovers moved sites
    URL by URL through the hop loop; this lifts it to one host-level
    decision). Returns per redirecting host its top destination host:
    (src_host, dst_host, n_pair, n_total, share_ppm, moved).

    One (src_host, dst_host) count shuffle + a same-key total agg
    joined back + a min(struct) argmax per src_host — no windows, a
    mega-host costs its distinct-destination rows only. Self-host
    redirects (http->https, path shuffles) are excluded up front.
    """
    hp = r"^https?://([^/]+)"
    e = redirects.select(
        F.regexp_extract(F.col(src_col), hp, 1).alias("src_host"),
        F.regexp_extract(F.col(dst_col), hp, 1).alias("dst_host"),
    ).filter(
        (F.col("src_host") != "") & (F.col("dst_host") != "")
        & (F.col("src_host") != F.col("dst_host"))
    )
    pairs = e.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n_pair")
    )
    return host_moves_from_counts(pairs, min_count=min_count, share_ppm=share_ppm)


def host_moves_from_counts(
    pairs: DataFrame,
    min_count: int = 5,
    share_ppm: int = 800_000,
) -> DataFrame:
    """host_moves' decision half over a pre-aggregated
    (src_host, dst_host, n_pair) count table — the form a crawl
    runner accumulates across rounds (counts SUM-merge, so the store
    is mergeable state like the CMS cells)."""
    totals = pairs.groupBy("src_host").agg(F.sum("n_pair").cast("long").alias("n_total"))
    top = pairs.groupBy("src_host").agg(
        F.min(
            F.struct((-F.col("n_pair")).alias("neg"), F.col("dst_host").alias("dst_host"))
        ).alias("_top")
    ).select(
        "src_host",
        F.col("_top.dst_host").alias("dst_host"),
        (-F.col("_top.neg")).cast("long").alias("n_pair"),
    )
    out = top.join(totals, "src_host").withColumn(
        "share_ppm",
        F.expr("CAST(n_pair * CAST(1000000 AS BIGINT) div n_total AS BIGINT)"),
    )
    return out.withColumn(
        "moved",
        (F.col("n_total") >= min_count) & (F.col("share_ppm") >= share_ppm),
    )


def host_ktruss(host_edges: DataFrame, k: int = 3, max_rounds: int = 6) -> DataFrame:
    """k-truss of the undirected host graph (Cohen 2008): the maximal
    subgraph where every EDGE sits in >= k-2 triangles inside the
    subgraph. Strictly stronger community evidence than k-core —
    a star survives a 2-core, but no star edge survives a 3-truss;
    the truss keeps only mutually-triangulated link neighborhoods,
    which is the signature of paid link cliques and of genuine topical
    communities alike (route either way: ban-list or crawl-deeper).

    Algorithm: synchronous support peeling. Per round over the live
    edge set: enumerate each triangle once via the degree-ordered
    "forward" orientation (Schank & Wagner 2005 — the same hub-safe
    shape host_triangles uses: after orienting low->high-(degree,host)
    every out-neighborhood is O(sqrt(m)), so celebrity hosts never
    explode the wedge join), explode each triangle into its 3
    canonical (a<b) edges, count support per edge, drop edges with
    support < k-2, repeat. Early stop at the edge-count fixed point
    equals the full unroll (peeling is monotone; the DuckDB twin
    unrolls max_rounds). Cascades deeper than max_rounds leave
    near-truss edges in — documented bound, raise max_rounds for
    exact trusses on pathological chains.

    Scale shape per round: one degree agg (host-sized, broadcasts
    onto the edge list), one oriented wedge self-join (fan-out
    sqrt-bounded), one closing semi-join keyed on the oriented edge,
    one support groupBy keyed on the canonical edge. localCheckpoint
    per round keeps the plan flat (host_pagerank discipline).

    Returns (a, b, support) for the surviving edges with their
    in-truss triangle support at the fixed point.
    """
    und = (
        host_edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = und
    n_cur = cur.count()
    out = None
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("host"))
            .unionAll(cur.select(F.col("b").alias("host")))
            .groupBy("host")
            .agg(F.count("*").cast("long").alias("degree"))
        )
        withdeg = (
            cur.join(
                F.broadcast(
                    deg.withColumnRenamed("host", "a").withColumnRenamed("degree", "da")
                ),
                "a",
            ).join(
                F.broadcast(
                    deg.withColumnRenamed("host", "b").withColumnRenamed("degree", "db")
                ),
                "b",
            )
        )
        lo_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        oriented = withdeg.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
            F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        )
        e1 = oriented.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
        e2 = oriented.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
        # wedge (u, v1, v2) once per unordered {v1, v2}: order the legs
        # by the SAME (degree, host) rank the orientation used, so the
        # closing edge (v1 -> v2) is oriented and present iff the
        # triangle exists
        wedges = e1.join(e2, "u").where(
            (F.col("d1") < F.col("d2"))
            | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
        )
        tri = wedges.join(
            oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
            ["v1", "v2"],
            "left_semi",
        ).select("u", "v1", "v2")
        edges3 = (
            tri.select(F.least("u", "v1").alias("a"), F.greatest("u", "v1").alias("b"))
            .unionAll(
                tri.select(F.least("u", "v2").alias("a"), F.greatest("u", "v2").alias("b"))
            )
            .unionAll(
                tri.select(F.least("v1", "v2").alias("a"), F.greatest("v1", "v2").alias("b"))
            )
        )
        supp = edges3.groupBy("a", "b").agg(
            F.count("*").cast("long").alias("support")
        )
        out = (
            cur.join(supp, ["a", "b"], "left")
            .withColumn("support", F.coalesce("support", F.lit(0).cast("long")))
            .filter(F.col("support") >= F.lit(k - 2))
            .localCheckpoint(eager=True)
        )
        n_next = out.count()
        cur = out.select("a", "b")
        if n_next == n_cur:
            break
        n_cur = n_next
    if out is None:  # max_rounds = 0
        return und.withColumn("support", F.lit(0).cast("long"))
    return out.select("a", "b", "support")


def host_outlink_entropy(
    host_edges: DataFrame,
    low_micronat: int = 200_000,
    min_targets_for_flag: int = 1,
) -> DataFrame:
    """Per-host Shannon entropy of the outlink target distribution —
    the cheap link-farm / SEO-spam signal: an organic host spreads its
    outlinks across many targets (high entropy), a farm funnels them
    into a handful of boosted targets (entropy near 0 with large
    volume). Complements spam_mass (linkgraph) which needs a seed set;
    entropy needs only the host graph itself.

    Same integer micro-nat discipline as diagnostics.char_entropy:
    H = ln(L) - (Σ_t w_t · round(1e6·ln w_t)) / L with ONE rounding per
    (host, target) weight and floor division after — exact across
    engines and partitionings. Hosts with a single target have H = 0;
    flagged `funnel` when entropy < low_micronat with more than
    min_targets_for_flag targets (volume present, diversity absent).

    Scale shape: input is the already-contracted host graph (one
    groupBy from URL scale); this adds ONE host-keyed aggregate with
    map-side partials. No window, no join.
    """
    wln = (
        F.col("weight").cast("long")
        * F.round(F.log(F.col("weight").cast("double")) * 1_000_000).cast("long")
    ).cast("long")
    return (
        host_edges.select("src_host", F.col("weight").cast("long").alias("weight"))
        .withColumn("_wln", wln)
        .groupBy("src_host")
        .agg(
            F.count("*").cast("long").alias("n_targets"),
            F.sum("weight").cast("long").alias("n_outlinks"),
            F.sum("_wln").cast("long").alias("_swln"),
        )
        .select(
            "src_host",
            "n_targets",
            "n_outlinks",
            F.expr(
                "CAST(CAST(round(ln(CAST(n_outlinks AS DOUBLE)) * 1000000) AS BIGINT)"
                " - _swln div n_outlinks AS BIGINT)"
            ).alias("entropy_micronat"),
        )
        .withColumn(
            "funnel",
            (F.col("entropy_micronat") < F.lit(low_micronat))
            & (F.col("n_targets") > F.lit(min_targets_for_flag)),
        )
    )


def anchor_stuffing(
    anchors: DataFrame,
    min_anchors: int = 10,
    share_ppm_threshold: int = 800_000,
) -> DataFrame:
    """Per-SOURCE-host anchor-text concentration — the keyword-stuffing
    / template-spam signal complementary to host_outlink_entropy: a
    host whose pages repeat one anchor string for most of their links
    is SEO boilerplate, not editorial linking (the complement of the
    Brin & Page relevance assumption anchor_summary exploits).

    Returns (src_host, n_anchors, n_texts, top_text, top_n,
    top_share_ppm, stuffed) where top_share_ppm = 1e6·top_n/n_anchors
    (floor) and stuffed = share >= threshold AND n_anchors >=
    min_anchors (volume present, diversity absent).

    Scale shape: ONE (host, text) count shuffle with map-side partials
    then ONE host-keyed aggregate — the top text comes from
    min_by(text, (-cnt, text)) inside the aggregate, NOT a per-host
    window (a template host's distinct-text set can be huge; the
    aggregate ships one partial per partition).
    """
    host = F.regexp_extract("src_url", r"^https?://([^/]+)", 1)
    per = (
        anchors.select(host.alias("src_host"), "anchor_text")
        .groupBy("src_host", "anchor_text")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        per.groupBy("src_host")
        .agg(
            F.sum("cnt").cast("long").alias("n_anchors"),
            F.count("*").cast("long").alias("n_texts"),
            F.expr("min_by(anchor_text, struct(-cnt, anchor_text))").alias("top_text"),
            F.max("cnt").cast("long").alias("top_n"),
        )
        .withColumn(
            "top_share_ppm",
            F.expr("CAST((1000000 * top_n) div greatest(CAST(1 AS BIGINT), n_anchors) AS BIGINT)"),
        )
        .withColumn(
            "stuffed",
            (F.col("top_share_ppm") >= F.lit(share_ppm_threshold))
            & (F.col("n_anchors") >= F.lit(min_anchors)),
        )
        .select(
            "src_host", "n_anchors", "n_texts", "top_text", "top_n",
            "top_share_ppm", "stuffed",
        )
    )


def nepotistic_links(host_edges: DataFrame, n_ips: int = 16) -> DataFrame:
    """Davison'00 nepotistic-link detection at host granularity: an
    outlink whose endpoints resolve to the same server address conveys
    ownership, not endorsement — link farms hosted on one box fabricate
    rank mass that PageRank/HITS would otherwise honor. Per source
    host: weighted out-degree, the same-IP slice of it, nepotism share
    in ppm, and the discounted (clean) out-weight the rank iterations
    should use instead.

    Resolution here is the deterministic stub resolver
    (operators/ipschedule.py resolve_ip_col) applied per endpoint as a
    pure codegen expression — with a real resolver this becomes two
    broadcast joins against the host→ip dimension (hosts ~10^7: well
    inside broadcast range). Either way the edge stream is touched
    once, then ONE src_host-keyed aggregate on the already host-scale
    graph. No windows, no Python.
    """
    from sandcrawler_spark.operators.ipschedule import resolve_ip_col

    e = host_edges.select(
        "src_host",
        "weight",
        (
            resolve_ip_col(F.col("src_host"), n_ips)
            == resolve_ip_col(F.col("dst_host"), n_ips)
        ).alias("_same"),
    )
    w = F.col("weight").cast("long")
    agg = e.groupBy("src_host").agg(
        F.sum(w).cast("long").alias("out_weight"),
        F.sum(F.when(F.col("_same"), w).otherwise(F.lit(0))).cast("long").alias("same_ip_weight"),
        F.count(F.lit(1)).cast("long").alias("n_out_hosts"),
        F.sum(F.when(F.col("_same"), 1).otherwise(0)).cast("long").alias("n_same_ip_hosts"),
    )
    # integer div (not float-divide-then-cast): exact past 2^53
    return agg.select(
        "src_host",
        "out_weight",
        "same_ip_weight",
        "n_out_hosts",
        "n_same_ip_hosts",
        F.expr(
            "CAST(1000000 AS BIGINT) * same_ip_weight div out_weight"
        ).alias("nepotism_ppm"),
        (F.col("out_weight") - F.col("same_ip_weight")).alias("clean_out_weight"),
    )
