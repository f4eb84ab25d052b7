"""Fetch simulation: frontier requests × capture index -> ingest results.

Reference semantics being reproduced (no live network — "fetch" is a
join against the pages/cdx tables, per SURVEY.md §2.1 S13-S15):

  - IngestFileWorker.process hop loop (/root/reference/python/
    sandcrawler/ingest.py:464-737): canonicalize -> blocklist/wall/
    cookie checks EVERY hop (ingest.py:481-525) -> find best capture ->
    redirect following with loop detection -> HTML landing page =>
    extract next-hop PDF URL (ingest.py:611-640) -> mimetype-vs-type
    verdict (ingest.py:698-711) -> bounded at max_hops=6 (ingest.py:77).
  - Status taxonomy preserved: success, no-capture, no-pdf-link,
    link-loop, redirect-loop, max-hops-exceeded, terminal-bad-status,
    wrong-mimetype, null-body, blocked-cookie, skip-url-blocklist,
    skip-wall, redirects-exceeded.

Shape: a DRIVER-BOUNDED iterative DataFrame loop (≤ max_hops rounds).
Each round is one equi-join on the canonicalized URL + one window to
pick the best capture + a biblio UDF over ONLY the html-hop slice
(the set of still-active rows shrinks geometrically). State is
persisted per round to keep the physical plan flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sandcrawler_spark.functions.biblio import biblio_udf
from sandcrawler_spark.functions.urls import clean_url_udf

# substring blocklists (reference ingest.py:88-152 keeps ~24 entries;
# ours is configurable per call — these defaults match the synthetic
# corpus' trap shapes)
DEFAULT_BLOCKLIST = ("://blocked.example.com/", "/domain-squat/")
DEFAULT_WALL_LIST = ("/login.htm", "?SAMLRequest=")
COOKIE_TRAPS = ("/cookieAbsent", "cookieSet=1")

RESULT_COLS = [
    "ingest_type",
    "base_url",
    "hit",
    "status",
    "terminal_url",
    "terminal_dt",
    "terminal_status_code",
    "terminal_sha1hex",
    "hops",
]


def _contains_any(col, needles) -> F.Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def fetch_simulate(
    requests: DataFrame,
    cdx: DataFrame,
    pages: DataFrame,
    max_hops: int = 6,
    blocklist=DEFAULT_BLOCKLIST,
    wall_list=DEFAULT_WALL_LIST,
) -> DataFrame:
    """requests(ingest_type, base_url, ...) -> one result row per
    request with the reference's status taxonomy."""
    spark = requests.sparkSession

    cdx2 = (
        cdx.withColumn("canon_url", clean_url_udf(F.col("url")))
        .select(
            "canon_url",
            F.col("url").alias("cap_url"),
            "datetime",
            "mimetype",
            "status_code",
            "sha1hex",
            "warc_csize",
            "warc_path",
            "redirect_url",
        )
    )
    # persist: the hop loop joins against cdx2 up to max_hops+1 times —
    # without this every hop re-runs the full capture scan AND the
    # clean_url pandas UDF over every capture row (at web scale that is
    # max_hops redundant Python passes over the whole CDX index)
    cdx2 = cdx2.persist()
    bodies = pages.select(
        F.col("url").alias("cap_url"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("datetime"),
        "html",
    ).persist()

    # normalize ingest_type (legacy 'file' -> 'pdf'; persist.py:79-80)
    ing = F.when(F.col("ingest_type") == "file", "pdf").otherwise(F.col("ingest_type"))
    state = requests.select(
        ing.alias("ingest_type"),
        F.col("base_url"),
        clean_url_udf(F.col("base_url")).alias("cur_url"),
        F.array(clean_url_udf(F.col("base_url"))).alias("hops"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("string").alias("terminal_url"),
        F.lit(None).cast("string").alias("terminal_dt"),
        F.lit(None).cast("int").alias("terminal_status_code"),
        F.lit(None).cast("string").alias("terminal_sha1hex"),
    )
    # reject unsupported types up-front (want() gate, ingest.py:459-472)
    state = state.withColumn(
        "status",
        F.when(~F.col("ingest_type").isin("pdf", "html", "xml"), F.lit("wrong-ingest-type")).otherwise(
            F.col("status")
        ),
    )

    best_mime = (
        F.when(F.col("ingest_type") == "pdf", "application/pdf")
        .when(F.col("ingest_type") == "html", "text/html")
        .otherwise("text/xml")
    )

    done_parts: list[DataFrame] = []
    for _hop in range(max_hops + 1):
        # checkpoint per-round state: truncates lineage so the plan
        # stays flat across iterations (bounded unroll, SURVEY.md §4
        # "hop-loop driver") — without this the tree depth grows
        # superlinearly in hops and plan handling dominates wall-clock.
        # LAZY checkpoint + count: one job materializes the checkpoint
        # AND answers the continue/stop question (the eager-checkpoint
        # + isEmpty pair was two driver actions per hop — fixed costs
        # that don't shrink with cores).
        state = state.localCheckpoint(eager=False)

        done_parts.append(state.filter(F.col("status").isNotNull()))
        active = state.filter(F.col("status").isNull())
        if active.count() == 0:
            break

        # --- per-hop URL gates (checked EVERY hop, ingest.py:481-525) ---
        cur = F.col("cur_url")
        gated = active.withColumn(
            "status",
            F.when(_contains_any(cur, blocklist), "skip-url-blocklist")
            .when(_contains_any(cur, wall_list), "skip-wall")
            .when(_contains_any(cur, COOKIE_TRAPS), "blocked-cookie")
            .otherwise(F.lit(None)),
        )
        done_parts.append(gated.filter(F.col("status").isNotNull()))
        active = gated.filter(F.col("status").isNull())

        # --- best capture for the current URL ---
        j = active.join(cdx2, active["cur_url"] == cdx2["canon_url"], "left")
        w = Window.partitionBy("ingest_type", "base_url", "cur_url").orderBy(
            F.col("status_code").isin(200, 226).cast("int").desc(),
            (-F.coalesce(F.col("status_code"), F.lit(999))).desc(),
            (F.col("mimetype") == best_mime).cast("int").desc(),
            (F.col("mimetype") != "warc/revisit").cast("int").desc(),
            F.col("warc_path").contains("/").cast("int").desc(),
            F.col("datetime").desc(),
        )
        best = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

        # --- classify the hop outcome ---
        is_redirect = (
            F.col("status_code").isin(301, 302, 303, 307, 308)
            & F.col("redirect_url").isNotNull()
        )
        html_hop = (
            (F.col("ingest_type") == "pdf")
            & F.col("status_code").isin(200, 226)
            & (F.col("mimetype") == "text/html")
        )
        mimetype_ok = (
            ((F.col("ingest_type") == "pdf") & (F.col("mimetype") == "application/pdf"))
            | (
                (F.col("ingest_type") == "html")
                & F.col("mimetype").isin("text/html", "application/xhtml+xml")
            )
            | (
                (F.col("ingest_type") == "xml")
                & F.col("mimetype").isin("text/xml", "application/xml", "application/jats+xml")
            )
        )
        classified = best.withColumn(
            "_verdict",
            F.when(F.col("canon_url").isNull(), "no-capture")
            .when(is_redirect, "redirect")
            .when(~F.col("status_code").isin(200, 226), "terminal-bad-status")
            .when(F.col("warc_csize") == 0, "null-body")
            .when(html_hop, "html-hop")
            .when(mimetype_ok, "success")
            .otherwise("wrong-mimetype"),
        )

        # terminal rows (everything but redirect/html-hop finishes here)
        terminal = classified.filter(~F.col("_verdict").isin("redirect", "html-hop")).select(
            "ingest_type",
            "base_url",
            "cur_url",
            "hops",
            F.col("_verdict").alias("status"),
            F.col("cap_url").alias("terminal_url"),
            F.col("datetime").alias("terminal_dt"),
            F.col("status_code").alias("terminal_status_code"),
            F.when(F.col("_verdict").isin("success", "wrong-mimetype"), F.col("sha1hex"))
            .otherwise(F.lit(None))
            .alias("terminal_sha1hex"),
        )
        done_parts.append(terminal)

        # --- redirects: follow, with loop / budget detection ---
        redirects = classified.filter(F.col("_verdict") == "redirect").withColumn(
            "_next", clean_url_udf(F.col("redirect_url"))
        )

        # --- html landing hop: fetch the body, extract the PDF link ---
        hops_html = (
            classified.filter(F.col("_verdict") == "html-hop")
            .join(bodies, on=["cap_url", "datetime"], how="left")
            .withColumn("_biblio", biblio_udf(F.col("html"), F.col("cap_url")))
            .withColumn(
                "_next",
                F.when(
                    F.col("_biblio.pdf_fulltext_url").isNotNull(),
                    clean_url_udf(F.col("_biblio.pdf_fulltext_url")),
                ),
            )
        )
        no_link = hops_html.filter(F.col("_next").isNull()).select(
            "ingest_type",
            "base_url",
            "cur_url",
            "hops",
            F.lit("no-pdf-link").alias("status"),
            F.col("cap_url").alias("terminal_url"),
            F.col("datetime").alias("terminal_dt"),
            F.col("status_code").alias("terminal_status_code"),
            F.col("sha1hex").alias("terminal_sha1hex"),
        )
        done_parts.append(no_link)

        next_candidates = redirects.select(
            "ingest_type", "base_url", "hops", "_next", F.lit("redirect").alias("_via")
        ).unionByName(
            hops_html.filter(F.col("_next").isNotNull()).select(
                "ingest_type", "base_url", "hops", "_next", F.lit("html").alias("_via")
            )
        )

        looped = F.array_contains(F.col("hops"), F.col("_next"))
        over_budget = F.size(F.col("hops")) >= max_hops
        next_state = next_candidates.select(
            "ingest_type",
            "base_url",
            F.col("_next").alias("cur_url"),
            F.concat(F.col("hops"), F.array(F.col("_next"))).alias("hops"),
            F.when(looped & (F.col("_via") == "redirect"), "redirect-loop")
            .when(looped, "link-loop")
            .when(over_budget & (F.col("_via") == "redirect"), "redirects-exceeded")
            .when(over_budget, "max-hops-exceeded")
            .otherwise(F.lit(None))
            .alias("status"),
            F.lit(None).cast("string").alias("terminal_url"),
            F.lit(None).cast("string").alias("terminal_dt"),
            F.lit(None).cast("int").alias("terminal_status_code"),
            F.lit(None).cast("string").alias("terminal_sha1hex"),
        )
        state = next_state

    # anything still in flight after max_hops rounds
    done_parts.append(
        state.filter(F.col("status").isNull()).withColumn("status", F.lit("max-hops-exceeded"))
    )

    cols = [
        "ingest_type",
        "base_url",
        "status",
        "terminal_url",
        "terminal_dt",
        "terminal_status_code",
        "terminal_sha1hex",
        "hops",
    ]
    result = done_parts[0].select(*cols)
    for part in done_parts[1:]:
        result = result.unionByName(part.select(*cols))
    result = result.withColumn("hit", F.col("status") == "success").select(*RESULT_COLS)
    result = result.localCheckpoint(eager=True)
    cdx2.unpersist()
    bodies.unpersist()
    return result
