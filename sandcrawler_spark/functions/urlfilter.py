"""Weighted URL-token soft blocklist — the RefinedWeb/UT1-style URL
filter: instead of a binary domain blocklist (the reference's
sandcrawler blocklists are binary, ia.py's blocklist checks), every
adult/fraud/spam token found in the lowercased URL contributes a
weight, and the summed score is banded into ok / review / block. A
soft score keeps borderline hosts crawlable at low priority instead
of dropping them — the behavior large-scale pretraining pipelines
(RefinedWeb §3.1, UT1-based C4 variants) settled on.

The weight table is the single source of truth: the Spark expression
and the DuckDB oracle CASE-sum are both generated from
BADWORD_WEIGHTS, so the two engines cannot drift.

Scale shape: a pure Catalyst projection (contains + integer adds,
whole-stage codegen) over the frontier — no join, no shuffle, no
Python. Substring semantics are intentional (UT1 matches anywhere in
the URL); weights are tuned so that a single benign collision stays
under the review band.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (token, weight) — presence anywhere in the lowercased URL
BADWORD_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("porn", 1000),
    ("xxx", 800),
    ("viagra", 500),
    ("warez", 400),
    ("casino", 300),
    ("poker", 300),
    ("crack", 250),
    ("pills", 200),
    ("free-download", 150),
    ("win-prizes", 120),
    ("bonus", 100),
)

BLOCK_AT = 500
REVIEW_AT = 150


def url_badword_score_col(url: Column) -> Column:
    """Summed badword weight of a URL (presence-based, BIGINT)."""
    low = F.lower(url)
    score = F.lit(0).cast("long")
    for tok, wt in BADWORD_WEIGHTS:
        score = score + F.when(low.contains(tok), F.lit(wt)).otherwise(F.lit(0)).cast(
            "long"
        )
    return score


def url_badword_verdict_col(score: Column) -> Column:
    return (
        F.when(score >= F.lit(BLOCK_AT), F.lit("block"))
        .when(score >= F.lit(REVIEW_AT), F.lit("review"))
        .otherwise(F.lit("ok"))
    )


def badwords_oracle_case(url_expr: str) -> str:
    """The same weight table as a DuckDB CASE-sum expression."""
    terms = " + ".join(
        f"CASE WHEN lower({url_expr}) LIKE '%{tok}%' THEN {wt} ELSE 0 END"
        for tok, wt in BADWORD_WEIGHTS
    )
    return f"CAST({terms} AS BIGINT)"
