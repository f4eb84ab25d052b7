"""Collocation statistics: PMI-scored token co-occurrence pairs.

A training-data pipeline uses pointwise mutual information over
document-level co-occurrence to find collocations and topic structure
(phrase mining, tokenizer-merge candidates beyond raw BPE frequency,
near-boilerplate phrase detection). The reference has word-count
analytics (pig/words.pig, scalding word counts); PMI is the natural
next statistic over the same token stream.

Doc-level PMI: p(a) = n_a/N over documents, p(a,b) = n_ab/N over
documents containing both; PMI(a,b) = ln(n_ab * N / (n_a * n_b)),
reported once-rounded in integer micro-nats (the repo's cross-engine
float discipline — one ln, one round, integer compare thereafter).

Scale shape at 100 TB: the pair space is bounded by restricting to
the top-V vocabulary FIRST (one term-keyed groupBy + TakeOrdered V,
broadcast back), so per-document pair expansion is O(min(V, doc_len)^2)
with V a constant — never corpus-vocabulary-squared. The pair count
shuffle keys on (a, b) over at most V^2 distinct keys; singleton
counts ride the same broadcast vocabulary table. No windows, no
Python UDFs — tokenization and pairing are codegen'd
split/explode/join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

TOKEN_SPLIT = r"\s+"


def doc_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, term): lowercase whitespace tokens (the
    repo-wide postings convention — operators/search.py)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def pmi_pairs(
    df: DataFrame,
    top_v: int = 1000,
    min_pair: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PMI for every vocabulary pair co-occurring in >= min_pair docs.

    Output: (term_a, term_b, n_ab, n_a, n_b, pmi_micro) with
    term_a < term_b. Vocabulary = top_v terms by document frequency
    (ties by term asc); N = total documents in df.
    """
    n_docs = df.select(F.col(id_col)).distinct().count()
    toks = doc_terms(df, id_col=id_col, text_col=text_col)

    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_term"))
        .orderBy(F.col("n_term").desc(), F.col("term").asc())
        .limit(top_v)
    )
    vt = toks.join(broadcast(vocab), "term")  # (term, doc_id, n_term)

    a = vt.select(
        F.col("doc_id"),
        F.col("term").alias("term_a"),
        F.col("n_term").alias("n_a"),
    )
    b = vt.select(
        F.col("doc_id"),
        F.col("term").alias("term_b"),
        F.col("n_term").alias("n_b"),
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    pmi = F.round(
        F.lit(1_000_000.0)
        * F.log(
            (F.col("n_ab").cast("double") * F.lit(float(n_docs)))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
    ).cast("long")
    return pairs.select(
        "term_a",
        "term_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        pmi.alias("pmi_micro"),
    )
