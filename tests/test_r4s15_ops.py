"""Round-4 session-15 operators: wildcard-DNS subdomain traps,
nepotistic same-IP link discounting, contrastive hard-negative mining,
charset-declaration sniffing.

Reference parity anchors:
- subdomain traps: host-axis extension of the reference's per-host URL
  bounding (url_traps / detect_traps; reference blocklists whole
  domains in python/sandcrawler/ingest.py).
- nepotistic links: Davison'00 "Recognizing nepotistic links on the
  Web" discount over the host graph the reference builds in pig
  (pig/filter-cdx* lineage) — ownership links must not count as
  endorsement in host_pagerank.
- charset sniffing: WHATWG encoding-sniff precedence (BOM > transport
  > meta), the QA front-end to the reference's after-the-fact
  transfer-encoding repair (python/sandcrawler/html_ingest.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sandcrawler_spark.functions.charset import charset_cols
from sandcrawler_spark.operators.linkgraph import nepotistic_links
from sandcrawler_spark.operators.similarity import hard_negatives
from sandcrawler_spark.operators.traps import subdomain_traps


# ---------------------------------------------------------------- traps

def test_subdomain_traps_minted_vs_organic(spark):
    minted = [(f"site{i}.farm.example",) for i in range(30)]
    organic = [
        (f"{name}.shop.example",)
        for name in ("blog", "docs", "mail", "shop", "www", "api")
    ]
    df = spark.createDataFrame(minted * 3 + organic, ["host"])
    got = {r["registered_domain"]: r for r in subdomain_traps(df, min_hosts=20).collect()}
    farm = got["farm.example"]
    assert farm["is_trap"] and farm["n_hosts"] == 30 and farm["n_templates"] == 1
    assert farm["n_urls"] == 90
    shop = got["shop.example"]
    assert not shop["is_trap"]  # only 6 hosts, below min_hosts
    assert shop["n_templates"] == 6


def test_subdomain_traps_template_diversity_saves_big_domains(spark):
    # many hosts but full template diversity -> organic, not a trap
    rows = [(f"team-{chr(97 + i)}{chr(97 + j)}.big.example",) for i in range(5) for j in range(5)]
    df = spark.createDataFrame(rows, ["host"])
    (row,) = subdomain_traps(df, min_hosts=20).collect()
    assert row["n_hosts"] == 25 and not row["is_trap"]


def test_subdomain_traps_apex_label_empty(spark):
    # apex host (host == registered domain) gets the empty template
    df = spark.createDataFrame([("ex.org",), ("a1.ex.org",), ("a2.ex.org",)], ["host"])
    (row,) = subdomain_traps(df, min_hosts=3).collect()
    assert row["n_hosts"] == 3
    assert row["n_templates"] == 2  # '' and 'aD'


# ----------------------------------------------------- nepotistic links

def test_nepotistic_links_counts_and_ppm(spark):
    from sandcrawler_spark.operators.ipschedule import resolve_ip_col

    hosts = [f"h{i}.example" for i in range(12)]
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    ip = {r["h"]: r["ip"] for r in df.select("h", resolve_ip_col(F.col("h"), 4).alias("ip")).collect()}
    src = hosts[0]
    edges = [(src, d, w) for d, w in zip(hosts[1:], range(1, 12))]
    e = spark.createDataFrame(edges, ["src_host", "dst_host", "weight"])
    (row,) = nepotistic_links(e, n_ips=4).collect()
    same = [w for d, w in zip(hosts[1:], range(1, 12)) if ip[d] == ip[src]]
    assert row["out_weight"] == sum(range(1, 12))
    assert row["same_ip_weight"] == sum(same)
    assert row["n_same_ip_hosts"] == len(same)
    assert row["nepotism_ppm"] == 10**6 * sum(same) // sum(range(1, 12))
    assert row["clean_out_weight"] == row["out_weight"] - row["same_ip_weight"]


# ------------------------------------------------------- hard negatives

def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return num / den


def test_hard_negatives_band_and_rank(spark):
    import random

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    e = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = spark.createDataFrame(
        [(i, v) for i, v in vecs[:3]], ["q_id", "q_vec"]
    )
    got = hard_negatives(q, e, k=4, lo=0.1, hi=0.9).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for qid, qv in vecs[:3]:
        sims = sorted(
            (
                (round(_cos(v, qv), 6), i)
                for i, v in vecs
                if i != qid and 0.1 <= round(_cos(v, qv), 6) < 0.9
            ),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [(r["cosine"], r["vec_id"]) for r in rows] == [
            (round(s, 6), i) for s, i in sims
        ]
        # self-pair excluded even though cosine(self)=1.0 > hi anyway
        assert qid not in [r["vec_id"] for r in rows]


def test_hard_negatives_excludes_near_duplicates(spark):
    base = [1.0, 0.0, 0.0, 0.0]
    e = spark.createDataFrame(
        [
            (0, base),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup: cosine ~1 >= hi
            (2, [0.7, 0.7, 0.0, 0.0]),      # hard negative ~0.707
            (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal, below lo
        ],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(0, base)], ["q_id", "q_vec"])
    got = hard_negatives(q, e, k=5, lo=0.3, hi=0.95).collect()
    assert [r["vec_id"] for r in got] == [2]


# ------------------------------------------------------- charset sniff

def _sniff(spark, body_bytes, ctype):
    df = spark.createDataFrame([(body_bytes, ctype)], "body binary, ct string")
    return df.select(*charset_cols(F.col("body"), F.col("ct"))).collect()[0]


def test_charset_bom_beats_header_and_meta(spark):
    body = b"\xef\xbb\xbf" + b"<html><head><meta charset=latin1></head></html>"
    r = _sniff(spark, body, "text/html; charset=ISO-8859-1")
    assert r["bom_cs"] == "utf-8"
    assert r["meta_cs"] == "iso-8859-1"
    assert r["header_cs"] == "iso-8859-1"
    assert r["effective_cs"] == "utf-8"
    assert r["verdict"] == "bom_header_conflict"


def test_charset_meta_vs_header_conflict_and_aliases(spark):
    body = b'<html><head><meta http-equiv="Content-Type" content="text/html; charset=cp1252"></head></html>'
    r = _sniff(spark, body, "text/html; charset=UTF8")
    assert r["meta_cs"] == "windows-1252"
    assert r["header_cs"] == "utf-8"
    assert r["effective_cs"] == "utf-8"  # transport outranks meta
    assert r["verdict"] == "meta_header_conflict"


def test_charset_undeclared_defaults_windows1252(spark):
    r = _sniff(spark, b"<html><body>plain</body></html>", "text/html")
    assert r["effective_cs"] == "windows-1252"
    assert r["verdict"] == "undeclared"


def test_charset_utf16_bom_invalid_utf8_head(spark):
    # UTF-16LE body: meta regexp must not throw on non-UTF-8 bytes
    body = b"\xff\xfe" + "<html><head><meta charset=utf-8></head></html>".encode("utf-16-le")
    r = _sniff(spark, body, "text/html")
    assert r["bom_cs"] == "utf-16le"
    assert r["meta_cs"] is None  # head not valid UTF-8
    assert r["effective_cs"] == "utf-16le"
