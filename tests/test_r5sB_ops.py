"""Round-5 session-B operators: OAI-PMH harvest parsing (the
scholarly-metadata discovery channel behind the reference's ingest
requests — `proposals/2019_ingest.md:81-113` link_source values are
OAI-PMH-harvested corpora), rule-based sentence segmentation, the
RFC 9309 §2.4 robots-cache freshness audit, and the interpolated
Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman 1999 §4).

The OAI-PMH goldens are spec-shaped: record layout, the
status="deleted" tombstone on the header opening tag, multi-setSpec
headers, and the §3.3.1 INCLUSIVE from/until window semantics all
follow the published OAI-PMH v2.0 protocol document.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sandcrawler_spark.functions.oaipmh import (
    build_oai_record_xml,
    harvest_window,
    parse_oai_records,
)
from sandcrawler_spark.functions.sentences import with_sentence_stats
from sandcrawler_spark.operators.lm import kn_score_docs, train_kneser_ney
from sandcrawler_spark.operators.politeness import robots_cache_audit

# A ListRecords response shaped like the OAI-PMH v2.0 spec's worked
# examples (section 4.5): namespaced envelope, oai_dc payload, one
# deleted record carrying only a header, one record in two sets.
_SPEC_XML = """<?xml version="1.0" encoding="UTF-8"?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <responseDate>2002-06-01T19:20:30Z</responseDate>
  <request verb="ListRecords" metadataPrefix="oai_dc">http://an.oa.org/OAI-script</request>
  <ListRecords>
    <record>
      <header>
        <identifier>oai:arXiv.org:cs/0112017</identifier>
        <datestamp>2001-12-14</datestamp>
        <setSpec>cs</setSpec>
        <setSpec>math</setSpec>
      </header>
      <metadata>
        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
          <dc:title>Using Structural Metadata to Localize Experience of Digital Content</dc:title>
        </oai_dc:dc>
      </metadata>
    </record>
    <record>
      <header status="deleted">
        <identifier>oai:arXiv.org:quant-ph/9901001</identifier>
        <datestamp>1999-03-20</datestamp>
      </header>
    </record>
    <record>
      <header>
        <identifier>oai:perseus.tufts.edu:Perseus:text:1999.02.0084</identifier>
        <datestamp>2002-05-01</datestamp>
        <setSpec>latin</setSpec>
      </header>
      <metadata>
        <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
          <dc:title>Opera Minora</dc:title>
        </oai_dc:dc>
      </metadata>
    </record>
  </ListRecords>
</OAI-PMH>
"""


def _parse_spec(spark):
    df = spark.createDataFrame([("r1", _SPEC_XML)], ["repo", "xml"])
    rows = parse_oai_records(df, "xml", keep_cols=["repo"]).orderBy("seq").collect()
    return rows


def test_oai_spec_shaped_response_parses(spark):
    rows = _parse_spec(spark)
    assert [r["identifier"] for r in rows] == [
        "oai:arXiv.org:cs/0112017",
        "oai:arXiv.org:quant-ph/9901001",
        "oai:perseus.tufts.edu:Perseus:text:1999.02.0084",
    ]
    assert [r["datestamp"] for r in rows] == ["2001-12-14", "1999-03-20", "2002-05-01"]
    # multi-setSpec headers keep every set (record 1 is in cs AND math)
    assert rows[0]["setspecs"] == "cs,math"
    assert rows[2]["setspecs"] == "latin"


def test_oai_deleted_tombstone_kept_not_skipped(spark):
    # §2.5.1: deleted records MUST be propagated as tombstones
    rows = _parse_spec(spark)
    assert [r["deleted"] for r in rows] == [False, True, False]
    assert rows[1]["title"] is None and rows[1]["setspecs"] == ""
    assert rows[0]["title"].startswith("Using Structural Metadata")


def test_oai_deleted_flag_is_per_record_not_per_blob(spark):
    # a deleted record earlier in the blob must not flip its healthy
    # neighbors (the per-block discipline sitemaps.py established)
    rows = _parse_spec(spark)
    assert rows[2]["deleted"] is False


def test_oai_harvest_window_bounds_inclusive(spark):
    # §3.3.1: from/until are INCLUSIVE — a record dated exactly at
    # either bound is harvested
    df = spark.createDataFrame([("r1", _SPEC_XML)], ["repo", "xml"])
    recs = parse_oai_records(df, "xml")
    got = {
        r["identifier"]
        for r in harvest_window(recs, "1999-03-20", "2001-12-14").collect()
    }
    assert got == {"oai:arXiv.org:quant-ph/9901001", "oai:arXiv.org:cs/0112017"}
    # set-selective harvest matches ANY of a record's sets
    got_math = {
        r["identifier"] for r in harvest_window(recs, set_spec="math").collect()
    }
    assert got_math == {"oai:arXiv.org:cs/0112017"}


def test_oai_builder_roundtrips_through_parser(spark):
    df = spark.createDataFrame(
        [(1, "oai:x:1", "2020-01-02", "s1", False, "T one"),
         (2, "oai:x:2", "2020-01-03", "", True, "ignored")],
        ["k", "ident", "ds", "st", "dele", "ti"],
    )
    xml = df.select(
        F.concat_ws(
            "",
            F.collect_list(
                build_oai_record_xml(
                    F.col("ident"), F.col("ds"), F.col("st"), F.col("dele"), F.col("ti")
                )
            ),
        ).alias("xml")
    )
    rows = parse_oai_records(xml, "xml").orderBy("identifier").collect()
    assert len(rows) == 2
    assert rows[0]["identifier"] == "oai:x:1" and rows[0]["title"] == "T one"
    assert rows[1]["deleted"] is True and rows[1]["title"] is None


def _stats(spark, text: str):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return with_sentence_stats(df).collect()[0]


def test_sentence_basic_split(spark):
    r = _stats(spark, "The cat sat. The dog ran! Did it rain? Yes.")
    assert r["n_sentences"] == 4


def test_sentence_abbreviations_do_not_split(spark):
    # every protection pass: decimal, e.g., et al., title abbrev,
    # single-capital initial — one sentence despite six dots
    r = _stats(spark, "Dr. J. Smith et al. found e.g. values near 3.14 here.")
    assert r["n_sentences"] == 1


def test_sentence_boundary_requires_following_capital(spark):
    # "vs. the" and a lowercase continuation must not split
    r = _stats(spark, "We compared A vs. the baseline. and then stopped")
    assert r["n_sentences"] == 1
    r2 = _stats(spark, "We compared A vs. the baseline. Then we stopped")
    assert r2["n_sentences"] == 2


def test_sentence_empty_and_single(spark):
    assert _stats(spark, "")["n_sentences"] == 0
    assert _stats(spark, "   ")["n_sentences"] == 0
    one = _stats(spark, "no terminator at all")
    assert one["n_sentences"] == 1 and one["n_words"] == 4
    assert one["mean_words_x100"] == 400


def test_sentence_mean_integer_fixed_point(spark):
    r = _stats(spark, "One two three. Four five! Six seven eight nine?  Ten more")
    # 11 words, 4 sentences -> floor(1100/4) = 275
    assert r["n_words"] == 11 and r["n_sentences"] == 4
    assert r["mean_words_x100"] == 275


def test_robots_cache_audit_classes(spark):
    day = 86400
    fetches = spark.createDataFrame(
        [
            ("a.com", 100),        # fresh (robots at 50)
            ("a.com", 50 + day),   # fresh boundary: age exactly ttl
            ("a.com", 51 + day),   # expired: age ttl+1
            ("a.com", 10),         # miss: before first robots fetch
            ("b.com", 500),        # miss: host never fetched robots
        ],
        ["host", "epoch_s"],
    )
    robots = spark.createDataFrame([("a.com", 50)], ["host", "robots_epoch_s"])
    rows = {
        r["host"]: r
        for r in robots_cache_audit(fetches, robots, ttl_s=day).collect()
    }
    a = rows["a.com"]
    assert (a["n_fetches"], a["n_fresh"], a["n_expired"], a["n_miss"]) == (4, 2, 1, 1)
    b = rows["b.com"]
    assert (b["n_fetches"], b["n_miss"]) == (1, 1)


def test_robots_cache_uses_latest_prior_fetch(spark):
    # two robots fetches: the audit must age against the LATER one
    day = 86400
    fetches = spark.createDataFrame([("a.com", 3 * day)], ["host", "epoch_s"])
    robots = spark.createDataFrame(
        [("a.com", 0), ("a.com", 3 * day - 10)], ["host", "robots_epoch_s"]
    )
    r = robots_cache_audit(fetches, robots, ttl_s=day).collect()[0]
    assert r["n_fresh"] == 1 and r["n_expired"] == 0


def test_kneser_ney_hand_computed_tiny_corpus(spark):
    # corpus: doc1 "a b a b", doc2 "a c" ->
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    # types T=3, n1=2 (b-a, a-c), n2=1 (a-b) -> D = 2/(2+2) = 0.5
    # ctx: a: c_ctx=3, n1p_fwd=2 ; b: c_ctx=1, n1p_fwd=1
    # cont: b: n1p_rev=1 ; a: n1p_rev=1 ; c: n1p_rev=1
    docs = spark.createDataFrame([(1, "a b a b"), (2, "a c")], ["doc_id", "text"])
    bi, ctx, cont, glob = train_kneser_ney(docs)
    g = glob.collect()[0]
    assert (g["t_types"], g["n1"], g["n2"]) == (3, 2, 1)
    assert g["discount"] == 0.5

    def p(c12, c_ctx, n1p_fwd, n1p_rev, t=3, d=0.5):
        return (max(c12 - d, 0.0) * t + d * n1p_fwd * n1p_rev) / (c_ctx * t)

    expected = {
        1: (
            3,
            round(math.log(p(2, 3, 2, 1)) * 1e6) * 2     # a->b twice
            + round(math.log(p(1, 1, 1, 1)) * 1e6),      # b->a
        ),
        2: (1, round(math.log(p(1, 3, 2, 1)) * 1e6)),    # a->c
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_micronat"])
        for r in kn_score_docs(docs, bi, ctx, cont, glob).collect()
    }
    assert got == expected


def test_kneser_ney_continuation_beats_frequency(spark):
    # the KN signature: "francisco" occurs 3 times but ONLY after
    # "san"; "tuesday" occurs 3 times after 3 distinct contexts. In a
    # fresh context ("on X"), unseen for both, the continuation term
    # must score tuesday above francisco. We verify via cont_stats.
    docs = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco"),
            (2, "on tuesday by tuesday until tuesday"),
        ],
        ["doc_id", "text"],
    )
    _, _, cont, _ = train_kneser_ney(docs)
    rev = {r["w2"]: r["n1p_rev"] for r in cont.collect()}
    assert rev["francisco"] == 1
    assert rev["tuesday"] == 3


def test_kneser_ney_probabilities_sum_to_one_per_context(spark):
    # interpolated KN is a proper distribution: for a fixed context
    # w1, summing P(w2|w1) over the OBSERVED vocabulary of
    # continuations-with-mass must not exceed 1, and equals 1 when
    # every vocab word is reachable via the continuation term.
    docs = spark.createDataFrame(
        [(1, "a b a c a b b a"), (2, "c a b c")], ["doc_id", "text"]
    )
    bi, ctx, cont, glob = train_kneser_ney(docs)
    g = glob.collect()[0]
    d, t = g["discount"], g["t_types"]
    c12 = {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()}
    cx = {r["w1"]: (r["c_ctx"], r["n1p_fwd"]) for r in ctx.collect()}
    rev = {r["w2"]: r["n1p_rev"] for r in cont.collect()}
    t_total = sum(rev.values())
    assert t_total == t
    for w1 in cx:
        c_ctx, n1p_fwd = cx[w1]
        s = 0.0
        for w2 in rev:
            c = c12.get((w1, w2), 0)
            s += (max(c - d, 0.0) * t + d * n1p_fwd * rev[w2]) / (c_ctx * t)
        assert abs(s - 1.0) < 1e-9, (w1, s)


def test_wilson_rollup_penalizes_thin_evidence(spark):
    from sandcrawler_spark.operators.diagnostics import wilson_domain_rollup

    rows = [("thin.com", True)]
    rows += [("solid.com", i < 180) for i in range(200)]
    df = spark.createDataFrame(rows, ["registered_domain", "passed"])
    out = {r["domain"]: r for r in wilson_domain_rollup(df).collect()}
    # raw rate: thin 100% > solid 90%; Wilson lower bound must invert
    assert out["thin.com"]["pass_ppm"] == 1000000
    assert out["solid.com"]["pass_ppm"] == 900000
    assert out["thin.com"]["wilson_lb_ppm"] < out["solid.com"]["wilson_lb_ppm"]
    # hand value: n=1, p=1, z=1.96 -> lb = (1 + z^2/2 - z*sqrt(z^2/4))/(1+z^2)
    # = (1 + 1.9208 - 1.9208) / 4.8416 = 0.2065...
    import math
    z = 1.96
    lb = (1 + z * z / 2 - z * math.sqrt((0.0 + z * z / 4) / 1)) / (1 + z * z)
    assert abs(out["thin.com"]["wilson_lb_ppm"] - round(lb * 1e6)) <= 1


def test_wilson_rollup_min_docs_filter(spark):
    from sandcrawler_spark.operators.diagnostics import wilson_domain_rollup

    df = spark.createDataFrame(
        [("a.com", True), ("a.com", False), ("b.com", True)],
        ["registered_domain", "passed"],
    )
    out = wilson_domain_rollup(df, min_docs=2).collect()
    assert [r["domain"] for r in out] == ["a.com"]
    assert out[0]["n_docs"] == 2 and out[0]["n_pass"] == 1


def test_cdx_collapse_day_buckets(spark):
    from sandcrawler_spark.operators.cdxslice import collapse_captures

    rows = [
        ("u1", "20200101080000", 200, "text/html"),
        ("u1", "20200101120000", 404, "text/html"),   # same day -> collapsed
        ("u1", "20200102090000", 200, "text/html"),   # next day survives
        ("u2", "20200101080000", 200, "application/pdf"),
    ]
    df = spark.createDataFrame(rows, ["url", "datetime", "status_code", "mimetype"])
    out = {
        (r["url"], r["bucket"]): r
        for r in collapse_captures(df, digits=8).collect()
    }
    assert len(out) == 3
    first = out[("u1", "20200101")]
    # first capture of the bucket kept, collapsed count carried
    assert first["datetime"] == "20200101080000"
    assert first["status_code"] == 200 and first["n_collapsed"] == 2
    assert out[("u1", "20200102")]["n_collapsed"] == 1
    assert out[("u2", "20200101")]["mimetype"] == "application/pdf"


def test_cdx_collapse_granularity(spark):
    from sandcrawler_spark.operators.cdxslice import collapse_captures

    rows = [
        ("u", "20200101080000", 200, "a"),
        ("u", "20200101081500", 200, "b"),   # same hour
        ("u", "20200101090000", 200, "c"),   # next hour
    ]
    df = spark.createDataFrame(rows, ["url", "datetime", "status_code", "mimetype"])
    assert collapse_captures(df, digits=10).count() == 2   # hour buckets
    assert collapse_captures(df, digits=8).count() == 1    # day bucket
    assert collapse_captures(df, digits=14).count() == 3   # no collapse


def test_feed_discovery_attribute_order_and_resolution(spark):
    from sandcrawler_spark.functions.feeds import discover_feeds

    pages = spark.createDataFrame(
        [
            # rel before type, absolute href
            ("https://a.com/p/x", '<link rel="alternate" type="application/rss+xml" href="https://a.com/f.xml">'),
            # type before rel, single quotes, relative root href
            ("https://b.com/p/x", "<link type='application/atom+xml' rel='alternate' href='/feed'>"),
            # relative (no slash) href resolves against the page dir
            ("https://c.com/dir/page", '<link rel="alternate" type="application/rss+xml" href="r.xml">'),
            # stylesheet link and type-less alternate are NOT feeds
            ("https://d.com/", '<link rel="stylesheet" href="/s.css"><link rel="alternate" href="/other">'),
            # alternate without href dropped
            ("https://e.com/", '<link rel="alternate" type="application/rss+xml">'),
        ],
        ["url", "html"],
    )
    out = {r["url"]: (r["feed_url"], r["kind"]) for r in discover_feeds(pages).collect()}
    assert out == {
        "https://a.com/p/x": ("https://a.com/f.xml", "rss"),
        "https://b.com/p/x": ("https://b.com/feed", "atom"),
        "https://c.com/dir/page": ("https://c.com/dir/r.xml", "rss"),
    }


def test_link_rot_transitions(spark):
    from sandcrawler_spark.operators.recrawl import link_rot

    rows = [
        ("u1", "20200101000000", 200),
        ("u1", "20200601000000", 404),   # died
        ("u2", "20200101000000", 404),
        ("u2", "20200601000000", 200),   # resurrected
        ("u3", "20200101000000", 200),   # single capture: first == last
    ]
    df = spark.createDataFrame(rows, ["url", "datetime", "status_code"])
    out = {
        (r["first_status"], r["last_status"]): (r["n_urls"], r["share_ppm"])
        for r in link_rot(df).collect()
    }
    assert out[(200, 404)] == (1, 333333)
    assert out[(404, 200)] == (1, 333333)
    assert out[(200, 200)] == (1, 333333)


def test_purge_propagation_invariant(spark):
    from sandcrawler_spark.operators.denylist import purge_propagation

    a = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(0, 20, 2)], ["id"])
    purge = spark.createDataFrame([(0,), (2,), (99,)], ["key"])
    out = {r["table_name"]: r for r in purge_propagation(
        {"a": (a, "k"), "b": (b, "id")}, purge
    ).collect()}
    assert (out["a"]["n_before"], out["a"]["n_purged"], out["a"]["n_after"]) == (10, 2, 8)
    assert (out["b"]["n_before"], out["b"]["n_purged"], out["b"]["n_after"]) == (10, 2, 8)


def test_temporal_split_embargo_gap(spark):
    from sandcrawler_spark.operators.sampling import temporal_split

    rows = [("2020-01-01",), ("2020-06-30",), ("2020-07-01",),
            ("2020-09-30",), ("2020-10-01",), ("2021-01-01",)]
    df = spark.createDataFrame(rows, ["d"])
    out = {r["split"]: r for r in temporal_split(df, "d", "2020-07-01", "2020-10-01").collect()}
    assert out["train"]["n_rows"] == 2 and out["train"]["max_ts"] == "2020-06-30"
    # the embargo window is identified (callers drop it), bounds honored:
    # embargo start inclusive, test start exclusive from embargo
    assert out["embargo"]["n_rows"] == 2
    assert out["embargo"]["min_ts"] == "2020-07-01"
    assert out["test"]["n_rows"] == 2 and out["test"]["min_ts"] == "2020-10-01"


def test_sentence_cjk_terminators(spark):
    # CJK sentences split on 。！？ with no case requirement; one CJK
    # ideograph counts as one word; a trailing terminator adds no
    # empty sentence
    r = _stats(spark, "你好世界。深度学习很好！这是什么？最后一句。")
    assert r["n_sentences"] == 4
    assert r["n_words"] == 18
    r2 = _stats(spark, "你好。")
    assert r2["n_sentences"] == 1 and r2["n_words"] == 2
    # mixed script: Latin boundary + CJK boundary both fire
    r3 = _stats(spark, "First sentence. Then 中文句子。再一句")
    assert r3["n_sentences"] == 3


def test_cdxj_parse_golden_line(spark):
    from sandcrawler_spark.functions.cdxfmt import parse_cdxj_lines

    line = ('com,example)/path 20200315123456 {"url": "https://example.com/path", '
            '"mime": "text/html", "status": "200", "digest": "ABCDEF", '
            '"length": "1043", "offset": "334", "filename": "x.warc.gz"}')
    bad = ["no json here", "com,example)/ nodate {}", ""]
    df = spark.createDataFrame([(line,)] + [(b,) for b in bad], ["value"])
    rows = parse_cdxj_lines(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["surt"] == "com,example)/path" and r["datetime"] == "20200315123456"
    assert r["http_status"] == 200 and r["warc_csize"] == 1043
    assert r["warc_offset"] == 334 and r["warc_path"] == "x.warc.gz"


def test_cdxj_build_parse_roundtrip(spark):
    from sandcrawler_spark.functions.cdxfmt import build_cdxj_line, parse_cdxj_lines
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("com,a)/", "20200101000000", "https://a.com/", "text/html", 200,
          "DIG", 10, 0, "f.warc.gz")],
        ["surt", "dt", "url", "mime", "status", "digest", "length", "offset", "fn"],
    )
    lines = df.select(build_cdxj_line(
        F.col("surt"), F.col("dt"), F.col("url"), F.col("mime"), F.col("status"),
        F.col("digest"), F.col("length"), F.col("offset"), F.col("fn")).alias("value"))
    r = parse_cdxj_lines(lines).collect()[0]
    assert (r["surt"], r["url"], r["http_status"], r["warc_csize"]) == (
        "com,a)/", "https://a.com/", 200, 10)


def test_warc_segment_reassembly(spark):
    from sandcrawler_spark.sources.warcfmt import reassemble_segments

    rows = [
        ("r1", 1, "hello ", None), ("r1", 2, "world", 11),       # complete
        ("r2", 1, "ab", None), ("r2", 3, "cd", 4),               # gap (no seg 2)
        ("r3", 1, "xy", None), ("r3", 2, "z", 4),                # declared 4 != 3
    ]
    df = spark.createDataFrame(
        rows, ["origin_id", "segment_number", "payload", "segment_total_length"]
    )
    out = {r["origin_id"]: r for r in reassemble_segments(df).collect()}
    assert out["r1"]["status"] == "complete" and out["r1"]["payload"] == "hello world"
    assert out["r2"]["status"] == "gap"
    assert out["r3"]["status"] == "length_mismatch"
    assert out["r3"]["total_actual"] == 3 and out["r3"]["total_declared"] == 4


def test_timemap_rfc7089_shape(spark):
    from sandcrawler_spark.functions.memento import timemap_export

    # 2001-03-21 was a Wednesday — the RFC 7089 example-era date
    df = spark.createDataFrame(
        [("http://a.example/", "20010321000000"),
         ("http://a.example/", "20100621074154"),
         ("http://a.example/", "20050101120000"),
         ("http://solo.example/", "20200229000000")],   # leap day, single
        ["url", "datetime"],
    )
    out = {r["url"]: r for r in timemap_export(df).collect()}
    tm = out["http://a.example/"]["timemap"]
    assert out["http://a.example/"]["n_mementos"] == 3
    assert '<http://a.example/>; rel="original"' in tm
    assert 'rel="first memento"; datetime="Wed, 21 Mar 2001 00:00:00 GMT"' in tm
    assert 'rel="memento"; datetime="Sat, 01 Jan 2005 12:00:00 GMT"' in tm
    assert 'rel="last memento"; datetime="Mon, 21 Jun 2010 07:41:54 GMT"' in tm
    solo = out["http://solo.example/"]["timemap"]
    assert 'rel="first last memento"; datetime="Sat, 29 Feb 2020 00:00:00 GMT"' in solo


def test_arc2warc_record_parses_back_through_warc_scanner(spark):
    from pyspark.sql import functions as F
    from sandcrawler_spark.sources.warcfmt import arc2warc_record_col, scan_warc_blobs

    df = spark.createDataFrame(
        [("https://a.com/x", "20200101123456", "text/html", "HTTP/1.1 200 OK\n\nbody")],
        ["url", "d14", "mime", "payload"],
    )
    rec = df.select(
        arc2warc_record_col(
            F.col("url"), F.col("d14"), F.col("mime"), F.col("payload")
        ).alias("r")
    ).collect()[0]["r"]
    blobs = spark.createDataFrame(
        [("m.warc", bytearray(rec.encode()))], ["path", "content"]
    )
    rows = scan_warc_blobs(blobs).collect()
    assert len(rows) == 1
    out = rows[0]
    assert out["target_uri"] == "https://a.com/x"
    assert out["warc_date"] == "2020-01-01T12:34:56Z"
    assert out["warc_type"] == "resource"


def test_feed_poll_schedule_rates(spark):
    from sandcrawler_spark.operators.recrawl import feed_poll_schedule

    rows = (
        # busy.com: 20 entries over 10 days -> 2/day -> poll every 12h
        [("busy.com", f"2020-01-{d:02d}") for d in range(1, 11) for _ in range(2)]
        # slow.com: 2 entries over 100 days -> 0.02/day -> weekly cap
        + [("slow.com", "2020-01-01"), ("slow.com", "2020-04-09")]
        # burst.com: 48 entries in one day -> floor(24/48)=0 -> 1h floor
        + [("burst.com", "2020-01-01")] * 48
    )
    df = spark.createDataFrame(rows, ["host", "published"])
    out = {r["host"]: r for r in feed_poll_schedule(df, as_of="2020-06-01").collect()}
    busy = out["busy.com"]
    assert busy["rate_x100"] == 200 and busy["poll_hours"] == 12
    slow = out["slow.com"]
    assert slow["rate_x100"] == 2 and slow["poll_hours"] == 168
    burst = out["burst.com"]
    assert burst["span_days"] == 1 and burst["poll_hours"] == 1
    assert busy["newest_age_days"] == 143  # 2020-01-10 .. 2020-06-01
