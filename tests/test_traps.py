"""Crawl-trap detection: URL template normalization + explosion flags."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_url_template_normalization(spark):
    from sandcrawler_spark.operators.traps import url_template_col

    cases = [
        ("https://a.org/order/12345", "https://a.org/order/N"),
        ("https://a.org/2024/01/05/post", "https://a.org/N/N/N/post"),
        ("https://a.org/doc/deadbeefcafe1234", "https://a.org/doc/H"),
        ("https://a.org/p?id=99&session=zz9&x=", "https://a.org/p?id=*&session=*&x=*"),
        ("https://a.org/plain/path", "https://a.org/plain/path"),
        ("https://a.org/f1x3d", "https://a.org/fNxNd"),  # short hex stays, digits fold
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    for r in df.select(url_template_col(F.col("url")).alias("got"), "want").collect():
        assert r.got == r.want, (r.got, r.want)


def test_detect_and_tag_traps(spark):
    from sandcrawler_spark.operators.traps import detect_traps, tag_frontier_traps

    # host a: calendar trap (300 distinct date URLs) + 3 article pages
    rows = [("a.org", f"https://a.org/cal?day={i}") for i in range(300)]
    rows += [("a.org", f"https://a.org/article/page-{c}") for c in "xyz"]
    rows += [("b.org", f"https://b.org/item/{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["host", "url"])
    traps = detect_traps(df, max_urls_per_template=100)
    got = {(r.host, r.template): r for r in traps.collect()}
    trap_row = got[("a.org", "https://a.org/cal?day=*")]
    assert trap_row.is_trap and trap_row.n_urls == 300
    assert trap_row.min_url == "https://a.org/cal?day=0"
    assert not got[("a.org", "https://a.org/article/page-x")].is_trap  # distinct shapes
    assert not got[("b.org", "https://b.org/item/N")].is_trap  # 5 < cap

    tagged = tag_frontier_traps(df, traps)
    n_in = tagged.filter(F.col("in_trap")).count()
    assert n_in == 300
    assert tagged.count() == df.count()  # tagging never drops rows
