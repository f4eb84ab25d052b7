"""Round-4 session-16 operators: scholarly identifier extraction with
real check-digit validation, binary image-header codec, lossless
MaxScore-pruned top-k retrieval, HTML table/code-block extraction,
TextRank keywords.

Reference parity anchors:
- identifiers: the DOIs/ISSNs/ISBNs the reference routes through
  GROBID metadata (python/sandcrawler/grobid.py:71), PDF info dicts
  (pdfextract.py:240), and the html_metadata.py citation_* meta-tag
  tables — here validated with the published ISO check-digit
  algorithms (ISSN mod-11, ISBN-13 EAN mod-10, ORCID ISO 7064 11-2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.functions.identifiers import (
    extract_identifiers,
    identifier_stats,
)


def _flags(spark, text: str) -> dict[tuple[str, str], bool]:
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = extract_identifiers(df).collect()
    return {(r["kind"], r["candidate"]): r["is_valid"] for r in rows}


def test_known_valid_identifiers(spark):
    # all real published identifiers with correct check digits
    text = (
        "see doi:10.1371/journal.pmed.0020124 and arXiv:1706.03762 "
        "ISSN 0317-8471 ISSN 2434-561X ISBN 9780306406157 "
        "https://orcid.org/0000-0002-1825-0097"
    )
    flags = _flags(spark, text)
    assert flags[("doi", "10.1371/journal.pmed.0020124")] is True
    assert flags[("arxiv", "1706.03762")] is True
    assert flags[("issn", "0317-8471")] is True
    assert flags[("issn", "2434-561X")] is True  # X check digit path
    assert flags[("isbn13", "9780306406157")] is True
    assert flags[("orcid", "0000-0002-1825-0097")] is True
    assert len(flags) == 6


def test_checksum_rejects_corrupted(spark):
    # same ids with one corrupted digit each — every checksum must fire
    text = (
        "arXiv:1713.03762 ISSN 0317-8472 ISSN 2434-5610 "
        "ISBN 9780306406158 https://orcid.org/0000-0002-1825-0098"
    )
    flags = _flags(spark, text)
    assert flags[("arxiv", "1713.03762")] is False  # month 13
    assert flags[("issn", "0317-8472")] is False
    assert flags[("issn", "2434-5610")] is False  # X expected, digit given
    assert flags[("isbn13", "9780306406158")] is False
    assert flags[("orcid", "0000-0002-1825-0098")] is False
    assert all(not v for v in flags.values())


def test_identifier_checksums_differential(spark):
    # differential vs an independent pure-Python implementation of the
    # three check-digit algorithms over a spread of generated ids
    def issn_check(d7: str) -> str:
        s = sum(int(d) * w for d, w in zip(d7, range(8, 1, -1)))
        c = (11 - s % 11) % 11
        return "X" if c == 10 else str(c)

    def isbn13_check(d12: str) -> str:
        s = sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(d12))
        return str((10 - s % 10) % 10)

    def orcid_check(d15: str) -> str:
        total = 0
        for ch in d15:
            total = (total + int(ch)) * 2
        r = (12 - total % 11) % 11
        return "X" if r == 10 else str(r)

    rows = []
    expected = {}
    for i in range(40):
        n = i * 7919 + 13  # spread the digit space
        d7 = str(n % 10**7).zfill(7)
        d12 = "978" + str(n % 10**9).zfill(9)
        d15 = "000" + str(n % 10**12).zfill(12)
        issn = f"{d7[:4]}-{d7[4:]}{issn_check(d7)}"
        isbn = d12 + isbn13_check(d12)
        orcid = (
            f"{d15[:4]}-{d15[4:8]}-{d15[8:12]}-{d15[12:]}{orcid_check(d15)}"
        )
        rows.append((i, f"ISSN {issn} ISBN {isbn} https://orcid.org/{orcid}"))
        expected[("issn", issn)] = True
        expected[("isbn13", isbn)] = True
        expected[("orcid", orcid)] = True
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["kind"], r["candidate"]): r["is_valid"]
        for r in extract_identifiers(df).collect()
    }
    assert got == expected


def test_image_dims_golden_bytes(spark):
    # decoder pinned against independently struct-packed bytes (NOT
    # the module's own encoder), so a symmetric encode/decode offset
    # bug cannot hide behind a clean roundtrip
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 800, 600)
        + b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 50) + b"\xf7\x00\x00"
    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 1080, 1920)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    not_image = b"plain text bytes"
    truncated_jpeg = b"\xff\xd8\xff\xe0\x00\x04ab"  # SOI but no SOF0

    from sandcrawler_spark.functions.imagebin import image_header_stats

    df = spark.createDataFrame(
        [(1, png), (2, gif), (3, jpeg), (4, not_image), (5, truncated_jpeg)],
        ["doc_id", "content"],
    )
    rows = {r["doc_id"]: r for r in image_header_stats(df).collect()}
    assert (rows[1]["fmt"], rows[1]["width"], rows[1]["height"]) == ("png", 800, 600)
    assert (rows[2]["fmt"], rows[2]["width"], rows[2]["height"]) == ("gif", 320, 50)
    assert (rows[3]["fmt"], rows[3]["width"], rows[3]["height"]) == ("jpeg", 1920, 1080)
    assert rows[4]["fmt"] is None and rows[4]["width"] is None
    assert rows[5]["fmt"] == "jpeg" and rows[5]["width"] is None
    assert rows[2]["aspect_pct"] == 640  # 320*100/50


def test_jpeg_marker_walk_skips_decoy_sof_in_exif(spark):
    # the decoder walks markers by declared segment length, so an
    # 'FFC0' byte pair INSIDE an APP1/EXIF payload must be skipped,
    # never misread as the frame header (the r4 instr()-scan would
    # have returned the decoy's fake dims here)
    import struct

    from sandcrawler_spark.functions.imagebin import image_header_stats

    decoy_payload = (
        b"Exif\x00\x00" + b"\xff\xc0\x00\x11\x08"
        + struct.pack(">HH", 9999, 8888) + b"padding"
    )
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(decoy_payload)) + decoy_payload
    real_sof0 = (
        b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 480, 640)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    jpeg_decoy = b"\xff\xd8" + app1 + real_sof0
    # progressive SOF2 now decodes via the same walk
    jpeg_prog = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
        + b"\xff\xc2\x00\x11\x08" + struct.pack(">HH", 100, 200)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    # SOS before any SOF -> no dims (walk aborts instead of scanning
    # compressed data for marker-lookalike bytes)
    jpeg_sos_first = (
        b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 7, 7) + b"\x03" * 10
    )
    # implausible precision byte at the walked SOF -> sanity check
    # rejects the dims
    jpeg_bad_precision = (
        b"\xff\xd8"
        + b"\xff\xc0\x00\x11\x07" + struct.pack(">HH", 10, 20) + b"\x03" * 10
    )
    df = spark.createDataFrame(
        [(1, jpeg_decoy), (2, jpeg_prog), (3, jpeg_sos_first),
         (4, jpeg_bad_precision)],
        ["doc_id", "content"],
    )
    rows = {r["doc_id"]: r for r in image_header_stats(df).collect()}
    assert (rows[1]["fmt"], rows[1]["width"], rows[1]["height"]) == ("jpeg", 640, 480)
    assert (rows[2]["fmt"], rows[2]["width"], rows[2]["height"]) == ("jpeg", 200, 100)
    assert rows[3]["fmt"] == "jpeg" and rows[3]["width"] is None
    assert rows[4]["fmt"] == "jpeg" and rows[4]["width"] is None


def test_image_header_roundtrip(spark):
    # encode -> decode identity across the dim space incl. edge widths
    from sandcrawler_spark.functions.imagebin import (
        encode_image_header,
        sniff_image_dims,
    )

    rows = [
        (i, fmt, w, h)
        for i, (fmt, w, h) in enumerate(
            (f, w, h)
            for f in ("png", "gif", "jpeg")
            for (w, h) in ((1, 1), (2, 2), (255, 256), (65535, 4096), (640, 480))
        )
    ]
    df = spark.createDataFrame(rows, ["i", "fmt", "w", "h"])
    enc = df.select(
        "i", "fmt", "w", "h",
        encode_image_header(F.col("fmt"), F.col("w"), F.col("h")).alias("content"),
    )
    dec = enc.select("i", "fmt", "w", "h", *sniff_image_dims(F.col("content")))
    for r in dec.collect():
        assert (r["fmt"], r["w"], r["h"]) == (r["fmt"], r["width"], r["height"]), r


def test_maxscore_matches_exact_and_prunes(spark):
    # corpus where most docs match ONLY the ubiquitous low-impact term:
    # MaxScore must return exactly bm25_topk's rows while fully scoring
    # only a fraction of the matching docs
    from sandcrawler_spark.operators.search import bm25_topk, maxscore_topk

    rows = []
    for i in range(400):
        if i % 40 == 0:
            rows.append((i, "rareword common filler alpha beta gamma"))
        else:
            rows.append((i, "common filler " + f"pad{i % 7} " * (1 + i % 5)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["rareword", "common"]

    exact = [tuple(r) for r in bm25_topk(df, terms, k=8).collect()]
    counters: dict = {}
    pruned = [
        tuple(r) for r in maxscore_topk(df, terms, k=8, _counters=counters).collect()
    ]
    assert pruned == exact
    assert counters["n_matching"] == 400  # every doc matches 'common'
    # the 390 common-only docs are (mostly) pruned by the ceiling test
    assert counters["n_scored"] < counters["n_matching"] / 4


def test_maxscore_fewer_than_k_phase1(spark):
    # when the top-ceiling term matches < k docs, theta degrades to 0
    # (no pruning) and the result must still be exact
    from sandcrawler_spark.operators.search import bm25_topk, maxscore_topk

    rows = [(i, "only common words here " + f"x{i % 3}") for i in range(30)]
    rows.append((99, "rareword alone"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["rareword", "common"]
    exact = [tuple(r) for r in bm25_topk(df, terms, k=10).collect()]
    assert [tuple(r) for r in maxscore_topk(df, terms, k=10).collect()] == exact


def test_html_tables_geometry(spark):
    from sandcrawler_spark.functions.htmlblocks import html_tables

    html = (
        "<p>x</p>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "<table class='layout'><tr><td>nav</td></tr></table>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    rows = sorted(html_tables(df).collect(), key=lambda r: r["idx"])
    assert (rows[0]["n_rows"], rows[0]["n_cells"], rows[0]["is_data_table"]) == (2, 4, True)
    assert (rows[1]["n_rows"], rows[1]["n_cells"], rows[1]["is_data_table"]) == (1, 1, False)


def test_code_blocks_lang_hints(spark):
    from sandcrawler_spark.functions.htmlblocks import code_blocks

    df = spark.createDataFrame(
        [
            (1, '<pre><code class="language-rust">fn main() {}</code></pre>'),
            (2, "<pre>#include <stdio.h>\nint main() {}</pre>"),
            (3, "<pre>import os\nprint(os.name)</pre>"),
            (4, "<pre>const f = (x) => x + 1;</pre>"),
            (5, "<pre>just words</pre>"),
        ],
        ["doc_id", "html"],
    )
    langs = {r["doc_id"]: r["lang_hint"] for r in code_blocks(df).collect()}
    assert langs == {1: "rust", 2: "c", 3: "python", 4: "javascript", 5: "unknown"}
    lines = {r["doc_id"]: r["n_lines"] for r in code_blocks(df).collect()}
    assert lines[2] == 2 and lines[5] == 1


def test_textrank_hub_word_wins(spark):
    # 'graph' neighbors every other content word — co-occurrence
    # centrality must rank it first; stopwords/short words excluded
    from sandcrawler_spark.operators.textrank import textrank_keywords

    text = (
        "graph theory and graph coloring and graph cuts and "
        "graph flows in the graph model"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(textrank_keywords(df, top_k=3).collect(), key=lambda r: r["rk"])
    assert rows[0]["word"] == "graph"
    assert all(len(r["word"]) >= 3 for r in rows)


def test_textrank_partitioning_invariance(spark):
    from sandcrawler_spark.operators.textrank import textrank_keywords

    rows = [
        (i, f"alpha beta gamma delta w{i % 5} epsilon alpha beta zeta")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, textrank_keywords(df.repartition(1)).collect()))
    b = sorted(map(tuple, textrank_keywords(df.repartition(17)).collect()))
    assert a == b and len(a) == 180


def test_rfc3986_resolution_battery(spark):
    # the RFC's own §5.4.1 normal + §5.4.2 abnormal examples, base
    # "http://a/b/c/d;p?q" — fragment cases adjusted for the
    # documented fragments-always-dropped divergence
    from sandcrawler_spark.functions.urlresolve import resolve_url

    base = "http://a/b/c/d;p?q"
    cases = {
        "g": "http://a/b/c/g",
        "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/",
        "/g": "http://a/g",
        "//g": "http://g",
        "?y": "http://a/b/c/d;p?y",
        "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q",  # fragment dropped
        "g#s": "http://a/b/c/g",
        ";x": "http://a/b/c/;x",
        "g;x": "http://a/b/c/g;x",
        "": "http://a/b/c/d;p?q",
        ".": "http://a/b/c/",
        "./": "http://a/b/c/",
        "..": "http://a/b/",
        "../": "http://a/b/",
        "../g": "http://a/b/g",
        "../..": "http://a/",
        "../../": "http://a/",
        "../../g": "http://a/g",
        # abnormal (§5.4.2)
        "../../../g": "http://a/g",
        "../../../../g": "http://a/g",
        "/./g": "http://a/g",
        "/../g": "http://a/g",
        "g.": "http://a/b/c/g.",
        ".g": "http://a/b/c/.g",
        "g..": "http://a/b/c/g..",
        "..g": "http://a/b/c/..g",
        "./../g": "http://a/b/g",
        "./g/.": "http://a/b/c/g/",
        "g/./h": "http://a/b/c/g/h",
        "g/../h": "http://a/b/c/h",
        "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y",
        "g?y/./x": "http://a/b/c/g?y/./x",  # dots in query untouched
        "g#s/./x": "http://a/b/c/g",
        "http:g": "http:g",  # strict parser
        "javascript:void(0)": None,
        "mailto:a@b": None,
    }
    df = spark.createDataFrame(
        [(h if h is not None else "", base) for h in cases], ["href", "base"]
    )
    got = {
        r["href"]: r["resolved"]
        for r in df.select(
            "href", resolve_url(F.col("base"), F.col("href")).alias("resolved")
        ).collect()
    }
    for href, want in cases.items():
        assert got[href] == want, (href, got[href], want)


def test_resolve_url_duckdb_twin(spark):
    # the SQL expression must resolve the battery identically
    import duckdb

    from sandcrawler_spark.functions.urlresolve import resolve_url, resolve_url_sql

    base = "https://w.example.org/a/b/index.html?s=1"
    hrefs = [
        "g", "./g", "g/", "/g", "//h.example.net/x", "?q", "g?q", "#f",
        "", ".", "..", "../g", "../../../z", "g/../h", "sub/dir/",
        "https://o.example.com/x/../y?z", "./../css/../js/app.js",
    ]
    df = spark.createDataFrame([(base, h) for h in hrefs], ["base", "href"])
    spark_out = {
        r["href"]: r["resolved"]
        for r in df.select(
            "href", resolve_url(F.col("base"), F.col("href")).alias("resolved")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(base, h) for h in hrefs])
    sql_out = dict(
        con.execute(
            f"SELECT href, {resolve_url_sql('base', 'href')} FROM t"
        ).fetchall()
    )
    assert spark_out == sql_out


def test_unigram_viterbi_known_dp(spark):
    # hand-checkable lattice: frequent bigrams must beat char-by-char
    from sandcrawler_spark.operators.unigram import (
        corpus_words,
        unigram_vocab,
        viterbi_segment,
    )

    # 'abab' dominates the corpus -> 'ab' is a cheap piece
    df = spark.createDataFrame(
        [(1, "abab abab abab abab xy")], ["doc_id", "text"]
    )
    words = corpus_words(df)
    vocab = unigram_vocab(words)
    out = {r["word"]: r for r in viterbi_segment(words, vocab).collect()}
    assert out["abab"]["seg"] in ("abab", "ab|ab")  # whole word or bigrams
    assert out["abab"]["n_pieces"] <= 2
    assert out["xy"]["n_pieces"] <= 2
    # cost is the sum of piece costs — recompute from the vocab
    vmap = {r["piece"]: r["cost_micro"] for r in vocab.collect()}
    for w, r in out.items():
        assert r["cost_micro"] == sum(vmap[p] for p in r["seg"].split("|"))


def test_unigram_every_word_segmentable(spark):
    from sandcrawler_spark.operators.unigram import (
        corpus_words,
        unigram_vocab,
        viterbi_segment,
    )

    df = spark.createDataFrame(
        [(i, f"w{i % 13}token stream with odd z{i}q pieces") for i in range(40)],
        ["doc_id", "text"],
    )
    words = corpus_words(df)
    rows = viterbi_segment(words, unigram_vocab(words)).collect()
    assert len(rows) == words.count()
    for r in rows:
        assert r["seg"] is not None and r["seg"].replace("|", "") == r["word"]


def test_jsonld_shapes_and_malformed(spark):
    from sandcrawler_spark.functions.jsonld import extract_jsonld

    html = (
        '<script type="application/ld+json">'
        '{"@type":"ScholarlyArticle","headline":"H","author":'
        '[{"name":"A"}],"isPartOf":{"issn":"2434-561X"}}</script>'
        '<script type="application/ld+json">'
        '{"@type":"NewsArticle","author":{"name":"Desk"},"issn":"0317-8471"}'
        "</script>"
        '<script type="application/ld+json">{"broken</script>'
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    rows = {r["idx"]: r for r in extract_jsonld(df).collect()}
    assert len(rows) == 3
    assert rows[1]["jtype"] == "ScholarlyArticle"
    assert rows[1]["author_name"] == "A"  # array form via [0]
    assert rows[1]["issn"] == "2434-561X"  # isPartOf form
    assert rows[2]["author_name"] == "Desk"  # object form
    assert rows[2]["issn"] == "0317-8471"  # top-level fallback
    assert rows[3]["jtype"] is None  # malformed -> NULLs, no error


def test_lang_segments_code_switching(spark):
    from sandcrawler_spark.functions.textstats import paragraph_langs

    en = "the cat sat on the mat and it was a good day for this"
    fr = "le chat dans la maison et les oiseaux sur une branche"
    df = spark.createDataFrame(
        [
            (1, f"{en}\n\n{fr}\n\n{en}"),  # en->fr->en: 2 switches
            (2, f"{en}\n\n{en}"),  # monolingual
            (3, fr),  # single other paragraph
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in paragraph_langs(df).collect()}
    assert (out[1]["n_paras"], out[1]["n_switches"], out[1]["dominant_lang"]) == (3, 2, "en")
    assert (out[2]["n_switches"], out[2]["dominant_lang"]) == (0, "en")
    assert (out[3]["n_en"], out[3]["dominant_lang"]) == (0, "other")


def test_freshness_allocation_greedy_bound(spark):
    # greedy vs exhaustive enumeration on small instances: within the
    # density-greedy knapsack bound (one step's gain) of OPT on the
    # adversarial budget, and EQUAL to OPT when granularity doesn't
    # bite; prerequisites never violated
    from itertools import product

    from sandcrawler_spark.operators.recrawl import (
        FRESH_LADDER,
        freshness_allocation,
    )

    lams = [2_000, 50_000, 400_000, 900_000]  # micro-changes/day

    def fresh(f210, lam):
        if f210 == 0:
            return 0
        return (1_000_000 * (1_000_000 * f210)) // (1_000_000 * f210 + 210 * lam)

    def brute(budget):
        best = None
        for choice in product([0] + FRESH_LADDER, repeat=len(lams)):
            if sum(choice) > budget:
                continue
            total = sum(fresh(f, lam) for f, lam in zip(choice, lams))
            if best is None or total > best:
                best = total
        return best

    df = spark.createDataFrame(
        [(f"u{i}", lam) for i, lam in enumerate(lams)], ["url", "lam_micro"]
    )
    max_step_gain = max(
        fresh(b, lam) - fresh(a, lam)
        for lam in lams
        for a, b in zip([0] + FRESH_LADDER, FRESH_LADDER)
    )
    for budget in (260, 37, 457, 4 * 210):
        rows = {r["url"]: r for r in freshness_allocation(df, budget).collect()}
        got_total = sum(r["freshness_micro"] for r in rows.values())
        got_cost = sum(r["f_per_210d"] for r in rows.values())
        assert got_cost <= budget
        # chosen f must be a valid ladder prefix (prerequisites held)
        for r in rows.values():
            assert r["f_per_210d"] in (0, 7, 30, 210)
        opt = brute(budget)
        assert opt - got_total <= max_step_gain, (budget, got_total, opt)
        if budget == 4 * 210:  # everything affordable -> exact
            assert got_total == opt


def test_parked_conjunction(spark):
    # phrase alone (news story with links) must NOT condemn the host
    from sandcrawler_spark.functions.soft404 import parked_hosts, parked_score_cols

    rows = [
        ("sale.com", '<h1>this domain is for sale</h1><a href="/x">r</a>'),
        ("sale.com", "<h1>buy this domain</h1> related searches"),
        ("news.com",
         'story: this domain is for sale <a href="/a">1</a>'
         '<a href="/b">2</a><a href="/c">3</a>'),
        ("news.com", "<p>regular article</p>"),
    ]
    df = spark.createDataFrame(rows, ["host", "body"])
    pages = df.select("host", *parked_score_cols(F.col("body")))
    out = {r["host"]: r for r in parked_hosts(pages).collect()}
    assert out["sale.com"]["host_parked"] is True
    assert out["news.com"]["host_parked"] is False
    assert out["news.com"]["n_parked"] == 0


def test_longest_repeat_semantics(spark):
    from sandcrawler_spark.functions.textstats import longest_repeat

    df = spark.createDataFrame(
        [
            (1, "spam block spam block spam block end"),
            (2, "all words here are distinct tokens"),
            (3, "x" * 100),  # repeat saturates at the cap
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in longest_repeat(df, cap=24).collect()}
    assert out[1]["repeat_sub"].startswith("spam block ")
    assert out[1]["repeat_len"] >= 22
    assert out[2]["repeat_len"] <= 4  # only short incidental repeats
    assert out[3]["repeat_len"] == 24  # identical clipped suffixes saturate at cap


def test_resolve_url_fuzz_vs_stdlib_urljoin(spark):
    # differential vs the stdlib's RFC 3986 implementation over a
    # seeded random battery of dot-segment-heavy references; fragments
    # are stripped from urljoin's output (our documented divergence),
    # and no scheme-carrying or //-containing refs are generated (the
    # other documented divergences)
    import random

    from urllib.parse import urljoin

    from sandcrawler_spark.functions.urlresolve import resolve_url

    rng = random.Random(42)
    segs = ["a", "bb", "c3", ".", "..", "d-e"]
    cases = []
    for _ in range(300):
        base_path = "/" + "/".join(
            rng.choice(["a", "bb", "c3", "d-e"]) for _ in range(rng.randint(1, 4))
        )
        base = "http://h.example" + base_path
        if rng.random() < 0.5:
            base += "?q=" + str(rng.randint(0, 9))
        n = rng.randint(1, 5)
        href = "/".join(rng.choice(segs) for _ in range(n))
        if rng.random() < 0.3:
            href = "/" + href
        if rng.random() < 0.3:
            href += "/"
        if rng.random() < 0.3:
            href += "?x=" + str(rng.randint(0, 9))
        cases.append((base, href))
    df = spark.createDataFrame(cases, ["base", "href"])
    got = {
        (r["base"], r["href"]): r["resolved"]
        for r in df.select(
            "base", "href",
            resolve_url(F.col("base"), F.col("href")).alias("resolved"),
        ).collect()
    }
    n_checked = 0
    for base, href in cases:
        want = urljoin(base, href).split("#", 1)[0]
        assert got[(base, href)] == want, (base, href, got[(base, href)], want)
        n_checked += 1
    assert n_checked == 300


def test_bbit_minhash_calibration(spark):
    # identical docs -> estimate 1.0 exactly; near-dups estimate high;
    # disjoint docs clamp to the noise floor near 0
    from sandcrawler_spark.operators.dedupe import bbit_jaccard_pairs

    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(55)) + " x1 x2 x3 x4 x5"
    disj = " ".join(f"z{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, disj)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], ["id_a", "id_b"]
    )
    out = {(r["id_a"], r["id_b"]): r for r in bbit_jaccard_pairs(docs, pairs, k=64).collect()}
    assert out[(1, 2)]["n_match"] == 64
    assert out[(1, 2)]["jhat_micro"] == 1_000_000
    assert out[(1, 2)]["jexact_micro"] == 1_000_000
    assert out[(1, 3)]["jhat_micro"] > 500_000  # high-overlap pair
    assert out[(1, 4)]["jexact_micro"] == 0
    assert out[(1, 4)]["jhat_micro"] < 400_000  # noise floor, clamped


def test_table_markdown_rendering(spark):
    from sandcrawler_spark.functions.htmlblocks import table_markdown_rows

    html = (
        "<table><tr><th>name</th><th>a|b</th></tr>"
        "<tr><td> x </td><td><b>bold</b> y</td></tr></table>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    rows = sorted(table_markdown_rows(df).collect(), key=lambda r: r["row_idx"])
    assert rows[0]["md_row"] == "| name | a\\|b |"  # pipe escaped
    assert rows[1]["md_row"] == "| x | bold y |"  # tags stripped, ws normalized
    assert rows[1]["n_cells"] == 2


def test_url_taxonomy_rules_ordered(spark):
    # first-match-wins: a dated blog path classifies as dated-article
    import re

    from __spark_entry__ import _URL_TAXO_RULES

    def classify(path):
        for name, pat in _URL_TAXO_RULES:
            if re.search(pat, path):
                return name
        return "other"

    assert classify("/blog/2020/05/post") == "dated-article"
    assert classify("/blog/post") == "blog"
    assert classify("/tag/x/page/77") == "listing"
    assert classify("/about") == "other"


def test_http_dates_vs_stdlib(spark):
    # parser pinned against email.utils.parsedate_to_datetime across
    # formats, leap days, and boundaries
    from email.utils import parsedate_to_datetime

    from sandcrawler_spark.functions.httpdate import http_date_cols

    cases = [
        "Sun, 06 Nov 1994 08:49:37 GMT",     # the RFC's own example
        "Sunday, 06-Nov-94 08:49:37 GMT",
        "Sun Nov  6 08:49:37 1994",
        "Tue, 29 Feb 2000 23:59:59 GMT",     # leap century year
        "Mon, 29 Feb 2016 00:00:00 GMT",
        "Thu, 01 Jan 1970 00:00:00 GMT",     # epoch
        "Fri, 31 Dec 1999 23:59:59 GMT",
        "Wed, 01 Mar 2023 12:00:00 GMT",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["raw"])
    got = {
        r["raw"]: (r["fmt"], r["epoch_s"])
        for r in df.select("raw", *http_date_cols(F.col("raw"))).collect()
    }
    for c in cases:
        want = int(parsedate_to_datetime(c).timestamp())
        assert got[c][1] == want, (c, got[c], want)
    assert got["Sun, 06 Nov 1994 08:49:37 GMT"][0] == "imf"
    assert got["Sunday, 06-Nov-94 08:49:37 GMT"][0] == "rfc850"
    assert got["Sun Nov  6 08:49:37 1994"][0] == "asctime"
    # malformed -> NULL, not garbage
    bad = spark.createDataFrame([("yesterday",), ("Sun, 99 Nov 1994",)], ["raw"])
    for r in bad.select(*http_date_cols(F.col("raw"))).collect():
        assert r["fmt"] is None and r["epoch_s"] is None


def test_http_dates_fuzz_vs_stdlib(spark):
    # seeded random sweep across the calendar (1970-2037) in all three
    # formats vs email.utils.parsedate_to_datetime
    import calendar
    import random
    from email.utils import parsedate_to_datetime

    from sandcrawler_spark.functions.httpdate import http_date_cols

    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    rng = random.Random(7)
    cases = []
    for _ in range(200):
        y = rng.randint(1970, 2037)
        m = rng.randint(1, 12)
        d = rng.randint(1, calendar.monthrange(y, m)[1])
        h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        t = f"{h:02d}:{mi:02d}:{s:02d}"
        kind = rng.randint(0, 2)
        if kind == 0:
            raw = f"Mon, {d:02d} {months[m-1]} {y} {t} GMT"
        elif kind == 1:
            raw = f"Monday, {d:02d}-{months[m-1]}-{y % 100:02d} {t} GMT"
        else:
            raw = f"Mon {months[m-1]} {d:2d} {t} {y}"
        cases.append(raw)
    df = spark.createDataFrame([(c,) for c in cases], ["raw"])
    got = {
        r["raw"]: r["epoch_s"]
        for r in df.select("raw", *http_date_cols(F.col("raw"))).collect()
    }
    for c in cases:
        want = int(parsedate_to_datetime(c).timestamp())
        assert got[c] == want, (c, got[c], want)


def test_checksum_catches_every_single_digit_error(spark):
    # the mathematical guarantee these codes were designed for:
    # ISSN mod-11 / ISBN-13 EAN / ORCID ISO 7064 11-2 each detect ALL
    # single-digit substitutions — exhaustive over positions, seeded
    # over bases
    import random

    from sandcrawler_spark.functions.identifiers import extract_identifiers

    def issn_check(d7):
        s = sum(int(d) * w for d, w in zip(d7, range(8, 1, -1)))
        c = (11 - s % 11) % 11
        return "X" if c == 10 else str(c)

    rng = random.Random(3)
    rows, expect_invalid = [], 0
    rid = 0
    for _ in range(25):
        d7 = "".join(rng.choice("0123456789") for _ in range(7))
        issn = f"{d7[:4]}-{d7[4:]}{issn_check(d7)}"
        # corrupt each data position in turn (check-digit corruption
        # is covered by test_checksum_rejects_corrupted)
        for pos in range(7):
            old = d7[pos]
            new = rng.choice([c for c in "0123456789" if c != old])
            bad = d7[:pos] + new + d7[pos + 1:]
            bad_issn = f"{bad[:4]}-{bad[4:]}{issn[-1]}"
            rows.append((rid, f"ISSN {bad_issn}"))
            rid += 1
            expect_invalid += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = extract_identifiers(df).collect()
    assert len(out) == expect_invalid
    assert all(not r["is_valid"] for r in out), [
        r for r in out if r["is_valid"]
    ][:3]


def test_arc_scanner_truncation_and_filedesc(spark):
    import hashlib

    from sandcrawler_spark.sources.arcfmt import parse_arc_blob_rows

    def rec(url, payload: bytes) -> bytes:
        head = f"{url} 1.2.3.4 20200101000000 text/html {len(payload)}\n"
        return head.encode() + payload + b"\n"

    fd = rec("filedesc://f.arc", b"1 1 InternetArchive\n")
    r1 = rec("http://a.example/x", b"HTTP/1.1 200 OK\n\nbody-one")
    r2 = rec("http://b.example/y", b"HTTP/1.1 404 NF\n\nmissing")
    blob = fd + r1 + r2
    rows = parse_arc_blob_rows(blob, path="f.arc")
    assert [r["url"] for r in rows] == ["http://a.example/x", "http://b.example/y"]
    assert rows[0]["offset"] == len(fd)
    assert rows[1]["offset"] == len(fd) + len(r1)
    assert rows[0]["payload_md5"] == hashlib.md5(b"HTTP/1.1 200 OK\n\nbody-one").hexdigest()
    # truncated tail: the partial record is dropped, prior ones survive
    rows_t = parse_arc_blob_rows(blob[:-10], path="f.arc")
    assert [r["url"] for r in rows_t] == ["http://a.example/x"]
    # garbage header terminates cleanly
    assert parse_arc_blob_rows(b"not an arc header\nxx") == []


def test_arc_lengths_are_bytes_on_non_ascii(spark):
    # the engine counts payload lengths in UTF-8 BYTES (octet_length /
    # byte-walking scanner); the DuckDB oracles use strlen(), which in
    # DuckDB is ALSO byte-based (unlike length(), which is chars) — so
    # the byte-exact offset proof holds beyond ASCII. This pins both
    # halves on a payload where chars != bytes.
    import duckdb

    from sandcrawler_spark.sources.arcfmt import (
        arc_filedesc_col,
        arc_record_col,
        scan_arc_blobs,
    )

    payload = "HTTP/1.1 200 OK\n\nnaïve café — ünïcødé body"
    n_bytes = len(payload.encode("utf-8"))
    assert n_bytes != len(payload)  # the case that would expose a char-count
    # DuckDB strlen == UTF-8 bytes (the oracle idiom is byte-based)
    (dck,) = duckdb.sql("SELECT strlen(?)", params=[payload]).fetchone()
    assert dck == n_bytes
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    recs = df.select(
        F.lit(0).alias("file_id"),
        arc_record_col(
            F.lit("https://u.example/é"), F.lit("1.2.3.4"),
            F.lit("20200101000000"), F.lit("text/html"), F.col("payload"),
        ).alias("rec"),
    )
    blobs = recs.groupBy("file_id").agg(
        F.first("rec").alias("body")
    ).select(
        F.lit("f.arc").alias("path"),
        F.encode(F.concat(arc_filedesc_col(F.lit("f.arc")), F.col("body")), "utf-8")
        .alias("content"),
    )
    out = scan_arc_blobs(blobs).collect()
    assert len(out) == 1
    assert out[0]["length"] == n_bytes


def test_gopher_quality_rule_semantics(spark):
    from sandcrawler_spark.functions.repetition import gopher_quality_cols

    good = " ".join(
        ["the", "quick", "brown", "words", "flow", "here", "and", "that",
         "with", "have"] * 6
    )
    rows = [
        (1, good),
        (2, "too short"),  # wc_ok fails
        (3, good + " " + "#tag " * 20),  # sym_ok fails
        (4, good + "\n" + "\n".join("- b" for _ in range(40))),  # bullets
        (5, " ".join(["1234"] * 60)),  # alpha_ok + stop_ok fail
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in df.select("doc_id", *gopher_quality_cols(F.col("text"))).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["wc_ok"] is False
    assert out[3]["sym_ok"] is False
    assert out[4]["bullet_ok"] is False
    assert out[5]["alpha_ok"] is False and out[5]["stop_ok"] is False
    assert all(not out[i]["gopher_pass"] for i in (2, 3, 4, 5))


def test_seen_compare_crossover(spark):
    # cuckoo wins above the ~2.7%-FPR crossover (f >= ~7), matching
    # Fan et al.'s headline claim — check the table's verdict column
    from __spark_entry__ import q_seen_compare

    rows = {r["f_bits"]: r for r in q_seen_compare(spark, "/root/testdata/sf0.001").collect()}
    for f, r in rows.items():
        # bloom bpk = 1.4427*(f-3); cuckoo = f/0.955 — cuckoo smaller iff f > ~9.4
        expect = (f * 1000 / 0.955) < ((f - 3) * 1442.695)
        assert r["cuckoo_smaller"] == (r["cuckoo_bpk_milli"] < r["bloom_bpk_milli"])
        assert r["cuckoo_smaller"] == expect, (f, r)


def test_warc_revisit_write_ledger(spark):
    # every digest writes exactly one response; bytes_saved equals the
    # payload bytes of every suppressed duplicate
    from __spark_entry__ import q_warc_revisit_write

    rows = q_warc_revisit_write(spark, "/root/testdata/sf0.001").collect()
    by_digest: dict = {}
    for r in rows:
        by_digest.setdefault(r["digest"], []).append(r)
    for recs in by_digest.values():
        kinds = sorted(r["kind"] for r in recs)
        assert kinds.count("response") == 1
        first = [r for r in recs if r["kind"] == "response"][0]
        for r in recs:
            if r["kind"] == "revisit":
                assert r["ref_url"] is not None and r["bytes_saved"] > 0
                assert r["bytes_written"] == 120
        assert first["bytes_saved"] == 0


def test_identifier_stats_rollup(spark):
    df = spark.createDataFrame(
        [
            (1, "ISSN 0317-8471 ISSN 0317-8471 ISSN 0317-8472"),
            (2, "ISSN 2434-561X doi:10.1234/x"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["kind"]: r for r in identifier_stats(extract_identifiers(df)).collect()
    }
    assert out["issn"]["n_candidates"] == 4
    assert out["issn"]["n_valid"] == 3
    assert out["issn"]["n_invalid"] == 1
    assert out["issn"]["n_distinct_valid"] == 2
    assert out["doi"]["n_valid"] == 1
