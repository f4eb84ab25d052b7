"""Published-rule goldens, independent of the DuckDB oracle twins.

Several oracles share their constants/regexes with the Spark side by
construction, so a green hash proves Spark == DuckDB-twin, not
twin == published-rule (VERDICT r4 "What's wrong #2"). These batteries
transcribe the PUBLIC sources' own worked examples and threshold
values, hand-derived — no engine constant is reused to compute an
expectation:

  * RFC 9309 (Robots Exclusion Protocol) §2.2.2 / §5 worked examples
    -> functions/robots.py (parse_robots_py + robots_disallowed_col)
  * C4 §2.2 cleaning rules (Raffel et al. 2020, JMLR 21(140)), with
    the official released-implementation constants
    -> functions/c4filters.py
  * Gopher quality thresholds (Rae et al. 2021, arXiv:2112.11446,
    Appendix A table A1) at their exact boundary values
    -> functions/repetition.py gopher_quality_cols
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# RFC 9309 — the RFC's own examples
# ---------------------------------------------------------------------------

# RFC 9309 §5.1 "Simple example": three groups with the RFC's stated
# outcomes for foobot, barbot/bazbot, and everyone else.
RFC9309_SIMPLE = """\
User-Agent: *
Disallow: *.gif$
Disallow: /example/
Allow: /publications/

User-Agent: foobot
Disallow:/
Allow:/example/page.html
Allow:/example/allowed.gif

User-Agent: barbot
User-Agent: bazbot
Disallow: /example/page.html
"""


def _verdicts(spark, dis: list[str], alw: list[str], paths: list[str]) -> dict:
    from sandcrawler_spark.functions.robots import robots_disallowed_col

    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    out = df.select(
        "path",
        robots_disallowed_col(
            F.col("path"),
            F.array(*[F.lit(d) for d in dis]) if dis else F.array().cast("array<string>"),
            F.array(*[F.lit(a) for a in alw]) if alw else F.array().cast("array<string>"),
        ).alias("blocked"),
    )
    return {r["path"]: r["blocked"] for r in out.collect()}


def test_rfc9309_simple_example_group_selection():
    # RFC 9309 §5.1: foobot gets its own group; barbot and bazbot
    # SHARE one group (consecutive User-Agent lines); all others fall
    # to the '*' group. Transcribed outcomes, not engine-derived.
    from sandcrawler_spark.functions.robots import parse_robots_py

    foo = parse_robots_py(RFC9309_SIMPLE, agent="foobot")
    assert foo["disallow_prefixes"] == ["/"]
    assert foo["allow_prefixes"] == ["/example/page.html", "/example/allowed.gif"]
    for agent in ("barbot", "bazbot"):
        g = parse_robots_py(RFC9309_SIMPLE, agent=agent)
        assert g["disallow_prefixes"] == ["/example/page.html"]
        assert g["allow_prefixes"] == []
    other = parse_robots_py(RFC9309_SIMPLE, agent="quxbot")
    assert other["disallow_prefixes"] == ["*.gif$", "/example/"]
    assert other["allow_prefixes"] == ["/publications/"]
    assert other["n_groups"] == 3


def test_rfc9309_simple_example_verdicts(spark):
    # The RFC's §5.1 stated outcomes, evaluated through the matcher.
    # foobot: "may only crawl /example/page.html and /example/allowed.gif"
    foo = _verdicts(
        spark, ["/"], ["/example/page.html", "/example/allowed.gif"],
        ["/example/page.html", "/example/allowed.gif", "/example/other.html", "/"],
    )
    assert foo["/example/page.html"] is False
    assert foo["/example/allowed.gif"] is False
    assert foo["/example/other.html"] is True
    assert foo["/"] is True
    # barbot/bazbot: "may crawl everything except /example/page.html"
    bar = _verdicts(
        spark, ["/example/page.html"], [],
        ["/example/page.html", "/example/allowed.gif", "/"],
    )
    assert bar["/example/page.html"] is True
    assert bar["/example/allowed.gif"] is False
    assert bar["/"] is False
    # all other crawlers: everything except *.gif URIs and the
    # /example/ subtree; /publications/ explicitly allowed
    oth = _verdicts(
        spark, ["*.gif$", "/example/"], ["/publications/"],
        ["/foo.gif", "/foo.gift", "/example/page.html", "/publications/a.pdf", "/"],
    )
    assert oth["/foo.gif"] is True       # *.gif$ wildcard + anchor
    assert oth["/foo.gift"] is False     # $ anchors: .gift survives
    assert oth["/example/page.html"] is True
    assert oth["/publications/a.pdf"] is False
    assert oth["/"] is False


def test_rfc9309_longest_match_example(spark):
    # RFC 9309 §5.2 "Longest match": for /example/page/disallowed.gif
    # the crawler MUST use the Disallow rule because it is longest;
    # /example/page/ itself stays allowed.
    v = _verdicts(
        spark,
        ["/example/page/disallowed.gif"],
        ["/example/page/"],
        ["/example/page/disallowed.gif", "/example/page/index.html", "/example/page/"],
    )
    assert v["/example/page/disallowed.gif"] is True
    assert v["/example/page/index.html"] is False
    assert v["/example/page/"] is False


def test_rfc9309_allow_wins_exact_tie(spark):
    # RFC 9309 §2.2.2: "If an allow rule and a disallow rule are
    # equivalent, then the allow rule SHOULD be used"
    v = _verdicts(spark, ["/page"], ["/page"], ["/page", "/pagex"])
    assert v["/page"] is False
    assert v["/pagex"] is False  # both rules match as prefixes; tie -> allow


def test_rfc9309_empty_disallow_allows_all():
    # RFC 9309 §2.2.2: "Disallow:" with an empty value means no URI is
    # disallowed for that group
    from sandcrawler_spark.functions.robots import parse_robots_py

    g = parse_robots_py("User-agent: *\nDisallow:\n", agent="anybot")
    assert g["disallow_prefixes"] == []


# ---------------------------------------------------------------------------
# C4 §2.2 (Raffel et al. 2020) — the published cleaning rules
# ---------------------------------------------------------------------------
# Constants note, documented divergence in the paper itself: the JMLR
# text says "discarded any page with fewer than 5 sentences and only
# retained lines that contained at least 3 words", while the authors'
# RELEASED implementation (tensorflow_datasets c4_utils.py) ships
# _MIN_WORDS_PER_LINE = 5 and _MIN_NUM_SENTENCES = 3. This engine
# follows the released code (5 words/line, 3 sentences/page) — the
# constants real C4 was actually built with.


def _c4(spark, text: str):
    from sandcrawler_spark.functions.c4filters import with_c4_verdict

    df = spark.createDataFrame([(text,)], ["text"])
    return with_c4_verdict(df).collect()[0]


def test_c4_terminal_punctuation_rule(spark):
    # "We only retained lines that ended in a terminal punctuation
    # mark (i.e. a period, exclamation mark, question mark, or end
    # quotation mark)."
    kept = _c4(
        spark,
        "\n".join([
            "This sentence ends with a period.",
            "Does this line end with a question mark?",
            "This line ends with an exclamation mark!",
            'She said the words "all done."',
            "this line has no terminal punctuation at all",
        ]),
    )
    assert kept["n_lines"] == 5
    assert kept["n_lines_kept"] == 4  # only the unpunctuated line drops


def test_c4_min_words_per_line_boundary(spark):
    # released-code constant: lines need >= 5 words
    r = _c4(
        spark,
        "\n".join([
            "Exactly five words right here.",        # 5 words -> kept
            "Only four words here.",                  # 4 words -> dropped
            "This longer line has seven words total.",
        ]),
    )
    assert r["n_lines_kept"] == 2


def test_c4_javascript_line_rule(spark):
    # "we removed any line with the word Javascript" (any case)
    r = _c4(
        spark,
        "\n".join([
            "Please enable JavaScript to view the comments powered here.",
            "A perfectly normal sentence with enough words in it.",
        ]),
    )
    assert r["n_lines_kept"] == 1


def test_c4_page_rules_lorem_brace_sentences(spark):
    # "we removed any page where the phrase 'lorem ipsum' appeared"
    # and "we removed any pages that contained a curly bracket";
    # released-code constant: pages need >= 3 sentences after cleaning
    three = "\n".join([
        "The first sentence here is fine and long.",
        "The second sentence here is fine and long.",
        "The third sentence here is fine and long.",
    ])
    assert _c4(spark, three)["page_kept"] is True
    two = "\n".join(three.split("\n")[:2])
    assert _c4(spark, two)["n_sentences"] == 2
    assert _c4(spark, two)["page_kept"] is False
    assert _c4(spark, three + "\nAnd some Lorem Ipsum filler text.")["page_kept"] is False
    assert _c4(spark, three + "\nfunction f() { return 1; }")["page_kept"] is False


# ---------------------------------------------------------------------------
# publicsuffix.org — the official checkPublicSuffix test battery
# (the list project's published test data), restricted to the cases
# resolvable with functions/psl.py's curated DEFAULT_RULES subset
# ---------------------------------------------------------------------------
# Omitted official cases, documented: private-section suffixes not in
# the subset (uk.com, ...), single-rule TLDs outside it (ao, mm),
# jp geographic rules, US K12 second levels, and the IDN/punycode
# block — all data breadth (swap in the full PSL snapshot), not
# algorithm gaps.

PSL_OFFICIAL_CASES = [
    # Mixed case
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    # Leading dot -> invalid input
    (".com", None),
    (".example", None),
    # Unlisted TLD (implicit '*' rule)
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # Listed TLD
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some 2-level rules (com)
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    # More complex TLD (jp)
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    # TLD with a wildcard rule and exceptions (ck)
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US TLD (flat tier of the subset)
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
]


def test_psl_official_battery_python_tier():
    from sandcrawler_spark.functions.psl import registered_domain_py

    for host, want in PSL_OFFICIAL_CASES:
        assert registered_domain_py(host) == want, (host, want)


def test_psl_official_battery_spark_tier(spark):
    from sandcrawler_spark.functions.psl import with_registered_domain

    df = spark.createDataFrame(
        [(h,) for h, _ in PSL_OFFICIAL_CASES], ["host"]
    )
    got = {
        r["host"]: r["registered_domain"]
        for r in with_registered_domain(df, "host").collect()
    }
    for host, want in PSL_OFFICIAL_CASES:
        assert got[host] == want, (host, got[host], want)


# ---------------------------------------------------------------------------
# Gopher quality thresholds (Rae et al. 2021, Appendix A) at their
# exact published boundaries
# ---------------------------------------------------------------------------


def _gopher(spark, text: str):
    from sandcrawler_spark.functions.repetition import gopher_quality_cols

    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(*gopher_quality_cols(F.col("text"))).collect()[0]


def _words(n: int, word: str = "word") -> list[str]:
    # 4-char filler keeps mean word length mid-range; two stopwords
    # satisfy the stop-word probe without skewing other stats
    ws = [word] * n
    ws[0:2] = ["the", "and"]
    return ws


def test_gopher_word_count_bounds(spark):
    # "between 50 and 100,000 words" — 50 passes, 49 fails
    assert _gopher(spark, " ".join(_words(50)))["wc_ok"] is True
    assert _gopher(spark, " ".join(_words(49)))["wc_ok"] is False


def test_gopher_mean_word_length_bounds(spark):
    # "mean word length ... between 3 and 10 characters" — exact
    # boundary means pass, one char beyond fails
    all3 = " ".join(["the", "and"] + ["abc"] * 48)           # mean exactly 3
    assert _gopher(spark, all3)["mwl_ok"] is True
    all2 = " ".join(["ab"] * 50)                              # mean 2
    assert _gopher(spark, all2)["mwl_ok"] is False
    mean10 = " ".join(["abcdefghij"] * 50)                    # mean exactly 10
    assert _gopher(spark, mean10)["mwl_ok"] is True
    mean11 = " ".join(["abcdefghijk"] * 50)                   # mean 11
    assert _gopher(spark, mean11)["mwl_ok"] is False


def test_gopher_symbol_ratio_boundary(spark):
    # "symbol-to-word ratio greater than 0.1 for either the hash
    # symbol or the ellipsis" -> removed; exactly 0.1 survives
    base = _words(49)
    at = " ".join(base + ["x#####x"])    # 50 words, 5 hashes -> ratio 0.1
    assert _gopher(spark, at)["sym_ok"] is True
    over = " ".join(base + ["x######x"])  # 6 hashes -> 0.12
    assert _gopher(spark, over)["sym_ok"] is False


def test_gopher_bullet_and_ellipsis_line_ratios(spark):
    # "more than 90% of lines starting with a bullet point" -> removed;
    # "more than 30% ending with an ellipsis" -> removed
    body = " ".join(_words(50))
    nine_of_ten = "\n".join([body] + ["- bullet line"] * 9)      # 9/10 = 90%
    assert _gopher(spark, nine_of_ten)["bullet_ok"] is True
    ten_of_ten = "\n".join(["- " + body] + ["- bullet line"] * 9)
    assert _gopher(spark, ten_of_ten)["bullet_ok"] is False
    three_of_ten = "\n".join([body] * 7 + [body + "..."] * 3)    # 3/10 = 30%
    assert _gopher(spark, three_of_ten)["ellipsis_ok"] is True
    four_of_ten = "\n".join([body] * 6 + [body + "..."] * 4)     # 40%
    assert _gopher(spark, four_of_ten)["ellipsis_ok"] is False


def test_gopher_alpha_word_ratio_boundary(spark):
    # "80% of words in a document contain at least one alphabetic
    # character" (a minimum) — exactly 80% passes, below fails
    forty_alpha = " ".join(_words(40) + ["123"] * 10)   # 40/50 = 80%
    assert _gopher(spark, forty_alpha)["alpha_ok"] is True
    under = " ".join(_words(39) + ["123"] * 11)          # 78%
    assert _gopher(spark, under)["alpha_ok"] is False


def test_gopher_stopword_probe(spark):
    # "contain at least two of the following English words: the, be,
    # to, of, and, that, have, with"
    two = " ".join(["the", "and"] + ["word"] * 48)
    assert _gopher(spark, two)["stop_ok"] is True
    one = " ".join(["the"] + ["word"] * 49)
    assert _gopher(spark, one)["stop_ok"] is False
    # repetitions of ONE stopword do not count as two
    rep = " ".join(["the"] * 10 + ["word"] * 40)
    assert _gopher(spark, rep)["stop_ok"] is False
