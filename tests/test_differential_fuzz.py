"""Differential fuzz tests: pure-Python twins checked against the
engine implementations over randomized inputs (hypothesis where the
function is pure-Python; one batched Spark job for column functions).
"""

from __future__ import annotations

import datetime as dt
import random
import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# parse_date_py: every supported rendering of a valid date round-trips
# ---------------------------------------------------------------------------

_MONTH_NAMES = ["January", "February", "March", "April", "May", "June", "July",
                "August", "September", "October", "November", "December"]


@given(st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 12, 28)))
@settings(max_examples=200, deadline=None)
def test_parse_date_renderings_roundtrip(d):
    from sandcrawler_spark.functions.biblio import parse_date_py

    iso = d.isoformat()
    renderings = [
        iso,
        f"{d.year}/{d.month}/{d.day}",
        f"{d.year:04d}{d.month:02d}{d.day:02d}",
        f"{d.day} {_MONTH_NAMES[d.month - 1]} {d.year}",
        f"{_MONTH_NAMES[d.month - 1]} {d.day}, {d.year}",
        f"{iso}T12:34:56Z",
    ]
    for r in renderings:
        assert parse_date_py(r) == iso, r


@given(st.text(alphabet=string.printable, max_size=30))
@settings(max_examples=200, deadline=None)
def test_parse_date_never_raises(s):
    from sandcrawler_spark.functions.biblio import parse_date_py

    out = parse_date_py(s)
    assert out is None or re.fullmatch(r"\d{4}-\d{2}-\d{2}", out)


# ---------------------------------------------------------------------------
# robots parser: permuting group order never changes the selected group
# ---------------------------------------------------------------------------

@given(st.permutations(["g1", "g2", "star"]), st.integers(0, 1))
@settings(max_examples=60, deadline=None)
def test_robots_group_order_irrelevant(order, pick):
    from sandcrawler_spark.functions.robots import parse_robots_py

    blocks = {
        "g1": "User-agent: alphabot\nDisallow: /a/\nCrawl-delay: 1",
        "g2": "User-agent: betabot\nDisallow: /b/\nCrawl-delay: 2",
        "star": "User-agent: *\nDisallow: /star/\nCrawl-delay: 9",
    }
    txt = "\n\n".join(blocks[k] for k in order)
    agent = ["alphabot/1.0", "betabot/1.0"][pick]
    r = parse_robots_py(txt, agent)
    assert r["disallow_prefixes"] == ["/a/" if pick == 0 else "/b/"]
    assert r["crawl_delay_s"] == float(pick + 1)
    r_star = parse_robots_py(txt, "unknownbot")
    assert r_star["disallow_prefixes"] == ["/star/"]


# ---------------------------------------------------------------------------
# BPE token pattern: Spark regexp_count vs Python re over random text
# (Java regex and RE2/Python must agree on the restricted pattern —
# one batched Spark job, not one per example)
# ---------------------------------------------------------------------------

def test_bpe_pattern_spark_vs_python_re(spark):
    from sandcrawler_spark.functions.textstats import BPE_TOKEN_PATTERN, bpe_token_count_col

    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + " \t\n.,;:!?'\"-_()[]{}@#$%^&*"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(300)
    ]
    texts += ["", "I'll we've they're can't", "   ", "a'b'c", "...", "x" * 500]
    expected = [len(re.findall(BPE_TOKEN_PATTERN, t)) for t in texts]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {r.i: r.n for r in df.select("i", bpe_token_count_col(F.col("t")).alias("n")).collect()}
    for i, e in enumerate(expected):
        assert got[i] == e, (i, texts[i][:50], got[i], e)


def _span_dedupe_py(docs: list[tuple[int, str]], n: int) -> dict[int, tuple[int, int, str]]:
    """Pure-python reference for span_dedupe: a token is dropped iff it
    lies inside some full n-gram whose (doc, pos) occurrence is not
    that gram's global first (first = smallest (doc_id, pos))."""
    toks = {d: t.split() for d, t in docs}
    first: dict[tuple, tuple] = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - n + 1):
            g = tuple(ts[p:p + n])
            first.setdefault(g, (d, p))
    out = {}
    for d in sorted(toks):
        ts = toks[d]
        covered = set()
        for p in range(len(ts) - n + 1):
            if first[tuple(ts[p:p + n])] != (d, p):
                covered.update(range(p, p + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_span_dedupe_differential_fuzz(spark):
    import random

    from sandcrawler_spark.operators.dedupe import span_dedupe

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.choice([2, 3, 5])
        vocab = [f"t{i}" for i in range(rng.choice([3, 8]))]
        docs = []
        for d in range(12):
            ln = rng.randrange(0, 14)
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(ln))))
        want = _span_dedupe_py(docs, n)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.n_dropped, r.text_deduped)
            for r in span_dedupe(df, n=n).collect()
        }
        assert got == want, f"trial {trial} (n={n}): {got} != {want}"


# ---------------------------------------------------------------------------
# C4 line/page cleaning: pure-Python reference vs the Catalyst columns
# ---------------------------------------------------------------------------

def _c4_py(text: str, min_words: int = 5, min_sentences: int = 3):
    import hashlib

    lines = text.split("\n")
    kept = [
        l for l in lines
        if re.search(r'[.!?"]\s*$', l)
        and len([t for t in re.split(r"\s+", l) if t]) >= min_words
        and "javascript" not in l.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    return (
        len(lines),
        len(kept),
        n_sent,
        len([t for t in re.split(r"\s+", clean) if t]),
        hashlib.md5(clean.encode()).hexdigest(),
        n_sent >= min_sentences
        and "lorem ipsum" not in text.lower()
        and "{" not in text,
    )


def test_c4_differential_fuzz(spark):
    from sandcrawler_spark.functions.c4filters import with_c4_verdict

    rng = random.Random(7)
    words = ["alpha", "beta", "Gamma", "javascript", "JavaScript", "lorem",
             "ipsum", "Lorem Ipsum", "{x}", "a", "bb", "ccc"]
    tails = ["", ".", "!", "?", '."', ".\r", ".  ", " ", "..."]
    texts = []
    for _ in range(250):
        n_lines = rng.randint(0, 8)
        texts.append("\n".join(
            " ".join(rng.choice(words) for _ in range(rng.randint(0, 9)))
            + rng.choice(tails)
            for _ in range(n_lines)
        ))
    texts += ["", ".", "\n\n\n", "one two three four five.", "x { y."]
    expected = {i: _c4_py(t) for i, t in enumerate(texts)}
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["url", "text"])
    got = {
        r.url: (r.n_lines, r.n_lines_kept, r.n_sentences, r.clean_words,
                r.clean_md5, bool(r.page_kept))
        for r in with_c4_verdict(df, "text").collect()
    }
    for i, e in expected.items():
        assert got[i] == e, (i, repr(texts[i][:80]), got[i], e)


def test_htmlstats_differential_fuzz(spark):
    """tag_density / title_clusters vs a pure-Python twin over
    randomized HTML-ish strings (nested/unclosed tags, stray '<',
    unicode text, empty titles) — one batched Spark job."""
    rng = random.Random(4210)
    frags = ["<p>", "</p>", "<a ", "<meta ", "<title>", "</title>",
             "text ", "wörds ", "<", ">", "x<y", "", "漢字"]
    rows = []
    for i in range(120):
        body = "".join(rng.choice(frags) for _ in range(rng.randint(0, 30)))
        html = "<" + body  # ensure the markup magic byte
        rows.append((f"https://h{i % 7}.ex.com/p{i}", bytearray(html.encode("utf-8")), ""))

    from sandcrawler_spark.functions.htmlstats import tag_density, title_clusters

    pages = spark.createDataFrame(rows, "url string, html binary, text string")

    # python twin for the per-host tag counts
    import collections
    exp = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # pages, chars, <, <p>, <a , <meta
    for url, html, _ in rows:
        h = url.split("//")[1].split("/")[0]
        s = bytes(html).decode("utf-8")
        e = exp[h]
        e[0] += 1
        e[1] += len(s)
        e[2] += s.count("<")
        e[3] += s.count("<p>")
        e[4] += s.count("<a ")
        e[5] += s.count("<meta ")
    got = {r.host: r for r in tag_density(pages).collect()}
    assert set(got) == set(exp)
    for h, e in exp.items():
        r = got[h]
        assert (r.n_pages, r.html_chars, r.n_tags, r.n_para, r.n_anchor, r.n_meta) == tuple(e)

    # python twin for title clusters (first <title>...</title>, no '<' inside)
    tcounts = collections.Counter()
    for url, html, _ in rows:
        m = re.search(r"<title>([^<]*)</title>", bytes(html).decode("utf-8"))
        if m and m.group(1):
            tcounts[m.group(1)] += 1
    expect_clusters = {t: n for t, n in tcounts.items() if n >= 2}
    got_clusters = {r.title: r.n_pages for r in title_clusters(pages, min_pages=2).collect()}
    assert got_clusters == expect_clusters


# ---------------------------------------------------------------------------
# sentence splitter: Spark (Java regex) vs pure-Python re twin over a
# seeded fuzz corpus built from boundary-adversarial fragments. The
# DuckDB oracle (RE2) covers the third engine in the sweep — this leg
# pins the Java<->Python agreement on the shared regex subset.
# ---------------------------------------------------------------------------

def _sentence_stats_py(text: str) -> tuple[int, int, int]:
    from sandcrawler_spark.functions import sentences as S

    s = re.sub(S._DEC_PAT, "\\1\x11\\2", text)
    s = re.sub(S._EG_PAT, "\\1\x11\\2\x11", s)
    s = re.sub(S._IE_PAT, "\\1\x11\\2\x11", s)
    s = re.sub(S._ETAL_PAT, "\\1\x11", s)
    s = re.sub(S._ABBR_PAT, "\\1\x11", s)
    s = re.sub(S._INIT_PAT, "\\1\x11", s)
    s = re.sub(S._BOUND_PAT, "\\1\x1e\\2", s)
    s = re.sub(S._CJK_BOUND_PAT, "\\1\x1e\\2", s)
    n_words = len(re.findall(S._WORD_PAT, text))
    n_bounds = s.count("\x1e")
    n_sent = n_bounds + 1 if n_words > 0 else 0
    mean = (100 * n_words) // n_sent if n_sent > 0 else 0
    return n_words, n_sent, mean


def test_sentence_stats_spark_vs_python_re(spark):
    from sandcrawler_spark.functions.sentences import with_sentence_stats

    rng = random.Random(4242)
    frags = [
        "the cat sat", "Dr.", "Mr.", "et al.", "e.g.", "i.e.", "vs.",
        "3.14", "2.71", "A.", "J. K.", "No. 5", "pp. 10-12", "So",
        "Hello.", "World!", "what?", "End. Start", "x.y", "...", "!?",
        "U.S.", "lower. upper", "Cap Next", '"Quoted', "(paren",
        "12. Items", "a.b.c.", "St. Mary", "OK.   Then",
        "你好。世界", "深度学习！很好", "问题？答案。", "中文 and English.",
    ]
    texts = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 25)))
        for _ in range(300)
    ]
    texts += ["", " ", ".", "Dr. Dr. Dr.", "A. B. C. D.", "Hi. Ok. Go."]
    expected = [_sentence_stats_py(t) for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["mean_words_x100"])
        for r in with_sentence_stats(df).collect()
    }
    for i, e in enumerate(expected):
        assert got[i] == e, (i, texts[i][:60], got[i], e)
