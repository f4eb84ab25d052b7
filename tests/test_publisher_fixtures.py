"""Real-publisher HTML fixtures: biblio + resources extraction asserted
against the REFERENCE's expected values.

Fixtures are the public test pages shipped by the reference repo
(/root/reference/python/tests/files/*.html); the expected values below
are transcribed from /root/reference/python/tests/test_html_metadata.py:8-229.
This is the round-2 VERDICT item 3: assert our extractor on real
publisher markup (PLOS, eLife, PeerJ, Nature, OJS3 First Monday, D-Lib),
not just synthetic HTML.
"""

from __future__ import annotations

import os

from sandcrawler_spark.functions.biblio import (
    adblock_check_py,
    extract_biblio_py,
    extract_resources_py,
)

FILES = os.path.join(os.path.dirname(__file__), "files")


def _biblio(name: str, url: str = "http://example.org") -> dict:
    with open(os.path.join(FILES, name), "rb") as f:
        return extract_biblio_py(f.read(), url)


def _resources(name: str, url: str) -> list[dict]:
    with open(os.path.join(FILES, name), "rb") as f:
        return extract_resources_py(f.read(), url)


def test_plos_article():
    # expected: reference test_html_metadata.py:8-42
    m = _biblio("plos_one_article.html")
    assert m["title"] == (
        "Assessment on reticuloendotheliosis virus infection in "
        "specific-pathogen-free chickens based on detection of yolk antibody"
    )
    assert m["doi"] == "10.1371/journal.pone.0213978"
    assert m["pdf_fulltext_url"] == (
        "https://journals.plos.org/plosone/article/file?id=10.1371/"
        "journal.pone.0213978&type=printable"
    )
    assert m["contrib_names"] == [
        "Yang Li", "Tuanjie Wang", "Lin Wang", "Mingjun Sun", "Zhizhong Cui",
        "Shuang Chang", "Yongping Wu", "Xiaodong Zhang", "Xiaohui Yu",
        "Tao Sun", "Peng Zhao",
    ]
    assert m["container_name"] == "PLOS ONE"
    assert m["container_abbrev"] == "PLOS ONE"
    assert m["release_date"] == "2019-04-22"  # source form: "Apr 22, 2019"
    assert m["first_page"] == "e0213978"
    assert m["issue"] == "4"
    assert m["volume"] == "14"
    assert m["container_issn"] == "1932-6203"
    assert m["publisher"] == "Public Library of Science"
    assert m["release_type"] == "article-journal"
    assert m["raw_references"] and any(
        "citation_title=Reticuloendotheliosis virus sequences within the "
        "genomes of field strains of fowlpox virus display variability;"
        "citation_author=P Singh;citation_author=W. M. Schnitzlein;"
        "citation_author=D. N. Tripathy;citation_journal_title=J. Virol;"
        "citation_volume=77;citation_number=77;citation_first_page=5855;"
        "citation_last_page=5862;citation_publication_date=2003;" in r
        for r in m["raw_references"]
    )


def test_elife_article():
    # expected: reference test_html_metadata.py:45-68
    m = _biblio("elife_article.html", "https://elifesciences.org/articles/44753")
    assert m["title"] == "Parallel visual circuitry in a basal chordate"
    assert m["doi"] == "10.7554/eLife.44753"  # case preserved
    assert m["contrib_names"] == [
        "Matthew J Kourakis", "Cezar Borba", "Angela Zhang",
        "Erin Newman-Smith", "Priscilla Salas", "B Manjunath", "William C Smith",
    ]
    assert m["container_name"] == "eLife"
    assert m["release_date"] == "2019-04-18"
    assert m["publisher"] == "eLife Sciences Publications Limited"
    assert m["pdf_fulltext_url"] == (
        "https://elifesciences.org/download/aHR0cHM6Ly9jZG4uZWxpZmVzY2llbmNlcy5v"
        "cmcvYXJ0aWNsZXMvNDQ3NTMvZWxpZmUtNDQ3NTMtdjIucGRm/elife-44753-v2.pdf"
        "?_hash=CfyqOqVryCR4OjcMTfcdpeIWAGZznmh9jXksYKYChCw%3D"
    )


def test_peerj_article():
    # expected: reference test_html_metadata.py:71-93
    m = _biblio("peerj_oa_article.html")
    assert m["title"] == (
        "The state of OA: a large-scale analysis of the prevalence and "
        "impact of Open Access articles"
    )
    assert m["doi"] == "10.7717/peerj.4375"
    assert m["contrib_names"] == [
        "Heather Piwowar", "Jason Priem", "Vincent Larivière",
        "Juan Pablo Alperin", "Lisa Matthias", "Bree Norlander",
        "Ashley Farley", "Jevin West", "Stefanie Haustein",
    ]
    assert m["container_name"] == "PeerJ"
    assert m["release_date"] == "2018-02-13"
    assert m["xml_fulltext_url"] and ".xml" in m["xml_fulltext_url"]


def test_nature_article():
    # expected: reference test_html_metadata.py:96-115
    m = _biblio("nature_article.html")
    assert m["title"] == "More than 100 scientific journals have disappeared from the Internet"
    assert m["doi"] == "10.1038/d41586-020-02610-z"
    assert m["contrib_names"] == ["Diana Kwon"]
    assert m["container_name"] == "Nature"
    assert m["release_date"] == "2020-09-10"
    assert m["publisher"] == "Nature Publishing Group"
    # duplication is present in the source markup; kept verbatim like the reference
    assert m["abstract"] == (
        "Researchers have identified dozens of open-access journals that went "
        "offline between 2000 and 2019, and hundreds more that could be at risk.  "
        "Researchers have identified dozens of open-access journals that went "
        "offline between 2000 and 2019, and hundreds more that could be at risk."
    )


def test_ojs3_landingpage():
    # expected: reference test_html_metadata.py:118-138
    m = _biblio("first_monday_ojs3_landingpage.html")
    assert m["title"] == "Surveillance, stigma & sociotechnical design for HIV"
    assert m["doi"] == "10.5210/fm.v25i10.10274"
    assert m["contrib_names"] == ["Calvin Liang", "Jevan Alexander Hutson", "Os Keyes"]
    assert m["container_name"] == "First Monday"
    assert m["container_abbrev"] == "1"  # bad source metadata, kept verbatim
    assert m["container_issn"] == "1396-0466"
    assert m["release_date"] == "2020-09-10"  # source form: "2020/09/10"
    assert m["lang"] == "en"
    assert m["html_fulltext_url"] == (
        "https://firstmonday.org/ojs/index.php/fm/article/view/10274/9729"
    )
    assert m["release_type"] == "article-journal"
    assert m["abstract"].startswith(
        "Online dating and hookup platforms have fundamentally changed"
    )
    assert m["platform"] == "ojs3"


def test_dlib_article():
    # expected: reference test_html_metadata.py:141-150
    m = _biblio("dlib_05vanhyning.html")
    assert m["doi"] == "10.1045/may2017-vanhyning"
    assert m["release_date"] == "2017-05-15"


def test_meta_name_case_insensitive():
    # reference test_html_metadata.py:152-166
    snippet = (
        b'<html><head><meta name="DC.Citation.Issue" content="123"/></head>'
        b"<body>Hi.</body></html>"
    )
    m = extract_biblio_py(snippet, "http://example.org")
    assert m["issue"] == "123"


def test_resources_dlib_and_adblock():
    # reference test_html_metadata.py:172-189
    res = _resources(
        "dlib_05vanhyning.html", "http://www.dlib.org/dlib/may17/vanhyning/05vanhyning.html"
    )
    assert {"url": "http://www.dlib.org/style/style1.css", "type": "stylesheet"} in res
    assert all("/ga.js" not in r["url"] for r in res)


def test_resources_plos_custom_adblock():
    # reference test_html_metadata.py:191-201: crossmark-cdn custom rule
    res = _resources(
        "plos_one_article.html",
        "https://journals.plos.org/plosone/article?id=10.1371/journal.pone.0213978",
    )
    assert res, "plos page should yield sub-resources"
    assert all("crossmark-cdn.crossref.org" not in r["url"] for r in res)
    assert adblock_check_py("https://crossmark-cdn.crossref.org/widget/v2.0/widget.js")


def test_resources_remaining_fixtures_no_crash():
    # reference test_html_metadata.py:203-229: these pages must extract
    # without error and never emit adblocked resources
    for name, url in [
        ("first_monday_ojs3_landingpage.html", "https://firstmonday.org/blah/"),
        ("elife_article.html", "https://elife.org/blah/"),
        ("nature_article.html", "https://nature.com/blah/"),
        ("first_monday_ojs3_fulltext.html", "https://firstmonday.org/blah/"),
        ("genders_g58_fairlie.html", "https://www.genders.org/blah/"),
    ]:
        res = _resources(name, url)
        assert all(not adblock_check_py(r["url"]) for r in res)


# ---------------------------------------------------------------------------
# text extraction (C13) over the same real publisher pages: the
# extractor is deterministic, survives 1990s-layout markup (article
# wrapped in a search <form> — dlib), and captures known body passages
# ---------------------------------------------------------------------------

_EXTRACT_CASES = [
    # (fixture, a phrase from the article BODY, a string that must NOT leak)
    ("plos_one_article.html", "Click through the PLOS taxonomy", "function("),
    ("elife_article.html", "Abstract", "var "),
    ("nature_article.html", "limited support for CSS", "googletag"),
    ("peerj_oa_article.html", "The state of OA", "$(document)"),
    ("dlib_05vanhyning.html", "Archives through Crowdsourcing", "cgi-bin"),
    ("first_monday_ojs3_fulltext.html", "Online dating and hookup platforms", "javascript"),
    ("genders_g58_fairlie.html", "Reading Maeshowe", "stylesheet"),
]


def test_extract_text_real_publisher_pages():
    from sandcrawler_spark.functions.extract_text import extract_text_py

    here = os.path.dirname(os.path.abspath(__file__))
    for name, phrase, junk in _EXTRACT_CASES:
        blob = open(os.path.join(here, "files", name), "rb").read()
        t1 = extract_text_py(blob)
        assert phrase in t1, f"{name}: body phrase missing"
        assert junk not in t1, f"{name}: markup/script junk leaked"
        assert len(t1) > 1000, f"{name}: implausibly short extraction"
        assert t1 == extract_text_py(blob)  # deterministic


def test_extract_text_survives_unclosed_form_wrapper():
    from sandcrawler_spark.functions.extract_text import extract_text_py

    # the dlib shape: the whole article inside a <form>; controls are
    # still skipped, the text is not
    html = (b"<html><head><title>t</title></head><body>"
            b"<form action='/s'><input name='q'>"
            b"<select><option>All</option></select>"
            b"<p>The actual article text lives here.</p></form>"
            b"</body></html>")
    t = extract_text_py(html)
    assert "The actual article text lives here." in t
    assert "All" not in t  # select/option still skipped


def test_html_ingest_ojs3_fulltext_success():
    """Parity with the reference's own html-ingest expectation
    (/root/reference/python/tests/test_html_ingest.py:7-13): the
    first_monday OJS3 fulltext page extracts successfully. The
    reference needs a doc[106:] DOCTYPE hack for firstmonday.org
    (html_ingest.py:36-39); our parser takes the original bytes
    directly."""
    from sandcrawler_spark.functions.extract_text import extract_text_py

    raw = open(os.path.join(FILES, "first_monday_ojs3_fulltext.html"), "rb").read()
    text = extract_text_py(raw)
    assert text and len(text.split()) > 1000
    # the body, not the chrome: starts at the abstract
    assert text.startswith("Online dating and hookup platforms")


def test_teixml_body_word_count_parity():
    """word_count semantics parity with the reference's
    html_ingest.py:42-49 (teixml_body_text = ' '.join(body.itertext()),
    word_count = len(split())): our TEI distill of the reference's
    checked-in GROBID dump yields the same count the reference
    algorithm computes on the same XML (10945, derived once with
    ElementTree exactly as html_ingest.py does)."""
    from sandcrawler_spark.functions.hooks import teixml2json_py

    raw = open(
        os.path.join(FILES, "23b29ea36382680716be08fc71aa81bd226e8a85.xml"), "rb"
    ).read()
    info = teixml2json_py(raw)
    assert len(info["body"].split()) == 10945


def test_teixml_body_full_text_parity():
    """FULL-body parity with the reference algorithm, not just the
    count (VERDICT r4 item 6): recompute the reference's
    html_ingest.py:42-49 body text here with stdlib ElementTree
    exactly as the reference does (' '.join(body.itertext())) and
    compare whole strings.

    Documented divergence — whitespace only: itertext() preserves the
    XML's pretty-printing (newlines + indent runs between elements)
    while our distill joins text nodes with single spaces, so the raw
    strings differ ONLY in whitespace runs. Every reference consumer
    of this text goes through .split() (word_count, tokenization), so
    the divergence is invisible to them; we assert that precisely:
    the whitespace-collapsed strings are byte-identical AND the token
    sequences are element-for-element identical."""
    import re
    import xml.etree.ElementTree as ET

    from sandcrawler_spark.functions.hooks import teixml2json_py

    raw = open(
        os.path.join(FILES, "23b29ea36382680716be08fc71aa81bd226e8a85.xml"), "rb"
    ).read()
    ns = "{http://www.tei-c.org/ns/1.0}"
    body = ET.fromstring(raw).find(f".//{ns}body")
    ref_text = " ".join(body.itertext())
    ours = teixml2json_py(raw)["body"]
    # token-sequence identity (order and content of every word)
    assert ours.split() == ref_text.split()
    # whitespace-collapsed byte identity (the documented divergence is
    # ONLY in whitespace runs; anything else fails here)
    collapse = lambda s: re.sub(r"\s+", " ", s).strip()  # noqa: E731
    assert collapse(ours) == collapse(ref_text)
