"""Per-publisher golden fixtures for the biblio / fulltext-URL /
platform / scope / sub-resource extractors — the reference's
tests/test_html_metadata.py strategy: one synthetic page per publisher
shape, asserting the exact extracted fields.
"""

from __future__ import annotations

from sandcrawler_spark.functions.biblio import (
    _collect,
    adblock_check_py,
    clean_doi_py,
    extract_biblio_py,
    extract_resources_py,
    guess_platform_py,
    guess_scope_py,
    landing_page_fulltext_py,
    parse_date_py,
)


def _biblio(html: str, url: str = "https://example.org/article/1") -> dict:
    return extract_biblio_py(html.encode("utf-8"), url)


def _trick(url: str, html: str = "") -> dict:
    return landing_page_fulltext_py(url, html, _collect(html))


# ---------------------------------------------------------------------------
# meta-tag family cascade
# ---------------------------------------------------------------------------

def test_highwire_family():
    d = _biblio("""<html><head>
      <meta name="citation_title" content="T1">
      <meta name="citation_doi" content="10.5/x1">
      <meta name="citation_pmid" content="12345">
      <meta name="citation_journal_title" content="J1">
      <meta name="citation_journal_abbrev" content="J. One">
      <meta name="citation_issn" content="1234-5678">
      <meta name="citation_volume" content="3">
      <meta name="citation_issue" content="2">
      <meta name="citation_firstpage" content="10">
      <meta name="citation_lastpage" content="20">
      <meta name="citation_publisher" content="Pub">
      <meta name="citation_language" content="en">
      <meta name="citation_isbn" content="978-3-16-148410-0">
      </head></html>""")
    assert d["title"] == "T1" and d["doi"] == "10.5/x1" and d["pmid"] == "12345"
    assert d["container_name"] == "J1" and d["container_abbrev"] == "J. One"
    assert d["container_issn"] == "1234-5678"
    assert (d["volume"], d["issue"]) == ("3", "2")
    assert d["pages"] == "10-20" and d["first_page"] == "10" and d["last_page"] == "20"
    assert d["publisher"] == "Pub" and d["lang"] == "en"
    assert d["isbn"] == "978-3-16-148410-0"


def test_dublin_core_family():
    d = _biblio("""<html><head>
      <meta name="DC.Title" content="DC Title">
      <meta name="DC.Creator" content="A One">
      <meta name="DC.Creator" content="B Two">
      <meta name="DC.Identifier" scheme="DOI" content="10.7/dc1">
      <meta name="DC.Date" content="1998-07-22">
      <meta name="DC.Publisher" content="DC Pub">
      <meta name="DC.Language" content="pt">
      <meta name="DC.Source" content="DC Container">
      </head></html>""")
    assert d["title"] == "DC Title"
    assert d["contrib_names"] == ["A One", "B Two"]
    assert d["doi"] == "10.7/dc1"
    assert d["release_date"] == "1998-07-22" and d["release_year"] == 1998
    assert d["publisher"] == "DC Pub" and d["lang"] == "pt"
    assert d["container_name"] == "DC Container"


def test_og_family_and_priority():
    # citation_* beats og:* when both present; og fills otherwise
    d = _biblio("""<html><head>
      <meta property="og:title" content="OG Title">
      <meta property="og:site_name" content="OG Site">
      <meta property="og:description" content="OG abstract here">
      </head></html>""")
    assert d["title"] == "OG Title"
    assert d["container_name"] == "OG Site"
    assert d["abstract"] == "OG abstract here"
    d2 = _biblio("""<html><head>
      <meta name="citation_title" content="Real Title">
      <meta property="og:title" content="OG Title">
      </head></html>""")
    assert d2["title"] == "Real Title"


def test_eprints_family():
    d = _biblio("""<html><head>
      <meta name="eprints.title" content="EP Title">
      <meta name="eprints.creators_name" content="Creator, One">
      <meta name="eprints.publication" content="EP Journal">
      <meta name="eprints.date" content="2005-11-01">
      <meta name="eprints.id_number" content="doi:10.9/ep5">
      <meta name="eprints.document_url" content="https://files.example.org/ep.pdf">
      </head></html>""")
    assert d["title"] == "EP Title"
    assert d["contrib_names"] == ["Creator, One"]
    assert d["container_name"] == "EP Journal"
    assert d["release_date"] == "2005-11-01"
    assert d["doi"] == "10.9/ep5"  # raw_identifiers fallback
    assert d["pdf_fulltext_url"] == "https://files.example.org/ep.pdf"


def test_prism_and_bepress_families():
    d = _biblio("""<html><head>
      <meta name="prism.title" content="Prism Title">
      <meta name="prism.publicationName" content="Prism Pub">
      <meta name="prism.volume" content="9">
      <meta name="prism.issn" content="9999-0000">
      <meta name="prism.publicationDate" content="2014/02/03">
      </head></html>""")
    assert d["title"] == "Prism Title" and d["container_name"] == "Prism Pub"
    assert d["volume"] == "9" and d["container_issn"] == "9999-0000"
    assert d["release_date"] == "2014-02-03"
    b = _biblio("""<html><head>
      <meta name="bepress_citation_title" content="BP Title">
      <meta name="bepress_citation_author" content="BP Author">
      <meta name="bepress_citation_doi" content="10.31/bp">
      <meta name="bepress_citation_pdf_url" content="/bp.pdf">
      </head></html>""", "https://works.bepress.example.org/item/7/")
    assert b["title"] == "BP Title" and b["contrib_names"] == ["BP Author"]
    assert b["doi"] == "10.31/bp"
    assert b["pdf_fulltext_url"] == "https://works.bepress.example.org/bp.pdf"


def test_release_type_and_references():
    d = _biblio("""<html><head>
      <meta name="citation_article_type" content="Research Article">
      <meta name="citation_reference" content="ref one">
      <meta name="citation_reference" content="ref two">
      </head></html>""")
    assert d["release_type"] == "article-journal"
    assert d["raw_references"] == ["ref one", "ref two"]


def test_doi_cleaning():
    assert clean_doi_py("doi:10.1/a") == "10.1/a"
    assert clean_doi_py("https://doi.org/10.1/B") == "10.1/B"  # case preserved (ref html_metadata.py:512)
    assert clean_doi_py("DOI:10.7554/eLife.44753") == "10.7554/eLife.44753"
    assert clean_doi_py("not-a-doi") is None
    assert clean_doi_py("10.nope") is None


def test_date_parsing_table():
    assert parse_date_py("2020-03-05") == "2020-03-05"
    assert parse_date_py("2020/3/5") == "2020-03-05"
    assert parse_date_py("20200305") == "2020-03-05"
    assert parse_date_py("5 March 2020") == "2020-03-05"
    assert parse_date_py("March 5, 2020") == "2020-03-05"
    assert parse_date_py("2020-03-05T10:00:00Z") == "2020-03-05"
    # month-year / ISO-partial -> deterministic first-of-month
    assert parse_date_py("March 2020") == "2020-03-01"
    assert parse_date_py("2020-03") == "2020-03-01"
    assert parse_date_py("2020/09") == "2020-09-01"
    # locale month names (de/es/pt/fr)
    assert parse_date_py("15 märz 2020") == "2020-03-15"
    assert parse_date_py("mayo 2019") == "2019-05-01"
    assert parse_date_py("1 outubro 2018") == "2018-10-01"
    assert parse_date_py("décembre 2021") == "2021-12-01"
    # European dotted D.M.Y
    assert parse_date_py("15.05.2017") == "2017-05-15"
    # ordinal day suffixes (r4)
    assert parse_date_py("March 3rd, 2020") == "2020-03-03"
    assert parse_date_py("21st March 2020") == "2020-03-21"
    assert parse_date_py("June 22nd, 1941") == "1941-06-22"
    assert parse_date_py("4th July 1776") == "1776-07-04"
    # it / nl locale months (r4)
    assert parse_date_py("12 gennaio 2019") == "2019-01-12"
    assert parse_date_py("dicembre 2020") == "2020-12-01"
    assert parse_date_py("15 augustus 2018") == "2018-08-15"
    assert parse_date_py("maart 2021") == "2021-03-01"
    # garbage / year-only still rejected
    assert parse_date_py("2020") is None
    assert parse_date_py("2020-13-40") is None
    assert parse_date_py("sometime recently") is None
    assert parse_date_py("thisth") is None  # suffix strip only after a digit


def test_sibling_combinator_pdf_pattern():
    # ".AbsPdfFigTab img[src='images/pdf-icon.jpg'] + a" (scielo-style
    # pages, html_metadata.py:362-369): needs the adjacency the flat
    # collector now keeps
    html = """<html><body>
      <div class="AbsPdfFigTab">
        <img src="images/pdf-icon.jpg"><a href="/journal/create_pdf.aspx?id=1">PDF</a>
      </div></body></html>"""
    d = _biblio(html, url="http://www.aed.example.cn/nyzyyhjxb/html/2018/4/20180408.htm")
    assert d["pdf_fulltext_url"] == "http://www.aed.example.cn/journal/create_pdf.aspx?id=1"
    assert d["pdf_technique"] == "PDF URL link"
    # no pdf-icon sibling -> the sibling pattern must NOT fire (the
    # generic anchor-text fallback may still catch the 'PDF' anchor,
    # but via its own technique)
    html2 = html.replace('src="images/pdf-icon.jpg"', 'src="images/other.png"')
    d2 = _biblio(html2, url="http://www.aed.example.cn/nyzyyhjxb/html/2018/4/20180408.htm")
    assert d2["pdf_technique"] != "PDF URL link"


# ---------------------------------------------------------------------------
# fulltext-URL pattern DB
# ---------------------------------------------------------------------------

def test_pdf_url_skip_and_self_link():
    # doi.org targets are skipped
    d = _biblio("""<html><head>
      <meta name="citation_pdf_url" content="https://doi.org/10.1/loop">
      </head></html>""")
    assert d["pdf_fulltext_url"] is None
    # self link only as last resort
    d2 = _biblio("""<html><head>
      <meta name="citation_pdf_url" content="https://example.org/article/1">
      </head></html>""", "https://example.org/article/1")
    assert d2["pdf_fulltext_url"] == "https://example.org/article/1"
    d3 = _biblio("""<html><head>
      <meta name="citation_pdf_url" content="https://example.org/article/1">
      <meta name="bepress_citation_pdf_url" content="https://example.org/real.pdf">
      </head></html>""", "https://example.org/article/1")
    assert d3["pdf_fulltext_url"] == "https://example.org/real.pdf"


def test_sage_show_pdf_link():
    d = _biblio("""<html><head></head><body>
      <a class="show-pdf" href="/doi/pdf/10.1177/123">PDF</a>
      </body></html>""", "https://journals.sagepub.com/doi/10.1177/123")
    assert d["pdf_fulltext_url"] == "https://journals.sagepub.com/doi/pdf/10.1177/123"
    assert d["pdf_technique"] == "SAGE/UTP show-pdf link"


def test_ojs_pdf_download_link():
    d = _biblio("""<html><head></head><body>
      <a id="pdfDownloadLink" href="/index.php/rep/article/download/35503/32336">Download</a>
      </body></html>""", "http://www.revistas.unam.mx/index.php/rep/article/view/35503")
    assert d["pdf_fulltext_url"] == "http://www.revistas.unam.mx/index.php/rep/article/download/35503/32336"


def test_elife_and_embed_patterns():
    d = _biblio("""<html><body>
      <a data-download-type="pdf-article" href="/articles/59841/download/x.pdf">pdf</a>
      </body></html>""", "https://elifesciences.org/articles/59841")
    assert d["pdf_fulltext_url"] == "https://elifesciences.org/articles/59841/download/x.pdf"
    e = _biblio("""<html><body>
      <embed type="application/pdf" src="/pdfs/doc.pdf"></embed>
      </body></html>""", "http://host.example.com/page")
    assert e["pdf_fulltext_url"] == "http://host.example.com/pdfs/doc.pdf"
    assert e["pdf_technique"] == "PDF embed"


def test_xml_and_html_fulltext_patterns():
    d = _biblio("""<html><head>
      <link rel="alternate" type="application/xml" href="/xml/full.xml">
      <link rel="alternate" type="text/html" href="/html/full.html">
      </head></html>""", "https://example.org/abs/1")
    assert d["xml_fulltext_url"] == "https://example.org/xml/full.xml"
    assert d["html_fulltext_url"] == "https://example.org/html/full.html"
    # OJS gallery XML
    g = _biblio("""<html><body>
      <a class="obj_galley_link" href="/article/viewXML/5/10">XML</a>
      </body></html>""", "https://journal.example.org/article/view/5")
    assert g["xml_fulltext_url"] == "https://journal.example.org/article/viewXML/5/10"


# ---------------------------------------------------------------------------
# landing-page publisher heuristics
# ---------------------------------------------------------------------------

def test_arxiv_osf_jmir_protocols_cogentoa_degruyter():
    assert _trick("https://arxiv.org/abs/2001.00001")["pdf_url"] == "https://arxiv.org/pdf/2001.00001"
    assert _trick("https://osf.io/8phvx/")["next_url"] == "https://osf.io/8phvx/download"
    assert _trick("https://osf.io/8phvx")["next_url"] == "https://osf.io/8phvx/download"
    assert _trick("https://mhealth.jmir.org/2020/7/e17891/")["pdf_url"].endswith("/pdf")
    assert _trick("https://www.protocols.io/view/flow-mgdc3s6")["pdf_url"].endswith(".pdf")
    assert _trick("https://www.cogentoa.com/article/10.1080/1.2")["pdf_url"].endswith(".pdf")
    assert _trick(
        "https://www.degruyter.com/view/books/9783486594621/x/x.xml"
    )["pdf_url"] == "https://www.degruyter.com/downloadpdf/books/9783486594621/x/x.pdf"


def test_researchsquare_and_ieeexplore_regex():
    body = '{"url":"https://assets.researchsquare.com/files/4a57970e/v2/Manuscript.pdf"}'
    t = _trick("https://www.researchsquare.com/article/rs-1/v2", body)
    assert t["pdf_url"].endswith("/Manuscript.pdf") and t["release_stage"] == "manuscript"
    body2 = '{"pdfPath":"/iel7/6287639/8600701/08730316.pdf"}'
    t2 = _trick("https://ieeexplore.ieee.org/document/8730316", body2)
    assert t2["pdf_url"] == "https://ieeexplore.ieee.org/iel7/6287639/8600701/08730316.pdf"
    assert t2["release_stage"] == "published"


def test_ovid_sciencedirect_and_linkinghub():
    body = 'var journalURL = "https://journals.lww.com/co-urology/fulltext/10.1097/X";'
    assert _trick("https://insights.ovid.com/crossref?an=1", body)["next_url"].startswith(
        "https://journals.lww.com/"
    )
    body2 = "window.location = 'https://pdf.sciencedirectassets.com/a/main.pdf?x=1';"
    assert _trick(
        "https://www.sciencedirect.com/science/article/pii/S1/pdfft?md5=1.pdf", body2
    )["pdf_url"].startswith("https://pdf.sciencedirectassets.com/")
    html = '<input type="hidden" name="redirectURL" value="http%3A%2F%2Fjournal.example.com%2Fretrieve%2Fpii%2FS1?via%3Dihub" id="redirectURL"/>'
    t = _trick("https://linkinghub.elsevier.com/retrieve/pii/S1", html)
    assert t["next_url"] == "http://journal.example.com/retrieve/pii/S1"


def test_ahajournals_wiley_eperiodica_rwth():
    body = '<a href="/doi/pdf/10.1161/circ.110.19.2977?download=true">PDF</a>'
    t = _trick("https://www.ahajournals.org/doi/10.1161/circ.110.19.2977", body)
    assert t["pdf_url"] == "https://www.ahajournals.org/doi/pdf/10.1161/circ.110.19.2977?download=true"
    t2 = _trick("https://onlinelibrary.wiley.com/doi/pdf/10.1111/x", "see /doi/pdfdirect/ here")
    assert t2["next_url"] == "https://onlinelibrary.wiley.com/doi/pdfdirect/10.1111/x"
    url = "https://www.e-periodica.ch/digbib/view?pid=bts-002:1909:35#14"
    t3 = _trick(url, "https://www.e-periodica.ch/cntmng?pid=bts-002:1909:35")
    assert t3["pdf_url"] == "https://www.e-periodica.ch/cntmng?pid=bts-002:1909:35"
    rw = "https://publications.rwth-aachen.de/record/801155"
    t4 = _trick(rw, f"{rw}/files/801155.pdf")
    assert t4["pdf_url"] == f"{rw}/files/801155.pdf"


def test_figshare_json_and_cnki_and_guess():
    html = '<script id="app-data" type="text/json">{"article": {"exportPdfDownloadUrl": "https://s3.example.com/item.pdf"}}</script>'
    t = _trick("https://chemrxiv.org/articles/Biradical/10101419", html)
    assert t["pdf_url"] == "https://s3.example.com/item.pdf"
    html2 = '<a id="pdfDown" href="/gzbt/download.aspx?filename=x&amp;dflag=pdfdown">PDF Download</a>'
    t2 = _trick("http://en.gzbd.cnki.net/KCMS/detail/detail.aspx?FileName=H1", html2)
    assert t2["pdf_url"].startswith("http://en.gzbd.cnki.net/gzbt/download.aspx")
    url3 = "http://journal.example.org/item/55"
    t3 = _trick(url3, f'say <a href="x">{url3}.pdf</a>')
    assert t3 == {"pdf_url": url3 + ".pdf", "technique": "guess-url-plus-pdf"}


# ---------------------------------------------------------------------------
# platform + scope
# ---------------------------------------------------------------------------

def test_platform_guesses():
    def plat(url, html):
        return guess_platform_py(url, _collect(html), html)

    assert plat("https://x.org/", '<meta name="generator" content="Open Journal Systems 3.1.2">') == "ojs3"
    assert plat("https://x.org/", '<meta name="generator" content="Open Journal Systems 2.4">') == "ojs"
    assert plat("https://x.org/", '<body id="pkp-common-openJournalSystems">') == "ojs"
    assert plat("https://x.org/", 'powered by <a target="blank" href="http://pkp.sfu.ca/ojs/">PKP OJS</a>') == "ojs"
    assert plat("https://x.org/", 'Powered by <a target="_blank" href="http://arphahub.com">ARPHA</a>') == "arpha"
    assert plat("https://x.org/", '<link type="image/x-icon" href="https://cdn.journalssystem.com/i.ico">') == "journalssystem.com"
    assert plat("http://www.scielo.br/scielo.php?script=sci_arttext", "") == "scielo"
    assert plat("https://x.org/", '<meta name="generator" content="WordPress 5.1">') == "wordpress"
    assert plat("https://x.org/", "<p>plain</p>") is None


def test_scope_tree():
    def scope(url, html, wc, biblio=None):
        return guess_scope_py(url, _collect(html), html, wc, biblio)

    assert scope("https://x.org/cookieAbsent", "", 100) == "blocked-cookie"
    assert scope("https://x.org/showcaptcha.asp?retpath=1", "", 100) == "blocked-captcha"
    assert scope("http://scielo.br/x?script=sci_arttext", "", 5) == "article-fulltext"
    assert scope("http://scielo.br/x?script=sci_abstract", "", 5000) == "landingpage"
    assert scope("https://x.org/a", "", 5) == "stub"
    assert scope("https://x.org/a", "", 5000) == "article-fulltext"
    assert scope("https://x.org/a", "", 500) == "unknown"
    assert scope("https://x.org/a", "<center><h1>403 Forbidden</h1></center>", 500) == "blocked-forbidden"
    # html_fulltext_url routing
    assert scope("https://x.org/a", "", 500, {"html_fulltext_url": "https://x.org/a"}) == "article-fulltext"
    assert scope("https://x.org/a", "", 500, {"html_fulltext_url": "https://x.org/b"}) == "landingpage"
    # OJS: has biblio title but thin text -> landingpage
    ojs = '<meta name="generator" content="Open Journal Systems">'
    assert scope("https://j.org/article/view/5", ojs, 300, {"title": "T"}) == "landingpage"
    assert scope("https://j.org/article/view/5", ojs, 2000, {"title": "T"}) == "fulltext"
    assert scope("https://j.org/article/view/5", ojs, 800, {}) == "fulltext"
    assert scope("https://j.org/other", ojs, 100, {}) == "other"


# ---------------------------------------------------------------------------
# sub-resources + adblock
# ---------------------------------------------------------------------------

def test_resources_extraction_and_adblock():
    html = b"""<html><head>
      <link rel="stylesheet" href="/css/site.css">
      <script src="/js/app.js"></script>
      <script src="https://fonts.googleapis.com/css?family=X"></script>
      </head><body>
      <img src="figs/f1.png"><img src="figs/f1.png">
      <audio src="/a.mp3"></audio>
      <video src="/v.mp4"></video>
      <source src="/v.webm">
      <track src="/v.vtt">
      <iframe src="https://platform.twitter.com/widgets.js"></iframe>
      <iframe src="/inner.html"></iframe>
      <embed src="/e.swf">
      <img src="/favicon.ico">
      </body></html>"""
    res = extract_resources_py(html, "https://journal.example.org/article/9/")
    by_type = {}
    for r in res:
        by_type.setdefault(r["type"], []).append(r["url"])
    assert by_type["stylesheet"] == ["https://journal.example.org/css/site.css"]
    assert by_type["script"] == ["https://journal.example.org/js/app.js"]  # fonts blocked
    assert by_type["image"] == ["https://journal.example.org/article/9/figs/f1.png"]  # deduped, favicon blocked
    assert by_type["audio"] == ["https://journal.example.org/a.mp3"]
    assert set(by_type["media"]) == {
        "https://journal.example.org/v.mp4",
        "https://journal.example.org/v.webm",
        "https://journal.example.org/v.vtt",
        "https://journal.example.org/e.swf",
    }
    assert by_type["subdocument"] == ["https://journal.example.org/inner.html"]  # twitter blocked


def test_adblock_rules():
    assert adblock_check_py("https://fonts.googleapis.com/css")
    assert adblock_check_py("https://sub.recaptcha.net/x.js")
    assert adblock_check_py("https://x.org/favicon.ico")
    assert adblock_check_py("https://apis.google.com/js/plusone.js")
    assert adblock_check_py("https://journals.plos.org/resource/img/icon.x.16.png")
    assert not adblock_check_py("https://journal.example.org/js/app.js")


def test_adblock_easylist_subset_ad_heavy_page():
    """VERDICT r3 item 8: the easylist-subset domain-anchor table
    (adblock_data.py) drops ad/analytics/replay/chumbox resources on
    an ad-heavy page while keeping the article's own assets."""
    from sandcrawler_spark.functions.biblio import adblock_check_py, extract_resources_py

    ad_urls = [
        "https://securepubads.g.doubleclick.net/tag/js/gpt.js",
        "https://c.amazon-adsystem.com/aax2/apstag.js",
        "https://cdn.taboola.com/libtrc/site/loader.js",
        "https://widgets.outbrain.com/outbrain.js",
        "https://static.hotjar.com/c/hotjar-1.js",
        "https://edge.fullstory.com/s/fs.js",
        "https://cdn.segment.com/analytics.js/v1/x/analytics.min.js",
        "https://sb.scorecardresearch.com/beacon.js",
        "https://connect.facebook.net/en_US/fbevents.js",
        "https://www.facebook.com/tr?id=1&ev=PageView",
        "https://mc.yandex.ru/metrika/tag.js",
        "https://ads.pubmatic.com/AdServer/js/pwt/1/pwt.js",
        "https://js-agent.newrelic.com/nr-1216.min.js",
        "https://tags.crwdcntrl.net/c/123/cc.js",
        "https://example.org/pagead/show_ads.js",
    ]
    keep_urls = [
        "https://journal.example.org/article/main.css",
        "https://journal.example.org/figures/fig1.png",
        "https://cdn.journal.example.org/static/reader.js",
        "https://journal.example.org/downloads/supplement.pdf",
    ]
    for u in ad_urls:
        assert adblock_check_py(u), f"should drop: {u}"
    for u in keep_urls:
        assert not adblock_check_py(u), f"should keep: {u}"

    body = "<html><head>" + "".join(
        f'<script src="{u}"></script>' for u in ad_urls
    ) + '<link rel="stylesheet" href="/article/main.css">' + "</head><body>" + "".join(
        f'<img src="{u}">' for u in ["/figures/fig1.png"]
    ) + "</body></html>"
    res = extract_resources_py(body.encode(), "https://journal.example.org/x")
    urls = [r["url"] for r in res]
    assert "https://journal.example.org/article/main.css" in urls
    assert "https://journal.example.org/figures/fig1.png" in urls
    assert not any("doubleclick" in u or "taboola" in u or "hotjar" in u for u in urls)
