"""HTML biblio metadata + fulltext-URL + scope extraction.

Role parity with the reference's selectolax-based extractors:
  - html_extract_biblio     (/root/reference/python/sandcrawler/
    html_metadata.py:475-540; meta-tag pattern families 25-391)
  - html_extract_fulltext_url (html_metadata.py:436-473) and the
    landing-page -> PDF-link heuristics (html.py:15-296)
  - scope/platform guess    (html_ingest.py:187-314)

Reimplemented from scratch on the stdlib HTMLParser: a single pass
collects <meta name/property content> pairs and <a href> candidates;
a priority cascade then fills the BiblioMetadata struct. All of it is
one vectorized pandas UDF returning a struct column (one Arrow
crossing per body, no per-row Python in the plan).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.functions.extract_text import decode_body_py, extract_text_py

# meta-tag priority cascades (name/property, lowercased)
_TITLE_KEYS = ("citation_title", "eprints.title", "prism.title", "bepress_citation_title", "og:title", "dc.title")
_DOI_KEYS = ("citation_doi", "bepress_citation_doi", "prism.doi", "dc.identifier.doi", "dc.identifier")
_AUTHOR_KEYS = ("citation_author", "bepress_citation_author", "eprints.creators_name", "dc.creator", "dc.contributor")
_DATE_KEYS = ("citation_publication_date", "citation_date", "prism.publicationdate", "dc.date")
_PDF_KEYS = ("citation_pdf_url", "bepress_citation_pdf_url", "eprints.document_url")
_XML_KEYS = ("citation_xml_url",)
_GENERATOR_KEYS = ("generator",)

_PLATFORM_BY_GENERATOR = {
    "open journal systems": "ojs",
    "wordpress": "wordpress",
    "drupal": "drupal",
    "dspace": "dspace",
}


class _HeadMetaParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, list[str]] = {}
        self.links: list[tuple[str, str]] = []  # (href, anchor-text)
        self._a_href: str | None = None
        self._a_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "meta":
            key = (d.get("name") or d.get("property") or "").strip().lower()
            content = (d.get("content") or "").strip()
            if key and content:
                self.meta.setdefault(key, []).append(content)
        elif tag == "a" and d.get("href"):
            self._a_href = d["href"]
            self._a_text = []

    def handle_data(self, data):
        if self._a_href is not None:
            self._a_text.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._a_href is not None:
            self.links.append((self._a_href, " ".join("".join(self._a_text).split()).lower()))
            self._a_href = None
            self._a_text = []


def _first(meta: dict[str, list[str]], keys) -> str | None:
    for k in keys:
        if k in meta:
            return meta[k][0]
    return None


def _clean_doi(raw: str | None) -> str | None:
    if not raw:
        return None
    raw = raw.strip().lower()
    for pre in ("doi:", "https://doi.org/", "http://doi.org/", "http://dx.doi.org/", "https://dx.doi.org/"):
        if raw.startswith(pre):
            raw = raw[len(pre):]
    return raw if raw.startswith("10.") and "/" in raw else None


def extract_biblio_py(blob: bytes, base_url: str = "") -> dict:
    """HTML bytes -> biblio dict (title/doi/authors/date/fulltext urls/
    platform/next-hop pdf link)."""
    p = _HeadMetaParser()
    try:
        p.feed(decode_body_py(blob))
        p.close()
    except Exception:
        pass
    meta = p.meta
    pdf_url = _first(meta, _PDF_KEYS)
    if not pdf_url:
        # landing-page heuristic: anchor whose target or text smells like a PDF
        for href, text in p.links:
            if href.lower().endswith(".pdf") or "download pdf" in text or text == "pdf":
                pdf_url = href
                break
    if pdf_url and base_url:
        pdf_url = urljoin(base_url, pdf_url)
    gen = (_first(meta, _GENERATOR_KEYS) or "").lower()
    platform = None
    for marker, name in _PLATFORM_BY_GENERATOR.items():
        if marker in gen:
            platform = name
            break
    return {
        "title": _first(meta, _TITLE_KEYS),
        "doi": _clean_doi(_first(meta, _DOI_KEYS)),
        "contrib_names": meta.get("citation_author") or meta.get("dc.creator") or [],
        "release_date": _first(meta, _DATE_KEYS),
        "pdf_fulltext_url": pdf_url,
        "xml_fulltext_url": _first(meta, _XML_KEYS),
        "platform": platform,
    }


def guess_scope_py(blob: bytes, word_count: int | None = None, pdf_url: str | None = None) -> str:
    """Scope classification (html_ingest.py:228-314 semantics, reduced
    to the decision boundaries our pipeline routes on)."""
    if word_count is None:
        word_count = len(extract_text_py(blob).split())
    if word_count >= 50:
        return "article-fulltext"
    if pdf_url:
        return "landingpage"
    if word_count < 10:
        return "blocked" if b"cookie" in blob[:2048].lower() else "unknown"
    return "unknown"


BIBLIO_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("contrib_names", T.ArrayType(T.StringType())),
        T.StructField("release_date", T.StringType()),
        T.StructField("pdf_fulltext_url", T.StringType()),
        T.StructField("xml_fulltext_url", T.StringType()),
        T.StructField("platform", T.StringType()),
        T.StructField("scope", T.StringType()),
    ]
)


@F.pandas_udf(BIBLIO_SCHEMA)
def biblio_udf(blob: pd.Series, url: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
    rows = []
    for b, u in zip(blob, url):
        if b is None:
            rows.append({f.name: None for f in BIBLIO_SCHEMA.fields})
            continue
        bb = bytes(b)
        d = extract_biblio_py(bb, u or "")
        d["scope"] = guess_scope_py(bb, pdf_url=d["pdf_fulltext_url"])
        rows.append(d)
    return pd.DataFrame(rows, columns=[f.name for f in BIBLIO_SCHEMA.fields])


def with_biblio(df: DataFrame, blob_col: str = "html", url_col: str = "url") -> DataFrame:
    return df.withColumn("biblio", biblio_udf(F.col(blob_col), F.col(url_col)))
