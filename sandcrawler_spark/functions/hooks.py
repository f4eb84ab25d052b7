"""External-service extraction hooks (GROBID, pdftrio) + TEI-XML parse.

Role parity:
  - GROBID HTTP client        (/root/reference/python/sandcrawler/grobid.py:14-78)
  - pdftrio classifier client (pdftrio.py:15-67)
  - TEI-XML -> JSON distill   (python/grobid2json.py:36-186)

The reference POSTs bodies to external services; its own tests mock the
HTTP layer (`responses`, tests/test_grobid.py) — the pipeline contract
is the RESULT SHAPE, not the transport. Here the transport is a
pluggable callable (`service=`): production injects a real HTTP call,
tests and this sandbox use the deterministic stub. The Spark tier is
one vectorized pandas UDF per hook; bodies cross Arrow once.

Size caps mirror the reference's guards (12 MB GROBID body cap,
grobid.py:53-58; oversize -> error status, never an exception).
"""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GROBID_MAX_BYTES = 12 * 1024 * 1024  # grobid.py:53-58
_TEI_NS = "{http://www.tei-c.org/ns/1.0}"


# ---------------------------------------------------------------------------
# TEI-XML -> metadata dict (C12, grobid2json.py semantics, stdlib ET)
# ---------------------------------------------------------------------------

_XML_NS = "{http://www.w3.org/XML/1998/namespace}"


def _tei_authors(elem) -> list[dict]:
    """Author dicts with given_name/surname/affiliation (grobid2json.py
    all_authors, 36-72): authors WITHOUT a persName are skipped (the
    reference's element-truthiness check), affiliation orgNames keyed by
    their type attr, address children mapped tag -> text."""
    if elem is None:
        return []
    out = []
    for author in elem.findall(f".//{_TEI_NS}author"):
        pn = author.find(f"./{_TEI_NS}persName")
        # mirror the reference's `if not pn` (childless persName skipped)
        if pn is None or len(pn) == 0:
            continue
        given = pn.findtext(f"./{_TEI_NS}forename") or None
        surname = pn.findtext(f"./{_TEI_NS}surname") or None
        obj: dict = {"name": " ".join(pn.itertext())}
        if given:
            obj["given_name"] = given
        if surname:
            obj["surname"] = surname
        ae = author.find(f"./{_TEI_NS}affiliation")
        if ae is not None and len(ae):
            affiliation: dict = {}
            for on in ae.findall(f"./{_TEI_NS}orgName"):
                if on.get("type"):
                    affiliation[on.get("type")] = on.text
            addr = ae.find(f"./{_TEI_NS}address")
            if addr is not None and len(addr):
                address = {t.tag.split("}")[-1]: t.text for t in addr}
                if address:
                    affiliation["address"] = address
            obj["affiliation"] = affiliation
        out.append(obj)
    return out


def _tei_journal(elem) -> dict:
    """Container metadata from the header biblStruct (grobid2json.py
    journal_info, 75-94); empty/null values dropped."""
    j = {
        "name": elem.findtext(f".//{_TEI_NS}monogr/{_TEI_NS}title"),
        "publisher": elem.findtext(f".//{_TEI_NS}publicationStmt/{_TEI_NS}publisher") or None,
        "issn": elem.findtext(f'.//{_TEI_NS}idno[@type="ISSN"]'),
        "eissn": elem.findtext(f'.//{_TEI_NS}idno[@type="eISSN"]'),
        "volume": elem.findtext(f'.//{_TEI_NS}biblScope[@unit="volume"]'),
        "issue": elem.findtext(f'.//{_TEI_NS}biblScope[@unit="issue"]'),
    }
    return {k: v for k, v in j.items() if v}


def _tei_citation(elem) -> dict:
    """One back-matter reference (grobid2json.py biblio_info, 97-126),
    including its quirks: `journal` key only present when the monogr
    title exists, `date` is False (not None) when the published date
    element is absent, trailing '.Lastaccessed' stripped from ptr urls."""
    ref: dict = {"id": elem.attrib.get(f"{_XML_NS}id")}
    ref["title"] = elem.findtext(f".//{_TEI_NS}analytic/{_TEI_NS}title")
    other_title = elem.findtext(f".//{_TEI_NS}monogr/{_TEI_NS}title")
    if other_title:
        if ref["title"]:
            ref["journal"] = other_title
        else:
            ref["journal"] = None
            ref["title"] = other_title
    ref["authors"] = _tei_authors(elem)
    ref["publisher"] = elem.findtext(f".//{_TEI_NS}publicationStmt/{_TEI_NS}publisher") or None
    date = elem.find(f'.//{_TEI_NS}date[@type="published"]')
    ref["date"] = (date is not None) and date.attrib.get("when")
    ref["volume"] = elem.findtext(f'.//{_TEI_NS}biblScope[@unit="volume"]')
    ref["issue"] = elem.findtext(f'.//{_TEI_NS}biblScope[@unit="issue"]')
    ptr = elem.find(f".//{_TEI_NS}ptr[@target]")
    if ptr is not None:
        url = ptr.attrib["target"]
        if url.endswith(".Lastaccessed"):
            url = url.replace(".Lastaccessed", "")
        ref["url"] = url
    else:
        ref["url"] = None
    return ref


def teixml2json_py(tei_xml: str | bytes, encumbered: bool = True) -> dict:
    """Full GROBID TEI distill, output-compatible with the reference's
    grobid2json.teixml2json (grobid2json.py:129-186): header metadata +
    grobid version/timestamp, author affiliations, journal block,
    citations with context, language code, and (when encumbered=True)
    abstract/body/acknowledgement/annex. Falsy top-level keys dropped,
    like the reference."""
    root = ET.fromstring(tei_xml)
    info: dict = {}
    header = root.find(f".//{_TEI_NS}teiHeader")
    if header is None:
        raise ValueError("XML does not look like TEI format")
    apps = header.findall(f".//{_TEI_NS}appInfo/{_TEI_NS}application")
    info["grobid_version"] = apps[0].attrib["version"].strip()
    info["grobid_timestamp"] = apps[0].attrib["when"].strip()
    info["title"] = header.findtext(f".//{_TEI_NS}analytic/{_TEI_NS}title")
    info["authors"] = _tei_authors(header.find(f".//{_TEI_NS}sourceDesc/{_TEI_NS}biblStruct"))
    info["journal"] = _tei_journal(header)
    date = header.find(f'.//{_TEI_NS}date[@type="published"]')
    info["date"] = (date is not None) and date.attrib.get("when")
    info["fatcat_release"] = header.findtext(f'.//{_TEI_NS}idno[@type="fatcat"]')
    info["doi"] = header.findtext(f'.//{_TEI_NS}idno[@type="DOI"]')
    if info["doi"]:
        info["doi"] = info["doi"].lower()
    refs = []
    for i, bs in enumerate(root.findall(f".//{_TEI_NS}listBibl/{_TEI_NS}biblStruct")):
        ref = _tei_citation(bs)
        ref["index"] = i
        refs.append(ref)
    info["citations"] = refs
    text = root.find(f".//{_TEI_NS}text")
    if text is not None and len(text) and text.attrib.get(f"{_XML_NS}lang"):
        info["language_code"] = text.attrib[f"{_XML_NS}lang"]
    if encumbered:
        el = root.find(f".//{_TEI_NS}profileDesc/{_TEI_NS}abstract")
        info["abstract"] = (el is not None and len(el) or None) and " ".join(el.itertext()).strip()
        el = root.find(f".//{_TEI_NS}text/{_TEI_NS}body")
        info["body"] = (el is not None and len(el) or None) and " ".join(el.itertext()).strip()
        el = root.find(f'.//{_TEI_NS}back/{_TEI_NS}div[@type="acknowledgement"]')
        info["acknowledgement"] = (
            el is not None and len(el) or None
        ) and " ".join(el.itertext()).strip()
        el = root.find(f'.//{_TEI_NS}back/{_TEI_NS}div[@type="annex"]')
        info["annex"] = (el is not None and len(el) or None) and " ".join(el.itertext()).strip()
    return {k: v for k, v in info.items() if v}


def teixml_to_json_py(tei_xml: str) -> dict:
    """Flat metadata distill the persist layer stores (title, authors,
    doi, abstract, body word count — grobid.py:65-78 metadata()), now
    derived from the FULL teixml2json_py distill plus the extended
    fields (journal block, release date, grobid version, citations)."""
    out: dict = {
        "title": None,
        "authors": [],
        "doi": None,
        "abstract": None,
        "body_word_count": None,
        "status": "success",
        "journal_name": None,
        "journal_publisher": None,
        "journal_issn": None,
        "volume": None,
        "issue": None,
        "release_date": None,
        "grobid_version": None,
        "grobid_timestamp": None,
        "language_code": None,
        "citations": [],
    }
    try:
        full = teixml2json_py(tei_xml)
    except (ET.ParseError, ValueError, KeyError, IndexError):
        return {**out, "status": "invalid-teixml"}
    t = (full.get("title") or "").strip()
    out["title"] = t or None
    out["authors"] = [a["name"] for a in full.get("authors", [])]
    out["doi"] = full.get("doi")
    abstract = " ".join((full.get("abstract") or "").split())
    out["abstract"] = abstract or None
    body = full.get("body")
    out["body_word_count"] = len(body.split()) if body is not None else None
    journal = full.get("journal", {})
    out["journal_name"] = journal.get("name")
    out["journal_publisher"] = journal.get("publisher")
    out["journal_issn"] = journal.get("issn")
    out["volume"] = journal.get("volume")
    out["issue"] = journal.get("issue")
    out["release_date"] = full.get("date") or None
    out["grobid_version"] = full.get("grobid_version")
    out["grobid_timestamp"] = full.get("grobid_timestamp")
    out["language_code"] = full.get("language_code")
    out["citations"] = [
        {
            "id": c.get("id"),
            "index": c.get("index"),
            "title": c.get("title"),
            "journal": c.get("journal"),
            "authors": [a["name"] for a in c.get("authors", [])],
            "date": c.get("date") or None,
            "volume": c.get("volume"),
            "issue": c.get("issue"),
            "url": c.get("url"),
            "publisher": c.get("publisher"),
        }
        for c in full.get("citations", [])
    ]
    return out


# ---------------------------------------------------------------------------
# Deterministic service stubs (the sandbox "transport")
# ---------------------------------------------------------------------------

def grobid_stub_service(blob: bytes) -> dict:
    """Deterministic fake GROBID: success for %PDF bodies, the
    reference's error statuses otherwise. TEI content derived from the
    content hash so downstream parsing is fully testable."""
    if not blob.startswith(b"%PDF"):
        return {"status_code": 500, "status": "error", "error_msg": "not a PDF", "tei_xml": None}
    h = hashlib.sha1(blob).hexdigest()
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader>'
        "<encodingDesc><appInfo>"
        '<application version="0.7.3-sandbox" ident="GROBID" when="2024-01-01T00:00+0000"/>'
        "</appInfo></encodingDesc><fileDesc>"
        f"<titleStmt><title>Synthetic document {h[:8]}</title></titleStmt>"
        "<sourceDesc><biblStruct><analytic>"
        f'<title level="a" type="main">Synthetic document {h[:8]}</title>'
        "<author><persName><forename>Alex</forename><surname>"
        f"Author{h[8:10]}</surname></persName></author>"
        f'<idno type="DOI">10.1234/{h[:6]}</idno>'
        "</analytic><monogr>"
        f"<title>Synthetic Journal {h[10:12]}</title>"
        '<imprint><biblScope unit="volume">7</biblScope>'
        '<date type="published" when="2024-01-15"/></imprint>'
        "</monogr></biblStruct></sourceDesc></fileDesc></teiHeader>"
        '<text xml:lang="en">'
        f"<body><p>body text {h[:12]} extracted deterministically</p></body></text></TEI>"
    )
    return {"status_code": 200, "status": "success", "error_msg": None, "tei_xml": tei}


def pdftrio_stub_service(blob: bytes) -> dict:
    """Deterministic fake pdftrio ensemble score in [0,1] per model."""
    if not blob.startswith(b"%PDF"):
        return {"status_code": 500, "status": "error", "ensemble_score": None,
                "bert_score": None, "linear_score": None, "image_score": None}
    d = hashlib.sha1(blob).digest()
    s = [round(b / 255.0, 6) for b in d[:4]]
    return {"status_code": 200, "status": "success", "ensemble_score": s[0],
            "bert_score": s[1], "linear_score": s[2], "image_score": s[3]}


# ---------------------------------------------------------------------------
# Spark tier
# ---------------------------------------------------------------------------

CITATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("index", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("journal", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("date", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("issue", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("publisher", T.StringType()),
    ]
)

GROBID_SCHEMA = T.StructType(
    [
        T.StructField("status_code", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_msg", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("doi", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField("body_word_count", T.IntegerType()),
        # grobid2json breadth (grobid2json.py:36-186): container block,
        # release date, grobid provenance, citations with context
        T.StructField("journal_name", T.StringType()),
        T.StructField("journal_publisher", T.StringType()),
        T.StructField("journal_issn", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("issue", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("grobid_version", T.StringType()),
        T.StructField("grobid_timestamp", T.StringType()),
        T.StructField("language_code", T.StringType()),
        T.StructField("citations", T.ArrayType(CITATION_SCHEMA)),
    ]
)

PDFTRIO_SCHEMA = T.StructType(
    [
        T.StructField("status_code", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("ensemble_score", T.DoubleType()),
        T.StructField("bert_score", T.DoubleType()),
        T.StructField("linear_score", T.DoubleType()),
        T.StructField("image_score", T.DoubleType()),
    ]
)


def with_grobid(df: DataFrame, blob_col: str = "html", service=grobid_stub_service) -> DataFrame:
    """Append a `grobid` struct column: service call + TEI distill in
    one Arrow crossing. Oversize bodies short-circuit to
    error-timeout like the reference's cap (grobid.py:53-58)."""

    @F.pandas_udf(GROBID_SCHEMA)
    def _grobid(blob: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
        rows = []
        empty = {f.name: None for f in GROBID_SCHEMA.fields}
        for b in blob:
            if b is None:
                rows.append({**empty, "status_code": 500, "status": "error", "error_msg": "null body"})
                continue
            b = bytes(b)
            if len(b) > GROBID_MAX_BYTES:
                rows.append({**empty, "status_code": 500, "status": "error-timeout",
                             "error_msg": "file too large"})
                continue
            res = service(b)
            meta = teixml_to_json_py(res["tei_xml"]) if res.get("tei_xml") else {}
            row = {
                f.name: meta.get(f.name)
                for f in GROBID_SCHEMA.fields
                if f.name not in ("status_code", "status", "error_msg")
            }
            row["authors"] = meta.get("authors") or []
            row["citations"] = [
                {cf.name: c.get(cf.name) for cf in CITATION_SCHEMA.fields}
                for c in meta.get("citations") or []
            ]
            row.update(
                status_code=res["status_code"],
                status=res["status"],
                error_msg=res.get("error_msg"),
            )
            rows.append(row)
        return pd.DataFrame(rows, columns=[f.name for f in GROBID_SCHEMA.fields])

    return df.withColumn("grobid", _grobid(F.col(blob_col)))


PDF_META_SCHEMA = T.StructType(
    [
        T.StructField("sha1hex", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("has_page0_thumbnail", T.BooleanType()),
        T.StructField("page_count", T.IntegerType()),
        T.StructField("word_count", T.IntegerType()),
        T.StructField("page0_height", T.FloatType()),
        T.StructField("page0_width", T.FloatType()),
        T.StructField("permanent_id", T.StringType()),
        T.StructField("pdf_version", T.StringType()),
        T.StructField("page0_thumbnail", T.BinaryType()),
    ]
)


def pdf_meta_stub_service(blob: bytes) -> dict:
    """Deterministic fake poppler pass: page count / page-0 dims /
    thumbnail bytes derived from the content hash. The real decoder
    (poppler render at 180x300, pdfextract.py:264-407) drops in here
    on a production cluster; this sandbox pins the row shape, the
    Arrow plumbing, and the status taxonomy (pdf_meta DDL
    up.sql:91-115)."""
    h = hashlib.sha1(blob).digest()
    hhex = h.hex()
    return {
        "sha1hex": hhex,
        "status": "success",
        "has_page0_thumbnail": True,
        "page_count": 1 + h[2] % 40,
        "word_count": 100 + h[3] * 7,
        "page0_height": 842.0,
        "page0_width": 595.0,
        "permanent_id": hhex[:32],
        "pdf_version": f"1.{4 + h[4] % 4}",
        "page0_thumbnail": h[:16],
    }


def with_pdf_meta(df: DataFrame, blob_col: str = "html", service=pdf_meta_stub_service) -> DataFrame:
    """Append a `pdf_meta` struct column matching the reference's
    pdf_meta table row (pdfextract.py:148-261 to_pdftext_dict + DDL).
    Non-PDF / empty bodies produce the reference's error statuses."""

    @F.pandas_udf(PDF_META_SCHEMA)
    def _meta(blob: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
        rows = []
        empty = {f.name: None for f in PDF_META_SCHEMA.fields}
        for b in blob:
            if b is None or len(b) == 0:
                rows.append({**empty, "status": "empty-blob", "has_page0_thumbnail": False})
                continue
            b = bytes(b)
            if not b.startswith(b"%PDF"):
                rows.append({**empty, "sha1hex": hashlib.sha1(b).hexdigest(),
                             "status": "not-pdf", "has_page0_thumbnail": False})
                continue
            rows.append(service(b))
        return pd.DataFrame(rows, columns=[f.name for f in PDF_META_SCHEMA.fields])

    return df.withColumn("pdf_meta", _meta(F.col(blob_col)))


def with_pdftrio(df: DataFrame, blob_col: str = "html", service=pdftrio_stub_service) -> DataFrame:
    @F.pandas_udf(PDFTRIO_SCHEMA)
    def _trio(blob: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
        rows = []
        for b in blob:
            if b is None:
                rows.append({f.name: None for f in PDFTRIO_SCHEMA.fields})
                continue
            rows.append(service(bytes(b)))
        return pd.DataFrame(rows, columns=[f.name for f in PDFTRIO_SCHEMA.fields])

    return df.withColumn("pdftrio", _trio(F.col(blob_col)))
