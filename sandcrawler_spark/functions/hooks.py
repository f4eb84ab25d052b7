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

def teixml_to_json_py(tei_xml: str) -> dict:
    """Distill a GROBID TEI document into the flat metadata dict the
    persist layer stores (title, authors, doi, abstract, grobid body
    presence) — the fields metadata() keeps, grobid.py:65-78."""
    out: dict = {
        "title": None,
        "authors": [],
        "doi": None,
        "abstract": None,
        "body_word_count": None,
        "status": "success",
    }
    try:
        root = ET.fromstring(tei_xml)
    except ET.ParseError:
        return {**out, "status": "invalid-teixml"}
    header = root.find(f"{_TEI_NS}teiHeader")
    if header is not None:
        t = header.find(f".//{_TEI_NS}titleStmt/{_TEI_NS}title")
        if t is not None and (t.text or "").strip():
            out["title"] = t.text.strip()
        for pers in header.findall(f".//{_TEI_NS}sourceDesc//{_TEI_NS}author/{_TEI_NS}persName"):
            parts = [e.text.strip() for e in pers if e.text and e.text.strip()]
            if parts:
                out["authors"].append(" ".join(parts))
        for idno in header.findall(f".//{_TEI_NS}idno"):
            if idno.get("type", "").lower() == "doi" and idno.text:
                out["doi"] = idno.text.strip().lower()
    abstract = root.find(f".//{_TEI_NS}abstract")
    if abstract is not None:
        text = " ".join("".join(abstract.itertext()).split())
        out["abstract"] = text or None
    body = root.find(f".//{_TEI_NS}body")
    if body is not None:
        out["body_word_count"] = len("".join(body.itertext()).split())
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
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>'
        f"<titleStmt><title>Synthetic document {h[:8]}</title></titleStmt>"
        "<sourceDesc><biblStruct><analytic>"
        "<author><persName><forename>Alex</forename><surname>"
        f"Author{h[8:10]}</surname></persName></author>"
        f'<idno type="DOI">10.1234/{h[:6]}</idno>'
        "</analytic></biblStruct></sourceDesc></fileDesc></teiHeader>"
        f"<text><body><p>body text {h[:12]} extracted deterministically</p></body></text></TEI>"
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
            rows.append(
                {
                    "status_code": res["status_code"],
                    "status": res["status"],
                    "error_msg": res.get("error_msg"),
                    "title": meta.get("title"),
                    "authors": meta.get("authors") or [],
                    "doi": meta.get("doi"),
                    "abstract": meta.get("abstract"),
                    "body_word_count": meta.get("body_word_count"),
                }
            )
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
