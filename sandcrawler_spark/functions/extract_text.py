"""Deterministic HTML -> text extraction (the byte-identical stage).

Role parity: the reference's trafilatura wrapper
(/root/reference/python/sandcrawler/html_ingest.py:21-50) — HTML bytes
in, body text + word count out, with the extractor version pinned and
observable (html_ingest.py:19 embeds the version in TRAFILATURA_AGENT
because the version IS part of the output contract).

trafilatura is not in this engine's pinned dependency set, so the
extractor itself is our own: a pure-stdlib, allocation-stable block
extractor. What matters for the north rule is that the output is
BYTE-IDENTICAL between (a) the fixture-build oracle run and (b) the
Arrow-vectorized Spark path, at any parallelism — i.e. the Python
crossing (bytes -> str -> Arrow) loses nothing. EXTRACTOR_VERSION is
bumped on any behavior change.

Spark tier: one pandas UDF over html:binary (vectorized, no per-row
Python in the plan; body bytes cross Arrow once).
"""

from __future__ import annotations

import gzip
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "sc-extract-1.0.0"
EXTRACTOR_AGENT = f"sandcrawler_spark/{EXTRACTOR_VERSION}"

# elements whose entire subtree is boilerplate / non-content
_SKIP_SUBTREE = {
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "template", "svg", "iframe", "button", "select", "option",
    "head", "title", "textarea",
    # NOT "form": 1990s-layout pages (e.g. dlib.org) wrap the ENTIRE
    # article in a search <form>, so skipping the form subtree drops
    # whole documents; only its control elements (button/select/
    # textarea) are junk, and they are skipped individually. `input`
    # is void (no subtree, no text) and must NOT be here — a start tag
    # with no matching end tag would leak skip depth forever.
}
# elements that delimit a text block
_BLOCK = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote",
    "td", "th", "figcaption", "pre", "dd", "dt", "caption", "summary",
}


class _BlockExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0
        self._block_depth = 0
        self._in_body = False
        self._saw_body_tag = False

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            self._in_body = True
            self._saw_body_tag = True
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._flush()
            self._block_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK:
            self._flush()
            self._block_depth = max(0, self._block_depth - 1)
        elif tag == "body":
            self._in_body = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._saw_body_tag and not self._in_body:
            return
        if self._block_depth or not self._saw_body_tag:
            self._buf.append(data)

    def _flush(self):
        if self._buf:
            text = " ".join("".join(self._buf).split())
            if text:
                self.blocks.append(text)
            self._buf = []

    def close(self):
        self._flush()
        super().close()


def decode_body_py(blob: bytes) -> str:
    """bytes -> str with the reference's transfer-encoding fix
    (ia.py:1088-1109): gunzip if the body is gzip-wrapped, then utf-8
    with deterministic replacement."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob)
        except OSError:
            pass
    return blob.decode("utf-8", errors="replace")


def extract_text_py(blob: bytes) -> str:
    """HTML bytes -> newline-joined content blocks (deterministic)."""
    html = decode_body_py(blob)
    p = _BlockExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return ""
    return "\n".join(p.blocks)


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("word_count", T.IntegerType()),
        T.StructField("extractor", T.StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_SCHEMA)
def extract_text_udf(blob: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
    texts, counts = [], []
    for b in blob:
        if b is None:
            texts.append(None)
            counts.append(None)
            continue
        t = extract_text_py(bytes(b))
        texts.append(t)
        counts.append(len(t.split()))
    return pd.DataFrame(
        {"text": texts, "word_count": counts, "extractor": [EXTRACTOR_AGENT] * len(texts)}
    )


def with_extracted_text(df: DataFrame, blob_col: str = "html") -> DataFrame:
    """Append extracted_text / word_count / extractor columns."""
    ex = extract_text_udf(F.col(blob_col))
    return (
        df.withColumn("_ex", ex)
        .withColumn("extracted_text", F.col("_ex.text"))
        .withColumn("word_count", F.col("_ex.word_count"))
        .withColumn("extractor", F.col("_ex.extractor"))
        .drop("_ex")
    )
