"""XML re-serialization (C9).

Role parity: /root/reference/python/sandcrawler/xml.py:1-7 — the
xml-type ingest path re-serializes fetched XML bodies into a canonical
UTF-8 document (stable header + ElementTree normal form) before
persisting, so byte-level dedupe keys are stable across encodings.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

XML_HEADER = '<?xml version="1.0" encoding="UTF-8"?>\n'


def xml_reserialize_py(raw: bytes) -> str | None:
    """Canonical re-serialization; None for unparseable bodies (the
    ingest path maps that to a bad-xml status, never an exception)."""
    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return None
    return XML_HEADER + ET.tostring(root, encoding="unicode")


@F.pandas_udf(T.StringType())
def xml_reserialize_udf(raw: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return raw.map(lambda b: xml_reserialize_py(bytes(b)) if b is not None else None)
