"""Unicode NFC normalization for web text.

The same visible string arrives from the web in composed (U+00E9) and
decomposed (U+0065 U+0301) forms — different bytes, different md5,
different shingles, so dedupe and fingerprinting silently miss pairs
unless text is normalized first (W3C recommends NFC for web content;
CCNet/ftfy pipelines normalize before hashing). The reference hashes
raw bytes (`python/sandcrawler/misc.py gen_file_metadata`) and never
normalizes — correct for file-level identity, insufficient for
text-level dedupe.

No Catalyst expression performs Unicode normalization, so this is one
of the engine's few sanctioned Python crossings: a vectorized
Arrow-batched pandas UDF over `unicodedata.normalize` (both
`unicodedata` and DuckDB's `nfc_normalize` implement the same Unicode
standard annex #15, which is what makes the oracle a true twin).
Scale shape: stateless map, no shuffle; Arrow transfer is the only
cost — batch it behind the column projection so only the text column
crosses.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nfc_py(s: str) -> str:
    return unicodedata.normalize("NFC", s)


@F.pandas_udf(T.StringType())
def nfc_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


def nfc_col(text: Column) -> Column:
    """NFC-normalized text (Arrow-vectorized; no JVM equivalent)."""
    return nfc_udf(text)


def is_nfc_col(text: Column) -> Column:
    """Cheap pre-filter: a pure-ASCII string is already NFC — lets a
    pipeline skip the Python crossing for the (dominant) ASCII slice:
    F.when(is_nfc_col(c), c).otherwise(nfc_col(c)) keeps the UDF off
    the hot rows entirely."""
    return ~text.rlike("[^\\x00-\\x7F]")
