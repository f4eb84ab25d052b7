"""Title slug normalization + similarity scoring.

Role parity with the reference's Scalding matcher:
  - slug normalize (/root/reference/scalding/src/main/scala/sandcrawler/
    StringUtilities.scala:17-44 + ScorableFeatures.scala:40-57): strip
    accents, strip punctuation incl. unicode quotes, lowercase, remove
    whitespace; reject if < MIN_SLUG_LEN chars or in the degenerate-
    title denylist (the denylist is a HOT-KEY/skew guard as much as a
    quality filter — ScorableFeatures.scala:10-14).
  - similarity (StringUtilities.scala:46-77 + Scorable.scala:83-97):
    Levenshtein -> (len - dist) / len, scaled x1000.

Spark tier: slug is pure Catalyst (translate covers the accent map the
reference special-cases); similarity uses the built-in levenshtein().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_SLUG_LEN = 8

# degenerate titles that would become mega-hot join keys
SLUG_DENYLIST = (
    "abstract", "abstracts", "archive", "archives", "article", "articles",
    "book", "books", "bookreview", "bookreviews", "conclusion", "conclusions",
    "contents", "discussion", "editorial", "editorials", "frontmatter",
    "index", "introduction", "introductions", "none", "preface", "references",
    "results", "review", "reviews", "summary", "title", "untitled",
)

_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿłø"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyylo"
_PUNCT = r"""[\s!"#$%&'()*+,\-./:;<=>?@\[\]\\^_`{|}~’‘“”«»„–—‒]"""


_PUNCT_RE = None


def slug_py(title: str | None) -> str | None:
    global _PUNCT_RE
    if title is None:
        return None
    if _PUNCT_RE is None:
        import re

        _PUNCT_RE = re.compile(_PUNCT)
    s = title.lower().translate(str.maketrans(_ACCENT_SRC, _ACCENT_DST))
    s = _PUNCT_RE.sub("", s)
    if len(s) < MIN_SLUG_LEN or s in SLUG_DENYLIST:
        return None
    return s


def slug_col(title: Column) -> Column:
    s = F.lower(title)
    s = F.translate(s, _ACCENT_SRC, _ACCENT_DST)
    s = F.regexp_replace(s, _PUNCT, "")
    return F.when(
        (F.length(s) >= MIN_SLUG_LEN) & ~s.isin(*SLUG_DENYLIST), s
    ).otherwise(F.lit(None))


def similarity_col(a: Column, b: Column) -> Column:
    """Levenshtein similarity scaled to [0, 1000] over the max length
    (integer, like the reference's x1000 scaling)."""
    max_len = F.greatest(F.length(a), F.length(b))
    # floor (not cast) so an ANSI-SQL oracle (CAST(FLOOR(..)) ) computes
    # the identical integer; matches Scala Int division truncation for
    # the non-negative range
    return F.when(max_len == 0, F.lit(1000)).otherwise(
        F.floor((max_len - F.levenshtein(a, b)) * 1000 / max_len).cast("int")
    )
