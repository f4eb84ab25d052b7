"""Mojibake repair: undo UTF-8-bytes-read-as-cp1252 corruption.

Web crawls are full of double-encoding damage — a page's UTF-8 bytes
were decoded as windows-1252 somewhere upstream, turning "é" into
"Ã©" and "—" into "â€”". Text pipelines repair this before
dedupe/quality scoring (the ftfy problem class; CCNet runs a repair
pass); the reference decodes WARC bodies with best-effort charset
sniffing (`/root/reference/python/sandcrawler/ia.py` body decode) but
has no repair for already-corrupted text.

Pure Catalyst, no Python crossing: the repair is
    decode(encode(translate(s, CP1252_EXTRAS, CTRL), 'ISO-8859-1'), 'UTF-8')
— translate maps the 27 cp1252-specific printables (€ ‚ ƒ „ … † ‡ ˆ ‰
Š ‹ Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) back to their 0x80–0x9F byte
positions (cp1252 and latin-1 agree everywhere else), then the
latin-1 encode recovers the original byte stream and the UTF-8 decode
re-reads it correctly.

Guard rails (both engines): the repair is attempted only when the
text matches a mojibake indicator (Ã/Â/â€/â‚ sequences — the UTF-8
lead bytes C3/C2/E2 as cp1252 sees them), and kept only when the
re-decode is clean (no U+FFFD replacement char) — so genuine text
that legitimately contains "€" or "Ã" round-trips to an invalid
byte sequence and is left untouched. The fix is idempotent: repaired
text no longer matches the indicator with recoverable bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the 27 printable characters cp1252 places in latin-1's 0x80-0x9F
# control range, in byte order (0x81/0x8D/0x8F/0x90/0x9D undefined)
CP1252_EXTRAS = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_CTRL = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)

# UTF-8 lead bytes as cp1252 renders them: Â-Å are C2-C5
# (Latin-1/Latin-Extended 2-byte seqs), â€/â‚ are E2 80/E2 82 (the
# punctuation and currency blocks). Over-matching is safe: the
# clean-redecode guard rejects text whose bytes don't form valid UTF-8.
MOJIBAKE_INDICATOR_RX = "[Â-Å]|â€|â‚"


def _rebytes(s: Column) -> Column:
    """Re-read a cp1252-misdecoded string as the UTF-8 it once was."""
    return F.decode(F.encode(F.translate(s, CP1252_EXTRAS, _CTRL), "ISO-8859-1"), "UTF-8")


# Full-match UTF-8 validity over the byte-per-char form (after the
# cp1252->control translate, each char's code point IS the original
# byte). Spark 4's decode() THROWS on malformed input instead of
# substituting U+FFFD, so validity must be proven BEFORE decoding —
# and a regex in char space does it without leaving codegen. Chars
# above U+00FF match no class, so strings latin-1 can't encode are
# rejected here too (encode would otherwise throw/mangle).
UTF8_VALID_RX = (
    "^(?:[\x00-\x7f]"
    "|[\u00c2-\u00df][\u0080-\u00bf]"
    "|\u00e0[\u00a0-\u00bf][\u0080-\u00bf]"
    "|[\u00e1-\u00ec][\u0080-\u00bf]{2}"
    "|\u00ed[\u0080-\u009f][\u0080-\u00bf]"
    "|[\u00ee-\u00ef][\u0080-\u00bf]{2}"
    "|\u00f0[\u0090-\u00bf][\u0080-\u00bf]{2}"
    "|[\u00f1-\u00f3][\u0080-\u00bf]{3}"
    "|\u00f4[\u0080-\u008f][\u0080-\u00bf]{2})*$"
)


def fix_mojibake_col(s: Column) -> Column:
    """Repaired text, or the input unchanged when it doesn't look like
    mojibake or its recovered bytes aren't valid UTF-8 (genuine text
    containing a bare '\u20ac' or '\u00c3' fails validation and is
    left untouched)."""
    t = F.translate(s, CP1252_EXTRAS, _CTRL)
    looks_broken = s.rlike(MOJIBAKE_INDICATOR_RX)
    valid_bytes = t.rlike(UTF8_VALID_RX)
    # CaseWhen evaluates branches lazily, so decode() only runs on
    # rows proven valid
    return F.when(
        looks_broken & valid_bytes, F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")
    ).otherwise(s)


def make_mojibake_col(s: Column) -> Column:
    """The inverse corruption, for synthesis/tests: UTF-8 bytes
    misdecoded as cp1252 (encode UTF-8, re-read latin-1, lift the
    0x80-0x9F controls to cp1252's printables)."""
    latin = F.decode(F.encode(s, "UTF-8"), "ISO-8859-1")
    return F.translate(latin, _CTRL, CP1252_EXTRAS)


def mojibake_py(s: str) -> str:
    """Python twin of make_mojibake_col (fixture generator)."""
    return s.encode("utf-8").decode("latin-1").translate(
        str.maketrans(_CTRL, CP1252_EXTRAS)
    )
