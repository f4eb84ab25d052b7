"""Perceptual image hashing (dHash) + banded Hamming near-dup.

The multimodal near-dup layer the reference never had: its dedupe is
byte-exact SHA-1 over blobs (e.g. the poison-pill sha1 denylists and
revisit resolution, /root/reference/python/sandcrawler/ingest.py), so
two re-encodes of the same figure are distinct rows. Production
training-data pipelines dedupe images *perceptually*: decode, resample
to a tiny brightness grid, take the gradient-sign bits (dHash), and
bucket by hash bands so near-identical images land in the same
shuffle partition — exactly the SimHash pigeonhole discipline
`operators/dedupe.py` already applies to text, re-used here for the
image modality.

Decode is STUBBED (no Pillow in this sandbox): the brightness grid is
deterministic md5-hexchar arithmetic over the blob bytes, engine-
portable so a SQL oracle recomputes every bit. The grid function is
the single swap boundary — a real decoder replaces `_px` inputs with
resampled luma and nothing downstream changes.

Hash shape: 6 rows x 11 cols of "pixels" -> 60 horizontal-gradient
bits (classic dHash is 8x9 -> 64; 60 keeps the packed hash strictly
positive in a signed BIGINT so band extraction via >> & mask is
identical under Spark's and DuckDB's arithmetic shift). Bands: 4 x 15
bits -> pigeonhole guarantees recall for Hamming distance <= 3.

Scale shape: the hash is ONE whole-stage-codegen expression per row
(no Python, no shuffle); candidate generation is a banded equi-join
(never all-pairs); per-doc stats are one groupBy over candidate pairs.
At 10^10 images a 15-bit band over-collides — widen bands (the
band_bits knob) so expected bucket size stays O(1..100), same tuning
rule as lsh_candidates' (b, r) sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_ROWS = 6
N_COLS = 11  # pixels per row; N_COLS-1 gradient bits per row
N_BITS = N_ROWS * (N_COLS - 1)  # 60
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS  # 15
BAND_MASK = (1 << BAND_BITS) - 1


def _px_terms() -> list[tuple[int, int, int, int]]:
    """Constant plan for each gradient bit k: (k, posL, mulL, addL ...)
    flattened as (k, posA, addA, posB, addB) where pixel value =
    (ascii(md5char[pos]) * 31 + add) % 256. Positions are 1-indexed
    into the 32-char md5 hexdigest; the *7 stride visits every char."""
    terms = []
    for k in range(N_BITS):
        i, j = divmod(k, N_COLS - 1)
        a = i * N_COLS + j
        b = i * N_COLS + j + 1
        terms.append(
            (k, 1 + (a * 7) % 32, (a * 53) % 256, 1 + (b * 7) % 32, (b * 53) % 256)
        )
    return terms


def dhash_col(md5hex: Column) -> Column:
    """60-bit dHash packed into a BIGINT, as one codegen expression:
    bit k set iff px(i,j) > px(i,j+1) on the stub brightness grid."""
    out = F.lit(0).cast("long")
    for k, pa, aa, pb, ab in _px_terms():
        pxa = (F.ascii(F.substring(md5hex, pa, 1)) * 31 + F.lit(aa)) % 256
        pxb = (F.ascii(F.substring(md5hex, pb, 1)) * 31 + F.lit(ab)) % 256
        out = out + F.when(pxa > pxb, F.lit(1 << k).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def dhash_sql(md5_expr: str) -> str:
    """The SAME 60-bit hash as ANSI SQL (DuckDB twin), generated from
    the same constant plan so the two engines cannot drift."""
    parts = []
    for k, pa, aa, pb, ab in _px_terms():
        pxa = f"((ascii(substr({md5_expr}, {pa}, 1)) * 31 + {aa}) % 256)"
        pxb = f"((ascii(substr({md5_expr}, {pb}, 1)) * 31 + {ab}) % 256)"
        parts.append(f"(CASE WHEN {pxa} > {pxb} THEN CAST({1 << k} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def image_dhash(df: DataFrame, id_col: str = "doc_id", blob_col: str = "content") -> DataFrame:
    """(id, dhash) per non-empty blob. Pure map stage, no shuffle."""
    h = F.md5(F.col(blob_col))
    return (
        df.filter(F.col(blob_col).isNotNull() & (F.length(F.col(blob_col)) > 0))
        .select(F.col(id_col), dhash_col(h).alias("dhash"))
    )


def dhash_bands(hashes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode each hash into its N_BANDS (band_no, band_val) keys."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_no"),
                (F.shiftrightunsigned(F.col("dhash"), b * BAND_BITS) % (BAND_MASK + 1)).alias("band_val"),
            )
            for b in range(N_BANDS)
        ]
    )
    e = hashes.select(id_col, "dhash", F.explode(bands).alias("b"))
    return e.select(id_col, "dhash", F.col("b.band_no").alias("band_no"), F.col("b.band_val").alias("band_val"))


def dhash_candidates(
    hashes: DataFrame, id_col: str = "doc_id", max_hamming: int = 10
) -> DataFrame:
    """Near-dup candidate pairs via banded equi-join: two images are
    candidates iff they share >=1 exact 15-bit band (pigeonhole: all
    pairs with Hamming <= 3 are caught; larger distances best-effort).
    Output (id_a, id_b, hamming), id_a < id_b, filtered to
    hamming <= max_hamming. Never all-pairs."""
    b = dhash_bands(hashes, id_col)
    l = b.select(F.col(id_col).alias("id_a"), F.col("dhash").alias("h_a"), "band_no", "band_val")
    r = b.select(F.col(id_col).alias("id_b"), F.col("dhash").alias("h_b"), "band_no", "band_val")
    pairs = (
        l.join(r, ["band_no", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.expr("h_a ^ h_b"))
    return (
        pairs.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )


def dhash_profile(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "content", max_hamming: int = 10
) -> DataFrame:
    """Per-image near-dup profile: the hash plus how many banded
    partners it has within max_hamming and the closest distance
    (NULL when isolated). One banded self-join + one groupBy."""
    hashes = image_dhash(df, id_col, blob_col)
    cand = dhash_candidates(hashes, id_col, max_hamming)
    both = cand.select(F.col("id_a").alias(id_col), "hamming").unionByName(
        cand.select(F.col("id_b").alias(id_col), "hamming")
    )
    stats = both.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_partners"),
        F.min("hamming").cast("int").alias("min_hamming"),
    )
    return (
        hashes.join(stats, id_col, "left")
        .select(
            id_col,
            "dhash",
            F.coalesce(F.col("n_partners"), F.lit(0).cast("long")).alias("n_partners"),
            F.col("min_hamming"),
        )
    )
