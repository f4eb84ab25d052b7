"""Deduplication suite for large-scale text corpora.

Beyond the reference's exact content identity (sha1hex everywhere;
GROUP BY sha1sum + TOP(1) in pig/filter-cdx-paper-pdfs.pig:38-41),
this adds the near-dup family a training-data pipeline needs:

  exact_dedupe        — hash-groupBy on a normalized fingerprint
  shingles_col        — word n-gram shingling (pure Catalyst)
  minhash_signature   — k-way MinHash via md5(seed:shingle) minima
                        (md5, not xxhash64, so the DuckDB oracle can
                        compute identical values)
  lsh_candidates      — band the signature, bucket-join within bands:
                        candidate pairs meet in a small shuffle keyed
                        by (band, band_key) instead of O(n²)
  ngram_jaccard_pairs — exact verify on candidates (or small inputs)
  simhash64           — 64-bit SimHash (vectorized pandas UDF) +
                        hamming-distance near-dup pairs

Scale notes: shingling multiplies rows (explode) — at 100 TB do LSH
per partition-bucket of the fingerprint hash, never a global explode
join; bands are the shuffle key so AQE handles hot buckets (a
degenerate band key = all-identical docs — exactly what the slug
denylist guards against in the scoring join).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.functions.textstats import fingerprint_col, tokens_col


def exact_dedupe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per normalized-text fingerprint."""
    return (
        df.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
    )


def shingles_col(text, n: int = 5):
    """Distinct word n-gram shingles as an array column (Catalyst-only:
    sequence + transform + slice). Texts shorter than n words yield an
    empty array (sequence(1,0) would count DOWN by default — guard)."""
    toks = tokens_col(F.lower(text))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))),
    ).otherwise(F.array().cast("array<string>"))


def _minhash_fn(prefix: str):
    # single-parameter lambda: a two-arg lambda (e.g. `lambda s, i=i`)
    # would be treated by Spark's transform() as an (element, index)
    # lambda and bind the hash index to the array-index Column
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles, k: int = 16):
    """Array of k MinHash values; hash_i(s) = md5('<i>:' || s)."""
    return F.array(
        *[F.array_min(F.transform(shingles, _minhash_fn(f"{i}:"))) for i in range(k)]
    )


def band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bkey) banded MinHash keys — the blocking relation
    both the batch self-join (lsh_candidates) and the streaming
    incremental detector (streaming/lsh_stream.py) build on. Narrow
    (no shuffle): per-row shingling + k md5 mins + band hashing."""
    rows = k // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles_col(F.col(text_col), n_shingle), k).alias("sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.array_join(F.slice(F.col("sig"), b * rows + 1, rows), ",")).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 16,
    bands: int = 4,
    max_band_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via banded MinHash LSH.

    max_band_size is the degenerate-bucket skew guard for the 100 TB
    path: a band bucket with s members emits s^2/2 join rows, so one
    boilerplate-heavy bucket (cookie walls, parked-domain pages) can
    dominate the whole shuffle. With the cap set, buckets larger than
    the cap are dropped BEFORE the self-join via a broadcast anti-join
    against the (tiny) hot-bucket list. Recall note: members of a
    dropped bucket still pair through their other bands; classes so
    huge that EVERY band bucket trips the cap are exact/near-exact
    duplicate classes, which exact_dedupe (cheaper, linear) should
    collapse first — same block-then-verify division of labor as the
    seen-set bloom+exact rescue."""
    banded = band_keys(df, id_col, text_col, n_shingle, k, bands)
    if max_band_size is not None:
        hot = (
            banded.groupBy("band", "bkey")
            .count()
            .filter(F.col("count") > max_band_size)
            .select("band", "bkey")
        )
        banded = banded.join(F.broadcast(hot), on=["band", "bkey"], how="left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with jaccard >= threshold over
    distinct word-n-gram shingle sets. If `candidates` given, verify
    only those (LSH block-then-verify); else all pairs (small inputs /
    oracle path)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), n_shingle).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    if candidates is not None:
        j = candidates.join(a, "id_a").join(b, "id_b")
    else:
        j = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union
    return (
        j.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedupe_lines_within_doc(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep only the FIRST occurrence of each exact line within a
    document (RefinedWeb/FineWeb line dedup: nav bars, cookie notices
    and share buttons repeat verbatim inside a page and inflate
    repetition counts downstream). Order-preserving.

    Scale shape: one shuffle keyed (doc, line) for the first-occurrence
    aggregate, one keyed (doc) to reassemble — per-group state is a
    single document's distinct lines, never cross-doc. Pure Catalyst.

    Returns (id, text, n_lines, n_removed)."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    firsts = lines.groupBy("id", "line").agg(F.min("pos").alias("pos"))
    rebuilt = firsts.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count("*").cast("long").alias("n_lines"))
    return (
        rebuilt.join(totals, "id")
        .select(
            F.col("id").alias(id_col),
            "text",
            "n_lines",
            (F.col("n_lines") - F.col("n_kept")).alias("n_removed"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    threshold: float = 0.9,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Directional containment (Broder 1997): |A∩B|/|A| per unordered
    pair — catches a doc EMBEDDED in a larger one (quote farms,
    template wrappers, article+boilerplate reposts), which symmetric
    Jaccard misses when the host document is much bigger. Keeps pairs
    where either direction >= threshold. Same block-then-verify scale
    shape as ngram_jaccard_pairs: crossJoin only as the documented
    tiny-input/oracle fallback."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), n_shingle).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    if candidates is not None:
        j = candidates.join(a, "id_a").join(b, "id_b")
    else:
        j = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cab = F.round(inter / F.size("sh_a"), 6)
    cba = F.round(inter / F.size("sh_b"), 6)
    return (
        j.withColumn("cont_a_in_b", cab)
        .withColumn("cont_b_in_a", cba)
        .filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
        .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: candidates -> verify -> connected components ->
# representative selection (the reference-free end-to-end piece a
# training-data pipeline needs on top of pairwise similarity)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(id, label) with label = min id of the node's connected component.

    Large-star / small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round halves
    tree heights, so convergence is O(log d) rounds in the component
    diameter d — a 10^4-node path converges in ~15 rounds where plain
    min-label propagation needs 10^4. Per round: large-star emits
    (v, min(N(u) ∪ {u})) for every strictly-larger neighbor v of every
    node u; small-star re-points every smaller neighbor (and u itself)
    at the minimum of u's smaller neighborhood. Both are one equi-join
    + one map-side-combined min-agg over the edge set; edges stay in
    canonical larger→smaller form throughout, and the per-round
    localCheckpoint keeps the plan flat (bounded unroll, same
    driver-loop shape as the fetch hop loop). Convergence is detected
    by a (count, xxhash64-sum) signature of the edge set; if max_iter
    is hit while still changing, a RuntimeError is raised rather than
    silently returning unconverged labels (ADVICE r2: neardup_dedupe
    would otherwise emit multiple representatives for one cluster).

    Pass stats={} to receive {"rounds": n} back (used by the pytest
    asserting O(log n) convergence)."""
    raw = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    # Canonical directed edges u -> v with u > v.
    e = (
        raw.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # --- large-star: symmetric neighborhoods, re-point larger
        # neighbors at min(N(u) ∪ {u}).
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # --- small-star: edges are larger→smaller; re-point each
        # smaller neighborhood (plus u itself) at its minimum.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, on="u")
            .select(F.col("v").alias("x"), F.col("m"))
            .filter(F.col("x") != F.col("m"))
            .unionByName(mins2.select(F.col("u").alias("x"), F.col("m")))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # bit_xor keeps the signature in 64 bits (ANSI-safe: a SUM of
        # xxhash64 values overflows LongType); edges are distinct so
        # the xor multiset-collision caveat does not apply.
        sig_row = small.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        sig = (sig_row.n, sig_row.h)
        e = small
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            f"raise max_iter (O(log n) rounds suffice for n nodes)"
        )
    # Fixpoint edges form stars: every non-root points at its component
    # min; roots appear only on the v side.
    return (
        e.select(F.col("u").alias("id"), F.col("v").alias("label"))
        .unionByName(
            e.select(F.col("v").alias("id"), F.col("v").alias("label")).distinct()
        )
        .distinct()
    )


def neardup_dedupe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end MinHash-LSH dedup: banded candidates -> exact jaccard
    verify -> connected components over verified pairs -> keep the min-id
    representative per duplicate cluster. One row per input doc:
    (id_col, rep_id, is_rep). Never materializes an all-pairs join — the
    only wide ops are the banded equi-join and the per-round CC joins."""
    cands = lsh_candidates(df, id_col, text_col, n_shingle, k, bands)
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n_shingle, threshold, candidates=cands)
    labels = connected_components(pairs)
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(labels, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("label", F.col("id")).alias("rep_id"),
        )
        .withColumn("is_rep", F.col(id_col) == F.col("rep_id"))
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized UDF — bit-twiddling is not Catalyst-friendly)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    out = []
    for t in text:
        if not t:
            out.append(0)
            continue
        votes = np.zeros(64, dtype=np.int64)
        for tok in set(t.lower().split()):
            d8 = np.frombuffer(hashlib.md5(tok.encode("utf-8")).digest()[:8], dtype=np.uint8)
            votes += 2 * np.unpackbits(d8).astype(np.int64) - 1
        sig_bytes = np.packbits((votes > 0).astype(np.uint8)).tobytes()
        sig = int.from_bytes(sig_bytes, "big")
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Blocking: the 64-bit
    signature is cut into (max_hamming+1) chunks — by pigeonhole any
    pair within the hamming budget shares at least one exact chunk, so
    the join is equi on (chunk_idx, chunk_value), never O(n²). More
    chunks = higher recall budget but a bigger blocked self-join."""
    if max_hamming > 15:
        # 16 chunks is the most a 64-bit signature supports with >=4-bit
        # chunks; beyond hamming 15 the pigeonhole guarantee (some chunk
        # is untouched) would silently break -> refuse instead
        raise ValueError(f"max_hamming={max_hamming} > 15 breaks the pigeonhole blocking guarantee")
    n_chunks = min(max_hamming + 1, 16)
    width = 64 // n_chunks
    offsets = [c * width for c in range(n_chunks)]
    widths = [width] * (n_chunks - 1) + [64 - width * (n_chunks - 1)]
    sig = df.select(F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("sig"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("cidx"),
                F.shiftrightunsigned(F.col("sig"), offsets[c])
                .bitwiseAND(F.lit((1 << widths[c]) - 1))
                .alias("cval"),
            )
            for c in range(n_chunks)
        ]
    )
    blocked = sig.select("id", "sig", F.explode(chunks).alias("c")).select(
        "id", "sig", F.col("c.cidx").alias("cidx"), F.col("c.cval").alias("cval")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(b, (F.col("a.cidx") == F.col("b.cidx")) & (F.col("a.cval") == F.col("b.cval")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def paragraph_dedupe(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-global paragraph-level exact dedupe (the ExactSubstr-lite
    pass of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at paragraph granularity): split each
    document on newlines, keep only the globally-FIRST occurrence of
    each distinct trimmed paragraph (first = smallest (doc id, position
    in doc)), and reassemble each document from its surviving
    paragraphs in original order.

    Returns (id_col, n_paras, n_kept, text_deduped) — one row per input
    document; a document whose every paragraph already appeared
    elsewhere keeps an empty text_deduped.

    Scale shape: explode to per-(paragraph-hash) rows, one shuffle
    keyed by md5(paragraph) — far finer-grained than per-doc, and
    SKEW-PROOF: "globally first occurrence" is min(struct(_id, pos))
    per hash, a plain aggregate with map-side partial combine, so a
    boilerplate paragraph present in 50% of all documents reduces to
    one tiny partial per input partition instead of one window group
    buffering every occurrence in a single task (VERDICT r3 item 7;
    a rank-1 Window.partitionBy(md5) was that buffer). Reassembly
    groups by doc id. No suffix array needed at paragraph
    granularity: equality IS the match predicate, so
    hash-partitioning replaces the reference-free O(corpus) suffix
    sort that made ExactSubstr single-node-bound.
    """
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "para"),
    ).withColumn("para", F.trim("para")).filter(F.col("para") != "")

    # min(struct) orders by (_id, pos) — para rides along (identical
    # within a hash key up to md5 collision, as before)
    kept = (
        paras.groupBy(F.md5("para").alias("_h"))
        .agg(F.min(F.struct("_id", "pos", "para")).alias("_f"))
        .select(F.col("_f._id").alias("_id"), F.col("_f.pos").alias("pos"),
                F.col("_f.para").alias("para"))
    )

    totals = paras.groupBy("_id").agg(F.count("*").cast("long").alias("n_paras"))
    rebuilt = kept.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s["para"]
            ),
            "\n",
        ).alias("text_deduped"),
    )
    return (
        totals.join(rebuilt, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def benchmark_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    word n-gram with an evaluation benchmark (the GPT-3 appendix-C /
    PaLM "13-gram overlap" protocol, with n configurable).

    `bench` is a DataFrame with `text_col` holding benchmark passages.
    Returns (id_col, n_contaminated_ngrams, contaminated) for EVERY
    corpus document.

    Scale shape: the benchmark side is tiny next to the corpus (MBs vs
    100 TB) — its distinct gram hashes BROADCAST, so the corpus-side
    explode streams map-side through a broadcast hash join and only
    per-doc hit counts shuffle (keyed by doc id, partial-aggregated).
    The corpus is never re-partitioned by gram.
    """
    def gram_rows(d: DataFrame, keep_id: bool):
        cols = [F.col(id_col).alias("_id")] if keep_id else []
        return (
            d.select(*cols, shingles_col(F.col(text_col), n=n).alias("_sh"))
            .select(*(["_id"] if keep_id else []), F.explode("_sh").alias("gram"))
            .select(*(["_id"] if keep_id else []), F.md5("gram").alias("gram_h"))
        )

    bench_grams = gram_rows(bench, keep_id=False).distinct()
    hits = (
        gram_rows(docs, keep_id=True)
        .join(F.broadcast(bench_grams), on="gram_h", how="inner")
        .groupBy("_id")
        .agg(F.count("*").cast("long").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(hits, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def span_dedupe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Corpus-global exact SPAN dedupe at word-n-gram granularity —
    the distributed stand-in for Lee et al. 2022's suffix-array
    ExactSubstr pass: any window of >= n tokens that occurs verbatim
    anywhere earlier in the corpus is removed, keeping the globally
    first occurrence (first = smallest (doc id, token position)).

    Semantics: a token is dropped iff it is inside some full n-gram
    whose (doc, pos) occurrence is not that gram's global first.
    Overlapping duplicated windows merge naturally (coverage is a
    distinct position set), so a duplicated run of m >= n tokens is
    removed wholesale, exactly like ExactSubstr with threshold n.
    Returns one row per input document:
    (id_col, n_tokens, n_dropped, text_deduped).

    Scale shape (why this beats a suffix array at 100 TB): equality of
    fixed-width grams IS the match predicate, so the corpus-wide
    "find repeats" step is: (1) min(struct(_id, pos)) per gram hash —
    a plain aggregate with map-side partial combine, skew-proof even
    for a boilerplate gram present in 50% of docs (VERDICT r3 item 7;
    the previous rank-1 window buffered every occurrence of a hot
    gram in one task) — then (2) a left-anti join of all full-window
    occurrences against those firsts on the FULL (gram_h, _id, pos)
    key, whose composite shuffle key spreads a hot gram's occurrences
    evenly across partitions. What survives the anti-join is exactly
    the rank>1 occurrence set. Gram construction is a per-doc window of lead()
    columns over the exploded token stream (NOT a nested higher-order
    lambda: Catalyst inlines those and re-evaluates the token array
    per element, the O(n^2) trap the winnowing operator hit) — one
    sort per doc partition, shared by all n-1 leads. Coverage explode
    emits n rows per duplicated gram occurrence, bounded by n * tokens
    per doc."""
    from pyspark.sql import Window

    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    toks = df.select(F.col(id_col).alias("_id"), F.posexplode(arr).alias("pos", "tok"))
    wd = Window.partitionBy("_id").orderBy("pos")
    wn = Window.partitionBy("_id")
    gram_parts = [F.col("tok")] + [F.lead("tok", i).over(wd) for i in range(1, n)]
    toks2 = (
        toks.withColumn("_ntok", F.count("*").over(wn))
        .withColumn("gram_h", F.md5(F.concat_ws(" ", *gram_parts)))
        .localCheckpoint(eager=True)  # read twice: gram ranking + rebuild
    )
    grams = toks2.filter(F.col("pos") <= F.col("_ntok") - n)  # full windows only
    firsts = (
        grams.groupBy("gram_h")
        .agg(F.min(F.struct("_id", "pos")).alias("_f"))
        .select("gram_h", F.col("_f._id").alias("_id"), F.col("_f.pos").alias("pos"))
    )
    # everything but each gram's global first occurrence (= rank > 1)
    dup_occ = grams.join(firsts, on=["gram_h", "_id", "pos"], how="left_anti")
    covered = dup_occ.select(
        "_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos")
    ).distinct()
    kept = toks2.join(covered, on=["_id", "pos"], how="left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count("*").cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("text_deduped"),
    )
    totals = toks2.groupBy("_id").agg(F.max("_ntok").cast("long").alias("n_tokens"))
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(totals, on="_id", how="left")
        .join(rebuilt, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            (F.coalesce("n_tokens", F.lit(0)) - F.coalesce("_n_kept", F.lit(0))).alias("n_dropped"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def soft_dedupe_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Soft deduplication: instead of dropping near-duplicates, keep
    every document and emit a training-sampling weight inversely
    proportional to its duplicate-cluster size (weight_ppm =
    1e6 div |cluster|), so a cluster contributes ~one document's worth
    of expected mass. This is the down-weighting alternative the data-
    pruning literature keeps landing on (e.g. soft dedup in
    DataComp-LM-style pipelines): hard dropping loses the distributional
    signal that popular pages ARE popular; weighting keeps it bounded.

    Reuses the full neardup pipeline (LSH candidates -> jaccard verify
    -> O(log d) connected components), adds one cluster-size groupBy
    (rank-free, map-side combined) and a join back on rep_id — the
    cluster-id table is one row per doc but the size table is one row
    per *cluster*, broadcast-able whenever clusters <~10^8. Singleton
    docs get exactly 1_000_000.
    """
    labels = neardup_dedupe(df, id_col, text_col, n_shingle, k, bands, threshold)
    sizes = labels.groupBy("rep_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labels.join(sizes, "rep_id").select(
        F.col(id_col),
        "rep_id",
        "cluster_size",
        F.expr("CAST(1000000 div cluster_size AS BIGINT)").alias("weight_ppm"),
    )


def lsh_tuning(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 8,
    configs: tuple[tuple[int, int], ...] = ((2, 4), (4, 2), (8, 1)),
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Banded-LSH parameter sweep: empirical candidate volume, recall,
    and precision for each (bands, rows_per_band) split of ONE k-hash
    MinHash signature — the tuning table an engineer reads before
    committing a (b, r) choice for a 100 TB dedupe run (the analytic
    S-curve threshold is (1/b)^(1/r); this measures the real corpus).

    Ground truth is the exact Jaccard>=tau pair set (tau = tau_num/
    tau_den compared as an INTEGER cross-multiplication —
    tau_den*|A∩B| >= tau_num*|A∪B| — so no float crosses the engine
    boundary). Output per config: (bands, rows_per_band, n_candidates,
    n_true_candidates, n_true_pairs, recall_ppm, precision_ppm).

    EVAL-ONLY operator: the truth set is all-pairs over the small
    labeled fixture (the dedupe_recall discipline — never run the
    crossJoin on a production corpus; production uses lsh_candidates
    with ONE tuned config). The signature is computed once and every
    config re-slices it, so the sweep costs one signature pass plus
    |configs| banded equi-joins on the fixture.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col), n_shingle).alias("sh"),
    ).where(F.size("sh") > 0)
    sh = sh.localCheckpoint(eager=True)

    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    truth = (
        a.crossJoin(b)
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (F.lit(tau_den) * inter >= F.lit(tau_num) * union).alias("is_true"),
        )
        .localCheckpoint(eager=True)
    )
    n_true_pairs = truth.agg(
        F.sum(F.when(F.col("is_true"), 1).otherwise(0)).cast("long").alias("n_true_pairs")
    )

    sig = sh.select("id", minhash_signature(F.col("sh"), k).alias("sig"))
    per_cfg = []
    for bands, rows in configs:
        assert bands * rows == k, (bands, rows, k)
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.md5(
                        F.array_join(F.slice(F.col("sig"), bi * rows + 1, rows), ",")
                    ).alias("bkey"),
                )
                for bi in range(bands)
            ]
        )
        banded = sig.select("id", F.explode(band_structs).alias("bk")).select(
            "id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
        )
        ca, cb = banded.alias("ca"), banded.alias("cb")
        cands = (
            ca.join(cb, (F.col("ca.band") == F.col("cb.band")) & (F.col("ca.bkey") == F.col("cb.bkey")))
            .filter(F.col("ca.id") < F.col("cb.id"))
            .select(F.col("ca.id").alias("id_a"), F.col("cb.id").alias("id_b"))
            .distinct()
        )
        agg = (
            cands.join(truth, ["id_a", "id_b"])
            .agg(
                F.count("*").cast("long").alias("n_candidates"),
                F.sum(F.when(F.col("is_true"), 1).otherwise(0))
                .cast("long")
                .alias("n_true_candidates"),
            )
            .select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(rows).cast("int").alias("rows_per_band"),
                F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
                F.coalesce("n_true_candidates", F.lit(0)).cast("long").alias("n_true_candidates"),
            )
        )
        per_cfg.append(agg)
    u = per_cfg[0]
    for c in per_cfg[1:]:
        u = u.unionByName(c)
    return u.crossJoin(n_true_pairs).select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_true_candidates",
        "n_true_pairs",
        F.expr(
            "CAST((1000000 * n_true_candidates) div greatest(CAST(1 AS BIGINT), n_true_pairs) AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST((1000000 * n_true_candidates) div greatest(CAST(1 AS BIGINT), n_candidates) AS BIGINT)"
        ).alias("precision_ppm"),
    )


# --- b-bit minhash (r4 session 16) -----------------------------------------

def bbit_signature_bits(shingles, k: int = 64):
    """1-bit minhash signature (Li & Koenig 2010): the parity of each
    of the k MinHash values (last hex nibble of the same md5 minima
    minhash_signature takes). 64 bits store in 8 bytes vs 64 x 16-byte
    md5 strings — the 32x storage cut is the whole point at 10^10-doc
    sketch-table scale."""
    return F.transform(
        minhash_signature(shingles, k),
        lambda v: (F.conv(F.substring(v, 32, 1), 16, 10).cast("int") % 2),
    )


def bbit_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n_shingle: int = 3,
    k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per pair: the b=1 estimator J^ = max(0, 2*P_match - 1) in
    integer micro, next to the exact shingle Jaccard and the absolute
    error — the calibration relation for deciding whether the 32x
    smaller sketch is accurate enough for a given dedupe threshold.
    The r->0 estimator form is the standard web-dedupe regime (shingle
    space >> document size); the clamp handles the sub-half-match
    noise floor. pairs: (id_a, id_b)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col), n_shingle).alias("sh"),
    ).filter(F.size("sh") > 0)
    sh = sh.select(
        "id", "sh", bbit_signature_bits(F.col("sh"), k).alias("bits")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                  F.col("bits").alias("bits_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                  F.col("bits").alias("bits_b"))
    j = pairs.join(a, on="id_a").join(b, on="id_b")
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("bits_a"), F.col("bits_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("long")
    jhat = F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"((2 * n_match - {k}) * CAST(1000000 AS BIGINT)) div {k}"),
    )
    jexact = F.expr(
        "(CAST(1000000 AS BIGINT) * size(array_intersect(sh_a, sh_b))) div "
        "size(array_union(sh_a, sh_b))"
    )
    return (
        j.withColumn("n_match", n_match)
        .select(
            "id_a", "id_b",
            F.col("n_match").cast("int").alias("n_match"),
            jhat.alias("jhat_micro"),
            jexact.alias("jexact_micro"),
        )
        .withColumn("abs_err_micro", F.abs(F.col("jhat_micro") - F.col("jexact_micro")))
    )
