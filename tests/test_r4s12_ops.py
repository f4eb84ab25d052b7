"""Round-4 session-12 operators: perceptual dHash near-dup, audio
silence-chunking, CDN-aware politeness keying, SCD2 interval build,
DOM-skeleton template clustering."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from sandcrawler_spark.operators.audiochunks import SILENCE_THRESHOLD, audio_windows, silence_chunks
from sandcrawler_spark.operators.dhash import (
    N_BITS,
    dhash_candidates,
    dhash_profile,
    image_dhash,
)
from sandcrawler_spark.operators.ipschedule import schedule_cdn_aware
from sandcrawler_spark.operators.scd import scd2_build


def _docs(spark, texts, n_parts=1):
    rows = [(i, t.encode("utf-8") if t is not None else None) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, content binary").repartition(n_parts)


def _py_dhash(blob: bytes) -> int:
    """Independent pure-Python twin of the stub grid + gradient bits."""
    h = hashlib.md5(blob).hexdigest()

    def px(p):
        return (ord(h[(p * 7) % 32]) * 31 + (p * 53) % 256) % 256

    out = 0
    for k in range(N_BITS):
        i, j = divmod(k, 10)
        if px(i * 11 + j) > px(i * 11 + j + 1):
            out |= 1 << k
    return out


# ---------------------------------------------------------------------------
# dHash
# ---------------------------------------------------------------------------

def test_image_dhash_matches_python_twin(spark):
    texts = [f"image bytes {i}" for i in range(64)]
    rows = {r.doc_id: r.dhash for r in image_dhash(_docs(spark, texts)).collect()}
    assert len(rows) == 64
    for i, t in enumerate(texts):
        assert rows[i] == _py_dhash(t.encode("utf-8"))
        assert 0 <= rows[i] < (1 << N_BITS)  # strictly positive BIGINT


def test_dhash_pigeonhole_recall(spark):
    # identical blobs (hamming 0) and any pair within hamming <= 3 MUST
    # share a band; build dup groups and assert candidates catch them
    texts = [f"unique payload {i}" for i in range(30)]
    texts += ["duplicated figure bytes"] * 3  # ids 30,31,32
    d = _docs(spark, texts)
    cand = {(r.id_a, r.id_b): r.hamming for r in dhash_candidates(image_dhash(d)).collect()}
    for pair in [(30, 31), (30, 32), (31, 32)]:
        assert cand[pair] == 0
    prof = {r.doc_id: r for r in dhash_profile(d).collect()}
    assert prof[30].n_partners >= 2 and prof[30].min_hamming == 0
    # an isolated doc has 0 partners and NULL min_hamming
    iso = [r for r in prof.values() if r.n_partners == 0]
    assert iso and all(r.min_hamming is None for r in iso)


def test_dhash_partitioning_invariance(spark):
    texts = [f"img {i}" for i in range(50)] + ["dup"] * 2
    a = sorted(map(tuple, dhash_profile(_docs(spark, texts, 1)).collect()))
    b = sorted(map(tuple, dhash_profile(_docs(spark, texts, 13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# audio chunks
# ---------------------------------------------------------------------------

def test_silence_chunks_islands_exact(spark):
    texts = [f"audio blob {i} " * (i + 1) for i in range(25)]
    out = silence_chunks(_docs(spark, texts)).collect()
    wins = audio_windows(_docs(spark, texts)).collect()
    # independent island reconstruction from the window rows
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r.doc_id, []).append((r.w, r.energy))
    expected = {}
    for doc, ws in by_doc.items():
        runs, cur = [], []
        for w, e in sorted(ws):
            if e >= SILENCE_THRESHOLD:
                if cur and w != cur[-1][0] + 1:
                    runs.append(cur)
                    cur = []
                cur.append((w, e))
        if cur:
            runs.append(cur)
        for idx, run in enumerate(runs):
            es = [e for _, e in run]
            expected[(doc, idx)] = (
                run[0][0],
                run[-1][0],
                len(run),
                (1000 * sum(es)) // len(es),
            )
    got = {
        (r.doc_id, r.chunk_idx): (r.start_w, r.end_w, r.n_win, r.mean_energy_permille)
        for r in out
    }
    assert got == expected
    # chunks never overlap and never contain a silent window
    emap = {(r.doc_id, r.w): r.energy for r in wins}
    for (doc, _), (s, e, n, _) in got.items():
        assert n == e - s + 1
        assert all(emap[(doc, w)] >= SILENCE_THRESHOLD for w in range(s, e + 1))


def test_silence_chunks_partitioning_invariance_and_all_silent(spark):
    texts = [f"clip {i}" for i in range(40)]
    a = sorted(map(tuple, silence_chunks(_docs(spark, texts, 1)).collect()))
    b = sorted(map(tuple, silence_chunks(_docs(spark, texts, 9)).collect()))
    assert a == b
    # a fully-silent blob (threshold 101 silences everything) yields 0 rows
    assert silence_chunks(_docs(spark, texts), threshold=101).count() == 0


# ---------------------------------------------------------------------------
# CDN-aware politeness
# ---------------------------------------------------------------------------

def _frontier(spark, n_hosts=60, per_host=20):
    rows = []
    for h in range(n_hosts):
        for k in range(per_host):
            rows.append(
                (f"https://h{h}.example.net/p/{k}", f"h{h}.example.net", 1 + (k % 5))
            )
    return spark.createDataFrame(rows, "url string, host string, priority int")


def test_cdn_aware_key_selection(spark):
    sched = schedule_cdn_aware(_frontier(spark), n_ips=8).collect()
    assert len(sched) == 60 * 20  # lineage: every URL scheduled
    cdn_rows = [r for r in sched if r.is_cdn]
    org_rows = [r for r in sched if not r.is_cdn]
    assert cdn_rows and org_rows
    for r in cdn_rows:
        assert r.sched_key == f"h:{r.host}" and r.quota == 4
    for r in org_rows:
        ip_id = int(r.ip.rsplit(".", 1)[1])
        assert r.sched_key == f"ip:{r.ip}" and r.quota == 2 + ip_id % 3
    # CDN-hosted names are NOT collapsed: two hosts on one CDN ip get
    # independent rounds (per-key quota respected, keys differ)
    per_round = {}
    for r in sched:
        per_round.setdefault((r.sched_key, r.crawl_round), 0)
        per_round[(r.sched_key, r.crawl_round)] += 1
    for (key, _), n in per_round.items():
        quota = 4 if key.startswith("h:") else None
        if quota is None:
            ip_id = int(key.rsplit(".", 1)[1])
            quota = 2 + ip_id % 3
        assert n <= quota
    # origin hosts DO share rounds across co-hosted names
    org_hosts_per_key = {}
    for r in org_rows:
        org_hosts_per_key.setdefault(r.sched_key, set()).add(r.host)
    assert max(len(v) for v in org_hosts_per_key.values()) >= 2


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

def test_scd2_build_collapses_and_versions(spark):
    t0 = datetime.datetime(2026, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # entity 1: a,a,b,b,a -> 3 intervals
        (1, ts(0), "a", 10),
        (1, ts(1), "a", 11),
        (1, ts(2), "b", 12),
        (1, ts(3), "b", 13),
        (1, ts(4), "a", 14),
        # entity 2: same-tick conflict at ts(0): event 21 wins (greater
        # tiebreak) -> value y; then y again (collapse) -> 1 interval
        (2, ts(0), "x", 20),
        (2, ts(0), "y", 21),
        (2, ts(5), "y", 22),
    ]
    df = spark.createDataFrame(rows, "entity int, ts timestamp, value string, event_id int")
    out = scd2_build(df, "entity", "ts", "value", tiebreak_col="event_id")
    got = {(r.entity, r.version): r for r in out.collect()}
    assert len(got) == 4
    e1 = [got[(1, v)] for v in (1, 2, 3)]
    assert [r.value for r in e1] == ["a", "b", "a"]
    assert e1[0].valid_from == ts(0) and e1[0].valid_to == ts(2)
    assert e1[1].valid_from == ts(2) and e1[1].valid_to == ts(4)
    assert e1[2].valid_to is None and e1[2].is_current
    assert not e1[0].is_current and not e1[1].is_current
    # intervals tile: valid_to of version k == valid_from of k+1
    e2 = got[(2, 1)]
    assert e2.value == "y" and e2.valid_from == ts(0) and e2.valid_to is None


def test_scd2_partitioning_invariance(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (e, t0 + datetime.timedelta(minutes=m), f"v{(e * m) % 3}", e * 100 + m)
        for e in range(10)
        for m in range(20)
    ]
    df = spark.createDataFrame(rows, "entity int, ts timestamp, value string, event_id int")
    a = sorted(map(tuple, scd2_build(df.repartition(1), "entity", "ts", "value", "event_id").collect()))
    b = sorted(map(tuple, scd2_build(df.repartition(16), "entity", "ts", "value", "event_id").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# template clusters
# ---------------------------------------------------------------------------

def test_template_clusters_groups_same_skeleton(spark):
    from sandcrawler_spark.functions.templates import template_clusters

    tmpl = "<html><head><title>{t}</title></head><body><div><p>{b}</p><a href='/{x}'>x</a></div></body></html>"
    other = "<html><body><ul><li>one</li><li>two</li></ul></body></html>"
    rows = []
    for i in range(6):
        rows.append((f"https://a.example.org/p/{i}", tmpl.format(t=f"T{i}", b=f"body {i}", x=i).encode()))
    rows.append(("https://a.example.org/list", other.encode()))
    rows.append(("https://b.example.org/p/0", tmpl.format(t="zz", b="yy", x=9).encode()))
    rows.append(("https://a.example.org/bin", b"\x1f\x8b binary not html"))
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = template_clusters(pages).collect()
    by = {(r.host, r.n_pages): r for r in out}
    # 6 same-template pages on host a cluster together despite all
    # visible text differing; the list page is its own skeleton; the
    # non-HTML blob is filtered by the magic-byte guard
    big = by[("a.example.org", 6)]
    assert big.rep_url == "https://a.example.org/p/0"
    assert ("a.example.org", 1) in by
    assert ("b.example.org", 1) in by
    # same template on another host has the SAME signature (host is a
    # grouping key, not part of the hash)... text differs but skeleton
    # matches because attrs/text are stripped
    assert by[("b.example.org", 1)].skeleton_sig == big.skeleton_sig
    assert sum(r.n_pages for r in out) == 8  # binary row excluded
