"""Round-4 session-11 operators: multimodal frame sampling + resize
plumbing (1->k and 1:1 mapInPandas contracts over binary columns) and
IP-level politeness (virtual-host collapse before scheduling)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sandcrawler_spark.multimodal import decode_media_stub, resize_plan, sample_frames
from sandcrawler_spark.operators.ipschedule import host_ip_table, schedule_by_ip


def _docs(spark, texts, n_parts=1):
    rows = [(i, t.encode("utf-8") if t is not None else None) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, content binary").repartition(n_parts)


# ---------------------------------------------------------------------------
# frame sampling: 1 -> ceil(n_frames / every_n) fan-out
# ---------------------------------------------------------------------------

def test_sample_frames_fanout_contract(spark):
    texts = [f"video payload number {i} " * (i + 1) for i in range(40)]
    out = sample_frames(_docs(spark, texts), every_n=10).collect()
    expected_total = 0
    for t in texts:
        nf = decode_media_stub(t.encode("utf-8"))["n_frames"]
        expected_total += math.ceil(nf / 10)
    assert len(out) == expected_total
    # every sampled index is a stride multiple below n_frames, and the
    # frame signature is the deterministic md5(md5hex:idx)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        m = decode_media_stub(t.encode("utf-8"))
        idxs = sorted(r.frame_idx for r in by_doc[i])
        assert idxs == list(range(0, m["n_frames"], 10))
        for r in by_doc[i]:
            want = hashlib.md5(f"{m['md5hex']}:{r.frame_idx}".encode()).hexdigest()
            assert r.frame_sig == want


def test_sample_frames_nulls_and_partitioning_invariance(spark):
    texts = ["x" * 10, None, "", "frame me " * 50, "y"]
    a = sorted(map(tuple, sample_frames(_docs(spark, texts, 1)).collect()))
    b = sorted(map(tuple, sample_frames(_docs(spark, texts, 7)).collect()))
    assert a == b
    # null/empty blobs contribute zero frame rows (1->k contract, k=0)
    assert {r[0] for r in a} == {0, 3, 4}


# ---------------------------------------------------------------------------
# resize: integer aspect-fit into the 180x300 reference thumbnail box
# ---------------------------------------------------------------------------

def test_resize_plan_aspect_fit(spark):
    texts = [f"image bytes {i}" for i in range(200)]
    out = resize_plan(_docs(spark, texts), box_w=180, box_h=300).collect()
    assert len(out) == len(texts)
    for r in out:
        # stub dims are always in [301, 907] (ascii-of-hex arithmetic
        # floors at 301), so every row resizes at the 180x300 box
        assert r.resized
        assert 1 <= r.out_w <= 180 and 1 <= r.out_h <= 300
        # exact integer aspect math on the binding side
        if r.width * 300 >= r.height * 180:
            assert r.out_w == 180 and r.out_h == (r.height * 180) // r.width
        else:
            assert r.out_h == 300 and r.out_w == (r.width * 300) // r.height
        # never upscale
        assert r.out_w <= r.width and r.out_h <= r.height


def test_resize_plan_passthrough_branch(spark):
    # the no-op branch (fits the box already) via a box larger than the
    # stub's max dim: dims must come through unchanged, resized=false
    texts = [f"image bytes {i}" for i in range(20)]
    out = resize_plan(_docs(spark, texts), box_w=1100, box_h=1100).collect()
    assert len(out) == len(texts)
    for r in out:
        assert (r.out_w, r.out_h) == (r.width, r.height) and not r.resized


# ---------------------------------------------------------------------------
# IP politeness: virtual-host collapse
# ---------------------------------------------------------------------------

def _frontier(spark, n_hosts=40, per_host=30):
    rows = []
    for h in range(n_hosts):
        for k in range(per_host):
            rows.append(
                (f"https://host{h}.example.org/p/{k}", f"host{h}.example.org", 1 + (k % 5))
            )
    return spark.createDataFrame(rows, "url string, host string, priority int")


def test_host_ip_table_collapses(spark):
    fr = _frontier(spark)
    dns = host_ip_table(fr, n_ips=8).collect()
    assert len(dns) == 40  # one row per host
    ips = {r.ip for r in dns}
    assert len(ips) < 40  # 40 hosts into <=8 addresses: real collapse
    for r in dns:
        h = hashlib.md5(r.host.encode()).hexdigest()
        want = (ord(h[0]) * 16 + ord(h[1])) % 8
        assert r.ip_id == want and r.ip == f"10.0.0.{want}"


def test_schedule_by_ip_shares_quota_across_cohosted_names(spark):
    fr = _frontier(spark)
    sched = schedule_by_ip(fr, n_ips=8)
    rows = sched.collect()
    assert len(rows) == fr.count()  # lineage: every URL scheduled
    # no (ip, round) group ever exceeds that ip's quota — even though
    # several HOSTS share the ip (the per-host scheduler would allow
    # n_hosts_on_ip * quota)
    per_round = {}
    hosts_per_ip = {}
    for r in rows:
        per_round.setdefault((r.ip, r.crawl_round), []).append(r)
        hosts_per_ip.setdefault(r.ip, set()).add(r.host)
    for (ip, rnd), grp in per_round.items():
        assert len(grp) <= grp[0].quota
    assert max(len(v) for v in hosts_per_ip.values()) >= 2  # co-hosting occurred
    # priority monotone within an ip: a higher-priority URL never lands
    # in a later round than a lower-priority one... (rounds fill by
    # priority desc), checked via rank ordering
    by_ip = {}
    for r in rows:
        by_ip.setdefault(r.ip, []).append(r)
    for ip, grp in by_ip.items():
        grp = sorted(grp, key=lambda r: (r.crawl_round, r.seq_in_round))
        prios = [r.priority for r in grp]
        assert prios == sorted(prios, reverse=True)


def test_schedule_by_ip_parallelism_invariance(spark):
    fr = _frontier(spark, n_hosts=12, per_host=20)
    a = sorted(map(tuple, schedule_by_ip(fr.repartition(1)).collect()))
    b = sorted(map(tuple, schedule_by_ip(fr.repartition(16)).collect()))
    assert a == b
