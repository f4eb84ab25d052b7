"""Round-4 session-7 operators: char-level entropy (binary detection),
token-distribution drift (generalized JS divergence), and the Zipf
rank-frequency fit."""

from __future__ import annotations

import math


def test_char_entropy_known_values_and_flags(spark):
    from sandcrawler_spark.operators.diagnostics import char_entropy

    rows = [
        (0, "aaaaaaaa"),                      # 1 symbol -> H = 0
        (1, "abababab"),                      # 2 symbols even -> H = ln 2
        (2, ""),                              # empty doc kept, H = 0
        (3, "".join(chr(33 + (i * 7) % 94) for i in range(256))),  # ~uniform
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[0].entropy_micronat == 0 and not got[0].high_entropy
    # H = ln(8) - (2*4*round(1e6 ln 4))/8 exactly
    expect = round(math.log(8) * 1e6) - (2 * 4 * round(math.log(4) * 1e6)) // 8
    assert got[1].entropy_micronat == expect
    assert abs(got[1].entropy_micronat - round(math.log(2) * 1e6)) <= 2
    assert got[2].n_chars == 0 and got[2].entropy_micronat == 0
    # 94 distinct chars ~uniform -> H ~ ln(94) = 4.54 nats -> flagged
    assert got[3].high_entropy and got[3].n_distinct == 94


def test_char_entropy_cap_bounds_explode(spark):
    from sandcrawler_spark.operators.diagnostics import char_entropy

    df = spark.createDataFrame([(0, "ab" * 10_000)], ["doc_id", "text"])
    row = char_entropy(df, cap=256).collect()[0]
    assert row.n_chars == 256  # hard cap, not doc length


def test_token_drift_identical_vs_disjoint_halves(spark):
    from sandcrawler_spark.operators.diagnostics import token_drift

    rows = (
        # 'stable': same distribution both sides -> JSD ~ 0
        [(i, "alpha beta gamma", "stable") for i in range(20)]
        # 'churned': disjoint vocabularies, equal sizes -> JSD ~ ln 2
        + [(i, "old old tokens here" if i % 2 == 0 else "new new words there", "churned")
           for i in range(20)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.grp: r for r in token_drift(df).collect()}
    assert abs(got["stable"].jsd_micronat) <= 5
    assert abs(got["churned"].jsd_micronat - round(math.log(2) * 1e6)) <= 5
    # entropy decomposition is internally consistent
    for r in got.values():
        assert r.jsd_micronat == r.pooled_entropy_micronat - r.mean_side_entropy_micronat


def test_zipf_fit_recovers_planted_slope(spark):
    from sandcrawler_spark.operators.diagnostics import zipf_fit

    # plant an exact Zipf corpus: token t_r appears floor(2400/r) times
    toks = []
    for r in range(1, 41):
        toks.extend([f"t{r:02d}"] * (2400 // r))
    df = spark.createDataFrame([(0, " ".join(toks))], ["doc_id", "text"])
    row = zipf_fit(df, top_k=40).collect()[0]
    assert row.n == 40
    assert -1050 <= row.slope_milli <= -950      # slope ~ -1
    assert row.r2_ppm >= 995_000                 # near-perfect fit
