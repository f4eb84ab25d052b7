"""Shared fixtures: one local SparkSession per test session + a small
deterministic synthetic corpus (seed=42) persisted to parquet.

Mirrors the reference's test strategy (SURVEY.md §5): pytest over
fixture files with exact golden asserts; here the fixtures are
generated, not checked in, because they are a pure function of the
seed.
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from sandcrawler_spark.session import get_spark  # noqa: E402
from sandcrawler_spark.sources.synth import gen_corpus, write_corpus_parquet  # noqa: E402

SEED = 42
N_URLS = 150
N_HOSTS = 12


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sandcrawler_spark_tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pd():
    return gen_corpus(seed=SEED, n_urls=N_URLS, n_hosts=N_HOSTS)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus_parquet(str(d), seed=SEED, n_urls=N_URLS, n_hosts=N_HOSTS)
    return str(d)


@pytest.fixture(scope="session")
def corpus(spark, corpus_dir):
    return {
        name: spark.read.parquet(os.path.join(corpus_dir, f"{name}.parquet"))
        for name in ("pages", "cdx", "ingest_request", "robots")
    }
