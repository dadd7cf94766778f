"""Shared fixtures: one SparkSession per test run, cached synthetic tables."""

from __future__ import annotations

import os

import pytest

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from tgdigest_spark.session import get_spark

    s = get_spark("tgdigest-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_path() -> str:
    from tgdigest_spark.datagen import write_transcripts

    return write_transcripts(DATA_DIR, sf=0.001)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


@pytest.fixture(scope="session")
def posts_path() -> str:
    from tgdigest_spark.datagen import write_posts

    return write_posts(DATA_DIR)


@pytest.fixture(scope="session")
def posts(spark, posts_path):
    return spark.read.parquet(posts_path)


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    return os.path.join(TESTDATA, "sf0.01")
