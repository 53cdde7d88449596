from __future__ import annotations

import shutil

import pytest

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cds_tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_cfg(tmp_path) -> PipelineConfig:
    wh = tmp_path / "warehouse"
    shutil.rmtree(wh, ignore_errors=True)
    return PipelineConfig(warehouse=str(wh))


@pytest.fixture(scope="session")
def fixture_corpus(spark):
    """Default seeded corpus, shared across read-only tests."""
    from cargo_dupes_spark.sources.web_pages import generate_web_pages

    df, corpus = generate_web_pages(spark, skew_rows=12)
    df = df.cache()
    df.count()
    return df, corpus
