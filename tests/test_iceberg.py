"""Iceberg-backed Catalog + ignore CRUD — jar-gated integration test.

This sandbox image ships no iceberg-spark-runtime jar and has no network,
so the module SKIPS here; on a machine with the jar (env ICEBERG_SPARK_JAR
or a jar already on the session classpath) it exercises the real code
paths: writeTo(...).using("iceberg") snapshot commits, catalog reads,
config-hash resume, and MERGE INTO / DELETE FROM ignore CRUD — the
persistence contract of dupes-core/src/ignore.rs:39-56.

Run standalone (the Iceberg catalog confs must be set before the JVM's
first catalog access):

    ICEBERG_SPARK_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg.py -q
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from cargo_dupes_spark.sources.catalog import Catalog, _iceberg_available
from cargo_dupes_spark.sources.ignore import (
    add_ignore,
    is_ignored,
    load_ignore,
    remove_ignore,
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    # getOrCreate() on a JVM that already has an active session returns that
    # session with OUR catalog confs silently ignored — and stopping it would
    # kill the suite-wide `spark` fixture for every later test module. The
    # catalog extensions must be set before the JVM's first catalog access
    # anyway (module docstring), so this test only runs session-first.
    if SparkSession.getActiveSession() is not None:
        pytest.skip(
            "iceberg test needs a fresh JVM (run this module standalone)"
        )
    jar = os.environ.get("ICEBERG_SPARK_JAR")
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("cds_iceberg_test")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    )
    if jar:
        builder = builder.config("spark.jars", jar)
    spark = builder.getOrCreate()
    if not _iceberg_available(spark):
        spark.stop()
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath "
            "(set ICEBERG_SPARK_JAR)"
        )
    yield spark
    spark.stop()


@pytest.fixture()
def catalog(iceberg_spark, tmp_path):
    cat = Catalog(iceberg_spark, str(tmp_path / "wh"), "cfghash-1")
    assert cat.iceberg, "jar present but catalog fell back to parquet"
    return cat


def test_checkpoint_read_resume_roundtrip(iceberg_spark, catalog):
    df = iceberg_spark.range(100).withColumnRenamed("id", "n")
    out = catalog.checkpoint(df, "stage_a")
    assert out.count() == 100
    assert catalog.exists("stage_a")
    assert catalog.is_complete("stage_a")
    # a different config hash invalidates the committed stage
    other = Catalog(iceberg_spark, str(catalog.warehouse), "cfghash-2")
    assert not other.is_complete("stage_a")
    # lineage summary written against the iceberg table (aggregate fallback)
    n = catalog.record_lineage(out, "stage_a", n_in=100)
    assert n == 100


def test_merge_based_ignore_crud(catalog):
    assert load_ignore(catalog).count() == 0
    assert add_ignore(catalog, 42, "boilerplate family")
    assert not add_ignore(catalog, 42, "dup add must be a no-op")  # MERGE
    assert is_ignored(catalog, 42)
    assert load_ignore(catalog).count() == 1
    assert remove_ignore(catalog, 42)  # DELETE FROM
    assert not remove_ignore(catalog, 42)
    assert not is_ignored(catalog, 42)
