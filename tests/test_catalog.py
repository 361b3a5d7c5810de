"""Lakehouse catalog adapter (dedupe_spark/catalog.py).

The sandbox carries no Iceberg/Delta jars, so these tests cover the parts
that run everywhere — detection, fail-fast construction with actionable
hints, identifier/property plumbing, and that the default parquet protocol
is untouched — plus a skip-gated live smoke for runtimes that DO carry a
catalog (it runs automatically the day the jars appear).
"""

from __future__ import annotations

import tempfile

import pytest

from dedupe_spark.catalog import (
    CatalogUnavailableError,
    TableCatalog,
    detect_catalogs,
)


def test_detect_catalogs_plain_session(spark):
    found = detect_catalogs(spark)
    assert found["iceberg"] == []
    assert found["delta"] is False


def test_iceberg_unavailable_fails_fast_with_hint(spark):
    with pytest.raises(CatalogUnavailableError) as ei:
        TableCatalog(spark, "iceberg")
    msg = str(ei.value)
    assert "--packages" in msg and "iceberg-spark-runtime" in msg
    assert "spark.sql.catalog" in msg


def test_delta_unavailable_fails_fast_with_hint(spark):
    with pytest.raises(CatalogUnavailableError) as ei:
        TableCatalog(spark, "delta")
    assert "DeltaSparkSessionExtension" in str(ei.value)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        TableCatalog(spark, "hudi")


def test_pipeline_fails_fast_at_construction(spark):
    """table_format='iceberg' on a catalog-less session must raise at
    Pipeline construction — never at the first stage commit minutes in."""
    from dedupe_spark.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        workdir=tempfile.mkdtemp(), table_format="iceberg"
    )
    with pytest.raises(CatalogUnavailableError):
        Pipeline(spark, cfg)


def test_table_format_not_in_stage_key(spark):
    """Storage binding must not invalidate checkpoints: key_dict (the
    resume key payload) is identical across table formats."""
    from dedupe_spark.pipeline import PipelineConfig

    a = PipelineConfig(workdir="/tmp/x")
    b = PipelineConfig(
        workdir="/tmp/x", table_format="iceberg", catalog_namespace="other"
    )
    assert a.key_dict() == b.key_dict()


def test_default_parquet_protocol_unaffected(spark):
    """With the default table_format the Pipeline takes the filesystem
    manifest path: catalog is None and a stage commits + resumes exactly
    as before the adapter existed."""
    from pyspark.sql import functions as F

    from dedupe_spark.pipeline import Pipeline, PipelineConfig

    wd = tempfile.mkdtemp()
    p = Pipeline(spark, PipelineConfig(workdir=wd))
    assert p.catalog is None
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    out, key = p.stage("unit_stage", [], lambda: df)
    assert out.count() == 10
    assert p.metrics["unit_stage"]["resumed"] is False
    out2, key2 = p.stage("unit_stage", [], lambda: df)
    assert key2 == key
    assert p.metrics["unit_stage"]["resumed"] is True


def _live_catalog(spark):
    found = detect_catalogs(spark)
    if found["iceberg"]:
        return "iceberg"
    if found["delta"]:
        return "delta"
    return None


def test_live_catalog_stage_roundtrip(spark):
    """Runs only on a session with a real catalog binding: write a stage,
    resume it by key, read the snapshot log, time-travel to version 1."""
    fmt = _live_catalog(spark)
    if fmt is None:
        pytest.skip("no Iceberg/Delta binding in this session (expected "
                    "in-sandbox; runs on a real cluster)")
    from pyspark.sql import functions as F

    from dedupe_spark.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(workdir=tempfile.mkdtemp(), table_format=fmt)
    p = Pipeline(spark, cfg)
    df = spark.range(100).withColumn("v", F.sha2(F.col("id").cast("string"), 256))
    out, key = p.stage("cat_stage", [], lambda: df)
    assert out.count() == 100
    out2, key2 = p.stage("cat_stage", [], lambda: df)
    assert key2 == key and p.metrics["cat_stage"]["resumed"] is True
    snaps = p.catalog.snapshots("cat_stage")
    assert len(snaps) >= 1
    tt = p.catalog.read_snapshot("cat_stage", snaps[0]["snapshot_id"])
    assert tt.count() == 100
