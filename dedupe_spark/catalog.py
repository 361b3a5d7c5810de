"""Lakehouse catalog adapter — flag-gated binding to a REAL Iceberg or
Delta catalog when the runtime carries one.

The north-star names Iceberg tables as the checkpoint substrate. This repo
implements the commit SEMANTICS (atomic snapshot publish, manifest with
schema + file list, snapshot history / time travel / retention /
compaction) on a bare filesystem in ``pipeline.Pipeline.stage`` — the
sandbox has no lakehouse jars, so that protocol is the default and stays
fully exercised by the crash-resume tests. This module is the missing
binding for clusters that DO carry a catalog: set
``PipelineConfig.table_format = "iceberg"`` (or ``"delta"``) and every
stage checkpoint becomes a real catalog table write — atomicity, snapshot
log, time travel, and expiry are then the engine's own, and the pipeline's
resume/lineage contract is preserved on top of them via table properties.

Availability is detected from the live SparkSession (no imports of any
vendor package at module level); a format that is not wired into the
session fails fast at Pipeline construction with the exact spark-submit
flags to fix it, never silently at the first stage commit.

Reference scope: the reference app checkpoints nothing (SURVEY.md §2 S5/S9
— temp files + JSON); this adapter exists for the north-star's "checkpoint
every stage to Iceberg" clause, not for reference parity.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class CatalogUnavailableError(RuntimeError):
    """Requested table format has no binding in this SparkSession."""


_ICEBERG_HINT = (
    "no Iceberg catalog is configured in this SparkSession. Launch with "
    "e.g.: spark-submit --packages "
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version> "
    "--conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog "
    "--conf spark.sql.catalog.lake.type=hadoop "
    "--conf spark.sql.catalog.lake.warehouse=<path> "
    "--conf spark.sql.extensions=org.apache.iceberg.spark.extensions."
    "IcebergSparkSessionExtensions"
)
_DELTA_HINT = (
    "Delta Lake is not wired into this SparkSession. Launch with e.g.: "
    "spark-submit --packages io.delta:delta-spark_2.13:<version> "
    "--conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
    "--conf spark.sql.catalog.spark_catalog="
    "org.apache.spark.sql.delta.catalog.DeltaCatalog"
)


def detect_catalogs(spark: SparkSession) -> dict:
    """What lakehouse bindings this session actually carries.

    Returns ``{"iceberg": [catalog names], "delta": bool}``. Iceberg is
    per-catalog (``spark.sql.catalog.<name> = ...SparkCatalog``); Delta
    hooks the session extensions + default catalog. Conf-scan only — no
    class loading, safe on any session.
    """
    icebergs: list[str] = []
    delta = False
    try:
        items = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - defensive on exotic sessions
        items = []
    seen = dict(items)
    # catalogs registered AFTER launch (spark.conf.set / SQL SET) live in
    # the session conf, not the context conf — SET enumerates both the
    # launch-time and runtime-set entries
    try:
        for r in spark.sql("SET").collect():
            seen[r["key"]] = r["value"]
    except Exception:  # pragma: no cover - exotic sessions
        pass
    for k, v in seen.items():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in str(v).lower():
                icebergs.append(k.rsplit(".", 1)[1])
    ext = str(seen.get("spark.sql.extensions", ""))
    try:  # runtime-set extensions surface via conf.get, not context conf
        ext = ext + "," + str(spark.conf.get("spark.sql.extensions", ""))
    except Exception:
        pass
    if "io.delta" in ext or "DeltaSparkSessionExtension" in ext:
        delta = True
    return {"iceberg": sorted(set(icebergs)), "delta": delta}


class TableCatalog:
    """Stage-checkpoint reads/writes against a live Iceberg/Delta catalog.

    One instance per Pipeline; every method takes the STAGE name and maps
    it to ``<catalog>.<namespace>.<stage>`` (Iceberg) or
    ``<namespace>.<stage>`` (Delta in the session catalog). The pipeline's
    resume key rides in the ``dedupe.stage_key`` table property, and stage
    metrics in ``dedupe.metrics`` — the same facts the filesystem manifest
    records, carried by the table itself so any engine reading the catalog
    sees them.
    """

    KEY_PROP = "dedupe.stage_key"
    METRICS_PROP = "dedupe.metrics"

    def __init__(
        self,
        spark: SparkSession,
        fmt: str,
        namespace: str = "dedupe",
        catalog: Optional[str] = None,
    ):
        if fmt not in ("iceberg", "delta"):
            raise ValueError(f"unknown table_format {fmt!r}")
        self.spark = spark
        self.fmt = fmt
        self.namespace = namespace
        found = detect_catalogs(spark)
        if fmt == "iceberg":
            if not found["iceberg"]:
                raise CatalogUnavailableError(_ICEBERG_HINT)
            self.catalog = catalog or found["iceberg"][0]
            if catalog is not None and catalog not in found["iceberg"]:
                raise CatalogUnavailableError(
                    f"catalog {catalog!r} is not an Iceberg catalog in this "
                    f"session (found: {found['iceberg']})"
                )
        else:
            if not found["delta"]:
                raise CatalogUnavailableError(_DELTA_HINT)
            self.catalog = catalog  # None -> session default catalog
        self._ensured = False

    # -- naming ------------------------------------------------------------

    def identifier(self, stage: str) -> str:
        parts = [self.catalog, self.namespace, stage]
        return ".".join(p for p in parts if p)

    def _ensure_namespace(self) -> None:
        if self._ensured:
            return
        ns = ".".join(p for p in (self.catalog, self.namespace) if p)
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
        self._ensured = True

    # -- resume contract ---------------------------------------------------

    def stage_key(self, stage: str) -> Optional[str]:
        """The committed stage key, or None if the table doesn't exist."""
        ident = self.identifier(stage)
        try:
            rows = self.spark.sql(f"SHOW TBLPROPERTIES {ident}").collect()
        except Exception:
            return None
        props = {r["key"]: r["value"] for r in rows}
        return props.get(self.KEY_PROP)

    def read_metrics(self, stage: str) -> Optional[dict]:
        ident = self.identifier(stage)
        try:
            rows = self.spark.sql(f"SHOW TBLPROPERTIES {ident}").collect()
        except Exception:
            return None
        props = {r["key"]: r["value"] for r in rows}
        raw = props.get(self.METRICS_PROP)
        return json.loads(raw) if raw else None

    # -- stage IO ----------------------------------------------------------

    def write_stage(self, df: DataFrame, stage: str, key: str, metrics: dict):
        """Atomic replace of the stage table — the catalog's own snapshot
        commit is the commit point (supersedes the filesystem rename
        protocol). Properties carry the resume key + metrics."""
        self._ensure_namespace()
        ident = self.identifier(stage)
        writer = (
            df.writeTo(ident)
            .tableProperty(self.KEY_PROP, key)
            .tableProperty(self.METRICS_PROP, json.dumps(metrics))
        )
        if self.fmt == "delta":
            writer = writer.using("delta")
        writer.createOrReplace()

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.table(self.identifier(stage))

    def set_metrics(self, stage: str, metrics: dict) -> None:
        """Metadata-only follow-up commit attaching stage metrics. Kept
        separate from write_stage so lineage can be computed on the
        COMMITTED table (same read-back protocol as the filesystem path);
        a crash between the two leaves a resumable table whose metrics
        simply show the write-time snapshot."""
        payload = json.dumps(metrics).replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {self.identifier(stage)} SET TBLPROPERTIES "
            f"('{self.METRICS_PROP}' = '{payload}')"
        )

    # -- snapshot history (the engine-native versions of pipeline.py's
    #    _snapshots machinery) ---------------------------------------------

    def snapshots(self, stage: str) -> list[dict]:
        ident = self.identifier(stage)
        if self.fmt == "iceberg":
            rows = self.spark.sql(
                f"SELECT snapshot_id, committed_at, operation "
                f"FROM {ident}.snapshots ORDER BY committed_at"
            ).collect()
            return [
                {
                    "snapshot_id": int(r["snapshot_id"]),
                    "committed_at": str(r["committed_at"]),
                    "operation": r["operation"],
                }
                for r in rows
            ]
        rows = self.spark.sql(f"DESCRIBE HISTORY {ident}").collect()
        # DESCRIBE HISTORY returns newest-first; normalize to the same
        # ascending chronological order as the Iceberg branch so
        # snapshots()[0] is the oldest on both engines
        return sorted(
            (
                {
                    "snapshot_id": int(r["version"]),
                    "committed_at": str(r["timestamp"]),
                    "operation": r["operation"],
                }
                for r in rows
            ),
            key=lambda e: e["snapshot_id"],
        )

    def read_snapshot(self, stage: str, snapshot_id: int) -> DataFrame:
        ident = self.identifier(stage)
        if self.fmt == "iceberg":
            return (
                self.spark.read.option("snapshot-id", snapshot_id)
                .table(ident)
            )
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", snapshot_id)
            .table(ident)
        )

    def expire_snapshots(self, stage: str, older_than: str) -> None:
        """Engine-native retention: Iceberg expire_snapshots procedure /
        Delta VACUUM. ``older_than`` is a SQL timestamp literal (Iceberg)
        or retention-hours string (Delta)."""
        ident = self.identifier(stage)
        if self.fmt == "iceberg":
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots("
                f"table => '{self.namespace}.{stage}', "
                f"older_than => TIMESTAMP '{older_than}')"
            )
        else:
            self.spark.sql(f"VACUUM {ident} RETAIN {older_than} HOURS")

    def expire_keep_last(self, stage: str, keep_last: int) -> None:
        """Count-based retention (the Pipeline.expire_snapshots contract):
        Iceberg's retain_last maps directly; Delta's retention is
        time-based only, so count-based expiry raises with guidance
        instead of silently doing nothing."""
        if self.fmt == "iceberg":
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots("
                f"table => '{self.namespace}.{stage}', "
                f"retain_last => {int(keep_last) + 1})"  # +1: the live one
            )
        else:
            raise NotImplementedError(
                "Delta retention is time-based; use "
                "TableCatalog.expire_snapshots(stage, older_than_hours) "
                "(VACUUM) instead of count-based expiry"
            )
