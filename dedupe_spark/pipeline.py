"""Staged, checkpointed, resumable record-linkage pipeline (SURVEY.md §3/§7).

``ingest -> normalize -> block -> candidates -> score -> cluster -> assemble``,
each stage a pure DataFrame -> DataFrame function that writes a parquet
checkpoint plus a metrics JSON and can be resumed: a stage whose content key
(hash of config + upstream keys) matches an existing checkpoint is read back
instead of recomputed (north rule: "resumable from checkpoint with
per-partition lineage + metrics"). On a cluster the checkpoint format would
be Iceberg; parquet-dir-with-key-file is the sandbox stand-in with the same
semantics (atomic _SUCCESS, schema-stable, partition-count recorded).

The reference's equivalent lifecycle is the monolithic
``find_duplicates_in_files`` control flow
(/root/reference/backend/dedupe_script.py:173-419) — no checkpoints, driver
memory only, clusters truncated at 1,000-row chunk boundaries (§2.7). This
pipeline clusters globally.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import LogisticModel, fit_logistic
from .normalize import normalize_features
from .operators import blocking as B
from .operators import clustering as C
from .operators import scoring as SC
from .operators.assemble import assemble_clusters
from .operators.scoring import FieldSpec, compute_features, feature_names

# ---------------------------------------------------------------------------
# Page preparation: derived match fields (the reference matches on all input
# columns; for web pages the match fields are derived from url + text)
# ---------------------------------------------------------------------------

PAGE_FIELDS = [
    FieldSpec("host", "String"),
    FieldSpec("path", "String"),
    FieldSpec("title", "String"),
    FieldSpec("body", "Text"),
]

# dedupe-parity comparator set (SURVEY.md M1): String fields use the
# normalized affine-gap alignment (Gotoh; dedupeio/affinegap public
# weights), Text uses corpus-weighted TF-IDF cosine (idf injected by
# Pipeline.run from the records stage).
PAGE_FIELDS_DEDUPE = [
    FieldSpec("host", "Affine"),
    FieldSpec("path", "Affine"),
    FieldSpec("title", "Affine"),
    FieldSpec("body", "Text"),
]


def prepare_pages(pages: DataFrame, spread: bool = True) -> DataFrame:
    """Add derived match fields. NEVER touches ``text`` itself — the
    byte-identity invariant (input_hint) is that text passes through
    unchanged per url; match features live in new columns.

    ``spread`` (default True): repartition to defaultParallelism before the
    pandas-UDF normalize stage — small/singleton inputs scan as 1 partition
    and would serialize it. A caller flag, not a getNumPartitions() probe:
    materializing the partition count under AQE executes the upstream plan
    as throwaway jobs (see scoring.score_pairs). Pass False when the input
    arrives pre-partitioned (a bucketed table, a checkpoint read-back)."""
    if spread:
        pages = pages.repartition(
            pages.sparkSession.sparkContext.defaultParallelism
        )
    df = pages.withColumn(
        "host",
        F.regexp_replace(
            F.regexp_extract("url", r"^[a-zA-Z]+://([^/]+)", 1), r"^www\.", ""
        ),
    )
    df = df.withColumn("path", F.regexp_extract("url", r"^[a-zA-Z]+://[^/]+([^?#]*)", 1))
    df = df.withColumn(
        "title", F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 8), " ")
    )
    df = df.withColumn("body", F.col("text"))
    return normalize_features(df, ["host", "path", "title", "body"])


def page_predicates(norm_suffix: str = "_norm") -> dict:
    """Blocking predicates for pages: host+first-title-token (cheap, JVM-side)
    and MinHash-LSH bands over the normalized body (catches text edits)."""
    hostcol = "host" + norm_suffix
    titlecol = "title" + norm_suffix
    bodycol = "body" + norm_suffix
    mh = B.minhash_bands_udf(num_perm=32, bands=8, shingle_k=5)
    return {
        "host_t1": F.concat_ws("|", F.col(hostcol), B.first_tokens(titlecol, 1)),
        "host_path8": F.concat_ws(
            "|", F.col(hostcol), F.substring(F.col("path" + norm_suffix), 1, 12)
        ),
        "mh_body": mh(F.col(bodycol)),
    }


# ---------------------------------------------------------------------------
# Training (SURVEY.md M2-M5): driver-side LR on a small labeled pair set
# ---------------------------------------------------------------------------


def train_model(
    records: DataFrame,
    labeled_pairs: DataFrame,
    fields: list[FieldSpec],
    id_col: str = "url",
    norm_suffix: str = "_norm",
    l2: float = 0.1,
) -> LogisticModel:
    """Join labels to normalized fields, compute features driver-side, fit LR.

    'u' labels are filtered (reference page.tsx:253). The labeled set is
    small by construction (reference trains on ≤400 rows / ~10²-10³ pairs),
    so a driver-side fit + closure-shipped weights is the right scale split.
    """
    lab = labeled_pairs.where(F.col("label").isin("y", "n")).select(
        F.col("url1").alias("id1"), F.col("url2").alias("id2"), "label"
    )
    field_cols = [f.name + norm_suffix for f in fields]
    wide = SC.attach_pair_fields(lab, records, id_col, field_cols).toPandas()
    left = {f.name: wide[f"l_{f.name}{norm_suffix}"] for f in fields}
    right = {f.name: wide[f"r_{f.name}{norm_suffix}"] for f in fields}
    X = compute_features(left, right, fields)
    y = (wide["label"] == "y").to_numpy(dtype=np.float64)
    return fit_logistic(X, y, l2=l2, feature_names=feature_names(fields))


def uncertain_pairs(
    scored: DataFrame, k: int = 10
) -> DataFrame:
    """Active-learning pair selection (M3): top-k closest to the boundary."""
    return scored.orderBy(F.abs(F.col("score") - 0.5).asc(), "id1", "id2").limit(k)


# ---------------------------------------------------------------------------
# Checkpointed pipeline
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    workdir: str
    threshold: float = 0.5
    max_block: int = 500
    salt_target: int = 100
    id_col: str = "url"
    norm_suffix: str = "_norm"
    fields: list[FieldSpec] = field(default_factory=lambda: list(PAGE_FIELDS))
    l2: float = 0.1
    # "none" -> unweighted token cosine for Text fields; "corpus" -> compute
    # a bounded IDF table from the records stage and weight the cosine
    tfidf: str = "none"
    idf_top_k: int = 1 << 18
    # within-component hierarchical refinement (SURVEY M9 optional step):
    # splits weakly-chained components at the threshold's cophenetic cut
    refine: bool = False

    def key_dict(self) -> dict:
        return {
            "threshold": self.threshold,
            "max_block": self.max_block,
            "salt_target": self.salt_target,
            "id_col": self.id_col,
            "fields": [(f.name, f.type, f.has_missing) for f in self.fields],
            "l2": self.l2,
            "tfidf": self.tfidf,
            "refine": self.refine,
        }


class Pipeline:
    """Runs the staged pipeline with parquet checkpoints + metrics JSON."""

    def __init__(self, spark: SparkSession, config: PipelineConfig):
        self.spark = spark
        self.cfg = config
        os.makedirs(config.workdir, exist_ok=True)
        self.metrics: dict[str, dict] = {}

    # -- checkpoint machinery ------------------------------------------------

    def _stage_key(self, name: str, parents: list[str]) -> str:
        payload = json.dumps(
            {"stage": name, "config": self.cfg.key_dict(), "parents": parents},
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def stage(self, name: str, parents: list[str], compute) -> tuple[DataFrame, str]:
        """Read checkpoint if its key matches, else compute + write.

        Returns (DataFrame, stage_key). Metrics: rows, partitions, seconds,
        key — written to <workdir>/<name>.metrics.json.
        """
        key = self._stage_key(name, parents)
        path = os.path.join(self.cfg.workdir, name)
        keyfile = path + ".key"
        mfile = path + ".metrics.json"
        if os.path.exists(keyfile) and open(keyfile).read().strip() == key:
            df = self.spark.read.parquet(path)
            self.metrics[name] = json.load(open(mfile)) | {"resumed": True}
            return df, key
        t0 = time.time()
        df = compute()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage (north_star: "checkpoint every stage ...
        # with per-partition lineage and metrics"): row count per read-back
        # partition of the written checkpoint — one aggregate job, same
        # cost as the plain count it replaces, and it makes skew in a
        # checkpointed stage visible in the metrics instead of only at the
        # next shuffle
        from pyspark.sql import functions as _F

        prows = {
            str(r["pid"]): int(r["n"])
            for r in out.groupBy(_F.spark_partition_id().alias("pid"))
            .agg(_F.count("*").alias("n"))
            .collect()
        }
        m = {
            "stage": name,
            "key": key,
            "rows": sum(prows.values()),
            # scan partition count, INCLUDING empty ones (partition_rows
            # only lists non-empty partitions — spark_partition_id rows
            # can't witness an empty partition); read-back parquet scan,
            # so the .rdd probe is contract-safe here (see _spread)
            "partitions": out.rdd.getNumPartitions(),
            "partition_rows": prows,
            "seconds": round(time.time() - t0, 3),
            "resumed": False,
        }
        self.metrics[name] = m
        with open(mfile, "w") as fh:
            json.dump(m, fh)
        with open(keyfile, "w") as fh:
            fh.write(key)
        return out, key

    # -- end-to-end ----------------------------------------------------------

    def run(self, pages: DataFrame, labeled_pairs: DataFrame) -> dict[str, DataFrame]:
        cfg = self.cfg
        records, k_rec = self.stage("records", [], lambda: prepare_pages(pages))

        if cfg.tfidf == "corpus":
            import dataclasses

            from .functions.text import compute_idf

            cfg = dataclasses.replace(
                cfg,
                fields=[
                    dataclasses.replace(
                        f,
                        idf=(idf_pair := compute_idf(
                            records, f.name + cfg.norm_suffix, top_k=cfg.idf_top_k
                        ))[0],
                        default_idf=idf_pair[1],
                    )
                    if f.type == "Text"
                    else f
                    for f in cfg.fields
                ],
            )

        model = train_model(
            records, labeled_pairs, cfg.fields, cfg.id_col, cfg.norm_suffix, cfg.l2
        )
        model_key = hashlib.sha256(
            json.dumps(model.to_dict(), sort_keys=True).encode()
        ).hexdigest()[:16]
        with open(os.path.join(cfg.workdir, "model.json"), "w") as fh:
            json.dump(model.to_dict(), fh)

        blocks, k_blk = self.stage(
            "blocks",
            [k_rec],
            lambda: B.generate_blocks(
                records, cfg.id_col, page_predicates(cfg.norm_suffix)
            ),
        )
        cands, k_cnd = self.stage(
            "candidate_pairs",
            [k_blk],
            lambda: B.candidate_pairs(blocks, cfg.max_block, cfg.salt_target),
        )
        # no silent caps: record what the mega-block guard discarded
        # (skipped on resume — the stats were computed with the checkpoint)
        if not self.metrics["candidate_pairs"].get("resumed"):
            self.metrics["blocks_dropped"] = B.warn_dropped_blocks(
                blocks, cfg.max_block, context="pipeline.candidate_pairs"
            )
        scored, k_sco = self.stage(
            "scored_pairs",
            [k_cnd, model_key],
            lambda: SC.score_pairs(
                cands, records, model, cfg.fields, cfg.id_col, cfg.norm_suffix
            ),
        )
        # blocking recall of labeled positives — the guard metric for
        # mega-block capping (SURVEY.md §7 hard part #1)
        from .training import blocking_recall

        positives = labeled_pairs.where(F.col("label") == "y").select(
            F.col("url1").alias("id1"), F.col("url2").alias("id2")
        )
        self.metrics["blocking_recall"] = {
            "labeled_positive_recall": blocking_recall(cands, positives)
        }

        edges = scored.where(F.col("score") >= F.lit(cfg.threshold))

        def _cluster():
            assign = C.connected_components(edges)
            if cfg.refine:
                assign = C.refine_components(assign, edges, cfg.threshold)
            return C.member_confidence(assign, edges)

        assign, k_asn = self.stage(
            "cluster_assignments",
            [k_sco, f"th={cfg.threshold}", f"refine={cfg.refine}"],
            _cluster,
        )
        clusters, _ = self.stage(
            "clusters",
            [k_asn],
            lambda: assemble_clusters(
                assign.withColumnRenamed("confidence", "confidence"),
                records,
                cfg.id_col,
                ["url", "lang"],
            ),
        )
        with open(os.path.join(cfg.workdir, "pipeline.metrics.json"), "w") as fh:
            json.dump(self.metrics, fh, indent=1)
        return {
            "records": records,
            "blocks": blocks,
            "candidate_pairs": cands,
            "scored_pairs": scored,
            "assignments": assign,
            "clusters": clusters,
            "model": model,
        }


# ---------------------------------------------------------------------------
# Evaluation: pairwise F1 vs labeled pairs (BASELINE.json metric)
# ---------------------------------------------------------------------------


def pairwise_f1(assignments: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Predict match iff both urls land in the same cluster; F1 over labels."""
    a1 = assignments.select(
        F.col("record_id").alias("url1"), F.col("cluster_id").alias("c1")
    )
    a2 = assignments.select(
        F.col("record_id").alias("url2"), F.col("cluster_id").alias("c2")
    )
    lab = (
        labeled_pairs.where(F.col("label").isin("y", "n"))
        .join(a1, "url1", "left")
        .join(a2, "url2", "left")
        .withColumn(
            "pred",
            (F.col("c1").isNotNull() & (F.col("c1") == F.col("c2"))).cast("int"),
        )
        .withColumn("actual", (F.col("label") == "y").cast("int"))
    )
    agg = lab.agg(
        F.sum(F.col("pred") * F.col("actual")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("actual"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("actual")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"] or 0), int(agg["fp"] or 0), int(agg["fn"] or 0)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


def pages_df(spark: SparkSession, pages_pd: pd.DataFrame) -> DataFrame:
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(pages_pd, schema=schema)
