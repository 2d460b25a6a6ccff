"""Per-stage checkpointing with per-partition lineage counters.

North-rule requirement: a killed job resumes without recomputing completed
stages. The pattern is lifted from the reference's import-resume offsets —
``ConceptImporter`` records the consumed row offset per RRF file in
``infoMap`` after every line (ConceptImporter.java:981-997,1097,1141-1143)
and restart skips what's done. Our unit of resumability is the stage:

    {root}/{stage}/data/          parquet output of the stage
    {root}/{stage}/_manifest.json stage fingerprint + row count +
                                  per-partition lineage [(partition_id,
                                  rows_out)] + schema

A stage re-runs only when its manifest is missing or its fingerprint (a
caller-supplied digest of the stage's config + upstream fingerprints)
changed. The manifest is written AFTER the parquet commit, so a kill
between data write and manifest write re-runs the stage — never trusts a
half-written checkpoint (write-ahead ordering, same guarantee Iceberg
snapshots give; parquet-dir + manifest is the sandbox stand-in for an
Iceberg table + snapshot).

Lineage counters double as the per-partition metrics the north rule asks
for: they record how many rows each partition produced, which makes skew
visible (max/median partition ratio) without a Spark UI.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


@dataclass
class StageResult:
    name: str
    df: DataFrame
    resumed: bool
    rows: int
    lineage: list[dict]  # [{partition_id, rows_out}]


@dataclass
class CheckpointManager:
    spark: SparkSession
    root: str
    results: dict[str, StageResult] = field(default_factory=dict)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, stage)
        return os.path.join(d, "data"), os.path.join(d, "_manifest.json")

    def _load_manifest(self, stage: str) -> dict | None:
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return None
        try:
            with open(mpath) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None  # half-written manifest -> recompute

    def run_stage(self, stage: str, fp: str,
                  compute: Callable[[], DataFrame]) -> StageResult:
        """Return the stage output, reading the checkpoint when the stored
        fingerprint matches, else computing + persisting it."""
        data_path, mpath = self._paths(stage)
        manifest = self._load_manifest(stage)
        if manifest is not None and manifest.get("fingerprint") == fp:
            # drop the internal lineage column here too — resumed and fresh
            # stages must expose the identical schema
            df = self.spark.read.parquet(data_path).drop("_pid")
            res = StageResult(stage, df, resumed=True,
                              rows=manifest["rows"],
                              lineage=manifest["lineage"])
            self.results[stage] = res
            return res

        df = compute()
        # lineage: rows produced per output partition, captured in the same
        # pass that writes the data (spark_partition_id of the write plan)
        with_pid = df.withColumn("_pid", F.spark_partition_id())
        with_pid.write.mode("overwrite").parquet(data_path)
        written = self.spark.read.parquet(data_path)
        lineage_rows = (written.groupBy("_pid")
                        .agg(F.count(F.lit(1)).alias("rows_out"))
                        .collect())
        lineage = sorted(
            ({"partition_id": int(r._pid), "rows_out": int(r.rows_out)}
             for r in lineage_rows), key=lambda x: x["partition_id"])
        rows = sum(x["rows_out"] for x in lineage)

        manifest = {"stage": stage, "fingerprint": fp, "rows": rows,
                    "partitions": len(lineage), "lineage": lineage,
                    "schema": df.schema.jsonValue()}
        tmp = mpath + ".tmp"
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)  # atomic: manifest appears only when complete

        out = self.spark.read.parquet(data_path).drop("_pid")
        res = StageResult(stage, out, resumed=False, rows=rows,
                          lineage=lineage)
        self.results[stage] = res
        return res

    def skew_report(self, stage: str) -> dict:
        """Max/median partition-row ratio from the lineage counters."""
        lin = self.results[stage].lineage
        counts = sorted(x["rows_out"] for x in lin) or [0]
        med = counts[len(counts) // 2]
        return {"stage": stage, "partitions": len(counts),
                "max_rows": counts[-1], "median_rows": med,
                "skew_ratio": (counts[-1] / med) if med else None}


def run_checkpointed_pipeline(spark: SparkSession, documents: DataFrame,
                              dico, root: str, method: str | None = None,
                              context_dico=None, salt_buckets: int = 0,
                              canonicalize: bool = False,
                              table_root: str | None = None,
                              catalog: str | None = None,
                              ) -> dict[str, StageResult]:
    """The north-rule stage chain (mention-detect -> link -> canonicalize ->
    materialize) with per-stage checkpoints. Fingerprints chain: each stage
    digests its config + its upstream fingerprint, so editing a stage's
    config invalidates it and everything downstream — nothing upstream."""
    from ..config import for_search_method
    from .stages import (annotate_documents, detect_mentions,
                         materialize_triples, salt_documents,
                         split_sentences)

    cm = CheckpointManager(spark, root)
    cfg = for_search_method(method)
    dico_bc = spark.sparkContext.broadcast(dico)

    fp_sent = fingerprint("sentences", str(salt_buckets))
    sent = cm.run_stage(
        "sentences", fp_sent,
        lambda: split_sentences(salt_documents(documents, salt_buckets)))

    fp_men = fingerprint("mentions", fp_sent, str(method),
                         "ctx" if context_dico is not None else "")
    if context_dico is not None:
        ctx_bc = spark.sparkContext.broadcast(context_dico)
        men = cm.run_stage(
            "mentions", fp_men,
            lambda: annotate_documents(sent.df, dico_bc, ctx_bc, cfg))
    else:
        men = cm.run_stage(
            "mentions", fp_men,
            lambda: detect_mentions(sent.df, dico_bc, cfg))

    canonical = None
    fp_canon = fingerprint("canonical", fp_men, str(canonicalize))
    if canonicalize:
        def build_canonical():
            from ..graph.canonicalize import canonical_map
            from ..terminology.build import build_terminology
            tables = build_terminology(
                spark, list(dico.concepts.values()), dico.build_config)
            return canonical_map(tables["term_index"], tables["code_xref"])
        canon_res = cm.run_stage("canonical", fp_canon, build_canonical)
        canonical = canon_res.df

    fp_tri = fingerprint("triples", fp_canon)
    tri = cm.run_stage(
        "triples", fp_tri,
        lambda: materialize_triples(men.df, spark, dico, canonical=canonical))
    if table_root is not None:
        # land the final table through an all-or-nothing snapshot commit,
        # exactly once per fingerprint: the stage checkpoint dedups the
        # COMPUTE, this dedups the VISIBILITY (resume after a crash between
        # checkpoint and commit re-commits; resume after success no-ops)
        from .tables import commit_triples_idempotent
        commit_triples_idempotent(spark, tri.df, table_root, fp_tri,
                                  catalog=catalog)
    return cm.results
