"""B-group sinks: mention RESULTS.tsv export and triple table writes.

B1 format per the reference (``util/CSVExporter.export(Document)``,
CSVExporter.java:124-143): one row per mention —
``doc <TAB> mention text <TAB> code <TAB> concept name <TAB> semantic
types (comma-joined) <TAB> "text/offset, text/offset" annotations
[<TAB> modifier values...]``.

All column shaping is JVM-side; the write is a plain distributed
``df.write.csv`` (one shard per partition — at scale this IS the export,
no driver funnel)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_COLUMNS = ["doc", "matched_text", "code", "concept_name",
                  "semantic_types", "annotations"]


def mentions_to_results(mentions: DataFrame,
                        include_modifiers: bool = True) -> DataFrame:
    """Shape the mentions frame into the RESULTS.tsv column layout."""
    ann = F.concat_ws(
        ", ", F.transform(
            "annotations",
            lambda a: F.concat_ws("/", a["text"], a["offset"].cast("string"))))
    out = mentions.select(
        F.col("doc_id").alias("doc"),
        F.col("matched_term").alias("matched_text"),
        F.col("cui").alias("code"),
        "concept_name",
        F.concat_ws(", ", "sem_types").alias("semantic_types"),
        ann.alias("annotations"),
        *(["modifiers"] if include_modifiers
          and "modifiers" in mentions.columns else []))
    if include_modifiers and "modifiers" in mentions.columns:
        out = out.withColumn(
            "modifier_values",
            F.concat_ws("\t", F.map_values(F.col("modifiers")))).drop("modifiers")
    return out


def write_results_tsv(mentions: DataFrame, path: str,
                      single_file: bool = False) -> None:
    """Write RESULTS.tsv (sharded; ``single_file`` coalesces for
    test-scale golden comparison only — never at corpus scale)."""
    out = mentions_to_results(mentions)
    if single_file:
        out = out.coalesce(1)
    (out.write.mode("overwrite")
     .option("sep", "\t").option("header", "true").csv(path))


def write_triples(triples: DataFrame, path: str,
                  partition_by_pred: bool = True) -> None:
    """B3: the triple table sink — parquet partitioned by predicate so
    isa-only and mention-only readers prune at the directory level."""
    w = triples.write.mode("overwrite")
    if partition_by_pred:
        w = w.partitionBy("pred")
    w.parquet(path)


def write_eval_report(report: DataFrame, path: str) -> None:
    """B5: the per-concept confusion report as a TSV
    (eval/AnnotationEvaluation.java:91-105 analog)."""
    (report.coalesce(1).write.mode("overwrite")
     .option("sep", "\t").option("header", "true").csv(path))
