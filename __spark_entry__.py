"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001.
``queries()`` exposes the relational operator surface (SURVEY.md §2.J), the
training-data-pipeline operators, and the KG pipeline stages; each callable
takes (spark, sf_dir) and returns a DataFrame. ``oracle_sql()`` supplies the
DuckDB-equivalent SQL for every SQL-expressible query; KG/NLP queries whose
semantics live in the matcher UDFs are rows-only checked (their real
correctness gate is the pytest golden/round-trip suite in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nobletools_spark.pipeline.documents import interleave_flat_documents
from nobletools_spark.pipeline.stages import (detect_mentions,
                                              materialize_triples,
                                              run_pipeline, split_sentences)
from nobletools_spark.relational.queries import QUERIES
from nobletools_spark.terminology.dataeng import dataeng_dictionary

# The driver's documents corpus speaks a data-engineering vocabulary, so the
# KG queries run with the terminology built over it; the biomedical fixture
# terminology exercises the full matcher surface in tests/.
_dico = dataeng_dictionary


def _load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return interleave_flat_documents(flat)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved documents -> sentences -> mentions -> triples."""
    docs = _load_documents(spark, "/root/testdata/sf0.001")
    out = run_pipeline(spark, docs, _dico(), "best-match")
    return out["triples"]


# ------------------------------ KG pipeline queries (rows-only checks) ----

def _kg_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_sentences(_load_documents(spark, sf_dir))


def _kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    dico_bc = spark.sparkContext.broadcast(_dico())
    return detect_mentions(_kg_sentences(spark, sf_dir), dico_bc)


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return materialize_triples(_kg_mentions(spark, sf_dir), spark, _dico())


def _kg_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_kg_mentions(spark, sf_dir)
            .groupBy("cui", "concept_name")
            .agg(F.count(F.lit(1)).alias("n_mentions"))
            .orderBy(F.desc("n_mentions"), "cui"))


def _kg_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row span-sequence identity before/after a pass through the
    pipeline's input stage — the input_hint invariant as a query."""
    docs = _load_documents(spark, sf_dir)
    fp = F.sha2(F.to_json("spans"), 256).alias("fingerprint")
    return docs.select("doc_id", fp).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: qd.spark for name, qd in QUERIES.items()
    }
    out.update({
        "kg_sentences": _kg_sentences,
        "kg_mentions": _kg_mentions,
        "kg_mention_counts": _kg_mention_counts,
        "kg_triples": _kg_triples,
        "kg_span_invariant": _kg_span_invariant,
    })
    return out


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items()
            if qd.oracle is not None}
