"""JSONL document source/sink — the LLM-corpus interchange format.

Real crawl/corpus dumps arrive as line-delimited JSON (one document per
line: ``{"doc_id": ..., "text": ..., ...metadata}``). This module reads
them into the flat document shape the pipeline's adapters consume, with
malformed lines QUARANTINED (counted and kept, never silently dropped —
at 100 TB a 0.1% silent drop is a million documents), and writes the
pipeline's curated output back out as sharded JSONL.

Spark-native end to end: the read is ``spark.read.text`` +
``from_json`` with PERMISSIVE mode + ``columnNameOfCorruptRecord``
(so every quarantined row carries the ORIGINAL line — extra JSON keys
and all — for full-fidelity reprocessing), the write is
``.write.json``. No Python in either path, and no corpus-wide cache:
each returned branch re-scans lazily, a stateless map stage at any
scale (the old ``spark.read.json`` + ``.cache()`` pattern pinned the
whole parsed corpus — full text plus corrupt copies — in executor
memory on a path advertised for 100-TB crawl dumps, and re-serialized
quarantined rows from only the four schema fields, dropping the extra
keys the "raw line" promise exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

_CORRUPT = "_corrupt_record"

FLAT_DOC_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.LongType(), True),
    ST.StructField("text", ST.StringType(), True),
    ST.StructField("lang", ST.StringType(), True),
    ST.StructField("source", ST.StringType(), True),
    ST.StructField(_CORRUPT, ST.StringType(), True),
])


def read_documents_jsonl(spark: SparkSession, path: str
                         ) -> tuple[DataFrame, DataFrame]:
    """-> (documents, quarantine).

    ``documents``: rows that parsed AND carry the two required fields
    (doc_id, text) — extra JSON keys are ignored by the explicit schema
    (schema-on-read pruning; a 50-field crawl line costs only the four
    projected fields' parse work). ``quarantine``: the ORIGINAL raw
    line + a reason, for reprocessing — unparseable/partially-parseable
    JSON, or parseable JSON missing a required field. Blank lines are
    skipped (the ``spark.read.json`` convention)."""
    parsed = (spark.read.text(path)
              .where(F.length(F.trim("value")) > 0)
              .select(F.col("value").alias("raw"),
                      F.from_json(
                          "value", FLAT_DOC_SCHEMA,
                          {"mode": "PERMISSIVE",
                           "columnNameOfCorruptRecord": _CORRUPT})
                      .alias("j")))
    ok = (parsed.where(F.col(f"j.{_CORRUPT}").isNull()
                       & F.col("j.doc_id").isNotNull()
                       & F.col("j.text").isNotNull())
          .select("j.doc_id", "j.text", "j.lang", "j.source"))
    bad = (parsed.where(F.col(f"j.{_CORRUPT}").isNotNull()
                        | F.col("j.doc_id").isNull()
                        | F.col("j.text").isNull())
           .select("raw",
                   F.when(F.col(f"j.{_CORRUPT}").isNotNull(),
                          F.lit("unparseable"))
                   .otherwise(F.lit("missing_required_field"))
                   .alias("reason")))
    return ok, bad


def write_documents_jsonl(docs: DataFrame, path: str,
                          single_file: bool = False) -> None:
    """Sharded JSONL sink (``single_file`` coalesces for test-scale
    golden comparison only — never at corpus scale)."""
    out = docs.coalesce(1) if single_file else docs
    out.write.mode("overwrite").json(path)
