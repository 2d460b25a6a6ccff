"""JSONL document source/sink — the LLM-corpus interchange format.

Real crawl/corpus dumps arrive as line-delimited JSON (one document per
line: ``{"doc_id": ..., "text": ..., ...metadata}``). This module reads
them into the flat document shape the pipeline's adapters consume, with
malformed lines QUARANTINED (counted and kept, never silently dropped —
at 100 TB a 0.1% silent drop is a million documents), and writes the
pipeline's curated output back out as sharded JSONL.

Spark-native end to end: the read is ``spark.read.json`` with
PERMISSIVE mode + ``columnNameOfCorruptRecord`` (corrupt rows carry the
raw line, good rows carry parsed columns), the write is ``.write.json``.
No Python in either path.
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
    (schema-on-read column pruning; a 50-field crawl line costs only the
    four projected fields). ``quarantine``: the raw line + a reason, for
    reprocessing — unparseable JSON, or parseable JSON missing a
    required field."""
    raw = (spark.read
           .schema(FLAT_DOC_SCHEMA)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT)
           .json(path))
    # Spark disallows querying ONLY the corrupt-record column off a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    # pattern is to cache the parsed frame first; both returned frames
    # then share the single parse pass instead of re-reading the files
    raw = raw.cache()
    ok = (raw.where(F.col(_CORRUPT).isNull()
                    & F.col("doc_id").isNotNull()
                    & F.col("text").isNotNull())
          .select("doc_id", "text", "lang", "source"))
    bad_parse = (raw.where(F.col(_CORRUPT).isNotNull())
                 .select(F.col(_CORRUPT).alias("raw"),
                         F.lit("unparseable").alias("reason")))
    bad_fields = (raw.where(F.col(_CORRUPT).isNull()
                            & (F.col("doc_id").isNull()
                               | F.col("text").isNull()))
                  .select(F.to_json(F.struct("doc_id", "text", "lang",
                                             "source")).alias("raw"),
                          F.lit("missing_required_field").alias("reason")))
    return ok, bad_parse.unionByName(bad_fields)


def write_documents_jsonl(docs: DataFrame, path: str,
                          single_file: bool = False) -> None:
    """Sharded JSONL sink (``single_file`` coalesces for test-scale
    golden comparison only — never at corpus scale)."""
    out = docs.coalesce(1) if single_file else docs
    out.write.mode("overwrite").json(path)
