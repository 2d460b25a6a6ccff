"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the KG construction pipeline (documents -> sentences ->
mentions -> triples, the north-rule path) plus representative relational /
training-data operators. `value` is total wall seconds across headline
queries; per-query seconds under "queries"; KG throughput (docs/sec) and
scaling inputs reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_spark(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("nobletools-spark-bench")
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .getOrCreate())


HEADLINE_RELATIONAL = [
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "window_top_orders_per_customer",
    "dedup_exact_documents",
    "doc_token_stats",
    "embedding_cosine_topk",
]


def run(sf_dir: str, cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from nobletools_spark.pipeline.documents import interleave_flat_documents
    from nobletools_spark.pipeline.stages import run_pipeline

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    results: dict[str, float] = {}

    # -- KG pipeline (the north-rule path), measured as one query --
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = flat.count()
    docs = interleave_flat_documents(flat)
    t0 = time.time()
    out = run_pipeline(spark, docs, entry_mod._dico(), "best-match")
    n_triples = out["triples"].count()
    kg_sec = time.time() - t0
    results["kg_pipeline"] = round(kg_sec, 3)

    for name in HEADLINE_RELATIONAL:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    payload = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_docs": n_docs,
        "kg_triples": n_triples,
        "kg_docs_per_sec": round(n_docs / kg_sec, 1) if kg_sec > 0 else None,
    }
    spark.stop()
    return payload


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run(sf_dir, cpus)))
