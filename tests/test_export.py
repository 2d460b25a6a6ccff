"""B1 RESULTS.tsv export + B3 triple sink tests."""

from pyspark.sql import functions as F

from nobletools_spark.pipeline.documents import generate_documents
from nobletools_spark.pipeline.export import (mentions_to_results,
                                              write_results_tsv,
                                              write_triples)
from nobletools_spark.pipeline.stages import run_pipeline
from nobletools_spark.terminology.fixture import fixture_dictionary


def test_results_tsv_roundtrip(spark, tmp_path):
    docs = generate_documents(spark, 10, seed=21, partitions=2)
    out = run_pipeline(spark, docs, fixture_dictionary(), "best-match")
    res = mentions_to_results(out["mentions"])
    assert res.columns == ["doc", "matched_text", "code", "concept_name",
                           "semantic_types", "annotations"]
    rows = res.collect()
    assert rows
    for r in rows[:10]:
        # "text/offset, text/offset" annotation format
        for part in r.annotations.split(", "):
            txt, off = part.rsplit("/", 1)
            assert txt and int(off) >= 0

    path = str(tmp_path / "results")
    write_results_tsv(out["mentions"], path, single_file=True)
    back = (spark.read.option("sep", "\t").option("header", "true").csv(path))
    assert back.count() == res.count()
    assert set(back.columns) == set(res.columns)


def test_triple_sink_partitioned_by_pred(spark, tmp_path):
    docs = generate_documents(spark, 10, seed=22, partitions=2)
    out = run_pipeline(spark, docs, fixture_dictionary(), "best-match")
    path = str(tmp_path / "triples")
    write_triples(out["triples"], path)
    back = spark.read.parquet(path)
    assert back.count() == out["triples"].count()
    # predicate partition pruning: reading one pred touches one directory
    isa = back.where(F.col("pred") == "isa")
    assert "PartitionFilters" in isa._jdf.queryExecution().executedPlan().toString() \
        or isa.count() > 0
