"""Synthetic large-vocabulary generator + broadcast-vs-shuffle comparison
(H5/P2 scale evidence). Generates an n-term two-word vocabulary entirely
in Spark (no driver loop), builds the dictionary tables with the standard
build code, and runs the same sentence set through the broadcast-compact
path and the shuffle-join path.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_vocab(spark: SparkSession, n_concepts: int,
                    shared_words: int = 50_000) -> DataFrame:
    """-> CONCEPTS_SCHEMA frame: each concept has a unique two-word
    synonym 'w{a} u{i}' whose first word comes from a shared pool, giving
    the word index realistic fan-out; plus the unique word itself."""
    from nobletools_spark.terminology.build import CONCEPTS_SCHEMA
    base = spark.range(0, n_concepts, 1,
                       spark.sparkContext.defaultParallelism)
    a = (F.col("id") % shared_words).cast("string")
    term = F.concat(F.lit("w"), a, F.lit(" u"), F.col("id").cast("string"))
    uniq = F.concat(F.lit("u"), F.col("id").cast("string"))
    cui = F.concat(F.lit("V"), F.lpad(F.col("id").cast("string"), 8, "0"))
    empty_s = F.array().cast("array<string>")
    return base.select(
        F.col("id").alias("_idx"),
        cui.alias("cui"), term.alias("name"),
        F.array(term, uniq).alias("synonyms"),
        F.array(F.lit("T000")).alias("sem_types"),
        F.array(F.lit("SYN")).alias("sources"),
        F.array(F.struct(term.alias("text"),
                         F.lit("PT").alias("form"))).alias("terms"),
        empty_s.alias("definitions"),
        F.array().cast(CONCEPTS_SCHEMA["codes"].dataType).alias("codes"),
    )


def build_vocab_tables(spark: SparkSession, n_concepts: int):
    from nobletools_spark.terminology.build import (build_tables,
                                                    compact_word_index)
    cdf = synthetic_vocab(spark, n_concepts)
    tables = build_tables(cdf)
    tables["word_index_compact"] = compact_word_index(
        tables["term_index"], tables["word_stats"])
    for k in ("concepts", "term_index", "word_index", "word_stats",
              "word_index_compact"):
        tables[k] = tables[k].cache()
        tables[k].count()
    return tables


def vocab_sentences(spark: SparkSession, tables, n_sents: int = 2000):
    """Sentences quoting a sample of vocabulary terms + noise words."""
    sample = [r.term for r in
              tables["term_index"].limit(n_sents).collect()]
    rows = [(f"d{i}", 0, "Prose",
             f"patient shows {t} and also some noise tokens here", 0, 0)
            for i, t in enumerate(sample)]
    from nobletools_spark.pipeline.stages import SENTENCES_SCHEMA
    return spark.createDataFrame(rows, schema=SENTENCES_SCHEMA) \
        .repartition(spark.sparkContext.defaultParallelism)


def compare_paths(spark: SparkSession, n_concepts: int = 1_000_000,
                  n_sents: int = 2000) -> dict:
    from nobletools_spark.config import for_search_method
    from nobletools_spark.pipeline.shuffle_match import (
        detect_mentions_shuffle, estimate_dictionary_bytes)
    from nobletools_spark.pipeline.stages import detect_mentions
    from nobletools_spark.terminology.build import dictionary_from_tables

    t0 = time.time()
    tables = build_vocab_tables(spark, n_concepts)
    build_sec = round(time.time() - t0, 2)

    sents = vocab_sentences(spark, tables, n_sents).cache()
    sents.count()

    def keyset(df):
        return {(r.doc_id, r.sent_id, r.cui, r.normalized_term, r.start,
                 r.end, round(r.score, 6)) for r in df.collect()}

    t0 = time.time()
    shuffle_out = detect_mentions_shuffle(
        sents, tables, for_search_method("best-match"))
    shuffle_keys = keyset(shuffle_out)
    n_shuffle = len(shuffle_keys)
    shuffle_sec = round(time.time() - t0, 2)

    t0 = time.time()
    dico = dictionary_from_tables(tables)
    dico.word_map = {r.word: tuple(r.terms)
                     for r in tables["word_index_compact"].collect()}
    dico.blacklist = {}
    collect_sec = round(time.time() - t0, 2)
    est = estimate_dictionary_bytes(dico)

    t0 = time.time()
    bc = spark.sparkContext.broadcast(dico)
    broadcast_out = detect_mentions(
        sents, bc, for_search_method("best-match", compacted=True))
    broadcast_keys = keyset(broadcast_out)
    broadcast_sec = round(time.time() - t0, 2)
    bc.destroy()

    return {
        "n_concepts": n_concepts, "n_sents": n_sents,
        "build_sec": build_sec,
        "dict_bytes": est, "dict_collect_sec": collect_sec,
        "shuffle_mentions": n_shuffle, "shuffle_sec": shuffle_sec,
        "broadcast_mentions": len(broadcast_keys),
        "broadcast_sec": broadcast_sec,
        "parity": shuffle_keys == broadcast_keys,
    }


if __name__ == "__main__":
    import json
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(compare_paths(spark, n)))
