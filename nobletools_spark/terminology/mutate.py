"""H7: incremental concept mutation over the built dictionary tables.

Reference semantics: ``NobleCoderTerminology.removeConcept``:1235-1255
(drop the concept's terms from the term map, unfile them from each word's
posting list, drop words left empty) and ``updateConcept``:1260-1264
(remove + add). One deliberate divergence, documented here: the reference
removes a term's ENTIRE termMap entry even when other concepts share the
synonym; this MERGE removes only the concept's cui and keeps the shared
entry alive, so update-in-place is exactly equivalent to a full rebuild —
the contract the round-trip tests pin.

Every mutation is expressed as a delta MERGE on the core DataFrames
(concepts / term_index / word_index / word_stats / regex_terms /
code_xref): the new or removed concept is built into a one-concept set of
mini-tables with the SAME build code, then merged with outer joins — no
table is rebuilt from scratch. Derived tables (blacklist, compacted
index) are recomputed from the merged cores: they are corpus-statistics
artifacts, cheap relative to the vocabulary (blacklist keys on 0.2% of
words) and only needed when the caller persisted them. At scale each
merge is one shuffle keyed on term/word — proportional to the DELTA's
terms, not the vocabulary, thanks to partial aggregation and AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import SearchConfig
from .build import (apply_term_filter, build_blacklist_df, build_tables,
                    compact_word_index, concepts_df, select_preferred_names)

CORE = ("concepts", "term_index", "word_index", "word_stats",
        "regex_terms", "code_xref")


def _delta_tables(spark: SparkSession, concept: dict, cfg: SearchConfig,
                  idx: int, term_filter: bool) -> dict[str, DataFrame]:
    cdf = concepts_df(spark, [concept]).withColumn("_idx", F.lit(idx))
    if term_filter:
        cdf = apply_term_filter(cdf)
    cdf = select_preferred_names(cdf)
    return build_tables(cdf, cfg)


def _rederive(tables: dict[str, DataFrame],
              had: dict[str, bool]) -> dict[str, DataFrame]:
    if had.get("blacklist"):
        tables["blacklist"] = build_blacklist_df(
            tables["word_index"], tables["word_stats"])
    if had.get("word_index_compact"):
        tables["word_index_compact"] = compact_word_index(
            tables["term_index"], tables["word_stats"])
    return tables


def add_concept(tables: dict[str, DataFrame], concept: dict,
                cfg: SearchConfig | None = None,
                term_filter: bool = False) -> dict[str, DataFrame]:
    """addConcept:1142-1214 as a delta MERGE. The new concept appends at
    the end of the insertion order (max _idx + 1), matching a sequential
    import; existing code_xref rows win per putIfAbsent (:1207-1211)."""
    cfg = cfg or SearchConfig()
    spark = tables["concepts"].sparkSession
    max_idx = tables["concepts"].agg(F.max("_idx")).collect()[0][0]
    idx = (max_idx if max_idx is not None else -1) + 1
    delta = _delta_tables(spark, concept, cfg, idx, term_filter)
    had = {k: k in tables for k in ("blacklist", "word_index_compact")}

    out = dict(tables)
    out["concepts"] = tables["concepts"].unionByName(delta["concepts"])

    ti = (tables["term_index"].withColumnRenamed("cuis", "_old")
          .join(delta["term_index"].withColumnRenamed("cuis", "_new"),
                "term", "full_outer"))
    empty = F.array().cast("array<string>")
    out["term_index"] = ti.select(
        "term",
        F.sort_array(F.array_union(F.coalesce("_old", empty),
                                   F.coalesce("_new", empty))).alias("cuis"))

    wi = (tables["word_index"].withColumnRenamed("terms", "_old")
          .join(delta["word_index"].withColumnRenamed("terms", "_new"),
                "word", "full_outer"))
    out["word_index"] = wi.select(
        "word",
        F.sort_array(F.array_union(F.coalesce("_old", empty),
                                   F.coalesce("_new", empty))).alias("terms"))

    ws = (tables["word_stats"]
          .withColumnRenamed("term_count", "_oc")
          .withColumnRenamed("is_term", "_ot")
          .join(delta["word_stats"]
                .withColumnRenamed("term_count", "_nc")
                .withColumnRenamed("is_term", "_nt"),
                "word", "full_outer"))
    out["word_stats"] = ws.select(
        "word",
        (F.coalesce("_oc", F.lit(0)) + F.coalesce("_nc", F.lit(0)))
        .alias("term_count"),
        (F.coalesce("_ot", F.lit(False)) | F.coalesce("_nt", F.lit(False)))
        .alias("is_term"))

    out["regex_terms"] = tables["regex_terms"].unionByName(
        delta["regex_terms"])
    # putIfAbsent: a code already filed keeps its first concept
    out["code_xref"] = tables["code_xref"].unionByName(
        delta["code_xref"].join(tables["code_xref"].select("code"),
                                "code", "left_anti"))
    return _rederive(out, had)


def remove_concept(tables: dict[str, DataFrame], cui: str,
                   cfg: SearchConfig | None = None,
                   term_filter: bool = False) -> dict[str, DataFrame]:
    """removeConcept:1235-1255 as a delta MERGE: rebuild the one removed
    concept's terms with the same build code, subtract them from the
    indexes, drop term/word rows left empty."""
    cfg = cfg or SearchConfig()
    spark = tables["concepts"].sparkSession
    row = tables["concepts"].where(F.col("cui") == cui).collect()
    if not row:
        return tables
    r = row[0]
    concept = dict(cui=r.cui, name=r.name, synonyms=list(r.synonyms),
                   sem_types=list(r.sem_types), sources=list(r.sources),
                   terms=[(t.text, t.form) for t in r.terms],
                   definitions=list(r.definitions),
                   codes={c.source: c.code for c in r.codes})
    delta = _delta_tables(spark, concept, cfg, int(r._idx), term_filter)
    had = {k: k in tables for k in ("blacklist", "word_index_compact")}

    out = dict(tables)
    out["concepts"] = tables["concepts"].where(F.col("cui") != cui)

    ti = (tables["term_index"]
          .join(delta["term_index"].select("term"), "term", "left_semi")
          .select("term", F.array_remove("cuis", cui).alias("cuis")))
    out["term_index"] = (tables["term_index"]
                         .join(delta["term_index"].select("term"), "term",
                               "left_anti")
                         .unionByName(ti.where(F.size("cuis") > 0)))
    # unfile fully-removed terms from their words; drop emptied words.
    # The delta is one concept, so the gone-term set is tiny — it travels
    # as an array literal instead of another join.
    gone = [x.term for x in ti.where(F.size("cuis") == 0)
            .select("term").collect()]
    gone_arr = (F.array(*[F.lit(t) for t in gone]) if gone
                else F.array().cast("array<string>"))
    wi = (tables["word_index"]
          .join(delta["word_index"].select("word"), "word", "left_semi")
          .select("word", F.array_except("terms", gone_arr).alias("terms")))
    out["word_index"] = (tables["word_index"]
                         .join(delta["word_index"].select("word"), "word",
                               "left_anti")
                         .unionByName(wi.where(F.size("terms") > 0)))

    # word_stats: subtract the delta's pair counts; is_term survives when
    # it came from another concept (i.e. the word-as-term still exists in
    # the surviving term index) or was never the delta's to begin with
    still_term = (out["term_index"].select(F.col("term").alias("word"))
                  .distinct().withColumn("_still", F.lit(True)))
    out["word_stats"] = (
        tables["word_stats"]
        .join(delta["word_stats"]
              .withColumnRenamed("term_count", "_dc")
              .withColumnRenamed("is_term", "_dt"),
              "word", "left")
        .join(still_term, "word", "left")
        .select("word",
                (F.col("term_count") - F.coalesce("_dc", F.lit(0)))
                .alias("term_count"),
                ((F.col("is_term") & ~F.coalesce("_dt", F.lit(False)))
                 | (F.col("is_term") & F.coalesce("_still", F.lit(False))))
                .alias("is_term"))
        .where(F.col("term_count") > 0))

    out["regex_terms"] = tables["regex_terms"].where(F.col("cui") != cui)
    # Codes the removed concept had WON under putIfAbsent must be
    # reassigned to the earliest surviving holder (min _idx), exactly as a
    # full rebuild over the survivors would file them; codes nobody else
    # holds simply disappear.
    removed_codes = tables["code_xref"].where(F.col("cui") == cui)
    surviving_holders = (
        out["concepts"].select("_idx", "cui", F.explode("codes").alias("c"))
        .select("_idx", "cui", F.col("c.code").alias("code"))
        .where((F.col("code") != "") & (F.col("code") != "NOCODE"))
        .join(removed_codes.select("code"), "code", "left_semi"))
    w = Window.partitionBy("code").orderBy("_idx")
    reassigned = (surviving_holders.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).select("code", "cui"))
    out["code_xref"] = (tables["code_xref"].where(F.col("cui") != cui)
                        .unionByName(reassigned))
    return _rederive(out, had)


def update_concept(tables: dict[str, DataFrame], concept: dict,
                   cfg: SearchConfig | None = None,
                   term_filter: bool = False) -> dict[str, DataFrame]:
    """updateConcept:1260-1264 — remove then add."""
    out = remove_concept(tables, concept["cui"], cfg, term_filter)
    return add_concept(out, concept, cfg, term_filter)
