"""Pipeline stages: documents -> sentences -> mentions -> triples.

Stage architecture (SURVEY.md §7): each stage is a pure DataFrame ->
DataFrame transform; the heavy lexical work runs inside Arrow-batched
``mapInPandas`` over a broadcast dictionary (the Spark analog of the
reference's single-JVM loop over JDBM hashtables — every sentence is
independent, so the per-sentence matcher parallelizes embarrassingly
across executors; the only shuffles in the whole pipeline are the
document-level context pass (groupBy doc_id) and the final triple dedupe).

Scale posture:
- dictionaries travel once per executor via ``SparkContext.broadcast``;
- sentence-split and mention-detect are narrow (no shuffle);
- the hot-word skew the reference fights with its blacklist
  (BlacklistHandler.java) is defused the same way here (pre-pruned posting
  lists) plus optional salted repartition (``salt_documents``) so hot
  documents spread over all partitions;
- `spark.sql.adaptive.enabled` is assumed on for runtime skew re-splits.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from ..config import SearchConfig, for_search_method
from ..matcher.core import process_sentence
from ..sentence import splitter as SP
from ..terminology.storage import Dictionary

SENTENCES_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("sent_id", ST.IntegerType(), False),
    ST.StructField("sent_type", ST.StringType(), False),
    ST.StructField("text", ST.StringType(), False),
    ST.StructField("offset", ST.IntegerType(), False),
    # C5: paragraph index within the document (-1 = outside any
    # paragraph); paragraph-action modifiers scope over this
    ST.StructField("paragraph_id", ST.IntegerType(), False),
])

MENTIONS_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("sent_id", ST.IntegerType(), False),
    ST.StructField("cui", ST.StringType(), False),
    ST.StructField("concept_name", ST.StringType(), False),
    ST.StructField("matched_term", ST.StringType(), False),
    ST.StructField("normalized_term", ST.StringType(), False),
    ST.StructField("score", ST.DoubleType(), False),
    ST.StructField("annotations", ST.ArrayType(ST.StructType([
        ST.StructField("text", ST.StringType(), False),
        ST.StructField("offset", ST.IntegerType(), False),
    ])), False),
    ST.StructField("start", ST.IntegerType(), False),
    ST.StructField("end", ST.IntegerType(), False),
    ST.StructField("sem_types", ST.ArrayType(ST.StringType()), False),
    ST.StructField("sources", ST.ArrayType(ST.StringType()), False),
])

TRIPLES_SCHEMA = ST.StructType([
    ST.StructField("subj", ST.StringType(), False),
    ST.StructField("pred", ST.StringType(), False),
    ST.StructField("obj", ST.StringType(), False),
    ST.StructField("doc_id", ST.StringType(), False),
])


def salt_documents(documents: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """Skew defense: spread documents evenly regardless of content hot
    spots. Round-robin repartition — each row (one whole document) lands
    in exactly one partition with perfect balance, breaking any clustering
    of hot-term documents. (Hashing a computed salt column would re-hash
    the salt into buckets and collide; round-robin IS the salted spread
    for row-granular work. Key-salting proper applies to the join-based
    match path, where AQE's skew-join handles it.)"""
    if salt_buckets <= 0:
        return documents
    return documents.repartition(salt_buckets)


def split_sentences(documents: DataFrame, doc_type: str = SP.TYPE_MEDICAL_REPORT,
                    filter_headers: bool = True) -> DataFrame:
    """P1: explode ``kind='text'`` spans into typed sentences with
    document-absolute offsets (C1-C6). Narrow transform, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "sent_id", "sent_type", "text",
                                     "offset", "paragraph_id")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                sent_id = 0
                para_base = 0
                for span in spans:
                    kind = span["kind"] if isinstance(span, dict) else span.kind
                    if kind != "text":
                        continue
                    stext = span["text"] if isinstance(span, dict) else span.text
                    soff = span["offset"] if isinstance(span, dict) else span.offset
                    if not stext:
                        continue
                    rows, secs = SP.process_document(stext, doc_type)
                    paras = SP.find_paragraphs(stext, secs)

                    def pid_for(off: int) -> int:
                        for j, p in enumerate(paras):
                            if p.start <= off < max(p.end, p.start + 1):
                                return para_base + j
                        return -1

                    for r in rows:
                        # clip the phantom trailing pad the line-splitter
                        # appends past the end of the span (parity artifact
                        # of re-appending '\n' to the final split line)
                        over = (r.offset + len(r.text)) - len(stext)
                        if over > 0:
                            r.text = r.text[:-over]
                        if SP.filter_sentence(r.text, r.sent_type,
                                              filter_header=filter_headers):
                            continue
                        out["doc_id"].append(doc_id)
                        out["sent_id"].append(sent_id)
                        out["sent_type"].append(r.sent_type)
                        out["text"].append(r.text)
                        out["offset"].append(int(soff) + r.offset)
                        out["paragraph_id"].append(pid_for(r.offset))
                        sent_id += 1
                    para_base += len(paras)
            if out["doc_id"]:  # empty frames infer float64 cols, breaking Arrow
                yield pd.DataFrame(out)

    return documents.mapInPandas(gen, schema=SENTENCES_SCHEMA)


def detect_mentions(sentences: DataFrame, dico_bc, cfg: SearchConfig | None = None,
                    deid_scrub: bool = True) -> DataFrame:
    """P2: the match stage. Broadcast-dictionary probe inside mapInPandas —
    relationally a broadcast hash semi-join of sentence words against the WT
    table followed by the TC expansion, executed as in-memory dict probes.
    Annotation offsets are rebased to document-absolute (Mention.java:75-81).
    """
    cfg = cfg or for_search_method(None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dico: Dictionary = dico_bc.value if hasattr(dico_bc, "value") else dico_bc
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MENTIONS_SCHEMA.fields}
            for doc_id, sent_id, text, offset in zip(
                    pdf["doc_id"], pdf["sent_id"], pdf["text"], pdf["offset"]):
                stext = SP.filter_deid_tags(text) if deid_scrub else text
                for m in process_sentence(stext, dico, cfg):
                    anns = [{"text": t, "offset": int(offset) + o}
                            for t, o in m.annotations]
                    out["doc_id"].append(doc_id)
                    out["sent_id"].append(int(sent_id))
                    out["cui"].append(m.cui)
                    out["concept_name"].append(m.concept_name)
                    out["matched_term"].append(m.matched_term)
                    out["normalized_term"].append(m.normalized_term)
                    out["score"].append(float(m.score))
                    out["annotations"].append(anns)
                    out["start"].append(anns[0]["offset"] if anns else -1)
                    out["end"].append(max(a["offset"] + len(a["text"]) for a in anns)
                                      if anns else -1)
                    out["sem_types"].append(list(m.sem_types))
                    out["sources"].append(list(m.sources))
            if out["doc_id"]:  # empty frames infer float64 cols, breaking Arrow
                yield pd.DataFrame(out)

    return sentences.mapInPandas(gen, schema=MENTIONS_SCHEMA)


ANNOTATED_SCHEMA = ST.StructType(
    MENTIONS_SCHEMA.fields +
    [ST.StructField("modifiers",
                    ST.MapType(ST.StringType(), ST.StringType()), False)])


def annotate_documents(sentences: DataFrame, dico_bc, context_bc=None,
                       cfg: SearchConfig | None = None,
                       deid_scrub: bool = True,
                       negex: bool = False) -> DataFrame:
    """P2+P3 fused: per document (groupBy doc_id, applyInPandas), run the
    matcher, then the acronym doc-pass (F1/F2 — the only doc-scoped state),
    then ConText modifier assignment (F3/F4) or NegEx (F5) per sentence.

    This is the reference's per-sentence chain (NobleCoder.process:312-336:
    terminology -> AcronymDetector -> ConText) lifted onto Spark: one
    shuffle on doc_id buys document-ordered sentence processing; documents
    parallelize across executors. Dictionaries ride broadcasts.

    Implementation: repartition(doc_id) + sortWithinPartitions + a
    PARTITION-level mapInPandas, NOT groupBy().applyInPandas — the latter
    invokes Python once per doc (5k docs = 5k calls + 5k Arrow frames,
    dominating runtime); here one Python stream handles the whole
    partition, carrying the per-doc acronym/section state across Arrow
    batch boundaries (sorting guarantees a doc's sentences arrive
    contiguously even when a doc straddles two batches).
    """
    cfg = cfg or for_search_method(None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from types import SimpleNamespace

        from ..context.acronyms import AcronymState
        from ..context.context import (ConTextEngine, ModifierOut,
                                       _add_modifier)
        from ..context import negex as NX

        dico: Dictionary = dico_bc.value if hasattr(dico_bc, "value") else dico_bc
        engine = None
        if context_bc is not None:
            cdico = context_bc.value if hasattr(context_bc, "value") else context_bc
            engine = ConTextEngine(cdico)

        # doc-scoped state carried across Arrow batches of this partition
        state: AcronymState | None = None
        cur_doc = None
        section_mods: list = []
        # per-doc buffers: rows await the doc flush so paragraph-action
        # modifiers (which scope beyond their sentence, backward included)
        # can be applied before emission (ConText.getMatchingModifiers)
        buf_rows: list[dict] = []
        buf_para: list[tuple] = []  # (pid, action, abs_start, abs_end, ModifierOut)
        out: dict[str, list] = {f.name: [] for f in ANNOTATED_SCHEMA.fields}

        def flush_doc():
            for pid, action, a_start, a_end, val in buf_para:
                if pid < 0:
                    continue
                for row in buf_rows:
                    if row["_pid"] != pid:
                        continue
                    before = a_end <= row["start"]   # modifier before target
                    after = a_start >= row["end"]    # modifier after target
                    if not ((action in ("forward", "bidirectional") and before)
                            or (action in ("backward", "bidirectional")
                                and after)):
                        continue
                    slot = row["_slot"]
                    cur = slot.get(val.type, [])
                    # local sentence modifiers win (NobleMentions:158-169)
                    if all(m.is_default for m in cur):
                        _add_modifier(
                            slot,
                            ModifierOut(type=val.type, value=val.value,
                                        start=a_start, end=a_end),
                            SimpleNamespace(start=row["start"],
                                            end=row["end"]))
            for row in buf_rows:
                slot = row.pop("_slot")
                row.pop("_pid")
                if slot is not None:
                    row["modifiers"] = {
                        t: ",".join(m.value for m in lst)
                        for t, lst in slot.items()}
                for k, v in row.items():
                    out[k].append(v)
            buf_rows.clear()
            buf_para.clear()

        for pdf in batches:
            for doc_id, sent_id, sent_type, text, offset, pid in zip(
                    pdf["doc_id"], pdf["sent_id"], pdf["sent_type"],
                    pdf["text"], pdf["offset"], pdf["paragraph_id"]):
                if doc_id != cur_doc:
                    flush_doc()
                    cur_doc = doc_id
                    state = AcronymState(dico)  # cleared per doc (:273)
                    section_mods = []
                stext = SP.filter_deid_tags(text) if deid_scrub else text

                # section headers aren't coded, but section-action
                # modifiers found in them scope every mention until the
                # next header (ConText HAS_SECTION_ACTION; headers survive
                # only when the caller split with filter_headers=False)
                if sent_type == SP.TYPE_HEADER:
                    section_mods = (engine.section_modifiers(stext)
                                    if engine is not None else [])
                    continue

                mentions = process_sentence(stext, dico, cfg)
                mentions = state.process(stext, mentions)

                slots_out: list
                if engine is not None:
                    slots, global_mods = engine.process_with_globals(
                        stext, mentions)
                    for slot, target in zip(slots, mentions):
                        for smod in section_mods:
                            # local sentence modifiers win over section
                            # scope (NobleMentions.process:158-169)
                            cur = slot.get(smod.type, [])
                            if all(m.is_default for m in cur):
                                _add_modifier(slot, smod, target)
                    slots_out = slots
                    # paragraph-action modifiers scope to the whole
                    # paragraph; collected here, applied at the doc flush
                    for gm in global_mods:
                        ga = engine.global_action(gm.cui)
                        if ga is None or ga[0] != "paragraph":
                            continue
                        for val in engine.modifier_values(gm):
                            buf_para.append((int(pid), ga[1],
                                             int(offset) + gm.start,
                                             int(offset) + gm.end, val))
                elif negex:
                    nmods = NX.process(stext, mentions)
                    slots_out = [
                        {m.type: [m] for m in lst} for lst in nmods]
                else:
                    slots_out = [None] * len(mentions)

                for m, slot in zip(mentions, slots_out):
                    anns = [{"text": t, "offset": int(offset) + o}
                            for t, o in m.annotations]
                    start = anns[0]["offset"] if anns else -1
                    end = (max(a["offset"] + len(a["text"]) for a in anns)
                           if anns else -1)
                    buf_rows.append({
                        "doc_id": doc_id, "sent_id": int(sent_id),
                        "cui": m.cui, "concept_name": m.concept_name,
                        "matched_term": m.matched_term,
                        "normalized_term": m.normalized_term,
                        "score": float(m.score), "annotations": anns,
                        "start": start, "end": end,
                        "sem_types": list(m.sem_types),
                        "sources": list(m.sources),
                        "modifiers": {}, "_slot": slot, "_pid": int(pid)})
            # end of Arrow batch: emit completed docs (the current doc may
            # continue in the next batch, its rows stay buffered)
            if out["doc_id"]:
                yield pd.DataFrame(out)
                out = {f.name: [] for f in ANNOTATED_SCHEMA.fields}
        flush_doc()
        if out["doc_id"]:
            yield pd.DataFrame(out)

    spark_parallelism = sentences.sparkSession.sparkContext.defaultParallelism
    return (sentences
            .repartition(spark_parallelism, "doc_id")
            .sortWithinPartitions("doc_id", "sent_id")
            .mapInPandas(gen, schema=ANNOTATED_SCHEMA))


def dedup_redundant_mentions(mentions: DataFrame) -> DataFrame:
    """F6: same concept + contained span -> keep widest
    (DomainOntology.removeRedundantMentions:645-670). Window over
    (doc_id, cui) — a single shuffle on the natural key."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id", "cui")
    return (mentions
            .withColumn("_w", F.collect_list(F.struct("start", "end")).over(w))
            .where(~F.exists(
                "_w", lambda o: (o["start"] <= F.col("start")) &
                                (F.col("end") <= o["end"]) &
                                ((o["end"] - o["start"]) > (F.col("end") - F.col("start")))))
            .drop("_w"))


def mention_triples(mentions: DataFrame) -> DataFrame:
    """P6a: doc -mentions_concept-> CUI (distinct per document)."""
    return (mentions
            .select(F.col("doc_id").alias("subj"),
                    F.lit("mentions_concept").alias("pred"),
                    F.col("cui").alias("obj"),
                    "doc_id")
            .distinct())


def isa_triples(spark: SparkSession, dico: Dictionary) -> DataFrame:
    """P6b: CUI -isa-> CUI from the terminology's BROADER edges."""
    rows = [(c, "isa", p, "") for c, p in dico.isa_edges]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def materialize_triples(mentions: DataFrame, spark: SparkSession,
                        dico: Dictionary, include_isa: bool = True,
                        canonical: DataFrame | None = None) -> DataFrame:
    """P5+P6: optionally rewrite mention CUIs through the canonical map
    (connected components over synonym/xref edges, graph.canonicalize)
    before emitting doc->mentions_concept->CUI and CUI->isa->CUI triples."""
    if canonical is not None:
        from ..graph.canonicalize import canonicalize_mentions
        mentions = canonicalize_mentions(mentions, canonical)
    t = mention_triples(mentions)
    if include_isa and dico.isa_edges:
        isa = isa_triples(spark, dico)
        if canonical is not None:
            cmap = F.broadcast(canonical)
            isa = (isa.join(cmap.withColumnRenamed("cui", "subj"), "subj", "left")
                   .withColumn("subj", F.coalesce("canonical_cui", "subj"))
                   .drop("canonical_cui")
                   .join(cmap.withColumnRenamed("cui", "obj"), "obj", "left")
                   .withColumn("obj", F.coalesce("canonical_cui", "obj"))
                   .drop("canonical_cui")
                   .where(F.col("subj") != F.col("obj"))
                   .select("subj", "pred", "obj", "doc_id").distinct())
        t = t.unionByName(isa)
    return t


def run_pipeline(spark: SparkSession, documents: DataFrame, dico: Dictionary,
                 method: str | None = None, salt_buckets: int = 0,
                 context_dico: Dictionary | None = None,
                 ) -> dict[str, DataFrame]:
    """End-to-end P0->P6. Without a modifier terminology the match stage is
    fully narrow (mapInPandas); with one, the fused doc-level annotate pass
    (P2+P3) runs instead — one shuffle on doc_id. Returns all frames."""
    cfg = for_search_method(method)
    dico_bc = spark.sparkContext.broadcast(dico)
    docs = salt_documents(documents, salt_buckets)
    sentences = split_sentences(docs)
    if context_dico is not None:
        context_bc = spark.sparkContext.broadcast(context_dico)
        mentions = annotate_documents(sentences, dico_bc, context_bc, cfg)
    else:
        mentions = detect_mentions(sentences, dico_bc, cfg)
    triples = materialize_triples(mentions, spark, dico)
    return {"documents": docs, "sentences": sentences,
            "mentions": mentions, "triples": triples}
