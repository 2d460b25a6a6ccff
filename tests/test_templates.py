"""I4 template-extraction tests: decimal parse parity, engine unit
semantics (closure match, specific-wins, attributes, numeric domain,
absent), and a golden end-to-end run over a sectioned fixture corpus."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.config import for_search_method
from nobletools_spark.context.lexicon import modifier_dictionary
from nobletools_spark.extract.templates import (DocumentFilterDef,
                                                TemplateDef, TemplateItemDef,
                                                parse_decimal_value,
                                                process_template,
                                                section_table)
from nobletools_spark.graph.hierarchy import ancestors_closure, isa_edges_df
from nobletools_spark.pipeline.documents import DOCUMENTS_SCHEMA
from nobletools_spark.pipeline.stages import (annotate_documents,
                                              split_sentences)
from nobletools_spark.terminology.fixture import fixture_dictionary


class TestParseDecimalValue:
    def test_matches_reference_semantics(self):
        # TextTools.parseDecimalValue:1199-1216 / parseIntegerValue roman
        assert parse_decimal_value("3.5") == 3.5
        assert parse_decimal_value("42") == 42.0
        assert parse_decimal_value("II") == 2.0
        assert parse_decimal_value("IV") == 4.0
        assert parse_decimal_value("IX") == 9.0
        assert parse_decimal_value("viii") == 8.0
        assert parse_decimal_value("x") == 10.0
        assert parse_decimal_value("grade") == 0.0
        assert parse_decimal_value(None) == 0.0
        assert parse_decimal_value("3.5.1") == 0.0


MENTIONS_DDL = ("doc_id string, sent_id int, cui string, "
                "concept_name string, matched_term string, start int, "
                "end int, modifiers map<string,string>")


@pytest.fixture()
def closure(spark):
    return spark.createDataFrame(
        [("C_merge", "C_join"), ("C_merge", "C_op"), ("C_join", "C_op"),
         ("C_scan", "C_op")], "cui string, anc_cui string")


class TestEngineUnits:
    def test_closure_match_includes_self_and_descendants(self, spark, closure):
        mentions = spark.createDataFrame(
            [("d1", 0, "C_op", "Op", "op", 0, 2, {}),
             ("d1", 0, "C_other", "Other", "other", 12, 17, {}),
             ("d2", 0, "C_scan", "Scan", "scan", 5, 9, {})],
            MENTIONS_DDL)
        t = TemplateDef("t", items=[TemplateItemDef("Op", "C_op")])
        got = {(r.doc_id, r.cui) for r in
               process_template(mentions, t, closure).collect()}
        # self-inclusive (root matches itself), descendants match, no
        # strangers; in one doc a descendant would shadow the root
        assert got == {("d1", "C_op"), ("d2", "C_scan")}

    def test_most_specific_wins_and_value_domain(self, spark, closure):
        mentions = spark.createDataFrame(
            [("d1", 0, "C_join", "Join", "join", 0, 4, {}),
             ("d1", 1, "C_merge", "Merge", "merge", 10, 15, {}),
             ("d2", 0, "C_join", "Join", "join", 0, 4, {}),
             ("d1", 0, "C_num", "Num", "3.5", 20, 23, {}),
             ("d1", 1, "C_num", "Num", "II", 30, 32, {})],
            MENTIONS_DDL)
        t = TemplateDef("t", items=[
            TemplateItemDef("Op", "C_op"),
            TemplateItemDef("K", "C_num", type="numeric-value",
                            value_domain="value")])
        rows = process_template(mentions, t, closure).collect()
        ops = {(r.doc_id, r.cui) for r in rows if r.item == "Op"}
        # d1: merge shadows join; d2 keeps join (no more-specific there)
        assert ops == {("d1", "C_merge"), ("d2", "C_join")}
        vals = sorted(r.value for r in rows if r.item == "K")
        assert vals == [2.0, 3.5]

    def test_absent_from_negation_modifier(self, spark, closure):
        mentions = spark.createDataFrame(
            [("d1", 0, "C_scan", "Scan", "scan", 0, 4,
              {"Polarity": "Negative_Polarity"}),
             ("d2", 0, "C_scan", "Scan", "scan", 0, 4,
              {"Polarity": "Positive_Polarity"})],
            MENTIONS_DDL)
        t = TemplateDef("t", items=[TemplateItemDef("Op", "C_op")])
        got = {r.doc_id: r.absent
               for r in process_template(mentions, t, closure).collect()}
        assert got == {"d1": True, "d2": False}

    def test_attribute_value_requires_parent_cooccurrence(self, spark,
                                                          closure):
        mentions = spark.createDataFrame(
            [("d1", 0, "C_scan", "Scan", "scan", 0, 4, {}),
             ("d1", 0, "C_attr", "Fast", "fast", 8, 12, {}),
             ("d2", 5, "C_attr", "Fast", "fast", 0, 4, {})],  # no parent
            MENTIONS_DDL)
        t = TemplateDef("t", items=[
            TemplateItemDef("Op", "C_op"),
            TemplateItemDef("Speed", "C_attr", type="attribute-value",
                            of_item="Op")])
        rows = process_template(mentions, t, closure).collect()
        speed_docs = {r.doc_id for r in rows if r.item == "Speed"}
        assert speed_docs == {"d1"}  # d2's orphan attribute is dropped


@pytest.fixture(scope="module")
def golden(spark):
    docs_txt = [
        ("g1", "DIAGNOSIS: Skin cancer present. There is also cutaneous "
               "melanoma.\nCOMMENT: Family history of breast cancer.\n"),
        ("g2", "DIAGNOSIS: No evidence of melanoma.\n"),
        ("g3", "COMMENT: Melanoma mentioned outside the diagnosis "
               "section.\n"),
    ]
    rows = [(d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
            for d, t in docs_txt]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    dico = fixture_dictionary()
    sents = split_sentences(docs)
    mentions = annotate_documents(
        sents, spark.sparkContext.broadcast(dico),
        spark.sparkContext.broadcast(modifier_dictionary()),
        for_search_method("best-match"))
    sections = section_table(docs)
    closure = ancestors_closure(isa_edges_df(spark, dico))
    return mentions, sections, closure


class TestGoldenTemplate:
    def test_sectioned_diagnosis_extraction(self, spark, golden):
        mentions, sections, closure = golden
        t = TemplateDef(
            "CancerDx",
            items=[TemplateItemDef("Diagnosis", "C0006826",
                                   type="diagnosis")],
            filters=[DocumentFilterDef("DIAGNOSIS:?")])
        rows = process_template(mentions, t, closure,
                                sections=sections).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, set()).add((r.cui, r.absent))
        # g1: cutaneous melanoma shadows skin cancer; breast cancer is in
        # COMMENT, outside the section filter
        assert by_doc["g1"] == {("C0151779", False)}
        # g2: negated melanoma -> present row flagged absent
        assert by_doc["g2"] == {("C0025202", True)}
        # g3: its melanoma lives outside any DIAGNOSIS section
        assert "g3" not in by_doc

    def test_no_filters_sees_whole_document(self, spark, golden):
        mentions, _, closure = golden
        t = TemplateDef("AnyCancer",
                        items=[TemplateItemDef("Dx", "C0006826")])
        rows = process_template(mentions, t, closure).collect()
        g1 = {r.cui for r in rows if r.doc_id == "g1"}
        assert g1 == {"C0151779", "C0346109"}  # melanoma + breast cancer
        g3 = {r.cui for r in rows if r.doc_id == "g3"}
        assert g3 == {"C0025202"}
