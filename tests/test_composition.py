"""I-group tests: anchors, annotation-variable satisfaction,
most-specific-wins, relation retry, instance/triple materialization —
plus terminology persistence round-trip (B4/A7)."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.config import for_search_method
from nobletools_spark.context.lexicon import modifier_dictionary
from nobletools_spark.mentionsmodel.composition import (DomainSchema,
                                                        VariableDef, compose)
from nobletools_spark.pipeline.documents import DOCUMENTS_SCHEMA
from nobletools_spark.pipeline.stages import annotate_documents, split_sentences
from nobletools_spark.terminology.fixture import fixture_dictionary

SCHEMA = DomainSchema(variables=[
    # any disease-family concept with any polarity
    VariableDef(name="Finding", anchor_cuis=("C0012634",),
                required=(("Polarity", ()),)),
    # negated subclass: most-specific-wins over Finding on the same span
    VariableDef(name="NegatedFinding", anchor_cuis=("C0012634",),
                required=(("Polarity", ("Negative_Polarity",)),),
                specific_of="Finding"),
    # family-history cancer
    VariableDef(name="FamilyCancerHistory", anchor_cuis=("C0006826",),
                required=(("Experiencer", ("FamilyMember_Experiencer",)),)),
    # relation-dependent: a finding linked to a procedure in the same doc;
    # its non-relation slots are satisfiable (any Polarity), but the
    # relation slot itself gates satisfaction (isSatisfied covers it)
    VariableDef(name="EvaluatedFinding", anchor_cuis=("C0012634",),
                required=(("Polarity", ()),),
                relations=(("hasEvaluation", "Procedure"),)),
    # impossible non-relation slot + a present relation target: the retry
    # re-runs full satisfaction, so this must NEVER appear
    # (NobleMentions.process:218-228)
    VariableDef(name="ImpossibleEvaluated", anchor_cuis=("C0012634",),
                required=(("Polarity", ("NO_SUCH_VALUE",)),),
                relations=(("hasEvaluation", "Procedure"),)),
    VariableDef(name="Procedure", anchor_cuis=("C0005558", "C0came01"),
                required=()),
])

DOCS = [
    ("c1", "No evidence of melanoma."),
    ("c2", "The melanoma is present."),
    ("c3", "Family history of breast cancer."),
    ("c4", "Diabetes noted after biopsy."),
]


@pytest.fixture(scope="module")
def composed(spark):
    rows = [(d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
            for d, t in DOCS]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    sents = split_sentences(docs)
    dico = fixture_dictionary()
    annotated = annotate_documents(
        sents, spark.sparkContext.broadcast(dico),
        spark.sparkContext.broadcast(modifier_dictionary()),
        for_search_method("best-match"))
    return compose(annotated, SCHEMA, dico)


class TestCompose:
    def test_negated_shadows_generic_finding(self, composed):
        inst = composed["instances"].where("doc_id = 'c1'").collect()
        names = {r.var_name for r in inst}
        assert "NegatedFinding" in names
        # generic Finding on the same melanoma span is shadowed
        mel = [r for r in inst if r.cui == "C0025202"]
        assert {r.var_name for r in mel} == {"NegatedFinding"}

    def test_positive_mention_only_generic(self, composed):
        inst = composed["instances"].where(
            "doc_id = 'c2' AND cui = 'C0025202'").collect()
        assert {r.var_name for r in inst} == {"Finding"}

    def test_family_history_variable(self, composed):
        inst = composed["instances"].where("doc_id = 'c3'").collect()
        assert "FamilyCancerHistory" in {r.var_name for r in inst}

    def test_relation_retry_satisfies(self, composed):
        # EvaluatedFinding's Polarity slot holds everywhere, but the
        # relation slot only fills where a Procedure exists (c4)
        inst = composed["instances"].where("doc_id = 'c4'").collect()
        names = {r.var_name for r in inst}
        assert "Procedure" in names
        assert "EvaluatedFinding" in names
        # no Procedure in c2 -> relation slot unfilled -> not satisfied,
        # even though every non-relation slot holds
        other = composed["instances"].where(
            "doc_id = 'c2' AND var_name = 'EvaluatedFinding'").count()
        assert other == 0

    def test_relation_retry_rechecks_nonrelation_slots(self, composed):
        # c4 has the Procedure relation target, but ImpossibleEvaluated's
        # Polarity slot can never hold -> the retry must NOT promote it
        assert composed["instances"].where(
            "var_name = 'ImpossibleEvaluated'").count() == 0

    def test_relation_link_materialized(self, composed):
        # the satisfied relation lands in the modifier map -> a triple
        # (instance, hasEvaluation, target_instance_id)
        inst = composed["instances"].where(
            "doc_id = 'c4' AND var_name = 'EvaluatedFinding'").collect()
        assert inst and "hasEvaluation" in inst[0].modifiers
        target = inst[0].modifiers["hasEvaluation"]
        assert target.startswith("c4#Procedure#")
        rel_triples = composed["triples"].where(
            "pred = 'hasEvaluation'").collect()
        assert any(r.obj == target for r in rel_triples)

    def test_triples_shape(self, composed):
        t = composed["triples"]
        preds = {r.pred for r in t.select("pred").distinct().collect()}
        assert {"hasVariable", "hasAnchor", "Polarity"} <= preds
        # every instance has exactly one anchor triple
        anchors = t.where("pred = 'hasAnchor'")
        insts = composed["instances"]
        assert anchors.select("subj").distinct().count() == insts.count()


class TestPersistence:
    def test_save_load_roundtrip(self, spark, tmp_path):
        from nobletools_spark.matcher.core import search
        from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                          FIXTURE_ISA_EDGES)
        from nobletools_spark.terminology.persist import (build_and_save,
                                                          load_dictionary)
        path = str(tmp_path / "fixture.term")
        build_and_save(spark, FIXTURE_CONCEPTS, path,
                       isa_edges=FIXTURE_ISA_EDGES, compact=True)
        dico = load_dictionary(spark, path)
        py = fixture_dictionary()
        assert dico.term_map == py.term_map
        assert dico.word_map == py.word_map
        assert dico.blacklist == py.blacklist
        assert sorted(dico.isa_edges) == sorted(py.isa_edges)
        for q in ("malignant melanoma", "deep margin biopsy"):
            assert search(q, dico, "best-match") == search(q, py, "best-match")


class TestCompoundAnchors:
    def test_components_must_cooccur(self, spark):
        schema = DomainSchema(variables=[
            VariableDef(name="NegMelanomaWorkup", anchor_cuis=(),
                        components=("C0025202", "C0005558")),  # melanoma+biopsy
        ])
        docs = spark.createDataFrame(
            [("x1", [{"kind": "text",
                      "text": "Biopsy confirmed melanoma.",
                      "media_ref": "", "offset": 0}]),
             ("x2", [{"kind": "text", "text": "Melanoma only here.",
                      "media_ref": "", "offset": 0}])],
            schema=DOCUMENTS_SCHEMA)
        dico = fixture_dictionary()
        ann = annotate_documents(
            split_sentences(docs), spark.sparkContext.broadcast(dico),
            spark.sparkContext.broadcast(modifier_dictionary()),
            for_search_method("best-match"))
        out = compose(ann, schema, dico)
        inst = out["instances"].collect()
        by_doc = {}
        for r in inst:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [r.var_name for r in by_doc.get("x1", [])] == ["NegMelanomaWorkup"]
        assert "x2" not in by_doc
        r = by_doc["x1"][0]
        assert r.start == 0 and r.end == len("Biopsy confirmed melanoma")
