"""OWL/RDF-XML instance export round trip (VERDICT r4 missing #1): the
compose() instances table serialized in the reference Composition
vocabulary (Composition.java:54-115, AnnotationVariable.java:62-113)
must reload with every (doc, var, cui, span, modifier) tuple intact."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.config import for_search_method
from nobletools_spark.context.lexicon import modifier_dictionary
from nobletools_spark.mentionsmodel.composition import (DomainSchema,
                                                        VariableDef, compose)
from nobletools_spark.mentionsmodel.instances_owl import (
    compositions_to_owl, parse_composition_owl)
from nobletools_spark.pipeline.documents import DOCUMENTS_SCHEMA
from nobletools_spark.pipeline.stages import (annotate_documents,
                                              split_sentences)
from nobletools_spark.terminology.fixture import fixture_dictionary

SCHEMA = DomainSchema(variables=[
    VariableDef(name="Finding", anchor_cuis=("C0012634",),
                required=(("Polarity", ()),)),
    VariableDef(name="NegatedFinding", anchor_cuis=("C0012634",),
                required=(("Polarity", ("Negative_Polarity",)),),
                specific_of="Finding"),
    VariableDef(name="EvaluatedFinding", anchor_cuis=("C0012634",),
                required=(("Polarity", ()),),
                relations=(("hasEvaluation", "Procedure"),)),
    VariableDef(name="Procedure", anchor_cuis=("C0005558", "C0came01"),
                required=()),
])

DOCS = [
    ("c1", "No evidence of melanoma."),
    ("c2", "The melanoma is present."),
    ("c4", "Diabetes noted after biopsy."),
]


@pytest.fixture(scope="module")
def instances(spark):
    rows = [(d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
            for d, t in DOCS]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    dico = fixture_dictionary()
    annotated = annotate_documents(
        split_sentences(docs), spark.sparkContext.broadcast(dico),
        spark.sparkContext.broadcast(modifier_dictionary()),
        for_search_method("best-match"))
    return compose(annotated, SCHEMA, dico)["instances"] \
        .localCheckpoint(eager=True)


def _tuples(rows):
    return sorted((r["doc_id"], r["var_name"], r["cui"], r["start"],
                   r["end"], tuple(sorted((r["modifiers"] or {}).items())))
                  for r in rows)


class TestOwlInstanceRoundTrip:
    def test_round_trip_exact(self, instances):
        exported = {r.doc_id: r.owl
                    for r in compositions_to_owl(instances).collect()}
        assert set(exported) == {r.doc_id for r in
                                 instances.select("doc_id").distinct()
                                 .collect()}
        reloaded = [row for owl in exported.values()
                    for row in parse_composition_owl(owl)]
        want = _tuples(r.asDict() for r in instances.collect())
        got = _tuples(reloaded)
        assert got == want

    def test_instance_ids_reconstructed(self, instances):
        exported = compositions_to_owl(instances).collect()
        for r in exported:
            for row in parse_composition_owl(r.owl):
                assert row["instance_id"] == (
                    f"{row['doc_id']}#{row['var_name']}#"
                    f"{row['start']}#{row['end']}")

    def test_relation_modifier_resolves_to_instance_id(self, instances):
        # c4's EvaluatedFinding carries hasEvaluation -> a sibling
        # individual; the reader must resolve the resource ref back to
        # the target's canonical instance_id (exact value fidelity even
        # though '#' is illegal in an XML fragment name)
        owl = {r.doc_id: r.owl
               for r in compositions_to_owl(instances).collect()}["c4"]
        rows = parse_composition_owl(owl)
        ev = [r for r in rows if r["var_name"] == "EvaluatedFinding"]
        assert ev and ev[0]["modifiers"]["hasEvaluation"].startswith(
            "c4#Procedure#")

    def test_vocabulary_matches_reference(self, instances):
        # reference property names: Composition.java:69-80 (hasTitle,
        # hasMentionAnnotation), AnnotationVariable.java:69-109
        # (hasAnchor, hasSpan "start:end" per Instance.java:249-255)
        owl = compositions_to_owl(instances).collect()[0].owl
        for token in ("<owl:NamedIndividual", 'rdf:resource="#Composition"',
                      "<hasTitle>", "<hasMentionAnnotation",
                      "<hasAnchor", "<hasSpan>"):
            assert token in owl
        # well-formed XML
        parse_composition_owl(owl)
