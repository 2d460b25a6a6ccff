"""A4 depth: the Modifier.owl-shaped ConText ontology round-trips through
real RDF/XML with owl:imports and anonymous restriction bodies onto the
in-repo lexicon with zero concept/relation diffs, and the loaded
terminology drives the SAME modifier matching as the native lexicon."""

from nobletools_spark.context.lexicon import (LEXICON_CONCEPTS,
                                              LEXICON_ISA_EDGES,
                                              context_config,
                                              modifier_dictionary)
from nobletools_spark.terminology.loaders import (_CTX_NS, _SCHEMA_NS,
                                                  context_to_owl,
                                                  load_owl_context)
from nobletools_spark.terminology.storage import build_dictionary


def roundtrip():
    modifier_xml, schema_xml = context_to_owl(LEXICON_CONCEPTS,
                                              LEXICON_ISA_EDGES)
    return load_owl_context(modifier_xml, {_SCHEMA_NS: schema_xml})


class TestOwlContextRoundTrip:
    def test_owl_shape_has_imports_and_restrictions(self):
        modifier_xml, schema_xml = context_to_owl(LEXICON_CONCEPTS,
                                                  LEXICON_ISA_EDGES)
        assert f'<owl:imports rdf:resource="{_SCHEMA_NS}"/>' in modifier_xml
        assert "<owl:Restriction>" in modifier_xml       # anonymous bodies
        assert "someValuesFrom" in modifier_xml          # class-valued
        assert "hasValue" in modifier_xml                # datatype-valued
        assert f'{_SCHEMA_NS}#Instance' in schema_xml

    def test_zero_concept_and_relation_diffs(self):
        concepts, edges = roundtrip()
        want = {c["cui"]: c for c in LEXICON_CONCEPTS}
        got = {c["cui"]: c for c in concepts}
        assert set(got) == set(want)
        for cui, w in want.items():
            g = got[cui]
            assert g["name"] == w["name"], cui
            assert g["synonyms"] == list(w["synonyms"]), cui
            assert g["sem_types"] == list(w["sem_types"]), cui
            assert g["sources"] == list(w["sources"]), cui
            assert g["props"] == dict(w.get("props", {})), cui
        # relation diff: exact edge multiset, including the edge to the
        # UNDECLARED LinguisticModifierRoot container
        assert sorted(edges) == sorted(LEXICON_ISA_EDGES)

    def test_unresolved_import_raises(self):
        modifier_xml, _ = context_to_owl(LEXICON_CONCEPTS,
                                         LEXICON_ISA_EDGES)
        try:
            load_owl_context(modifier_xml, {})
        except ValueError as e:
            assert "owl:imports" in str(e)
        else:
            raise AssertionError("missing import must raise")

    def test_loaded_dictionary_matches_native_modifier_matching(self):
        concepts, edges = roundtrip()
        loaded = build_dictionary(concepts, context_config(),
                                  isa_edges=edges)
        native = modifier_dictionary()
        assert loaded.term_map == native.term_map
        assert loaded.word_map == native.word_map
        assert sorted(loaded.isa_edges) == sorted(native.isa_edges)
        assert set(loaded.concepts) == set(native.concepts)
        for cui in native.concepts:
            assert loaded.concepts[cui] == native.concepts[cui], cui
