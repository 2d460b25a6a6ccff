"""F-group tests: ConText modifier assignment (F3/F4), acronym doc-pass
(F1/F2), NegEx (F5), and the fused Spark annotate stage. Sentence shapes
follow the reference's ConTextTest.java:32-41 fixtures."""

import pytest

from nobletools_spark.config import for_search_method
from nobletools_spark.context import negex as NX
from nobletools_spark.context.acronyms import AcronymState
from nobletools_spark.context.context import ConTextEngine
from nobletools_spark.context.lexicon import modifier_dictionary
from nobletools_spark.matcher.core import process_sentence
from nobletools_spark.terminology.fixture import fixture_dictionary

CFG = for_search_method("best-match")


def mentions_for(text):
    return process_sentence(text, fixture_dictionary(), CFG)


@pytest.fixture(scope="module")
def engine():
    return ConTextEngine(modifier_dictionary())


def modifier_value(engine, text, cui, mtype):
    mentions = mentions_for(text)
    slots = engine.process(text, mentions)
    for m, slot in zip(mentions, slots):
        if m.cui == cui:
            vals = slot.get(mtype, [])
            return [v.value for v in vals]
    return None


class TestConText:
    def test_forward_negation(self, engine):
        assert modifier_value(
            engine, "There is no evidence of melanoma in the margins.",
            "C0025202", "Polarity") == ["Negative_Polarity"]

    def test_default_positive_when_unmodified(self, engine):
        assert modifier_value(
            engine, "The melanoma is present.",
            "C0025202", "Polarity") == ["Positive_Polarity"]

    def test_backward_negation(self, engine):
        assert modifier_value(
            engine, "Skin rash is absent.",
            "C0037284", "Polarity") == ["Negative_Polarity"]

    def test_family_history_experiencer(self, engine):
        assert modifier_value(
            engine, "Family history of breast cancer.",
            "C0346109", "Experiencer") == ["FamilyMember_Experiencer"]

    def test_historical_temporality(self, engine):
        assert modifier_value(
            engine, "History of diabetes.",
            "C0011847", "Temporality") == ["Before_DocTimeRel"]

    def test_hedging(self, engine):
        assert modifier_value(
            engine, "Findings suspicious for melanoma.",
            "C0025202", "ContextualModality") == ["Hedged_ContextualModality"]

    def test_terminator_stops_negation(self, engine):
        # 'but' terminates the forward negation scope before 'fever'
        text = "No rash but fever is noted."
        assert modifier_value(engine, text, "C0015230", "Polarity") == \
            ["Negative_Polarity"]
        assert modifier_value(engine, text, "C0015967", "Polarity") == \
            ["Positive_Polarity"]

    def test_window_limits_scope(self, engine):
        # negation 8-word window must not reach a far-away concept
        text = ("No evidence was found at this particular point in time or "
                "any other for that matter regarding melanoma.")
        assert modifier_value(engine, text, "C0025202", "Polarity") == \
            ["Positive_Polarity"]

    def test_pseudo_cancels_negation(self, engine):
        # 'no change' is a pseudo phrase: the 'no' inside it must not negate
        text = "No change in the melanoma."
        assert modifier_value(engine, text, "C0025202", "Polarity") == \
            ["Positive_Polarity"]

    def test_nearest_modifier_wins(self, engine):
        # two distinct negation phrases; the nearer one's span is recorded
        # (Mention.addModifier distance rule, Mention.java:449-460)
        text = "Patient denies fever and presents without rash."
        mentions = mentions_for(text)
        slots = engine.process(text, mentions)
        for m, slot in zip(mentions, slots):
            if m.cui == "C0015230":  # rash
                mods = slot["Polarity"]
                assert [v.value for v in mods] == ["Negative_Polarity"]
                assert mods[0].start == text.index("without")


class TestAcronyms:
    def test_definition_then_standalone(self):
        dico = fixture_dictionary()
        state = AcronymState(dico)
        s1 = "Patient diagnosed with ductal carcinoma in situ (DCIS) today."
        m1 = state.process(s1, process_sentence(s1, dico, CFG))
        assert state.acronyms.get("DCIS") == "C0011389"
        # the expanded mention carries the acronym annotation
        exp = [m for m in m1 if m.cui == "C0011389"]
        assert exp and ("DCIS", s1.index("DCIS")) in exp[0].annotations

        s2 = "The DCIS was excised."
        m2 = state.process(s2, process_sentence(s2, dico, CFG))
        assert any(m.cui == "C0011389" and m.matched_term == "DCIS"
                   for m in m2)

    def test_unknown_acronym_recorded_from_expansion(self):
        # HBP is NOT a dictionary synonym; it binds to hypertension through
        # the document-level acronym map only
        dico = fixture_dictionary()
        state = AcronymState(dico)
        s1 = "Patient has high blood pressure (HBP) per chart."
        state.process(s1, process_sentence(s1, dico, CFG))
        assert state.acronyms.get("HBP") == "C0020538"
        s2 = "HBP well controlled."
        m2 = state.process(s2, process_sentence(s2, dico, CFG))
        cuis = {m.cui for m in m2 if m.matched_term == "HBP"}
        assert cuis == {"C0020538"}

    def test_stopword_misaligned_acronym_not_recorded(self):
        # 'in' is a stop word: FISH fails the reverse alignment walk in the
        # reference too (AcronymDetector.java:104-118)
        dico = fixture_dictionary()
        state = AcronymState(dico)
        s1 = "We performed fluorescence in situ hybridization (FISH) assay."
        state.process(s1, process_sentence(s1, dico, CFG))
        assert "FISH" not in state.acronyms

    def test_state_reset_per_document(self):
        dico = fixture_dictionary()
        state = AcronymState(dico)
        assert state.acronyms == {}


class TestNegEx:
    def test_pre_negation(self):
        text = "Patient denies fever or chills."
        mentions = mentions_for(text)
        mods = NX.process(text, mentions)
        idx = next(i for i, m in enumerate(mentions) if m.cui == "C0015967")
        assert any(m.value == "Negative_Polarity" for m in mods[idx])

    def test_post_negation_retroactive(self):
        text = "Rash is absent."
        mentions = mentions_for(text)
        mods = NX.process(text, mentions)
        idx = next(i for i, m in enumerate(mentions) if m.cui == "C0015230")
        assert any(m.value == "Negative_Polarity" for m in mods[idx])

    def test_conjunction_resets(self):
        text = "No fever but rash was seen."
        mentions = mentions_for(text)
        mods = NX.process(text, mentions)
        for i, m in enumerate(mentions):
            if m.cui == "C0015230":  # rash: after 'but', not negated
                assert not mods[i]
            if m.cui == "C0015967":  # fever: negated
                assert any(x.value == "Negative_Polarity" for x in mods[i])

    def test_indeterminate_hedges(self):
        text = "Melanoma cannot be assessed."
        mentions = mentions_for(text)
        mods = NX.process(text, mentions)
        idx = next(i for i, m in enumerate(mentions) if m.cui == "C0025202")
        assert any(m.value == "Hedged_ContextualModality" for m in mods[idx])

    def test_pseudo_negation_neutral(self):
        text = "No increase in rash."
        mentions = mentions_for(text)
        mods = NX.process(text, mentions)
        idx = next(i for i, m in enumerate(mentions) if m.cui == "C0015230")
        assert not mods[idx]


class TestAnnotateStage:
    @pytest.fixture(scope="class")
    def annotated(self, spark):
        from nobletools_spark.pipeline.documents import generate_documents
        from nobletools_spark.pipeline.stages import (annotate_documents,
                                                      split_sentences)
        docs = generate_documents(spark, 30, seed=11, partitions=3)
        sentences = split_sentences(docs)
        dico_bc = spark.sparkContext.broadcast(fixture_dictionary())
        ctx_bc = spark.sparkContext.broadcast(modifier_dictionary())
        return annotate_documents(sentences, dico_bc, ctx_bc, CFG).cache()

    def test_modifiers_present_and_defaulted(self, annotated):
        rows = annotated.collect()
        assert rows
        for r in rows:
            assert "Polarity" in r.modifiers
            assert r.modifiers["Polarity"] in (
                "Positive_Polarity", "Negative_Polarity")

    def test_some_negative_mentions_found(self, annotated):
        neg = annotated.where(
            annotated.modifiers["Polarity"] == "Negative_Polarity").count()
        assert neg > 0

    def test_matches_plain_detect_on_mention_keys(self, spark, annotated):
        from nobletools_spark.pipeline.documents import generate_documents
        from nobletools_spark.pipeline.stages import (detect_mentions,
                                                      split_sentences)
        docs = generate_documents(spark, 30, seed=11, partitions=3)
        sentences = split_sentences(docs)
        dico_bc = spark.sparkContext.broadcast(fixture_dictionary())
        plain = detect_mentions(sentences, dico_bc, CFG)
        a = {(r.doc_id, r.sent_id, r.cui, r.start, r.end)
             for r in annotated.collect()}
        b = {(r.doc_id, r.sent_id, r.cui, r.start, r.end)
             for r in plain.collect()}
        # acronym pass may add/remove mentions; the overlap must dominate
        assert len(a & b) / max(len(b), 1) > 0.95


class TestSectionScope:
    def test_header_modifier_scopes_section(self, spark):
        from nobletools_spark.pipeline.documents import DOCUMENTS_SCHEMA
        from nobletools_spark.pipeline.stages import (annotate_documents,
                                                      split_sentences)
        # trailing newline keeps the final region contained in its section
        # (reference parity: a region padded past the section end is not
        # header-split — see the docproc differential)
        text = ("FAMILY HISTORY:  Mother had breast cancer. "
                "Father had diabetes.\n"
                "ASSESSMENT:  Patient has a skin rash today.\n")
        docs = spark.createDataFrame(
            [("s1", [{"kind": "text", "text": text, "media_ref": "",
                      "offset": 0}])], schema=DOCUMENTS_SCHEMA)
        sents = split_sentences(docs, filter_headers=False)
        ann = annotate_documents(
            sents, spark.sparkContext.broadcast(fixture_dictionary()),
            spark.sparkContext.broadcast(modifier_dictionary()), CFG)
        rows = {(r.cui): r.modifiers for r in ann.collect()}
        # family-history section: both mentions inherit the experiencer
        assert rows["C0346109"]["Experiencer"] == "FamilyMember_Experiencer"
        assert rows["C0011847"]["Experiencer"] == "FamilyMember_Experiencer"
        # next section resets: rash is patient-experienced
        assert rows["C0037284"]["Experiencer"] == "Patient_Experiencer"
        # headers themselves are not coded
        assert not any(r for r in rows if r == "FamilyMember")
