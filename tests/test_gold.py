"""I6 gold-converter tests: eHOST/Knowtator XML parse (reference element
shapes), the DeepPhe/Anafora converter, distributed conversion feeding
the I5 evaluator, and the writer round-trip."""

from nobletools_spark.evaluation import evaluate
from nobletools_spark.pipeline.gold import (anafora_to_gold, ehost_to_gold,
                                            gold_to_ehost,
                                            mentions_to_ehost_xml,
                                            parse_anafora_xml,
                                            parse_ehost_xml)

EHOST_XML = """<annotations textSource="report7.txt">
  <annotation>
    <mention id="EHOST_Instance_1"/>
    <annotator id="a">human</annotator>
    <span start="10" end="18"/>
    <spannedText>melanoma</spannedText>
  </annotation>
  <annotation>
    <mention id="EHOST_Instance_3"/>
    <span start="30" end="34"/>
    <span start="40" end="45"/>
    <spannedText>rash ulcer</spannedText>
  </annotation>
  <classMention id="EHOST_Instance_1">
    <hasSlotMention id="EHOST_Instance_2"/>
    <mentionClass id="Melanoma">melanoma</mentionClass>
  </classMention>
  <classMention id="EHOST_Instance_3">
    <mentionClass id="SkinLesion">rash ulcer</mentionClass>
  </classMention>
  <stringSlotMention id="EHOST_Instance_2">
    <mentionSlot id="Polarity"/>
    <stringSlotMentionValue value="Negative_Polarity"/>
  </stringSlotMention>
</annotations>"""


class TestParse:
    def test_reference_element_shapes(self):
        rows = parse_ehost_xml(EHOST_XML)
        assert len(rows) == 3  # 2nd annotation has two spans
        mel = rows[0]
        assert mel["doc_id"] == "report7"      # .txt stripped (:703-707)
        assert (mel["cui"], mel["start"], mel["end"]) == ("Melanoma", 10, 18)
        assert mel["attrs"] == {"Polarity": "Negative_Polarity"}
        assert {(r["start"], r["end"]) for r in rows if r["cui"] ==
                "SkinLesion"} == {(30, 34), (40, 45)}

    def test_distributed_conversion_feeds_evaluator(self, spark):
        xml_docs = spark.createDataFrame(
            [("report7", EHOST_XML)], "doc_id string, xml string")
        gold = ehost_to_gold(spark, xml_docs)
        assert gold.count() == 3
        system = spark.createDataFrame(
            [("report7", "Melanoma", 10, 18),        # exact TP
             ("report7", "SkinLesion", 31, 35),      # overlap -> TPP
             ("report7", "Bogus", 1, 4)],            # FP
            "doc_id string, cui string, start int, end int")
        prf = evaluate(system, gold)
        assert (prf.tp, prf.tpp, prf.fp, prf.fn) == (1, 1, 2, 2)


class TestRoundTrip:
    def test_writer_reader_roundtrip(self, spark):
        mentions = spark.createDataFrame(
            [("d1", "C1", "melanoma <x>", 5, 13,
              {"Polarity": "Negative_Polarity"}),
             ("d1", "C2", "rash", 20, 24, {}),
             ("d2", "C1", "nevus", 0, 5, {})],
            "doc_id string, cui string, matched_term string, start int, "
            "end int, modifiers map<string,string>")
        xml = gold_to_ehost(mentions)
        back = ehost_to_gold(spark, xml)
        got = {(r.doc_id, r.cui, r.start, r.end, r.text,
                tuple(sorted(r.attrs.items()))) for r in back.collect()}
        assert got == {
            ("d1", "C1", 5, 13, "melanoma <x>",
             (("Polarity", "Negative_Polarity"),)),
            ("d1", "C2", 20, 24, "rash", ()),
            ("d2", "C1", 0, 5, "nevus", ()),
        }

    def test_xml_writer_escapes(self):
        xml = mentions_to_ehost_xml("d", [{"cui": "C", "start": 0,
                                           "end": 3, "text": "a<b&c"}])
        assert "a&lt;b&amp;c" in xml

    def test_attribute_values_quoted(self):
        # quotes/&/< inside attribute positions (modifier value, slot key,
        # cui, doc_id) must stay well-formed and survive the round trip
        xml = mentions_to_ehost_xml(
            'd"q', [{"cui": 'C<&"x', "start": 0, "end": 3,
                     "text": "abc",
                     "attrs": {'Pol"key': 'va"l&<ue'}}])
        rows = parse_ehost_xml(xml, doc_id="dq")
        assert rows == [{"doc_id": "dq", "cui": 'C<&"x', "start": 0,
                         "end": 3, "text": "abc",
                         "attrs": {'Pol"key': 'va"l&<ue'}}]


ANAFORA_XML = """<data><annotations>
  <entity>
    <id>e1</id><span>0,9</span><type>Metastasis</type>
    <properties>
      <negation_indicator>e9</negation_indicator>
      <DocTimeRel>BEFORE</DocTimeRel>
      <subject>e5</subject>
    </properties>
  </entity>
  <entity>
    <id>e2</id><span>10,18</span><type>Neoplasm_Stage</type>
    <properties><uncertainty_indicator>e9</uncertainty_indicator></properties>
  </entity>
  <entity>
    <id>e3</id><span>19,25</span><type>Disease_Disorder</type>
    <properties><sizes>e4</sizes></properties>
  </entity>
  <entity>
    <id>e4</id><span>26,30</span><type>size_class</type>
    <properties></properties>
  </entity>
  <entity>
    <id>e5</id><span>0,1</span><type>subject_class</type>
    <properties><subject_normalization>family_member</subject_normalization>
    </properties>
  </entity>
</annotations></data>"""

ANAFORA_TEXT = "metastase staged-x tumor1 size more text here"


class TestAnafora:
    def test_schema_and_linguistic_mapping(self):
        rows = parse_anafora_xml(ANAFORA_XML, ANAFORA_TEXT, "d1")
        by_cls = {r["cui"]: r for r in rows}
        # Disease_Disorder excluded (only its linked size survives via the
        # sizes back-link); subject_class has no schema class
        assert set(by_cls) == {"metastasis_mention", "stage_mention",
                               "size_mention"}
        m = by_cls["metastasis_mention"]
        assert (m["start"], m["end"], m["text"]) == (0, 9, "metastase")
        assert m["attrs"]["hasCertainty"] == (
            "DefiniteNegatedExistence_Certainty")
        assert m["attrs"]["hasTemporality"] == "Before_DocTimeRel"
        # experiencer resolves through the subject link's normalization
        assert m["attrs"]["hasExperiencer"] == "FamilyMember_Experiencer"
        s = by_cls["stage_mention"]
        assert s["attrs"]["hasCertainty"] == "ProbableExistence_Certainty"
        assert s["attrs"]["hasTemporality"] == "Overlap_DocTimeRel"
        assert s["attrs"]["hasExperiencer"] == "Patient_Experiencer"
        assert by_cls["size_mention"]["text"] == "size"

    def test_crlf_offset_conversion(self):
        text = "meta\r\nstase here"
        xml = ("<data><annotations><entity><id>x</id><span>6,12</span>"
               "<type>Metastasis</type><properties/></entity>"
               "</annotations></data>")
        rows = parse_anafora_xml(xml, text, "d")
        # raw span 6..12 covers 'stase ' after CRLF; offsets shift by CRs
        assert rows[0]["text"] == "stase "
        assert (rows[0]["start"], rows[0]["end"]) == (5, 11)

    def test_distributed_conversion_feeds_evaluator(self, spark):
        xml_docs = spark.createDataFrame(
            [("d1", ANAFORA_XML, ANAFORA_TEXT)],
            "doc_id string, xml string, text string")
        gold = anafora_to_gold(spark, xml_docs)
        system = gold.select("doc_id", "cui", "start", "end")
        prf = evaluate(system, gold)
        assert (prf.fp, prf.fn) == (0, 0) and prf.f1 == 1.0


RISKFACTORS_XML = """<root><TEXT>t</TEXT><TAGS>
<HYPERTENSION id="H0" start="10" end="18" text="high bp"
  time="during DCT" indicator="high bp"/>
<HYPERTENSION id="H1" start="12" end="30" text="high blood press."
  time="after DCT" indicator="high bp"/>
<SMOKER id="S0" start="40" end="46" text="smoker" status="current"/>
<MEDICATION id="M0" start="50" end="57" text="aspirin"
  time="before DCT" type1="aspirin"/>
<CAD id="C0" start="60" end="63" text="cad" time="during DCT"
  indicator="mention"/>
</TAGS></root>"""

NLM_BRAT = ("T1\tHypertensionMention 10 18\thigh bp\n"
            "A1\tTime_After T1\nA2\tTime_Before T1\n"
            "T2\tSmokerMention 40 46\tsmoker\nA3\tNegation T2\n"
            "T3\tCADMention 60 63\tcad\nA4\tInvalid T3\n"
            "T4\tUnknownLabel 70 75\tzzz\n")


class TestRiskFactors:
    def test_i2b2_overlap_dedup_and_labels(self):
        from nobletools_spark.pipeline.gold import parse_riskfactors_xml
        rows = parse_riskfactors_xml(RISKFACTORS_XML, "d1")
        by_cls = {r["cui"]: r for r in rows}
        # overlapping same-tag entities merge: longest text wins, the
        # differing times merge to before-overlap (:250-282)
        h = by_cls["hypertension high bp mention"]
        assert (h["start"], h["end"], h["text"]) == (12, 30,
                                                     "high blood press.")
        assert h["attrs"]["hasTemporality"] == "Before-Overlap_DocTimeRel"
        # label rules: status-, type1-, and 'mention'-indicator variants
        assert "smoker current mention" in by_cls
        assert by_cls["medication aspirin mention"]["attrs"][
            "hasTemporality"] == "Before_DocTimeRel"
        assert "cad mention" in by_cls  # 'mention' indicator drops itself

    def test_nlm_brat_attributes(self):
        from nobletools_spark.pipeline.gold import parse_brat_riskfactors
        rows = parse_brat_riskfactors(NLM_BRAT, "d2")
        by_cls = {r["cui"]: r for r in rows}
        # Invalid-modality entity dropped; unknown label skipped
        assert set(by_cls) == {"Hypertension_mention", "Smoker_ever_mention"}
        hyp = by_cls["Hypertension_mention"]
        # two Time_* attributes merge to Before-During (:194-204)
        assert hyp["attrs"]["hasTemporality"] == "Before-Overlap_DocTimeRel"
        assert hyp["attrs"]["hasCertainty"] == "DefiniteExistence_Certainty"
        smk = by_cls["Smoker_ever_mention"]
        assert smk["attrs"]["hasCertainty"] == (
            "DefiniteNegatedExistence_Certainty")
        assert smk["attrs"]["hasExperiencer"] == "Patient_Experiencer"

    def test_distributed_conversion_feeds_evaluator(self, spark):
        from nobletools_spark.pipeline.gold import (brat_to_gold,
                                                    riskfactors_to_gold)
        rf = riskfactors_to_gold(spark, spark.createDataFrame(
            [("d1", RISKFACTORS_XML)], "doc_id string, xml string"))
        nlm = brat_to_gold(spark, spark.createDataFrame(
            [("d2", NLM_BRAT)], "doc_id string, ann string"))
        gold = rf.unionByName(nlm)
        system = gold.select("doc_id", "cui", "start", "end")
        prf = evaluate(system, gold)
        assert (prf.fp, prf.fn) == (0, 0) and prf.f1 == 1.0
