"""I6 gold-converter tests: eHOST/Knowtator XML parse (reference element
shapes), distributed conversion feeding the I5 evaluator, and the
writer round-trip."""

from nobletools_spark.evaluation import evaluate
from nobletools_spark.pipeline.gold import (ehost_to_gold, gold_to_ehost,
                                            mentions_to_ehost_xml,
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
