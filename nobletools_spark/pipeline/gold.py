"""I6: gold-annotation converters — eHOST/Knowtator XML <-> DataFrames.

Behavior-matched to ``eval/ehost/EhostToInstances.java:85-140``: the
document title comes from the root's ``textSource`` attribute;
``annotation`` elements carry the span(s) + spanned text and link to a
``classMention`` by mention id; the class mention names the annotation
class (``mentionClass``) and links ``hasSlotMention`` ids to
``stringSlotMention`` elements holding (mentionSlot id, value) attribute
pairs. The reverse direction mirrors ``InstancesToEhost.java``.

The DataFrame shape matches ``evaluation.KEYS`` (doc_id, cui, start,
end) so converted gold feeds ``evaluation.evaluate`` /
``per_concept_report`` directly; class names ride in ``cui`` exactly as
the reference treats eHOST mention classes as concept identifiers.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

GOLD_SCHEMA = ("doc_id string, cui string, start int, end int, "
               "text string, attrs map<string,string>")


def parse_ehost_xml(xml_text: str, doc_id: str | None = None) -> list[dict]:
    """One eHOST/Knowtator .knowtator.xml document -> gold rows."""
    root = ET.fromstring(xml_text)
    doc = doc_id or root.get("textSource", "")
    if doc.endswith(".txt"):
        doc = doc[: -len(".txt")]

    class_mentions: dict[str, ET.Element] = {}
    slot_mentions: dict[str, ET.Element] = {}
    for el in root.iter("classMention"):
        class_mentions[el.get("id", "")] = el
    for el in root.iter("stringSlotMention"):
        slot_mentions[el.get("id", "")] = el

    out: list[dict] = []
    for ann in root.iter("annotation"):
        mention = ann.find("mention")
        if mention is None:
            continue
        cm = class_mentions.get(mention.get("id", ""))
        if cm is None:
            continue
        mention_class = cm.find("mentionClass")
        if mention_class is None:
            continue
        cls = mention_class.get("id", "")
        text = ann.findtext("spannedText") or ""
        attrs: dict[str, str] = {}
        for slot_ref in cm.findall("hasSlotMention"):
            slot = slot_mentions.get(slot_ref.get("id", ""))
            if slot is None:
                continue
            slot_id = slot.find("mentionSlot")
            val = slot.find("stringSlotMentionValue")
            if slot_id is not None and val is not None:
                attrs[slot_id.get("id", "")] = val.get("value", "")
        for span in ann.findall("span"):
            out.append({"doc_id": doc, "cui": cls,
                        "start": int(span.get("start", "0")),
                        "end": int(span.get("end", "0")),
                        "text": text, "attrs": attrs})
    return out


def ehost_to_gold(spark: SparkSession, xml_docs: DataFrame) -> DataFrame:
    """Distributed conversion: (doc_id, xml) rows -> the gold annotation
    DataFrame (evaluation.KEYS shape). Narrow mapInPandas, no shuffle."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                rows.extend(parse_ehost_xml(xml, doc_id=str(doc_id)))
            if rows:
                yield pd.DataFrame(rows)

    return xml_docs.mapInPandas(gen, schema=GOLD_SCHEMA)


# ---------------------------------------------------------------------
# DeepPhe / Anafora converter (eval/gold/DeepPheToInstances.java)

# entity type -> mention-annotation class (getSchemaMap :569-582)
DEEPPHE_SCHEMA_MAP = {
    "Disease_Disorder": "associated_neoplasm_mention",
    "Finding_TNM": "tnm_mention",
    "LabResult_Receptor": "receptors_mention",
    "Medications/Drugs": "medications_mention",
    "Metastasis": "metastasis_mention",
    "Neoplasm_Stage": "stage_mention",
    "size_class": "size_mention",
    "Procedure": "procedure_mention",
}

_DOCTIMEREL = {"BEFORE": "Before_DocTimeRel",
               "OVERLAP": "Overlap_DocTimeRel",
               "BEFORE/OVERLAP": "Before-Overlap_DocTimeRel",
               "AFTER": "After_DocTimeRel"}

_SUBJECT = {"patient": "Patient_Experiencer",
            "family_member": "FamilyMember_Experiencer",
            "donor_family_member": "DonorFamilyMember_Experiencer",
            "donor_other": "DonorOtherMember_Experiencer",
            "other": "OtherMember_Experiencer"}


def _crlf_offset(text: str, offset: int) -> int:
    """TextTools.convertCRLF_Offset:1100-1103 — subtract CR count."""
    return offset - text[:offset].count("\r")


def parse_anafora_xml(xml_text: str, doc_text: str,
                      doc_id: str) -> list[dict]:
    """One Anafora (DeepPhe gold) XML document -> gold rows, mirroring
    DeepPheToInstances: entity elements carry (id, span 'start,end',
    type, multi-valued properties); the useful-annotation selection
    drops Disease_Disorder/size_class except via the
    associated_neoplasm / sizes links (:311-330); linguistic attributes
    derive from negation/uncertainty indicators, DocTimeRel, and the
    subject link's subject_normalization (:585-655). The reference's
    Procedure refinement via ontology restrictions is out of scope here
    (no OWL-API); Procedure maps to its schema class directly."""
    root = ET.fromstring(xml_text)
    entities: dict[str, dict] = {}
    for el in root.iter("entity"):
        props: dict[str, list[str]] = {}
        for p in el.findall("properties"):
            for child in p:
                props.setdefault(child.tag, []).append(child.text or "")
        ent = {"id": el.findtext("id") or "",
               "span": (el.findtext("span") or "").strip(),
               "type": el.findtext("type") or "",
               "props": props}
        entities[ent["id"]] = ent

    def prop(e: dict, name: str) -> str | None:
        vals = e["props"].get(name)
        return vals[0] if vals else None

    # getUsefulAnnotations:311-330
    useful: dict[str, dict] = {}
    for e in entities.values():
        if e["type"] not in ("Disease_Disorder", "size_class"):
            useful[e["id"]] = e
            assoc = prop(e, "associated_neoplasm")
            if assoc and assoc in entities:
                useful[assoc] = entities[assoc]
        elif e["props"].get("sizes"):
            for sid in e["props"]["sizes"]:
                se = entities.get(sid)
                if se is not None:
                    se["props"].setdefault("associated_neoplasm",
                                           []).append(e["id"])
                    useful[se["id"]] = se

    out: list[dict] = []
    for e in useful.values():
        cls = DEEPPHE_SCHEMA_MAP.get(e["type"])
        if cls is None or not e["span"]:
            continue
        parts = [p for p in re.split(r"[,:;]", e["span"]) if p]
        if len(parts) < 2:
            continue
        start, end = int(parts[0]), int(parts[1])
        if end >= len(doc_text) + 1:
            continue  # parseAnnotations keeps spans inside the text
        text = doc_text[start:end]
        start, end = (_crlf_offset(doc_text, start),
                      _crlf_offset(doc_text, end))

        neg = bool(prop(e, "negation_indicator"))
        unc = bool(prop(e, "uncertainty_indicator"))
        certainty = ("ProbableNegatedExistence_Certainty"
                     if neg and unc else
                     "DefiniteNegatedExistence_Certainty" if neg else
                     "ProbableExistence_Certainty" if unc else
                     "DefiniteExistence_Certainty")
        temporality = _DOCTIMEREL.get(prop(e, "DocTimeRel") or "",
                                      "Overlap_DocTimeRel")
        experiencer = "Patient_Experiencer"
        subj = prop(e, "subject")
        if subj and subj in entities:
            norm = prop(entities[subj], "subject_normalization")
            experiencer = _SUBJECT.get(norm or "", "Patient_Experiencer")

        out.append({"doc_id": doc_id, "cui": cls, "start": start,
                    "end": end, "text": text,
                    "attrs": {"hasCertainty": certainty,
                              "hasTemporality": temporality,
                              "hasExperiencer": experiencer}})
    return out


def anafora_to_gold(spark: SparkSession, xml_docs: DataFrame) -> DataFrame:
    """Distributed DeepPhe conversion: (doc_id, xml, text) rows -> the
    gold annotation DataFrame (evaluation.KEYS shape), feeding the I5
    evaluator exactly like ehost_to_gold. Narrow mapInPandas."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, xml, text in zip(pdf["doc_id"], pdf["xml"],
                                         pdf["text"]):
                rows.extend(parse_anafora_xml(xml, text or "",
                                              doc_id=str(doc_id)))
            if rows:
                yield pd.DataFrame(rows)

    return xml_docs.mapInPandas(gen, schema=GOLD_SCHEMA)


def mentions_to_ehost_xml(doc_id: str, mentions: list[dict]) -> str:
    """InstancesToEhost analog: system mentions of one document -> the
    eHOST XML shape parse_ehost_xml reads back (round-trip pinned).
    All attribute values go through quoteattr so quotes/&/< in modifier
    values, CUIs, or doc ids can't produce malformed XML."""
    from xml.sax.saxutils import escape, quoteattr
    parts = [f"<annotations textSource={quoteattr(doc_id + '.txt')}>"]
    slot_counter = len(mentions)
    slot_parts: list[str] = []
    for i, m in enumerate(mentions):
        mid = f"Instance_{i}"
        text = escape(m.get("text") or m.get("matched_term") or "")
        parts.append(
            f'<annotation><mention id="{mid}"/>'
            f'<span start="{int(m["start"])}" end="{int(m["end"])}"/>'
            f"<spannedText>{text}</spannedText></annotation>")
        slots = []
        for k, v in sorted((m.get("attrs") or m.get("modifiers")
                            or {}).items()):
            sid = f"Instance_{slot_counter}"
            slot_counter += 1
            slots.append(f'<hasSlotMention id="{sid}"/>')
            slot_parts.append(
                f'<stringSlotMention id="{sid}">'
                f"<mentionSlot id={quoteattr(str(k))}/>"
                f"<stringSlotMentionValue value={quoteattr(str(v))}/>"
                f"</stringSlotMention>")
        parts.append(
            f'<classMention id="{mid}">{"".join(slots)}'
            f"<mentionClass id={quoteattr(str(m['cui']))}>{text}"
            f"</mentionClass></classMention>")
    parts.extend(slot_parts)
    parts.append("</annotations>")
    return "".join(parts)


def gold_to_ehost(mentions: DataFrame) -> DataFrame:
    """-> (doc_id, xml): one eHOST XML document per doc_id, generated
    distributed (groupBy doc_id — the single shuffle)."""
    import pandas as pd
    from pyspark.sql import functions as F

    has_mods = "modifiers" in mentions.columns
    cols = ["cui", "start", "end",
            ("matched_term" if "matched_term" in mentions.columns
             else "text")]
    struct_cols = [F.col(c) for c in cols]
    if has_mods:
        struct_cols.append(F.col("modifiers"))
    # NB no sort_array: structs holding map columns are unorderable in
    # Spark; deterministic ordering happens in the Python pass below
    grouped = (mentions.groupBy("doc_id")
               .agg(F.collect_list(F.struct(*struct_cols)).alias("_ms")))

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "xml": []}
            for doc_id, ms in zip(pdf["doc_id"], pdf["_ms"]):
                rows = []
                for m in ms:
                    d = m if isinstance(m, dict) else m.asDict()
                    rows.append({
                        "cui": d["cui"], "start": d["start"],
                        "end": d["end"],
                        "text": d.get("matched_term") or d.get("text"),
                        "attrs": d.get("modifiers") or {}})
                rows.sort(key=lambda r: (r["start"], r["end"], r["cui"]))
                out["doc_id"].append(doc_id)
                out["xml"].append(mentions_to_ehost_xml(str(doc_id), rows))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return grouped.mapInPandas(gen, schema="doc_id string, xml string")


# ---------------------------------------------------------------------
# i2b2 RiskFactors converter (eval/gold/RiskFactorsToInstances.java)

_RF_TIME = {"after DCT": "After_DocTimeRel",
            "before DCT": "Before_DocTimeRel",
            "during DCT": "Overlap_DocTimeRel",
            "before-overlap DCT": "Before-Overlap_DocTimeRel"}


def _rf_label(tag: str, attrs: dict[str, str]) -> str | None:
    """getClass:368-400 — class label from indicator/status/type1."""
    indicator, status, type1 = (attrs.get("indicator"), attrs.get("status"),
                                attrs.get("type1"))
    if indicator is not None:
        indicator = re.sub(r"[^A-Za-z0-9 ]+", "", indicator)
        tag = tag.replace("_", " ")
        mid = "" if indicator == "mention" else " " + indicator
        return f"{tag}{mid} mention".lower()
    if status is not None:
        return f"{tag} {status} mention".lower()
    if type1 is not None:
        return f"{tag} {type1} mention".lower()
    return None


def parse_riskfactors_xml(xml_text: str, doc_id: str) -> list[dict]:
    """One i2b2 risk-factors XML document -> gold rows, mirroring
    RiskFactorsToInstances: the TAGS element's children are entities
    whose ATTRIBUTES carry the properties; same-tag overlapping spans
    deduplicate to the longest-text entry, merging differing times to
    'before-overlap DCT' (:220-282); the annotation class derives from
    tag + indicator/status/type1 (:368-400)."""
    root = ET.fromstring(xml_text)
    tags = root.find("TAGS")
    if tags is None:
        tags = root if root.tag == "TAGS" else None
    if tags is None:
        return []
    ents: list[dict] = []
    for el in tags:
        e = {"tag": el.tag, **el.attrib}
        if "start" in e and "end" in e:
            e["_start"], e["_end"] = int(e["start"]), int(e["end"])
            ents.append(e)

    # overlap dedup per tag: keep longest trimmed text, merge times
    removed: set[int] = set()
    visited: set[int] = set()
    for i, a in enumerate(ents):
        if i in visited:
            continue
        dup = [i]
        for j, b in enumerate(ents):
            if j in visited or i == j:
                continue
            if (a["tag"] == b["tag"] and a["_start"] < b["_end"]
                    and b["_start"] < a["_end"]):
                dup.append(j)
        if len(dup) > 1:
            visited.update(dup)
            times = {ents[k].get("time") for k in dup
                     if ents[k].get("time")}
            best = max(dup, key=lambda k: len(
                (ents[k].get("text") or "").strip()))
            if times:
                ents[best]["time"] = (next(iter(times)) if len(times) == 1
                                      else "before-overlap DCT")
            removed.update(k for k in dup if k != best)

    out: list[dict] = []
    for i, e in enumerate(ents):
        if i in removed:
            continue
        label = _rf_label(e["tag"], e)
        if label is None:
            continue
        attrs = {}
        t = _RF_TIME.get(e.get("time", ""))
        if t:
            attrs["hasTemporality"] = t
        out.append({"doc_id": doc_id, "cui": label, "start": e["_start"],
                    "end": e["_end"], "text": e.get("text", ""),
                    "attrs": attrs})
    return out


def riskfactors_to_gold(spark: SparkSession,
                        xml_docs: DataFrame) -> DataFrame:
    """Distributed i2b2 risk-factors conversion: (doc_id, xml) rows ->
    gold DataFrame. Narrow mapInPandas."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                rows.extend(parse_riskfactors_xml(xml, doc_id=str(doc_id)))
            if rows:
                yield pd.DataFrame(rows)

    return xml_docs.mapInPandas(gen, schema=GOLD_SCHEMA)


# ---------------------------------------------------------------------
# NLM risk-factors BRAT converter (eval/gold/NLMRiskFactorsToInstances)

NLM_SCHEMA_MAP = {
    "A1C": "High_A1c_mention",
    "BloodPressure": "High_blood_pressure_over_140_over_90_mm_per_hg",
    "BMI": "BMI_over_18_mention",
    "CADEvent": "CAD_event_mention",
    "CADMention": "CAD_mention",
    "CADSymptom": "CAD_symptom",
    "CADTestResult": "CAD_test_mention",
    "Cholesterol": "High_cholesterol_over_240_mention",
    "DiabetesMention": "Diabetes_mention",
    "Glucose": "High_glucose_mention",
    "HyperlipidemiaMention": "Hyperlipidemia_mention",
    "HypertensionMention": "Hypertension_mention",
    "LDL": "High_LDL_measurement_over_100_mg_per_dL_mention",
    "Medication1": "MedicationStatement",
    "Medication2": "MedicationStatement",
    "ObeseMention": "Obesity_mention",
    "SmokerMention": "Smoker_ever_mention",
}

_NLM_TIME = {"Time_After": "After_DocTimeRel",
             "Time_Before": "Before_DocTimeRel",
             "Time_During": "Overlap_DocTimeRel",
             "Time_Before-During": "Before-Overlap_DocTimeRel"}


def parse_brat_riskfactors(ann_text: str, doc_id: str) -> list[dict]:
    """One NLM risk-factors BRAT standoff document -> gold rows,
    mirroring NLMRiskFactorsToInstances: T-lines carry
    'Label start end<TAB>text' spans, A-lines attach 'Attr T#'
    attributes; multiple Time_* attributes merge to Time_Before-During
    (:194-204); Negation -> negated certainty; Invalid modality drops
    the entity (:287-291); experiencer is always the patient."""
    spans: dict[str, dict] = {}
    attrs: list[tuple[str, str]] = []
    for line in ann_text.splitlines():
        parts = line.split("\t")
        if len(parts) < 2:
            continue
        eid, label = parts[0], parts[1]
        if len(parts) > 2:
            m = re.fullmatch(r"(.+)\s+(\d+)\s+(\d+)", label)
            if m and not eid.startswith("A"):
                spans[eid] = {"label": m.group(1),
                              "start": int(m.group(2)),
                              "end": int(m.group(3)),
                              "text": parts[2].strip(), "attrs": []}
        else:
            m = re.fullmatch(r"(.+)\s+(T\d+)", label)
            if m and eid.startswith("A"):
                attrs.append((m.group(2), m.group(1)))
    for target, value in attrs:
        if target in spans:
            spans[target]["attrs"].append(value)

    out: list[dict] = []
    for e in spans.values():
        cls = NLM_SCHEMA_MAP.get(e["label"])
        if cls is None:
            continue
        vals = e["attrs"]
        if "Invalid" in vals:
            continue  # skip Invalid-modality entities (:287-291)
        times = [v for v in vals if v.startswith("Time_")]
        time = (times[0] if len(times) == 1
                else "Time_Before-During" if times else None)
        certainty = ("DefiniteNegatedExistence_Certainty"
                     if "Negation" in vals
                     else "DefiniteExistence_Certainty")
        out.append({"doc_id": doc_id, "cui": cls, "start": e["start"],
                    "end": e["end"], "text": e["text"],
                    "attrs": {
                        "hasTemporality": _NLM_TIME.get(
                            time or "", "Overlap_DocTimeRel"),
                        "hasCertainty": certainty,
                        "hasExperiencer": "Patient_Experiencer"}})
    return out


def brat_to_gold(spark: SparkSession, ann_docs: DataFrame) -> DataFrame:
    """Distributed NLM BRAT conversion: (doc_id, ann) rows -> gold
    DataFrame. Narrow mapInPandas."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, ann in zip(pdf["doc_id"], pdf["ann"]):
                rows.extend(parse_brat_riskfactors(ann, doc_id=str(doc_id)))
            if rows:
                yield pd.DataFrame(rows)

    return ann_docs.mapInPandas(gen, schema=GOLD_SCHEMA)
