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
