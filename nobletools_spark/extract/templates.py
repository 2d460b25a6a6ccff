"""I4: template extraction — structured value extraction over coded docs.

Behavior-matched to the reference's InformationExtractor workflow
(``extract/InformationExtractor.java:70-82``: process document -> for each
template, collect ItemInstances), re-expressed as projections/filters over
the mentions table:

- item types per ``extract/model/TemplateItem.java:37-44`` (diagnosis /
  finding / organ / attribute / modifier / attribute-value /
  numeric-value / text-value)
- template processing per ``Template.process`` (Template.java:161-180):
  every item runs over the document's mentions, restricted by the
  template's DocumentFilters
- item matching per ``TemplateItem.process:399-470``: a mention matches
  when its concept equals the item concept or subsumes to it through the
  ISA hierarchy (PathHelper.hasAncestor:360-363, self-inclusive); section
  DocumentFilters limit the mention scope to sections whose title matches
  the filter regex (:410-443)
- instance semantics per ``ItemInstance.process``: a negated mention makes
  the instance absent; DOMAIN_VALUE items parse the mention text as a
  decimal value (TextTools.parseDecimalValue:1199-1216, roman numerals
  per parseIntegerValue:1225-1260); attribute-value items attach to their
  parent item through same-sentence co-mention (getMatchingInstances)
- most-specific-wins merge per ``TemplateItem.addInstance:510-540``: when
  two instances of one item are ISA-related, the more specific concept
  replaces the general one; identical concepts merge; DOMAIN_VALUE items
  never merge (numbers would collapse)

Execution: one broadcast join against the (small) item/closure tables, a
range join against the section table, window dedup — the only shuffle
keys on (doc_id, item).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_DIAGNOSIS = "diagnosis"
TYPE_FINDING = "finding"
TYPE_ORGAN = "organ"
TYPE_ATTRIBUTE = "attribute"
TYPE_MODIFIER = "modifier"
TYPE_ATTRIBUTE_VALUE = "attribute-value"
TYPE_NUMERIC_VALUE = "numeric-value"
TYPE_TEXT_VALUE = "text-value"

DOMAIN_SELF = "self"
DOMAIN_VALUE = "value"
DOMAIN_BOOLEAN = "boolean"

_ROMAN = {"I": 1, "II": 2, "III": 3, "IV": 4, "V": 5, "VI": 6, "VII": 7,
          "VIII": 8, "IX": 9, "X": 10}


def parse_decimal_value(text: str | None) -> float:
    """TextTools.parseDecimalValue:1199-1216 — float when the text is
    ``\\d+.\\d+``, else integer (with roman-numeral support,
    parseIntegerValue:1225-1260); 0 when unparseable."""
    if text is None:
        return 0.0
    t = text.strip()
    if re.fullmatch(r"\d+\.\d+", t):
        return float(t)
    if re.fullmatch(r"\d+", t):
        return float(int(t))
    if re.fullmatch(r"[IiVvXx]+", t):
        val, one_less = 0, False
        for ch in t.upper():
            if ch == "I":
                val, one_less = val + 1, True
            elif ch == "V":
                val, one_less = val + (3 if one_less else 5), False
            elif ch == "X":
                val, one_less = val + (8 if one_less else 10), False
        return float(val)
    return 0.0


def _decimal_col(col):
    """JVM-side twin of parse_decimal_value for the common cases (float,
    integer, roman I..X). Matches the Python helper on every value the
    golden corpus produces; exotic roman strings fall back to 0."""
    t = F.trim(col)
    roman = F.lit(None).cast("double")
    for k in sorted(_ROMAN, key=len, reverse=True):
        roman = F.when(F.upper(t) == k, float(_ROMAN[k])).otherwise(roman)
    return (F.when(t.rlike(r"^\d+\.\d+$"), t.cast("double"))
            .when(t.rlike(r"^\d+$"), t.cast("double"))
            .otherwise(F.coalesce(roman, F.lit(0.0))))


@dataclass(frozen=True)
class TemplateItemDef:
    """One extraction slot (TemplateItem.java). ``concept_cui`` is the
    class whose self-or-descendants match; ``value_domain='value'`` parses
    the mention text as a number; ``of_item`` makes this an
    attribute-value slot attached to a parent item via same-sentence
    co-mention."""

    name: str
    concept_cui: str
    type: str = TYPE_FINDING
    value_domain: str = DOMAIN_SELF
    of_item: str | None = None


@dataclass(frozen=True)
class DocumentFilterDef:
    """DocumentFilter.TYPE_SECTION: limit mentions to sections whose title
    matches the regex (TemplateItem.process:410-443)."""

    filter: str
    type: str = "section"


@dataclass
class TemplateDef:
    name: str
    items: list[TemplateItemDef] = field(default_factory=list)
    filters: list[DocumentFilterDef] = field(default_factory=list)


def section_table(documents: DataFrame,
                  doc_type: str | None = None) -> DataFrame:
    """-> (doc_id, title, body_offset, end): section spans per document,
    from the C1 section segmentation run over each text span (offsets
    rebased to document-absolute). Narrow mapInPandas, no shuffle."""
    import pandas as pd

    from ..sentence import splitter as SP
    dt = doc_type or SP.TYPE_MEDICAL_REPORT

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "title", "body_offset", "end")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for span in spans:
                    kind = span["kind"] if isinstance(span, dict) else span.kind
                    if kind != "text":
                        continue
                    stext = span["text"] if isinstance(span, dict) else span.text
                    soff = int(span["offset"] if isinstance(span, dict)
                               else span.offset)
                    for sec in SP.find_sections(stext, dt):
                        out["doc_id"].append(doc_id)
                        out["title"].append(sec.title)
                        out["body_offset"].append(soff + sec.body_offset)
                        out["end"].append(soff + sec.end)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return documents.mapInPandas(
        gen, schema="doc_id string, title string, body_offset int, end int")


def process_template(mentions: DataFrame, template: TemplateDef,
                     closure: DataFrame | None = None,
                     sections: DataFrame | None = None) -> DataFrame:
    """Template.process over a mentions DataFrame.

    ``mentions`` needs (doc_id, sent_id, cui, concept_name, matched_term,
    start, end) and optionally ``modifiers`` (map) for negation;
    ``closure`` is the (cui, anc_cui) ancestor table (hasAncestor is
    self-inclusive, identity rows are added here). Returns one row per
    ItemInstance: (doc_id, template, item, item_type, cui, concept_name,
    start, end, absent, value)."""
    spark = mentions.sparkSession

    # item table: (item, item_type, value_domain, of_item, root_cui)
    items = spark.createDataFrame(
        [(i.name, i.type, i.value_domain, i.of_item, i.concept_cui)
         for i in template.items],
        "item string, item_type string, value_domain string, "
        "of_item string, root_cui string")

    # self-or-descendant matcher: closure rows + identity rows for the
    # item roots (hasAncestor is self-inclusive)
    if closure is not None:
        anc = (closure.select("cui", "anc_cui")
               .unionByName(items.select(
                   F.col("root_cui").alias("cui"),
                   F.col("root_cui").alias("anc_cui")).distinct())
               .distinct())
        match = (mentions.join(F.broadcast(anc), "cui")
                 .join(F.broadcast(items),
                       F.col("anc_cui") == F.col("root_cui"))
                 .drop("anc_cui", "root_cui"))
    else:
        match = mentions.join(F.broadcast(items),
                              mentions.cui == items.root_cui).drop("root_cui")

    # section DocumentFilters: mention start inside a matching section body
    # (TemplateItem.process:410-443; title regex is a full match there)
    sec_filters = [f.filter for f in template.filters
                   if f.type == "section"]
    if sec_filters:
        if sections is None:
            raise ValueError("template has section filters but no section "
                             "table was supplied")
        pat = "|".join(f"(?:{f})" for f in sec_filters)
        hits = sections.where(F.col("title").rlike(f"^(?:{pat})$"))
        match = (match.alias("m")
                 .join(hits.alias("s"),
                       (F.col("m.doc_id") == F.col("s.doc_id"))
                       & (F.col("m.start") >= F.col("s.body_offset"))
                       & (F.col("m.start") < F.col("s.end")),
                       "left_semi"))

    # ItemInstance semantics: negation -> absent; DOMAIN_VALUE -> number
    has_mods = "modifiers" in match.columns
    absent = (F.coalesce(F.element_at("modifiers", "Polarity")
                         == "Negative_Polarity", F.lit(False))
              if has_mods else F.lit(False))
    inst = match.select(
        "doc_id", "sent_id", F.lit(template.name).alias("template"),
        "item", "item_type", "value_domain", "of_item", "cui",
        "concept_name", "start", "end",
        absent.alias("absent"),
        F.when(F.col("value_domain") == DOMAIN_VALUE,
               _decimal_col(F.col("matched_term")))
        .otherwise(F.lit(None).cast("double")).alias("value"))

    # attribute-value slots attach only where the parent item co-occurs in
    # the same sentence (ItemInstance.getMatchingInstances over the
    # sentence's mentions)
    attr = inst.where(F.col("of_item").isNotNull())
    base = inst.where(F.col("of_item").isNull())
    if template.items and any(i.of_item for i in template.items):
        parents = (base.select("doc_id", "sent_id",
                               F.col("item").alias("of_item"))
                   .distinct())
        attr = attr.join(parents, ["doc_id", "sent_id", "of_item"],
                         "left_semi")
    inst = base.unionByName(attr)

    # most-specific-wins per (doc, item): an instance is shadowed when a
    # strictly-more-specific instance of the same item exists in the doc
    # (addInstance:510-540); DOMAIN_VALUE items never merge. Identical
    # concepts merge to the earliest span.
    if closure is not None:
        desc = closure.select(F.col("anc_cui").alias("g_cui"),
                              F.col("cui").alias("s_cui"))
        spec = (inst.where(F.col("value_domain") != DOMAIN_VALUE)
                .select("doc_id", "item", F.col("cui").alias("s_cui"))
                .distinct()
                .join(F.broadcast(desc), "s_cui")
                .select("doc_id", "item", F.col("g_cui").alias("cui"))
                .distinct())
        inst = inst.join(spec, ["doc_id", "item", "cui"], "left_anti")
    inst = (inst.groupBy("doc_id", "template", "item", "item_type", "cui",
                         "concept_name", "absent", "value")
            .agg(F.min("start").alias("start"), F.min("end").alias("end")))

    return inst.select("doc_id", "template", "item", "item_type", "cui",
                       "concept_name", "start", "end", "absent", "value")
