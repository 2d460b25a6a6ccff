"""Terminology source loaders (SURVEY.md §2.A).

- OBO (A3): `[Term]` stanza parser — id/name/synonym(+EXACT/NARROW/BROAD)/
  def/is_a/alt_id, obsolete skip. Semantics per
  ``util/ConceptImporter.loadOBO`` (ConceptImporter.java:196-349).
- Tab-indented text (A5): indentation = hierarchy, ``|;,``-separated
  synonyms, CUI/TUI token recognition (ConceptImporter.java:623-750).
- RRF (A2): UMLS/NCI Meta Rich Release Format — MRCONSO/MRSTY/MRDEF/MRHIER
  pipe-delimited files parsed as Spark DataFrames and folded into concept
  records with groupBy/collect aggregations (ConceptImporter.java:780-1337).

OBO and tab-text parse driver-side (vocabulary files are dictionary-scale,
not corpus-scale); RRF — the only loader whose input can reach tens of GB —
is Spark-native end to end: `spark.read.csv(sep='|')` scans parallelize and
push column pruning into the file scan, and every fold is a hash aggregate.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST
from pyspark.sql.window import Window

_CUI = re.compile(r"CL?\d{6,7}")
_TUI = re.compile(r"T\d{3}")
_OBO_VAL = re.compile(r"\"(.*)\"\s*([A-Z_]*)\s*(.*)?\[.*\]")


def load_obo(lines: Iterable[str]) -> tuple[list[dict], list[tuple[str, str]]]:
    """Parse OBO stanzas -> (concept records, BROADER isa edges)."""
    concepts: dict[str, dict] = {}
    edges: list[tuple[str, str]] = []
    cur: dict | None = None

    def flush(c: dict | None):
        if c is not None and c.get("cui"):
            concepts[c["cui"]] = c

    for raw in lines:
        line = raw.rstrip("\n")
        if line.strip() == "[Term]":
            flush(cur)
            cur = dict(cui="", name="", synonyms=[], sem_types=[],
                       sources=[], terms=[], definitions=[], codes={})
            continue
        if cur is None:
            continue
        if ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip(), val.strip()
        if key == "id":
            cur["cui"] = val
        elif key == "name":
            cur["name"] = val
            cur["synonyms"].insert(0, val)
            cur["terms"].append((val, "PT"))
        elif key == "namespace":
            cur["sem_types"].append(val)
        elif key == "def":
            m = _OBO_VAL.match(val)
            cur["definitions"].append(m.group(1) if m else val)
        elif re.fullmatch(r"(exact_|narrow_|broad_)?synonym", key):
            m = _OBO_VAL.match(val)
            text, form = (m.group(1), m.group(2)) if m else (val, "")
            cur["synonyms"].append(text)
            cur["terms"].append((text, form or "SY"))
        elif key == "is_a":
            tgt = val.split("!", 1)[0].strip()
            if tgt:
                edges.append((cur["cui"] or "", tgt))
        elif key == "alt_id":
            cur["codes"][val] = val
        elif key == "is_obsolete" and val.lower() == "true":
            cur = None
    flush(cur)

    # patch edge child ids recorded before the concept id line appeared
    ids = set(concepts)
    fixed = [(c, p) for c, p in edges if c in ids and p in ids]
    return list(concepts.values()), fixed


def load_tab_text(lines: Iterable[str]) -> tuple[list[dict], list[tuple[str, str]]]:
    """Tab-indented terminology: depth = leading tabs; synonyms split on
    ``|;,``; CUI tokens -> alt codes, TUI tokens -> semantic types."""
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    stack: list[str] = []        # cui per depth
    auto = 0

    for raw in lines:
        if not raw.strip() or raw.strip().startswith("#"):
            continue
        depth = len(raw) - len(raw.lstrip("\t"))
        parts = [p.strip() for p in re.split(r"[|;,]", raw.strip()) if p.strip()]
        if not parts:
            continue
        name = parts[0]
        cui = ""
        sem_types, synonyms = [], []
        for tok in parts:
            if _CUI.fullmatch(tok):
                cui = cui or tok
            elif _TUI.fullmatch(tok):
                sem_types.append(tok)
            else:
                synonyms.append(tok)
        if not cui:
            auto += 1
            cui = f"TX{auto:07d}"
        concepts.append(dict(cui=cui, name=name, synonyms=synonyms,
                             sem_types=sem_types, sources=["TEXT"],
                             terms=[(name, "PT")], definitions=[], codes={}))
        del stack[depth:]
        if stack:
            edges.append((cui, stack[-1]))
        stack.append(cui)
    return concepts, edges


# ------------------------------------------------------------------- RRF ---

MRCONSO_COLS = ["CUI", "LAT", "TS", "LUI", "STT", "SUI", "ISPREF", "AUI",
                "SAUI", "SCUI", "SDUI", "SAB", "TTY", "CODE", "STR", "SRL",
                "SUPPRESS", "CVF"]
MRSTY_COLS = ["CUI", "TUI", "STN", "STY", "ATUI", "CVF"]
MRDEF_COLS = ["CUI", "AUI", "ATUI", "SATUI", "SAB", "DEF", "SUPPRESS", "CVF"]
MRHIER_COLS = ["CUI", "AUI", "CXN", "PAUI", "SAB", "RELA", "PTR", "HCD", "CVF"]
MRSAB_COLS = ["VCUI", "RCUI", "VSAB", "RSAB", "SON", "SF", "SVER", "VSTART",
              "VEND", "IMETA", "RMETA", "SLC", "SCC", "SRL", "TFR", "CFR",
              "CXTY", "TTYL", "ATNL", "LAT", "CENC", "CURVER", "SABIN",
              "SSN", "SCIT"]


def read_rrf(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """One RRF file -> DataFrame. RRF rows end with a trailing '|' so the
    raw split carries one empty tail column, dropped here. RRF is raw
    pipe-delimited (the reference splits on '|' with no quoting, see
    ConceptImporter), so CSV quoting is disabled — STR/DEF fields holding
    double quotes must pass through verbatim."""
    df = spark.read.csv(path, sep="|", header=False, quote="")
    if not df.columns:  # empty file
        schema = ST.StructType(
            [ST.StructField(c, ST.StringType(), True) for c in cols])
        return df.sparkSession.createDataFrame([], schema=schema)
    sel = [F.col(f"_c{i}").alias(c) if i < len(df.columns)
           else F.lit(None).cast("string").alias(c)
           for i, c in enumerate(cols)]
    return df.select(*sel)


def load_rrf(spark: SparkSession, rrf_dir: str,
             languages: tuple[str, ...] = ("ENG",),
             source_filter: tuple[str, ...] | None = None,
             suppress_filter: bool = True) -> dict[str, DataFrame]:
    """A2: MRCONSO/MRSTY/MRDEF/MRHIER -> concept + hierarchy DataFrames.

    Output `concepts` matches build.CONCEPTS_SCHEMA minus `_idx` (added by
    the caller); `isa_edges(child_cui, parent_cui)` comes from MRHIER PAUI
    links resolved through the AUI->CUI xref (ConceptImporter.java:1243-1337).
    Every stage is a scan + filter + hash aggregate; nothing collects.
    """
    conso = read_rrf(spark, f"{rrf_dir}/MRCONSO.RRF", MRCONSO_COLS)
    conso = conso.where(F.col("LAT").isin(list(languages)))
    if suppress_filter:
        # empty csv fields arrive as null
        conso = conso.where(F.coalesce(F.col("SUPPRESS"), F.lit("")).isin("N", ""))
    if source_filter:
        conso = conso.where(F.col("SAB").isin(list(source_filter)))

    # preferred-name priority per getPreferredName:870-903 folded into
    # min_by on a struct key: TS='P' & ISPREF='Y' first, then TTY PN > PT,
    # then ascending SUI, then STR — fully deterministic under any
    # partitioning (struct ordering is lexicographic)
    pref_rank = (F.when((F.col("TS") == "P") & (F.col("ISPREF") == "Y"), 4)
                 .when(F.col("TTY") == "PN", 3)
                 .when(F.col("TTY") == "PT", 2)
                 .otherwise(0))
    sui_num = F.coalesce(
        F.expr("try_cast(substring(SUI, 2) AS BIGINT)"), F.lit(2 ** 62))
    pref_key = F.struct((-pref_rank).alias("neg_rank"), sui_num.alias("sui"),
                        F.col("STR").alias("str"))

    grouped = (conso.groupBy("CUI").agg(
        F.min_by("STR", pref_key).alias("name"),
        F.array_distinct(F.collect_list("STR")).alias("synonyms"),
        F.array_distinct(F.collect_list("SAB")).alias("sources"),
        F.array_distinct(F.collect_list(F.struct(
            F.col("STR").alias("text"), F.col("TTY").alias("form")))).alias("terms"),
        F.array_distinct(F.collect_list(F.struct(
            F.col("SAB").alias("source"), F.col("CODE").alias("code")))).alias("codes"),
    ))

    sty = (read_rrf(spark, f"{rrf_dir}/MRSTY.RRF", MRSTY_COLS)
           .groupBy("CUI")
           .agg(F.array_distinct(F.collect_list("STY")).alias("sem_types")))
    try:
        mrdef = (read_rrf(spark, f"{rrf_dir}/MRDEF.RRF", MRDEF_COLS)
                 .groupBy("CUI")
                 .agg(F.array_distinct(F.collect_list("DEF")).alias("definitions")))
    except Exception:
        mrdef = None

    out = grouped.join(sty, "CUI", "left")
    if mrdef is not None:
        out = out.join(mrdef, "CUI", "left")
    else:
        out = out.withColumn("definitions", F.array().cast("array<string>"))
    concepts = out.select(
        F.col("CUI").alias("cui"), "name",
        F.coalesce("synonyms", F.array().cast("array<string>")).alias("synonyms"),
        F.coalesce("sem_types", F.array().cast("array<string>")).alias("sem_types"),
        F.coalesce("sources", F.array().cast("array<string>")).alias("sources"),
        "terms",
        F.coalesce("definitions", F.array().cast("array<string>")).alias("definitions"),
        "codes")

    # MRHIER: PTR is the AUI path from root; the immediate parent is PAUI.
    # Optional, like MRDEF: a distribution without hierarchy (e.g. one
    # produced by rrf_export — the reference's exportRRF writes no
    # MRHIER either) loads with empty edges/roots.
    aui2cui = conso.select("AUI", F.col("CUI").alias("_cui")).distinct()
    try:
        hier = read_rrf(spark, f"{rrf_dir}/MRHIER.RRF", MRHIER_COLS)
    except Exception:
        hier = spark.createDataFrame(
            [], ST.StructType([ST.StructField(c, ST.StringType(), True)
                               for c in MRHIER_COLS]))
    edges = (hier.where(F.col("PAUI").isNotNull() & (F.col("PAUI") != ""))
             .join(aui2cui, hier.AUI == aui2cui.AUI)
             .withColumnRenamed("_cui", "child_cui")
             .drop(aui2cui.AUI)
             .join(aui2cui.withColumnRenamed("_cui", "parent_cui")
                   .withColumnRenamed("AUI", "PAUI2"),
                   F.col("PAUI") == F.col("PAUI2"))
             .select("child_cui", "parent_cui")
             .where(F.col("child_cui") != F.col("parent_cui"))
             .distinct())

    # roots = heads of MRHIER paths (ConceptImporter.java:1331-1336)
    path_head = F.split(F.col("PTR"), r"\.")[0]
    roots = (hier.where(F.col("PTR").isNotNull() & (F.col("PTR") != ""))
             .select(path_head.alias("AUI_head")).distinct()
             .join(aui2cui, F.col("AUI_head") == aui2cui.AUI)
             .select(F.col("_cui").alias("cui")).distinct())

    return {"concepts": concepts, "isa_edges": edges, "roots": roots}


def rrf_concepts_with_index(concepts: DataFrame) -> DataFrame:
    """Attach the `_idx` insertion-order column build_tables expects; RRF
    order = CUI order (the reference walks MRCONSO sequentially)."""
    w = Window.orderBy("cui")
    return concepts.withColumn("_idx", F.row_number().over(w).cast("long") - 1)


# ------------------------------------------------------------------- OWL ---

_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
_OWL = "{http://www.w3.org/2002/07/owl#}"
_OBO = "{http://www.geneontology.org/formats/oboInOwl#}"


def _frag(uri: str) -> str:
    for sep in ("#", "/"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1]
    return uri


def load_owl(xml_text: str) -> tuple[list[dict], list[tuple[str, str]]]:
    """A4: OWL ontology loader (ConceptImporter.java:376-424 semantics —
    class tree -> concepts, subClassOf -> BROADER edges). The container has
    no OWL-API/rdflib, so this is a minimal stdlib RDF/XML parser covering
    the class-hierarchy subset the reference consumes: ``owl:Class`` with
    ``rdfs:label``, ``rdfs:subClassOf rdf:resource``, and oboInOwl
    exact/related synonym literals. Anonymous/restriction superclasses are
    skipped (the reference's reasoner features are out of scope)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml_text)
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    ids: set[str] = set()

    for cls in root.iter(_OWL + "Class"):
        about = cls.get(_RDF + "about") or cls.get(_RDF + "ID")
        if not about:
            continue  # anonymous class (restriction node)
        cui = _frag(about)
        label = None
        synonyms: list[str] = []
        for child in cls:
            if child.tag == _RDFS + "label" and child.text:
                label = child.text.strip()
            elif child.tag in (_OBO + "hasExactSynonym",
                               _OBO + "hasRelatedSynonym") and child.text:
                synonyms.append(child.text.strip())
            elif child.tag == _RDFS + "subClassOf":
                res = child.get(_RDF + "resource")
                if res:  # named superclass only
                    edges.append((cui, _frag(res)))
        name = label or cui
        ids.add(cui)
        concepts.append(dict(cui=cui, name=name,
                             synonyms=[name, *synonyms],
                             sem_types=[], sources=["OWL"],
                             terms=[(name, "PT")], definitions=[], codes={}))
    edges = [(c, p) for c, p in edges if c in ids and p in ids]
    return concepts, edges


# ---------------------------------------------------------- text corpus ----

def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """A1: a directory of .txt files -> the interleaved documents shape
    (one text span per file; file name = doc_id). ``wholeTextFiles``-style
    via the `text` source with file grouping — each file is one document
    (NobleCoderTool.java:1569-1625 analog, distributed)."""
    raw = (spark.read.format("text")
           .option("wholetext", "true")
           .load(f"{path}/*.txt")
           .select(F.element_at(F.split(F.input_file_name(), "/"), -1)
                   .alias("doc_id"),
                   F.col("value").alias("text")))
    span = F.array(F.struct(
        F.lit("text").alias("kind"), F.col("text").alias("text"),
        F.lit("").alias("media_ref"), F.lit(0).cast("int").alias("offset")))
    return raw.select("doc_id", span.alias("spans"))


# ----------------------------------------------- OWL: ConText lexicon ----
# The reference bootstraps its modifier terminology from Modifier.owl
# (ConText.java:139-153 via OOntology + ConTextHelper.createConcept:80-152):
# named superclasses become BROADER relations, semantic types come from
# schema-ontology ancestors (isSemanticType:40-50), anonymous restriction
# bodies carry the control properties (hasActionEn/windowSize datatype
# hasValue; hasTermination/hasPseudo/has<Type> someValuesFrom classes), and
# the document owl:imports the schema ontology. These two functions
# serialize/parse exactly that shape with an INJECTED import resolver (no
# network), so a restriction-bearing Modifier.owl round-trips onto the
# in-repo lexicon with zero concept/relation diffs (tests/test_owl_context).

_CTX_NS = "http://example.org/nobletools/Modifier.owl"
_SCHEMA_NS = "http://example.org/nobletools/Schema.owl"


def context_to_owl(concepts: list[dict],
                   isa_edges: list[tuple[str, str]]) -> tuple[str, str]:
    """Serialize lexicon-shaped modifier concepts to (modifier_xml,
    schema_xml) in the reference Modifier.owl layout: the main document
    owl:imports the schema; semantic types are schema-namespace
    superclasses; control properties are anonymous restrictions."""
    from ..context.lexicon import MODIFIER_TYPES

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    edges_by_child: dict[str, list[str]] = {}
    for c, p in isa_edges:
        edges_by_child.setdefault(c, []).append(p)

    semtype_names = sorted({st for c in concepts
                            for st in c.get("sem_types", ())})
    schema = ['<?xml version="1.0"?>',
              '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
              '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
              '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
              f'  <owl:Ontology rdf:about="{_SCHEMA_NS}"/>']
    for st in semtype_names:
        schema.append(f'  <owl:Class rdf:about="{_SCHEMA_NS}#{st}"/>')
    schema.append('</rdf:RDF>')

    out = ['<?xml version="1.0"?>',
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
           '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
           '         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#"',
           '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
           f'  <owl:Ontology rdf:about="{_CTX_NS}">',
           f'    <owl:imports rdf:resource="{_SCHEMA_NS}"/>',
           '  </owl:Ontology>']
    for c in concepts:
        cui = c["cui"]
        out.append(f'  <owl:Class rdf:about="{_CTX_NS}#{cui}">')
        out.append(f'    <rdfs:label>{esc(c["name"])}</rdfs:label>')
        for syn in c.get("synonyms", ()):
            out.append('    <oboInOwl:hasExactSynonym>'
                       f'{esc(syn)}</oboInOwl:hasExactSynonym>')
        # semantic types: schema-namespace named superclasses, except the
        # per-type value semtype which rides on the value restriction
        props = dict(c.get("props", {}))
        value_types = [t for t in c.get("sem_types", ())
                       if t in MODIFIER_TYPES and t in props]
        for st in c.get("sem_types", ()):
            if st in value_types:
                continue
            out.append('    <rdfs:subClassOf '
                       f'rdf:resource="{_SCHEMA_NS}#{st}"/>')
        for parent in edges_by_child.get(cui, ()):
            out.append('    <rdfs:subClassOf '
                       f'rdf:resource="{_CTX_NS}#{parent}"/>')
        for k, v in (c.get("props") or {}).items():
            if k in MODIFIER_TYPES or k in ("hasTermination", "hasPseudo"):
                prop = f"has{k}" if k in MODIFIER_TYPES else k
                out.append(
                    '    <rdfs:subClassOf><owl:Restriction>'
                    f'<owl:onProperty rdf:resource="{_CTX_NS}#{prop}"/>'
                    f'<owl:someValuesFrom rdf:resource="{_CTX_NS}#{esc(v)}"/>'
                    '</owl:Restriction></rdfs:subClassOf>')
            else:
                out.append(
                    '    <rdfs:subClassOf><owl:Restriction>'
                    f'<owl:onProperty rdf:resource="{_CTX_NS}#{k}"/>'
                    f'<owl:hasValue>{esc(v)}</owl:hasValue>'
                    '</owl:Restriction></rdfs:subClassOf>')
        out.append('  </owl:Class>')
    out.append('</rdf:RDF>')
    return "\n".join(out), "\n".join(schema)


def load_owl_context(xml_text: str, imports: dict[str, str],
                     source: str = "CONTEXT",
                     ) -> tuple[list[dict], list[tuple[str, str]]]:
    """Parse a Modifier.owl-shaped document (with owl:imports resolved
    through the injected ``imports`` map) back into lexicon-shaped
    concepts + isa edges. Robustness features beyond ``load_owl``:
    owl:imports resolution, anonymous restriction bodies (datatype
    hasValue -> property; someValuesFrom class -> hasTermination/
    hasPseudo property or per-type modifier value + semantic type), and
    references to undeclared superclasses (kept as isa edges, exactly
    how the lexicon's LinguisticModifierRoot container behaves)."""
    import xml.etree.ElementTree as ET
    from ..context.lexicon import MODIFIER_TYPES

    root = ET.fromstring(xml_text)

    # resolve the import closure: declared class names per imported doc
    # form the semantic-type universe (isSemanticType's namespace test)
    semtypes: set[str] = set()
    seen_uris: set[str] = set()
    stack = [root]
    while stack:
        doc = stack.pop()
        for ont in doc.iter(_OWL + "Ontology"):
            for imp in ont.findall(_OWL + "imports"):
                uri = imp.get(_RDF + "resource")
                if uri and uri not in seen_uris:
                    seen_uris.add(uri)
                    if uri not in imports:
                        raise ValueError(f"unresolved owl:imports {uri}")
                    sub = ET.fromstring(imports[uri])
                    stack.append(sub)
                    for cls in sub.iter(_OWL + "Class"):
                        about = cls.get(_RDF + "about")
                        if about:
                            semtypes.add(_frag(about))

    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    for cls in root.iter(_OWL + "Class"):
        about = cls.get(_RDF + "about") or cls.get(_RDF + "ID")
        if not about:
            continue
        cui = _frag(about)
        name = cui
        synonyms: list[str] = []
        sem: list[str] = []
        value_sem: list[str] = []
        props: dict[str, str] = {}
        for child in cls:
            if child.tag == _RDFS + "label" and child.text:
                name = child.text.strip()
            elif child.tag == _OBO + "hasExactSynonym" and child.text:
                synonyms.append(child.text.strip())
            elif child.tag == _RDFS + "subClassOf":
                res = child.get(_RDF + "resource")
                if res:
                    frag = _frag(res)
                    if frag in semtypes:
                        sem.append(frag)       # schema ancestor = semtype
                    else:
                        edges.append((cui, frag))  # may be undeclared
                    continue
                for r in child.iter(_OWL + "Restriction"):
                    onp = r.find(_OWL + "onProperty")
                    prop = _frag(onp.get(_RDF + "resource", "")) \
                        if onp is not None else ""
                    some = r.find(_OWL + "someValuesFrom")
                    has = r.find(_OWL + "hasValue")
                    if some is not None:
                        target = _frag(some.get(_RDF + "resource", ""))
                        if (prop.startswith("has")
                                and prop[3:] in MODIFIER_TYPES):
                            props[prop[3:]] = target
                            value_sem.append(prop[3:])
                        else:
                            props[prop] = target
                    elif has is not None and has.text is not None:
                        props[prop] = has.text.strip()
        concepts.append(dict(cui=cui, name=name, synonyms=synonyms,
                             sem_types=[*sem, *value_sem],
                             sources=[source], props=props))
    return concepts, edges
