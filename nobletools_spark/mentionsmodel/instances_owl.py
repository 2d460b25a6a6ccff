"""OWL/RDF-XML *instance* export — the NobleMentions output artifact.

The reference persists each processed document as a ``Composition``
individual plus one individual per accepted annotation variable inside
the domain ontology (``mentions/model/Composition.java:54-115`` —
``hasTitle``, ``hasMentionAnnotation``; ``AnnotationVariable.java:62-113``
— ``hasAnchor``, ``hasSpan``, modifier object properties;
``Instance.java:249-255`` — the "start:end" span literal). The repo
already materializes the same information as rows / long-format TSV /
N-Triples; this module closes the gap for downstream OWL tooling
(Protégé, the reference's own eval converters) by serializing the
``compose()`` instances table in that vocabulary and reading it back.

Distributed shape: one document per ``Composition`` individual, emitted
per doc_id group via ``applyInPandas`` (Arrow batches, no driver
collect) — at 100 TB each task writes its own documents, exactly like
the sharded HTML report export (``pipeline/export.py:202``).
"""

from __future__ import annotations

import re
from xml.etree import ElementTree
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
DEFAULT_BASE = "http://example.org/nobletools/Generated.owl"

_NCNAME_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")


def _frag(name: str) -> str:
    """Deterministic XML-NCName for an arbitrary identifier. The
    reference names individuals ``Class-N`` off a counter
    (``DomainOntology.createInstanceName:1296``); a counter is
    driver-side state, so fragments here are derived from the row
    instead — sanitized, with a short md5 tag whenever sanitization had
    to change anything (collision guard). Round-trip fidelity never
    depends on the name: the reader reconstructs identity from the
    individual's properties."""
    if _NCNAME_OK.match(name):
        return name
    import hashlib
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", name)
    if not re.match(r"^[A-Za-z_]", safe):
        safe = "i_" + safe
    return f"{safe}.{hashlib.md5(name.encode()).hexdigest()[:6]}"


def _doc_owl(doc_id: str, rows: list[dict], base: str) -> str:
    by_instance_id = {r["instance_id"]: _frag(r["instance_id"])
                      for r in rows}
    lines = [
        '<?xml version="1.0"?>',
        f'<rdf:RDF xmlns:rdf={quoteattr(RDF_NS)}',
        f'         xmlns:owl={quoteattr(OWL_NS)}',
        f'         xmlns={quoteattr(base + "#")}',
        f'         xml:base={quoteattr(base)}>',
        f'  <owl:Ontology rdf:about={quoteattr(base)}/>',
        f'  <owl:NamedIndividual rdf:about={quoteattr("#doc_" + _frag(doc_id))}>',
        '    <rdf:type rdf:resource="#Composition"/>',
        f'    <hasTitle>{escape(doc_id)}</hasTitle>',
    ]
    for r in rows:
        lines.append('    <hasMentionAnnotation rdf:resource='
                     f'{quoteattr("#" + by_instance_id[r["instance_id"]])}/>')
    lines.append('  </owl:NamedIndividual>')
    for r in rows:
        lines += [
            '  <owl:NamedIndividual rdf:about='
            f'{quoteattr("#" + by_instance_id[r["instance_id"]])}>',
            f'    <rdf:type rdf:resource={quoteattr("#" + r["var_name"])}/>',
            f'    <hasAnchor rdf:resource={quoteattr("#" + r["cui"])}/>',
            f'    <hasSpan>{r["start"]}:{r["end"]}</hasSpan>',
        ]
        for prop in sorted(r["modifiers"] or {}):
            value = r["modifiers"][prop]
            if value in by_instance_id:
                # relation slot: points at a sibling individual; the
                # reader resolves it back to the target's instance_id
                ref = "#" + by_instance_id[value]
                lines.append(
                    f'    <{prop} rdf:resource={quoteattr(ref)}/>')
            elif _NCNAME_OK.match(value):
                # modifier individual in the Modifier.owl vocabulary
                lines.append(
                    f'    <{prop} rdf:resource={quoteattr("#" + value)}/>')
            else:
                lines.append(f'    <{prop}>{escape(value)}</{prop}>')
        lines.append('  </owl:NamedIndividual>')
    lines.append('</rdf:RDF>')
    return "\n".join(lines)


def compositions_to_owl(instances: DataFrame,
                        base: str = DEFAULT_BASE) -> DataFrame:
    """instances (instance_id, doc_id, var_name, cui, start, end,
    modifiers) -> (doc_id, owl): one RDF/XML instance document per
    source document, reference Composition vocabulary."""
    def gen(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = str(key[0])
        rows = [
            {"instance_id": r.instance_id, "var_name": r.var_name,
             "cui": r.cui, "start": int(r.start), "end": int(r.end),
             "modifiers": dict(r.modifiers) if r.modifiers is not None
             else {}}
            for r in pdf.sort_values(
                ["start", "end", "var_name"]).itertuples()
        ]
        return pd.DataFrame({"doc_id": [doc_id],
                             "owl": [_doc_owl(doc_id, rows, base)]})

    return (instances
            .withColumn("doc_id", F.col("doc_id").cast("string"))
            .groupBy("doc_id")
            .applyInPandas(gen, schema="doc_id string, owl string"))


def parse_composition_owl(xml_text: str) -> list[dict]:
    """Reload one exported document: -> rows of (instance_id, doc_id,
    var_name, cui, start, end, modifiers) — the exact ``compose()``
    instances shape, identity reconstructed from properties (never from
    individual names)."""
    root = ElementTree.fromstring(xml_text)
    base_ns = None
    for el in root.iter():
        tag = el.tag
        if tag.startswith("{") and RDF_NS not in tag and OWL_NS not in tag:
            base_ns = tag[1:tag.index("}")]
            break
    if base_ns is None:
        return []

    def local(tag: str) -> str:
        return tag.split("}", 1)[1] if tag.startswith("{") else tag

    def resource(el) -> str:
        ref = el.get(f"{{{RDF_NS}}}resource") or ""
        return ref.lstrip("#")

    individuals = {}
    doc_id = None
    var_nodes = []
    for node in root:
        if local(node.tag) != "NamedIndividual":
            continue
        about = (node.get(f"{{{RDF_NS}}}about") or "").lstrip("#")
        typ = next((resource(c) for c in node
                    if local(c.tag) == "type"), None)
        if typ == "Composition":
            doc_id = next((c.text for c in node
                           if local(c.tag) == "hasTitle"), None)
        else:
            var_nodes.append((about, typ, node))
    rows_by_frag = {}
    for about, typ, node in var_nodes:
        span = next((c.text for c in node if local(c.tag) == "hasSpan"),
                    "0:0")
        start, end = (int(x) for x in span.split(":"))
        cui = next((resource(c) for c in node
                    if local(c.tag) == "hasAnchor"), "")
        rows_by_frag[about] = {
            "doc_id": doc_id, "var_name": typ, "cui": cui,
            "start": start, "end": end,
            "instance_id": f"{doc_id}#{typ}#{start}#{end}",
            "_node": node,
        }
    out = []
    for row in rows_by_frag.values():
        node = row.pop("_node")
        mods = {}
        for c in node:
            name = local(c.tag)
            if name in ("type", "hasAnchor", "hasSpan"):
                continue
            ref = resource(c)
            if ref and ref in rows_by_frag:
                mods[name] = rows_by_frag[ref]["instance_id"]
            elif ref:
                mods[name] = ref
            else:
                mods[name] = c.text or ""
        row["modifiers"] = mods
        out.append(row)
    return sorted(out, key=lambda r: r["instance_id"])
