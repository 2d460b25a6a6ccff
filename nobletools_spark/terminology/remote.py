"""A6: remote terminology client — BioPortal-shaped REST semantics with an
injectable transport.

Behavior-matched to ``terminology/impl/BioPortalTerminology.java``:
- ``search``: GET {base}/search/{query}/&isexactmatch=..&maxnumhits=..,
  parse ``searchResultList``/``searchBean`` elements (searchAll:242-305 —
  the reference keeps ``conceptIdShort`` + ``ontologyDisplayLabel`` and
  discards the rest)
- ``lookup_concept``: GET {base}/concepts/{ontology}/{code}, parse the
  ``classBean`` (id/label/synonyms, BioPortalHelper relationship-name
  folding :150-165 — synonym/synonyms/bp_synonym etc. all mean label)
- ``related_concepts``: classBean relations ``SubClass``/``SuperClass``
  (BioPortalHelper.java:83-84) -> NARROWER/BROADER
- ``import_subtree``: walk SubClass from a root and materialize the
  remote vocabulary as local concept records — the reference's actual
  usage pattern (remote terminologies are imported, then coding runs
  against the local NobleCoder tables)

The sandbox has no network, so the HTTP layer is an injectable
``fetch(url) -> str`` callable; production would pass
``urllib.request.urlopen(...).read().decode()``; tests pass a
recorded-fixture transport serving the same XML shapes. Everything past
``fetch`` — URL construction, XML parsing, concept folding — is the real
client and is what the tests pin.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

from .storage import ConceptMeta

EXACT_MATCH = "exact_match"
CONTAINS_MATCH = "contains_match"
MAX_SEARCH_HITS = 75

_SYNONYM_KEYS = {"synonym", "synonym_of", "synonym_name", "synonyms",
                 "related synonym", "bp_synonym", "label", "labels",
                 "rdfs:label"}
_DEF_KEYS = {"definition", "alt_definition", "comment"}


class RemoteTerminology:
    """BioPortalTerminology.java analog over an injectable transport."""

    def __init__(self, base_url: str, fetch: Callable[[str], str],
                 ontology: str = "", api_key: str = ""):
        self.base_url = base_url.rstrip("/")
        self.fetch = fetch
        self.ontology = ontology
        self.api_key = api_key

    # -- URL construction (searchAll:254-267) -------------------------------

    def _search_url(self, text: str, method: str) -> str:
        url = (f"{self.base_url}/search/{text}/"
               f"&isexactmatch={1 if method == EXACT_MATCH else 0}"
               f"&maxnumhits={MAX_SEARCH_HITS}")
        if self.api_key:
            url += f"&apikey={self.api_key}"
        return url

    def _concept_url(self, code: str) -> str:
        return f"{self.base_url}/concepts/{self.ontology}/{code}"

    # -- API ----------------------------------------------------------------

    def search(self, text: str,
               method: str = CONTAINS_MATCH) -> list[dict]:
        """-> [{code, name, ontology}] per searchBean (searchAll:271-301
        keeps conceptIdShort + ontologyDisplayLabel + preferredName)."""
        root = ET.fromstring(self.fetch(self._search_url(text, method)))
        out = []
        results = root.find(".//searchResultList")
        if results is None:
            return out
        for bean in results.findall(".//searchBean"):
            code = bean.findtext("conceptIdShort")
            onto = bean.findtext("ontologyDisplayLabel")
            if code is None or onto is None:
                continue
            out.append({"code": code.strip(),
                        "name": (bean.findtext("preferredName")
                                 or code).strip(),
                        "ontology": onto.strip()})
        return out

    def lookup_concept(self, code: str) -> ConceptMeta | None:
        """classBean -> ConceptMeta (BioPortalHelper relationship-name
        folding: every synonym-ish relation contributes a synonym, every
        definition-ish relation a definition)."""
        root = ET.fromstring(self.fetch(self._concept_url(code)))
        bean = root if root.tag == "classBean" else root.find(".//classBean")
        if bean is None:
            return None
        cid = (bean.findtext("id") or code).strip()
        label = (bean.findtext("label") or cid).strip()
        synonyms, definitions = [label], []
        for rel in bean.findall("relations/entry"):
            key = (rel.findtext("string") or "").strip().lower()
            vals = [el.text.strip() for el in rel.findall(".//string")[1:]
                    if el.text and el.text.strip()]
            if key in _SYNONYM_KEYS:
                synonyms += vals
            elif key in _DEF_KEYS:
                definitions += vals
        seen: list[str] = []
        for s in synonyms:
            if s not in seen:
                seen.append(s)
        return ConceptMeta(cui=cid, name=label, synonyms=tuple(seen),
                           sem_types=(), sources=(self.ontology or "REMOTE",),
                           terms=((label, "PT"),),
                           definitions=tuple(definitions), codes=())

    def related_concepts(self, code: str, relation: str) -> list[str]:
        """relation in {'NARROWER', 'BROADER'} -> codes via the classBean
        SubClass/SuperClass relation entries."""
        tag = "SubClass" if relation == "NARROWER" else "SuperClass"
        root = ET.fromstring(self.fetch(self._concept_url(code)))
        out = []
        for rel in root.findall(".//relations/entry"):
            key = (rel.findtext("string") or "").strip()
            if key != tag:
                continue
            out += [el.findtext("id").strip()
                    for el in rel.findall(".//classBean")
                    if el.findtext("id")]
        return out

    def import_subtree(self, root_code: str, max_concepts: int = 10_000
                       ) -> tuple[list[dict], list[tuple[str, str]]]:
        """Walk SubClass edges from ``root_code`` and materialize concept
        records + BROADER isa edges in the shape ``build_dictionary`` /
        ``build_terminology`` consume — the import-then-code-locally flow
        the reference uses for remote vocabularies."""
        concepts: list[dict] = []
        edges: list[tuple[str, str]] = []
        seen: set[str] = set()
        frontier = [root_code]
        while frontier and len(seen) < max_concepts:
            code = frontier.pop(0)
            if code in seen:
                continue
            seen.add(code)
            c = self.lookup_concept(code)
            if c is None:
                continue
            concepts.append(dict(
                cui=c.cui, name=c.name, synonyms=list(c.synonyms),
                sem_types=[], sources=list(c.sources),
                terms=[(c.name, "PT")],
                definitions=list(c.definitions), codes={}))
            for child in self.related_concepts(code, "NARROWER"):
                edges.append((child, code))
                frontier.append(child)
        ids = {c["cui"] for c in concepts}
        return concepts, [(a, b) for a, b in edges
                          if a in ids and b in ids]
