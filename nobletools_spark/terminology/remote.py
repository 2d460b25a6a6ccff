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
        return walk_subtree(self.lookup_concept,
                            lambda code: self.related_concepts(code,
                                                               "NARROWER"),
                            root_code, max_concepts)


def concept_record(c: ConceptMeta, terms_from_synonyms: bool = False) -> dict:
    """ConceptMeta -> the record shape ``build_dictionary`` /
    ``build_terminology`` consume. With ``terms_from_synonyms`` every
    synonym becomes a term row (form from ``c.terms`` when present,
    else SY), matching how the RRF loader expands atoms."""
    if terms_from_synonyms and c.terms:
        terms = [tuple(t) for t in c.terms]
    elif terms_from_synonyms:
        terms = [(s, "PT" if s == c.name else "SY") for s in c.synonyms]
    else:
        terms = [(c.name, "PT")]
    return dict(cui=c.cui, name=c.name, synonyms=list(c.synonyms),
                sem_types=list(c.sem_types), sources=list(c.sources),
                terms=terms, definitions=list(c.definitions),
                codes=dict(c.codes) if c.codes else {})


def walk_subtree(lookup: Callable[[str], "ConceptMeta | None"],
                 narrower: Callable[[str], list[str]],
                 root_code: str, max_concepts: int = 10_000,
                 terms_from_synonyms: bool = False,
                 ) -> tuple[list[dict], list[tuple[str, str]]]:
    """BFS over NARROWER edges from ``root_code``: concept records +
    (child, parent) isa edges restricted to the imported id set. Shared
    by every remote client that can enumerate children (BioPortal
    SubClass relations, UMLS MRREL rows); bounded by ``max_concepts`` so
    a cyclic or huge remote hierarchy cannot run away."""
    concepts: list[dict] = []
    edges: list[tuple[str, str]] = []
    seen: set[str] = set()
    frontier = [root_code]
    while frontier and len(seen) < max_concepts:
        code = frontier.pop(0)
        if code in seen:
            continue
        seen.add(code)
        c = lookup(code)
        if c is None:
            continue
        concepts.append(concept_record(c, terms_from_synonyms))
        for child in narrower(code):
            edges.append((child, code))
            frontier.append(child)
    ids = {c["cui"] for c in concepts}
    return concepts, [(a, b) for a, b in edges if a in ids and b in ids]


# --------------------------------------------------------------------------
# LexEVS REST client (terminology/impl/LexEVSRestTerminology.java) — the
# caGrid GetXML surface: queries return nested <class name="org.LexGrid...">
# elements whose <field> children fold into maps, then into concepts.
# Same injectable-transport design as RemoteTerminology above.
# --------------------------------------------------------------------------

class LexEVSTerminology:
    """LexEVSRestTerminology.java analog over an injectable transport.

    URL shapes, the ``server#scheme`` split with the "NCI MetaThesaurus"
    default (:48-62), the class/field map folding (processElement
    :245-270), and the Concept assembly from presentation/definition/
    property lists (convertConcept :67-215) all mirror the reference.
    """

    DEFAULT_SCHEME = "NCI MetaThesaurus"

    def __init__(self, server: str, fetch: Callable[[str], str]):
        self.location, _, scheme = server.partition("#")
        self.scheme = scheme or self.DEFAULT_SCHEME
        self.fetch = fetch

    @staticmethod
    def _filter(s: str) -> str:
        # LexEVSRestTerminology.filter:409-411 — spaces only
        return s.replace(" ", "%20")

    def _lookup_url(self, cui: str) -> str:
        return (f"{self.location}/GetXML?query=org.LexGrid.concepts.Concept&"
                f"org.LexGrid.concepts.Concept[@_entityCode="
                f"{self._filter(cui)}]&codingSchemeName="
                f"{self._filter(self.scheme)}")

    def _search_url(self, text: str) -> str:
        return (f"{self.location}/GetXML?query=Concept,Presentation,Text&"
                f"Text[@_content={self._filter(text)}]&codingSchemeName="
                f"{self._filter(self.scheme)}")

    # -- class/field folding (processElement:245-270) ----------------------

    @classmethod
    def _process_element(cls, element) -> dict:
        content: dict = {"name": element.get("name")}
        for child in element:
            if child.tag != "field":
                continue
            nm = child.get("name")
            classes = child.findall(".//class")
            if classes:
                content[nm] = [cls._process_element(e) for e in classes]
            elif nm not in content:
                content[nm] = (child.text or "").strip()
        return content

    @staticmethod
    def _first_text(m: dict) -> str | None:
        for tm in m.get("_value", []):
            if tm.get("name") == "org.LexGrid.commonTypes.Text":
                return str(tm.get("_content", ""))
        return None

    @staticmethod
    def _first_source(m: dict) -> str | None:
        sl = m.get("_sourceList") or []
        if sl and sl[0].get("name") == "org.LexGrid.commonTypes.Source":
            return sl[0].get("_content") or None
        return None

    def _convert_concept(self, content: dict) -> ConceptMeta | None:
        if content.get("name") != "org.LexGrid.concepts.Concept":
            return None
        cui = str(content.get("_entityCode", ""))
        synonyms: list[str] = []
        terms: list[tuple[str, str]] = []
        sources: list[str] = []
        for m in content.get("_presentationList", []):
            if m.get("name") != "org.LexGrid.concepts.Presentation":
                continue
            text = self._first_text(m)
            if text is None:
                continue
            synonyms.append(text.strip())
            src = self._first_source(m)
            if src and src not in sources:
                sources.append(src)
            form = m.get("_representationalForm") or (
                "PT" if str(m.get("_isPreferred")).lower() == "true"
                else "SY")
            terms.append((text, form))
        definitions = []
        for m in content.get("_definitionList", []):
            if m.get("name") == "org.LexGrid.concepts.Definition":
                text = self._first_text(m)
                if text is not None:
                    definitions.append(text)
        name = cui
        for m in content.get("_entityDescription", []):
            if m.get("name") == "org.LexGrid.commonTypes.EntityDescription":
                name = str(m.get("_content", cui))
        props: dict[str, str] = {}
        for m in content.get("_propertyList", []):
            if m.get("name") == "org.LexGrid.commonTypes.Property":
                value = self._first_text(m)
                prop = m.get("_propertyName")
                if prop and value is not None:
                    props[prop] = value
        sem_types = ((props["Semantic_Type"],)
                     if "Semantic_Type" in props else ())
        return ConceptMeta(cui=cui, name=name, synonyms=tuple(
            dict.fromkeys([name, *synonyms])), sem_types=sem_types,
            sources=tuple(sources) or ("LexEVS",),
            terms=tuple(terms) or ((name, "PT"),),
            definitions=tuple(definitions), codes=(),
            props=tuple(sorted(props.items())))

    def _process_response(self, xml_text: str) -> list[ConceptMeta]:
        root = ET.fromstring(xml_text)
        qr = (root if root.tag == "queryResponse"
              else root.find(".//queryResponse"))
        out: list[ConceptMeta] = []
        if qr is None:
            return out
        for child in qr:
            if child.tag == "class":
                c = self._convert_concept(self._process_element(child))
                if c is not None:
                    out.append(c)
        return out

    def lookup_concept(self, cui: str) -> ConceptMeta | None:
        found = self._process_response(self.fetch(self._lookup_url(cui)))
        return found[0] if found else None

    def search(self, text: str) -> list[ConceptMeta]:
        return self._process_response(self.fetch(self._search_url(text)))

    def import_search(self, queries: "list[str]",
                      ) -> tuple[list[dict], list[tuple[str, str]]]:
        """Search-driven import: fold every concept any query returns
        into local build records. The reference LexEVS client exposes no
        hierarchy (``LexEVSRestTerminology.getRelatedConcepts:287-299``
        returns null), so unlike the BioPortal/UMLS subtree walks this
        flow has no isa edges — the caGrid GetXML surface is flat."""
        concepts: list[dict] = []
        seen: set[str] = set()
        for q in queries:
            for c in self.search(q):
                if c.cui not in seen:
                    seen.add(c.cui)
                    concepts.append(concept_record(
                        c, terms_from_synonyms=True))
        return concepts, []


# --------------------------------------------------------------------------
# UMLS RRF-over-SQL client (terminology/impl/UMLSTerminology.java) — the
# mrconso/mrdef/mrsty/mrsab relational surface. The JDBC connection is an
# injectable ``run_query(sql) -> list[dict]`` (tests back it with DuckDB
# executing the same SQL over real RRF-shaped tables, so the generated SQL
# itself is exercised, not just the folding).
# --------------------------------------------------------------------------

SEARCH_EXACT = "exactMatch"
SEARCH_STARTS_WITH = "startsWith"
SEARCH_ENDS_WITH = "endsWith"
SEARCH_CONTAINS = "contains"
SEARCH_BEST = "bestMatch"
SEARCH_NGRAM = "ngramMatch"


class UMLSTerminology:
    """UMLSTerminology.java analog over an injectable query runner.

    lookupConcept (:192-295) folds mrconso rows into terms/synonyms/
    sources/codes with ispref='y' preferring the name, then mrdef into
    definitions and mrsty into semantic types. search (:344-440) mirrors
    the mode dispatch — including the reference's substring-match quirk
    (``SEARCH_BEST.contains(method)``, so method='best' or even 'Match'
    selects best-match), the 3-char case-insensitive prefix speedup of
    the exact condition, the LIKE shapes, the source (sab) filter, and
    the largest-first non-overlapping n-gram sweep (:319-377 with
    TextTools.getNGrams:399-417 semantics)."""

    def __init__(self, run_query: Callable[[str], list[dict]],
                 lang: str | None = "ENG"):
        self.run_query = run_query
        self.lang = lang
        self.filter_sources: tuple[str, ...] = ()

    def set_source_filter(self, sources) -> None:
        self.filter_sources = tuple(sources)

    def get_sources(self) -> list[dict]:
        return self.run_query("SELECT * FROM mrsab")

    def related_concepts(self, cui: str, relation: str) -> list[str]:
        """NARROWER/BROADER via MRREL. Public RRF semantics: REL names
        the relationship CUI2 has to CUI1, so children of X are
        ``cui2 WHERE cui1 = X AND rel = 'CHD'`` and parents are the
        ``rel = 'PAR'`` rows. The source filter applies to the asserting
        vocabulary (sab), same as lookup/search."""
        rel = "CHD" if relation == "NARROWER" else "PAR"
        filt = ""
        if self.filter_sources:
            quoted = ", ".join(f"'{s}'" for s in self.filter_sources)
            filt = f" AND sab IN ({quoted})"
        rows = self.run_query(
            "SELECT DISTINCT cui2 FROM mrrel "
            f"WHERE cui1 = '{cui}' AND rel = '{rel}'{filt}")
        return [r["cui2"] for r in rows if r["cui2"] != cui]

    def import_subtree(self, root_cui: str, max_concepts: int = 10_000
                       ) -> tuple[list[dict], list[tuple[str, str]]]:
        """Walk MRREL child edges from ``root_cui`` and materialize RRF
        atoms as local build records + isa edges — the same
        import-then-code-locally flow as the BioPortal client, over the
        relational surface. Every MRCONSO atom becomes a term row
        (terms_from_synonyms), matching the RRF file loader."""
        return walk_subtree(self.lookup_concept,
                            lambda c: self.related_concepts(c, "NARROWER"),
                            root_cui, max_concepts,
                            terms_from_synonyms=True)

    def lookup_concept(self, cui: str) -> ConceptMeta | None:
        cond = f"cui = '{cui}'" + (
            f" AND lat = '{self.lang}'" if self.lang else "")
        rows = self.run_query(f"SELECT * FROM mrconso WHERE {cond}")
        if not rows:
            return None
        synonyms: list[str] = []
        terms: list[tuple[str, str]] = []
        sources: list[str] = []
        codes: list[tuple[str, str]] = []
        preferred: str | None = None
        for r in rows:
            text, form = r["str"], r["tty"]
            if text not in synonyms:
                synonyms.append(text)
            if r["sab"] not in sources:
                sources.append(r["sab"])
            terms.append((text, form))
            codes.append((r["sab"], r["code"]))   # ConceptMeta (source, code)
            if preferred is None and str(r["ispref"]).lower() == "y":
                preferred = text
        name = preferred if preferred is not None else rows[0]["str"]
        defs = [r["def"] for r in self.run_query(
            f"SELECT * FROM mrdef WHERE cui = '{cui}'")]
        stys = [r["sty"] for r in self.run_query(
            f"SELECT * FROM mrsty WHERE cui = '{cui}'")]
        return ConceptMeta(
            cui=cui, name=name, synonyms=tuple(synonyms),
            sem_types=tuple(dict.fromkeys(stys)), sources=tuple(sources),
            terms=tuple(terms), definitions=tuple(defs),
            codes=tuple(dict.fromkeys(codes)))

    # -- search (:344-440) --------------------------------------------------

    @staticmethod
    def _ngrams(text: str, n: int) -> list[str]:
        """TextTools.getNGrams:399-417 — all word n-grams, LARGEST first."""
        from ..text.tools import get_words
        words = get_words(text)
        out: list[str] = []
        for e in range(n, 0, -1):
            for s in range(0, len(words) - e + 1):
                out.append(" ".join(words[s:s + e]))
        return out

    @staticmethod
    def _is_used(text: str, used: list[str], ng: str) -> bool:
        """Overlap test on character spans (:319-335)."""
        st = text.find(ng)
        en = st + len(ng)
        for s_str in used:
            s = text.find(s_str)
            e = s + len(s_str)
            if not (st > e or en < s):
                return True
        return False

    def search(self, text: str, method: str = SEARCH_NGRAM) -> list[dict]:
        """-> [{cui, str}] distinct hits. Mode dispatch mirrors the
        reference verbatim, including its `in`-not-`==` method matching."""
        if method in SEARCH_BEST:          # reference quirk: substring
            return (self.search(text, SEARCH_EXACT)
                    or self.search(text, SEARCH_CONTAINS))
        if method in SEARCH_NGRAM:
            from ..text.tools import get_words
            stext = " ".join(get_words(text))
            used: list[str] = []
            out: list[dict] = []
            for ng in self._ngrams(text, 4):
                if self._is_used(stext, used, ng):
                    continue
                hits = self.search(ng, SEARCH_EXACT)
                if hits:
                    out.extend(hits)
                    used.append(ng)
            return out
        if method == SEARCH_CONTAINS:
            condition = f" str LIKE '%{text}%'"
        elif method == SEARCH_STARTS_WITH:
            condition = f" str LIKE '{text}%'"
        elif method == SEARCH_ENDS_WITH:
            condition = f" str LIKE '%{text}'"
        elif len(text) > 3:
            # exact, case-insensitive, with the 3-char prefix speedup
            a, b = text[0], text[1:4]
            condition = (
                "((str LIKE '" + a.upper() + b.lower() + "%' OR "
                "str LIKE '" + (a + b).lower() + "%' OR "
                "str LIKE '" + (a + b).upper() + "%')"
                " AND UPPER(str) = '" + text.upper() + "')")
        else:
            condition = f" str = '{text}'"
        filt = ""
        if self.filter_sources:
            quoted = ", ".join(f"'{s}'" for s in self.filter_sources)
            filt = f" AND sab IN ({quoted})"
        rows = self.run_query(
            f"SELECT DISTINCT cui, str FROM mrconso WHERE {condition}{filt}")
        out, seen = [], set()
        for r in rows:
            if r["cui"] not in seen:
                seen.add(r["cui"])
                out.append({"cui": r["cui"], "str": r["str"]})
        return out
