"""A-group closure: REST serve surface over the terminology engine.

Mirrors the reference's ``servlet/TerminologyServlet.java:98-190`` verb
set and dispatch semantics — the servlet's GET ``action`` parameter —
over the in-process ``Dictionary`` + matcher, as a dependency-free WSGI
app (stdlib only). Responses are JSON (the servlet emits HTML-wrapped
``processOutput`` text; the SHAPE — which verb returns which entity —
is what's mirrored, and the parity test maps verb -> shape):

- ``get_terminologies``       -> names of loaded terminologies (:113)
- ``set_sources``             -> set the source filter (:109-112)
- ``search`` text=...         -> concept search; a ``CL?\\d+``/URI text
                                 dispatches to lookup, ``ROOT`` to the
                                 root list (:115-126)
- ``get_roots``               -> root concepts (:127-128)
- ``lookup_concept`` code=... -> one concept by CUI or alternate code
                                 (:129-132)
- ``get_sources``             -> source list (:133-135)
- ``get_related_concepts`` code=..&relation=.. -> related concepts; the
  relation matches by name-contains with BROADER default (:136-160)
- ``get_related_concept_map`` code=.. -> {relation: [concepts]} (:161-166)
- ``code`` text=...           -> run the coder with select-best forced
                                 on, return the coded document (:170-187)

Serving is driver-side by design: the dictionary is the same broadcast
object the Spark stages use, so a search here answers from exactly the
artifact the cluster matches with; at scale this handler sits behind any
WSGI server with the persisted ``.term`` tables loaded once per process.
"""

from __future__ import annotations

import json
import re
from urllib.parse import parse_qs

from .config import for_search_method
from .matcher.core import process_sentence, search
from .terminology.storage import ConceptMeta, Dictionary

_CUI_RE = re.compile(r"CL?\d+")


def concept_payload(c: ConceptMeta, dico: Dictionary) -> dict:
    return {
        "cui": c.cui,
        "name": c.name,
        "synonyms": list(c.synonyms),
        "sem_types": list(c.sem_types),
        "sources": list(c.sources),
        "definitions": list(c.definitions),
        "codes": {src: code for src, code in c.codes},
        "parents": list(dico.parents_of(c.cui)),
    }


class TerminologyServer:
    """Verb dispatcher over one or more dictionaries (the servlet's
    repository + default.terminology init parameter)."""

    def __init__(self, terminologies: dict[str, Dictionary],
                 default: str | None = None):
        self._terms = dict(terminologies)
        self._default = default or (next(iter(terminologies))
                                    if terminologies else None)
        self._source_filter: dict[str, tuple[str, ...]] = {}

    def _dico(self, name: str | None) -> Dictionary | None:
        if name and name in self._terms:
            return self._terms[name]
        return self._terms.get(self._default)

    def _roots(self, dico: Dictionary) -> list[str]:
        if dico.roots:
            return sorted(dico.roots)
        parents = {p for _, p in dico.isa_edges}
        children = {c for c, _ in dico.isa_edges}
        return sorted(parents - children)

    def _lookup(self, dico: Dictionary, code: str) -> ConceptMeta | None:
        c = dico.concepts.get(code)
        if c is None and code in dico.code_map:
            c = dico.concepts.get(dico.code_map[code])
        return c

    def _related(self, dico: Dictionary, cui: str) -> dict[str, list[str]]:
        broader = list(dico.parents_of(cui))
        narrower = sorted(c for c, p in dico.isa_edges if p == cui)
        return {"BROADER": broader, "NARROWER": narrower}

    def handle(self, params: dict[str, str]) -> tuple[int, dict]:
        """One servlet GET: params['action'] selects the verb. Returns
        (http_status, json_payload)."""
        action = params.get("action")
        if not action:
            return 400, {"error": "Unrecognized parameter"}
        dico = self._dico(params.get("term"))
        if dico is None:
            return 404, {"error": "no terminology loaded"}

        if action == "get_terminologies":
            return 200, {"terminologies": sorted(self._terms)}

        if action == "set_sources":
            src = params.get("src")
            key = params.get("term") or self._default or ""
            if src:
                self._source_filter[key] = tuple(src.split(","))
            else:
                self._source_filter.pop(key, None)
            return 200, {"sources_filter": list(
                self._source_filter.get(key, ()))}

        if action == "search":
            text = params.get("text", "")
            # servlet quirk parity: CUI-shaped or URI text is a lookup,
            # literal ROOT returns the root concepts (:117-124)
            if _CUI_RE.fullmatch(text.strip()) or text.startswith("http://"):
                c = self._lookup(dico, text.strip())
                return 200, {"concepts": [concept_payload(c, dico)]
                             if c else []}
            if text == "ROOT":
                return 200, {"concepts": [
                    concept_payload(dico.concepts[r], dico)
                    for r in self._roots(dico) if r in dico.concepts]}
            key = params.get("term") or self._default or ""
            base = None
            srcs = self._source_filter.get(key)
            if srcs:
                base = for_search_method(None, dico.build_config)
                from dataclasses import replace
                base = replace(base, filter_sources=srcs)
            hits = search(text, dico, "best-match", base)
            return 200, {"concepts": [
                dict(concept_payload(dico.concepts[h["cui"]], dico),
                     score=h["score"],
                     matched_terms=h["matched_terms"],
                     annotations=[{"text": t, "offset": o}
                                  for t, o in h["annotations"]])
                for h in hits if h["cui"] in dico.concepts]}

        if action == "get_roots":
            return 200, {"concepts": [
                concept_payload(dico.concepts[r], dico)
                for r in self._roots(dico) if r in dico.concepts]}

        if action == "lookup_concept":
            c = self._lookup(dico, params.get("code", "").strip())
            if c is None:
                return 404, {"concept": None}
            return 200, {"concept": concept_payload(c, dico)}

        if action == "get_sources":
            srcs = sorted({s for c in dico.concepts.values()
                           for s in c.sources})
            return 200, {"sources": srcs}

        if action == "get_related_concepts":
            c = self._lookup(dico, params.get("code", "").strip())
            if c is None:
                return 200, {"concepts": []}  # servlet returns empty array
            rel = (params.get("relation") or "broader").lower()
            rmap = self._related(dico, c.cui)
            # name-contains match with BROADER default (:146-155)
            chosen = "BROADER"
            for rname in rmap:
                if rel in rname.lower():
                    chosen = rname
                    break
            return 200, {"concepts": [
                concept_payload(dico.concepts[x], dico)
                for x in rmap[chosen] if x in dico.concepts]}

        if action == "get_related_concept_map":
            c = self._lookup(dico, params.get("code", "").strip())
            if c is None:
                return 200, {"relations": {}}
            rmap = self._related(dico, c.cui)
            return 200, {"relations": {
                r: [concept_payload(dico.concepts[x], dico)
                    for x in xs if x in dico.concepts]
                for r, xs in rmap.items()}}

        if action == "code":
            text = params.get("text", "").replace("\r\n", "\n")
            # the servlet forces select-best-candidate on for coding
            # (:173-177) and restores the previous flag after
            cfg = for_search_method("best-match", dico.build_config)
            from dataclasses import replace
            cfg = replace(cfg, select_best_candidate=True)
            mentions = []
            for sent in text.split("\n"):
                if not sent.strip():
                    continue
                for m in process_sentence(sent, dico, cfg):
                    mentions.append({
                        "cui": m.cui, "concept_name": m.concept_name,
                        "matched_term": m.matched_term,
                        "score": m.score, "start": m.start, "end": m.end})
            return 200, {"document": {"text": text, "mentions": mentions}}

        return 400, {"error": f"unknown action {action}"}

    # ------------------------------------------------------ WSGI app ----

    def wsgi_app(self, environ, start_response):
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        params = {k: v[0] for k, v in qs.items()}
        status, payload = self.handle(params)
        body = json.dumps(payload).encode()
        start_response(
            {200: "200 OK", 400: "400 Bad Request",
             404: "404 Not Found"}[status],
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(body)))])
        return [body]

    __call__ = wsgi_app


def serve(server: TerminologyServer, host: str = "127.0.0.1",
          port: int = 8080):  # pragma: no cover - manual entry point
    """Run behind the stdlib WSGI server (production: any WSGI host)."""
    from wsgiref.simple_server import make_server
    httpd = make_server(host, port, server)
    httpd.serve_forever()
