"""REST serve surface (TerminologyServlet.java:98-190 verb parity):
each servlet action maps to the documented response shape, exercised
through the WSGI interface with an injected client (no socket), the same
style as test_remote's injected transport."""

import json

from nobletools_spark.serve import TerminologyServer
from nobletools_spark.terminology.fixture import fixture_dictionary


def wsgi_get(app, query: str):
    """Injected WSGI client: call the app with a synthetic environ."""
    out = {}

    def start_response(status, headers):
        out["status"] = status
        out["headers"] = dict(headers)

    body = b"".join(app({"QUERY_STRING": query,
                         "REQUEST_METHOD": "GET"}, start_response))
    return out["status"], json.loads(body)


def make_server():
    return TerminologyServer({"fixture": fixture_dictionary()},
                             default="fixture")


class TestServletVerbParity:
    def test_missing_action_is_error(self):
        status, body = wsgi_get(make_server(), "")
        assert status.startswith("400")
        assert body["error"] == "Unrecognized parameter"

    def test_get_terminologies(self):
        _, body = wsgi_get(make_server(), "action=get_terminologies")
        assert body == {"terminologies": ["fixture"]}

    def test_search_returns_scored_concepts(self):
        _, body = wsgi_get(make_server(),
                           "action=search&text=malignant+melanoma")
        cuis = [c["cui"] for c in body["concepts"]]
        assert "C0025202" in cuis
        top = body["concepts"][0]
        assert {"cui", "name", "synonyms", "sem_types", "sources",
                "score", "matched_terms", "annotations"} <= set(top)

    def test_search_cui_text_dispatches_to_lookup(self):
        # servlet: text matching CL?\d+ is a lookupConcept call (:117-118)
        _, body = wsgi_get(make_server(), "action=search&text=C0025202")
        assert [c["cui"] for c in body["concepts"]] == ["C0025202"]

    def test_search_root_text_returns_roots(self):
        _, body = wsgi_get(make_server(), "action=search&text=ROOT")
        roots = {c["cui"] for c in body["concepts"]}
        _, via_verb = wsgi_get(make_server(), "action=get_roots")
        assert roots == {c["cui"] for c in via_verb["concepts"]}
        assert roots  # fixture terminology has a hierarchy

    def test_lookup_concept_by_cui_and_code(self):
        srv = make_server()
        _, body = wsgi_get(srv, "action=lookup_concept&code=C0025202")
        assert body["concept"]["name"]
        status, missing = wsgi_get(srv, "action=lookup_concept&code=NOPE")
        assert status.startswith("404") and missing["concept"] is None

    def test_get_sources(self):
        _, body = wsgi_get(make_server(), "action=get_sources")
        assert body["sources"]

    def test_related_concepts_default_broader(self):
        srv = make_server()
        d = fixture_dictionary()
        child = next(c for c, p in d.isa_edges)
        _, body = wsgi_get(srv,
                           f"action=get_related_concepts&code={child}")
        got = {c["cui"] for c in body["concepts"]}
        assert got == set(d.parents_of(child))
        # relation name-contains dispatch (:146-155)
        _, narrower = wsgi_get(
            srv, f"action=get_related_concepts&code={child}"
                 "&relation=narrow")
        assert {c["cui"] for c in narrower["concepts"]} == {
            c for c, p in d.isa_edges if p == child}

    def test_related_concept_map_shape(self):
        d = fixture_dictionary()
        child = next(c for c, p in d.isa_edges)
        _, body = wsgi_get(make_server(),
                           f"action=get_related_concept_map&code={child}")
        assert set(body["relations"]) == {"BROADER", "NARROWER"}

    def test_set_sources_filters_search(self):
        srv = make_server()
        _, r = wsgi_get(srv, "action=set_sources&src=NOSUCH")
        assert r["sources_filter"] == ["NOSUCH"]
        _, body = wsgi_get(srv, "action=search&text=melanoma")
        assert body["concepts"] == []  # all concepts filtered out
        wsgi_get(srv, "action=set_sources")  # clear
        _, body = wsgi_get(srv, "action=search&text=melanoma")
        assert body["concepts"]

    def test_code_runs_select_best_coder(self):
        _, body = wsgi_get(
            make_server(),
            "action=code&text=malignant+melanoma+on+the+deep+margin")
        doc = body["document"]
        cuis = {m["cui"] for m in doc["mentions"]}
        assert "C0025202" in cuis
        for m in doc["mentions"]:
            assert {"cui", "concept_name", "matched_term", "score",
                    "start", "end"} <= set(m)
