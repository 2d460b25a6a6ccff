"""A6 remote-terminology client tests: BioPortal-shaped XML parsing,
URL construction, subtree import feeding the standard local build — all
over a recorded-fixture transport (the sandbox has no network; the
injectable fetch is the only faked layer)."""

import pytest

from nobletools_spark.terminology.remote import (CONTAINS_MATCH,
                                                 EXACT_MATCH,
                                                 RemoteTerminology)

SEARCH_XML = """<success><data><page><contents>
<searchResultList>
  <searchBean>
    <ontologyDisplayLabel>SNOMEDCT</ontologyDisplayLabel>
    <conceptIdShort>C_mel</conceptIdShort>
    <preferredName>Melanoma</preferredName>
  </searchBean>
  <searchBean>
    <ontologyDisplayLabel>NCIT</ontologyDisplayLabel>
    <conceptIdShort>C_skin</conceptIdShort>
    <preferredName>Skin cancer</preferredName>
  </searchBean>
  <searchBean><bogus>no id</bogus></searchBean>
</searchResultList>
</contents></page></data></success>"""


def class_bean(cid, label, synonyms=(), defs=(), subs=(), supers=()):
    syn = "".join(f"<string>{s}</string>" for s in synonyms)
    d = "".join(f"<string>{s}</string>" for s in defs)
    sub = "".join(f"<classBean><id>{c}</id></classBean>" for c in subs)
    sup = "".join(f"<classBean><id>{c}</id></classBean>" for c in supers)
    return f"""<success><classBean>
  <id>{cid}</id><label>{label}</label>
  <relations>
    <entry><string>synonyms</string><list>{syn}</list></entry>
    <entry><string>definition</string><list>{d}</list></entry>
    <entry><string>SubClass</string><list>{sub}</list></entry>
    <entry><string>SuperClass</string><list>{sup}</list></entry>
  </relations>
</classBean></success>"""


BEANS = {
    "C_root": class_bean("C_root", "Disease", ["disorder"],
                         ["any disease"], subs=("C_mel", "C_skin")),
    "C_mel": class_bean("C_mel", "Melanoma",
                        ["malignant melanoma", "Melanoma"],
                        supers=("C_root",)),
    "C_skin": class_bean("C_skin", "Skin cancer", [],
                         subs=("C_missing",), supers=("C_root",)),
}


@pytest.fixture()
def remote():
    urls = []

    def fetch(url):
        urls.append(url)
        if "/search/" in url:
            return SEARCH_XML
        code = url.rsplit("/", 1)[1]
        if code in BEANS:
            return BEANS[code]
        return "<success></success>"

    t = RemoteTerminology("http://terms.example/rest", fetch,
                          ontology="SNOMEDCT", api_key="k123")
    t._urls = urls
    return t


class TestRemoteClient:
    def test_search_parses_beans_and_builds_reference_url(self, remote):
        hits = remote.search("melanoma", EXACT_MATCH)
        assert hits == [
            {"code": "C_mel", "name": "Melanoma", "ontology": "SNOMEDCT"},
            {"code": "C_skin", "name": "Skin cancer", "ontology": "NCIT"},
        ]
        url = remote._urls[0]
        # searchAll:254-267 URL shape
        assert url.startswith("http://terms.example/rest/search/melanoma/")
        assert "isexactmatch=1" in url and "maxnumhits=75" in url
        assert "apikey=k123" in url
        remote.search("melanoma", CONTAINS_MATCH)
        assert "isexactmatch=0" in remote._urls[1]

    def test_lookup_folds_synonyms_and_definitions(self, remote):
        c = remote.lookup_concept("C_mel")
        assert c.cui == "C_mel" and c.name == "Melanoma"
        # label first, dedup, synonym-ish relations folded in
        assert c.synonyms == ("Melanoma", "malignant melanoma")
        d = remote.lookup_concept("C_root")
        assert d.definitions == ("any disease",)
        assert remote.lookup_concept("C_nope") is None

    def test_related_concepts_sub_and_super(self, remote):
        assert remote.related_concepts("C_root", "NARROWER") == \
            ["C_mel", "C_skin"]
        assert remote.related_concepts("C_mel", "BROADER") == ["C_root"]

    def test_import_subtree_feeds_local_build(self, spark, remote):
        from nobletools_spark.matcher.core import search
        from nobletools_spark.terminology.build import (build_terminology,
                                                        dictionary_from_tables)
        concepts, edges = remote.import_subtree("C_root")
        assert {c["cui"] for c in concepts} == {"C_root", "C_mel", "C_skin"}
        assert set(edges) == {("C_mel", "C_root"), ("C_skin", "C_root")}
        tables = build_terminology(spark, concepts)
        dico = dictionary_from_tables(tables)
        dico.isa_edges = edges
        hits = search("history of malignant melanoma", dico, "best-match")
        assert {h["cui"] for h in hits} == {"C_mel"}
