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


# --------------------------------------------------------------------------
# LexEVS REST client (LexEVSRestTerminology.java shapes)
# --------------------------------------------------------------------------

LEXEVS_CONCEPT_XML = """<response>
<queryResponse>
 <class name="org.LexGrid.concepts.Concept">
  <field name="_entityCode">C0025202</field>
  <field name="_entityDescription">
   <class name="org.LexGrid.commonTypes.EntityDescription">
    <field name="_content">Melanoma</field>
   </class>
  </field>
  <field name="_presentationList">
   <class name="org.LexGrid.concepts.Presentation">
    <field name="_isPreferred">true</field>
    <field name="_language">ENG</field>
    <field name="_representationalForm">PT</field>
    <field name="_value">
     <class name="org.LexGrid.commonTypes.Text">
      <field name="_content">Melanoma</field>
     </class>
    </field>
    <field name="_sourceList">
     <class name="org.LexGrid.commonTypes.Source">
      <field name="_content">NCI</field>
     </class>
    </field>
   </class>
   <class name="org.LexGrid.concepts.Presentation">
    <field name="_isPreferred">false</field>
    <field name="_representationalForm">SY</field>
    <field name="_value">
     <class name="org.LexGrid.commonTypes.Text">
      <field name="_content">malignant melanoma</field>
     </class>
    </field>
   </class>
  </field>
  <field name="_definitionList">
   <class name="org.LexGrid.concepts.Definition">
    <field name="_value">
     <class name="org.LexGrid.commonTypes.Text">
      <field name="_content">A malignant neoplasm of melanocytes.</field>
     </class>
    </field>
   </class>
  </field>
  <field name="_propertyList">
   <class name="org.LexGrid.commonTypes.Property">
    <field name="_propertyName">Semantic_Type</field>
    <field name="_value">
     <class name="org.LexGrid.commonTypes.Text">
      <field name="_content">Neoplastic Process</field>
     </class>
    </field>
   </class>
  </field>
 </class>
</queryResponse>
</response>"""


class TestLexEVS:
    def _client(self, log):
        from nobletools_spark.terminology.remote import LexEVSTerminology

        def fetch(url: str) -> str:
            log.append(url)
            return LEXEVS_CONCEPT_XML
        return LexEVSTerminology(
            "http://lexevs.example/lexevs#NCI Thesaurus", fetch)

    def test_scheme_split_and_urls(self):
        log: list[str] = []
        t = self._client(log)
        t.lookup_concept("C0025202")
        assert log[0] == (
            "http://lexevs.example/lexevs/GetXML?"
            "query=org.LexGrid.concepts.Concept&"
            "org.LexGrid.concepts.Concept[@_entityCode=C0025202]"
            "&codingSchemeName=NCI%20Thesaurus")
        t.search("malignant melanoma")
        assert log[1] == (
            "http://lexevs.example/lexevs/GetXML?"
            "query=Concept,Presentation,Text&"
            "Text[@_content=malignant%20melanoma]"
            "&codingSchemeName=NCI%20Thesaurus")

    def test_default_scheme(self):
        from nobletools_spark.terminology.remote import LexEVSTerminology
        log: list[str] = []
        t = LexEVSTerminology("http://s.example",
                              lambda u: (log.append(u),
                                         LEXEVS_CONCEPT_XML)[1])
        t.lookup_concept("X")
        assert "codingSchemeName=NCI%20MetaThesaurus" in log[0]

    def test_concept_folding(self):
        c = self._client([]).lookup_concept("C0025202")
        assert c.cui == "C0025202"
        assert c.name == "Melanoma"
        assert c.synonyms == ("Melanoma", "malignant melanoma")
        assert ("Melanoma", "PT") in c.terms
        assert ("malignant melanoma", "SY") in c.terms
        assert c.sources == ("NCI",)
        assert c.definitions == ("A malignant neoplasm of melanocytes.",)
        assert c.sem_types == ("Neoplastic Process",)

    def test_search_returns_concepts(self):
        hits = self._client([]).search("melanoma")
        assert [h.cui for h in hits] == ["C0025202"]

    def test_feeds_local_matcher(self):
        """import-then-code-locally: LexEVS concepts build a dictionary
        the matcher can code against (the reference's usage pattern)."""
        from nobletools_spark.matcher.core import search
        from nobletools_spark.terminology.storage import build_dictionary
        c = self._client([]).lookup_concept("C0025202")
        dico = build_dictionary([dict(
            cui=c.cui, name=c.name, synonyms=list(c.synonyms),
            sem_types=list(c.sem_types), sources=list(c.sources),
            terms=[tuple(t) for t in c.terms],
            definitions=list(c.definitions), codes={})])
        hits = search("patient shows malignant melanoma", dico, "best-match")
        assert {h["cui"] for h in hits} == {"C0025202"}


# --------------------------------------------------------------------------
# UMLS RRF-over-SQL client (UMLSTerminology.java shapes) — the injected
# runner is DuckDB executing the client's generated SQL over real
# RRF-shaped tables, so the SQL itself is exercised
# --------------------------------------------------------------------------

import pytest


@pytest.fixture(scope="module")
def umls():
    import duckdb

    from nobletools_spark.terminology.remote import UMLSTerminology
    con = duckdb.connect()
    con.execute("""
      CREATE TABLE mrconso(cui VARCHAR, lat VARCHAR, str VARCHAR,
                           sab VARCHAR, tty VARCHAR, code VARCHAR,
                           ispref VARCHAR);
      INSERT INTO mrconso VALUES
        ('C0025202','ENG','Melanoma','MSH','MH','D008545','Y'),
        ('C0025202','ENG','Malignant melanoma','SNOMEDCT','PT','372244006','N'),
        ('C0025202','SPA','Melanoma maligno','MSHSPA','MH','D008545','N'),
        ('C0006826','ENG','Cancer','MSH','MH','D009369','Y'),
        ('C0006826','ENG','Malignant neoplasm','SNOMEDCT','PT','363346000','N'),
        ('C0011847','ENG','Diabetes','MSH','MH','D003920','Y');
      CREATE TABLE mrdef(cui VARCHAR, sab VARCHAR, def VARCHAR);
      INSERT INTO mrdef VALUES
        ('C0025202','MSH','A malignant neoplasm of melanocytes.');
      CREATE TABLE mrsty(cui VARCHAR, sty VARCHAR);
      INSERT INTO mrsty VALUES ('C0025202','Neoplastic Process');
      CREATE TABLE mrsab(rsab VARCHAR, son VARCHAR);
      INSERT INTO mrsab VALUES ('MSH','Medical Subject Headings');
      CREATE TABLE mrrel(cui1 VARCHAR, rel VARCHAR, cui2 VARCHAR,
                         sab VARCHAR);
      INSERT INTO mrrel VALUES
        ('C0006826','CHD','C0025202','MSH'),
        ('C0025202','PAR','C0006826','MSH'),
        ('C0006826','CHD','C0006826','MSH'),  -- self-loop must be dropped
        ('C0006826','RO','C0011847','MSH');   -- non-hierarchy rel ignored
    """)

    def run_query(sql: str) -> list[dict]:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return [dict(zip(cols, row)) for row in cur.fetchall()]
    return UMLSTerminology(run_query)


class TestUMLS:
    def test_lookup_folds_rrf_rows(self, umls):
        c = umls.lookup_concept("C0025202")
        assert c.name == "Melanoma"                       # ispref='Y' wins
        assert c.synonyms == ("Melanoma", "Malignant melanoma")
        assert set(c.sources) == {"MSH", "SNOMEDCT"}
        assert ("MSH", "D008545") in c.codes
        assert c.definitions == ("A malignant neoplasm of melanocytes.",)
        assert c.sem_types == ("Neoplastic Process",)
        # the ENG language filter drops the Spanish row
        assert all("maligno" not in s for s in c.synonyms)

    def test_lookup_missing(self, umls):
        assert umls.lookup_concept("C9999999") is None

    def test_exact_search_case_insensitive(self, umls):
        hits = umls.search("MELANOMA", "exactMatch")
        assert [h["cui"] for h in hits] == ["C0025202"]

    def test_contains_and_prefix(self, umls):
        assert {h["cui"] for h in umls.search("alignant", "contains")} \
            == {"C0025202", "C0006826"}
        assert {h["cui"] for h in umls.search("Malignant", "startsWith")} \
            == {"C0025202", "C0006826"}
        assert {h["cui"] for h in umls.search("melanoma", "endsWith")} \
            == {"C0025202"}

    def test_best_falls_back_to_contains(self, umls):
        # 'neoplasm' has no exact row -> contains fallback finds it
        assert umls.search("neoplasm", "bestMatch")
        # the reference's substring dispatch: 'best' selects bestMatch
        assert umls.search("neoplasm", "best")

    def test_ngram_sweep_largest_first(self, umls):
        hits = umls.search(
            "history of malignant melanoma and diabetes", "ngramMatch")
        cuis = [h["cui"] for h in hits]
        # the 2-gram 'malignant melanoma' wins before its 1-gram parts,
        # and the non-overlapping 1-gram 'diabetes' still matches
        assert "C0025202" in cuis and "C0011847" in cuis
        assert "C0006826" not in cuis      # 'malignant' was consumed

    def test_source_filter(self, umls):
        umls.set_source_filter(["MSH"])
        try:
            hits = umls.search("Malignant melanoma", "exactMatch")
            assert hits == []              # that string is SNOMEDCT-only
            hits = umls.search("Melanoma", "exactMatch")
            assert [h["cui"] for h in hits] == ["C0025202"]
        finally:
            umls.set_source_filter([])

    def test_get_sources(self, umls):
        assert umls.get_sources()[0]["rsab"] == "MSH"

    def test_related_concepts_mrrel(self, umls):
        # children: cui2 of rel='CHD' rows, self-loops and RO rows dropped
        assert umls.related_concepts("C0006826", "NARROWER") == ["C0025202"]
        assert umls.related_concepts("C0025202", "BROADER") == ["C0006826"]
        assert umls.related_concepts("C0011847", "NARROWER") == []

    def test_related_concepts_respects_source_filter(self, umls):
        umls.set_source_filter(["SNOMEDCT"])
        try:
            assert umls.related_concepts("C0006826", "NARROWER") == []
        finally:
            umls.set_source_filter([])

    def test_import_subtree_feeds_local_build(self, spark, umls):
        """UMLS flavor of the BioPortal import-then-code-locally flow:
        MRREL subtree -> build_terminology -> matcher."""
        from nobletools_spark.matcher.core import search
        from nobletools_spark.terminology.build import (build_terminology,
                                                        dictionary_from_tables)
        concepts, edges = umls.import_subtree("C0006826")
        assert {c["cui"] for c in concepts} == {"C0006826", "C0025202"}
        assert edges == [("C0025202", "C0006826")]
        # every English MRCONSO atom became a term row
        mel = next(c for c in concepts if c["cui"] == "C0025202")
        assert ("Malignant melanoma", "PT") in [tuple(t)
                                                for t in mel["terms"]]
        tables = build_terminology(spark, concepts)
        dico = dictionary_from_tables(tables)
        dico.isa_edges = edges
        hits = search("history of malignant melanoma", dico, "best-match")
        assert {h["cui"] for h in hits} == {"C0025202"}


class TestLexEVSImport:
    def test_import_search_feeds_local_build(self):
        """LexEVS flavor: the reference client has no hierarchy surface
        (LexEVSRestTerminology.getRelatedConcepts:287-299 returns null),
        so the import is search-driven and edge-free."""
        from nobletools_spark.matcher.core import search
        from nobletools_spark.terminology.remote import LexEVSTerminology
        from nobletools_spark.terminology.storage import build_dictionary
        log: list = []

        def fetch(url: str) -> str:
            log.append(url)
            return LEXEVS_CONCEPT_XML

        client = LexEVSTerminology("http://lexevs.example/GetXML", fetch)
        concepts, edges = client.import_search(["melanoma", "melanoma"])
        assert edges == []
        assert [c["cui"] for c in concepts] == ["C0025202"]  # deduped
        assert ("malignant melanoma", "SY") in [
            tuple(t) for t in concepts[0]["terms"]]
        dico = build_dictionary(concepts)
        hits = search("patient shows malignant melanoma", dico,
                      "best-match")
        assert {h["cui"] for h in hits} == {"C0025202"}
