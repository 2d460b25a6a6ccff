"""Matcher-core golden tests + the round-trip invariant (FIXTURES.md §5).

The round-trip test is the reference's own strongest oracle
(NobleCoderTerminologyTest.testTerminologyTerms:31-90): every synonym of
every concept, fed back through search(), must return its own CUI; extra
concepts are allowed only if their matched-term words are a subset of the
query's words.
"""

import pytest

from nobletools_spark.config import SearchConfig, for_search_method
from nobletools_spark.matcher.core import process_sentence, search
from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                  fixture_dictionary)
from nobletools_spark.terminology.storage import normalized_terms_for
from nobletools_spark.text import tools as T


@pytest.fixture(scope="module")
def dico():
    return fixture_dictionary()


def cuis(mentions):
    return {m.cui for m in mentions}


class TestRoundTrip:
    def test_every_synonym_self_retrieves(self, dico):
        cfg = SearchConfig()
        misses, bad_extras = [], []
        for c in FIXTURE_CONCEPTS:
            for syn in [c["name"], *c.get("synonyms", ())]:
                if syn.startswith("/"):
                    continue  # regex synonyms are exercised separately
                if syn.count(" ") > cfg.max_words_in_term:
                    continue  # beyond maxWordsInTerm cap: misses tolerated
                found = search(syn, dico, "best-match")
                got = {e["cui"] for e in found}
                if c["cui"] not in got:
                    misses.append((c["cui"], syn))
                qwords = set(T.normalize_words(syn))
                for e in found:
                    if e["cui"] == c["cui"]:
                        continue
                    for mt in e["matched_terms"]:
                        if not set(T.normalize_words(mt)).issubset(qwords):
                            bad_extras.append((c["cui"], syn, e["cui"], mt))
        assert not misses, f"synonyms that failed to self-retrieve: {misses}"
        assert not bad_extras, f"extra concepts beyond query words: {bad_extras}"


class TestBestMatch:
    def test_subsumption_deep_margin(self, dico):
        # 'deep margin' must subsume 'deep' and 'margin' (flag doc :113)
        ms = process_sentence("the deep margin is clear", dico,
                              for_search_method("best-match"))
        assert cuis(ms) == {"C1durm01"}

    def test_word_gap_contiguity(self, dico):
        best = for_search_method("best-match")      # gap 1
        precise = for_search_method("precise-match")  # gap 0
        assert "C1reddog" in cuis(process_sentence("red swift dog", dico, best))
        got = cuis(process_sentence("red swift dog", dico, precise))
        assert "C1reddog" not in got
        assert "C1red000" in got  # falls back to single-word 'red'

    def test_word_order(self, dico):
        precise = for_search_method("precise-match")
        assert "C1reddog" in cuis(process_sentence("red dog", dico, precise))
        assert "C1reddog" not in cuis(process_sentence("dog red", dico, precise))
        # best-match has no order constraint
        assert "C1reddog" in cuis(process_sentence("dog red", dico,
                                                   for_search_method("best-match")))

    def test_stop_word_term(self, dico):
        ms = process_sentence("cancer of the skin", dico,
                              for_search_method("best-match"))
        assert "C0007114" in cuis(ms)

    def test_acronym_case_scoring(self, dico):
        # uppercase DCIS matches; lowercase dcis is penalized to score<0
        assert "C0011389" in cuis(process_sentence(
            "He has DCIS as a diagnosis", dico, for_search_method("best-match")))
        assert "C0011389" not in cuis(process_sentence(
            "what about dcis", dico, for_search_method("best-match")))

    def test_acronym_allowed_in_allcaps_context(self, dico):
        # mostly-uppercase sentences suspend the acronym penalty (:2626-2629)
        ms = process_sentence("WHERE ARE ALL OF THE FISH?", dico,
                              for_search_method("best-match"))
        assert "C0016153" in cuis(ms)

    def test_fish_disambiguation(self, dico):
        lower = process_sentence("There is a fish under the sea.", dico,
                                 for_search_method("best-match"))
        assert "C0016153" in cuis(lower) and "C0016163" not in cuis(lower)
        upper = process_sentence("I had a test done using a FISH method.", dico,
                                 for_search_method("best-match"))
        assert "C0016163" in cuis(upper) and "C0016153" not in cuis(upper)

    def test_normalization_paths(self, dico):
        assert "C0027960" in cuis(process_sentence("multiple nevi present",
                                                   dico, for_search_method("best-match")))
        assert "C0002395" in cuis(process_sentence("Alzheimer's disease",
                                                   dico, for_search_method("best-match")))
        assert "C1prote1" in cuis(process_sentence("a Protégé term",
                                                   dico, for_search_method("best-match")))

    def test_regex_concept(self, dico):
        ms = process_sentence("pattern nevus melanocytic observed", dico,
                              for_search_method("best-match"))
        regex_hits = [m for m in ms if m.normalized_term == ""]
        assert any(m.cui == "C0302314" for m in regex_hits)
        assert regex_hits[0].annotations[0][1] == 8  # offset of 'nevus'

    def test_shared_synonym_both_returned(self, dico):
        # 'cold' maps to two CUIs; default selectBestCandidate=False keeps both
        got = cuis(process_sentence("patient reports a cold", dico,
                                    for_search_method("best-match")))
        assert {"C0009443", "C0009264"}.issubset(got)

    def test_select_best_candidate(self, dico):
        from dataclasses import replace
        cfg = replace(for_search_method("best-match"), select_best_candidate=True)
        ms = process_sentence("patient reports a cold", dico, cfg)
        both = [m for m in ms if m.cui in ("C0009443", "C0009264")]
        assert len(both) == 1


class TestAllMatch:
    def test_no_subsumption(self, dico):
        ms = process_sentence("the deep margin is clear", dico,
                              for_search_method("all-match"))
        got = cuis(ms)
        assert {"C1durm01", "C0205125", "C0205284"}.issubset(got)


class TestPartialMatch:
    def test_half_words_match(self, dico):
        # 'malignant neoplasm of skin' (normalized 3 words) with only
        # 'malignant neoplasm' in text -> hit ratio 2/3 >= 0.5
        ms = process_sentence("likely a malignant neoplasm", dico,
                              for_search_method("partial-match"))
        assert "C0007114" in cuis(ms)


class TestAnnotations:
    def test_offsets_are_sentence_relative(self, dico):
        text = "deep margin and another deep margin"
        ms = process_sentence(text, dico, for_search_method("best-match"))
        m = next(m for m in ms if m.cui == "C1durm01")
        for w, off in m.annotations:
            assert text[off:off + len(w)] == w

    def test_repeated_term_split_into_mentions(self, dico):
        text = "deep margin and another deep margin"
        ms = [m for m in process_sentence(text, dico, for_search_method("best-match"))
              if m.cui == "C1durm01"]
        assert len(ms) >= 2
        starts = sorted(m.start for m in ms)
        assert starts[0] == 0 and starts[-1] >= 24


class TestSearchApi:
    def test_order_by_score_then_code(self, dico):
        res = search("melanoma and cancer of the skin", dico, "best-match")
        scores = [e["score"] for e in res]
        assert scores == sorted(scores, reverse=True)
