"""H7 incremental mutation tests: add/remove/update as delta MERGEs must
be exactly equivalent to a full rebuild (the update-in-place contract),
including shared-synonym survival, word-stat decrements, and the derived
blacklist/compacted tables."""

import pytest

from nobletools_spark.config import SearchConfig
from nobletools_spark.matcher.core import search
from nobletools_spark.terminology.build import (build_terminology,
                                                dictionary_from_tables)
from nobletools_spark.terminology.mutate import (add_concept,
                                                 remove_concept,
                                                 update_concept)

CONCEPTS = [
    dict(cui="C1", name="Melanoma", synonyms=["Melanoma", "black tumor"],
         sem_types=["T191"], sources=["S"], terms=[("Melanoma", "PT")],
         definitions=[], codes={"S": "M1"}),
    dict(cui="C2", name="Skin cancer",
         synonyms=["Skin cancer", "black tumor"],   # shared synonym with C1
         sem_types=["T191"], sources=["S"], terms=[("Skin cancer", "PT")],
         definitions=[], codes={"S": "M2"}),
    dict(cui="C3", name="Rash", synonyms=["Rash", "skin eruption"],
         sem_types=["T184"], sources=["S"], terms=[("Rash", "PT")],
         definitions=[], codes={"S": "M3"}),
    dict(cui="C4", name="Fever", synonyms=["Fever", "pyrexia"],
         sem_types=["T184"], sources=["S"], terms=[("Fever", "PT")],
         definitions=[], codes={"S": "M4"}),
]


def _comparable(tables, cfg):
    d = dictionary_from_tables(tables, cfg)
    return {
        "concepts": {k: v for k, v in sorted(d.concepts.items())},
        "term_map": d.term_map, "word_map": d.word_map,
        "word_stats": d.word_stats, "word_is_term": d.word_is_term,
        "blacklist": d.blacklist, "regex_map": d.regex_map,
        "code_map": d.code_map,
    }


@pytest.fixture(scope="module")
def cfg():
    return SearchConfig()


class TestMutateEqualsRebuild:
    def test_remove_keeps_shared_synonym(self, spark, cfg):
        full = build_terminology(spark, CONCEPTS, cfg, compact=True)
        mutated = remove_concept(full, "C1", cfg)
        rebuilt = build_terminology(spark, [c for c in CONCEPTS
                                            if c["cui"] != "C1"],
                                    cfg, compact=True)
        assert _comparable(mutated, cfg) == _comparable(rebuilt, cfg)
        # the shared synonym survives for C2 (reference removeConcept
        # would have dropped the whole termMap entry — documented delta)
        d = dictionary_from_tables(mutated, cfg)
        assert any("black tumor" in t for t in d.term_map)

    def test_add_equals_rebuild(self, spark, cfg):
        base = build_terminology(spark, CONCEPTS[:3], cfg, compact=True)
        mutated = add_concept(base, CONCEPTS[3], cfg)
        rebuilt = build_terminology(spark, CONCEPTS, cfg, compact=True)
        assert _comparable(mutated, cfg) == _comparable(rebuilt, cfg)
        # the re-derived compacted (rarest-word) index matches too
        snap = lambda t: sorted((r.word, tuple(r.terms))
                                for r in t["word_index_compact"].collect())
        assert snap(mutated) == snap(rebuilt)

    def test_update_changes_synonyms_in_place(self, spark, cfg):
        full = build_terminology(spark, CONCEPTS, cfg, compact=True)
        newc = dict(CONCEPTS[2], synonyms=["Rash", "red blotches"])
        mutated = update_concept(full, newc, cfg)
        rebuilt = build_terminology(
            spark, [c for c in CONCEPTS if c["cui"] != "C3"] + [newc],
            cfg, compact=True)
        assert _comparable(mutated, cfg) == _comparable(rebuilt, cfg)
        d = dictionary_from_tables(mutated, cfg)
        assert {h["cui"] for h in search("red blotches noted", d,
                                         "best-match")} == {"C3"}
        assert not search("skin eruption noted", d, "best-match")

    def test_remove_missing_cui_is_noop(self, spark, cfg):
        full = build_terminology(spark, CONCEPTS, cfg)
        assert remove_concept(full, "NOPE", cfg) is full

    @pytest.mark.parametrize("seed", [3, 11, 27])
    def test_randomized_mutation_sequences_equal_rebuild(self, spark, cfg,
                                                         seed):
        # randomized oracle: random concept sets with shared synonyms,
        # word==term single-word names, and shared-prefix vocab; a random
        # remove+add+update sequence must land exactly on the rebuild
        import random
        rng = random.Random(seed)
        pool = ["melanoma", "lesion", "margin", "tumor", "nevus", "cell",
                "deep", "skin", "ductal", "nodule"]

        # codes drawn from a small shared pool so removals force
        # putIfAbsent winner reassignment (shared-code rebuild semantics)
        code_pool = ["K1", "K2", "K3", "K4"]

        def rand_concepts(n, tag):
            out = []
            for i in range(n):
                syns = [" ".join(rng.sample(pool, rng.randint(1, 3)))
                        for _ in range(rng.randint(1, 3))]
                out.append(dict(cui=f"{tag}{i:03d}", name=syns[0],
                                synonyms=syns, sem_types=["T"],
                                sources=["S"], terms=[(syns[0], "PT")],
                                definitions=[],
                                codes={"S": rng.choice(code_pool)}))
            return out

        base = rand_concepts(6, "R")
        extra = rand_concepts(2, "X")
        tables = build_terminology(spark, base, cfg)

        removed = rng.choice(base)["cui"]
        tables = remove_concept(tables, removed, cfg)
        tables = add_concept(tables, extra[0], cfg)
        upd_src = rng.choice([c for c in base if c["cui"] != removed])
        updated = dict(upd_src,
                       synonyms=[" ".join(rng.sample(pool, 2))])
        tables = update_concept(tables, updated, cfg)
        tables = add_concept(tables, extra[1], cfg)

        final = ([c for c in base
                  if c["cui"] not in (removed, upd_src["cui"])]
                 + [extra[0], updated, extra[1]])
        rebuilt = build_terminology(spark, final, cfg)
        got, want = _comparable(tables, cfg), _comparable(rebuilt, cfg)
        # includes code_map: remove_concept reassigns shared-code winners
        # to the earliest surviving holder, exactly as a rebuild files them
        assert got == want

    def test_persisted_roundtrip_after_mutation(self, spark, cfg, tmp_path):
        from nobletools_spark.terminology.persist import (load_terminology,
                                                          save_terminology)
        full = build_terminology(spark, CONCEPTS, cfg)
        p1 = str(tmp_path / "t1.term")
        save_terminology(full, p1, cfg)
        loaded, lcfg = load_terminology(spark, p1)
        mutated = remove_concept(
            {k: v for k, v in loaded.items() if k != "isa_edges"},
            "C4", lcfg)
        p2 = str(tmp_path / "t2.term")
        save_terminology(mutated, p2, lcfg)
        reread, _ = load_terminology(spark, p2)
        rebuilt = build_terminology(spark, CONCEPTS[:3], cfg)
        assert _comparable(reread, cfg) == _comparable(rebuilt, cfg)
