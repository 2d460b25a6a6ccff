"""Differential parity vs the COMPILED REFERENCE ENGINE (skipped when
javac or the reference sources are unavailable). Uses a reduced corpus to
keep runtime reasonable; the full 1,315-sentence / all-modes sweep is
`python scripts/matcher_parity.py` (last full run: 0 diffs everywhere)."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

HAVE_ORACLE = (shutil.which("javac") is not None
               and os.path.isdir("/root/reference/src/main/java"))

pytestmark = pytest.mark.skipif(
    not HAVE_ORACLE, reason="javac or reference sources unavailable")


@pytest.fixture(scope="module")
def harness():
    import matcher_parity as MP
    assert MP.build(), "reference oracle failed to compile"
    return MP


@pytest.fixture(scope="module")
def sentences():
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.sentence.splitter import (filter_sentence,
                                                    process_document)
    out = []
    for _, spans in generate_documents_local(25, seed=321):
        for sp in spans:
            if sp["kind"] != "text" or not sp["text"]:
                continue
            rows, _ = process_document(sp["text"])
            out += [r.text.strip() for r in rows
                    if not filter_sentence(r.text, r.sent_type)
                    and r.text.strip() and "\n" not in r.text]
    out += [
        "No evidence of malignant melanoma or DCIS.",
        "The deep margin is clear; deep margins are involved.",
        "cancer of the skin vs skin cancers",
        "2.5 mm melanoma at 3.7 cm",
    ]
    return out


@pytest.mark.parametrize("mode", ["best-match", "all-match", "precise-match",
                                  "nonoverlap-match", "partial-match"])
def test_matcher_identical_to_reference(harness, sentences, mode):
    from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                      FIXTURE_ISA_EDGES)
    ref = harness.run_reference(FIXTURE_CONCEPTS, sentences, mode)
    ours = harness.run_ours(FIXTURE_CONCEPTS, sentences,
                            FIXTURE_ISA_EDGES, mode)
    for i, s in enumerate(sentences):
        assert ref[i] == ours[i], (mode, s, ref[i] ^ ours[i])


def test_acronym_doc_pass_identical(harness):
    assert harness.run_acronym_diff()


def test_negex_identical(harness):
    assert harness.run_negex_diff()


def test_text_layer_identical(harness):
    import texttools_parity as TP
    assert TP.main() == 0


def test_context_identical(harness):
    assert harness.run_context_diff()


def test_termfilter_identical(harness):
    assert harness.run_termfilter_diff()


def test_ancestors_identical(harness):
    assert harness.run_ancestors_diff()


def test_document_processor_identical(harness):
    assert harness.run_docproc_diff()


def test_paragraphs_identical(harness):
    # C5: ParagraphProcessor spans + part labels, incl. the
    # paragraph-action ConText case folded into run_context_diff
    assert harness.run_paragraph_diff()
