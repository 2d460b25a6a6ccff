"""JSONL source/sink (pipeline/jsonl.py): good lines parse with extra
keys ignored, malformed lines quarantine with reasons instead of
vanishing, round-trip through the sink is lossless, and the source feeds
the interleave adapter + pipeline end to end."""

from __future__ import annotations

import json
import os

import pytest

from nobletools_spark.pipeline.jsonl import (read_documents_jsonl,
                                             write_documents_jsonl)


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


class TestJsonlSource:
    def test_parse_quarantine_and_counts(self, spark, tmp_path):
        src = str(tmp_path / "in" / "part-0.jsonl")
        _write_lines(src, [
            json.dumps({"doc_id": 1, "text": "alpha", "lang": "en",
                        "source": "crawl", "extra_key": [1, 2, 3]}),
            json.dumps({"doc_id": 2, "text": "beta"}),   # minimal ok
            '{"doc_id": 3, "text": "broken',              # unparseable
            json.dumps({"doc_id": 4}),                    # missing text
            json.dumps({"text": "no id"}),                # missing doc_id
        ])
        ok, quarantine = read_documents_jsonl(spark, str(tmp_path / "in"))
        rows = {r.doc_id: r for r in ok.collect()}
        assert set(rows) == {1, 2}
        assert rows[1].lang == "en" and rows[2].lang is None
        q = sorted((r.reason, r.raw) for r in quarantine.collect())
        assert [r for r, _ in q] == ["missing_required_field",
                                     "missing_required_field",
                                     "unparseable"]
        assert q[2][1].startswith('{"doc_id": 3')

    def test_quarantine_preserves_original_line(self, spark, tmp_path):
        """The 'raw line for reprocessing' promise: quarantined rows carry
        the ORIGINAL line verbatim, extra JSON keys included (a
        re-serialization from the four schema fields would drop them)."""
        src = str(tmp_path / "in" / "part-0.jsonl")
        missing = json.dumps({"doc_id": 7, "meta": {"url": "http://x"},
                              "extra_key": [1, 2, 3]})     # no text
        broken = '{"doc_id": 8, "text": "broken, "custom_field": 1'
        _write_lines(src, [missing, broken])
        _, quarantine = read_documents_jsonl(spark, str(tmp_path / "in"))
        got = {r.reason: r.raw for r in quarantine.collect()}
        assert got == {"missing_required_field": missing,
                       "unparseable": broken}

    def test_round_trip_lossless(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(1, "hello world", "en", "a"), (2, "unicode mélange", "fr",
                                             "b")],
            "doc_id long, text string, lang string, source string")
        out = str(tmp_path / "out")
        write_documents_jsonl(docs, out, single_file=True)
        back, quarantine = read_documents_jsonl(spark, out)
        assert quarantine.isEmpty()
        assert sorted(map(tuple, back.collect())) == \
            sorted(map(tuple, docs.collect()))

    def test_feeds_pipeline_end_to_end(self, spark, tmp_path):
        from nobletools_spark.pipeline.documents import \
            interleave_flat_documents
        from nobletools_spark.pipeline.stages import run_pipeline
        from nobletools_spark.terminology.fixture import fixture_dictionary
        src = str(tmp_path / "in" / "d.jsonl")
        _write_lines(src, [
            json.dumps({"doc_id": i,
                        "text": "malignant melanoma on the deep margin",
                        "lang": "en", "source": "t"})
            for i in range(4)])
        ok, _ = read_documents_jsonl(spark, str(tmp_path / "in"))
        out = run_pipeline(spark, interleave_flat_documents(ok),
                           fixture_dictionary(), "best-match")
        assert out["triples"].count() > 0
