"""I5 evaluation: P/R/F1 formula unit tests + the hand-annotated gold
corpus differential gate (triple/mention P & R >= 0.95, the BASELINE.json
acceptance metric)."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.evaluation import (PRF, evaluate, parse_gold_span,
                                         per_concept_report)
from nobletools_spark.pipeline.documents import DOCUMENTS_SCHEMA
from nobletools_spark.pipeline.stages import run_pipeline
from nobletools_spark.terminology.fixture import fixture_dictionary

# hand-annotated gold corpus: (doc_id, sentence) + expected mentions
# (doc_id, cui, start, end) — spans hand-computed over the raw sentence
GOLD_DOCS = [
    ("g1", "Malignant melanoma was excised."),
    ("g2", "The deep margin is positive."),
    ("g3", "Family history of breast cancer."),
    ("g4", "Patient has DCIS and a skin rash."),
    ("g5", "No evidence of skin cancer."),
    ("g6", "Dysplastic nevus on the arm."),
    ("g7", "Fever, nausea and headache reported."),
    ("g8", "Biopsy of skin was performed."),
]

GOLD_MENTIONS = [
    ("g1", "C0025202", 0, 18),    # Malignant melanoma
    ("g2", "C1durm01", 4, 15),    # deep margin (subsumes deep / margin)
    ("g3", "C0346109", 18, 31),   # breast cancer
    ("g4", "C0011389", 12, 16),   # DCIS
    ("g4", "C0037284", 23, 32),   # skin rash
    ("g5", "C0007114", 15, 26),   # skin cancer
    ("g6", "C0302314", 0, 16),    # Dysplastic nevus
    ("g7", "C0015967", 0, 5),     # Fever
    ("g7", "C0027497", 7, 13),    # nausea
    ("g7", "C0018681", 18, 26),   # headache
    ("g8", "C0came01", 0, 14),    # Biopsy of skin (unordered synonym)
]


def gold_documents(spark):
    rows = [(d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
            for d, t in GOLD_DOCS]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


class TestFormulas:
    def test_prf_values(self):
        m = PRF(tp=8, tpp=2, fp=2, fn=2)
        assert m.precision == 0.8
        assert m.recall == 0.8
        assert abs(m.f1 - 0.8) < 1e-12
        assert m.partial_precision == (8 + 1) / 12

    def test_zero_denominators(self):
        z = PRF(tp=0, tpp=0, fp=0, fn=0)
        assert z.precision == z.recall == z.f1 == 0.0

    def test_parse_gold_span(self):
        assert parse_gold_span("12:45") == (12, 45)
        assert parse_gold_span("3:9 12:20") == (3, 9)


class TestEvaluateJoins:
    def test_exact_and_partial(self, spark):
        gold = spark.createDataFrame(
            [("d", "C1", 0, 5), ("d", "C2", 10, 20), ("d", "C3", 30, 40)],
            "doc_id string, cui string, start int, end int")
        system = spark.createDataFrame(
            [("d", "C1", 0, 5),      # exact TP
             ("d", "C2", 12, 18),    # overlap, same cui -> TPP
             ("d", "C9", 50, 60)],   # pure FP
            "doc_id string, cui string, start int, end int")
        m = evaluate(system, gold)
        assert (m.tp, m.tpp, m.fp, m.fn) == (1, 1, 2, 2)

    def test_per_concept_report(self, spark):
        gold = spark.createDataFrame(
            [("d", "C1", 0, 5), ("d", "C1", 10, 15)],
            "doc_id string, cui string, start int, end int")
        system = spark.createDataFrame(
            [("d", "C1", 0, 5), ("d", "C2", 0, 5)],
            "doc_id string, cui string, start int, end int")
        rep = {r.cui: (r.tp, r.fp, r.fn)
               for r in per_concept_report(system, gold).collect()}
        assert rep == {"C1": (1, 0, 1), "C2": (0, 1, 0)}

    def test_eval_report_html_flavor(self, spark, tmp_path):
        """B5 HTML flavor (Analysis.getResultTableAsHTML:226-235): the
        reference's exact column header, one row per label, a bolded
        TOTAL row with micro-averaged metrics, written as analysis.html
        (AnnotationEvaluation.ANALYSIS_HTML)."""
        import os
        from nobletools_spark.pipeline.export import (eval_report_html,
                                                      write_eval_report_html)
        gold = spark.createDataFrame(
            [("d", "C1", 0, 5), ("d", "C1", 10, 15)],
            "doc_id string, cui string, start int, end int")
        system = spark.createDataFrame(
            [("d", "C1", 0, 5), ("d", "C2", 0, 5)],
            "doc_id string, cui string, start int, end int")
        rep = per_concept_report(system, gold)
        html = eval_report_html(rep, title="Unit")
        assert ("<tr><th>Label</th><th>TP</th><th>TP'</th><th>FP</th>"
                "<th>FN</th><th>TN</th><th>Precision</th><th>Recall</th>"
                "<th>Accuracy</th><th>F1-Score</th></tr>") in html
        # C1: tp=1 fp=0 fn=1 -> P=1.000 R=0.500 F1=0.667
        assert ("<tr><td>C1</td><td>1</td><td>0</td><td>0</td><td>1</td>"
                "<td>0</td><td>1.000</td><td>0.500</td><td>0.500</td>"
                "<td>0.667</td></tr>") in html
        # TOTAL: tp=1 fp=1 fn=1 -> P=R=0.500
        assert ("<tr><td><b>TOTAL</b></td><td>1</td><td>0</td><td>1</td>"
                "<td>1</td><td>0</td><td>0.500</td><td>0.500</td>"
                "<td>0.333</td><td>0.500</td></tr>") in html
        out = str(tmp_path / "report")
        write_eval_report_html(rep, out, title="Unit")
        with open(os.path.join(out, "analysis.html")) as f:
            assert f.read() == html


class TestGoldGate:
    """The acceptance gate: pipeline mentions vs hand gold, P/R >= 0.95."""

    @pytest.fixture(scope="class")
    def system(self, spark):
        out = run_pipeline(spark, gold_documents(spark),
                           fixture_dictionary(), "best-match")
        return out["mentions"].cache()

    def test_mention_precision_recall(self, spark, system):
        gold = spark.createDataFrame(
            GOLD_MENTIONS, "doc_id string, cui string, start int, end int")
        m = evaluate(system, gold)
        assert m.precision >= 0.95, (m, _diff(spark, system, gold))
        assert m.recall >= 0.95, (m, _diff(spark, system, gold))

    def test_triple_precision_recall(self, spark, system):
        from nobletools_spark.pipeline.stages import materialize_triples
        triples = materialize_triples(system, spark, fixture_dictionary(),
                                      include_isa=False)
        gold = spark.createDataFrame(
            sorted({(d, c) for d, c, _, _ in GOLD_MENTIONS}),
            "doc_id string, cui string")
        m = evaluate(
            triples.select(F.col("subj").alias("doc_id"),
                           F.col("obj").alias("cui")),
            gold, keys=["doc_id", "cui"])
        assert m.precision >= 0.95 and m.recall >= 0.95, m


def _diff(spark, system, gold):
    keys = ["doc_id", "cui", "start", "end"]
    s = {tuple(r) for r in system.select(*keys).distinct().collect()}
    g = {tuple(r) for r in gold.select(*keys).distinct().collect()}
    return {"fp": sorted(s - g), "fn": sorted(g - s)}
