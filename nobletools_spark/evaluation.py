"""I5: annotation evaluation — P/R/F1 against gold annotations.

Formulas per the reference (``eval/Analysis.java:44-57``):
precision = TP/(TP+FP), recall = TP/(TP+FN), F1 = 2PR/(P+R); TPP grants
partial credit for span-overlapping same-concept matches
(``eval/AnnotationEvaluation.java:231-262``). Keys follow the reference's
comparison: (document, concept code, span). The span format in the
reference's gold TSVs is ``start:end`` space-separated
(AnnotationEvaluation.java:157-186).

DataFrame implementation: TP = inner join on keys, FP/FN = anti joins —
three hash joins on a compound key, no collect until the final counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["doc_id", "cui", "start", "end"]


@dataclass(frozen=True)
class PRF:
    tp: int
    tpp: int   # partial-credit hits (overlap, same concept)
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def partial_precision(self) -> float:
        """TPP counted as half-credit (Analysis.java partial scheme)."""
        d = self.tp + self.tpp + self.fp
        return (self.tp + 0.5 * self.tpp) / d if d else 0.0


def evaluate(system: DataFrame, gold: DataFrame,
             keys: list[str] | None = None) -> PRF:
    """Exact-key P/R/F1 plus span-overlap partial credit."""
    keys = keys or KEYS
    sys_k = system.select(*keys).distinct()
    gold_k = gold.select(*keys).distinct()

    tp = sys_k.join(gold_k, keys, "inner").count()
    fp_rows = sys_k.join(gold_k, keys, "left_anti")
    fn_rows = gold_k.join(sys_k, keys, "left_anti")

    # partial credit: FP row whose span overlaps an FN row of the same
    # (doc, cui) — the reference's TPP (AnnotationEvaluation.java:231-262)
    tpp = 0
    if {"start", "end"} <= set(keys):
        on = ["doc_id", "cui"] if "cui" in keys else ["doc_id"]
        a = fp_rows.alias("s")
        b = fn_rows.alias("g")
        cond = [F.col(f"s.{c}") == F.col(f"g.{c}") for c in on]
        cond.append(F.col("s.start") < F.col("g.end"))
        cond.append(F.col("g.start") < F.col("s.end"))
        tpp = (a.join(b, cond)
               .select(*[F.col(f"s.{c}") for c in keys]).distinct().count())

    return PRF(tp=tp, tpp=tpp, fp=fp_rows.count(), fn=fn_rows.count())


def per_concept_report(system: DataFrame, gold: DataFrame,
                       keys: list[str] | None = None) -> DataFrame:
    """Per-CUI confusion counts -> (cui, tp, fp, fn, precision, recall)."""
    keys = keys or KEYS
    sys_k = system.select(*keys).distinct()
    gold_k = gold.select(*keys).distinct()
    tp = (sys_k.join(gold_k, keys).groupBy("cui")
          .agg(F.count(F.lit(1)).alias("tp")))
    fp = (sys_k.join(gold_k, keys, "left_anti").groupBy("cui")
          .agg(F.count(F.lit(1)).alias("fp")))
    fn = (gold_k.join(sys_k, keys, "left_anti").groupBy("cui")
          .agg(F.count(F.lit(1)).alias("fn")))
    out = (tp.join(fp, "cui", "full").join(fn, "cui", "full")
           .na.fill(0, ["tp", "fp", "fn"]))
    p = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    r = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return (out.withColumn("precision", F.round(F.coalesce(p, F.lit(0.0)), 4))
            .withColumn("recall", F.round(F.coalesce(r, F.lit(0.0)), 4))
            .orderBy("cui"))


def parse_gold_span(span: str) -> tuple[int, int]:
    """Reference gold span format ``start:end`` (first span of a
    space-separated list)."""
    first = span.split(" ")[0]
    s, e = first.split(":")
    return int(s), int(e)
