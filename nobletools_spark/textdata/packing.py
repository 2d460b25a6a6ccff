"""Training-data assembly operators: deterministic sequence packing and
stratified datamix sampling.

These are the steps between "deduped, filtered corpus" and "training
batches": pick how much of each stratum to keep (datamix), then pack
documents into fixed token-budget sequences. Both are deterministic
functions of the row (md5-derived), so an external SQL engine re-derives
every decision independently — no RNG state, no driver-side sampling.

100 TB posture:
- ``stratified_sample`` is a pure map-side filter (no shuffle, pushes the
  strata predicate into the scan when the column is partition-keyed).
- ``pack_sequences`` shuffles once on a bounded bucket key; packing is
  sequential only WITHIN a bucket (greedy first-fit-in-order needs an
  order), and buckets are mutually independent, so parallelism = bucket
  count — size ``n_buckets`` to the cluster, not the corpus. Each bucket
  group streams through one Arrow batch pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(col: Column, n: int) -> Column:
    """Deterministic bucket in [0, n): first 8 md5 hex chars of the value
    as an int (the same arithmetic DuckDB re-derives; 8 hex chars fit a
    long exactly)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % n)


def _keep_expr(rates: dict[str, float], strata_col: str, id_col: str,
               default_rate: float, denom: int) -> Column:
    """The shared keep-rule: md5_bucket(id, denom) < round(rate * denom).
    Rounded (not truncated) before the integer compare so Spark agrees
    with SQL engines whose CAST rounds (rate*denom like 0.57*10000 is
    5699.999... in float64 — truncation would drop one bucket)."""
    bucket = md5_bucket(F.col(id_col), denom)
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))) \
                .otherwise(rate)
    return bucket < F.round(rate * denom).cast("long")


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang",
                      id_col: str = "doc_id",
                      default_rate: float = 1.0,
                      denom: int = 10_000) -> DataFrame:
    """Deterministic stratified (datamix) sampling: keep a row iff
    ``md5_bucket(id, denom) < rate[stratum] * denom``. The keep decision
    is a pure function of (id, stratum) — reproducible across runs,
    engines, and cluster sizes, and independent of row order/partitioning
    (unlike ``df.sample``, whose output changes with the split layout).

    Models the domain-mixing step of an LLM data pipeline (e.g. keep 25%
    of crawl, 100% of curated sources). Map-side only: no shuffle."""
    return df.where(_keep_expr(rates, strata_col, id_col,
                               default_rate, denom))


def mix_report(df: DataFrame, rates: dict[str, float],
               strata_col: str = "lang", id_col: str = "doc_id",
               default_rate: float = 1.0,
               denom: int = 10_000) -> DataFrame:
    """-> (stratum, n_total, n_kept, kept_ratio): the observable mixture
    the sample actually achieves, one aggregation pass (partial map-side).
    Dropped coverage must be visible, not silent. Uses the SAME keep rule
    as ``stratified_sample`` (shared expression, shared ``denom``) so the
    report describes the actual sample."""
    kept = _keep_expr(rates, strata_col, id_col,
                      default_rate, denom).cast("long")
    return (df.groupBy(F.col(strata_col).alias("stratum"))
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(kept).alias("n_kept"),
                 F.round(F.sum(kept) / F.count(F.lit(1)), 4)
                 .alias("kept_ratio"))
            .orderBy("stratum"))


def pack_sequences(df: DataFrame, budget: int = 512,
                   n_buckets: int = 16, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, bucket, seq, ws_tokens): greedy in-order sequence
    packing under a token budget — the batch-assembly step of LLM
    training (documents concatenated into fixed-size training sequences).

    Semantics (deterministic, engine-independent): docs are bucketed by
    ``md5_bucket(doc_id, n_buckets)``; within a bucket, walked in
    ``doc_id`` order; a doc joins the current sequence unless that would
    exceed ``budget`` whitespace tokens, in which case it starts the next
    sequence (seq numbering restarts per bucket; an over-budget doc gets
    a sequence of its own). Greedy-in-order is the streaming-friendly
    packing the big pipelines use — bin-packing optimality is not worth a
    global sort at corpus scale.

    Plan: one shuffle on the bucket key, then a single Arrow pass per
    bucket group (applyInPandas). The per-group walk is a numpy loop over
    group rows — the sequential part of the algorithm, irreducible
    because "current fill level" is an order-carried dependency."""
    import pandas as pd

    # NULL text must count as 0 tokens (not NULL): a NULL would reach the
    # pandas walk as NaN, poisoning the accumulator and the long schema
    ws = F.when(F.length(F.trim(text_col)) == 0, 0) \
          .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    base = df.select(F.col(id_col).alias("doc_id"),
                     md5_bucket(F.col(id_col), n_buckets).alias("bucket"),
                     F.coalesce(ws, F.lit(0)).cast("long")
                     .alias("ws_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
        seq, acc = 0, 0
        for t in pdf["ws_tokens"]:
            if acc > 0 and acc + t > budget:
                seq, acc = seq + 1, 0
            acc += t
            seqs.append(seq)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        return pdf[["doc_id", "bucket", "seq", "ws_tokens"]]

    return base.groupBy("bucket").applyInPandas(
        pack, schema="doc_id long, bucket long, seq long, ws_tokens long")


def pack_report(packed: DataFrame, budget: int = 512) -> DataFrame:
    """-> per-(bucket, seq) fill metrics: n_docs, tokens, fill_ratio and
    whether the sequence holds a single over-budget doc. One aggregation;
    the packing-efficiency dashboard a training pipeline watches."""
    return (packed.groupBy("bucket", "seq")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("ws_tokens").alias("tokens"),
                 F.round(F.sum("ws_tokens") / F.lit(float(budget)), 4)
                 .alias("fill_ratio"),
                 ((F.count(F.lit(1)) == 1)
                  & (F.sum("ws_tokens") > budget)).alias("oversize"))
            .orderBy("bucket", "seq"))
