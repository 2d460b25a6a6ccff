"""End-to-end training-data curation: the composition surface.

One call chains the individual operators the way a real pre-training data
pipeline does — exact dedup -> quality gate -> PII scrub -> datamix
sampling — proving the pieces compose without driver round-trips: the
whole thing is a single Spark plan (one window shuffle for the dedup,
one join for the quality gate, map-side scrub + sample).

Stage order is the standard one and it matters: dedup before quality
(don't score copies), scrub before sampling (the sample must already be
clean), sampling last (rates apply to the cleaned pool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .analysis import c4_filters, pii_scrub
from .packing import stratified_sample


def curate(docs: DataFrame, rates: dict[str, float] | None = None,
           default_rate: float = 1.0) -> DataFrame:
    """documents(doc_id, lang, source, text) -> curated
    (doc_id, lang, source, n_pii, clean_md5), deterministically.

    1. exact dedup: first doc_id per md5(text) survives;
    2. quality gate: C4-style keep (word count, mean word length,
       stop-word presence);
    3. PII scrub: typed placeholders, per-doc match counts;
    4. datamix: md5 keep-rule stratified by ``lang``.
    """
    rates = {"en": 0.5, "fr": 0.75} if rates is None else rates
    w = Window.partitionBy(
        F.md5(F.coalesce(F.col("text"), F.lit("")))).orderBy("doc_id")
    kept = (docs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
    quality = c4_filters(kept).where("keep").select("doc_id")
    kept = kept.join(quality, "doc_id")
    scrub = pii_scrub(kept)
    enriched = kept.select("doc_id", "lang", "source").join(scrub, "doc_id")
    sampled = stratified_sample(enriched, rates,
                                default_rate=default_rate)
    n_pii = (F.col("n_email") + F.col("n_ip") + F.col("n_ssn")
             + F.col("n_phone")).cast("long")
    return sampled.select("doc_id", "lang", "source",
                          n_pii.alias("n_pii"),
                          F.md5("clean").alias("clean_md5"))
