"""Corpus-statistics relevance operators: TF-IDF keyword extraction and
n-gram language-model scoring (the CCNet-style perplexity quality
signal, with the LM trained on the corpus itself).

Everything is JVM-side DataFrame algebra — tokenize/explode/groupBy/
join/window — with corpus-level scalars (doc count, vocabulary size)
carried IN-PLAN via single-row cross joins rather than driver actions,
so each operator stays one lazy plan end to end.

100 TB posture: term and n-gram statistics aggregate with map-side
partial combine (the shuffle carries (term, partial_count), bounded by
vocabulary, not corpus); the score joins key on terms/bigrams — AQE
broadcasts the statistics side when it fits, and both sides are
vocabulary-scale. Nothing is quadratic and nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _doc_terms(df: DataFrame, text_col: str) -> DataFrame:
    """-> (doc_id, term): one row per token occurrence (lowercased
    whitespace tokens)."""
    term = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return (df.select("doc_id", term.alias("term"))
            .where(F.col("term") != ""))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    top_k: int = 5) -> DataFrame:
    """-> (doc_id, term, tf, tfidf): the ``top_k`` highest-TF-IDF terms
    per document — the classic keyword-extraction / doc-representation
    operator. idf = ln(n_docs / doc_freq); deterministic tiebreak
    (tfidf desc, term asc) so top-k is reproducible."""
    terms = _doc_terms(df, text_col)
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = (terms.distinct().groupBy("term")
             .agg(F.count(F.lit(1)).alias("df")))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(n_docs)
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.col("_n") / F.col("df")), 4)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= top_k)
            .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                    "tfidf"))


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     k: float = 1.0) -> DataFrame:
    """-> (doc_id, n_bigrams, avg_logprob): per-document average bigram
    log-probability under an add-k-smoothed bigram LM trained on the
    corpus itself — the LM-perplexity quality signal (CCNet-style: low
    avg_logprob = unusual/garbled text relative to the corpus).

    P(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V), V = vocabulary size.
    Docs with fewer than one bigram are omitted (no defined score).
    Train and score are ONE plan: bigram/unigram/V statistics aggregate
    corpus-wide, then each doc's bigrams join back against them."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    d = df.select("doc_id", toks.alias("_t"))
    idx = F.when(F.size("_t") >= 2, F.sequence(F.lit(1), F.size("_t") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    doc_bigrams = d.select(
        "doc_id",
        F.explode(F.transform(idx, lambda i: F.struct(
            F.element_at("_t", i).alias("w1"),
            F.element_at("_t", i + 1).alias("w2")))).alias("b")) \
        .select("doc_id", "b.w1", "b.w2")

    big_c = doc_bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))
    uni_c = (_doc_terms(df, text_col).groupBy("term")
             .agg(F.count(F.lit(1)).alias("c1"))
             .withColumnRenamed("term", "w1"))
    vocab = (_doc_terms(df, text_col).select("term").distinct()
             .agg(F.count(F.lit(1)).alias("_v")))

    logp = F.log((F.col("c12") + F.lit(k))
                 / (F.col("c1") + F.lit(k) * F.col("_v")))
    return (doc_bigrams
            .join(big_c, ["w1", "w2"])
            .join(uni_c, "w1")
            .crossJoin(vocab)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.round(F.avg(logp), 4).alias("avg_logprob")))
