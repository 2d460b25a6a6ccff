"""TF-IDF keyword extraction and bigram-LM scoring vs pure-Python
reference implementations."""

import math
from collections import Counter

import pytest

from nobletools_spark.textdata import relevance as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def texts(spark):
    return {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}


def _toks(t):
    return [w for w in (t or "").lower().split() if w]


class TestTfidf:
    def test_matches_python_reference(self, spark, texts):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = {}
        for r in R.tfidf_top_terms(docs, top_k=5).collect():
            got.setdefault(r.doc_id, {})[r.term] = (r.tf, r.tfidf)

        n = len(texts)
        dfreq = Counter()
        for t in texts.values():
            dfreq.update(set(_toks(t)))
        for doc_id, t in texts.items():
            tf = Counter(_toks(t))
            scored = sorted(
                ((round(c * math.log(n / dfreq[w]), 4), w, c)
                 for w, c in tf.items()),
                key=lambda x: (-x[0], x[1]))[:5]
            want = {w: (c, s) for s, w, c in scored}
            assert got.get(doc_id, {}) == want, doc_id

    def test_rare_terms_outrank_common(self, spark):
        df = spark.createDataFrame(
            [(1, "rareword the the the"), (2, "the common text"),
             (3, "the other text")],
            "doc_id long, text string")
        top = R.tfidf_top_terms(df, top_k=1).collect()
        d1 = {r.doc_id: r.term for r in top}
        # 'the' appears in every doc (idf=0); the unique term must win
        assert d1[1] == "rareword"


class TestBigramLm:
    def test_matches_python_reference(self, spark, texts):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in
               R.bigram_lm_scores(docs, k=1.0).collect()}

        uni = Counter()
        big = Counter()
        for t in texts.values():
            ws = _toks(t)
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        v = len(uni)
        for doc_id, t in texts.items():
            ws = _toks(t)
            bgs = list(zip(ws, ws[1:]))
            if not bgs:
                assert doc_id not in got
                continue
            lp = [math.log((big[b] + 1.0) / (uni[b[0]] + v)) for b in bgs]
            assert got[doc_id][0] == len(bgs)
            assert abs(got[doc_id][1] - round(sum(lp) / len(lp), 4)) <= 1e-4
        assert len(got) == sum(1 for t in texts.values()
                               if len(_toks(t)) >= 2)

    def test_garbled_doc_scores_lower(self, spark):
        normal = "the quick brown fox jumps over the lazy dog " * 5
        df = spark.createDataFrame(
            [(i, normal) for i in range(9)]
            + [(9, "zxq vbn qpw mzx wqa zxq pol kjh")],
            "doc_id long, text string")
        scores = {r.doc_id: r.avg_logprob for r in
                  R.bigram_lm_scores(df).collect()}
        # the out-of-distribution doc must score strictly lower than
        # every in-distribution doc — the quality-filter contract
        assert all(scores[9] < scores[i] for i in range(9))
