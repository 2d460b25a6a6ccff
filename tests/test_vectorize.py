"""Feature-hashing vectorizer + sparse cosine join (textdata/vectorize.py):
parity with a pure-Python reference of the identical hashing rules, unit
norms, structural pruning, and exact-integer similarity."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from nobletools_spark.textdata.vectorize import (hashing_term_buckets,
                                                 prefix_indexed_buckets,
                                                 sparse_cosine_pairs)


def _py_buckets(texts, dim):
    out = {}
    for doc_id, text in texts.items():
        counts: dict[int, float] = {}
        for tok in text.strip().lower().split():
            h = hashlib.md5(tok.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            s = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
            counts[b] = counts.get(b, 0.0) + s
        l2 = math.sqrt(sum(c * c for c in counts.values()))
        if l2 > 0:
            out[doc_id] = {b: round(c / l2, 6)
                           for b, c in counts.items() if c != 0}
    return out


def _docs(spark, texts):
    return spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")


class TestHashingBuckets:
    def test_matches_python_reference(self, spark):
        rng = random.Random(13)
        words = [f"w{i}" for i in range(40)]
        texts = {i: " ".join(rng.choices(words, k=rng.randint(3, 30)))
                 for i in range(20)}
        got: dict[int, dict[int, float]] = {}
        for r in hashing_term_buckets(_docs(spark, texts), dim=32).collect():
            got.setdefault(r.doc_id, {})[r.bucket] = r.weight
        assert got == _py_buckets(texts, 32)

    def test_unit_norm(self, spark):
        rows = hashing_term_buckets(
            _docs(spark, {1: "alpha beta gamma delta epsilon"}),
            dim=64).collect()
        assert abs(sum(r.weight ** 2 for r in rows) - 1.0) < 1e-4

    def test_cancelling_signs_dropped(self, spark):
        # identical token twice keeps |count|=2; a vanished bucket needs
        # two different tokens hashing to the same bucket with opposite
        # signs — verified structurally: no zero weights ever emitted
        rows = hashing_term_buckets(
            _docs(spark, {1: "x x y y z"}), dim=4).collect()
        assert all(r.weight != 0 for r in rows)


class TestSparseCosine:
    def test_identical_docs_cosine_one(self, spark):
        hv = hashing_term_buckets(
            _docs(spark, {1: "the quick brown fox",
                          2: "the quick brown fox",
                          3: "totally different words here"}), dim=256)
        got = {(r.a, r.b): r.cosine_e12
               for r in sparse_cosine_pairs(hv, threshold=0.9).collect()}
        assert set(got) == {(1, 2)}
        assert abs(got[(1, 2)] - 10 ** 12) < 10 ** 7   # ~1.0

    def test_disjoint_buckets_never_pair(self, spark):
        # structural pruning: docs sharing no bucket produce NO pair row
        # even at threshold 0 (a dense formulation would emit cosine=0)
        hv = hashing_term_buckets(
            _docs(spark, {1: "aaa", 2: "bbb"}), dim=1024)
        b1 = {r.bucket for r in hv.where("doc_id = 1").collect()}
        b2 = {r.bucket for r in hv.where("doc_id = 2").collect()}
        assert not (b1 & b2)
        assert sparse_cosine_pairs(hv, threshold=-1.0).count() == 0


def _brute_pairs(texts, dim, threshold):
    """All-pairs exact-integer dot product over the python vectorizer."""
    vecs = {d: {b: round(w * 1_000_000) for b, w in v.items()}
            for d, v in _py_buckets(texts, dim).items()}
    thr = int(threshold * 1_000_000_000_000)
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = sum(w * vecs[b][k] for k, w in vecs[a].items()
                      if k in vecs[b])
            if vecs[a].keys() & vecs[b].keys() and dot >= thr:
                out[(a, b)] = dot
    return out


class TestPrefixFilterGuard:
    """Hot-bucket guard (prefix filtering, Bayardo et al. WWW'07): pruning
    must be EXACT w.r.t. the threshold, and a planted high-df token must
    not fan out O(n^2) candidate rows from its bucket."""

    def _hot_corpus(self, n=60, seed=7):
        # every doc carries the same hot token ("the"-shaped df=100%)
        # among otherwise doc-specific words; near-dup pairs planted
        rng = random.Random(seed)
        texts = {}
        for i in range(n):
            body = " ".join(f"tok{i}_{j}" for j in range(rng.randint(8, 14)))
            texts[i] = f"hot {body}"
        for i in range(0, n, 10):                     # planted near-dups
            texts[i + 1] = texts[i] + " extra"
        return texts

    def test_exact_vs_brute_force(self, spark):
        texts = self._hot_corpus()
        for thr in (0.9, 0.5, 0.2):
            hv = hashing_term_buckets(_docs(spark, texts), dim=512)
            got = {(r.a, r.b): r.cosine_e12
                   for r in sparse_cosine_pairs(hv, threshold=thr).collect()}
            assert got == _brute_pairs(texts, 512, thr)

    def test_hot_bucket_candidate_volume_bounded(self, spark):
        texts = self._hot_corpus(n=60)
        hv = hashing_term_buckets(_docs(spark, texts), dim=512)
        hot_bucket = int(hashlib.md5(b"hot").hexdigest()[:8], 16) % 512
        t = prefix_indexed_buckets(hv, threshold=0.8)
        hot = t.where(t.bucket == hot_bucket)
        n_total = hot.count()
        n_indexed = hot.where("indexed").count()
        # every doc hits the hot bucket (modulo a rare same-bucket second
        # token with a cancelling sign)
        assert n_total >= 55
        # df-desc ordering walks the hot bucket FIRST in every doc; its
        # contribution is far below the 0.8 budget, so it stays in the
        # unindexed suffix everywhere: candidate fanout from this bucket
        # is n_indexed * n_total = 0, not n_total^2
        assert n_indexed == 0

    def test_indexed_rows_shrink_with_threshold(self, spark):
        texts = self._hot_corpus()
        hv = hashing_term_buckets(_docs(spark, texts), dim=512)
        n_all = hv.count()
        n_idx_hi = prefix_indexed_buckets(hv, 0.9).where("indexed").count()
        n_idx_lo = prefix_indexed_buckets(hv, 0.2).where("indexed").count()
        assert n_idx_hi < n_idx_lo <= n_all
        # at 0.9 a unit vector needs < 19% of its mass indexed... just pin
        # that real pruning happened
        assert n_idx_hi < n_all * 0.75
