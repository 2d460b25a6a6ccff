"""BPE tokenizer-training tests: distributed pair counting vs a pure
Python reference, merge learning determinism, corpus encoding
round-trip."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from nobletools_spark.textdata import bpe as B

SF = "/root/testdata/sf0.001"


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            c[w] += 1
    return c


def _ref_pair_counts(wc):
    c = Counter()
    for w, n in wc.items():
        seq = list(w) + [B.END]
        for i in range(len(seq) - 1):
            c[(seq[i], seq[i + 1])] += n
    return c


def _ref_train(wc, k):
    table = [(list(w) + [B.END], n) for w, n in sorted(wc.items())]
    merges = []
    for _ in range(k):
        c = Counter()
        for seq, n in table:
            for i in range(len(seq) - 1):
                c[(seq[i], seq[i + 1])] += n
        if not c:
            break
        top = max(c.values())
        best = min(p for p, v in c.items() if v == top)
        merges.append(best)
        table = [(B._merge_seq(s, *best), n) for s, n in table]
    return merges


@pytest.fixture(scope="module")
def texts(spark):
    return [r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("text").collect()]


class TestPairCounts:
    def test_matches_python_reference(self, spark, texts):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = {(r.a, r.b): r.n for r in
               B.pair_counts(B.word_counts(docs)).collect()}
        want = _ref_pair_counts(_ref_word_counts(texts))
        assert got == dict(want)

    def test_unicode_symbols(self, spark):
        df = spark.createDataFrame([(1, "héllo héllo")],
                                   "doc_id long, text string")
        got = {(r.a, r.b): r.n for r in
               B.pair_counts(B.word_counts(df)).collect()}
        assert got[("h", "é")] == 2  # '.' must match one codepoint


class TestTrain:
    def test_matches_reference_and_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(
                ["low low low lower lowest", "new newer newest wide wider",
                 "low wide new low"])],
            "doc_id long, text string")
        wc = _ref_word_counts([r.text for r in df.collect()])
        want = _ref_train(wc, 12)
        got = B.bpe_train(df, 12)
        assert got == want
        assert got == B.bpe_train(df.repartition(7), 12)

    def test_vocab_guard(self, spark):
        df = spark.createDataFrame([(1, "a b c d e")],
                                   "doc_id long, text string")
        with pytest.raises(ValueError, match="max_vocab_rows"):
            B.bpe_train(df, 2, max_vocab_rows=3)


class TestTrainDistributed:
    def test_parity_with_driver_loop(self, spark):
        # the distributed merge loop (nothing vocab-sized on the driver,
        # 1-row collect per iteration) must produce the identical merge
        # list — including repeated-symbol greedy cases (oo/ooo) and
        # ties broken lexicographically
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(
                ["low low low lower lowest", "new newer newest wide wider",
                 "loooow wooool oooo", "low wide new low"])],
            "doc_id long, text string")
        assert B.bpe_train_distributed(df, 12) == B.bpe_train(df, 12)

    def test_partitioning_invariance(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(
                ["aa ab ba bb aa", "ab ab aa ba"])],
            "doc_id long, text string")
        assert (B.bpe_train_distributed(df, 6)
                == B.bpe_train_distributed(df.repartition(5), 6))

    def test_merge_expr_matches_merge_seq(self, spark):
        from pyspark.sql import functions as F
        cases = [(["x", "x", "x", "x"], "x", "x"),
                 (["x", "x", "y"], "x", "y"),
                 (["x", "y", "y"], "x", "y"),
                 (["a"], "a", "a"),
                 ([], "a", "b"),
                 (["x", "y", "x", "y", "x"], "x", "y")]
        df = spark.createDataFrame(
            [(i, s) for i, (s, _, _) in enumerate(cases)],
            "i int, s array<string>")
        for i, (seq, a, b) in enumerate(cases):
            got = (df.where(F.col("i") == i)
                   .select(B._merge_expr(F.col("s"), a, b).alias("m"))
                   .collect()[0].m)
            assert got == B._merge_seq(seq, a, b), (seq, a, b)


class TestEncode:
    def test_round_trip_and_merge_consistency(self, spark, texts):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
        merges = B.bpe_train(docs, 30)
        enc = {r.doc_id: r.tokens for r in
               B.bpe_encode(docs, merges).collect()}
        raw = {r.doc_id: r.text for r in docs.collect()}
        vocab = {"".join(p) for p in merges}
        for doc_id, toks in enc.items():
            # lossless: concatenated tokens reproduce the lowercased words
            words = "".join(toks).replace(B.END, " ").split()
            assert words == (raw[doc_id] or "").lower().split()
            # every multi-char token is a learned merge product
            for t in toks:
                if len(t.replace(B.END, "")) > 1 or (
                        t.endswith(B.END) and len(t) > len(B.END)):
                    assert t in vocab or t == B.END

    def test_no_merges_is_char_split(self, spark):
        df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
        toks = B.bpe_encode(df, []).collect()[0].tokens
        assert toks == ["a", "b", B.END, "c", B.END]
