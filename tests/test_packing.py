"""Training-data assembly tests: deterministic sequence packing,
stratified datamix sampling, and semantic (embedding) dup groups."""

import pytest
from pyspark.sql import functions as F

from nobletools_spark.textdata import dedup as D
from nobletools_spark.textdata import packing as P

SF = "/root/testdata/sf0.001"


def _greedy(tokens, budget):
    """Reference greedy walk (the documented semantics)."""
    seqs, seq, acc = [], 0, 0
    for t in tokens:
        if acc > 0 and acc + t > budget:
            seq, acc = seq + 1, 0
        acc += t
        seqs.append(seq)
    return seqs


class TestPackSequences:
    def test_greedy_semantics_with_edges(self, spark):
        # edge cases: empty doc (0 tokens), over-budget doc, boundary fit
        rows = [(i, txt) for i, txt in enumerate([
            "a b c",            # 3
            "",                 # 0  (empty: joins current seq)
            " ".join("w" for _ in range(10)),   # 10 > budget: own seq
            "d e",              # 2
            "f g h",            # 3  (2+3=5 <= 5: same seq)
            "i",                # 1  (5+1=6 > 5: new seq)
        ])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = (P.pack_sequences(df, budget=5, n_buckets=1)
               .orderBy("doc_id").collect())
        toks = [r.ws_tokens for r in got]
        assert toks == [3, 0, 10, 2, 3, 1]
        assert [r.seq for r in got] == _greedy(toks, 5)
        # the over-budget doc sits alone in its sequence
        by_seq = {}
        for r in got:
            by_seq.setdefault(r.seq, []).append(r.doc_id)
        assert by_seq[[r.seq for r in got][2]] == [2]

    def test_bucketed_matches_reference_walk(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        packed = P.pack_sequences(docs, budget=512, n_buckets=8).collect()
        by_bucket = {}
        for r in sorted(packed, key=lambda r: (r.bucket, r.doc_id)):
            by_bucket.setdefault(r.bucket, []).append(r)
        assert len(by_bucket) == 8
        for rows in by_bucket.values():
            assert [r.seq for r in rows] == _greedy(
                [r.ws_tokens for r in rows], 512)

    def test_no_sequence_overfills_except_oversize_docs(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rep = P.pack_report(
            P.pack_sequences(docs, budget=512, n_buckets=8), 512).collect()
        for r in rep:
            assert r.tokens <= 512 or r.oversize

    def test_null_text_counts_zero_tokens(self, spark):
        # NULL text must behave exactly like empty text (0 tokens, same
        # sequence), not poison the walk with NaN
        df = spark.createDataFrame(
            [(1, "a b"), (2, None), (3, "c d e")],
            "doc_id long, text string")
        got = {r.doc_id: (r.seq, r.ws_tokens) for r in
               P.pack_sequences(df, budget=5, n_buckets=1).collect()}
        assert got[2] == (0, 0)
        assert got == {1: (0, 2), 2: (0, 0), 3: (0, 3)}

    def test_partitioning_invariance(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, P.pack_sequences(docs, 512, 8).collect()))
        b = sorted(map(tuple, P.pack_sequences(
            docs.repartition(13), 512, 8).collect()))
        assert a == b


class TestStratifiedSample:
    RATES = {"en": 0.25, "fr": 0.5, "de": 0.75}

    def test_deterministic_and_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(r.doc_id for r in
                   P.stratified_sample(docs, self.RATES).collect())
        b = sorted(r.doc_id for r in
                   P.stratified_sample(docs.repartition(17),
                                       self.RATES).collect())
        assert a == b and len(a) > 0

    def test_rates_respected_approximately(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rep = {r.stratum: r for r in
               P.mix_report(docs, self.RATES).collect()}
        for lang, rate in self.RATES.items():
            got = rep[lang].kept_ratio
            # md5 buckets are uniform; small strata -> loose bound
            assert abs(got - rate) < 0.25, (lang, got, rate)
        # default-rate strata keep everything
        for lang, r in rep.items():
            if lang not in self.RATES:
                assert r.n_kept == r.n_total

    def test_monotone_in_rate(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        lo = {r.doc_id for r in
              P.stratified_sample(docs, {"en": 0.2}).collect()}
        hi = {r.doc_id for r in
              P.stratified_sample(docs, {"en": 0.6}).collect()}
        assert lo <= hi  # same hash, bigger threshold: supersets only

    def test_sample_is_subset_with_exact_keep_rule(self, spark):
        import hashlib
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = {r.doc_id for r in
               P.stratified_sample(docs, self.RATES).collect()}
        for r in docs.select("doc_id", "lang").collect():
            bucket = int(hashlib.md5(str(r.doc_id).encode())
                         .hexdigest()[:8], 16) % 10_000
            rate = self.RATES.get(r.lang, 1.0)
            assert (bucket < int(rate * 10_000)) == (r.doc_id in got)


class TestEmbeddingDupGroups:
    def test_groups_equal_components_of_verified_pairs(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        pairs = D.embedding_lsh_neardup_pairs(
            emb, threshold=0.4, dim=64).collect()
        # reference union-find over the verified pair graph
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        got = {r.vec_id: r.group_id for r in
               D.embedding_dup_groups(emb, threshold=0.4,
                                      dim=64).collect()}
        assert got == want
        assert len(got) > 0

    def test_group_id_is_min_member(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        rows = D.embedding_dup_groups(emb, threshold=0.4, dim=64).collect()
        by_group = {}
        for r in rows:
            by_group.setdefault(r.group_id, []).append(r.vec_id)
        for gid, members in by_group.items():
            assert gid == min(members)


class TestPackingProperties:
    """Hypothesis properties over the pure greedy-walk semantics (no
    Spark needed: _greedy is the documented contract, and
    TestPackSequences pins the Spark implementation to it)."""

    def test_greedy_invariants_random_token_lists(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(min_value=0, max_value=40),
                        max_size=60),
               st.integers(min_value=1, max_value=30))
        def prop(tokens, budget):
            seqs = _greedy(tokens, budget)
            assert len(seqs) == len(tokens)
            # seq ids are 0-based, contiguous, non-decreasing
            assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
            if seqs:
                assert seqs[0] == 0
            # no sequence exceeds budget unless it is a single oversize doc
            fill: dict[int, list[int]] = {}
            for s, t in zip(seqs, tokens):
                fill.setdefault(s, []).append(t)
            for members in fill.values():
                assert sum(members) <= budget or (
                    len(members) >= 1 and max(members) > budget)
            # docs never split, order preserved: concatenation identity
            assert [t for s in sorted(fill) for t in fill[s]] == tokens

        prop()


class TestIncrementalStateReplay:
    def test_duplicate_state_rows_do_not_change_pairs(self, spark):
        # the replay-tolerance claim: a double-appended (replayed) state
        # batch yields byte-identical pair output
        from nobletools_spark.textdata.dedup import (
            band_keys, minhash_incremental_pairs_from_state,
            minhash_signatures, shingle_array)
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text")
        corpus = docs.where(F.col("doc_id") % 2 == 0)
        new = docs.where(F.col("doc_id") % 2 == 1)
        keys = band_keys(minhash_signatures(shingle_array(corpus)))
        once = sorted((r.a, r.b, round(r.jaccard, 4)) for r in
                      minhash_incremental_pairs_from_state(
                          keys, corpus, new).collect())
        # replay duplicates BOTH state tables (keys and texts); pair
        # output must be identical INCLUDING multiplicities (a duplicated
        # text row would multiply pairs through the verify join)
        doubled = sorted((r.a, r.b, round(r.jaccard, 4)) for r in
                         minhash_incremental_pairs_from_state(
                             keys.unionByName(keys),
                             corpus.unionByName(corpus), new).collect())
        assert once == doubled and len(once) > 0
