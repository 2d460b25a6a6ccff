"""Physical-plan regression guards: the plan properties BENCH.md claims
(pushdown, pruning, broadcast dimensions, narrow match stages, no
cartesian products in scale paths) asserted against `.explain` output so
refactors can't silently regress them."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "simple") -> str:
    # formatted mode renders PushedFilters/ReadSchema untruncated
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def scan_block(df, table: str) -> str:
    plan = plan_of(df, "formatted")
    blocks = plan.split("\n\n")
    for b in blocks:
        if "Scan parquet" in b and table in b:
            return b
    return ""


class TestPushdownAndPruning:
    def test_filters_reach_parquet_scan(self, spark):
        from nobletools_spark.relational.queries import QUERIES
        df = QUERIES["scan_filter_project"].spark(spark, SF)
        scan = scan_block(df, "lineitem")
        assert "PushedFilters" in scan
        assert "GreaterThan" in scan and "LessThan" in scan
        # projection pruned to the 6 needed columns (4 out + 2 filters)
        read = scan.split("ReadSchema:")[1].splitlines()[0]
        assert read.count(",") <= 5

    def test_q5_broadcasts_dimensions(self, spark):
        from nobletools_spark.relational.queries import QUERIES
        plan = plan_of(QUERIES["join_revenue_by_nation"].spark(spark, SF))
        assert plan.count("BroadcastHashJoin") >= 2   # nation + region
        assert "CartesianProduct" not in plan


class TestKgPipelinePlans:
    def test_mention_detect_is_narrow(self, spark):
        # the match stage must not shuffle: scan -> (project) -> two
        # mapInPandas stages (split + match), zero Exchange operators
        from nobletools_spark.pipeline.documents import (
            interleave_flat_documents)
        from nobletools_spark.pipeline.stages import (detect_mentions,
                                                      split_sentences)
        from nobletools_spark.terminology.fixture import fixture_dictionary
        flat = spark.read.parquet(f"{SF}/documents.parquet")
        bc = spark.sparkContext.broadcast(fixture_dictionary())
        mentions = detect_mentions(
            split_sentences(interleave_flat_documents(flat)), bc)
        plan = plan_of(mentions)
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 2

    def test_context_pass_single_doc_shuffle(self, spark):
        from nobletools_spark.context.lexicon import modifier_dictionary
        from nobletools_spark.pipeline.documents import (
            interleave_flat_documents)
        from nobletools_spark.pipeline.stages import (annotate_documents,
                                                      split_sentences)
        from nobletools_spark.terminology.fixture import fixture_dictionary
        flat = spark.read.parquet(f"{SF}/documents.parquet")
        ann = annotate_documents(
            split_sentences(interleave_flat_documents(flat)),
            spark.sparkContext.broadcast(fixture_dictionary()),
            spark.sparkContext.broadcast(modifier_dictionary()))
        plan = plan_of(ann)
        # exactly one repartition (doc_id) buys document-ordered state
        assert plan.count("Exchange") == 1


class TestScalePathPlans:
    def test_minhash_no_cartesian_no_collect_list(self, spark):
        from nobletools_spark.textdata.dedup import (lsh_candidate_pairs,
                                                     minhash_signatures,
                                                     shingle_array)
        d = spark.read.parquet(f"{SF}/documents.parquet")
        star = lsh_candidate_pairs(minhash_signatures(shingle_array(d)))
        plan = plan_of(star)
        assert "CartesianProduct" not in plan
        assert "collect_list" not in plan    # star emission is window-min

    def test_line_dedup_cross_doc_test_is_partial_aggregated(self, spark):
        # the ">=2 distinct docs" test must be a groupBy on the line hash
        # (map-side partial aggregation collapses a hot boilerplate line
        # per-partition) joined back to the lines — never a window over
        # partitionBy(md5(line)), which co-locates every instance of a
        # hot line in one task and is unsplittable by AQE skew handling
        from nobletools_spark.textdata.analysis import line_dedup
        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = plan_of(line_dedup(d))
        assert "partial_min" in plan and "partial_max" in plan
        # the only Window-free shuffle chain: hash agg -> join -> doc agg
        assert "Window" not in plan
        # partial aggregate sits UPSTREAM of the line-hash exchange (the
        # plan prints parents first, so the map-side child follows it)
        assert "Exchange hashpartitioning(lh" in plan
        below_exchange = plan.split("Exchange hashpartitioning(lh", 1)[1]
        assert "partial_min" in below_exchange

    def test_shuffle_match_joins_not_broadcast_dictionary(self, spark):
        # the UMLS-scale path must join the dictionary tables, never
        # collect them to the driver: its plan contains the word/term
        # joins and no Python-side dictionary broadcast
        from nobletools_spark.pipeline.shuffle_match import (
            detect_mentions_shuffle)
        from nobletools_spark.pipeline.stages import SENTENCES_SCHEMA
        from nobletools_spark.terminology.build import build_terminology
        from nobletools_spark.terminology.fixture import FIXTURE_CONCEPTS
        tables = build_terminology(spark, FIXTURE_CONCEPTS, compact=True)
        sents = spark.createDataFrame(
            [("d1", 0, "Prose", "melanoma of the skin", 0, 0)],
            schema=SENTENCES_SCHEMA)
        plan = plan_of(detect_mentions_shuffle(sents, tables))
        assert plan.count("Join") >= 3       # word -> term -> concept


class TestTrainingDataAssemblyPlans:
    def test_stratified_sample_is_map_side_only(self, spark):
        # datamix sampling must not shuffle: scan -> filter, zero
        # Exchange operators, md5 keep-rule evaluated in codegen
        from nobletools_spark.textdata.packing import stratified_sample
        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = plan_of(stratified_sample(d, {"en": 0.25}))
        assert "Exchange" not in plan
        # the keep-rule filter runs inside whole-stage codegen
        assert "codegen id" in plan_of(
            stratified_sample(d, {"en": 0.25}), "formatted")

    def test_pack_sequences_single_bucket_shuffle(self, spark):
        # exactly one Exchange (the bounded bucket key) feeding one
        # FlatMapGroupsInPandas — the sequential walk is per-bucket only
        from nobletools_spark.textdata.packing import pack_sequences
        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = plan_of(pack_sequences(d, 512, 16))
        assert plan.count("Exchange") == 1
        assert "FlatMapGroupsInPandas" in plan

    def test_bpe_pair_counts_partial_aggregates(self, spark):
        # both aggregations partial-aggregate map-side (HashAggregate
        # pairs around each Exchange); no Python in the plan at all
        from nobletools_spark.textdata.bpe import pair_counts, word_counts
        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = plan_of(pair_counts(word_counts(d)))
        assert plan.count("HashAggregate") == 4   # partial+final, twice
        assert "InPandas" not in plan and "BatchEvalPython" not in plan

    def test_embedding_dup_groups_no_quadratic_ops(self, spark):
        # the grouping surface must stay free of cartesian products and
        # driver funnels (no collect_list over the corpus)
        from nobletools_spark.textdata.dedup import embedding_dup_groups
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = plan_of(embedding_dup_groups(e, threshold=0.4, dim=64))
        assert "CartesianProduct" not in plan
        assert "collect_list" not in plan

    def test_relevance_ops_stay_jvm_side(self, spark):
        # corpus-statistics ops: no Python in the plan, aggregations
        # partial-aggregate map-side, corpus scalars ride broadcast joins
        from nobletools_spark.textdata.relevance import (bigram_lm_scores,
                                                         tfidf_top_terms)
        d = spark.read.parquet(f"{SF}/documents.parquet")
        for op in (tfidf_top_terms, bigram_lm_scores):
            plan = plan_of(op(d))
            assert "InPandas" not in plan and "BatchEvalPython" not in plan
            # the single-row scalar cross joins must plan as broadcast
            # nested-loop of 1 row, never a real CartesianProduct
            assert "CartesianProduct" not in plan


class TestR4Plans:
    def test_embedding_lsh_exchange_reuse(self, spark):
        # the band-key table feeds both self-join sides through ONE
        # hash-partitioned exchange (ReusedExchange), so the interpreted
        # projections run once per vector; the explicit partition count
        # also stops AQE from coalescing the blowup join (r4 fix:
        # candidate stage 9.5 s -> 2.4 s at sf0.1)
        from nobletools_spark.textdata.dedup import \
            embedding_lsh_neardup_pairs
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        df = embedding_lsh_neardup_pairs(e, threshold=0.4, dim=64)
        # AQE only materializes ReusedExchange in the EXECUTED plan —
        # and only THIS DataFrame's execution (a noop write plans a copy)
        df.collect()
        plan = plan_of(df)
        assert "isFinalPlan=true" in plan
        assert "ReusedExchange" in plan

    def test_brute_cosine_parallel_and_materialized(self, spark):
        # the O(n^2) verify must not run on the input's (single) parquet
        # split, and the exchange must materialize the normalization so
        # it is not re-evaluated per joined row (r4 fix: 100 s -> 8 s)
        from nobletools_spark.textdata.dedup import embedding_neardup_pairs
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = plan_of(embedding_neardup_pairs(e, threshold=0.4))
        assert "Exchange RoundRobinPartitioning" in plan

    def test_pii_scrub_is_map_side_only(self, spark):
        # PII scrubbing is a narrow map stage: zero shuffles, no Python
        from nobletools_spark.textdata.analysis import pii_scrub
        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = plan_of(pii_scrub(d))
        assert "Exchange" not in plan
        assert "InPandas" not in plan and "BatchEvalPython" not in plan

    def test_ngram_overlap_single_gram_shuffle_broadcast_eval(self, spark):
        # one shuffle keys the gram join; the (small) eval side arrives
        # by broadcast, so the training corpus never re-shuffles for it
        from pyspark.sql import functions as F

        from nobletools_spark.textdata.analysis import ngram_overlap_pairs
        d = spark.read.parquet(f"{SF}/documents.parquet")
        train = d.where(F.col("doc_id") % 5 != 0)
        ev = d.where(F.col("doc_id") % 5 == 0).limit(20)
        plan = plan_of(ngram_overlap_pairs(train, ev))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestGraphAnalyticsPlans:
    def test_pagerank_iteration_broadcast_and_truncated_lineage(self, spark):
        # after localCheckpoint the per-iteration plan must NOT contain the
        # whole chain of prior iterations: the final plan stays bounded
        # (scan of the checkpointed RDD), and the contribution aggregation
        # partial-aggregates map-side
        from nobletools_spark.graph.analytics import pagerank
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
        plan = plan_of(pagerank(e, iterations=4))
        assert "Scan ExistingRDD" in plan      # truncated lineage
        assert plan.count("HashAggregate") <= 2  # final round only

    def test_cooccurrence_pmi_broadcasts_frequencies(self, spark):
        # doc-frequency joins are explicit broadcasts; the corpus-size
        # scalar rides a single-row join, never a collect
        from nobletools_spark.graph.analytics import concept_cooccurrence_pmi
        dc = spark.createDataFrame(
            [("d1", "A"), ("d1", "B")], "doc_id string, cui string")
        plan = plan_of(concept_cooccurrence_pmi(dc))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "collect_list" not in plan

    def test_triangle_counts_no_cartesian_and_bounded_plan(self, spark):
        from nobletools_spark.graph.analytics import triangle_counts
        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "c")], "a string, b string")
        plan = plan_of(triangle_counts(e))
        assert "CartesianProduct" not in plan
        assert "Scan ExistingRDD" in plan      # edge table materialized once

    def test_ivf_search_prunes_lists_via_broadcast(self, spark):
        # the IVF search stage: inverted-list pruning must be a
        # broadcast hash join on the cluster key (partition pruning at
        # scale), never a shuffled join or a cartesian product
        from nobletools_spark.textdata.ann import ivf_topk
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = plan_of(ivf_topk(e, dim=64, n_clusters=4, iterations=1,
                                n_probe=2, k=5))
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        # the centroid ranking runs as a row_number window over the
        # k-row centroid table (score DESC), not a driver-side collect
        assert "score" in plan and "row_number()" in plan

    def test_kmeans_assignment_has_no_shuffle_before_argmin(self, spark):
        # assignment = vectors x broadcast(centroids) + per-id window; the
        # only Exchanges in the final assign pass are the window partition
        # hash — no SortMergeJoin anywhere
        from nobletools_spark.textdata.clustering import kmeans_assignments
        vecs = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(10)],
            "vec_id long, embedding array<double>")
        plan = plan_of(kmeans_assignments(vecs, dim=2, k=2, iterations=1))
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
