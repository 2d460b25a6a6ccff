"""Graph analytics over materialized KG tables: PageRank and doc-level
concept co-occurrence (PMI edges).

Reference parity note: the reference engine stops at hierarchy traversal
(`NobleCoderTerminology.getAncestors`, see `graph/hierarchy.py`); these two
operators are part of the LLM-data/KG-enrichment surface this engine adds on
top — concept importance for ranking mention candidates at query time, and
co-occurrence edges that augment the isa graph with corpus-derived
relatedness (the classic KG-construction enrichment step).

Scale posture:
- ``pagerank`` is the join-based fixed-iteration form: each iteration is one
  shuffle on ``dst`` (the contribution aggregation) plus a broadcast-sized
  join against out-degrees; the dangling-mass scalar stays IN-PLAN via a
  single-row cross join (the same pattern as ``textdata/relevance.py``), so
  nothing collects to the driver. An eager ``localCheckpoint`` per iteration
  truncates lineage — without it iteration k replays all k-1 prior joins
  (the same guard ``bpe_train_distributed`` uses).
- ``concept_cooccurrence_pmi`` shuffles once on ``doc_id``; the per-document
  pair explosion is bounded by (distinct concepts per doc)^2, which is small
  and independent of corpus size. Document frequencies are
  vocabulary-bounded and the corpus size rides the plan as a single-row
  cross join, so the whole query is two shuffles at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85, iterations: int = 10,
             round_dp: int = 6, weight_col: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge table ``(src, dst)``,
    optionally weighted by ``weight_col``.

    Semantics (the textbook formulation, deterministic for a fixed
    iteration count):

        rank_0(v)   = 1/N
        rank_k+1(v) = (1-d)/N + d * (sum_{u->v} rank_k(u) * w(u,v)/W(u)
                                     + dangling_k/N)

    where W(u) is u's total outgoing weight (unweighted: every edge
    weighs 1, so w/W = 1/outdeg), and ``dangling_k`` is the total rank
    held by vertices with no out-edges (their mass redistributes
    uniformly, keeping ranks summing to 1). Returns ``(cui, rank)`` with
    ``rank`` rounded to ``round_dp`` so engine summation order cannot
    flip a value hash.
    """
    cols = [F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("w"))
    edges = edges.select(*cols).distinct()
    if weight_col is None:
        edges = edges.withColumn("w", F.lit(1.0))
    vertices = (edges.select(F.col("src").alias("cui"))
                .union(edges.select(F.col("dst").alias("cui")))
                .distinct())
    vertices = vertices.localCheckpoint(eager=True)
    n_df = vertices.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # contribution weight per edge is static across iterations — precompute
    w_edges = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = (vertices.crossJoin(n_df)
             .select("cui", (F.lit(1.0) / F.col("n")).alias("rank")))
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(iterations):
        contrib = (ranks.join(w_edges, ranks.cui == w_edges.src)
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") * F.col("w") / F.col("outdeg"))
                        .alias("contrib"))
                   .withColumnRenamed("dst", "cui"))
        dangling = (ranks.join(outdeg, ranks.cui == outdeg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("mass")))
        ranks = (vertices
                 .join(contrib, "cui", "left")
                 .crossJoin(n_df).crossJoin(dangling)
                 .select("cui",
                         ((1.0 - damping) / F.col("n")
                          + damping * (F.coalesce(F.col("contrib"),
                                                  F.lit(0.0))
                                       + F.col("mass") / F.col("n")))
                         .alias("rank")))
        # truncate lineage: each iteration otherwise replays every prior one
        ranks = ranks.localCheckpoint(eager=True)

    return ranks.select("cui", F.round("rank", round_dp).alias("rank"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-vertex degree summary over a directed edge table ``(src, dst)``:
    out-degree, in-degree, total. One shuffle per direction (both are
    map-side partial-aggregated), then a vertex-keyed outer merge — the
    KG health-check surface (hub concepts, leaf counts, skew candidates
    for the salting knob)."""
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst")).distinct()
    outd = e.groupBy(F.col("src").alias("cui")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("cui")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (outd.join(ind, "cui", "full_outer")
            .select("cui",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
            .withColumn("degree",
                        (F.col("out_degree") + F.col("in_degree"))))


def connected_components(edges: DataFrame,
                         vertices: DataFrame | None = None) -> DataFrame:
    """``(a, b)`` undirected edges -> ``(cui, component)`` with the
    component labeled by its minimum member — the public graph surface
    over the hybrid engine `textdata/dedup.py::candidate_components`
    (driver union-find under the edge budget, distributed min-label
    propagation with per-round lineage truncation above it; the same
    machinery canonicalization and dup-grouping run on).

    ``vertices`` (one ``cui`` column) adds isolated vertices as their own
    singleton components — edge lists alone cannot name them.
    """
    from ..textdata.dedup import candidate_components
    comp = candidate_components(
        edges.select(F.col("a").cast("string").alias("a"),
                     F.col("b").cast("string").alias("b")))
    out = comp.select(F.col("doc_id").alias("cui"),
                      F.col("comp").alias("component"))
    if vertices is not None:
        singles = (vertices.select(F.col("cui").cast("string").alias("cui"))
                   .distinct()
                   .join(out, "cui", "left_anti")
                   .select("cui", F.col("cui").alias("component")))
        out = out.unionByName(singles)
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge table given in
    canonical orientation ``(a, b)`` with ``a < b``.

    Enumerates each triangle once as a < b < c via two self-joins (the
    standard distributed formulation: join on the shared middle vertex,
    then close the wedge against the edge set), explodes each triangle to
    its three corners, and counts per vertex; vertices in no triangle
    report 0. At scale both joins shuffle on a vertex key and the wedge
    explosion is bounded by sum(deg^2) — the same skew profile as the
    co-occurrence pair count, so hot vertices respond to the same
    salting knob.
    """
    e = (edges.select(F.col("a").cast("string").alias("a"),
                      F.col("b").cast("string").alias("b"))
         .where(F.col("a") < F.col("b")).distinct())
    # e is referenced five times (two wedge sides, the closure probe, both
    # vertex projections) and tri three times — materialize each once or
    # the whole upstream (here: the mention pipeline) replays per reference
    e = e.localCheckpoint(eager=True)
    verts = (e.select(F.col("a").alias("cui"))
             .union(e.select(F.col("b").alias("cui"))).distinct())
    wedge = (e.select(F.col("a").alias("x"), F.col("b").alias("y"))
             .join(e.select(F.col("a").alias("y"), F.col("b").alias("z")),
                   "y"))
    tri = wedge.join(e.select(F.col("a").alias("x"),
                              F.col("b").alias("z")), ["x", "z"])
    tri = tri.localCheckpoint(eager=True)
    corners = (tri.select(F.col("x").alias("cui"))
               .union(tri.select(F.col("y").alias("cui")))
               .union(tri.select(F.col("z").alias("cui"))))
    counts = corners.groupBy("cui").agg(F.count(F.lit(1)).alias("triangles"))
    return (verts.join(counts, "cui", "left")
            .select("cui", F.coalesce("triangles", F.lit(0))
                    .cast("long").alias("triangles")))


def concept_cooccurrence_pmi(doc_concepts: DataFrame,
                             round_dp: int = 4) -> DataFrame:
    """PMI-weighted co-occurrence edges from ``(doc_id, cui)`` mention rows.

    For each unordered concept pair (a < b) appearing in the same document:

        pmi(a, b) = ln( n_ab * N / (n_a * n_b) )

    with N = number of distinct documents carrying at least one mention and
    n_x = document frequency. Output ``(cui_a, cui_b, n_docs, pmi)``.

    Plan: distinct (doc_id, cui) -> self-join on doc_id (one shuffle; the
    per-doc explosion is bounded by the per-doc concept count) -> pair
    counts (second shuffle) -> broadcast doc-frequency joins (the concept
    vocabulary is dictionary-bounded) with N as an in-plan scalar.
    """
    dc = (doc_concepts.select(F.col("doc_id").cast("string").alias("doc_id"),
                              F.col("cui").cast("string").alias("cui"))
          .distinct())
    n_df = dc.agg(F.countDistinct("doc_id").cast("double").alias("n_corpus"))
    df_freq = dc.groupBy("cui").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    a = dc.select("doc_id", F.col("cui").alias("cui_a"))
    b = dc.select("doc_id", F.col("cui").alias("cui_b"))
    pairs = (a.join(b, "doc_id")
             .where(F.col("cui_a") < F.col("cui_b"))
             .groupBy("cui_a", "cui_b")
             .agg(F.count(F.lit(1)).alias("n_docs")))
    return (pairs
            .join(F.broadcast(df_freq.withColumnRenamed("cui", "cui_a")
                              .withColumnRenamed("df", "df_a")), "cui_a")
            .join(F.broadcast(df_freq.withColumnRenamed("cui", "cui_b")
                              .withColumnRenamed("df", "df_b")), "cui_b")
            .crossJoin(n_df)
            .select("cui_a", "cui_b", F.col("n_docs").cast("long")
                    .alias("n_docs"),
                    F.round(F.log(F.col("n_docs") * F.col("n_corpus")
                                  / (F.col("df_a") * F.col("df_b"))),
                            round_dp).alias("pmi")))
