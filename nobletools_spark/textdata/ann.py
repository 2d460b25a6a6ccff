"""Approximate nearest neighbor over embedding columns.

Three tiers (SURVEY training-data mandate):
- brute-force cosine top-k        (queries.embedding_cosine_topk — baseline)
- random-hyperplane LSH pairs     (dedup.embedding_lsh_neardup_pairs)
- IVF (this module): k-means coarse quantizer -> per-cluster inverted
  lists -> probe the ``n_probe`` nearest centroids only. The standard
  billion-vector layout (FAISS IVF-Flat shape): at scale the cluster
  assignment is the partitioning key, so a query touches n_probe/n_list
  of the data and the scan prunes at the partition level.

Training uses Spark ML KMeans (seeded, deterministic); assignment and
search are pure DataFrame ops — the centroid table is tiny and broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _unit, cosine_expr


@dataclass
class IvfIndex:
    assigned: DataFrame          # (id, v unit-norm, cluster)
    centroids: list[list[float]]  # cluster -> unit-norm centroid
    id_col: str

    def search(self, probe: list[float], k: int = 10,
               n_probe: int = 3) -> DataFrame:
        """Top-k by cosine among the n_probe nearest clusters."""
        import math
        nrm = math.sqrt(sum(x * x for x in probe)) or 1.0
        p = [x / nrm for x in probe]
        scored = sorted(
            ((sum(a * b for a, b in zip(c, p)), i)
             for i, c in enumerate(self.centroids)), reverse=True)
        clusters = [i for _, i in scored[:n_probe]]

        plit = F.array(*[F.lit(float(x)) for x in p])
        cos = cosine_expr(F.col("v"), plit)
        return (self.assigned
                .where(F.col("cluster").isin(clusters))   # partition prune
                .select(F.col("id").alias(self.id_col),
                        F.round(cos, 4).alias("cosine"))
                .orderBy(F.desc("cosine"), self.id_col)
                .limit(k))


def build_ivf(df: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", n_clusters: int = 16,
              seed: int = 42) -> IvfIndex:
    """Fit the coarse quantizer and assign every vector to its cluster."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    unit = df.select(F.col(id_col).alias("id"),
                     _unit(F.col(vec_col)).alias("v"))
    feats = unit.withColumn("features", array_to_vector("v"))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features",
                predictionCol="cluster")
    model = km.fit(feats)
    assigned = (model.transform(feats)
                .select("id", "v", "cluster"))
    cents = []
    for c in model.clusterCenters():
        vec = [float(x) for x in c]
        import math
        nrm = math.sqrt(sum(x * x for x in vec)) or 1.0
        cents.append([x / nrm for x in vec])
    return IvfIndex(assigned=assigned, centroids=cents, id_col=id_col)


def brute_topk(df: DataFrame, probe: list[float], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Exact cosine top-k (the recall oracle for IVF)."""
    import math
    nrm = math.sqrt(sum(x * x for x in probe)) or 1.0
    p = [x / nrm for x in probe]
    plit = F.array(*[F.lit(float(x)) for x in p])
    unit = df.select(F.col(id_col).alias(id_col),
                     _unit(F.col(vec_col)).alias("v"))
    cos = cosine_expr(F.col("v"), plit)
    return (unit.select(id_col, F.round(cos, 4).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col).limit(k))
