"""Deterministic distributed Lloyd's k-means over embedding columns.

The data-curation clustering primitive (cluster-then-sample /
SemDeDup-style semantic bucketing, and the coarse quantizer shape behind
``ann.build_ivf``). Unlike the Spark-ML-backed IVF trainer, this
implementation is *cross-engine deterministic end to end* so an external
SQL engine can replay it exactly:

- init: the k vectors with the smallest ``md5(id)`` (a deterministic,
  data-independent sample — no RNG, no driver collect);
- assignment: argmin of squared L2 distance, ties broken by cluster id;
- update: per-dimension mean ROUNDED to ``round_dp`` — the rounding
  re-synchronizes engines every iteration, so float summation-order noise
  (~1e-16) can never accumulate into a different assignment;
- empty clusters keep their previous centroid.

Scale posture: each iteration is one broadcast of k×dim centroid literals
against the vector table (no shuffle for assignment — the argmin is a
per-row window over a k-way broadcast join) plus one vocabulary-bounded
shuffle for the means (k × dim cells). ``localCheckpoint`` per iteration
truncates lineage exactly as ``graph/analytics.py::pagerank`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kmeans_fit(df: DataFrame, dim: int, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 8,
               iterations: int = 3,
               round_dp: int = 6) -> tuple[DataFrame, DataFrame]:
    """Run ``iterations`` Lloyd steps; return ``(assigned, centroids)``:
    ``assigned`` = (id, v, cluster) against the final centroids and
    ``centroids`` = (cluster, c) — the coarse-quantizer surface
    :func:`nobletools_spark.textdata.ann.build_ivf` consumes.

    ``dim`` is static schema knowledge (embedding width); it lets the
    per-dimension means run as ``dim`` plain ``avg`` aggregates — one
    shuffle, no row explosion.
    """
    vecs = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    vecs = vecs.localCheckpoint(eager=True)

    seeds = (vecs
             .withColumn("h", F.md5(F.col("id").cast("string")))
             .orderBy("h").limit(k))
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("h")) - 1).alias("cluster"),
        F.col("v").alias("c"))
    cents = cents.localCheckpoint(eager=True)

    def assign(centroids: DataFrame) -> DataFrame:
        dist = F.aggregate(
            F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        w = Window.partitionBy("id").orderBy("dist", "cluster")
        return (vecs.crossJoin(F.broadcast(centroids))
                .select("id", "v", "cluster", dist.alias("dist"))
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("id", "v", "cluster"))

    for _ in range(iterations):
        assigned = assign(cents)
        means = (assigned.groupBy("cluster")
                 .agg(*[F.round(F.avg(F.col("v").getItem(d)), round_dp)
                        .alias(f"m{d}") for d in range(dim)])
                 .select("cluster",
                         F.array(*[f"m{d}" for d in range(dim)])
                         .alias("mc")))
        cents = (cents.join(means, "cluster", "left")
                 .select("cluster", F.coalesce("mc", "c").alias("c")))
        cents = cents.localCheckpoint(eager=True)

    return assign(cents), cents


def kmeans_assignments(df: DataFrame, dim: int, id_col: str = "vec_id",
                       vec_col: str = "embedding", k: int = 8,
                       iterations: int = 3,
                       round_dp: int = 6) -> DataFrame:
    """Final assignment ``(vec_id, cluster)`` of :func:`kmeans_fit`."""
    assigned, _ = kmeans_fit(df, dim, id_col=id_col, vec_col=vec_col,
                             k=k, iterations=iterations, round_dp=round_dp)
    return assigned.select(F.col("id").alias(id_col),
                           F.col("cluster").cast("int").alias("cluster"))


def cluster_sample(assignments: DataFrame, per_cluster: int = 3,
                   id_col: str = "vec_id") -> DataFrame:
    """Cluster-then-sample: keep ``per_cluster`` representatives per
    cluster, chosen by md5(id) rank — the deterministic stand-in for
    uniform within-cluster sampling (the SemDeDup / cluster-balanced
    curation decision). One window over the assignment table; no joins,
    no collect."""
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col)
    return (assignments
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_cluster)
            .select(id_col, "cluster"))


def cluster_sample_sql(dim: int, k: int = 8, iterations: int = 3,
                       per_cluster: int = 3, id_col: str = "vec_id",
                       **kwargs) -> str:
    """DuckDB replay of k-means + within-cluster md5-rank sampling."""
    inner = kmeans_assignments_sql(dim, k=k, iterations=iterations,
                                   id_col=id_col, **kwargs)
    return f"""
WITH a AS ({inner}),
r AS (SELECT {id_col}, cluster,
             row_number() OVER (PARTITION BY cluster
                 ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn
      FROM a)
SELECT {id_col}, cluster FROM r WHERE rn <= {per_cluster}
ORDER BY {id_col}
"""


def kmeans_cte_chain(dim: int, k: int = 8, iterations: int = 3,
                     round_dp: int = 6,
                     table: str = "embeddings",
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> tuple[str, str]:
    """DuckDB CTE chain replaying :func:`kmeans_fit` — one (assign,
    update) pair per iteration, identical init / tiebreak / rounding
    rules. Returns ``(chain, final_assign)``: ``chain`` is a ``WITH``
    prefix whose last centroid CTE is ``c{iterations}``, and
    ``final_assign`` is a SELECT of (id, v, cluster) against it —
    consumers append their own CTEs/SELECT (assignments, IVF search)."""
    assign_from = (
        "SELECT id, v, cluster FROM (\n"
        "  SELECT v.id, v.v, c.cluster,\n"
        "         row_number() OVER (PARTITION BY v.id ORDER BY\n"
        "           list_sum(list_transform(list_zip(v.v, c.c),\n"
        "                    p -> (p[1] - p[2]) ^ 2)), c.cluster) AS rn\n"
        "  FROM v CROSS JOIN {cents} c) WHERE rn = 1")
    sql = f"""
WITH v AS MATERIALIZED (SELECT CAST({id_col} AS BIGINT) AS id,
                  CAST({vec_col} AS DOUBLE[]) AS v FROM {table}),
seeds AS (SELECT id, v, md5(CAST(id AS VARCHAR)) AS h FROM v
          ORDER BY h LIMIT {k}),
c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY h) - 1 AS cluster,
                           v AS c
       FROM seeds)"""
    # MATERIALIZED: DuckDB inlines plain CTEs per reference, and c{i-1} is
    # referenced twice per level (directly and through a{i}) — without the
    # hint the chain re-executes 2^iterations times
    for i in range(1, iterations + 1):
        sql += f""",
a{i} AS MATERIALIZED ({assign_from.format(cents=f"c{i - 1}")}),
m{i} AS (SELECT cluster, list(val ORDER BY d) AS mc FROM (
    SELECT cluster, d, round(avg(v[d]), {round_dp}) AS val
    FROM a{i}, range(1, {dim} + 1) t(d) GROUP BY cluster, d)
  GROUP BY cluster),
c{i} AS MATERIALIZED (SELECT c.cluster, coalesce(m.mc, c.c) AS c
         FROM c{i - 1} c LEFT JOIN m{i} m ON m.cluster = c.cluster)"""
    return sql, assign_from.format(cents=f"c{iterations}")


def kmeans_assignments_sql(dim: int, k: int = 8, iterations: int = 3,
                           round_dp: int = 6,
                           table: str = "embeddings",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """The DuckDB replay of :func:`kmeans_assignments`."""
    chain, final = kmeans_cte_chain(dim, k=k, iterations=iterations,
                                    round_dp=round_dp, table=table,
                                    id_col=id_col, vec_col=vec_col)
    return chain + f"""
SELECT id AS {id_col}, CAST(cluster AS INT) AS cluster
FROM ({final}) ORDER BY {id_col}
"""
