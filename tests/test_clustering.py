"""Deterministic Lloyd's k-means (textdata/clustering.py): parity with a
pure-Python reference implementing the identical rules (md5 seeds, argmin
with cluster-id tiebreak, 6dp-rounded means, empty clusters keep their
centroid), plus invariance properties."""

from __future__ import annotations

import hashlib
import random

import pytest

from nobletools_spark.textdata.clustering import kmeans_assignments


def _py_kmeans(vecs, k=3, iterations=3, round_dp=6):
    """vecs: {id: [float]} — same trajectory as the Spark side."""
    dim = len(next(iter(vecs.values())))
    seeded = sorted(vecs, key=lambda i: hashlib.md5(
        str(i).encode()).hexdigest())[:k]
    seeded.sort(key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cents = {c: list(vecs[i]) for c, i in enumerate(seeded)}

    def assign():
        out = {}
        for i, v in vecs.items():
            best = min(cents,
                       key=lambda c: (sum((x - y) ** 2
                                          for x, y in zip(v, cents[c])), c))
            out[i] = best
        return out

    for _ in range(iterations):
        a = assign()
        for c in cents:
            members = [vecs[i] for i in a if a[i] == c]
            if members:
                cents[c] = [round(sum(m[d] for m in members) / len(members),
                                  round_dp) for d in range(dim)]
    return assign()


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")


class TestKMeans:
    def test_matches_python_reference(self, spark):
        rng = random.Random(11)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(5)] for i in range(40)}
        got = {r.vec_id: r.cluster for r in kmeans_assignments(
            _vec_df(spark, vecs), dim=5, k=3, iterations=3).collect()}
        assert got == _py_kmeans(vecs, k=3, iterations=3)

    def test_separated_blobs_recovered(self, spark):
        # assign blob membership round-robin in md5(id) order so the three
        # md5-chosen seeds provably land in three different blobs — Lloyd
        # then must recover the blobs exactly
        rng = random.Random(5)
        centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]
        by_md5 = sorted(range(36), key=lambda i: hashlib.md5(
            str(i).encode()).hexdigest())
        blob_of = {i: pos % 3 for pos, i in enumerate(by_md5)}
        vecs = {i: [c + rng.uniform(-0.5, 0.5)
                    for c in centers[blob_of[i]]] for i in range(36)}
        got = {r.vec_id: r.cluster for r in kmeans_assignments(
            _vec_df(spark, vecs), dim=2, k=3, iterations=4).collect()}
        # every blob lands wholly in one cluster, and blobs in distinct ones
        blobs = [{got[i] for i in range(36) if blob_of[i] == b}
                 for b in range(3)]
        assert all(len(b) == 1 for b in blobs)
        assert len(set().union(*blobs)) == 3

    def test_partitioning_invariant(self, spark):
        rng = random.Random(23)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(30)}
        one = kmeans_assignments(_vec_df(spark, vecs).repartition(1),
                                 dim=4, k=4).collect()
        many = kmeans_assignments(_vec_df(spark, vecs).repartition(8),
                                  dim=4, k=4).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))

    def test_k_larger_than_some_clusters_survives(self, spark):
        # two identical points + k=3: at least one cluster goes empty and
        # must keep its seed centroid without erroring
        vecs = {0: [0.0, 0.0], 1: [0.0, 0.0], 2: [5.0, 5.0],
                3: [5.0, 5.0], 4: [5.0, 5.0]}
        got = {r.vec_id: r.cluster for r in kmeans_assignments(
            _vec_df(spark, vecs), dim=2, k=3, iterations=2).collect()}
        assert got == _py_kmeans(vecs, k=3, iterations=2)
        assert got[0] == got[1] and got[2] == got[3] == got[4]
