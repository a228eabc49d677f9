"""K-means iterative-algorithm tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.operators.similarity import as_double, kmeans_fit
from batchprocessor_spark.sources.catalog import load_table, spread
from tests.conftest import SF_ORACLE


def _emb(spark):
    return spread(
        load_table(spark, SF_ORACLE, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    )


def test_kmeans_partitions_all_points(spark):
    assigned, centroids = kmeans_fit(_emb(spark), k=10, iters=3)
    assert len(centroids) == 10
    rows = assigned.groupBy("cid").count().collect()
    assert sum(r["count"] for r in rows) == 500
    assert all(r["count"] > 0 for r in rows)


def test_kmeans_deterministic(spark):
    a1, _ = kmeans_fit(_emb(spark), k=5, iters=2)
    a2, _ = kmeans_fit(_emb(spark), k=5, iters=2)
    assert sorted(map(tuple, a1.select("vec_id", "cid").collect())) == sorted(
        map(tuple, a2.select("vec_id", "cid").collect())
    )


def test_kmeans_inertia_decreases(spark):
    """Lloyd iterations must not increase total inertia."""
    emb = _emb(spark)

    def inertia(iters: int) -> float:
        assigned, centroids = kmeans_fit(emb, k=10, iters=iters)
        cdf = F.broadcast(
            emb.sparkSession.createDataFrame(
                [(i, c) for i, c in enumerate(centroids)], "cid INT, cv ARRAY<DOUBLE>"
            )
        )
        d = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return assigned.join(cdf, "cid").agg(F.sum(d)).collect()[0][0]

    assert inertia(4) <= inertia(1) + 1e-9
