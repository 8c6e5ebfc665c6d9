"""Geohash cell + salted repartitioning tests (skew handling, SURVEY §4.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpos_spark.plans.partitioning import (
    geohash_cell,
    per_cell_counts,
    salted_repartition_by_cell,
)


def test_cell_id_locality_and_range(spark):
    df = spark.createDataFrame(
        [(52.00, 13.00), (52.001, 13.001), (-33.9, 151.2), (90.0, 180.0),
         (-90.0, -180.0)],
        "lat double, lon double",
    )
    rows = df.select("lat", "lon",
                     geohash_cell(F.col("lat"), F.col("lon")).alias("cell")
                     ).collect()
    cells = {(r["lat"], r["lon"]): r["cell"] for r in rows}
    n_bits = 24
    assert all(0 <= c < (1 << n_bits) for c in cells.values())
    # near points share a cell; far points don't
    assert cells[(52.00, 13.00)] == cells[(52.001, 13.001)]
    assert cells[(52.00, 13.00)] != cells[(-33.9, 151.2)]


def test_salted_repartition_spreads_hot_cell(spark):
    # 10k rows all in ONE cell (hot key) + distinct salt source
    hot = spark.range(10000).select(
        F.lit(52.0).alias("lat"), F.lit(13.0).alias("lon"),
        F.col("id").cast("string").alias("doc_id"))
    parted = salted_repartition_by_cell(hot, num_partitions=8, salt_buckets=8)
    sizes = (parted.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    non_empty = [r["count"] for r in sizes if r["count"] > 0]
    # without salting everything lands in one partition; with it, >= 4 get work
    assert len(non_empty) >= 4
    assert max(non_empty) < 10000


def test_per_cell_counts_two_phase(spark):
    df = spark.createDataFrame(
        [(52.0, 13.0)] * 5 + [(10.0, 10.0)] * 3,
        "lat double, lon double")
    out = {r["cell"]: r["n_rows"] for r in per_cell_counts(df).collect()}
    assert sorted(out.values()) == [3, 5]
