"""Spatial partitioning & skew handling (SURVEY.md §4 item 1 / north_rule).

Dense coordinate grids make some spatial cells arbitrarily hot (every row of
a 21x21 sweep shares a handful of cells). The standard remedies, all pure
JVM expressions:

* ``geohash_cell`` — interleaved-bit (Z-order) cell id at a given precision;
  rows in the same cell co-locate, preserving spatial locality for
  downstream per-cell aggregation.
* ``salted_repartition_by_cell`` — cell id + a per-row salt bounded by
  ``salt_buckets`` splits hot cells across that many partitions; downstream
  per-cell aggregations do a two-phase combine (partial per salted key,
  final per cell), which AQE's skew handling complements at join time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def geohash_cell(lat: Column, lon: Column, precision_bits: int = 12) -> Column:
    """Z-order (Morton) cell id from quantized lat/lon, JVM-side.

    ``precision_bits`` bits per axis (12 -> 4096x4096 global grid ~ 10 km).
    Interleaving keeps spatially-near cells numerically near, so range scans
    over cell id are spatial range scans.
    """
    lat_q = F.least(
        F.lit((1 << precision_bits) - 1),
        F.floor((lat + 90.0) / 180.0 * (1 << precision_bits)).cast("long"),
    )
    lon_q = F.least(
        F.lit((1 << precision_bits) - 1),
        F.floor((lon + 180.0) / 360.0 * (1 << precision_bits)).cast("long"),
    )
    cell = F.lit(0).cast("long")
    for b in range(precision_bits):
        cell = cell.bitwiseOR(
            F.shiftleft(F.shiftright(lat_q, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(lon_q, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return cell


def salted_repartition_by_cell(
    df: DataFrame,
    *,
    num_partitions: int,
    precision_bits: int = 12,
    salt_buckets: int = 8,
    lat_col: str = "lat",
    lon_col: str = "lon",
    salt_col: str = "doc_id",
) -> DataFrame:
    """Repartition by (geohash cell, salt) — hot cells spread over
    ``salt_buckets`` partitions while cold cells stay co-located.

    The salt is a deterministic hash of ``salt_col`` (falls back to a
    monotonic row component when absent), so the layout is reproducible.
    """
    cell = geohash_cell(F.col(lat_col), F.col(lon_col), precision_bits)
    salt_src = F.col(salt_col) if salt_col in df.columns else F.monotonically_increasing_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets))
    return (
        df.withColumn("__cell", cell)
        .withColumn("__salt", salt)
        .repartition(num_partitions, F.col("__cell"), F.col("__salt"))
        .drop("__salt")
    )


def per_cell_counts(df: DataFrame, *, precision_bits: int = 12,
                    lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Spatial density aggregation over geohash cells (two-phase under a
    salted layout: Catalyst's partial aggregation does the combine)."""
    return (
        df.groupBy(geohash_cell(F.col(lat_col), F.col(lon_col),
                                precision_bits).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
