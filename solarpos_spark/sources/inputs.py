"""Input-mode DataFrame builders — the reference's four plan shapes.

Mirrors sealed ``InputMode`` + ``Main.createInputMode``
(/root/reference/src/main/java/net/e175/klaus/solarpos/InputMode.java:17-195):

* S1 coordinate range ``start:end:step`` (CoordinateRange.java:57-64)
* S2 time series from a partial date + step (util/DateTimeIterator.java:43-91)
* R1 lat x lon cartesian grid, lat-major order (InputMode.java:72-76)
* R2 time x coords cartesian (PositionCommand.java:117-135)
* S3/S4 coordinate / time file scans (util/DateTimeIterator.java:93-213)

Axis values are generated on the driver with *repeated addition* to match the
reference's FP accumulation exactly (CoordinateRange.java:63 iterates
``i -> i + step``); axes are tiny (<= 360/0.001 values) so driver-side
generation costs nothing and the grid itself is built distributed via
crossJoin of two broadcast-size DataFrames.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_COORD_STEP = 1e-3  # CoordinateRange.java:11,16-22
MIN_TIME_STEP = 1  # seconds; DurationConverter.java:37-42
MAX_TIME_STEP = 86400


def coordinate_values(start: float, end: float, step: float,
                      lo: float, hi: float) -> list[float]:
    """Inclusive arithmetic sequence with reference validation + FP semantics."""
    if not (lo <= start <= hi and lo <= end <= hi):
        raise ValueError(f"coordinate out of range [{lo}, {hi}]: {start}:{end}")
    if start > end:
        raise ValueError(f"range start {start} > end {end}")
    if step < MIN_COORD_STEP and start != end:
        raise ValueError(f"step {step} below minimum {MIN_COORD_STEP}")
    if start == end:
        return [start]
    count = int(round((end - start) / step)) + 1  # CoordinateRange.java:57-60
    vals = []
    v = start
    for _ in range(count):  # repeated addition, CoordinateRange.java:63
        vals.append(v)
        v = v + step
    return vals


def _local_df(spark: SparkSession, pdf) -> DataFrame:
    """Arrow-backed local relation: materializes as a JVM LocalTableScan, so
    no Python worker round-trip happens at execution time (a plain
    createDataFrame(list) scan re-enters Python per task)."""
    return spark.createDataFrame(pdf)


def coordinate_range_df(spark: SparkSession, start: float, end: float,
                        step: float, *, name: str, lo: float, hi: float) -> DataFrame:
    import pandas as pd

    vals = coordinate_values(start, end, step, lo, hi)
    return _local_df(spark, pd.DataFrame({name: pd.Series(vals, dtype="float64")}))


def grid_df(spark: SparkSession, lat_range: tuple[float, float, float],
            lon_range: tuple[float, float, float]) -> DataFrame:
    """R1: every lat crossed with every lon, lat-major order.

    The crossJoin of two driver-built axes is broadcast by Catalyst
    (BroadcastNestedLoopJoin); ``__ord`` columns reconstruct generation
    order deterministically under any parallelism (GeographicSweepTest.java:39-44).
    """
    import pandas as pd

    lats = coordinate_values(*lat_range, lo=-90.0, hi=90.0)
    lons = coordinate_values(*lon_range, lo=-180.0, hi=180.0)
    lat_df = _local_df(spark, pd.DataFrame({
        "lat_ord": pd.Series(range(len(lats)), dtype="int64"),
        "lat": pd.Series(lats, dtype="float64"),
    }))
    lon_df = _local_df(spark, pd.DataFrame({
        "lon_ord": pd.Series(range(len(lons)), dtype="int64"),
        "lon": pd.Series(lons, dtype="float64"),
    }))
    return lat_df.crossJoin(lon_df)


def _partial_date_bounds(year: int, month: int | None, day: int | None) -> tuple[int, int]:
    """[start, end) unix seconds for a year / year-month / date partial."""
    if month is None:
        s = datetime(year, 1, 1, tzinfo=timezone.utc)
        e = datetime(year + 1, 1, 1, tzinfo=timezone.utc)
    elif day is None:
        s = datetime(year, month, 1, tzinfo=timezone.utc)
        ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
        e = datetime(ny, nm, 1, tzinfo=timezone.utc)
    else:
        s = datetime(year, month, day, tzinfo=timezone.utc)
        e = datetime(year, month, day, tzinfo=timezone.utc)
        return int(s.timestamp()), int(e.timestamp()) + 86400
    return int(s.timestamp()), int(e.timestamp())


def time_series_df(
    spark: SparkSession,
    year: int,
    month: int | None = None,
    day: int | None = None,
    *,
    step_sec: int = 3600,
    offset_sec: int = 0,
) -> DataFrame:
    """S2: partitioned integer range -> timestamps, fully JVM-side.

    Partial date semantics per util/DateTimeIterator.java:68-91: start at
    local midnight, step until the period boundary (exclusive); a plain date
    with step >= 1 day yields the single midnight row.
    """
    if not (MIN_TIME_STEP <= step_sec <= MAX_TIME_STEP):
        raise ValueError(f"step {step_sec}s outside [{MIN_TIME_STEP}, {MAX_TIME_STEP}]")
    start_utc, end_utc = _partial_date_bounds(year, month, day)
    start = start_utc - offset_sec  # local midnight as UTC instant
    end = end_utc - offset_sec
    if day is not None and step_sec >= 86400:
        end = start + 1  # single midnight row
    n = (end - 1 - start) // step_sec + 1
    # spark.range is already distributed and the arithmetic is pure-integer
    # (exact — unlike the FP coordinate axes), so a partitioned range beats a
    # single-task sequence+explode and needs no repartition downstream.
    return (
        spark.range(n)
        .select((F.lit(start) + F.col("id") * step_sec).alias("unix_sec"))
        .select(
            F.timestamp_seconds(F.col("unix_sec")).alias("ts"),
            F.col("unix_sec"),
            F.lit(offset_sec).alias("offset_sec"),
        )
    )


def grid_times_df(grid: DataFrame, times: DataFrame,
                  parallelism: int | None = None) -> DataFrame:
    """R2: time x coords cartesian, time-major order (time outer loop,
    PositionCommand.java:117-135).

    Partitioning is the whole performance story here: timestamps are spread
    round-robin across tasks and the (small) grid is broadcast, so every
    partition holds *complete* coordinate sets for a few timestamps — the
    layout that lets the position UDF's per-timestamp hoisting amortize
    (one SPA time-dependent computation per ~grid_size rows, exactly like
    the reference's loop structure PositionCommand.java:115-122)."""
    if parallelism is None:
        # time_series_df is a partitioned range (contiguous timestamp runs
        # per partition — ideal for hoisting); no shuffle needed.
        return times.crossJoin(F.broadcast(grid))
    return times.repartition(parallelism).crossJoin(F.broadcast(grid))


def coords_from_text(spark: SparkSession, path: str) -> DataFrame:
    """S3: lines ``lat lon`` (space/comma separated), # comments + blanks
    skipped (util/DateTimeIterator.java:203-213)."""
    lines = spark.read.text(path)
    cleaned = (
        lines.select(F.trim(F.col("value")).alias("line"))
        .filter((F.col("line") != "") & ~F.col("line").startswith("#"))
        .select(F.split(F.col("line"), r"[,\s]+").alias("parts"))
    )
    return cleaned.select(
        F.element_at("parts", 1).cast("double").alias("lat"),
        F.element_at("parts", 2).cast("double").alias("lon"),
    )


def times_from_text(spark: SparkSession, path: str) -> DataFrame:
    """S4: one timestamp per line, multi-format fallback parse
    (util/DateTimeIterator.java:93-143)."""
    lines = spark.read.text(path)
    cleaned = (
        lines.select(F.trim(F.col("value")).alias("line"))
        .filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    )
    ts = F.coalesce(
        F.try_to_timestamp(F.col("line"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(F.col("line"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(F.col("line"), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(F.col("line"), F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(F.col("line"), F.lit("yyyy-MM-dd")),
    )
    return cleaned.select(ts.alias("ts"))


def paired_from_text(spark: SparkSession, path: str) -> DataFrame:
    """S5: lines ``lat lon datetime`` -> 1:1 records, no cartesian expansion
    (util/DateTimeIterator.java:150-190)."""
    lines = spark.read.text(path)
    cleaned = (
        lines.select(F.trim(F.col("value")).alias("line"))
        .filter((F.col("line") != "") & ~F.col("line").startswith("#"))
        .select(F.split(F.col("line"), r"[,\s]+").alias("p"))
    )
    ts = F.coalesce(
        F.try_to_timestamp(F.element_at("p", 3), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(F.element_at("p", 3), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )
    return cleaned.select(
        F.element_at("p", 1).cast("double").alias("lat"),
        F.element_at("p", 2).cast("double").alias("lon"),
        ts.alias("ts"),
    )


def validate_decoded(df: DataFrame, *, strict: bool = True) -> DataFrame:
    """R7 data-path validation: reference domain rules applied to decoded
    records (CoordinateRange.java:70-96, PositionCommand.java:301-313).

    ``strict=True`` mirrors the reference's abort-on-violation: any bad row
    raises at execution time (F.raise_error inside a when-guard, JVM-side).
    ``strict=False`` filters violations out instead (pipeline mode).
    """
    ok = (
        F.col("lat").between(-90.0, 90.0)
        & F.col("lon").between(-180.0, 180.0)
        & (F.col("pressure").isNull() | F.col("pressure").between(0.1, 2000.0))
        & (F.col("temperature").isNull()
           | F.col("temperature").between(-100.0, 100.0))
    )
    if not strict:
        return df.filter(ok)
    guard = F.when(
        ok, F.lit(True)
    ).otherwise(
        F.raise_error(F.format_string(
            "record out of range: lat=%s lon=%s pressure=%s temperature=%s",
            F.col("lat"), F.col("lon"), F.col("pressure"), F.col("temperature")))
    )
    return df.filter(guard)
