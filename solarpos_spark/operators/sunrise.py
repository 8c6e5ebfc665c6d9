"""Sunrise/transit/set operator — Arrow-vectorized pandas UDF.

Spark-side equivalent of the reference's sunrise command
(/root/reference/src/main/java/net/e175/klaus/solarpos/SunriseCommand.java):
day-resolution solver (fixed 1-day step, SunriseCommand.java:84), type
classification NORMAL|ALL_DAY|ALL_NIGHT with nullable event times
(SunriseCommand.java:176-196), optional civil/nautical/astronomical
twilights (--twilight, SunriseCommand.java:143-155).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from ..kernels import sunrise as k
from .position import resolve_delta_t

_TYPE_NAMES = np.array(["NORMAL", "ALL_DAY", "ALL_NIGHT"])

_BASIC_FIELDS = [
    StructField("type", StringType()),
    StructField("transit", LongType()),
    StructField("sunrise", LongType()),
    StructField("sunset", LongType()),
    # deltaT actually used (estimate resolved from the NaN sentinel, like
    # the reference's PositionData.deltaT echo — Main.java:214-216)
    StructField("delta_t_res", DoubleType()),
]
_TWILIGHT_FIELDS = _BASIC_FIELDS + [
    StructField(n, LongType())
    for n in ("civil_start", "civil_end", "nautical_start", "nautical_end",
              "astronomical_start", "astronomical_end")
]
_BASIC_SCHEMA = StructType(_BASIC_FIELDS)
_TWILIGHT_SCHEMA = StructType(_TWILIGHT_FIELDS)


def _nullable_seconds(day0: np.ndarray, sec: np.ndarray) -> pd.arrays.IntegerArray:
    """day0 + seconds-of-day -> nullable int64 unix seconds (truncated,
    matching the reference's second-resolution output TimeFormats.java:21)."""
    mask = np.isnan(sec)
    vals = (day0 + np.floor(np.where(mask, 0.0, sec))).astype(np.int64)
    return pd.arrays.IntegerArray(vals, mask)


def _solve(day0_unix: np.ndarray, lat: np.ndarray, lon: np.ndarray,
           delta_t: np.ndarray, twilight: bool) -> pd.DataFrame:
    horizons = [k.HORIZON_SUNRISE_SUNSET]
    if twilight:
        horizons += [k.HORIZON_CIVIL, k.HORIZON_NAUTICAL, k.HORIZON_ASTRONOMICAL]
    r = k.sunrise_transit_set(day0_unix.astype(np.float64), lat, lon, delta_t,
                              np.array(horizons))
    out = pd.DataFrame({
        "type": _TYPE_NAMES[r.kind[:, 0]],
        "transit": pd.array((day0_unix + np.floor(r.transit)).astype(np.int64),
                            dtype="Int64"),
        "sunrise": _nullable_seconds(day0_unix, r.sunrise[:, 0]),
        "sunset": _nullable_seconds(day0_unix, r.sunset[:, 0]),
        "delta_t_res": delta_t,
    })
    if twilight:
        for j, name in ((1, "civil"), (2, "nautical"), (3, "astronomical")):
            out[f"{name}_start"] = _nullable_seconds(day0_unix, r.sunrise[:, j])
            out[f"{name}_end"] = _nullable_seconds(day0_unix, r.sunset[:, j])
    return out


@pandas_udf(_BASIC_SCHEMA)
def sunrise_udf(day0: pd.Series, lat: pd.Series, lon: pd.Series,
                delta_t: pd.Series) -> pd.DataFrame:
    d0 = day0.to_numpy(dtype=np.int64)
    dt = resolve_delta_t(d0, delta_t.to_numpy(dtype=np.float64))
    return _solve(d0, lat.to_numpy(np.float64), lon.to_numpy(np.float64), dt, False)


@pandas_udf(_TWILIGHT_SCHEMA)
def sunrise_twilight_udf(day0: pd.Series, lat: pd.Series, lon: pd.Series,
                         delta_t: pd.Series) -> pd.DataFrame:
    d0 = day0.to_numpy(dtype=np.int64)
    dt = resolve_delta_t(d0, delta_t.to_numpy(dtype=np.float64))
    return _solve(d0, lat.to_numpy(np.float64), lon.to_numpy(np.float64), dt, True)


def sunrise(
    df: DataFrame,
    *,
    twilight: bool = False,
    show_inputs: bool | None = None,
    ts_col: str = "ts",
    time_is_unix: bool = False,
    offset_col: str | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Sunrise operator. The input instant is resolved to its local calendar
    date (via ``offset_col`` seconds if given, else UTC), mirroring the
    reference's zone handling (util/DateTimeIterator.java:59-63).

    Accepts an InputPlan like :func:`position`; ``show_inputs=None`` then
    applies the reference's auto rule (Main.java:137-141)."""
    from ..sources.inputs import InputPlan

    if isinstance(df, InputPlan):
        if show_inputs is None:
            show_inputs = df.show_inputs
        df = df.df
    if show_inputs is None:
        show_inputs = True
    cols = dict.fromkeys(df.columns)
    get = lambda name, default: (F.col(name) if name in cols else F.lit(default))
    unix = F.col(ts_col).cast("long") if time_is_unix else F.unix_timestamp(F.col(ts_col))
    off = F.col(offset_col).cast("long") if offset_col and offset_col in cols else F.lit(0)
    # anchor = the INSTANT of the local date's midnight (wall midnight minus
    # the zone offset), not 0h UT of that date: the reference's library runs
    # A.2 from the zoned midnight instant, which shifts late events (astro
    # dusk) by ~0.1 s — derived by bisecting SunriseTest.java:57-64 goldens
    # (all 13 match only with this anchor; see kernels/sunrise.py docstring)
    day0 = (F.floor((unix + off) / 86400) * 86400 - off).cast("long")

    udf = sunrise_twilight_udf if twilight else sunrise_udf
    res = udf(day0, F.col("lat").cast("double"), F.col("lon").cast("double"),
              get("delta_t", 0.0).cast("double"))
    out = df.withColumn("__sr", res)

    # field set + ordering = SunriseCommand.getFieldNames
    # (SunriseCommand.java:134-160): inputs only when shown, type always,
    # twilight events in chronological order around sunrise/transit/sunset
    proj = []
    if show_inputs:
        proj += [
            F.col("lat").alias("latitude"), F.col("lon").alias("longitude"),
            (F.timestamp_seconds(unix) if time_is_unix
             else F.col(ts_col)).alias("dateTime"),
            F.col("__sr.delta_t_res").alias("deltaT"),
        ]
    proj.append(F.col("__sr.type").alias("type"))
    event_order = (
        ("astronomical_start", "nautical_start", "civil_start", "sunrise",
         "transit", "sunset", "civil_end", "nautical_end", "astronomical_end")
        if twilight else ("sunrise", "transit", "sunset"))
    for name in event_order:
        proj.append(F.timestamp_seconds(F.col(f"__sr.{name}")).alias(name))
    keep = (passthrough if passthrough is not None
            else [c for c in ("doc_id", "seq_index") if c in cols])
    return out.select(*[F.col(c) for c in keep], *proj)
