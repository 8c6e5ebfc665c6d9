"""Window aggregation operators (batch semantics; streaming versions with
watermarks live in solarpos_spark/streaming/pipeline.py and share these
column expressions).

These are the CEP building blocks the north_rule mandates on top of the
reference (SURVEY.md §2.3 'absent from the reference'): tumbling, sliding,
and session windows. Batch and streaming use the identical F.window /
F.session_window expressions, so the batch oracles in __spark_entry__.py
pin the streaming semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(df: DataFrame, *, ts_col: str = "ts",
                    key_col: str = "event_type",
                    duration: str = "1 hour") -> DataFrame:
    """Tumbling window per key: count + sum(value)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            F.col(key_col),
            "n", "sum_value",
        )
    )


def sliding_counts(df: DataFrame, *, ts_col: str = "ts",
                   duration: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding window counts (each event lands in duration/slide windows)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start"), "n")
    )


def session_stats(df: DataFrame, *, ts_col: str = "ts",
                  key_col: str = "user_id",
                  gap: str = "30 minutes") -> DataFrame:
    """Session windows per key (gap-based), count + bounds.

    Session semantics: a session is [first_ts, last_ts + gap); an event at
    exactly last_ts + gap starts a new session.
    """
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col(key_col),
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )
