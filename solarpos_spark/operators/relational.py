"""Relational breadth operators Spark lacks as primitives: as-of join and
binned interval (range) join.

Neither exists in the reference (its dataflow is map-only,
PositionCommand.java:115-122); they are the standard constructions a
large-scale training-data/event pipeline needs, built so the plan survives
100 TB:

* :func:`asof_join` — the distributed as-of (nearest-earlier match) as ONE
  shuffle: union the tagged streams and take a running ``last(...,
  ignorenulls)`` window, instead of a per-row range probe or a cartesian.
  This is the classic kdb/pandas ``merge_asof`` semantics expressed in
  whole-stage-codegen window form.
* :func:`interval_match_ids` — interval containment via bucketed equi-join:
  explode each interval into the fixed-width time bins it covers, equi-join
  probe rows on (key, bin), then refine with the exact bounds. Candidate
  fan-out is O(interval_len / bin) per interval — never all-pairs, no
  BroadcastNestedLoopJoin.

Skew note (100 TB): both shuffle on the `by`/key columns; a pathologically
hot key (one user with 10^9 events) is handled upstream with the salted
partitioning in plans/partitioning.py — the window in asof_join is
order-dependent so salt only by coarse time ranges per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_tag"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = (),
    values: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join: for every probe row, attach the
    ``values`` columns of the latest build row with ``build.on <= probe.on``
    within the same ``by`` group (pandas ``merge_asof(direction="backward",
    allow_exact_matches=True)`` semantics; DuckDB ``ASOF LEFT JOIN ... ON
    probe.on >= build.on``).

    Construction: tag build rows 0 and probe rows 1, union, and take a
    running ``last(value, ignorenulls=True)`` ordered by ``(on, tag)`` —
    the tag ordering makes equal timestamps match (inclusive). One shuffle
    on ``by``; no range probe, no join explosion. The matched build
    timestamp comes back as ``{on}{suffix}``.
    """
    by = list(by)
    values = list(values)
    b = build.select(
        *by,
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(v).alias(f"{v}{suffix}") for v in values],
    ).withColumn(_TAG, F.lit(0))
    p = probe.withColumn(_TAG, F.lit(1)).withColumn(
        f"{on}{suffix}", F.col(on))
    # unionByName fills each side's missing columns with nulls; build rows
    # then carry null probe columns and vice versa
    u = p.unionByName(
        b.withColumn(on, F.col(f"{on}{suffix}")),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_on = F.last(
        F.when(F.col(_TAG) == 0, F.col(f"{on}{suffix}")), ignorenulls=True
    ).over(w)
    out = u
    for v in values:
        out = out.withColumn(
            f"{v}{suffix}",
            F.last(F.when(F.col(_TAG) == 0, F.col(f"{v}{suffix}")),
                   ignorenulls=True).over(w),
        )
    out = out.withColumn(f"{on}{suffix}", matched_on)
    return out.filter(F.col(_TAG) == 1).drop(_TAG)


def interval_match_ids(
    probe: DataFrame,
    intervals: DataFrame,
    *,
    probe_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    by: Sequence[str] = (),
    id_cols: Sequence[str] = ("event_id",),
    bin_micros: int = 600_000_000,
) -> DataFrame:
    """IDs of probe rows contained in >=1 interval: ``start <= ts < end``
    within the same ``by`` group — the binned range-join construction.

    Each interval explodes into the fixed-width bins it covers
    (``ceil(len/bin)+1`` rows, typically 1-2), probes equi-join on
    ``(by, bin)``, the exact bounds refine, and overlapping intervals
    dedup through ``distinct()`` on the id columns. All shuffles are keyed
    equi-joins: no inequality-join cartesian anywhere in the plan.
    """
    by = list(by)
    id_cols = list(id_cols)
    bin_micros = int(bin_micros)
    iv = intervals.select(
        *by,
        F.unix_micros(F.col(start_ts).cast("timestamp")).alias("_s_us"),
        F.unix_micros(F.col(end_ts).cast("timestamp")).alias("_e_us"),
    )
    # integer `div`, not float `/`: micros near 2^50 lose ulps in a double
    # and a boundary bin id must be exact
    binned = iv.select(
        *by,
        "_s_us",
        "_e_us",
        F.explode(
            F.sequence(
                F.expr(f"_s_us div {bin_micros}"),
                # end-exclusive: the last contained microsecond is e-1
                F.expr(f"(_e_us - 1) div {bin_micros}"),
            )
        ).alias("_bin"),
    )
    p = probe.select(
        *by, *id_cols, F.unix_micros(F.col(probe_ts).cast("timestamp")).alias("_p_us")
    ).withColumn("_bin", F.expr(f"_p_us div {bin_micros}"))
    cand = p.join(binned, on=by + ["_bin"]).filter(
        (F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") < F.col("_e_us"))
    )
    return cand.select(*by, *id_cols).distinct()
