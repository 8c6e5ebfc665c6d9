"""As-of join + binned interval join semantics (operators/relational.py).

Oracle parity for the gate entries runs through tools/check_correctness.py;
these tests pin the operator-level edge semantics: inclusivity, no-match
nulls, group isolation, bin-boundary exactness, overlap dedup.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from solarpos_spark.operators.relational import asof_join, interval_match_ids


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_backward_inclusive_match(self, spark):
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1, 1, 1], "ts": [_ts("2024-01-01T10:00"),
                                   _ts("2024-01-01T11:00"),
                                   _ts("2024-01-01T12:30")],
            "pid": [0, 1, 2]}))
        build = spark.createDataFrame(pd.DataFrame({
            "k": [1, 1], "ts": [_ts("2024-01-01T11:00"),
                                _ts("2024-01-01T12:00")],
            "v": [10.0, 20.0]}))
        out = {r["pid"]: (r["ts_asof"], r["v_asof"])
               for r in asof_join(probe, build, on="ts", by=["k"],
                                  values=["v"]).collect()}
        assert out[0] == (None, None)  # before any build row
        # equal timestamps match (inclusive, allow_exact_matches=True)
        assert out[1] == (_ts("2024-01-01T11:00"), 10.0)
        assert out[2] == (_ts("2024-01-01T12:00"), 20.0)

    def test_groups_do_not_leak(self, spark):
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1, 2], "ts": [_ts("2024-01-01T12:00")] * 2,
            "pid": [0, 1]}))
        build = spark.createDataFrame(pd.DataFrame({
            "k": [1], "ts": [_ts("2024-01-01T11:00")], "v": [1.0]}))
        out = {r["pid"]: r["v_asof"]
               for r in asof_join(probe, build, on="ts", by=["k"],
                                  values=["v"]).collect()}
        assert out[0] == 1.0 and out[1] is None

    def test_probe_count_preserved(self, spark):
        probe = spark.range(100).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("ts"),
            F.col("id").alias("pid"))
        build = spark.range(10).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(1700000000 + F.col("id") * 600).alias("ts"),
            F.col("id").cast("double").alias("v"))
        assert asof_join(probe, build, on="ts", by=["k"],
                         values=["v"]).count() == 100


class TestIntervalMatch:
    def test_boundaries_inclusive_exclusive(self, spark):
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1, 1, 1, 1],
            "ts": [_ts("2024-01-01T10:00:00"),   # == start -> in
                   _ts("2024-01-01T10:09:59.999999"),  # last us -> in
                   _ts("2024-01-01T10:10:00"),   # == end -> out
                   _ts("2024-01-01T09:59:59.999999")],  # before -> out
            "event_id": [0, 1, 2, 3]}))
        iv = spark.createDataFrame(pd.DataFrame({
            "k": [1], "start_ts": [_ts("2024-01-01T10:00:00")],
            "end_ts": [_ts("2024-01-01T10:10:00")]}))
        ids = sorted(r["event_id"] for r in interval_match_ids(
            probe, iv, probe_ts="ts", by=["k"]).collect())
        assert ids == [0, 1]

    def test_overlapping_intervals_dedup(self, spark):
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1], "ts": [_ts("2024-01-01T10:05:00")], "event_id": [7]}))
        iv = spark.createDataFrame(pd.DataFrame({
            "k": [1, 1],
            "start_ts": [_ts("2024-01-01T10:00:00"),
                         _ts("2024-01-01T10:04:00")],
            "end_ts": [_ts("2024-01-01T10:10:00"),
                       _ts("2024-01-01T10:14:00")]}))
        rows = interval_match_ids(probe, iv, probe_ts="ts",
                                  by=["k"]).collect()
        assert len(rows) == 1 and rows[0]["event_id"] == 7

    def test_interval_spanning_many_bins(self, spark):
        # 1-hour interval with 10-min bins -> 6-7 exploded bins, still one
        # logical match per contained probe row
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1, 1], "ts": [_ts("2024-01-01T10:31:00"),
                                _ts("2024-01-01T11:31:00")],
            "event_id": [0, 1]}))
        iv = spark.createDataFrame(pd.DataFrame({
            "k": [1], "start_ts": [_ts("2024-01-01T10:00:00")],
            "end_ts": [_ts("2024-01-01T11:00:00")]}))
        ids = sorted(r["event_id"] for r in interval_match_ids(
            probe, iv, probe_ts="ts", by=["k"]).collect())
        assert ids == [0]


class TestAsofVsPandas:
    def test_random_matches_pandas_merge_asof(self, spark):
        """Independent oracle: pandas merge_asof(direction='backward',
        allow_exact_matches=True) on random keyed data with engineered
        probe==build timestamp ties."""
        import numpy as np

        rng = np.random.default_rng(11)
        n_p, n_b = 400, 120
        base = 1_700_000_000
        probe = pd.DataFrame({
            "k": rng.integers(0, 6, n_p),
            "ts": pd.to_datetime(
                base + rng.integers(0, 100_000, n_p), unit="s"),
            "pid": np.arange(n_p)})
        build = pd.DataFrame({
            "k": rng.integers(0, 6, n_b),
            "ts": pd.to_datetime(
                np.concatenate([
                    base + rng.integers(0, 100_000, n_b - 40),
                    # exact-tie timestamps copied from probe rows
                    probe["ts"].astype("int64")[:40] // 10**9,
                ]).astype("int64"), unit="s"),
            "v": rng.normal(size=n_b).round(6)})
        build = build.drop_duplicates(["k", "ts"])  # unique per (k, ts)

        got = (asof_join(spark.createDataFrame(probe),
                         spark.createDataFrame(build),
                         on="ts", by=["k"], values=["v"])
               .select("pid", "v_asof").toPandas()
               .sort_values("pid").reset_index(drop=True))
        want = pd.merge_asof(
            probe.sort_values("ts"), build.sort_values("ts"),
            on="ts", by="k", direction="backward",
            allow_exact_matches=True).sort_values("pid").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["v_asof"], want["v"], check_names=False)


class TestIntervalVsBruteForce:
    def test_random_matches_nested_loop(self, spark):
        """Independent oracle: per-key nested-loop containment in pandas,
        random intervals engineered to overlap and straddle bin edges."""
        import numpy as np

        rng = np.random.default_rng(23)
        n_e, n_iv = 500, 60
        base_us = 1_700_000_000_000_000
        ev = pd.DataFrame({
            "k": rng.integers(0, 4, n_e),
            "ts": pd.to_datetime(
                base_us + rng.integers(0, 3_600_000_000, n_e), unit="us"),
            "event_id": np.arange(n_e)})
        start = base_us + rng.integers(0, 3_600_000_000, n_iv)
        length = rng.integers(1, 1_200_000_000, n_iv)  # up to 20 min
        iv = pd.DataFrame({
            "k": rng.integers(0, 4, n_iv),
            "start_ts": pd.to_datetime(start, unit="us"),
            "end_ts": pd.to_datetime(start + length, unit="us")})

        got = sorted(r["event_id"] for r in interval_match_ids(
            spark.createDataFrame(ev), spark.createDataFrame(iv),
            probe_ts="ts", by=["k"]).collect())

        want = []
        for _, e in ev.iterrows():
            m = iv[(iv["k"] == e["k"]) & (iv["start_ts"] <= e["ts"])
                   & (e["ts"] < iv["end_ts"])]
            if len(m):
                want.append(int(e["event_id"]))
        assert got == sorted(want)


class TestMatchedRowNullCarry:
    def test_null_value_of_matched_row_is_carried(self, spark):
        # merge_asof/ASOF JOIN semantics: all attached columns come from the
        # single matched (latest) build row — its NULL must NOT be skipped
        # in favor of an older row's non-NULL value.
        probe = spark.createDataFrame(pd.DataFrame({
            "k": [1], "ts": [_ts("2024-01-01T12:00")], "pid": [0]}))
        build = spark.createDataFrame(
            [(1, _ts("2024-01-01T11:00"), 1.0),
             (1, _ts("2024-01-01T11:30"), None)],
            "k int, ts timestamp, v double")
        r = asof_join(probe, build, on="ts", by=["k"],
                      values=["v"]).collect()[0]
        assert r["ts_asof"] == _ts("2024-01-01T11:30")
        assert r["v_asof"] is None


class TestSkewGuards:
    def _digest(self, df, cols):
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
        ).collect()[0]

    def test_salted_asof_identical_on_hot_key_and_bounded(self, spark):
        # one pathologically hot key: 10^6 probe rows, single user
        n = 1_000_000
        bucket_us = 3_600_000_000  # 1 h
        probe = spark.range(n).select(
            F.lit(7).alias("k"),
            F.timestamp_seconds(1700000000 + F.col("id") * 3).alias("ts"),
            F.col("id").alias("pid"))
        build = spark.range(10_000).select(
            F.lit(7).alias("k"),
            F.timestamp_seconds(1700000000 - 50 + F.col("id") * 301)
            .alias("ts"),
            (F.col("id") * 1.5).alias("v"))
        base = asof_join(probe, build, on="ts", by=["k"], values=["v"])
        salted = asof_join(probe, build, on="ts", by=["k"], values=["v"],
                           bucket_micros=bucket_us)
        cols = ["pid", "ts_asof", "v_asof"]
        assert self._digest(base, cols) == self._digest(salted, cols)
        # the salt bounds any window partition to one key x one time bucket
        mx = (probe.groupBy("k", F.expr(f"unix_micros(ts) div {bucket_us}"))
              .count().agg(F.max("count")).collect()[0][0])
        assert mx < n // 100  # 1200 per bucket vs 10^6 unsalted

    def test_salted_interval_identical(self, spark):
        import numpy as np
        rng = np.random.default_rng(11)
        n_e, n_iv = 20_000, 300
        base_us = 1_700_000_000_000_000
        ev = spark.createDataFrame(pd.DataFrame({
            "k": rng.integers(0, 3, n_e),
            "ts": pd.to_datetime(
                base_us + rng.integers(0, 3_600_000_000, n_e), unit="us"),
            "event_id": np.arange(n_e)}))
        start = base_us + rng.integers(0, 3_600_000_000, n_iv)
        iv = spark.createDataFrame(pd.DataFrame({
            "k": rng.integers(0, 3, n_iv),
            "start_ts": pd.to_datetime(start, unit="us"),
            "end_ts": pd.to_datetime(
                start + rng.integers(1, 1_200_000_000, n_iv), unit="us")}))
        plain = interval_match_ids(ev, iv, probe_ts="ts", by=["k"])
        salted = interval_match_ids(ev, iv, probe_ts="ts", by=["k"],
                                    n_salt=4)
        got_p = sorted(r["event_id"] for r in plain.collect())
        got_s = sorted(r["event_id"] for r in salted.collect())
        assert got_p == got_s and len(got_p) > 0


class TestSequencePattern:
    def test_first_match_within_window(self, spark):
        from datetime import datetime, timedelta

        from solarpos_spark.operators.relational import sequence_pattern

        t0 = datetime(2024, 3, 1, 12, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            # user 1: error -> first purchase at +300s (second at +400s
            # must NOT be reported); a later error whose only purchase is
            # beyond the 600 s window
            (1, 10, "error", t0),
            (1, 11, "view", t0 + 10 * s),
            (1, 12, "purchase", t0 + 300 * s),
            (1, 13, "purchase", t0 + 400 * s),
            (1, 14, "error", t0 + 1000 * s),
            (1, 15, "purchase", t0 + 1700 * s),
            # user 2: purchase BEFORE the error only -> no match
            (2, 20, "purchase", t0),
            (2, 21, "error", t0 + 5 * s),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp")
        out = {(r["user_id"], r["a_event_id"]): r for r in sequence_pattern(
            df, first_type="error", then_type="purchase",
            within_seconds=600).collect()}
        assert set(out) == {(1, 10)}
        assert out[(1, 10)]["b_event_id"] == 12
        assert out[(1, 10)]["gap_usec"] == 300 * 1_000_000

    def test_simultaneous_tiebreak_by_id(self, spark):
        from datetime import datetime

        from solarpos_spark.operators.relational import sequence_pattern

        t0 = datetime(2024, 3, 1, 12, 0, 0)
        rows = [(1, 5, "error", t0),
                (1, 3, "purchase", t0),    # same ts, LOWER id: before A
                (1, 8, "purchase", t0),    # same ts, higher id: after A
                (1, 9, "purchase", t0)]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp")
        out = sequence_pattern(df, first_type="error", then_type="purchase",
                               within_seconds=60).collect()
        assert len(out) == 1
        assert out[0]["b_event_id"] == 8 and out[0]["gap_usec"] == 0


class TestSequencePatternAbsent:
    def _df(self, spark):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 3, 1, 12, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            (1, 10, "error", t0),                  # matched at +300s
            (1, 12, "purchase", t0 + 300 * s),
            (1, 14, "error", t0 + 1000 * s),       # late B at +700s
            (1, 15, "purchase", t0 + 1700 * s),
            (2, 21, "error", t0),                  # no B ever after
            (2, 20, "purchase", t0 - 5 * s),       # B strictly before
        ]
        return spark.createDataFrame(
            rows,
            "user_id long, event_id long, event_type string, ts timestamp")

    def test_late_vs_never_and_complement(self, spark):
        """Absence reports exactly the A rows sequence_pattern misses —
        the two operators PARTITION the A set — and distinguishes a late
        B (gap reported) from no B at all (nulls)."""
        from solarpos_spark.operators.relational import (sequence_pattern,
                                                         sequence_pattern_absent)

        df = self._df(spark)
        kw = dict(first_type="error", then_type="purchase",
                  within_seconds=600)
        absent = {(r["user_id"], r["a_event_id"]): r
                  for r in sequence_pattern_absent(df, **kw).collect()}
        assert set(absent) == {(1, 14), (2, 21)}
        assert absent[(1, 14)]["late_b_event_id"] == 15
        assert absent[(1, 14)]["late_gap_usec"] == 700 * 1_000_000
        assert absent[(2, 21)]["late_b_event_id"] is None
        assert absent[(2, 21)]["late_gap_usec"] is None
        matched = {(r["user_id"], r["a_event_id"])
                   for r in sequence_pattern(df, **kw).collect()}
        a_rows = {(r["user_id"], r["event_id"])
                  for r in df.filter("event_type = 'error'").collect()}
        assert matched | set(absent) == a_rows
        assert matched & set(absent) == set()


class TestGlobalRowNumber:
    def test_matches_row_number_and_partition_invariant(self, spark):
        from solarpos_spark.operators.relational import global_row_number

        rows = [(i, (i * 37) % 101, f"p{i}") for i in range(500)]
        df = spark.createDataFrame(rows, "id long, v long, payload string")
        out = global_row_number(df, ["v", "id"]).collect()
        want = {r[0]: i for i, r in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0])))}
        got = {r.id: r.row_idx for r in out}
        assert got == want
        assert {r.payload for r in out} == {r[2] for r in rows}
        again = {r.id: r.row_idx for r in global_row_number(
            df.repartition(13), ["v", "id"]).collect()}
        assert again == got

    def test_constant_leading_column_degenerates_safely(self, spark):
        """All rows share one value -> one bin (width guard); still the
        exact row_number, just without bin parallelism."""
        from solarpos_spark.operators.relational import global_row_number

        df = spark.createDataFrame(
            [(i, 7) for i in range(50)], "id long, v long")
        got = {r.id: r.row_idx for r in
               global_row_number(df, ["v", "id"]).collect()}
        assert got == {i: i for i in range(50)}

    def test_no_single_partition_exchange(self, spark):
        """The whole point: the plan must never collapse to a global
        sort — no SinglePartition exchange anywhere."""
        from solarpos_spark.operators.relational import global_row_number

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") * 31 % 997).alias("v"))
        plan = global_row_number(df, ["v", "id"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


SF = "/root/testdata/sf0.001"


class TestSequencePatternChain:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp")

    def test_committed_no_backtracking(self, spark):
        """The chain commits to the FIRST successor at each step: if
        that row has no onward match, the chain fails — it must not
        backtrack to a later successor that would have completed."""
        from datetime import datetime, timedelta

        from solarpos_spark.operators.relational import (
            sequence_pattern_chain)

        t0 = datetime(2024, 7, 4, 8, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            (0, 1, "view", t0), (1, 1, "click", t0 + 10 * s),
            (2, 1, "click", t0 + 100 * s),
            (3, 1, "purchase", t0 + 200 * s),
        ]
        out = sequence_pattern_chain(
            self._ev(spark, rows), ["view", "click", "purchase"],
            within_seconds=120).collect()
        assert out == []  # click@10 committed, its purchase is 190s away

    def test_chain_and_gap(self, spark):
        from datetime import datetime, timedelta

        from solarpos_spark.operators.relational import (
            sequence_pattern_chain)

        t0 = datetime(2024, 7, 4, 8, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            (0, 1, "view", t0), (1, 1, "click", t0 + 30 * s),
            (2, 1, "purchase", t0 + 70 * s),
            (3, 1, "click", t0 + 90 * s),  # later click ignored
        ]
        out = sequence_pattern_chain(
            self._ev(spark, rows), ["view", "click", "purchase"],
            within_seconds=120).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["step1_id"], r["step2_id"], r["step3_id"]) == (0, 1, 2)
        assert r["gap_usec"] == 70_000_000

    def test_2step_equals_sequence_pattern(self, spark):
        from solarpos_spark.operators.relational import (
            sequence_pattern, sequence_pattern_chain)

        ev = spark.read.parquet(f"{SF}/events.parquet")
        a = sorted(map(tuple, sequence_pattern_chain(
            ev, ["error", "purchase"], within_seconds=600).collect()))
        b = sorted(map(tuple, sequence_pattern(
            ev, first_type="error", then_type="purchase",
            within_seconds=600).collect()))
        assert a == b and len(a) > 0

    def test_single_exchange_plan(self, spark):
        """k-1 window passes must share ONE exchange + ONE sort."""
        from solarpos_spark.operators.relational import (
            sequence_pattern_chain)

        ev = spark.read.parquet(f"{SF}/events.parquet")
        plan = sequence_pattern_chain(
            ev, ["view", "click", "purchase"], within_seconds=86400
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Window") == 2


class TestHistogramQuantiles:
    def test_within_one_bin_of_exact(self, spark):
        from solarpos_spark.operators.relational import histogram_quantiles

        df = spark.range(10000).select(
            (F.col("id") % 1000).cast("double").alias("v"))
        out = {r.q: r for r in histogram_quantiles(
            df, "v", qs=(0.5, 0.9, 0.99), n_bins=100).collect()}
        width = 999.0 / 100
        for q, exact in [(0.5, 499.0), (0.9, 899.0), (0.99, 989.0)]:
            r = out[q]
            assert r.bin_lo - 1e-9 <= exact <= r.bin_hi + 1e-9
            assert abs(r.est_value - exact) <= width
            assert r.n_below <= q * 10000 <= r.n_below + 110

    def test_deterministic_under_repartition(self, spark):
        from solarpos_spark.operators.relational import histogram_quantiles

        df = spark.range(5000).select(
            ((F.col("id") * 37) % 991).cast("double").alias("v"))
        a = sorted(map(tuple, histogram_quantiles(df, "v").collect()))
        b = sorted(map(tuple, histogram_quantiles(
            df.repartition(13), "v").collect()))
        assert a == b

    def test_constant_column(self, spark):
        from solarpos_spark.operators.relational import histogram_quantiles

        df = spark.range(100).select(F.lit(7.5).alias("v"))
        out = histogram_quantiles(df, "v", qs=(0.5,)).collect()[0]
        assert out.est_value == 7.5 == out.bin_lo == out.bin_hi
        assert out.n_below == 0

    def test_nulls_excluded(self, spark):
        """ADVICE r4: NULLs must not form a bin that shifts cumulative
        ranks (Spark orders NULL bins first, DuckDB last — engines would
        diverge); quantiles over a null-bearing column equal the
        null-free result exactly."""
        from solarpos_spark.operators.relational import histogram_quantiles

        df = spark.range(1000).select(
            F.when(F.col("id") % 3 == 0, None)
             .otherwise((F.col("id") % 97).cast("double")).alias("v"))
        clean = df.filter(F.col("v").isNotNull())
        a = sorted(map(tuple, histogram_quantiles(df, "v").collect()))
        b = sorted(map(tuple, histogram_quantiles(clean, "v").collect()))
        assert a == b

    def test_max_value_lands_in_last_bin(self, spark):
        from solarpos_spark.operators.relational import histogram_quantiles

        df = spark.range(10).select(F.col("id").cast("double").alias("v"))
        out = histogram_quantiles(df, "v", qs=(1.0,), n_bins=4).collect()[0]
        # q=1.0 -> the max (9.0) must be inside the reported bin
        assert out.bin_lo - 1e-9 <= 9.0 <= out.bin_hi + 1e-9


class TestSessionize:
    def test_gap_semantics(self, spark):
        """Gap strictly greater than the threshold starts a new session;
        a gap of exactly the threshold does NOT; first event of a user
        always opens session 1; same-instant events stay together
        (id tiebreak keeps the order total)."""
        from solarpos_spark.operators.relational import sessionize

        t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
        m = dt.timedelta(minutes=1)
        rows = [
            (1, 7, t0),                 # s1
            (2, 7, t0 + 10 * m),        # s1 (10 min)
            (3, 7, t0 + 40 * m),        # s1 (exactly 30 min gap)
            (4, 7, t0 + 71 * m),        # s2 (31 min gap)
            (5, 7, t0 + 71 * m),        # s2 (same instant, id after 4)
            (6, 8, t0),                 # other user: own s1
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp")
        out = {r.event_id: (r.session_seq, r.gap_usec)
               for r in sessionize(df, gap_minutes=30).collect()}
        assert out[1] == (1, None)
        assert out[2][0] == 1
        assert out[3][0] == 1 and out[3][1] == 30 * 60 * 1_000_000
        assert out[4][0] == 2
        assert out[5] == (2, 0)
        assert out[6] == (1, None)


class TestRollingZscoreAnomalies:
    def test_flags_planted_spike(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from solarpos_spark.operators.relational import (
            rolling_zscore_anomalies)

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(30):
            v = 10.0 + (i % 3) * 0.1          # tight baseline
            if i == 25:
                v = 50.0                       # the spike
            rows.append((i, 1, t0 + dt.timedelta(minutes=i), v))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double")
        got = rolling_zscore_anomalies(ev, z_threshold=2.5).collect()
        assert [r.event_id for r in got] == [25]
        assert abs(got[0].z) > 10

    def test_trailing_frame_excludes_self_and_cold_start(self, spark):
        import datetime as dt

        from solarpos_spark.operators.relational import (
            rolling_zscore_anomalies)

        t0 = dt.datetime(2024, 1, 1)
        # first 4 rows are wild — but with < min_history trailing rows
        # they must stay unscored
        rows = [(i, 1, t0 + dt.timedelta(minutes=i),
                 [0.0, 100.0, -50.0, 75.0][i]) for i in range(4)]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double")
        assert rolling_zscore_anomalies(ev).count() == 0


class TestWinsorize:
    def test_clipping_and_flags(self, spark):
        from solarpos_spark.operators.relational import winsorize

        rows = [(i, "a", float(v)) for i, v in
                enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double")
        got = {r.event_id: (r.clipped, r.was_clipped) for r in
               winsorize(ev, by="event_type", lo_q=0.1, hi_q=0.9)
               .collect()}
        # percentile_disc(0.9) over 10 members = the 9th value (9.0);
        # the 100 outlier clips to it, low end clips to disc(0.1)=1.0
        assert got[9] == (9.0, True)
        assert got[0] == (1.0, False)   # equal to the bound: not clipped
        assert got[4] == (5.0, False)

    def test_zero_shuffle_clipping_stage(self, spark):
        from solarpos_spark.operators.relational import winsorize

        ev = spark.createDataFrame(
            [(i, "t", float(i)) for i in range(50)],
            "event_id long, event_type string, value double")
        plan = winsorize(ev, by="event_type")._jdf.queryExecution() \
            .executedPlan().toString()
        # the probe side joins the broadcast bounds — no exchange on it
        assert "BroadcastHashJoin" in plan
