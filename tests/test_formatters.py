"""Byte-level format-contract tests (FIXTURES.md §7 goldens)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from solarpos_spark.operators.position import position
from solarpos_spark.operators.sunrise import sunrise
from solarpos_spark.sinks import formatters as fmt


def ts_df(spark, lat, lon, iso, delta_t=69.0):
    return (
        spark.createDataFrame([(lat, lon, iso)], "lat double, lon double, s string")
        .select("lat", "lon", F.to_timestamp("s").alias("ts"))
        .withColumn("delta_t", F.lit(delta_t))
    )


class TestCsvContract:
    def test_full_row_golden(self, spark):
        # PositionTest.java:114-116: exact CSV row with --show-inputs
        df = ts_df(spark, 52.0, 25.0, "2003-10-17 12:00:00")
        res = position(df, algorithm="spa")
        out = fmt.to_csv_string(res, fmt.POSITION_FIELDS, headers=False)
        assert out == ("52.00000,25.00000,0.000,1013.000,15.000,"
                       "2003-10-17T12:00:00Z,69.000,211.20726,65.92499\r\n")

    def test_header_and_default_subset(self, spark):
        # PositionTest.java:93-94: no --show-inputs -> dateTime,azimuth,zenith
        df = ts_df(spark, 52.0, 25.0, "2003-10-17 12:00:00")
        res = position(df, algorithm="spa")
        out = fmt.to_csv_string(res, fmt.POSITION_FIELDS,
                                subset=["dateTime", "azimuth", "zenith"])
        lines = out.split("\r\n")
        assert lines[0] == "dateTime,azimuth,zenith"
        assert lines[1] == "2003-10-17T12:00:00Z,211.20726,65.92499"

    def test_sunrise_header_and_row(self, spark):
        # SunriseTest.java:140 + csvDefaultHasHeaders golden
        df = ts_df(spark, 52.0, 25.0, "2022-10-17 12:00:00")
        res = sunrise(df, show_inputs=False)
        out = fmt.to_csv_string(res, fmt.SUNRISE_FIELDS,
                                subset=["type", "sunrise", "transit", "sunset"])
        lines = out.split("\r\n")
        assert lines[0] == "type,sunrise,transit,sunset"
        assert lines[1] == ("NORMAL,2022-10-17T04:47:51Z,"
                            "2022-10-17T10:05:21Z,2022-10-17T15:22:00Z")

    def test_null_becomes_empty(self, spark):
        # polar night: empty sunrise field (SunriseTest.java:267)
        df = ts_df(spark, 78.22, 15.63, "2023-02-01 00:00:00", delta_t=0.0)
        res = sunrise(df, show_inputs=False)
        out = fmt.to_csv_string(res, fmt.SUNRISE_FIELDS, headers=False,
                                subset=["type", "sunrise", "transit", "sunset"])
        assert out.startswith("ALL_NIGHT,,")

    def test_quoting_rfc4180(self, spark):
        df = spark.createDataFrame(
            [('say "hi", ok',)], "type string").withColumn(
            "deltaT", F.lit(1.0))
        out = fmt.to_csv_string(df, fmt.SUNRISE_FIELDS, headers=False,
                                subset=["type", "deltaT"])
        assert out == '"say ""hi"", ok",1.000\r\n'

    def test_offset_rendering(self, spark):
        # zone offset preserved: +01:00 suffix (TimeFormats XXX)
        df = (ts_df(spark, 52.49, -1.89, "2023-05-01 11:00:00")
              .withColumn("offset_sec", F.lit(3600)))
        res = sunrise(df, offset_col="offset_sec",
                      passthrough=["offset_sec"])
        out = fmt.to_csv_string(res, fmt.SUNRISE_FIELDS, headers=False,
                                subset=["sunrise", "sunset"],
                                offset_col="offset_sec")
        # SunriseTest.java:57-58 golden, rendered in +01:00
        assert out == "2023-05-01T05:36:58+01:00,2023-05-01T20:33:32+01:00\r\n"


class TestJsonContract:
    def test_json_golden_values_and_shape(self, spark):
        # PositionTest.java:30-34: 6-decimal doubles, quoted ISO timestamps
        df = ts_df(spark, 52.0, 25.0, "2022-10-17 12:00:00")
        res = position(df, algorithm="spa")
        out = fmt.to_json_string(res, fmt.POSITION_FIELDS)
        obj = json.loads(out)
        assert obj["azimuth"] == 211.17614
        assert obj["zenith"] == 66.06832
        assert obj["dateTime"] == "2022-10-17T12:00:00Z"
        assert obj["latitude"] == 52.0
        # key order = field order (JsonFormatter contract)
        keys = list(obj.keys())
        assert keys[:3] == ["latitude", "longitude", "elevation"]
        # raw text carries %.6f formatting
        assert '"azimuth":211.17614' in out.replace(" ", "")

    def test_json_null_literal(self, spark):
        df = ts_df(spark, 78.22, 15.63, "2023-02-01 00:00:00", delta_t=0.0)
        res = sunrise(df, show_inputs=False)
        out = fmt.to_json_string(res, fmt.SUNRISE_FIELDS,
                                 subset=["type", "sunrise", "transit"])
        obj = json.loads(out)
        assert obj["sunrise"] is None
        assert '"sunrise":null' in out.replace(" ", "")


class TestHumanFormat:
    def test_human_block_shape(self, spark):
        # PositionTest.humanFormatOutput: display names, units, 28-char
        # right-aligned values, space-separated human timestamp
        df = ts_df(spark, 52.0, 25.0, "2022-10-17 12:00:00")
        res = position(df, algorithm="spa")
        block = fmt.human_blocks(
            res, fmt.POSITION_FIELDS,
            subset=["dateTime", "deltaT", "azimuth", "zenith"]
        ).collect()[0]["block"]
        lines = block.split("\n")
        # human date/time uses a space, not 'T'
        assert lines[0] == "date/time: 2022-10-17 12:00:00Z"
        # SerializerRegistry %28s%s: value right-aligned in 28 chars + unit
        assert lines[1] == "delta T  : " + "69.000".rjust(28) + " s"
        assert lines[2] == "azimuth  : " + "211.17614".rjust(28) + "°"
        assert lines[3] == "zenith   : " + "66.06832".rjust(28) + "°"

    def test_human_show_inputs_units(self, spark):
        # humanFormatOutput golden fragments: '0.000 m', '1013.000 hPa', ...
        df = ts_df(spark, 52.0, 25.0, "2022-10-17 12:00:00")
        res = position(df, algorithm="spa")
        block = fmt.human_blocks(res, fmt.POSITION_FIELDS).collect()[0]["block"]
        for frag in ("52.00000°", "25.00000°", "0.000 m", "1013.000 hPa",
                     "15.000 °C", "69.000 s", "2022-10-17 12:00:00Z",
                     "211.17614°", "66.06832°"):
            assert frag in block, frag

    def test_human_type_names(self, spark):
        # SunriseCommand.java:182-192: 'all night' in human format
        df = ts_df(spark, 78.22, 15.63, "2023-02-01 00:00:00", delta_t=0.0)
        res = sunrise(df, show_inputs=False)
        block = fmt.human_blocks(res, fmt.SUNRISE_FIELDS,
                                 subset=["type", "sunrise"]).collect()[0]["block"]
        assert "all night" in block
        assert "none" in block  # null sunrise -> 'none' (forText nullValue)
